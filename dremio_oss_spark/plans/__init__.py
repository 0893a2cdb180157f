"""Plan-level services: reflections (materialized views + substitution)."""

from .reflections import AggQuery, Measure, Reflection, ReflectionStore

__all__ = ["AggQuery", "Measure", "Reflection", "ReflectionStore"]
