"""Plan-level services: reflections (materialized views + substitution)."""

from .reflections import AggQuery, JoinSpec, Measure, Reflection, ReflectionStore

__all__ = ["AggQuery", "JoinSpec", "Measure", "Reflection", "ReflectionStore"]
