"""Plan-level services: reflections (materialized views + substitution)."""

from .reflections import AggQuery, JoinSpec, Measure, Reflection, ReflectionStore
from .workload import QueueDef, WorkloadManager

__all__ = ["AggQuery", "JoinSpec", "Measure", "QueueDef", "Reflection",
           "ReflectionStore", "WorkloadManager"]
