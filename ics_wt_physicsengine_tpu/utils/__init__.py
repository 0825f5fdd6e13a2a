"""Utilities: array-namespace dispatch, checkpointing, profiling hooks."""

from ics_wt_physicsengine_tpu.utils.dispatch import array_namespace  # noqa: F401
