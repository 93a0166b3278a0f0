"""Utilities: profiling/tracing and structured run reports (SURVEY.md §5)."""

from burn_depth_tpu.utils.profiling import Timer, device_memory_stats, trace  # noqa: F401
