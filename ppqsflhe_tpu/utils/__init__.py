from .profiling import profile_trace, timed  # noqa: F401
