from . import checkpoint, oracle, profiling                   # noqa: F401
