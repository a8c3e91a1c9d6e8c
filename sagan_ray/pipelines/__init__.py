from .engine import EngineResult, run_engine  # noqa: F401
