from .evaluator import EvalResult, ReferenceEvaluator  # noqa: F401
