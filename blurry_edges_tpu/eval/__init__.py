from .metrics import eval_depth
from .pipeline import InferenceModules, make_depth_estimator, run_eval

__all__ = ["eval_depth", "InferenceModules", "make_depth_estimator", "run_eval"]
