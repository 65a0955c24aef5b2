from controllable_xgating_tpu.serve.engine import CaptionResult, ServingEngine

__all__ = ["CaptionResult", "ServingEngine"]
