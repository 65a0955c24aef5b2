from controllable_xgating_tpu.infer.greedy import greedy_decode, sample_decode

__all__ = ["greedy_decode", "sample_decode"]
