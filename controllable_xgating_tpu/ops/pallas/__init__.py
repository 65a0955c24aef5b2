from controllable_xgating_tpu.ops.pallas.xgate import xgate_fuse_pallas
from controllable_xgating_tpu.ops.pallas.attn_lstm import (
    attn_lstm_step_pallas,
    attn_lstm_vmem_bytes,
)

__all__ = [
    "xgate_fuse_pallas",
    "attn_lstm_step_pallas",
    "attn_lstm_vmem_bytes",
]
