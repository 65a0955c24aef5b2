"""XGating fusion encoder: embed + cross-gate + temporal BiLSTM.

Rebuilds the reference's encoder module (SURVEY.md §2 "XGating fusion
encoder"; paper §3.1): per-timestep cross-gated fusion of the two feature
streams followed by a (bi)LSTM over time. Outputs the attention memory
`enc_out` [B, T, He] and a masked-mean `summary` [B, He] used to initialize
the POS-generator and caption-decoder states.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

log = logging.getLogger("cxg.encoder")
_xgate_fallback_warned: set = set()

from controllable_xgating_tpu.ops.lstm import (
    LSTMWeights,
    bilstm_scan,
    init_lstm,
    lstm_scan,
)
from controllable_xgating_tpu.ops.xgate import XGateWeights, init_xgate, xgate_fuse


class EncoderParams(struct.PyTreeNode):
    xgate: XGateWeights
    lstm_fwd: LSTMWeights
    lstm_bwd: Optional[LSTMWeights]

    @property
    def out_dim(self) -> int:
        h = self.lstm_fwd.hidden_dim
        return 2 * h if self.lstm_bwd is not None else h


def init_encoder(
    key: jax.Array,
    app_dim: int,
    motion_dim: int,
    hidden: int,
    bidirectional: bool = True,
    dtype=jnp.float32,
    fusion: str = "xgate",
) -> EncoderParams:
    if fusion not in ("xgate", "concat"):
        raise ValueError(f"model.fusion must be xgate|concat, got {fusion!r}")
    k1, k2, k3 = jax.random.split(key, 3)
    return EncoderParams(
        xgate=init_xgate(k1, app_dim, motion_dim, hidden, dtype, mode=fusion),
        lstm_fwd=init_lstm(k2, hidden, hidden, dtype),
        lstm_bwd=init_lstm(k3, hidden, hidden, dtype) if bidirectional else None,
    )


def encode(
    params: EncoderParams,
    app: jax.Array,        # [B, T, Da]
    motion: jax.Array,     # [B, T, Dm]
    frame_mask: Optional[jax.Array] = None,  # [B, T] 1=valid
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    fused_kernels: Optional[bool] = None,  # True = Pallas XGating kernel
) -> tuple[jax.Array, jax.Array]:
    """Returns (enc_out [B, T, He], summary [B, He])."""
    use_pallas = bool(fused_kernels) and params.xgate.mode == "xgate"
    if use_pallas:
        # the Pallas kernel implements the cross-gated formula only; the
        # concat ablation routes through the jnp path. C3D-width motion
        # features (~4096-d, MSVD alternate stream) blow the kernel's VMEM
        # budget in f32 — estimate first and fall back loudly, like the
        # decoder's fused-kernel gate (models/decoder.py)
        from controllable_xgating_tpu.ops.pallas.xgate import (
            XGATE_VMEM_LIMIT,
            xgate_vmem_bytes,
        )
        from controllable_xgating_tpu.ops.precision import compute_dtype

        est = xgate_vmem_bytes(
            app.shape[-1], motion.shape[-1], params.xgate.wa.shape[1],
            compute_dtype(),
        )
        if est > XGATE_VMEM_LIMIT:
            use_pallas = False
            if est not in _xgate_fallback_warned:
                _xgate_fallback_warned.add(est)
                log.warning(
                    "fused XGating kernel requested but its VMEM estimate "
                    "(%.1f MiB) exceeds the %.0f MiB budget at these "
                    "dims/dtype; falling back to the jnp path",
                    est / 2**20, XGATE_VMEM_LIMIT / 2**20,
                )
    if use_pallas:
        from controllable_xgating_tpu.ops.pallas.xgate import xgate_fuse_pallas

        fused = xgate_fuse_pallas(params.xgate, app, motion)
    else:
        fused = xgate_fuse(params.xgate, app, motion)  # [B, T, H]
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, fused.shape)
        fused = jnp.where(keep, fused / (1.0 - dropout_rate), 0.0).astype(fused.dtype)
    if params.lstm_bwd is not None:
        enc_out, _ = bilstm_scan(params.lstm_fwd, params.lstm_bwd, fused, frame_mask)
    else:
        enc_out, _ = lstm_scan(params.lstm_fwd, fused, frame_mask)

    if frame_mask is None:
        summary = jnp.mean(enc_out, axis=1)
    else:
        m = frame_mask.astype(enc_out.dtype)[:, :, None]
        summary = (enc_out * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
    return enc_out, summary
