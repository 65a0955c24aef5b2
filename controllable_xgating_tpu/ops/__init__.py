"""Compute ops: pure-function kernels with jnp reference + Pallas TPU paths.

Every op has a `*_jnp` reference implementation (golden for parity tests,
runs anywhere) and, for the hot ones, a Pallas TPU kernel. `impl="auto"`
selects Pallas on TPU backends and jnp elsewhere; greedy-decode outputs of
the two paths are byte-compared in tests (BASELINE.json token-for-token
gate, self-consistency form per SURVEY.md §0).
"""

from controllable_xgating_tpu.ops.lstm import lstm_cell, lstm_scan, bilstm_scan
from controllable_xgating_tpu.ops.attention import additive_attention
from controllable_xgating_tpu.ops.xgate import xgate_fuse, XGateWeights

__all__ = [
    "lstm_cell",
    "lstm_scan",
    "bilstm_scan",
    "additive_attention",
    "xgate_fuse",
    "XGateWeights",
]
