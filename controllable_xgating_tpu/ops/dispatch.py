"""Kernel dispatch: jnp reference path vs fused Pallas path.

Resolution order: explicit call-site override > process-global setting >
auto (Pallas on TPU-class backends, jnp on CPU). Like the precision policy,
the choice is baked at trace time — set it before building jitted
functions.

The fused kernels carry no custom VJP yet, so TRAINING always uses the jnp
path (its gradients come from XLA); the dispatcher is consulted only by
inference rollouts (greedy/beam/eval/bench). SCST's sampling rollout also
stays jnp because its logprobs carry gradients.
"""

from __future__ import annotations

from typing import Optional

import jax

_STATE: dict[str, Optional[bool]] = {"fused": None}  # None = auto


def set_fused_kernels(on: Optional[bool]) -> None:
    """True/False force; None restores auto (TPU -> fused)."""
    _STATE["fused"] = on


def fused_enabled(override: Optional[bool] = None) -> bool:
    if override is not None:
        return override
    if _STATE["fused"] is not None:
        return _STATE["fused"]
    return jax.default_backend() not in ("cpu",)
