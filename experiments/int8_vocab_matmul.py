"""Weight-only int8 vocab projection — measured-REJECTED experiment.

Hypothesis: at serving micro-batch sizes the decode step is bound by
per-step HBM weight re-reads, of which the [Hd, V] vocab projection is
the largest (~10 MB bf16 at reference dims), so storing it int8 with
per-column scales should approach a 2x cut of that traffic. The
dequantize happens inside a Pallas kernel because XLA hoists a
`convert(int8->bf16)` of a loop-invariant weight out of the decode scan
and re-materializes bf16 in HBM.

Measured result (v5e, tools/quant_ab.py, docs/RESULTS.md round 3): int8
is SLOWER at every tested shape — greedy B=8 -0.2%, B=32 -12%, B=256
-9% at hidden 512; B=8 -20%, B=32 -41% at the config-5 2x-hidden 1024.
The trace explains the premise failure: XLA keeps scan-invariant
weights VMEM-RESIDENT across the decode loop (S(1) memory-space
annotations on w_out in the beam/greedy traces), so at hidden 512 there
is no per-step HBM weight read to halve, and the kernel only adds
VPU dequant work + loses XLA's operand pipelining. At hidden 1024
(w_out 20.5 MB > VMEM) a real re-read exists, but this kernel's
un-pipelined whole-K blocks lose more than int8 saves.

Kept because the math is correct and pinned by tests (exact int8
round-trip bound, kernel == jnp reference bit-for-bit on CPU), the
`vocab_q` hook in models/decoder.py::decode_step still accepts it, and
the tradeoff may differ on hardware without XLA's VMEM weight pinning.

Numerics: w ~ int8 * scale[col]; logits = f32(dot(bf16 x, bf16(int8
w))) * scale + bias. int8 -> bf16 conversion is exact (|q| <= 127),
accumulation is f32 — CPU/TPU agree up to matmul accumulation order,
the same contract as the production kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256
TILE_N = 1024
_SUBLANE = 16  # bf16 second-to-last-dim tile


class QuantVocabProj(struct.PyTreeNode):
    """Per-column symmetric int8 quantized [Hd, V] projection (+ bias).

    Arrays are padded on the vocab axis to a TILE_N multiple; `n` is the
    true vocab size (callers slice the padded logits back to it).
    """

    wq: jax.Array      # [Hd, Vpad] int8
    scale: jax.Array   # [1, Vpad] f32
    bias: jax.Array    # [1, Vpad] f32
    n: int = struct.field(pytree_node=False)


def quantize_vocab_proj(w: jax.Array, b: jax.Array) -> QuantVocabProj:
    """Symmetric per-column quantization of w [Hd, V] (+ bias carried)."""
    k, n = w.shape
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)                     # [V]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    pad = (-n) % TILE_N
    if pad:
        wq = jnp.pad(wq, ((0, 0), (0, pad)))
        scale = jnp.pad(scale, (0, pad), constant_values=1.0)
        b = jnp.pad(b.astype(jnp.float32), (0, pad))
    return QuantVocabProj(
        wq=wq, scale=scale[None, :].astype(jnp.float32),
        bias=b[None, :].astype(jnp.float32), n=n,
    )


def _dequant_matmul_jnp(x: jax.Array, q: QuantVocabProj) -> jax.Array:
    """Reference path (CPU / golden tests): numerically identical ops."""
    w = q.wq.astype(jnp.bfloat16)
    acc = jnp.dot(x.astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    return acc * q.scale + q.bias


def _kernel(x_ref, wq_ref, scale_ref, bias_ref, o_ref):
    w = wq_ref[...].astype(jnp.bfloat16)       # int8 -> bf16 in VMEM
    acc = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
    o_ref[...] = acc * scale_ref[...] + bias_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int8_matmul_pallas(
    x: jax.Array, q: QuantVocabProj, interpret: bool = False
) -> jax.Array:
    m, k = x.shape
    npad = q.wq.shape[1]
    x = x.astype(jnp.bfloat16)
    tile_m = min(TILE_M, max(_SUBLANE, -(-m // _SUBLANE) * _SUBLANE))
    pad_m = (-m) % tile_m
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((mp, npad), jnp.float32),
        grid=(mp // tile_m, npad // TILE_N),
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TILE_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, TILE_N), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, q.wq, q.scale, q.bias)
    return out[:m]


def vocab_proj_int8(
    x: jax.Array, q: QuantVocabProj, interpret: bool = False
) -> jax.Array:
    """Quantized logits [M, V] = dequant(x @ wq) * scale + bias.

    Routes to the Pallas kernel on TPU-class backends (where the int8 HBM
    read is the point) and the identical-math jnp path on CPU.
    """
    if jax.default_backend() == "cpu" and not interpret:
        out = _dequant_matmul_jnp(x, q)
    else:
        out = _int8_matmul_pallas(x, q, interpret=interpret)
    return out[:, : q.n]
