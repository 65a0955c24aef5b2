"""Batched beam search, fully on device.

Rebuilds the reference's `sample_beam` (SURVEY.md stack §3.3) — there, a
host Python loop stepping the decoder per beam per video (device boundary
crossed L × #videos times). Here the whole search is one `lax.scan`:

  * all B videos × K beams advance together as one [B*K] decoder batch
    (keeps the MXU fed; no host sync anywhere);
  * per step: logprobs [B, K, V] -> top-K over the K·V candidate pool via
    `jax.lax.top_k`; beam states (h, c, token history, finished flags)
    reordered with `take_along_axis` gathers;
  * finished beams survive in the pool by emitting PAD at zero cost while
    all their other continuations score -inf; additionally a per-video
    best-finished register (score, tokens) is updated every step OUTSIDE
    the pool, so a finished hypothesis momentarily evicted by k
    later-decaying live beams can never be lost — "keep the best finished
    hypothesis" is a guarantee, not a heuristic;
  * beam 0 alone is live at t=0 (other beams start at -inf) so the first
    expansion picks the K best distinct first words.

Selection follows the reference era's convention: highest summed logprob,
optional GNMT-style length normalization (cfg.eval.length_penalty alpha;
0 = off = reference behavior).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from controllable_xgating_tpu.data.vocab import BOS, EOS, PAD
from controllable_xgating_tpu.infer.greedy import mask_special_tokens
from controllable_xgating_tpu.models.captioner import (
    CaptionerParams,
    encode_for_inference,
)
from controllable_xgating_tpu.models.decoder import (
    DecodeContext,
    DecoderParams,
    decode_step,
    init_decoder_state,
)

NEG_INF = -1e30


_BLOCK = 128  # one TPU lane tile


def row_topk_block(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact per-row `lax.top_k(x, k)` via a block-max prescreen.

    Pass 1 reduces non-overlapping 128-wide windows to per-block maxima
    (one streaming read — reduce_window pads the tail virtually). Only a
    row's k best blocks can contain a top-k element: k distinct blocks
    witness k distinct elements, so the k-th largest block max
    lower-bounds the true k-th value, and any block whose max falls below
    it is out. Pass 2 gathers those k blocks as contiguous
    `vmap(dynamic_slice)` slices and runs the exact top-k over the k*128
    survivors.

    Status: measured REJECTED as a beam default on v5e (-91% end to end).
    The prescreen reduce is near-roofline (57 us at [1280,10000]) but the
    pass-2 gather costs ~10 ms however formulated (dynamic_slice vmap and
    take_along_axis alike), and XLA top-k extraction is row-overhead-
    bound, not bandwidth-bound ([1280,640] -> 182 us vs [1280,10000] ->
    324 us), so there is nothing for the prescreen to save. Numbers in
    docs/RESULTS.md (round 3). Kept because it is exact (incl. tie
    order), pinned by tests, and the tradeoff may differ off-TPU.

    Tie resolution is identical to `lax.top_k` (lower index wins): kept
    blocks are sorted ascending so the gathered pool is in original index
    order, and an excluded tied block's elements are always preceded by
    at least as many same-valued elements in kept lower-index blocks.
    Tail-window clamping is masked to -inf (never duplicates an element
    into the pool).
    """
    r, v = x.shape
    nb = -(-v // _BLOCK)
    if nb < k or v <= 4 * k * _BLOCK:
        return jax.lax.top_k(x, k)  # small rows: prescreen can't pay
    pad = nb * _BLOCK - v
    bm = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, _BLOCK), window_strides=(1, _BLOCK),
        padding=((0, 0), (0, pad)),
    )                                                    # [r, nb]
    _, blk = jax.lax.top_k(bm, k)                        # [r, k]
    blk = jnp.sort(blk, axis=1)                          # original order
    starts = blk * _BLOCK                                # [r, k]
    vals = jax.vmap(                                     # [r, k, _BLOCK]
        lambda row, ss: jax.vmap(
            lambda s: jax.lax.dynamic_slice(row, (s,), (_BLOCK,))
        )(ss)
    )(x, starts)
    # dynamic_slice clamps the tail window's start; mask the columns that
    # slid in from the previous block (and any virtual-pad positions)
    clamped = jnp.minimum(starts, v - _BLOCK)            # [r, k]
    cols = clamped[:, :, None] + jnp.arange(_BLOCK)[None, None, :]
    valid = cols >= starts[:, :, None]
    vals = jnp.where(valid, vals, -jnp.inf)
    scores, pos = jax.lax.top_k(vals.reshape(r, k * _BLOCK), k)
    idx = jnp.take_along_axis(cols.reshape(r, k * _BLOCK), pos, axis=1)
    return scores, idx


def beam_search(
    params: DecoderParams,
    ctx: DecodeContext,
    summary: jax.Array,   # [B, He]
    beam_size: int,
    max_len: int,
    length_penalty: float = 0.0,
    fused: Optional[bool] = None,
    block_unk: bool = False,
    early_stop: bool = False,
    topk_mode: str = "auto",
    vocab_q=None,
    n_members: int = 0,
    return_all: bool = False,
    diversity_groups: int = 0,
    diversity_penalty: float = 0.5,
) -> tuple[jax.Array, jax.Array]:
    """Returns (tokens [B, max_len], scores [B]) for the best beam.

    `return_all=True` returns the whole beam instead — (tokens
    [B, K, max_len], scores [B, K]) sorted best-first per video (the
    reference's `sample_beam` keeps every done beam; SURVEY.md §3.3).
    The best-finished register competes as a (K+1)-th candidate, masked
    out when it duplicates a pool row, so row 0 is always exactly the
    single-best return (ties prefer the pool in both forms).

    `early_stop=True` uses a while_loop that exits once every beam of every
    video has finished (identical results; big win on trained models).

    `n_members > 0` = ensemble decoding (infer/ensemble.py), two layouts:

    * HOMOGENEOUS (same architecture): `params`, `ctx` and `summary` carry
      a leading member axis M == n_members; each step vmaps the decoder
      over members, averages their log-probs, and runs the beam
      bookkeeping ONCE on the combined distribution — every member's LSTM
      state is reordered with the same gather indices.
    * HETEROGENEOUS (cross-architecture — different fusion/psi knobs or
      dims): `params`/`ctx`/`summary` are PYTHON TUPLES of per-member
      values (n_members == len). The member loop is unrolled at trace
      time (M is tiny and static), each member advancing its own decoder
      under the shared chosen tokens; only the vocab dimension must
      match. This is the layout `stack_params` rejects — the measured
      ensembling law (docs/RESULTS.md) says recipe/architecture diversity
      is exactly where ensembles win, so the combination must be
      expressible.

    The single-model path (n_members=0) is untouched.

    `topk_mode` picks the candidate-selection lowering; all three are
    output-identical including tie resolution (pinned by tests):

    * `"flat"` — one `top_k([B, K*V], K)` over the flattened pool (the
      reference-shaped form). Forces XLA into a layout round-trip on the
      [B*K, V] candidate matrix (copy {0,1}→{1,0} → reshape → copy back,
      ~128 µs/step at bench shapes — named by the round-3 op-level device
      trace, docs/RESULTS.md).
    * `"grouped"` — per-beam-row `top_k([B*K, V], K)` then a tiny
      `top_k([B, K*K], K)` merge; consumes the candidates in the matmul's
      own layout (+13% on chip vs flat).
    * `"block"` — grouped, with the per-row stage additionally
      prescreened by 128-wide block maxima (`row_topk_block`). Measured
      REJECTED on v5e at bench shapes (-91%): XLA's gathers cost ~10 ms
      at [1280, 5x128] regardless of formulation, and top-k extraction
      is row-overhead-bound, so shrinking the scanned bytes doesn't pay
      (docs/RESULTS.md round 3). Kept exact + parity-tested as the
      recorded experiment.
    * `"lanes"` — fuses projection + mask + log_softmax + the per-row
      stage into the per-lane streaming Pallas kernel
      (ops/pallas/topk_tail.py): the [B*K, V] logits never reach HBM.
      Single-model only (ensembles combine full distributions); scores
      match the other modes to float rounding (the logsumexp reduce
      order differs), tokens pinned equal by test. Falls back to
      "grouped" (with one warning) if the kernel's VMEM estimate
      exceeds budget at these dims.

    `diversity_groups > 1` = diverse beam search (Vijayakumar et al.,
    arXiv:1610.02424): the K beams split into G contiguous groups of
    K/G; each step, groups select sequentially and group j's candidate
    scores are penalized by `diversity_penalty` x (how many live beams
    of groups < j emitted that token THIS step) — a Hamming diversity
    term over the current time step. Design choices, all deliberate:

    * the expensive decode_step stays ONE batched [B*K] call (groups
      only serialize the cheap top-k tail, which is row-overhead-bound
      anyway — see "grouped" above);
    * stored cumulative scores are the RAW logprobs (penalty biases
      selection only), so returned scores stay comparable across groups,
      rescoring pins exactly, and length_penalty composes unchanged;
    * finished beams emit PAD at zero cost and do NOT feed the penalty
      histogram (a dead beam's PAD is bookkeeping, not a choice — and
      penalizing PAD would evict finished hypotheses from later groups);
    * at t=0 the first row of EVERY group is live (plain beam lights
      only row 0), so group 0 picks its K/G best first words and later
      groups diversify against them;
    * selection uses the "grouped" two-stage lowering within each group;
      `topk_mode` is ignored while diversity is on.

    G=0/1 is exactly the plain beam path (same code, pinned by test).
    """
    groups = int(diversity_groups or 0)
    if groups > 1:
        if beam_size % groups:
            raise ValueError(
                f"diversity_groups={groups} must divide beam_size={beam_size}"
            )
        if diversity_penalty < 0.0:
            raise ValueError("diversity_penalty must be >= 0")
    ens = int(n_members or 0)
    hetero = ens > 0 and isinstance(params, (list, tuple))
    if ens and vocab_q is not None:
        raise ValueError("vocab_q is not supported for ensemble decoding")
    if hetero:
        if len(params) != ens:
            raise ValueError(
                f"n_members={ens} but {len(params)} heterogeneous members"
            )
        vs = {p.w_out.shape[-1] for p in params}
        if len(vs) != 1:
            raise ValueError(
                f"heterogeneous ensemble members disagree on vocab: {vs}"
            )
        b = summary[0].shape[0]
        v = params[0].w_out.shape[-1]
    else:
        b = summary.shape[1] if ens else summary.shape[0]
        # w_out.shape[-1], not params.vocab_size: that property reads
        # shape[1], which is the hidden dim once a member axis is stacked
        # in front
        v = params.w_out.shape[-1]
    k = beam_size

    if topk_mode == "auto":
        # measured order on v5e (tools/beam_topk_ab.py, docs/RESULTS.md):
        # lanes 15,630 > grouped 13,179 > flat 11,521 captions/s; lanes is
        # single-model only (ensembles combine full distributions). On a
        # CPU-default process the kernel would run INTERPRETED — auto
        # keeps the fast XLA tail there (explicit "lanes" still works
        # anywhere; a TPU process jitting for its CPU devices still gets
        # lanes, which the cross-platform parity suite relies on)
        topk_mode = (
            "lanes" if (not ens and vocab_q is None and groups <= 1
                        and jax.default_backend() != "cpu")
            else "grouped"
        )
    lanes = topk_mode == "lanes" and groups <= 1  # diversity ignores topk_mode
    if lanes:
        if ens:
            raise ValueError('topk_mode="lanes" does not support ensembles')
        if vocab_q is not None:
            raise ValueError('topk_mode="lanes" does not support vocab_q')
        from controllable_xgating_tpu.ops.pallas.topk_tail import (
            lanes_fits,
            logits_topk_lanes,
        )

        if not lanes_fits(b * k, params.w_out.shape[0], k):
            lanes, topk_mode = False, "grouped"
        else:
            # a finished row's candidate list under the other modes is
            # top_k(cont) shifted by cum: PAD continuation first, then
            # NEG_INF fillers — static, folded at trace time
            cont_v, cont_i = jax.lax.top_k(
                jnp.where(jnp.arange(v) == PAD, 0.0, NEG_INF), k
            )

    # tile each video's rows K times; for a stacked ensemble the batch
    # axis is axis 1 (axis 0 is the member axis)
    tile = lambda x: jnp.repeat(x, k, axis=1 if ens and not hetero else 0)

    def tile_ctx(cx):
        return DecodeContext(
            enc_proj=tile(cx.enc_proj),
            keys=tile(cx.keys),
            frame_mask=None if cx.frame_mask is None else tile(cx.frame_mask),
            psi_g=tile(cx.psi_g),
        )

    if hetero:
        ctx_k = tuple(tile_ctx(cx) for cx in ctx)
        hs, cs = zip(*(
            init_decoder_state(p, tile(s)) for p, s in zip(params, summary)
        ))
        h, c = tuple(hs), tuple(cs)  # per-member [B*K, Hd]
    elif ens:
        ctx_k = tile_ctx(ctx)
        h, c = jax.vmap(init_decoder_state)(params, tile(summary))  # [M, B*K, Hd]
    else:
        ctx_k = tile_ctx(ctx)
        h, c = init_decoder_state(params, tile(summary))  # [B*K, Hd]

    tokens0 = jnp.full((b, k), BOS, jnp.int32)
    # only beam 0 live initially so step 0 yields K distinct first words;
    # under diversity, row 0 of EACH group is live (groups expand
    # independently at t=0, then the Hamming penalty separates them)
    kg = k // groups if groups > 1 else k
    cum0 = jnp.where(
        jnp.arange(k)[None, :] % kg == 0, 0.0, NEG_INF
    ) * jnp.ones((b, 1))
    finished0 = jnp.zeros((b, k), bool)
    lengths0 = jnp.zeros((b, k), jnp.int32)
    hist0 = jnp.full((b, k, max_len), PAD, jnp.int32)
    # per-video best-finished register (final-scored), pool-independent
    reg_score0 = jnp.full((b,), NEG_INF, jnp.float32)
    reg_tokens0 = jnp.full((b, max_len), PAD, jnp.int32)

    def _final_score(cum, lengths):
        if length_penalty > 0.0:
            norm = ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty
            return cum / norm
        return cum

    def step(carry, t):
        h, c, tok, cum, finished, lengths, hist, reg_score, reg_tokens = carry
        # NOTE on the candidate expansion: a streaming Pallas logits->top-k
        # kernel exists (experiments/pallas_logits_topk.py, parity-tested)
        # but its iterative per-tile extraction is VPU-bound and measured
        # ~4x SLOWER than XLA's fused logits/log_softmax/top_k chain at
        # reference dims, so beam uses the XLA tail even when `fused`
        # (which still routes the attention+cell update through Pallas).
        if hetero:
            from controllable_xgating_tpu.infer.ensemble import combine_logp

            outs = [
                decode_step(p, cx, tok.reshape(b * k), hh, cc, fused=False)
                for p, cx, hh, cc in zip(params, ctx_k, h, c)
            ]
            logits_m = jnp.stack([o[0] for o in outs])  # [M, B*K, V]
            h_new = tuple(o[1] for o in outs)
            c_new = tuple(o[2] for o in outs)
            logp = combine_logp(logits_m, block_unk)    # [B*K, V]
        elif ens:
            from controllable_xgating_tpu.infer.ensemble import combine_logp

            logits_m, h_new, c_new, _ = jax.vmap(
                lambda p, cx, hh, cc: decode_step(
                    p, cx, tok.reshape(b * k), hh, cc, fused=fused
                )
            )(params, ctx_k, h, c)                     # [M, B*K, V]
            logp = combine_logp(logits_m, block_unk)   # [B*K, V]
        elif lanes:
            # projection + mask + log_softmax + per-row top-k fused in the
            # lane-streaming kernel: the [B*K, V] logits never exist
            h_out, h_new, c_new, _ = decode_step(
                params, ctx_k, tok.reshape(b * k), h, c, fused=fused,
                return_hidden=True,
            )
            top_v, top_i, lse = logits_topk_lanes(
                h_out, params.w_out, params.b_out, k, block_unk=block_unk,
            )
            logp_k = top_v - lse[:, None]                  # [B*K, K]
        else:
            logits, h_new, c_new, _ = decode_step(
                params, ctx_k, tok.reshape(b * k), h, c, fused=fused,
                vocab_q=vocab_q,
            )
            logits = mask_special_tokens(logits.astype(jnp.float32), block_unk)
            # NOTE: the log_softmax form below is the MEASURED-fastest tail.
            # Two "fewer-passes" rewrites lost to it on real v5e hardware:
            # round 1's lse-fold with a PAD-column scatter (-15%), and round
            # 2's scatter-free lse-fold (cand = logits + (cum - logsumexp),
            # finished handled by an iota-compare where): 7.3k vs 8.9k
            # captions/s (-18%). XLA fuses this exact chain into its top_k
            # custom call better than the hand-folded variants.
            logp = jax.nn.log_softmax(logits, -1)      # [B*K, V]

        if not lanes:
            # finished beams: only PAD continuation, at zero cost
            pad_onehot = (jnp.arange(v)[None, :] == PAD)
            cont = jnp.where(pad_onehot, 0.0, NEG_INF)
            logp = jnp.where(finished.reshape(b * k)[:, None], cont, logp)
            cand = cum.reshape(b * k)[:, None] + logp      # [B*K, V]

        if lanes:
            # same finished-beam semantics applied to the top-K lists:
            # a finished row's candidates become top_k(cont) + cum, then
            # the stage-2 merge is identical to "grouped"
            fin_col = finished.reshape(b * k)[:, None]
            s1_scores = cum.reshape(b * k)[:, None] + jnp.where(
                fin_col, cont_v[None, :], logp_k
            )                                              # [B*K, K]
            s1_idx = jnp.where(fin_col, cont_i[None, :], top_i)
            top_scores, m_idx = jax.lax.top_k(
                s1_scores.reshape(b, k * k), k)            # [B, K]
            beam_idx = m_idx // k
            new_tok = jnp.take_along_axis(
                s1_idx.reshape(b, k * k), m_idx, axis=1
            ).astype(jnp.int32)
        elif groups > 1:
            # diverse beam search: groups select sequentially; group j's
            # candidates are penalized by how many live beams of groups
            # < j emitted each token this step. Unrolled at trace time
            # (G is tiny and static); stored scores stay RAW.
            cand3 = cand.reshape(b, k, v)
            fin3 = finished.reshape(b, k)
            pen = jnp.zeros((b, v), cand.dtype)
            g_scores, g_beam, g_tok = [], [], []
            for j in range(groups):
                cj = cand3[:, j * kg:(j + 1) * kg, :]         # [B, kg, V]
                sel = (cj - diversity_penalty * pen[:, None, :]
                       ) if j else cj
                s1_scores, s1_idx = jax.lax.top_k(
                    sel.reshape(b * kg, v), kg)                # [B*kg, kg]
                _, m_idx = jax.lax.top_k(
                    s1_scores.reshape(b, kg * kg), kg)         # [B, kg]
                bj = m_idx // kg                               # in-group row
                tj = jnp.take_along_axis(
                    s1_idx.reshape(b, kg * kg), m_idx, axis=1
                ).astype(jnp.int32)
                # raw (unpenalized) cumulative score of the chosen pairs
                raw = jnp.take_along_axis(
                    jnp.take_along_axis(cj, bj[:, :, None], axis=1),
                    tj[:, :, None], axis=2,
                )[:, :, 0]
                if j + 1 < groups:
                    # histogram over tokens CHOSEN this step by this
                    # group's live beams (a finished beam's PAD emission
                    # is bookkeeping, not a choice)
                    live = ~jnp.take_along_axis(
                        fin3[:, j * kg:(j + 1) * kg], bj, axis=1)
                    pen = pen.at[jnp.arange(b)[:, None], tj].add(
                        live.astype(pen.dtype))
                g_scores.append(raw)
                g_beam.append(j * kg + bj)
                g_tok.append(tj)
            top_scores = jnp.concatenate(g_scores, axis=1)     # [B, K]
            beam_idx = jnp.concatenate(g_beam, axis=1)
            new_tok = jnp.concatenate(g_tok, axis=1)
        elif topk_mode in ("grouped", "block"):
            # stage 1: row-local top-K on the candidate matrix as the
            # matmul produced it — no [B, K*V] reshape, no layout copies
            if topk_mode == "block":
                s1_scores, s1_idx = row_topk_block(cand, k)   # [B*K, K]
            else:
                s1_scores, s1_idx = jax.lax.top_k(cand, k)    # [B*K, K]
            # stage 2: merge the K*K survivors per video (tiny)
            top_scores, m_idx = jax.lax.top_k(
                s1_scores.reshape(b, k * k), k)               # [B, K]
            beam_idx = m_idx // k
            new_tok = jnp.take_along_axis(
                s1_idx.reshape(b, k * k), m_idx, axis=1
            ).astype(jnp.int32)
        elif topk_mode == "flat":
            flat = cand.reshape(b, k * v)
            top_scores, top_idx = jax.lax.top_k(flat, k)      # [B, K]
            beam_idx = top_idx // v
            new_tok = (top_idx % v).astype(jnp.int32)
        else:
            raise ValueError(f"unknown topk_mode {topk_mode!r}")

        def gather_bk(x):
            return jnp.take_along_axis(x, beam_idx, axis=1)

        finished_g = gather_bk(finished)
        lengths_g = gather_bk(lengths)
        hist_g = jnp.take_along_axis(
            hist, beam_idx[:, :, None], axis=1
        )
        # reorder decoder state: flat index into [B*K] (every ensemble
        # member's state follows the same beam reordering)
        flat_src = (jnp.arange(b)[:, None] * k + beam_idx).reshape(b * k)
        if hetero:
            h_new = tuple(x[flat_src] for x in h_new)
            c_new = tuple(x[flat_src] for x in c_new)
        elif ens:
            h_new, c_new = h_new[:, flat_src], c_new[:, flat_src]
        else:
            h_new, c_new = h_new[flat_src], c_new[flat_src]

        now_finished = finished_g | (new_tok == EOS)
        emit = jnp.where(finished_g, PAD, new_tok)
        hist_new = hist_g.at[:, :, t].set(emit)
        lengths_new = jnp.where(finished_g, lengths_g, lengths_g + 1)

        # update the best-finished register from beams finishing THIS step
        just_finished = now_finished & ~finished_g
        cand = jnp.where(
            just_finished, _final_score(top_scores, lengths_new), NEG_INF
        )
        row_best = jnp.argmax(cand, axis=1)                       # [B]
        row_score = jnp.take_along_axis(cand, row_best[:, None], 1)[:, 0]
        row_tokens = jnp.take_along_axis(
            hist_new, row_best[:, None, None], axis=1
        )[:, 0, :]
        improve = row_score > reg_score
        reg_score = jnp.where(improve, row_score, reg_score)
        reg_tokens = jnp.where(improve[:, None], row_tokens, reg_tokens)
        return (
            h_new, c_new, emit, top_scores, now_finished, lengths_new,
            hist_new, reg_score, reg_tokens,
        ), None

    carry0 = (
        h, c, tokens0, cum0, finished0, lengths0, hist0,
        reg_score0, reg_tokens0,
    )
    if early_stop:
        def cond(state):
            t = state[0]
            finished = state[5]
            return (t < max_len) & ~finished.all()

        def body(state):
            t = state[0]
            carry, _ = step(state[1:], t)
            return (t + 1, *carry)

        (_, h, c, tok, cum, finished, lengths, hist, reg_score, reg_tokens
         ) = jax.lax.while_loop(cond, body, (jnp.int32(0), *carry0))
    else:
        (h, c, tok, cum, finished, lengths, hist, reg_score, reg_tokens
         ), _ = jax.lax.scan(step, carry0, jnp.arange(max_len))

    final = _final_score(cum, lengths)
    if return_all:
        # the register hypothesis joins the pool as candidate K+1 unless it
        # is literally one of the pool rows (then the pool copy wins ties)
        dup = (hist == reg_tokens[:, None, :]).all(-1).any(1)     # [B]
        all_scores = jnp.concatenate(
            [final, jnp.where(dup, NEG_INF, reg_score)[:, None]], axis=1
        )                                                          # [B, K+1]
        all_hist = jnp.concatenate([hist, reg_tokens[:, None, :]], axis=1)
        sorted_scores, order = jax.lax.top_k(all_scores, k)       # [B, K]
        sorted_tokens = jnp.take_along_axis(
            all_hist, order[:, :, None], axis=1
        )                                                          # [B, K, L]
        return sorted_tokens, sorted_scores
    best = jnp.argmax(final, axis=1)  # [B]
    best_tokens = jnp.take_along_axis(
        hist, best[:, None, None], axis=1
    )[:, 0, :]
    best_scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    # a finished hypothesis evicted from the pool can still win here; ties
    # prefer the pool (identical results when no eviction ever happened)
    use_reg = reg_score > best_scores
    best_tokens = jnp.where(use_reg[:, None], reg_tokens, best_tokens)
    best_scores = jnp.where(use_reg, reg_score, best_scores)
    return best_tokens, best_scores


def make_beam_caption_fn(
    beam_size: int,
    max_pos_len: int,
    max_len: int,
    length_penalty: float = 0.0,
    fused: Optional[bool] = None,
    block_unk: bool = False,
    early_stop: bool = True,
    topk_mode: str = "auto",
    return_all: bool = False,
    diversity_groups: int = 0,
    diversity_penalty: float = 0.5,
):
    """Jitted (params, app, motion) -> (tokens [B, L], pos_tags [B, Lp]).

    `return_all=True` -> (tokens [B, K, L], scores [B, K], pos_tags):
    the full beam, best-first (n-best surface; `cxg-caption --nbest`)."""

    from controllable_xgating_tpu.ops.dispatch import fused_enabled

    fused = fused_enabled(fused)

    @jax.jit
    def fn(
        params: CaptionerParams,
        app: jax.Array,
        motion: jax.Array,
        frame_mask=None,
    ):
        ctx, summary, tags = encode_for_inference(
            params, app, motion, frame_mask, max_pos_len=max_pos_len,
            fused=fused, early_stop=early_stop,
        )
        tokens, scores = beam_search(
            params.decoder, ctx, summary, beam_size, max_len, length_penalty,
            fused=fused, block_unk=block_unk, early_stop=early_stop,
            topk_mode=topk_mode, return_all=return_all,
            diversity_groups=diversity_groups,
            diversity_penalty=diversity_penalty,
        )
        if return_all:
            return tokens, scores, tags
        return tokens, tags

    return fn
