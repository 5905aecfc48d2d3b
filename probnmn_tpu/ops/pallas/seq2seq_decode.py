r"""
Fused Pallas TPU kernel: the whole seq2seq sampling forward in ONE kernel.

Why: the XLA path (``models/seq2seq.py::seq2seq_forward``) is a ``lax.scan``
over 46 encoder + 26 decoder steps; on TPU each scan step costs ~30 us of
dispatch (measured, PERF.md) while the step's actual compute is ~2 us
(slope-measured inside a kernel, ``scripts/microbench_kernel_costs.py``) — the
ProgramGenerator sampling decode is ~2-3 ms/batch-256 of almost pure dispatch.
The same dispatch tax applies to every small XLA op OUTSIDE a kernel, so this
kernel absorbs the whole pipeline: boundary handling, the masked encoder, the
attentive sampling decoder, @end@ trimming AND the length-normalized REINFORCE
loss — the wrapper is ~4 XLA ops (transpose, seed derivation, two slices).

Semantics reproduce ``seq2seq_forward(params, spec, source, None, "sampling",
rng)`` — the serving path of the reference's ``Seq2SeqBase.forward`` with
``decoding_strategy="sampling"`` and no targets (reference
``probnmn/modules/seq2seq_base.py:157-276``):

- boundary add (@end@ after the last valid token; @start@ stripped from the
  source) done in-kernel from the raw token grid and per-row lengths;
- source embedding with zeroed-pad semantics -> multi-layer masked LSTM where
  state freezes at padded steps and padded outputs are zero (packed-sequence
  behavior of torch ``nn.LSTM``);
- decoder hidden initialized from the final encoder state, context zero;
- per step: embed previous token, dot-product attention of the previous
  decoder hidden over encoder outputs (masked softmax), LSTMCell over
  ``concat(attended, embedded)``, output projection;
- categorical sampling with @@PADDING@@/@@UNKNOWN@@/@start@ blocked, via the
  Gumbel-max trick: ``argmax(blocked_logits + gumbel)`` IS a categorical draw
  over the renormalized blocked distribution (exactly what
  ``torch.multinomial`` over zeroed probabilities computes, reference
  ``seq2seq_base.py:211-215``). Noise comes from the TPU hardware PRNG
  (seeded per call from the caller's jax key, so runs are reproducible), or —
  for tests — from an explicit ``noise`` tensor, which makes the kernel
  bit-comparable against :func:`sampling_forward_with_noise_xla`;
- per-step logprob of the chosen token from the full UNBLOCKED log-softmax
  (reference ``seq2seq_base.py:219-225``);
- @end@ trimming (keep through the first @end@; a row whose FIRST token is
  @end@ becomes all zeros — the reference's exact quirk, see
  ``ops/common.py::trim_at_end``) and the length-normalized negative-logprob
  loss are computed inside the decode loop with carried keep/kill masks.

The sampled token stream differs from the scan path's
``jax.random.categorical`` stream (different noise source), but the
distribution is identical; tests drive both the kernel and an XLA replica
from the SAME noise tensor and check exact agreement, plus a distributional
test against the scan path.

In-kernel layouts: time-major. Source tokens arrive as (L, B) so each step
reads one sublane row; encoder outputs live in a (S, B, H) VMEM scratch;
attention is a bf16 multiply with f32 reduce over H (VPU) rather than a
batched matmul (Mosaic dots are 2-D). The softmax denominator over S is an
MXU dot with a ones row — Mosaic cannot lower a sublane-dim SUM to a keepdims
vector, while the sublane MAX lowers fine. The sampled token is carried
BETWEEN steps as its one-hot row (it feeds the next embedding matmul
directly); token ids are reconstructed via a lane-iota dot only for the
output buffer. All weights are VMEM-resident for the whole kernel (~4 MB at
CLEVR scale, bf16). Grid over batch blocks of 128 bounds VMEM; weight blocks
are grid-invariant so Mosaic keeps them resident.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probnmn_tpu.ops.common import (
    NEG_INF,
    length_normalized_logprob_loss,
    trim_at_end,
)

LANE = 128
BATCH_BLOCK = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lstm_gates(x, h, w_ih_ref, w_hh_ref, bias_ref, hidden, compute_dtype):
    r"""One LSTM cell update in f32 math with ``compute_dtype`` matmul operands."""
    gates = (
        jnp.dot(x.astype(compute_dtype), w_ih_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h.astype(compute_dtype), w_hh_ref[:], preferred_element_type=jnp.float32)
        + bias_ref[:]
    )
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    return i, f, g, o


def _sampling_kernel(
    seed_ref,         # (1,) int32 SMEM — hardware-PRNG seed (unused with noise)
    src_ref,          # (L, B) int32 — RAW right-padded source tokens
    noise_ref,        # (T, B, Vp) f32 — explicit Gumbel noise, or (1, 1, 1) dummy
    src_emb_ref,      # (Vsp, D) compute_dtype
    tgt_emb_ref,      # (Vtp, D) compute_dtype
    *refs,            # encoder weights x L, decoder weights, outputs, scratch
    spec_static,
):
    (num_layers, hidden, tgt_vocab, pad, unk, start, end,
     num_steps, t_pad, compute_dtype, use_hw_prng) = spec_static
    enc_wih = refs[: num_layers]
    enc_whh = refs[num_layers: 2 * num_layers]
    enc_bias = refs[2 * num_layers: 3 * num_layers]
    (dec_wih_ref, dec_whh_ref, dec_bias_ref, proj_w_ref, proj_b_ref,
     preds_out_ref, loss_out_ref, logprobs_out_ref, enc_scratch) = refs[3 * num_layers:]

    raw_len, batch = src_ref.shape
    seq_len = raw_len + 1  # @end@ appended after the last valid token
    vp = proj_w_ref.shape[1]

    if use_hw_prng:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    # Per-row source lengths: sublane-sum via an MXU dot with a ones row.
    ones_raw = jnp.ones((1, raw_len), jnp.float32)
    lens = jnp.dot(ones_raw, (src_ref[:] != pad).astype(jnp.float32),
                   preferred_element_type=jnp.float32)  # (1, B)

    # ---------------------------------------------------------------- encoder
    def boundary_token(t):
        r"""Row t of the boundary-added, @start@-stripped source: raw token
        while t < len, @end@ at t == len, pad after."""
        row = src_ref[pl.ds(jnp.minimum(t, raw_len - 1), 1), :]  # (1, B)
        tf = t.astype(jnp.float32)
        return jnp.where(tf < lens, row,
                         jnp.where(tf == lens, jnp.int32(end), jnp.int32(pad)))

    def enc_step(t, carry):
        states = carry
        tok = boundary_token(t).reshape(batch, 1)     # (B, 1)
        m = (tok != pad).astype(jnp.float32)
        lanes_s = jax.lax.broadcasted_iota(jnp.int32, (batch, src_emb_ref.shape[0]), 1)
        oh = (lanes_s == tok).astype(compute_dtype)
        x = jnp.dot(oh, src_emb_ref[:], preferred_element_type=jnp.float32)
        x = x * m  # zeroed-pad embedding row semantics
        new_states = []
        for layer in range(num_layers):
            h, c = states[2 * layer], states[2 * layer + 1]
            i, f, g, o = _lstm_gates(
                x, h, enc_wih[layer], enc_whh[layer], enc_bias[layer],
                hidden, compute_dtype,
            )
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            # Packed-sequence semantics: state freezes at padded steps.
            h = m * h_new + (1.0 - m) * h
            c = m * c_new + (1.0 - m) * c
            new_states += [h, c]
            x = h * m  # padded outputs are zero for the next layer / attention
        enc_scratch[pl.ds(t, 1)] = x.astype(compute_dtype)[None]
        return tuple(new_states)

    zeros = jnp.zeros((batch, hidden), jnp.float32)
    finals = jax.lax.fori_loop(
        0, seq_len, enc_step, tuple(zeros for _ in range(2 * num_layers))
    )
    h_dec = finals[2 * (num_layers - 1)]  # final top-layer hidden
    c_dec = jnp.zeros_like(h_dec)         # decoder context starts at zero

    # Additive attention mask (S, B): 0 on valid steps, NEG_INF on padding.
    steps_col = jax.lax.broadcasted_iota(jnp.int32, (seq_len, batch), 0).astype(jnp.float32)
    src_neg = jnp.where(steps_col <= lens, 0.0, NEG_INF).astype(jnp.float32)

    ones_row = jnp.ones((1, seq_len), jnp.float32)
    lanes_b = jax.lax.broadcasted_iota(jnp.int32, (batch, vp), 1)
    lanes_f = lanes_b.astype(jnp.float32)
    sample_blocked = jnp.where(
        (lanes_b >= tgt_vocab) | (lanes_b == pad) | (lanes_b == unk) | (lanes_b == start),
        NEG_INF, 0.0,
    )
    lse_blocked = jnp.where(lanes_b >= tgt_vocab, NEG_INF, 0.0)
    is_end_lane = (lanes_b == end).astype(jnp.float32)
    step_lanes = jax.lax.broadcasted_iota(jnp.int32, (batch, t_pad), 1)

    # ---------------------------------------------------------------- decoder
    def dec_step(t, carry):
        h, c, tok_oh, alive, kill, preds_acc, lp_acc, lp_sum, lp_cnt = carry
        emb = jnp.dot(tok_oh.astype(compute_dtype), tgt_emb_ref[:],
                      preferred_element_type=jnp.float32)

        # Attention with the PREVIOUS decoder hidden: bf16 products, f32
        # reduces; softmax over S with max in sublanes + ones-row MXU dot.
        enc = enc_scratch[:]
        scores = jnp.sum(
            (enc * h.astype(compute_dtype)[None]).astype(jnp.float32), axis=-1
        ) + src_neg
        scores = scores - jnp.max(scores, axis=0, keepdims=True)
        weights = jnp.exp(scores)
        denom = jnp.dot(ones_row, weights, preferred_element_type=jnp.float32)
        weights = weights / denom
        attended = jnp.sum(
            (enc * weights[:, :, None].astype(compute_dtype)).astype(jnp.float32),
            axis=0,
        )

        cell_in = jnp.concatenate([attended, emb], axis=-1)
        i, f, g, o = _lstm_gates(
            cell_in, h, dec_wih_ref, dec_whh_ref, dec_bias_ref, hidden, compute_dtype
        )
        c = f * c + i * g
        h = o * jnp.tanh(c)

        logits = (
            jnp.dot(h.astype(compute_dtype), proj_w_ref[:],
                    preferred_element_type=jnp.float32)
            + proj_b_ref[:]
        )
        # Unblocked log-softmax normalizer over the REAL vocab lanes only.
        real = logits + lse_blocked
        mx = jnp.max(real, axis=-1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(real - mx), axis=-1, keepdims=True)) + mx

        if use_hw_prng:
            bits = pltpu.bitcast(pltpu.prng_random_bits((batch, vp)), jnp.uint32)
            # Mosaic cannot cast uint32->f32; the top-24-bit value fits int32.
            bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
            u = bits24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
            gumbel = -jnp.log(-jnp.log(u))
        else:
            gumbel = noise_ref[pl.ds(t, 1)].reshape(batch, vp)

        comb = logits + sample_blocked + gumbel
        maxv = jnp.max(comb, axis=-1, keepdims=True)
        # First-occurrence argmax as a one-hot row (stays in lane layout; it is
        # both the next step's embedding input and the id/logprob selector).
        winner_lane = jnp.min(jnp.where(comb >= maxv, lanes_b, vp), axis=-1,
                              keepdims=True)
        tok_oh = (lanes_b == winner_lane).astype(jnp.float32)

        token_f = jnp.sum(tok_oh * lanes_f, axis=-1, keepdims=True)       # (B, 1)
        chosen_logprob = jnp.sum(tok_oh * logits, axis=-1, keepdims=True) - lse
        is_end = jnp.sum(tok_oh * is_end_lane, axis=-1, keepdims=True)

        # Reference trim quirk: a row whose FIRST sampled token is @end@ is
        # zeroed entirely; otherwise keep through (and including) the first
        # @end@ (ops/common.py::trim_at_end).
        kill = kill + jnp.where(t == 0, is_end, 0.0)
        keep = alive * (1.0 - kill)
        alive = alive * (1.0 - is_end)

        step_oh = (step_lanes == t).astype(jnp.float32)
        preds_acc = preds_acc + (token_f * keep) * step_oh
        lp_acc = lp_acc + chosen_logprob * step_oh
        lp_sum = lp_sum + chosen_logprob * keep
        lp_cnt = lp_cnt + keep
        return h, c, tok_oh, alive, kill, preds_acc, lp_acc, lp_sum, lp_cnt

    start_oh = (lanes_b == start).astype(jnp.float32)
    one_col = jnp.ones((batch, 1), jnp.float32)
    init = (
        h_dec, c_dec, start_oh, one_col, jnp.zeros_like(one_col),
        jnp.zeros((batch, t_pad), jnp.float32), jnp.zeros((batch, t_pad), jnp.float32),
        jnp.zeros_like(one_col), jnp.zeros_like(one_col),
    )
    (_, _, _, _, _, preds, lp_raw, lp_sum, lp_cnt) = jax.lax.fori_loop(
        0, num_steps, dec_step, init
    )
    preds_out_ref[:] = preds.astype(jnp.int32)
    logprobs_out_ref[:] = lp_raw
    loss_out_ref[:] = -(lp_sum / (lp_cnt + 1e-12))


def fused_sampling_forward(
    params: Dict[str, Any],
    spec,
    source_tokens: jax.Array,
    rng: jax.Array,
    *,
    compute_dtype=jnp.bfloat16,
    batch_block: int = BATCH_BLOCK,
    noise: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Dict[str, jax.Array]:
    r"""Drop-in fused replacement for ``seq2seq_forward(..., None, "sampling", rng)``.

    Returns ``{"predictions": (B, T) trimmed, "loss": (B,), "logprobs": (B, T)}``
    with the same semantics as the XLA scan path (different — but identically
    distributed — sample stream). Pass ``noise`` (T, B, round_up(V, 128)) to
    drive sampling from explicit Gumbel noise instead of the TPU hardware PRNG
    (tests; deterministic replay). Weight packing is pure jnp on ``params`` so
    it hoists out of any serving loop under jit.
    """
    batch, raw_len = source_tokens.shape
    num_steps = spec.max_decoding_steps
    hidden = spec.hidden_size
    num_layers = spec.num_layers
    t_pad = _round_up(num_steps, LANE)
    vsp = _round_up(spec.source_vocab_size, LANE)
    vtp = _round_up(spec.target_vocab_size, LANE)

    src_t = jnp.swapaxes(source_tokens, 0, 1).astype(jnp.int32)  # (L, B)

    use_hw_prng = noise is None
    if use_hw_prng:
        seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
        noise = jnp.zeros((1, 1, 1), jnp.float32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    def pad_rows(w, rows):
        return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))

    src_emb = pad_rows(params["source_embedding"], vsp).astype(compute_dtype)
    tgt_emb = pad_rows(params["target_embedding"], vtp).astype(compute_dtype)
    enc_wih = [p["w_ih"].T.astype(compute_dtype) for p in params["encoder"]]
    enc_whh = [p["w_hh"].T.astype(compute_dtype) for p in params["encoder"]]
    enc_bias = [(p["b_ih"] + p["b_hh"])[None].astype(jnp.float32) for p in params["encoder"]]
    cell = params["decoder_cell"]
    dec_wih = cell["w_ih"].T.astype(compute_dtype)
    dec_whh = cell["w_hh"].T.astype(compute_dtype)
    dec_bias = (cell["b_ih"] + cell["b_hh"])[None].astype(jnp.float32)
    proj = params["output_projection"]
    proj_w = jnp.pad(proj["w"], ((0, vtp - proj["w"].shape[0]), (0, 0))).T.astype(compute_dtype)
    proj_b = jnp.pad(proj["b"], (0, vtp - proj["b"].shape[0]))[None].astype(jnp.float32)

    bb = min(batch_block, batch)
    padded_batch = _round_up(batch, bb)
    if padded_batch != batch:
        src_t = jnp.pad(src_t, ((0, 0), (0, padded_batch - batch)))
        if not use_hw_prng:
            noise = jnp.pad(noise, ((0, 0), (0, padded_batch - batch), (0, 0)))
    grid = (padded_batch // bb,)

    spec_static = (
        num_layers, hidden, spec.target_vocab_size,
        spec.pad_index, spec.unk_index, spec.start_index, spec.end_index,
        num_steps, t_pad, compute_dtype, use_hw_prng,
    )

    def fixed(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    noise_spec = (
        fixed(noise.shape) if use_hw_prng
        else pl.BlockSpec((num_steps, bb, vtp), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((raw_len, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        noise_spec,
        fixed(src_emb.shape),
        fixed(tgt_emb.shape),
        *[fixed(w.shape) for w in enc_wih],
        *[fixed(w.shape) for w in enc_whh],
        *[fixed(b.shape) for b in enc_bias],
        fixed(dec_wih.shape),
        fixed(dec_whh.shape),
        fixed(dec_bias.shape),
        fixed(proj_w.shape),
        fixed(proj_b.shape),
    ]
    out_specs = [
        pl.BlockSpec((bb, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((padded_batch, t_pad), jnp.int32),
        jax.ShapeDtypeStruct((padded_batch, 1), jnp.float32),
        jax.ShapeDtypeStruct((padded_batch, t_pad), jnp.float32),
    ]

    preds_pad, loss_pad, logprobs_pad = pl.pallas_call(
        partial(_sampling_kernel, spec_static=spec_static),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((raw_len + 1, bb, hidden), compute_dtype)],
        # The per-step attention materializes (S, BB, H) temporaries; the
        # default 16 MB scoped-VMEM budget is too tight at BB=128.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        seed, src_t, noise, src_emb, tgt_emb,
        *enc_wih, *enc_whh, *enc_bias,
        dec_wih, dec_whh, dec_bias, proj_w, proj_b,
    )

    return {
        "predictions": preds_pad[:batch, :num_steps],
        "loss": loss_pad[:batch, 0],
        "logprobs": logprobs_pad[:batch, :num_steps],
    }


def sampling_forward_with_noise_xla(
    params: Dict[str, Any], spec, source_tokens: jax.Array, gumbel: jax.Array
) -> Dict[str, jax.Array]:
    r"""XLA replica of the fused kernel driven by EXPLICIT Gumbel noise.

    Identical math to ``models/seq2seq.py::seq2seq_forward`` sampling except the
    categorical draw is ``argmax(blocked_logits + gumbel[t])`` — the same
    Gumbel-max form the kernel uses, so feeding both the same noise tensor must
    produce identical token streams. Test-support code (also handy for
    deterministic replay); the production XLA path stays ``jax.random.categorical``.
    """
    from probnmn_tpu.models.seq2seq import _decode_step, _encode

    batch = source_tokens.shape[0]
    encoder_outputs, source_mask, h0, c0 = _encode(params, spec, source_tokens)
    blocked = (spec.pad_index, spec.unk_index, spec.start_index)

    def step(carry, inputs):
        h, c, last = carry
        t, noise = inputs
        logits, h, c = _decode_step(
            params, spec, last, h, c, encoder_outputs, source_mask
        )
        masked = logits
        for index in blocked:
            masked = masked.at[..., index].set(NEG_INF)
        predicted = jnp.argmax(masked + noise[:, : logits.shape[-1]], axis=-1).astype(
            last.dtype
        )
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        chosen = jnp.take_along_axis(log_probs, predicted[:, None], axis=-1)[:, 0]
        return (h, c, predicted), (predicted, chosen)

    start = jnp.full((batch,), spec.start_index, source_tokens.dtype)
    num_steps = spec.max_decoding_steps
    (_, _, _), (step_preds, step_logprobs) = jax.lax.scan(
        step, (h0, c0, start), (jnp.arange(num_steps), gumbel)
    )
    preds = jnp.swapaxes(step_preds, 0, 1)
    logprobs = jnp.swapaxes(step_logprobs, 0, 1)
    predictions = trim_at_end(preds, spec.end_index)
    loss = length_normalized_logprob_loss(logprobs, predictions, spec.pad_index)
    return {"predictions": predictions, "loss": loss, "logprobs": logprobs}


def fused_sampling_forward_dp(mesh, params, spec, source_tokens, rng,
                              noise=None, **kw):
    r"""Data-parallel :func:`fused_sampling_forward` via ``shard_map`` over the
    mesh's ``data`` axis: params replicate, the batch shards, and each shard
    folds its ``data`` coordinate into the PRNG key so shards draw independent
    hardware-PRNG noise. With an explicit ``noise`` tensor (tests /
    deterministic replay; the TPU hardware PRNG has no CPU interpreter), the
    noise shards along its batch dim instead and the fold is unnecessary."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    if noise is not None:
        def fn(p, s, n):
            return fused_sampling_forward(
                p, spec, s, rng, noise=n, **kw)["predictions"]

        return shard_map(fn, mesh=mesh,
                         in_specs=(P(), P(axis), P(None, axis, None)),
                         out_specs=P(axis), check_vma=False)(
            params, source_tokens, noise)

    def fn(p, s, r):
        r = jax.random.fold_in(r, jax.lax.axis_index(axis))
        return fused_sampling_forward(p, spec, s, r, **kw)["predictions"]

    return shard_map(fn, mesh=mesh, in_specs=(P(), P(axis), P()),
                     out_specs=P(axis), check_vma=False)(
        params, source_tokens, rng)
