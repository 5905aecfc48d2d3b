r"""
Differentiable fused Pallas seq2seq: teacher-forced forward + BPTT backward.

Why: the question-coding / joint-training step runs FIVE seq2seq passes
(supervised PG + QR, free-running PG, reconstructing QR, frozen prior), each a
``lax.scan`` whose per-step dispatch (~17 us) dwarfs its ~2 us of compute —
~18 ms/step of almost pure dispatch at batch 256 (PERF.md). This module
replaces a pass's forward AND backward with two Pallas kernels under
``jax.custom_vjp``.

Performance structure (v2 — the naive per-step form measured SLOWER than the
XLA scan on the backward):

- Everything that does not depend on the recurrent state is hoisted out of the
  time loops into big MXU matmuls: the boundary-token grid and pad masks are
  built vectorized; the source embedding + encoder layer-0 input projection
  and the (teacher-forced, hence known) decoder token embeddings + their gate
  contribution are each ONE (steps*batch, .) matmul.
- The backward does NOT update weight gradients per step (a rank-B `+=` into
  multi-MB accumulators every step). It stores the per-step gate cotangents
  ``dpre`` over the scratch that held the activated gates, and computes every
  weight gradient AFTER the sweep as one contract-over-(steps*batch)
  ``dot_general``, directly in the parameter's own torch layout.
- Per-step work is only what recurrence forces: the h @ W_hh matmuls, the
  attention (VPU multiply-reduces over (S, B, H)), and the LSTM cell algebra.
- Trajectories live in VMEM (v5e has ~128 MB; ~75 MB at batch-block 64).

Semantics: identical to ``seq2seq_forward(params, spec, src, tgt, ...)`` of
``models/seq2seq.py`` — the reference ``Seq2SeqBase`` teacher-forced path
(reference ``probnmn/modules/seq2seq_base.py:157-276``, loss scheme
``:295-341``) — including the masked-mean CE with allennlp's 1e-13 epsilon.
``reinforce_norm=True`` switches the loss to the free-running REINFORCE form:
targets are a TRIMMED sampled sequence z (no boundary @end@ appended), and the
loss is the length-normalized negative logprob of z's tokens with allennlp's
1e-12 epsilon (reference ``seq2seq_base.py:235-246``) — mathematically the
gradient of the scan path's free-running loss at the same z, since sampling is
a stop-gradient and only the chosen-token logprobs carry parameter gradients.
Tests check loss AND every gradient leaf against ``jax.grad`` of the XLA path.

Dropout is not supported in the fused path (all shipped configs use
DROPOUT=0.0); callers must gate on ``spec.dropout == 0``.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probnmn_tpu.ops.common import NEG_INF

LANE = 128
BATCH_BLOCK = 64
CE_EPS = 1e-13         # allennlp sequence_cross_entropy_with_logits
REINFORCE_EPS = 1e-12  # length-normalized logprob loss


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _contract_steps(a, b):
    r"""(N, M) x (N, K) -> (M, K): weight-gradient matmul, contracting the
    flattened steps*batch dim. Output lands directly in torch layout."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _ones_row_sum(x):
    r"""Column sums as a (1, N) row via an MXU ones-dot (Mosaic cannot lower a
    sublane-dim SUM to a keepdims vector)."""
    return jnp.dot(jnp.ones((1, x.shape[0]), jnp.float32), x,
                   preferred_element_type=jnp.float32)


def _split_gates(gates, hidden):
    return (gates[:, :hidden], gates[:, hidden:2 * hidden],
            gates[:, 2 * hidden:3 * hidden], gates[:, 3 * hidden:])


def _activated(pre, hidden):
    i, f, g, o = _split_gates(pre, hidden)
    return (jax.nn.sigmoid(i), jax.nn.sigmoid(f), jnp.tanh(g), jax.nn.sigmoid(o))


def _kernel_common(src_ref, tgt_ref, spec_static, proj_w_ref):
    r"""Vectorized boundary grids, masks and lengths shared by fwd/bwd kernels.

    Returns a dict of VALUES (no per-step token reads):
    - src_bound (S, B) int32: boundary-added @start@-stripped source rows
    - src_m (S, B) f32 pad mask; src_neg (S, B) additive attention mask
    - dec_in (T, B) int32 decoder input tokens; dec_label (T, B) labels
    - dec_m (T, B) f32 label mask
    """
    (num_layers, hidden, tgt_vocab, pad, start, end,
     reinforce_norm, compute_dtype) = spec_static
    _, ls, batch = src_ref.shape
    lt = tgt_ref.shape[1]
    seq_len = ls + 1
    num_steps = lt if reinforce_norm else lt + 1
    vp = proj_w_ref.shape[1]

    src = src_ref[0]
    src_lens = jnp.dot(jnp.ones((1, ls), jnp.float32),
                       (src != pad).astype(jnp.float32),
                       preferred_element_type=jnp.float32)      # (1, B)
    rows_s = jax.lax.broadcasted_iota(jnp.int32, (seq_len, batch), 0).astype(jnp.float32)
    src_pad = jnp.concatenate([src, jnp.zeros((1, batch), jnp.int32)], axis=0)
    src_bound = jnp.where(rows_s < src_lens, src_pad,
                          jnp.where(rows_s == src_lens, jnp.int32(end), jnp.int32(pad)))
    src_m = (src_bound != pad).astype(jnp.float32)
    src_neg = jnp.where(rows_s <= src_lens, 0.0, NEG_INF).astype(jnp.float32)

    tgt = tgt_ref[0]
    if reinforce_norm:
        # Labels are the raw (trimmed, sampled) rows; inputs the shifted rows.
        dec_label = tgt
        dec_in = jnp.concatenate(
            [jnp.full((1, batch), start, jnp.int32), tgt[:lt - 1]], axis=0
        )
    else:
        tgt_lens = jnp.dot(jnp.ones((1, lt), jnp.float32),
                           (tgt != pad).astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        rows_t = jax.lax.broadcasted_iota(jnp.int32, (num_steps, batch), 0).astype(jnp.float32)
        tgt_pad = jnp.concatenate([tgt, jnp.zeros((1, batch), jnp.int32)], axis=0)
        tgt_bound = jnp.where(rows_t < tgt_lens, tgt_pad,
                              jnp.where(rows_t == tgt_lens, jnp.int32(end), jnp.int32(pad)))
        dec_label = tgt_bound
        dec_in = jnp.concatenate(
            [jnp.full((1, batch), start, jnp.int32), tgt_bound[:num_steps - 1]], axis=0
        )
    dec_m = (dec_label != pad).astype(jnp.float32)

    lanes_b = jax.lax.broadcasted_iota(jnp.int32, (batch, vp), 1)
    return dict(
        seq_len=seq_len, num_steps=num_steps, batch=batch, vp=vp,
        src_bound=src_bound, src_m=src_m, src_neg=src_neg,
        dec_in=dec_in, dec_label=dec_label, dec_m=dec_m,
        lanes_b=lanes_b,
        lse_blocked=jnp.where(lanes_b >= tgt_vocab, NEG_INF, 0.0),
        ones_seq=jnp.ones((1, seq_len), jnp.float32),
    )


def _embed_rows(tokens_2d, emb_ref, compute_dtype):
    r"""(N, B) int32 -> (N, B, D): one-hot matmul embed of a whole token grid
    (one MXU matmul over the flattened (N*B) rows)."""
    n, batch = tokens_2d.shape
    vocab = emb_ref.shape[0]
    oh = (tokens_2d[:, :, None]
          == jax.lax.broadcasted_iota(jnp.int32, (n, batch, vocab), 2)).astype(compute_dtype)
    flat = jnp.dot(oh.reshape(n * batch, vocab), emb_ref[:],
                   preferred_element_type=jnp.float32)
    return flat.reshape(n, batch, emb_ref.shape[1])


# ===================================================================== forward
def _tf_forward_kernel(
    src_ref,        # (1, Ls, B) int32 raw source (leading dim = batch block)
    tgt_ref,        # (1, Lt, B) int32 raw target
    src_emb_ref,    # (Vsp, D)
    tgt_emb_ref,    # (Vtp, D)
    *refs,
    spec_static,
):
    (num_layers, hidden, tgt_vocab, pad, start, end,
     reinforce_norm, compute_dtype) = spec_static
    L = num_layers
    enc_wih = refs[:L]
    enc_whh = refs[L:2 * L]
    enc_bias = refs[2 * L:3 * L]
    (dec_wih_ref, dec_whh_ref, dec_bias_ref, proj_w_ref, proj_b_ref,
     loss_out_ref, enc_scratch, xproj_scr, eproj_scr, srcm_scr, label_scr,
     ) = refs[3 * L:]

    c = _kernel_common(src_ref, tgt_ref, spec_static, proj_w_ref)
    seq_len, num_steps, batch, vp = c["seq_len"], c["num_steps"], c["batch"], c["vp"]

    # Per-step-sliced grids go through scratch (pl.ds needs a ref, not a value).
    srcm_scr[...] = c["src_m"]
    label_scr[...] = c["dec_label"]

    # Hoisted input projections: ONE big matmul each for the encoder layer-0
    # x-part and the decoder's (known) token-embedding gate part.
    x0 = _embed_rows(c["src_bound"], src_emb_ref, compute_dtype)  # (S, B, D)
    x0 = x0 * c["src_m"][:, :, None]
    dsize = x0.shape[-1]
    xproj_scr[...] = jnp.dot(
        x0.reshape(seq_len * batch, dsize).astype(compute_dtype), enc_wih[0][:],
        preferred_element_type=jnp.float32,
    ).reshape(seq_len, batch, 4 * hidden)

    emb = _embed_rows(c["dec_in"], tgt_emb_ref, compute_dtype)    # (T, B, D)
    eproj_scr[...] = jnp.dot(
        emb.reshape(num_steps * batch, dsize).astype(compute_dtype),
        dec_wih_ref[hidden:, :],
        preferred_element_type=jnp.float32,
    ).reshape(num_steps, batch, 4 * hidden)

    # ------------------------------------------------------------- encoder
    def enc_step(t, states):
        m = srcm_scr[pl.ds(t, 1), :].reshape(batch, 1)
        new_states = []
        x = None
        for layer in range(L):
            h, cc = states[2 * layer], states[2 * layer + 1]
            if layer == 0:
                pre = xproj_scr[pl.ds(t, 1)].reshape(batch, 4 * hidden)
            else:
                pre = jnp.dot(x.astype(compute_dtype), enc_wih[layer][:],
                              preferred_element_type=jnp.float32)
            pre = pre + jnp.dot(h.astype(compute_dtype), enc_whh[layer][:],
                                preferred_element_type=jnp.float32) + enc_bias[layer][:]
            i, f, g, o = _activated(pre, hidden)
            c_new = f * cc + i * g
            h_new = o * jnp.tanh(c_new)
            h = m * h_new + (1.0 - m) * h
            cc = m * c_new + (1.0 - m) * cc
            new_states += [h, cc]
            x = h * m
        enc_scratch[pl.ds(t, 1)] = x.astype(compute_dtype)[None]
        return tuple(new_states)

    zeros = jnp.zeros((batch, hidden), jnp.float32)
    finals = jax.lax.fori_loop(0, seq_len, enc_step,
                               tuple(zeros for _ in range(2 * L)))

    # ------------------------------------------------------------- decoder
    def dec_step(t, carry):
        h, cc, num, den = carry
        enc = enc_scratch[:]
        scores = jnp.sum(
            (enc * h.astype(compute_dtype)[None]).astype(jnp.float32), axis=-1
        ) + c["src_neg"]
        scores = scores - jnp.max(scores, axis=0, keepdims=True)
        weights = jnp.exp(scores)
        weights = weights / jnp.dot(c["ones_seq"], weights,
                                    preferred_element_type=jnp.float32)
        attended = jnp.sum(
            (enc * weights[:, :, None].astype(compute_dtype)).astype(jnp.float32), axis=0
        )

        pre = (
            jnp.dot(attended.astype(compute_dtype), dec_wih_ref[:hidden, :],
                    preferred_element_type=jnp.float32)
            + eproj_scr[pl.ds(t, 1)].reshape(batch, 4 * hidden)
            + jnp.dot(h.astype(compute_dtype), dec_whh_ref[:],
                      preferred_element_type=jnp.float32)
            + dec_bias_ref[:]
        )
        i, f, g, o = _activated(pre, hidden)
        cc = f * cc + i * g
        h = o * jnp.tanh(cc)

        logits = (
            jnp.dot(h.astype(compute_dtype), proj_w_ref[:],
                    preferred_element_type=jnp.float32)
            + proj_b_ref[:]
        )
        real = logits + c["lse_blocked"]
        mx = jnp.max(real, axis=-1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(real - mx), axis=-1, keepdims=True)) + mx
        label = label_scr[pl.ds(t, 1), :].reshape(batch, 1)
        label_oh = (c["lanes_b"] == label).astype(jnp.float32)
        ce = lse - jnp.sum(label_oh * logits, axis=-1, keepdims=True)

        m_col = (label != pad).astype(jnp.float32)
        return h, cc, num + m_col * ce, den + m_col

    (_, _, num, den) = jax.lax.fori_loop(
        0, num_steps, dec_step,
        (finals[2 * (L - 1)], jnp.zeros_like(zeros),
         jnp.zeros((batch, 1), jnp.float32), jnp.zeros((batch, 1), jnp.float32)),
    )
    eps = REINFORCE_EPS if reinforce_norm else CE_EPS
    loss_out_ref[0] = num / (den + eps)


# ==================================================================== backward
def _tf_backward_kernel(
    src_ref,        # (1, Ls, B) int32
    tgt_ref,        # (1, Lt, B) int32
    dloss_ref,      # (1, B, 1) f32 cotangent of the per-example loss
    src_emb_ref,    # (Vsp, D)
    tgt_emb_ref,    # (Vtp, D)
    *refs,
    spec_static,
):
    (num_layers, hidden, tgt_vocab, pad, start, end,
     reinforce_norm, compute_dtype) = spec_static
    L = num_layers
    k = 0
    enc_wih = refs[k:k + L]; k += L            # (Din, 4H) forward layout
    enc_whh = refs[k:k + L]; k += L            # (H, 4H)
    enc_bias = refs[k:k + L]; k += L           # (1, 4H)
    enc_wih_t = refs[k:k + L]; k += L          # (4H, Din) backward layout
    enc_whh_t = refs[k:k + L]; k += L          # (4H, H)
    (dec_wih_ref, dec_whh_ref, dec_bias_ref, dec_wih_t_ref, dec_whh_t_ref,
     proj_w_ref, proj_b_ref, proj_w_t_ref) = refs[k:k + 8]; k += 8
    out_refs = refs[k:k + 3 * L + 7]; k += 3 * L + 7
    (d_src_emb_ref, d_tgt_emb_ref) = out_refs[0:2]
    d_enc = out_refs[2:2 + 3 * L]
    (d_dec_wih_ref, d_dec_whh_ref, d_dec_bias_ref,
     d_proj_w_ref, d_proj_b_ref) = out_refs[2 + 3 * L:]
    (enc_scratch,      # (S, B, H) compute dtype — encoder outputs
     enc_h_scr,        # (L*S, B, H) f32 post-freeze hidden, layer-major rows
     enc_c_scr,        # (L*S, B, H) f32 post-freeze cell
     enc_g_scr,        # (L*S, B, 4H) f32: activated gates, then dpre (reused)
     enc_x_scr,        # (S, B, D) f32 embedded source (pad-zeroed)
     dec_h_scr,        # (T+1, B, H) f32, index 0 = decoder init
     dec_c_scr,        # (T, B, H) f32
     dec_g_scr,        # (T, B, 4H) f32: activated gates, then dpre (reused)
     dec_in_scr,       # (T, B, H+D) f32 cell input [attended, emb]
     dec_w_scr,        # (T, S, B) f32 attention weights
     dec_l_scr,        # (T, B, Vp) f32: dlogits trajectory
     denc_scr,         # (S, B, H) f32 encoder-output cotangent accumulator
     aux_scr,          # (2L*S, B, H) f32: post-sweep matmul operands + dx0
     srcm_scr,         # (S, B) f32 source pad mask
     label_scr,        # (T, B) int32 decoder labels
     ) = refs[k:]

    b_idx = pl.program_id(0)
    c = _kernel_common(src_ref, tgt_ref, spec_static, proj_w_ref)
    seq_len, num_steps, batch, vp = c["seq_len"], c["num_steps"], c["batch"], c["vp"]
    dsize = src_emb_ref.shape[1]

    srcm_scr[...] = c["src_m"]
    label_scr[...] = c["dec_label"]

    # ---------------------------------------------------- phase 1: replay
    # (No hoisted-projection scratches here: at PG shapes they cost ~19 MB of
    # VMEM the trajectories need; S+T extra small matmuls are ~20 us.)
    x0 = _embed_rows(c["src_bound"], src_emb_ref, compute_dtype)
    enc_x_scr[...] = x0 * c["src_m"][:, :, None]

    emb = _embed_rows(c["dec_in"], tgt_emb_ref, compute_dtype)
    # Stash the raw decoder embeddings in the emb half of cell_in now; the
    # replay fills the attended half per step.
    dec_in_scr[:, :, hidden:] = emb

    def enc_step(t, states):
        m = srcm_scr[pl.ds(t, 1), :].reshape(batch, 1)
        new_states = []
        x = enc_x_scr[pl.ds(t, 1)].reshape(batch, dsize)
        for layer in range(L):
            h, cc = states[2 * layer], states[2 * layer + 1]
            pre = jnp.dot(x.astype(compute_dtype), enc_wih[layer][:],
                          preferred_element_type=jnp.float32)
            pre = pre + jnp.dot(h.astype(compute_dtype), enc_whh[layer][:],
                                preferred_element_type=jnp.float32) + enc_bias[layer][:]
            i, f, g, o = _activated(pre, hidden)
            c_new = f * cc + i * g
            h_new = o * jnp.tanh(c_new)
            h = m * h_new + (1.0 - m) * h
            cc = m * c_new + (1.0 - m) * cc
            enc_g_scr[pl.ds(layer * seq_len + t, 1)] = jnp.concatenate([i, f, g, o], axis=-1)[None]
            enc_h_scr[pl.ds(layer * seq_len + t, 1)] = h[None]
            enc_c_scr[pl.ds(layer * seq_len + t, 1)] = cc[None]
            new_states += [h, cc]
            x = h * m
        enc_scratch[pl.ds(t, 1)] = x.astype(compute_dtype)[None]
        return tuple(new_states)

    zeros = jnp.zeros((batch, hidden), jnp.float32)
    finals = jax.lax.fori_loop(0, seq_len, enc_step,
                               tuple(zeros for _ in range(2 * L)))
    dec_h_scr[pl.ds(0, 1)] = finals[2 * (L - 1)][None]

    def dec_replay(t, carry):
        h, cc, den = carry
        enc = enc_scratch[:]
        scores = jnp.sum(
            (enc * h.astype(compute_dtype)[None]).astype(jnp.float32), axis=-1
        ) + c["src_neg"]
        scores = scores - jnp.max(scores, axis=0, keepdims=True)
        weights = jnp.exp(scores)
        weights = weights / jnp.dot(c["ones_seq"], weights,
                                    preferred_element_type=jnp.float32)
        dec_w_scr[pl.ds(t, 1)] = weights[None]
        attended = jnp.sum(
            (enc * weights[:, :, None].astype(compute_dtype)).astype(jnp.float32), axis=0
        )
        dec_in_scr[pl.ds(t, 1), :, :hidden] = attended[None]
        cell_in = dec_in_scr[pl.ds(t, 1)].reshape(batch, hidden + dsize)
        pre = (
            jnp.dot(cell_in.astype(compute_dtype), dec_wih_ref[:],
                    preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(compute_dtype), dec_whh_ref[:],
                      preferred_element_type=jnp.float32)
            + dec_bias_ref[:]
        )
        i, f, g, o = _activated(pre, hidden)
        cc = f * cc + i * g
        h = o * jnp.tanh(cc)
        dec_g_scr[pl.ds(t, 1)] = jnp.concatenate([i, f, g, o], axis=-1)[None]
        dec_c_scr[pl.ds(t, 1)] = cc[None]
        dec_h_scr[pl.ds(t + 1, 1)] = h[None]
        label = label_scr[pl.ds(t, 1), :].reshape(batch, 1)
        return h, cc, den + (label != pad).astype(jnp.float32)

    (_, _, den) = jax.lax.fori_loop(
        0, num_steps, dec_replay,
        (finals[2 * (L - 1)], jnp.zeros_like(zeros), jnp.zeros((batch, 1), jnp.float32)),
    )
    eps = REINFORCE_EPS if reinforce_norm else CE_EPS
    dnum = dloss_ref[0] / (den + eps)

    @pl.when(b_idx == 0)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    denc_scr[...] = jnp.zeros_like(denc_scr)

    # ------------------------------------- phase 2: decoder reverse sweep
    # Stores dpre into dec_g_scr and dlogits into dec_l_scr; weight grads are
    # deferred to the post-sweep big matmuls.
    def dec_bwd(step, carry):
        t = num_steps - 1 - step
        dh, dc = carry
        h_t = dec_h_scr[pl.ds(t + 1, 1)].reshape(batch, hidden)
        h_prev = dec_h_scr[pl.ds(t, 1)].reshape(batch, hidden)
        c_t = dec_c_scr[pl.ds(t, 1)].reshape(batch, hidden)
        c_prev = jnp.where(
            t == 0, jnp.zeros((batch, hidden), jnp.float32),
            dec_c_scr[pl.ds(jnp.maximum(t - 1, 0), 1)].reshape(batch, hidden),
        )
        gates = dec_g_scr[pl.ds(t, 1)].reshape(batch, 4 * hidden)
        i, f, g, o = _split_gates(gates, hidden)
        weights = dec_w_scr[pl.ds(t, 1)].reshape(seq_len, batch)

        logits = (
            jnp.dot(h_t.astype(compute_dtype), proj_w_ref[:],
                    preferred_element_type=jnp.float32)
            + proj_b_ref[:]
        )
        real = logits + c["lse_blocked"]
        mx = jnp.max(real, axis=-1, keepdims=True)
        e = jnp.exp(real - mx)
        soft = e / jnp.sum(e, axis=-1, keepdims=True)
        label = label_scr[pl.ds(t, 1), :].reshape(batch, 1)
        label_oh = (c["lanes_b"] == label).astype(jnp.float32)
        m_col = (label != pad).astype(jnp.float32)
        dlogits = (dnum * m_col) * (soft - label_oh)
        dec_l_scr[pl.ds(t, 1)] = dlogits[None]

        dh = dh + jnp.dot(dlogits.astype(compute_dtype), proj_w_t_ref[:],
                          preferred_element_type=jnp.float32)

        tc = jnp.tanh(c_t)
        do = dh * tc
        dc_t = dc + dh * o * (1.0 - tc * tc)
        di = dc_t * g
        df = dc_t * c_prev
        dg = dc_t * i
        dpre = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f),
             dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1,
        )
        dec_g_scr[pl.ds(t, 1)] = dpre[None]  # gates are consumed; store dpre
        dcell_att = jnp.dot(dpre.astype(compute_dtype),
                            dec_wih_t_ref[:, pl.ds(0, hidden)],
                            preferred_element_type=jnp.float32)
        dh_prev = jnp.dot(dpre.astype(compute_dtype), dec_whh_t_ref[:],
                          preferred_element_type=jnp.float32)
        dc_prev = dc_t * f

        enc = enc_scratch[:].astype(jnp.float32)
        dw = jnp.sum(enc * dcell_att[None], axis=-1)
        wdw = weights * dw
        swdw = jnp.dot(c["ones_seq"], wdw, preferred_element_type=jnp.float32)
        ds = wdw - weights * swdw
        dh_prev = dh_prev + jnp.sum(enc * ds[:, :, None], axis=0)
        denc_scr[...] += (ds[:, :, None] * h_prev[None]
                          + weights[:, :, None] * dcell_att[None])
        return dh_prev, dc_prev

    dh0, _ = jax.lax.fori_loop(
        0, num_steps, dec_bwd,
        (jnp.zeros((batch, hidden), jnp.float32), jnp.zeros((batch, hidden), jnp.float32)),
    )

    # ------------------------------------- phase 3: encoder reverse sweep
    def enc_bwd(step, carry):
        t = seq_len - 1 - step
        dstates = list(carry)
        m = srcm_scr[pl.ds(t, 1), :].reshape(batch, 1)
        denct = denc_scr[pl.ds(t, 1)].reshape(batch, hidden)

        dx_from_above = None
        for layer in reversed(range(L)):
            row = layer * seq_len + t
            c_post = enc_c_scr[pl.ds(row, 1)].reshape(batch, hidden)
            c_prev = jnp.where(
                t == 0, jnp.zeros((batch, hidden), jnp.float32),
                enc_c_scr[pl.ds(jnp.maximum(row - 1, 0), 1)].reshape(batch, hidden),
            )
            gates = enc_g_scr[pl.ds(row, 1)].reshape(batch, 4 * hidden)
            i, f, g, o = _split_gates(gates, hidden)

            dh = dstates[2 * layer]
            dc = dstates[2 * layer + 1]
            if layer == L - 1:
                dh = dh + denct * m
            if dx_from_above is not None:
                dh = dh + dx_from_above * m

            dh_new = dh * m
            dc_new = dc * m
            dh_carry = dh * (1.0 - m)
            dc_carry = dc * (1.0 - m)

            # At masked steps dh_new/dc_new are zero, so using the post-freeze
            # cell in place of c_new is exact.
            tc = jnp.tanh(c_post)
            do = dh_new * tc
            dc_new = dc_new + dh_new * o * (1.0 - tc * tc)
            di = dc_new * g
            df = dc_new * c_prev
            dg = dc_new * i
            dpre = jnp.concatenate(
                [di * i * (1.0 - i), df * f * (1.0 - f),
                 dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1,
            )
            enc_g_scr[pl.ds(row, 1)] = dpre[None]
            dx_l = jnp.dot(dpre.astype(compute_dtype), enc_wih_t[layer][:],
                           preferred_element_type=jnp.float32)
            dstates[2 * layer] = dh_carry + jnp.dot(
                dpre.astype(compute_dtype), enc_whh_t[layer][:],
                preferred_element_type=jnp.float32,
            )
            dstates[2 * layer + 1] = dc_carry + dc_new * f
            dx_from_above = dx_l

        # cotangent of x0 = emb * m (store dx0 * m for the post-sweep matmul)
        aux_scr[pl.ds((2 * L - 1) * seq_len + t, 1)] = (dx_from_above * m)[None]
        return tuple(dstates)

    init = [jnp.zeros((batch, hidden), jnp.float32) for _ in range(2 * L)]
    init[2 * (L - 1)] = dh0
    jax.lax.fori_loop(0, seq_len, enc_bwd, tuple(init))

    # --------------------------- phase 4: weight grads as big matmuls
    # Decoder.
    dpre_all = dec_g_scr[:].reshape(num_steps * batch, 4 * hidden)
    cell_in_all = dec_in_scr[:].reshape(num_steps * batch, hidden + dsize)
    h_prev_all = dec_h_scr[:num_steps].reshape(num_steps * batch, hidden)
    h_out_all = dec_h_scr[1:num_steps + 1].reshape(num_steps * batch, hidden)
    dlog_all = dec_l_scr[:].reshape(num_steps * batch, vp)
    d_dec_wih_ref[...] += _contract_steps(dpre_all, cell_in_all)
    d_dec_whh_ref[...] += _contract_steps(dpre_all, h_prev_all)
    d_dec_bias_ref[...] += _ones_row_sum(dpre_all)
    d_proj_w_ref[...] += _contract_steps(dlog_all, h_out_all)
    d_proj_b_ref[...] += _ones_row_sum(dlog_all)
    # Target embedding: demb = dpre @ Wih[emb rows]^T, then scatter by token
    # via a transposed one-hot matmul over the whole trajectory.
    demb_all = jnp.dot(dpre_all.astype(compute_dtype),
                       dec_wih_t_ref[:, hidden:],
                       preferred_element_type=jnp.float32)       # (T*B, D)
    vtp = tgt_emb_ref.shape[0]
    oh_t = (c["dec_in"][:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (num_steps, batch, vtp), 2)
            ).astype(compute_dtype).reshape(num_steps * batch, vtp)
    d_tgt_emb_ref[...] += _contract_steps(oh_t, demb_all.astype(compute_dtype))

    # Encoder, per layer. x_l operands: layer 0 reads the stored embeddings;
    # layer l>0 is the lower layer's masked hidden (built into aux_scr).
    for layer in range(1, L):
        lower = enc_h_scr[pl.ds((layer - 1) * seq_len, seq_len)]
        aux_scr[pl.ds((layer - 1) * seq_len, seq_len)] = (
            lower * c["src_m"][:, :, None]
        )
    # h_prev operands (shifted by one step, first row zero).
    for layer in range(L):
        base = (L - 1 + layer) * seq_len
        aux_scr[pl.ds(base, 1)] = jnp.zeros((1, batch, hidden), jnp.float32)
        aux_scr[pl.ds(base + 1, seq_len - 1)] = enc_h_scr[pl.ds(layer * seq_len, seq_len - 1)]

    for layer in range(L):
        dpre_l = enc_g_scr[pl.ds(layer * seq_len, seq_len)].reshape(seq_len * batch, 4 * hidden)
        if layer == 0:
            x_l = enc_x_scr[:].reshape(seq_len * batch, dsize)
        else:
            x_l = aux_scr[pl.ds((layer - 1) * seq_len, seq_len)].reshape(seq_len * batch, hidden)
        h_prev_l = aux_scr[pl.ds((L - 1 + layer) * seq_len, seq_len)].reshape(seq_len * batch, hidden)
        d_enc[3 * layer][...] += _contract_steps(dpre_l, x_l)
        d_enc[3 * layer + 1][...] += _contract_steps(dpre_l, h_prev_l)
        d_enc[3 * layer + 2][...] += _ones_row_sum(dpre_l)

    # Source embedding from the stored dx0 * m trajectory.
    dx0_all = aux_scr[pl.ds((2 * L - 1) * seq_len, seq_len)].reshape(seq_len * batch, hidden)
    vsp = src_emb_ref.shape[0]
    oh_s = (c["src_bound"][:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (seq_len, batch, vsp), 2)
            ).astype(compute_dtype).reshape(seq_len * batch, vsp)
    d_src_emb_ref[...] += _contract_steps(oh_s, dx0_all.astype(compute_dtype))


# ================================================================ host wrapper
def _pack(params, spec, compute_dtype):
    vsp = _round_up(spec.source_vocab_size, LANE)
    vtp = _round_up(spec.target_vocab_size, LANE)

    def pad_rows(w, rows):
        return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))

    cell = params["decoder_cell"]
    proj = params["output_projection"]
    return dict(
        src_emb=pad_rows(params["source_embedding"], vsp).astype(compute_dtype),
        tgt_emb=pad_rows(params["target_embedding"], vtp).astype(compute_dtype),
        enc_wih=[p["w_ih"].T.astype(compute_dtype) for p in params["encoder"]],
        enc_whh=[p["w_hh"].T.astype(compute_dtype) for p in params["encoder"]],
        enc_bias=[(p["b_ih"] + p["b_hh"])[None].astype(jnp.float32)
                  for p in params["encoder"]],
        enc_wih_t=[p["w_ih"].astype(compute_dtype) for p in params["encoder"]],
        enc_whh_t=[p["w_hh"].astype(compute_dtype) for p in params["encoder"]],
        dec_wih=cell["w_ih"].T.astype(compute_dtype),
        dec_whh=cell["w_hh"].T.astype(compute_dtype),
        dec_bias=(cell["b_ih"] + cell["b_hh"])[None].astype(jnp.float32),
        dec_wih_t=cell["w_ih"].astype(compute_dtype),
        dec_whh_t=cell["w_hh"].astype(compute_dtype),
        proj_w=jnp.pad(proj["w"], ((0, vtp - proj["w"].shape[0]), (0, 0))).T.astype(compute_dtype),
        proj_b=jnp.pad(proj["b"], (0, vtp - proj["b"].shape[0]))[None].astype(jnp.float32),
        proj_w_t=pad_rows(proj["w"], vtp).astype(compute_dtype),
    )


def _fixed_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _block_tokens(tokens, bb, padded):
    r"""(B, L) int32 -> (G, L, bb): grid-blocked, time-major within a block.
    Blocking over the LEADING dim keeps both tiled block dims equal to the
    array dims (Mosaic's lane-divisibility rule at bb < 128)."""
    batch, length = tokens.shape
    t = tokens.astype(jnp.int32)
    if padded != batch:
        t = jnp.pad(t, ((0, padded - batch), (0, 0)))
    return jnp.swapaxes(t.reshape(padded // bb, bb, length), 1, 2)


def fused_training_available(spec) -> bool:
    r"""The fused teacher-forced fwd+bwd kernels need a large-VMEM TPU
    generation (v4+, see ``ops.common.tpu_fused_kernels_supported``),
    lane-aligned sizes, no dropout, and input_size == hidden_size (the dx0
    trajectory shares the hidden-width aux scratch)."""
    from probnmn_tpu.ops.common import tpu_fused_kernels_supported

    return (
        tpu_fused_kernels_supported()
        and spec.hidden_size % LANE == 0
        and spec.input_size == spec.hidden_size
        and spec.dropout == 0.0
        and spec.num_layers <= 2
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6, 7))
def fused_tf_loss(
    params: Dict[str, Any],
    spec,
    source_tokens: jax.Array,
    target_tokens: jax.Array,
    reinforce_norm: bool = False,
    compute_dtype=jnp.float32,
    batch_block: int = BATCH_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    r"""Per-example teacher-forced loss, fused forward + fused BPTT backward.

    Differentiable wrt ``params`` only (token inputs carry no gradient). With
    ``reinforce_norm=False`` this is the masked-mean sequence CE of
    ``seq2seq_forward(params, spec, src, tgt, ...)["loss"]``; with
    ``reinforce_norm=True``, the free-running REINFORCE loss evaluated at the
    (already sampled + trimmed) ``target_tokens``.
    """
    return _forward_impl(params, spec, source_tokens, target_tokens,
                         reinforce_norm, compute_dtype, batch_block, interpret)


def _forward_impl(params, spec, source_tokens, target_tokens,
                  reinforce_norm, compute_dtype, batch_block, interpret):
    batch = source_tokens.shape[0]
    packed = _pack(params, spec, compute_dtype)

    bb = min(batch_block, batch)
    padded = _round_up(batch, bb)
    src_t = _block_tokens(source_tokens, bb, padded)
    tgt_t = _block_tokens(target_tokens, bb, padded)
    grid = (padded // bb,)
    ls, lt = src_t.shape[1], tgt_t.shape[1]
    num_steps = lt if reinforce_norm else lt + 1

    spec_static = (spec.num_layers, spec.hidden_size, spec.target_vocab_size,
                   spec.pad_index, spec.start_index, spec.end_index,
                   bool(reinforce_norm), compute_dtype)

    in_specs = [
        pl.BlockSpec((1, ls, bb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lt, bb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        _fixed_spec(packed["src_emb"].shape),
        _fixed_spec(packed["tgt_emb"].shape),
        *[_fixed_spec(w.shape) for w in packed["enc_wih"]],
        *[_fixed_spec(w.shape) for w in packed["enc_whh"]],
        *[_fixed_spec(b.shape) for b in packed["enc_bias"]],
        _fixed_spec(packed["dec_wih"].shape),
        _fixed_spec(packed["dec_whh"].shape),
        _fixed_spec(packed["dec_bias"].shape),
        _fixed_spec(packed["proj_w"].shape),
        _fixed_spec(packed["proj_b"].shape),
    ]
    loss = pl.pallas_call(
        partial(_tf_forward_kernel, spec_static=spec_static),
        grid=grid,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, bb, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((padded // bb, bb, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((ls + 1, bb, spec.hidden_size), compute_dtype),      # enc out
            pltpu.VMEM((ls + 1, bb, 4 * spec.hidden_size), jnp.float32),    # xproj
            pltpu.VMEM((num_steps, bb, 4 * spec.hidden_size), jnp.float32), # eproj
            pltpu.VMEM((ls + 1, bb), jnp.float32),                          # src mask
            pltpu.VMEM((num_steps, bb), jnp.int32),                         # labels
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        src_t, tgt_t, packed["src_emb"], packed["tgt_emb"],
        *packed["enc_wih"], *packed["enc_whh"], *packed["enc_bias"],
        packed["dec_wih"], packed["dec_whh"], packed["dec_bias"],
        packed["proj_w"], packed["proj_b"],
    )[0]
    return loss.reshape(padded)[:batch]


def _fused_tf_fwd(params, spec, source_tokens, target_tokens,
                  reinforce_norm, compute_dtype, batch_block, interpret):
    loss = _forward_impl(params, spec, source_tokens, target_tokens,
                         reinforce_norm, compute_dtype, batch_block, interpret)
    return loss, (params, source_tokens, target_tokens)


def _fused_tf_bwd(spec, reinforce_norm, compute_dtype, batch_block, interpret,
                  residuals, dloss):
    params, source_tokens, target_tokens = residuals
    batch = source_tokens.shape[0]
    packed = _pack(params, spec, compute_dtype)

    bb = min(batch_block, batch)
    padded = _round_up(batch, bb)
    src_t = _block_tokens(source_tokens, bb, padded)
    tgt_t = _block_tokens(target_tokens, bb, padded)
    dloss_col = dloss.astype(jnp.float32)
    if padded != batch:
        dloss_col = jnp.pad(dloss_col, (0, padded - batch))
    dloss_col = dloss_col.reshape(padded // bb, bb, 1)
    grid = (padded // bb,)
    ls, lt = src_t.shape[1], tgt_t.shape[1]
    seq_len = ls + 1
    num_steps = lt if reinforce_norm else lt + 1
    H, D, L = spec.hidden_size, spec.input_size, spec.num_layers
    vsp = packed["src_emb"].shape[0]
    vtp = packed["tgt_emb"].shape[0]

    spec_static = (L, H, spec.target_vocab_size,
                   spec.pad_index, spec.start_index, spec.end_index,
                   bool(reinforce_norm), compute_dtype)

    in_specs = [
        pl.BlockSpec((1, ls, bb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lt, bb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        _fixed_spec(packed["src_emb"].shape),
        _fixed_spec(packed["tgt_emb"].shape),
        *[_fixed_spec(w.shape) for w in packed["enc_wih"]],
        *[_fixed_spec(w.shape) for w in packed["enc_whh"]],
        *[_fixed_spec(b.shape) for b in packed["enc_bias"]],
        *[_fixed_spec(w.shape) for w in packed["enc_wih_t"]],
        *[_fixed_spec(w.shape) for w in packed["enc_whh_t"]],
        _fixed_spec(packed["dec_wih"].shape),
        _fixed_spec(packed["dec_whh"].shape),
        _fixed_spec(packed["dec_bias"].shape),
        _fixed_spec(packed["dec_wih_t"].shape),
        _fixed_spec(packed["dec_whh_t"].shape),
        _fixed_spec(packed["proj_w"].shape),
        _fixed_spec(packed["proj_b"].shape),
        _fixed_spec(packed["proj_w_t"].shape),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((vsp, D), jnp.float32),
        jax.ShapeDtypeStruct((vtp, D), jnp.float32),
    ]
    for layer in range(L):
        din = D if layer == 0 else H
        out_shape += [
            jax.ShapeDtypeStruct((4 * H, din), jnp.float32),
            jax.ShapeDtypeStruct((4 * H, H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ]
    out_shape += [
        jax.ShapeDtypeStruct((4 * H, H + D), jnp.float32),
        jax.ShapeDtypeStruct((4 * H, H), jnp.float32),
        jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        jax.ShapeDtypeStruct((vtp, H), jnp.float32),
        jax.ShapeDtypeStruct((1, vtp), jnp.float32),
    ]
    out_specs = [_fixed_spec(o.shape) for o in out_shape]

    scratch = [
        pltpu.VMEM((seq_len, bb, H), compute_dtype),        # enc outputs
        pltpu.VMEM((L * seq_len, bb, H), jnp.float32),      # enc h
        pltpu.VMEM((L * seq_len, bb, H), jnp.float32),      # enc c
        pltpu.VMEM((L * seq_len, bb, 4 * H), jnp.float32),  # enc gates/dpre
        pltpu.VMEM((seq_len, bb, D), jnp.float32),          # enc x0
        pltpu.VMEM((num_steps + 1, bb, H), jnp.float32),    # dec h
        pltpu.VMEM((num_steps, bb, H), jnp.float32),        # dec c
        pltpu.VMEM((num_steps, bb, 4 * H), jnp.float32),    # dec gates/dpre
        pltpu.VMEM((num_steps, bb, H + D), jnp.float32),    # dec cell_in
        pltpu.VMEM((num_steps, seq_len, bb), jnp.float32),  # attention weights
        pltpu.VMEM((num_steps, bb, vtp), jnp.float32),      # dlogits
        pltpu.VMEM((seq_len, bb, H), jnp.float32),          # denc accumulator
        pltpu.VMEM((2 * L * seq_len, bb, H), jnp.float32),  # aux operands + dx0
        pltpu.VMEM((seq_len, bb), jnp.float32),             # src mask
        pltpu.VMEM((num_steps, bb), jnp.int32),             # labels
    ]

    grads_flat = pl.pallas_call(
        partial(_tf_backward_kernel, spec_static=spec_static),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=115 * 1024 * 1024),
        interpret=interpret,
    )(
        src_t, tgt_t, dloss_col, packed["src_emb"], packed["tgt_emb"],
        *packed["enc_wih"], *packed["enc_whh"], *packed["enc_bias"],
        *packed["enc_wih_t"], *packed["enc_whh_t"],
        packed["dec_wih"], packed["dec_whh"], packed["dec_bias"],
        packed["dec_wih_t"], packed["dec_whh_t"],
        packed["proj_w"], packed["proj_b"], packed["proj_w_t"],
    )

    d_src_emb, d_tgt_emb = grads_flat[0], grads_flat[1]
    v_src = params["source_embedding"].shape[0]
    v_tgt = params["target_embedding"].shape[0]
    enc_grads = []
    for layer in range(L):
        d_wih, d_whh, d_b = grads_flat[2 + 3 * layer: 5 + 3 * layer]
        enc_grads.append({
            "w_ih": d_wih, "w_hh": d_whh,
            # b_ih and b_hh enter only as their sum, so they share the grad.
            "b_ih": d_b[0], "b_hh": d_b[0],
        })
    d_dec_wih, d_dec_whh, d_dec_b, d_proj_w, d_proj_b = grads_flat[2 + 3 * L:]
    grads = {
        "source_embedding": d_src_emb[:v_src],
        "target_embedding": d_tgt_emb[:v_tgt],
        "encoder": enc_grads,
        "decoder_cell": {
            "w_ih": d_dec_wih, "w_hh": d_dec_whh,
            "b_ih": d_dec_b[0], "b_hh": d_dec_b[0],
        },
        "output_projection": {
            "w": d_proj_w[:params["output_projection"]["w"].shape[0]],
            "b": d_proj_b[0, :params["output_projection"]["b"].shape[0]],
        },
    }
    return grads, None, None


fused_tf_loss.defvjp(_fused_tf_fwd, _fused_tf_bwd)


# ============================================================= LM (ProgramPrior)
def _lm_common(tok_ref, spec_static, vp):
    r"""Vectorized token streams for the LM teacher-forced pass.

    The LM consumes the boundary-added sequence [start, tokens, end, pads] and
    predicts each next token: at step t (0..Lt) the input is position t and the
    label position t+1 — exactly the TF decoder's (dec_in, dec_label) streams
    (reference ``program_prior.py:80-155``: ``logits[:, :-1]`` vs
    ``tokens[:, 1:]``).
    """
    (num_layers, hidden, vocab, pad, start, end, compute_dtype) = spec_static
    _, lt, batch = tok_ref.shape
    num_steps = lt + 1

    tok = tok_ref[0]
    lens = jnp.dot(jnp.ones((1, lt), jnp.float32),
                   (tok != pad).astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (num_steps, batch), 0).astype(jnp.float32)
    tok_pad = jnp.concatenate([tok, jnp.zeros((1, batch), jnp.int32)], axis=0)
    with_end = jnp.where(rows < lens, tok_pad,
                         jnp.where(rows == lens, jnp.int32(end), jnp.int32(pad)))
    lm_in = jnp.concatenate(
        [jnp.full((1, batch), start, jnp.int32), with_end[:num_steps - 1]], axis=0
    )
    lanes_b = jax.lax.broadcasted_iota(jnp.int32, (batch, vp), 1)
    return dict(
        num_steps=num_steps, batch=batch,
        lm_in=lm_in, lm_label=with_end, lanes_b=lanes_b,
        lse_blocked=jnp.where(lanes_b >= vocab, NEG_INF, 0.0),
    )


def _lm_forward_kernel(
    tok_ref,        # (1, Lt, B) int32 raw program tokens
    emb_ref,        # (Vp, D) — tied input/output embedding
    emb_t_ref,      # (D, Vp) — its transpose (output-layer matmul operand)
    proj_ref,       # (H, D) — projection.T (forward layout)
    *refs,
    spec_static,
):
    (num_layers, hidden, vocab, pad, start, end, compute_dtype) = spec_static
    L = num_layers
    enc_wih = refs[:L]
    enc_whh = refs[L:2 * L]
    enc_bias = refs[2 * L:3 * L]
    (loss_out_ref, x_scr, inm_scr, label_scr) = refs[3 * L:]

    c = _lm_common(tok_ref, spec_static, emb_ref.shape[0])
    num_steps, batch = c["num_steps"], c["batch"]
    vp = emb_ref.shape[0]
    dsize = emb_ref.shape[1]

    inm_scr[...] = (c["lm_in"] != pad).astype(jnp.float32)
    label_scr[...] = c["lm_label"]

    x_all = _embed_rows(c["lm_in"], emb_ref, compute_dtype)
    x_scr[...] = x_all * (c["lm_in"] != pad).astype(jnp.float32)[:, :, None]

    def step(t, carry):
        states, num, den = carry[:-2], carry[-2], carry[-1]
        m = inm_scr[pl.ds(t, 1), :].reshape(batch, 1)
        x = x_scr[pl.ds(t, 1)].reshape(batch, dsize)
        new_states = []
        for layer in range(L):
            h, cc = states[2 * layer], states[2 * layer + 1]
            pre = (
                jnp.dot(x.astype(compute_dtype), enc_wih[layer][:],
                        preferred_element_type=jnp.float32)
                + jnp.dot(h.astype(compute_dtype), enc_whh[layer][:],
                          preferred_element_type=jnp.float32)
                + enc_bias[layer][:]
            )
            i, f, g, o = _activated(pre, hidden)
            c_new = f * cc + i * g
            h_new = o * jnp.tanh(c_new)
            h = m * h_new + (1.0 - m) * h
            cc = m * c_new + (1.0 - m) * cc
            new_states += [h, cc]
            x = h * m
        proj_out = jnp.dot(x.astype(compute_dtype), proj_ref[:],
                           preferred_element_type=jnp.float32)
        logits = jnp.dot(proj_out.astype(compute_dtype), emb_t_ref[:],
                         preferred_element_type=jnp.float32)
        real = logits + c["lse_blocked"]
        mx = jnp.max(real, axis=-1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(real - mx), axis=-1, keepdims=True)) + mx
        label = label_scr[pl.ds(t, 1), :].reshape(batch, 1)
        label_oh = (c["lanes_b"] == label).astype(jnp.float32)
        ce = lse - jnp.sum(label_oh * logits, axis=-1, keepdims=True)
        m_lbl = (label != pad).astype(jnp.float32)
        return (*new_states, num + m_lbl * ce, den + m_lbl)

    zeros = jnp.zeros((batch, hidden), jnp.float32)
    out = jax.lax.fori_loop(
        0, num_steps, step,
        (*(zeros for _ in range(2 * L)),
         jnp.zeros((batch, 1), jnp.float32), jnp.zeros((batch, 1), jnp.float32)),
    )
    num, den = out[-2], out[-1]
    loss_out_ref[0] = num / (den + CE_EPS)


def _lm_backward_kernel(
    tok_ref,        # (1, Lt, B) int32
    dloss_ref,      # (1, B, 1) f32
    emb_ref,        # (Vp, D)
    emb_t_ref,      # (D, Vp)
    proj_ref,       # (H, D) projection.T
    proj_fwd_ref,   # (D, H) projection (backward operand)
    *refs,
    spec_static,
):
    (num_layers, hidden, vocab, pad, start, end, compute_dtype) = spec_static
    L = num_layers
    k = 0
    enc_wih = refs[k:k + L]; k += L
    enc_whh = refs[k:k + L]; k += L
    enc_bias = refs[k:k + L]; k += L
    enc_wih_t = refs[k:k + L]; k += L
    enc_whh_t = refs[k:k + L]; k += L
    out_refs = refs[k:k + 3 * L + 2]; k += 3 * L + 2
    d_emb_ref = out_refs[0]
    d_enc = out_refs[1:1 + 3 * L]
    d_proj_ref = out_refs[1 + 3 * L]  # (D, H), torch layout
    (h_scr,            # (L*T, B, H) f32 post-freeze hidden
     c_scr,            # (L*T, B, H) f32 post-freeze cell
     g_scr,            # (L*T, B, 4H) f32 activated gates, then dpre
     x_scr,            # (T, B, D) f32 embedded inputs (pad-zeroed)
     top_scr,          # (T, B, H) f32 masked top-layer outputs (logit inputs)
     dl_scr,           # (T, B, Vp) f32 dlogits trajectory
     aux_scr,          # (2L*T, B, H) f32 post-sweep matmul operands + dx0
     inm_scr,          # (T, B) f32 input pad mask
     label_scr,        # (T, B) int32 labels
     ) = refs[k:]

    b_idx = pl.program_id(0)
    c = _lm_common(tok_ref, spec_static, emb_ref.shape[0])
    num_steps, batch = c["num_steps"], c["batch"]
    vp = emb_ref.shape[0]
    dsize = emb_ref.shape[1]

    inm_scr[...] = (c["lm_in"] != pad).astype(jnp.float32)
    label_scr[...] = c["lm_label"]
    x0 = _embed_rows(c["lm_in"], emb_ref, compute_dtype)
    x_scr[...] = x0 * (c["lm_in"] != pad).astype(jnp.float32)[:, :, None]

    # ---------------------------------------------------------- replay
    def replay(t, carry):
        states, den = carry[:-1], carry[-1]
        m = inm_scr[pl.ds(t, 1), :].reshape(batch, 1)
        x = x_scr[pl.ds(t, 1)].reshape(batch, dsize)
        new_states = []
        for layer in range(L):
            h, cc = states[2 * layer], states[2 * layer + 1]
            pre = (
                jnp.dot(x.astype(compute_dtype), enc_wih[layer][:],
                        preferred_element_type=jnp.float32)
                + jnp.dot(h.astype(compute_dtype), enc_whh[layer][:],
                          preferred_element_type=jnp.float32)
                + enc_bias[layer][:]
            )
            i, f, g, o = _activated(pre, hidden)
            c_new = f * cc + i * g
            h_new = o * jnp.tanh(c_new)
            h = m * h_new + (1.0 - m) * h
            cc = m * c_new + (1.0 - m) * cc
            g_scr[pl.ds(layer * num_steps + t, 1)] = jnp.concatenate([i, f, g, o], axis=-1)[None]
            h_scr[pl.ds(layer * num_steps + t, 1)] = h[None]
            c_scr[pl.ds(layer * num_steps + t, 1)] = cc[None]
            new_states += [h, cc]
            x = h * m
        top_scr[pl.ds(t, 1)] = x[None]
        label = label_scr[pl.ds(t, 1), :].reshape(batch, 1)
        return (*new_states, den + (label != pad).astype(jnp.float32))

    zeros = jnp.zeros((batch, hidden), jnp.float32)
    out = jax.lax.fori_loop(
        0, num_steps, replay,
        (*(zeros for _ in range(2 * L)), jnp.zeros((batch, 1), jnp.float32)),
    )
    den = out[-1]
    dnum = dloss_ref[0] / (den + CE_EPS)

    @pl.when(b_idx == 0)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    # ------------------------------------------------- dlogits (vectorized)
    # The output head has no recurrence, so the WHOLE dlogits trajectory is a
    # pair of big matmuls + a vectorized masked softmax over (T*B, Vp).
    top_all = top_scr[:].reshape(num_steps * batch, hidden)
    proj_all = jnp.dot(top_all.astype(compute_dtype), proj_ref[:],
                       preferred_element_type=jnp.float32)          # (T*B, D)
    logits_all = jnp.dot(proj_all.astype(compute_dtype), emb_t_ref[:],
                         preferred_element_type=jnp.float32)        # (T*B, Vp)
    real = logits_all + jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (num_steps * batch, vp), 1) >= vocab,
        NEG_INF, 0.0,
    )
    mx = jnp.max(real, axis=-1, keepdims=True)
    e = jnp.exp(real - mx)
    soft = e / jnp.sum(e, axis=-1, keepdims=True)
    label_oh_all = (c["lm_label"][:, :, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (num_steps, batch, vp), 2)
                    ).astype(jnp.float32).reshape(num_steps * batch, vp)
    m_all = (c["lm_label"] != pad).astype(jnp.float32)[:, :, None]
    dnum_all = (jnp.broadcast_to(dnum[None], (num_steps, batch, 1)) * m_all
                ).reshape(num_steps * batch, 1)
    dlog_all = dnum_all * (soft - label_oh_all)
    dl_scr[...] = dlog_all.reshape(num_steps, batch, vp)
    dproj_out_all = jnp.dot(dlog_all.astype(compute_dtype), emb_ref[:],
                            preferred_element_type=jnp.float32)     # (T*B, D)
    d_emb_ref[...] += _contract_steps(dlog_all, proj_all)           # tied: output side
    d_proj_ref[...] += _contract_steps(dproj_out_all, top_all)      # (D, H)
    dtop_all = jnp.dot(dproj_out_all.astype(compute_dtype), proj_fwd_ref[:],
                       preferred_element_type=jnp.float32)          # (T*B, H)
    # Stash per-step dtop in the dlogits scratch's place? It has width Vp; use
    # aux rows [ (2L-1)*T : 2L*T ) temporarily for dtop.
    aux_scr[pl.ds((2 * L - 1) * num_steps, num_steps)] = dtop_all.reshape(
        num_steps, batch, hidden
    )

    # ------------------------------------------------- reverse sweep
    def bwd(sweep, carry):
        t = num_steps - 1 - sweep
        dstates = list(carry)
        m = inm_scr[pl.ds(t, 1), :].reshape(batch, 1)
        dtop = aux_scr[pl.ds((2 * L - 1) * num_steps + t, 1)].reshape(batch, hidden)

        dx_from_above = None
        for layer in reversed(range(L)):
            row = layer * num_steps + t
            c_post = c_scr[pl.ds(row, 1)].reshape(batch, hidden)
            c_prev = jnp.where(
                t == 0, jnp.zeros((batch, hidden), jnp.float32),
                c_scr[pl.ds(jnp.maximum(row - 1, 0), 1)].reshape(batch, hidden),
            )
            gates = g_scr[pl.ds(row, 1)].reshape(batch, 4 * hidden)
            i, f, g, o = _split_gates(gates, hidden)

            dh = dstates[2 * layer]
            dc = dstates[2 * layer + 1]
            if layer == L - 1:
                dh = dh + dtop * m
            if dx_from_above is not None:
                dh = dh + dx_from_above * m

            dh_new = dh * m
            dc_new = dc * m
            dh_carry = dh * (1.0 - m)
            dc_carry = dc * (1.0 - m)

            tc = jnp.tanh(c_post)
            do = dh_new * tc
            dc_new = dc_new + dh_new * o * (1.0 - tc * tc)
            di = dc_new * g
            df = dc_new * c_prev
            dg = dc_new * i
            dpre = jnp.concatenate(
                [di * i * (1.0 - i), df * f * (1.0 - f),
                 dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1,
            )
            g_scr[pl.ds(row, 1)] = dpre[None]
            dx_l = jnp.dot(dpre.astype(compute_dtype), enc_wih_t[layer][:],
                           preferred_element_type=jnp.float32)
            dstates[2 * layer] = dh_carry + jnp.dot(
                dpre.astype(compute_dtype), enc_whh_t[layer][:],
                preferred_element_type=jnp.float32,
            )
            dstates[2 * layer + 1] = dc_carry + dc_new * f
            dx_from_above = dx_l

        aux_scr[pl.ds((2 * L - 1) * num_steps + t, 1)] = (dx_from_above * m)[None]
        return tuple(dstates)

    jax.lax.fori_loop(0, num_steps, bwd,
                      tuple(jnp.zeros((batch, hidden), jnp.float32)
                            for _ in range(2 * L)))

    # --------------------------------------- weight grads as big matmuls
    for layer in range(1, L):
        lower = h_scr[pl.ds((layer - 1) * num_steps, num_steps)]
        aux_scr[pl.ds((layer - 1) * num_steps, num_steps)] = (
            lower * inm_scr[:][:, :, None]
        )
    for layer in range(L):
        base = (L - 1 + layer) * num_steps
        aux_scr[pl.ds(base, 1)] = jnp.zeros((1, batch, hidden), jnp.float32)
        aux_scr[pl.ds(base + 1, num_steps - 1)] = h_scr[pl.ds(layer * num_steps, num_steps - 1)]
    for layer in range(L):
        dpre_l = g_scr[pl.ds(layer * num_steps, num_steps)].reshape(
            num_steps * batch, 4 * hidden
        )
        if layer == 0:
            x_l = x_scr[:].reshape(num_steps * batch, dsize)
        else:
            x_l = aux_scr[pl.ds((layer - 1) * num_steps, num_steps)].reshape(
                num_steps * batch, hidden
            )
        h_prev_l = aux_scr[pl.ds((L - 1 + layer) * num_steps, num_steps)].reshape(
            num_steps * batch, hidden
        )
        d_enc[3 * layer][...] += _contract_steps(dpre_l, x_l)
        d_enc[3 * layer + 1][...] += _contract_steps(dpre_l, h_prev_l)
        d_enc[3 * layer + 2][...] += _ones_row_sum(dpre_l)

    # Tied embedding, input side: dE += oh^T (dx0 * m).
    dx0_all = aux_scr[pl.ds((2 * L - 1) * num_steps, num_steps)].reshape(
        num_steps * batch, hidden
    )
    oh = (c["lm_in"][:, :, None]
          == jax.lax.broadcasted_iota(jnp.int32, (num_steps, batch, vp), 2)
          ).astype(compute_dtype).reshape(num_steps * batch, vp)
    d_emb_ref[...] += _contract_steps(oh, dx0_all.astype(compute_dtype))


def fused_lm_available(spec) -> bool:
    r"""ProgramPrior fused fwd+bwd: large-VMEM TPU (v4+), lane-aligned, no
    dropout, tied dims."""
    from probnmn_tpu.ops.common import tpu_fused_kernels_supported

    return (
        tpu_fused_kernels_supported()
        and spec.hidden_size % LANE == 0
        and spec.input_size == spec.hidden_size
        and spec.dropout == 0.0
        and spec.num_layers <= 2
    )


def _lm_pack(params, spec, compute_dtype):
    vp = _round_up(spec.vocab_size, LANE)
    emb = jnp.pad(params["embedding"], ((0, vp - params["embedding"].shape[0]), (0, 0)))
    return dict(
        emb=emb.astype(compute_dtype),
        emb_t=emb.T.astype(compute_dtype),
        proj=params["projection"].T.astype(compute_dtype),   # (H, D)
        proj_fwd=params["projection"].astype(compute_dtype), # (D, H)
        enc_wih=[p["w_ih"].T.astype(compute_dtype) for p in params["encoder"]],
        enc_whh=[p["w_hh"].T.astype(compute_dtype) for p in params["encoder"]],
        enc_bias=[(p["b_ih"] + p["b_hh"])[None].astype(jnp.float32)
                  for p in params["encoder"]],
        enc_wih_t=[p["w_ih"].astype(compute_dtype) for p in params["encoder"]],
        enc_whh_t=[p["w_hh"].astype(compute_dtype) for p in params["encoder"]],
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4, 5))
def fused_lm_loss(
    params: Dict[str, Any],
    spec,
    program_tokens: jax.Array,
    compute_dtype=jnp.float32,
    batch_block: int = BATCH_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    r"""Per-example ProgramPrior LM cross entropy, fused fwd + fused BPTT bwd.

    Matches ``program_prior_forward(params, spec, tokens, rng)["loss"]``
    exactly (the rng affects only the qualitative "predictions" sampling,
    never the loss). Differentiable wrt ``params``; tied-embedding gradients
    accumulate both the output-layer and input-lookup contributions.
    """
    return _lm_forward_impl(params, spec, program_tokens,
                            compute_dtype, batch_block, interpret)


def _lm_forward_impl(params, spec, tokens, compute_dtype, batch_block, interpret):
    batch = tokens.shape[0]
    packed = _lm_pack(params, spec, compute_dtype)
    bb = min(batch_block, batch)
    padded = _round_up(batch, bb)
    tok_t = _block_tokens(tokens, bb, padded)
    grid = (padded // bb,)
    lt = tok_t.shape[1]
    num_steps = lt + 1
    H = spec.hidden_size

    spec_static = (spec.num_layers, H, spec.vocab_size,
                   spec.pad_index, spec.start_index, spec.end_index, compute_dtype)
    in_specs = [
        pl.BlockSpec((1, lt, bb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        _fixed_spec(packed["emb"].shape),
        _fixed_spec(packed["emb_t"].shape),
        _fixed_spec(packed["proj"].shape),
        *[_fixed_spec(w.shape) for w in packed["enc_wih"]],
        *[_fixed_spec(w.shape) for w in packed["enc_whh"]],
        *[_fixed_spec(b.shape) for b in packed["enc_bias"]],
    ]
    loss = pl.pallas_call(
        partial(_lm_forward_kernel, spec_static=spec_static),
        grid=grid,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, bb, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((padded // bb, bb, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((num_steps, bb, spec.input_size), jnp.float32),
            pltpu.VMEM((num_steps, bb), jnp.float32),
            pltpu.VMEM((num_steps, bb), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        tok_t, packed["emb"], packed["emb_t"], packed["proj"],
        *packed["enc_wih"], *packed["enc_whh"], *packed["enc_bias"],
    )[0]
    return loss.reshape(padded)[:batch]


def _fused_lm_fwd(params, spec, tokens, compute_dtype, batch_block, interpret):
    loss = _lm_forward_impl(params, spec, tokens, compute_dtype, batch_block, interpret)
    return loss, (params, tokens)


def _fused_lm_bwd(spec, compute_dtype, batch_block, interpret, residuals, dloss):
    params, tokens = residuals
    batch = tokens.shape[0]
    packed = _lm_pack(params, spec, compute_dtype)
    bb = min(batch_block, batch)
    padded = _round_up(batch, bb)
    tok_t = _block_tokens(tokens, bb, padded)
    dloss_col = dloss.astype(jnp.float32)
    if padded != batch:
        dloss_col = jnp.pad(dloss_col, (0, padded - batch))
    dloss_col = dloss_col.reshape(padded // bb, bb, 1)
    grid = (padded // bb,)
    lt = tok_t.shape[1]
    num_steps = lt + 1
    H, D, L = spec.hidden_size, spec.input_size, spec.num_layers
    vp = packed["emb"].shape[0]

    spec_static = (L, H, spec.vocab_size,
                   spec.pad_index, spec.start_index, spec.end_index, compute_dtype)
    in_specs = [
        pl.BlockSpec((1, lt, bb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        _fixed_spec(packed["emb"].shape),
        _fixed_spec(packed["emb_t"].shape),
        _fixed_spec(packed["proj"].shape),
        _fixed_spec(packed["proj_fwd"].shape),
        *[_fixed_spec(w.shape) for w in packed["enc_wih"]],
        *[_fixed_spec(w.shape) for w in packed["enc_whh"]],
        *[_fixed_spec(b.shape) for b in packed["enc_bias"]],
        *[_fixed_spec(w.shape) for w in packed["enc_wih_t"]],
        *[_fixed_spec(w.shape) for w in packed["enc_whh_t"]],
    ]
    out_shape = [jax.ShapeDtypeStruct((vp, D), jnp.float32)]
    for layer in range(L):
        din = D if layer == 0 else H
        out_shape += [
            jax.ShapeDtypeStruct((4 * H, din), jnp.float32),
            jax.ShapeDtypeStruct((4 * H, H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ]
    out_shape += [jax.ShapeDtypeStruct((D, H), jnp.float32)]
    out_specs = [_fixed_spec(o.shape) for o in out_shape]

    scratch = [
        pltpu.VMEM((L * num_steps, bb, H), jnp.float32),
        pltpu.VMEM((L * num_steps, bb, H), jnp.float32),
        pltpu.VMEM((L * num_steps, bb, 4 * H), jnp.float32),
        pltpu.VMEM((num_steps, bb, D), jnp.float32),
        pltpu.VMEM((num_steps, bb, H), jnp.float32),
        pltpu.VMEM((num_steps, bb, vp), jnp.float32),
        pltpu.VMEM((2 * L * num_steps, bb, H), jnp.float32),
        pltpu.VMEM((num_steps, bb), jnp.float32),
        pltpu.VMEM((num_steps, bb), jnp.int32),
    ]
    grads_flat = pl.pallas_call(
        partial(_lm_backward_kernel, spec_static=spec_static),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(
        tok_t, dloss_col, packed["emb"], packed["emb_t"],
        packed["proj"], packed["proj_fwd"],
        *packed["enc_wih"], *packed["enc_whh"], *packed["enc_bias"],
        *packed["enc_wih_t"], *packed["enc_whh_t"],
    )
    d_emb = grads_flat[0]
    enc_grads = []
    for layer in range(L):
        d_wih, d_whh, d_b = grads_flat[1 + 3 * layer: 4 + 3 * layer]
        enc_grads.append({
            "w_ih": d_wih, "w_hh": d_whh, "b_ih": d_b[0], "b_hh": d_b[0],
        })
    grads = {
        "embedding": d_emb[:params["embedding"].shape[0]],
        "encoder": enc_grads,
        "projection": grads_flat[1 + 3 * L],
    }
    return grads, None


fused_lm_loss.defvjp(_fused_lm_fwd, _fused_lm_bwd)


# ===================================================== data-parallel wrappers
def _dp(fn, mesh, n_batch_args):
    r"""shard_map a per-example fused kernel over the mesh's ``data`` axis:
    params replicate, batch args shard, and the sharded per-example outputs
    feed the trainers' (GSPMD-global) masked means. Verified bit-exact against
    the single-device call — forward and every gradient leaf
    (tests/test_seq2seq_train_pallas.py)."""
    from probnmn_tpu.parallel.mesh import shard_map_dp

    return shard_map_dp(fn, mesh, n_replicated=1, n_batch=n_batch_args)


def fused_tf_loss_dp(mesh, params, spec, source_tokens, target_tokens,
                     reinforce_norm: bool = False, **kw):
    r"""Data-parallel :func:`fused_tf_loss`: one kernel per device on its
    batch shard (Pallas custom calls cannot auto-partition under GSPMD, but
    they compose perfectly under ``shard_map``)."""
    fn = lambda p, s, t: fused_tf_loss(p, spec, s, t, reinforce_norm, **kw)
    return _dp(fn, mesh, 2)(params, source_tokens, target_tokens)


def fused_lm_loss_dp(mesh, params, spec, program_tokens, **kw):
    r"""Data-parallel :func:`fused_lm_loss`."""
    fn = lambda p, t: fused_lm_loss(p, spec, t, **kw)
    return _dp(fn, mesh, 1)(params, program_tokens)
