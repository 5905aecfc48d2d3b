r"""
Fused Pallas TPU kernel: the whole NMN program interpreter in one kernel.

Why: the XLA register machine (models/nmn.py) must compute EVERY module class at
EVERY step for EVERY example and select by mask — ~20x more MXU work and HBM
traffic than programs actually need, and the per-example gathered-weight einsum
materializes patches + per-example weights in HBM (measured ~5% MXU efficiency).

This kernel executes each example's program *exactly*:

- grid over the batch; per instance the stem features and both registers live in
  VMEM for the whole program;
- program tokens arrive as scalar-prefetch operands (SMEM), so each step's module
  kind, bank slots and chain length are scalar table lookups;
- only the branch for the step's module kind runs (``@pl.when`` predication) —
  a pad/scene/and/or step costs ~nothing, a filter costs exactly its 3 convs;
- ALL weight banks are VMEM-resident for the kernel's lifetime — the unified
  3x3 bank is 22 MB bf16 at CLEVR scale (v5e has ~128 MB VMEM), so each chain
  layer's (9C, C) weights are read by slot index directly, with no per-token
  DMA at all; the backward's GRADIENT banks (incl. the ~45 MB f32 unified 3x3
  grad bank) are likewise VMEM-resident accumulators written back once at
  kernel end;
- a 3x3 conv at STATIC dilation d keeps the image as a row-pitched flat VALUE
  (pitch 14+2d with d pad columns between rows — each dilation gets the
  TIGHTEST geometry it admits, since conv cost is linear in the sublane
  window: 224/248/304/432 rows for d=1/2/4/8) so each tap is a STATIC
  contiguous slice streamed straight to the MXU as one of 9 accumulating
  (slice, C) x (C, C) dots — no im2col patch materialization (which cost
  ~2/3 of the old 2.0 µs/conv; now 0.48 µs). Chains are straight-line per
  kind with a static dilation schedule; relate's mixed-dilation chain
  switches geometry between layers via compact -> to_flat;
- the tag/dispatch machine is pure scalar SMEM math; the scene/and/or
  register updates sit behind their own small ``@pl.when`` (most steps are
  chain steps that skip their ~300 KB of select traffic) and ALL module
  compute behind a single outer ``@pl.when`` with per-kind straight-line
  bodies;
- execution aborts at the first invalid operation, exactly like the reference's
  per-example try/except (nmn.py:202-238) — faithful semantics that double as
  ragged efficiency on malformed programs.

Semantics are identical to ``models/nmn.py::execute_programs`` (same tag machine,
same invalid rules); equivalence is tested in interpret mode and on device.
Training runs the same forward kernel under a ``jax.custom_vjp`` whose backward
pass is a second Pallas kernel (replay-and-reverse, see
``_interpreter_bwd_kernel``) — gradients match the XLA machine's.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probnmn_tpu.models.nmn import (
    AND,
    ATTENTION,
    COMPARE,
    OR,
    QUERY,
    RELATE,
    SAME,
    SCENE,
    TAG_ATTN,
    TAG_FEAT,
    TAG_NONE,
    NMNSpec,
)

MAX_CHAIN = 5  # relate has 5 3x3 convs; attention/query/compare use 2

# Streamed-residual layout (round 5): the training forward stores only the
# TWO chain activations the reverse sweep cannot cheaply recompute — acts[1]
# and acts[2] of the 2-conv chains (attention/query/compare). Everything else
# is recomputed in the backward from the out-register trajectory: acts[0] is
# one elementwise product (chains) or two (C,C) dots (compare), and relate's
# whole 5-conv chain is re-run from its entry register (~2.4 us against the
# ~5 MB/example of residual HBM traffic that storing its 6 slots cost — at
# most ~1-2 relate steps occur per CLEVR program). This cut the residual
# footprint from (T, 6, HW, C) to (T, 2, HW, C): 9.1 -> 3.9 MB/example bf16
# at CLEVR scale, paid once in the forward (write) and once in the backward
# (read).
RESID_SLOTS = 2


def _flat_conv_helpers(H, W, C):
    r"""Flat-layout 3x3 conv machinery shared by the forward and backward
    kernels.

    The image lives as a VALUE in a row-pitched flat layout (pad columns
    between rows), so every 3x3 tap is a STATIC contiguous slice fed straight
    to the MXU as one of 9 accumulating dots — no im2col patch materialization
    (the strided patch copies were ~2/3 of the old 2.0 µs/conv; now
    0.48 µs/conv). Each dilation d gets its own geometry — pitch 14+2d with
    d-pixel pads (``GD`` maps dilation -> geometry) — because conv cost is
    linear in the sublane window ``sl``: 224/248/304/432 rows for d=1/2/4/8.
    Pad positions are re-zeroed after every layer, reproducing exact
    zero-padding semantics.
    """
    HW = H * W

    def _geom(pitch, pad):
        rows = H + 2 * pad + 1
        base = pad * pitch + pad
        span = (W - 1) + (H - 1) * pitch + 1
        sl = ((span + 7) // 8) * 8
        rows = max(rows, -(-(base + (pad * pitch + pad) + sl) // pitch))
        flat = rows * pitch
        # validity mask over the sl-row output window, built from in-kernel
        # iota (Pallas kernels cannot capture host array constants)
        idx = jax.lax.broadcasted_iota(jnp.int32, (sl, 1), 0) + base
        r, cc = idx // pitch, idx % pitch
        valid = ((r >= pad) & (r < pad + H) & (cc >= pad) & (cc < pad + W)
                 ).astype(jnp.float32)
        return dict(pitch=pitch, pad=pad, base=base, sl=sl, flat=flat, valid=valid)

    def to_flat(compact_f32, g):
        img = compact_f32.reshape(H, W, C)
        img = jnp.pad(img, ((g["pad"], g["flat"] // g["pitch"] - H - g["pad"]),
                            (g["pad"], g["pitch"] - W - g["pad"]), (0, 0)))
        return img.reshape(g["flat"], C)

    def refold(out_sl_f32, g):
        r"""(sl, C) conv output -> next layer's flat input (pads re-zeroed)."""
        clean = out_sl_f32 * g["valid"]
        return jnp.pad(clean, ((g["base"], g["flat"] - g["base"] - g["sl"]), (0, 0)))

    def compact(out_sl_f32, g):
        full = jnp.pad(out_sl_f32 * g["valid"],
                       ((g["base"], g["flat"] - g["base"] - g["sl"]), (0, 0)))
        img = full.reshape(g["flat"] // g["pitch"], g["pitch"], C)
        return img[g["pad"]:g["pad"] + H, g["pad"]:g["pad"] + W, :].reshape(HW, C)

    def conv(flat_vals, w3_ref, slot, dilation: int, g):
        r"""Bias-free 3x3 conv: 9 accumulating dots over static tap slices of
        ``flat_vals`` against the (9C, C) weight rows of VMEM-resident bank
        slot ``slot`` (the whole unified bank lives in VMEM — 22 MB bf16 at
        CLEVR scale — so there is no per-token weight DMA at all)."""
        d = dilation
        tot = jnp.zeros((g["sl"], C), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                start = g["base"] + (ky - 1) * d * g["pitch"] + (kx - 1) * d
                k = ky * 3 + kx
                tot = tot + jnp.dot(
                    flat_vals[start:start + g["sl"], :],
                    w3_ref[slot, k * C:(k + 1) * C, :],
                    preferred_element_type=jnp.float32,
                )
        return tot

    G1, G2, G4, G8 = _geom(16, 1), _geom(18, 2), _geom(22, 4), _geom(32, 8)
    return dict(G1=G1, G2=G2, G4=G4, G8=G8,
                GD={1: G1, 2: G2, 4: G4, 8: G8},
                to_flat=to_flat, refold=refold, compact=compact, conv=conv)


# ------------------------------------------------------------------ host tables -------
def build_tables(spec: NMNSpec) -> Dict[str, jax.Array]:
    r"""Static per-token dispatch tables for the unified kernel bank layout.

    Slot order in the unified 3x3 bank (must match :func:`build_banks`):
    attention slots interleaved [conv1 s, conv2 s], then query [conv1 s,
    conv2 s], then relate [conv1..conv5 per slot], then compare [conv1 s,
    conv2 s]. The 1x1 head bank is [attention conv3 per slot | relate conv6
    per slot].
    """
    kind = np.asarray(spec.token_kind)
    bank = np.asarray(spec.token_bank)
    vocab = kind.shape[0]
    nb = spec.bank_sizes
    na, nq, nr = nb["attention"], nb["query"], nb["relate"]
    q_base = 2 * na
    r_base = q_base + 2 * nq
    c_base = r_base + 5 * nr

    chain_len = np.zeros(vocab, np.int32)
    slot3 = np.zeros((vocab, MAX_CHAIN), np.int32)
    head_slot = np.full(vocab, -1, np.int32)
    cmp_slot = np.zeros(vocab, np.int32)
    same_slot = np.zeros(vocab, np.int32)
    for t in range(vocab):
        k, s = int(kind[t]), int(bank[t])
        if k == ATTENTION:
            chain_len[t] = 2
            slot3[t, :2] = (2 * s, 2 * s + 1)
            head_slot[t] = s
        elif k == QUERY:
            chain_len[t] = 2
            slot3[t, :2] = (q_base + 2 * s, q_base + 2 * s + 1)
        elif k == RELATE:
            chain_len[t] = 5
            slot3[t, :5] = [r_base + 5 * s + l for l in range(5)]
            head_slot[t] = na + s
        elif k == COMPARE:
            chain_len[t] = 2
            slot3[t, :2] = (c_base + 2 * s, c_base + 2 * s + 1)
            cmp_slot[t] = s
        elif k == SAME:
            same_slot[t] = s

    return {
        "kind": jnp.asarray(kind, jnp.int32),
        "chain_len": jnp.asarray(chain_len, jnp.int32),
        "slot3": jnp.asarray(slot3, jnp.int32),
        "head_slot": jnp.asarray(head_slot, jnp.int32),
        "cmp_slot": jnp.asarray(cmp_slot, jnp.int32),
        "same_slot": jnp.asarray(same_slot, jnp.int32),
    }


def build_banks(params: Dict[str, Any], spec: NMNSpec, dtype=jnp.bfloat16):
    r"""Flatten per-class parameter banks into the unified kernel banks.

    Banks: ``w3`` (S3, 9C, C) unified 3x3 weights in k-major im2col row layout
    (row k*C + c_in multiplies patch column k*C + c_in — one big MXU matmul per
    conv instead of 9 small ones); all biases as (S, 8, 128) VMEM-resident
    planes with data in row 0; ``w1`` (S1, C, 8) unified 1x1 heads (out-dim
    padded 1->8) incl. the same-module conv with its attention-channel weight
    split out as SMEM scalars (``same_wa``).

    Pure jnp (traceable + differentiable): under ``jax.grad`` the cotangents
    scatter back through the stacking into the per-class banks, which is what
    lets the Pallas interpreter train.
    """
    C = spec.module_channels
    p = params

    def interleave3(convs):
        r"""Per-slot interleave of 3x3 banks: [conv_a s, conv_b s, ...] rows."""
        w = jnp.stack([c["w"] for c in convs], axis=1)  # (n, L, 3, 3, C, C)
        n, L = w.shape[:2]
        w = w.reshape(n * L, 9 * C, C)  # (ky, kx, c_in)-major rows
        b = jnp.stack([c["b"] for c in convs], axis=1).reshape(n * L, C)
        return w, b

    def bias_plane(rows):
        r"""(S, width<=128) biases -> (S, 8, 128) plane with data in row 0."""
        n, width = rows.shape
        plane = jnp.zeros((n, 8, 128), jnp.float32)
        return plane.at[:, 0, :width].set(rows.astype(jnp.float32))

    att_w, att_b = interleave3([p["attention"]["conv1"], p["attention"]["conv2"]])
    qry_w, qry_b = interleave3([p["query"]["conv1"], p["query"]["conv2"]])
    rel_w, rel_b = interleave3([p["relate"][f"conv{i}"] for i in range(1, 6)])
    cmp_w, cmp_b = interleave3([p["compare"]["conv1"], p["compare"]["conv2"]])
    w3 = jnp.concatenate([att_w, qry_w, rel_w, cmp_w])
    b3 = jnp.concatenate([att_b, qry_b, rel_b, cmp_b])

    # 1x1 heads: (n, C, 1) -> (n, C, 8) lane-padded; biases (n, 1) -> width 8.
    w1 = jnp.concatenate([p["attention"]["conv3"]["w"], p["relate"]["conv6"]["w"]])
    w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, 7)))
    b1 = jnp.concatenate([p["attention"]["conv3"]["b"], p["relate"]["conv6"]["b"]])
    b1 = jnp.pad(b1, ((0, 0), (0, 7)))

    same_w = p["same"]["conv"]["w"]  # (ns, C+1, 1)
    same_wf = jnp.pad(same_w[:, :C, :], ((0, 0), (0, 0), (0, 7)))
    same_wa = same_w[:, C, :].astype(jnp.float32)  # (ns, 1) SMEM scalars
    same_b = jnp.pad(p["same"]["conv"]["b"], ((0, 0), (0, 7)))

    return {
        "w3": w3.astype(dtype),
        "b3": bias_plane(b3).astype(dtype),
        "w1": w1.astype(dtype),
        "b1": bias_plane(b1).astype(dtype),
        "same_wf": same_wf.astype(dtype),
        "same_wa": same_wa,
        "same_b": bias_plane(same_b).astype(dtype),
        "wcmp": p["compare"]["projection"]["w"].astype(dtype),  # (Sc, 2C, C)
        "bcmp": bias_plane(p["compare"]["projection"]["b"]).astype(dtype),
    }


def build_kernel_tables(params: Dict[str, Any], spec: NMNSpec, dtype=jnp.bfloat16):
    r"""(banks, tables) for the kernel — see :func:`build_banks` / :func:`build_tables`."""
    return build_banks(params, spec, dtype), build_tables(spec)


# ------------------------------------------------------------------ kernel ------------
def _interpreter_kernel(
    # scalar prefetch
    tokens_ref,      # (B, T) int32, already reversed (execution order)
    kind_ref,        # (V,)
    chain_len_ref,   # (V,)
    slot3_ref,       # (V, MAX_CHAIN)
    head_slot_ref,   # (V,)
    cmp_slot_ref,    # (V,)
    same_slot_ref,   # (V,)
    start_ref,       # (B,) first non-pad step in execution order (pads are a
                     # reversed-order PREFIX; skipping them is a no-op by the
                     # reference's skip rule, nmn.py:207)
    # tensor inputs
    x_ref,           # (pack, H, W, C) stem features block (VMEM)
    w3_ref,          # (S3, 9C, C) VMEM-resident unified 3x3 bank (im2col rows)
    b3_ref,          # (S3, 8, 128) VMEM bias planes (row 0)
    w1_ref,          # (S1, C, 8) VMEM
    b1_ref,          # (S1, 8, 128) VMEM
    same_wf_ref,     # (Ss, C, 8) VMEM
    same_wa_ref,     # (Ss, 1) SMEM (f32 scalars)
    same_b_ref,      # (Ss, 8, 128) VMEM
    wcmp_ref,        # (Sc, 2C, C) VMEM
    bcmp_ref,        # (Sc, 8, 128) VMEM
    # outputs
    out_ref,         # (pack, H, W, C) final encoding (VMEM)
    invalid_ref,     # (pack, 8, 128) int32 (VMEM; tile-aligned flag plane)
    # scratch
    out_reg,         # (H*W, C) VMEM
    saved_reg,       # (H*W, C) VMEM
    acc,             # (H*W, C) f32 VMEM accumulator
    tag_ref,         # (4,) SMEM: out_tag, saved_tag, invalid
    *,
    pack: int = 1,   # examples per grid instance, run sequentially — halves
                     # the per-instance prologue/block-I/O overhead at pack=2
):
    T = tokens_ref.shape[1]
    H, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    HW = H * W
    dtype = x_ref.dtype

    fh = _flat_conv_helpers(H, W, C)
    G1, GD = fh["G1"], fh["GD"]
    to_flat, refold, compact = fh["to_flat"], fh["refold"], fh["compact"]

    def conv3x3_flat(flat_bf16, slot, dilation: int, g):
        tot = fh["conv"](flat_bf16, w3_ref, slot, dilation, g)
        bias = b3_ref[slot][0:1, :C].astype(jnp.float32)  # (1, C)
        return tot + bias

    def run_token(t, b, x):
        tok = tokens_ref[b, t]
        kind = kind_ref[tok]
        out_tag = tag_ref[0]
        saved_tag = tag_ref[1]

        # Early abort: the reference wraps each example's whole program in
        # try/except — the FIRST failure aborts the remaining execution
        # (nmn.py:202-238). Once invalid, all further work is skipped (the
        # output is zeroed regardless) — faithful AND the ragged-efficiency win.
        valid = tag_ref[2] == 0

        # ------- scalar dispatch + tag machine (pure SMEM math, no branching) -
        is_binop = (kind == AND) | (kind == OR)
        is_chain = (kind == ATTENTION) | (kind == QUERY) | (kind == RELATE)
        scene_ok = valid & (kind == SCENE)
        binop_ok = valid & is_binop & (saved_tag != TAG_NONE)
        do_chain = valid & is_chain & (out_tag == TAG_ATTN)
        do_cmp = (
            valid & (kind == COMPARE)
            & (out_tag == TAG_FEAT) & (saved_tag == TAG_FEAT)
        )
        do_same = valid & (kind == SAME) & (out_tag == TAG_ATTN)
        has_head = head_slot_ref[tok] >= 0

        invalid_now = (
            (is_binop & (saved_tag == TAG_NONE))
            | (is_chain & (out_tag != TAG_ATTN))
            | ((kind == COMPARE) & ((out_tag != TAG_FEAT) | (saved_tag != TAG_FEAT)))
            | ((kind == SAME) & (out_tag != TAG_ATTN))
        )
        both_attn = (out_tag == TAG_ATTN) & (saved_tag == TAG_ATTN)
        new_out_tag = jnp.where(
            scene_ok, TAG_ATTN,
            jnp.where(binop_ok, jnp.where(both_attn, TAG_ATTN, TAG_FEAT),
            jnp.where(do_chain, jnp.where(has_head, TAG_ATTN, TAG_FEAT),
            jnp.where(do_cmp, TAG_FEAT,
            jnp.where(do_same, TAG_ATTN, out_tag)))),
        )
        tag_ref[0] = new_out_tag
        tag_ref[1] = jnp.where(scene_ok, out_tag, saved_tag)
        tag_ref[2] = tag_ref[2] | jnp.where(valid & invalid_now, 1, 0)

        # ------- cheap register ops, predicated: most steps are chain/pad
        # steps that touch neither register here, so skipping the selects
        # saves ~300 KB/step of VMEM read-modify-write traffic (measured
        # ~1 us/step at (196, 128) f32 x 3 arrays) on the valid-program path.
        @pl.when(scene_ok | binop_ok)
        def _():
            old_out = out_reg[...]
            old_saved = saved_reg[...]
            minmax = jnp.where(
                kind == AND, jnp.minimum(old_out, old_saved),
                jnp.maximum(old_out, old_saved),
            )
            out_reg[...] = jnp.where(scene_ok, jnp.ones_like(old_out), minmax)
            saved_reg[...] = jnp.where(scene_ok, old_out, old_saved)

        # ------- heavy module work: ONE outer conditional region --------------
        @pl.when(do_chain | do_cmp | do_same)
        def _():

            @pl.when(do_chain & (kind == RELATE))
            def _():
                # straight-line 5-layer dilated chain + sigmoid head. Each
                # layer runs in the TIGHTEST geometry its dilation allows
                # (conv cost is linear in the sublane window: 224/248/304/432
                # rows for d=1/2/4/8 vs 432 for all five in G8 — a ~1.5 us
                # cut per relate); unlike-geometry transitions go through
                # compact -> to_flat instead of the same-geometry refold.
                dils = (1, 2, 4, 8, 1)
                flat = to_flat(
                    (x * out_reg[...]).astype(jnp.float32), GD[dils[0]]
                ).astype(dtype)
                res = None
                for l, dil in enumerate(dils):
                    res = jnp.maximum(
                        conv3x3_flat(flat, slot3_ref[tok, l], dil, GD[dil]), 0.0
                    )
                    if l + 1 < 5:
                        nxt = GD[dils[l + 1]]
                        if nxt is GD[dil]:
                            flat = refold(res, GD[dil]).astype(dtype)
                        else:
                            flat = to_flat(compact(res, GD[dil]), nxt).astype(dtype)
                acc[...] = compact(res, GD[dils[-1]])
                hs = head_slot_ref[tok]
                head = jnp.dot(
                    acc[...].astype(dtype), w1_ref[hs],
                    preferred_element_type=jnp.float32,
                ) + b1_ref[hs][0:1, :8].astype(jnp.float32)
                attn = jax.nn.sigmoid(head[:, :1])
                out_reg[...] = jnp.broadcast_to(attn, (HW, C)).astype(dtype)

            @pl.when(do_chain & (kind != RELATE))
            def _():
                # attention/query: straight-line 2-layer chain
                flat = to_flat((x * out_reg[...]).astype(jnp.float32), G1).astype(dtype)
                res = None
                for l in range(2):
                    res = jnp.maximum(
                        conv3x3_flat(flat, slot3_ref[tok, l], 1, G1), 0.0
                    )
                    if l + 1 < 2:
                        flat = refold(res, G1).astype(dtype)
                acc[...] = compact(res, G1)

                @pl.when(has_head)  # attention: 1x1 -> sigmoid -> attn
                def _():
                    hs = head_slot_ref[tok]
                    head = jnp.dot(
                        acc[...].astype(dtype), w1_ref[hs],
                        preferred_element_type=jnp.float32,
                    ) + b1_ref[hs][0:1, :8].astype(jnp.float32)
                    attn = jax.nn.sigmoid(head[:, :1])
                    out_reg[...] = jnp.broadcast_to(attn, (HW, C)).astype(dtype)

                @pl.when(jnp.logical_not(has_head))  # query: features out
                def _():
                    out_reg[...] = acc[...].astype(dtype)

            @pl.when(do_cmp)
            def _():
                cs = cmp_slot_ref[tok]
                wc = wcmp_ref[cs]  # (2C, C)
                proj = (
                    jnp.dot(out_reg[...], wc[:C], preferred_element_type=jnp.float32)
                    + jnp.dot(saved_reg[...], wc[C:], preferred_element_type=jnp.float32)
                    + bcmp_ref[cs][0:1, :C].astype(jnp.float32)
                )
                flat = to_flat(jnp.maximum(proj, 0.0), G1).astype(dtype)
                res = None
                for l in range(2):
                    res = jnp.maximum(
                        conv3x3_flat(flat, slot3_ref[tok, l], 1, G1), 0.0
                    )
                    if l + 1 < 2:
                        flat = refold(res, G1).astype(dtype)
                out_reg[...] = compact(res, G1).astype(dtype)

            @pl.when(do_same)
            def _():
                ss = same_slot_ref[tok]
                attn_col = out_reg[:, :1]  # (HW, 1) channel-0 attention
                am = jnp.argmax(attn_col[:, 0].astype(jnp.float32), axis=0)
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0)[:, 0] == am
                ).astype(dtype)
                vec = jnp.sum(x * onehot[:, None], axis=0, keepdims=True)  # (1, C)
                xsel = x * vec  # cross-correlate with the argmax location's features
                head = jnp.dot(xsel, same_wf_ref[ss], preferred_element_type=jnp.float32)
                head = head + attn_col.astype(jnp.float32) * same_wa_ref[ss, 0]
                head = head + same_b_ref[ss][0:1, :8].astype(jnp.float32)
                attn = jax.nn.sigmoid(head[:, :1])
                out_reg[...] = jnp.broadcast_to(attn, (HW, C)).astype(dtype)

        return ()

    # Ragged execution: start at the first non-pad token (reversed-order pad
    # prefix skipped — ~0.2 us/step x 18 pads/example on real programs) and
    # stop at the first invalid operation (the reference's try/except abort,
    # nmn.py:202-238 — on garbage programs this skips ~24 of 26 steps).
    def loop_cond(carry):
        t, inv = carry
        return (t < T) & (inv == 0)

    def run_example(l: int):
        b = pl.program_id(0) * pack + l
        x = x_ref[l].reshape(HW, C)

        # init registers: out = stem features (FEAT), saved empty.
        out_reg[...] = x
        saved_reg[...] = jnp.zeros_like(saved_reg)
        tag_ref[0] = TAG_FEAT
        tag_ref[1] = TAG_NONE
        tag_ref[2] = 0  # invalid

        def loop_body(carry):
            t, _ = carry
            run_token(t, b, x)
            return (t + 1, tag_ref[2])

        jax.lax.while_loop(loop_cond, loop_body, (start_ref[b], 0))

        invalid = tag_ref[2] | jnp.where(tag_ref[0] != TAG_FEAT, 1, 0)
        invalid_ref[l] = jnp.full((8, 128), invalid, jnp.int32)
        out_ref[l] = jnp.where(
            invalid == 1, jnp.zeros_like(out_reg), out_reg[...]
        ).reshape(H, W, C)

    for l in range(pack):
        run_example(l)


def execute_programs_pallas(
    banks: Dict[str, jax.Array],
    tables: Dict[str, jax.Array],
    spec: NMNSpec,
    stem_feats: jax.Array,   # (B, H, W, C) in compute dtype
    programs: jax.Array,     # (B, T) int32
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    r"""Drop-in replacement for ``models.nmn.execute_programs`` (inference path)."""
    B, H, W, C = stem_feats.shape
    tokens_rev = jnp.flip(programs, axis=1).astype(jnp.int32)
    # First non-pad step per example (execution order); all-pad rows get 0 and
    # simply no-op through the machine.
    start_t = jnp.argmax(tokens_rev != 0, axis=1).astype(jnp.int32)

    # Two examples per grid instance amortize the per-instance prologue and
    # block-I/O overhead (~2 us of the ~16 us/example valid-program cost);
    # odd batches get one zero-padded no-op row, stripped below.
    PACK = 2
    Bp = -(-B // PACK) * PACK
    if Bp != B:
        stem_feats = jnp.pad(stem_feats, ((0, Bp - B), (0, 0), (0, 0), (0, 0)))
        tokens_rev = jnp.pad(tokens_rev, ((0, Bp - B), (0, 0)))
        start_t = jnp.pad(start_t, (0, Bp - B))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(Bp // PACK,),
        in_specs=[
            pl.BlockSpec((PACK, H, W, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3 bank (VMEM-resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # same_wf
            pl.BlockSpec(memory_space=pltpu.SMEM),  # same_wa (f32 scalars)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # same_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wcmp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bcmp
        ],
        out_specs=[
            pl.BlockSpec((PACK, H, W, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PACK, 8, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((H * W, C), stem_feats.dtype),            # out_reg
            pltpu.VMEM((H * W, C), stem_feats.dtype),            # saved_reg
            pltpu.VMEM((H * W, C), jnp.float32),                 # acc
            pltpu.SMEM((4,), jnp.int32),                         # tags
        ],
    )

    out, invalid = pl.pallas_call(
        partial(_interpreter_kernel, pack=PACK),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, H, W, C), stem_feats.dtype),
            jax.ShapeDtypeStruct((Bp, 8, 128), jnp.int32),
        ],
        # The unified 3x3 bank is VMEM-resident (22 MB bf16 at CLEVR scale) —
        # raise the default 16 MB scoped-VMEM budget.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        tokens_rev,
        tables["kind"], tables["chain_len"], tables["slot3"],
        tables["head_slot"], tables["cmp_slot"], tables["same_slot"],
        start_t,
        stem_feats,
        banks["w3"], banks["b3"], banks["w1"], banks["b1"],
        banks["same_wf"], banks["same_wa"], banks["same_b"],
        banks["wcmp"], banks["bcmp"],
    )
    return out[:B], invalid[:B, 0, 0].astype(bool)


# ------------------------------------------------------------ training forward --------
def _interpreter_train_kernel(
    # scalar prefetch (same 8 operands as the inference kernel)
    tokens_ref, kind_ref, chain_len_ref, slot3_ref, head_slot_ref,
    cmp_slot_ref, same_slot_ref, start_ref,
    # tensor inputs
    x_ref,           # (1, H, W, C) stem features block (VMEM)
    w3_ref, b3_ref, w1_ref, b1_ref, same_wf_ref, same_wa_ref, same_b_ref,
    wcmp_ref, bcmp_ref,
    # outputs
    out_ref,         # (1, H, W, C) final encoding
    invalid_ref,     # (1, 8, 128) int32
    otraj_ref,       # (1, T, HW, C) dtype — out register at ENTRY of each step
    atraj_ref,       # (1, T, RESID_SLOTS, HW, C) dtype — acts[1]/acts[2] of
                     # 2-conv chain steps (see RESID_SLOTS layout note)
    # scratch
    out_reg, saved_reg, acts, tag_ref,
):
    r"""Forward pass for TRAINING: identical semantics to
    :func:`_interpreter_kernel`, additionally streaming the per-step register
    trajectory and chain activations to HBM as residuals. The backward kernel
    then skips its replay phase entirely (``no_replay``): replay re-executed
    the whole program (~one full forward, ~4.3 ms/batch-128 measured round 3),
    while the residual blocks (~3.9 MB/example bf16, RESID_SLOTS layout) stream back under the
    reverse sweep's compute and are effectively free. Chain layers here go
    through per-layer ``compact`` captures (the same activation quantization
    points as the replay they replace), so gradients are unchanged.
    """
    T = tokens_ref.shape[1]
    H, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    HW = H * W
    dtype = x_ref.dtype
    f32 = jnp.float32

    fh = _flat_conv_helpers(H, W, C)
    G1, GD = fh["G1"], fh["GD"]
    to_flat, compact = fh["to_flat"], fh["compact"]

    def conv3x3_flat(flat_bf16, slot, dilation: int, g):
        tot = fh["conv"](flat_bf16, w3_ref, slot, dilation, g)
        return tot + b3_ref[slot][0:1, :C].astype(f32)

    def chain_capture(tok, dils):
        r"""acts[0] must already hold the chain input; computes acts[1..L]
        with per-layer compact captures (same math as the bwd replay)."""
        for l, dil in enumerate(dils):
            g = GD[dil]
            flat = to_flat(acts[l], g).astype(dtype)
            z = conv3x3_flat(flat, slot3_ref[tok, l], dil, g)
            acts[l + 1] = compact(jnp.maximum(z, 0.0), g)
        return len(dils)

    def head_apply(a_last, hs):
        head = jnp.dot(
            a_last.astype(dtype), w1_ref[hs], preferred_element_type=f32
        ) + b1_ref[hs][0:1, :8].astype(f32)
        return jax.nn.sigmoid(head[:, :1])

    x = x_ref[0].reshape(HW, C)

    def run_token(t, b):
        tok = tokens_ref[b, t]
        kind = kind_ref[tok]
        out_tag = tag_ref[0]
        saved_tag = tag_ref[1]
        valid = tag_ref[2] == 0
        otraj_ref[0, t] = out_reg[...]  # entry value, before any update

        is_binop = (kind == AND) | (kind == OR)
        is_chain = (kind == ATTENTION) | (kind == QUERY) | (kind == RELATE)
        scene_ok = valid & (kind == SCENE)
        binop_ok = valid & is_binop & (saved_tag != TAG_NONE)
        do_chain = valid & is_chain & (out_tag == TAG_ATTN)
        do_cmp = (
            valid & (kind == COMPARE)
            & (out_tag == TAG_FEAT) & (saved_tag == TAG_FEAT)
        )
        do_same = valid & (kind == SAME) & (out_tag == TAG_ATTN)
        has_head = head_slot_ref[tok] >= 0

        invalid_now = (
            (is_binop & (saved_tag == TAG_NONE))
            | (is_chain & (out_tag != TAG_ATTN))
            | ((kind == COMPARE) & ((out_tag != TAG_FEAT) | (saved_tag != TAG_FEAT)))
            | ((kind == SAME) & (out_tag != TAG_ATTN))
        )
        both_attn = (out_tag == TAG_ATTN) & (saved_tag == TAG_ATTN)
        new_out_tag = jnp.where(
            scene_ok, TAG_ATTN,
            jnp.where(binop_ok, jnp.where(both_attn, TAG_ATTN, TAG_FEAT),
            jnp.where(do_chain, jnp.where(has_head, TAG_ATTN, TAG_FEAT),
            jnp.where(do_cmp, TAG_FEAT,
            jnp.where(do_same, TAG_ATTN, out_tag)))),
        )
        tag_ref[0] = new_out_tag
        tag_ref[1] = jnp.where(scene_ok, out_tag, saved_tag)
        tag_ref[2] = tag_ref[2] | jnp.where(valid & invalid_now, 1, 0)

        @pl.when(scene_ok | binop_ok)
        def _():
            old_out = out_reg[...]
            old_saved = saved_reg[...]
            minmax = jnp.where(
                kind == AND, jnp.minimum(old_out, old_saved),
                jnp.maximum(old_out, old_saved),
            )
            out_reg[...] = jnp.where(scene_ok, jnp.ones_like(old_out), minmax)
            saved_reg[...] = jnp.where(scene_ok, old_out, old_saved)

        @pl.when(do_chain | do_cmp | do_same)
        def _():
            entry_out = otraj_ref[0, t]  # register at entry (just stored)

            @pl.when(do_chain & (kind == RELATE))
            def _():
                acts[0] = (x * entry_out).astype(f32)
                chain_capture(tok, (1, 2, 4, 8, 1))
                attn = head_apply(acts[5], head_slot_ref[tok])
                out_reg[...] = jnp.broadcast_to(attn, (HW, C)).astype(dtype)

            @pl.when(do_chain & (kind != RELATE))
            def _():
                acts[0] = (x * entry_out).astype(f32)
                chain_capture(tok, (1, 1))

                @pl.when(has_head)
                def _():
                    attn = head_apply(acts[2], head_slot_ref[tok])
                    out_reg[...] = jnp.broadcast_to(attn, (HW, C)).astype(dtype)

                @pl.when(jnp.logical_not(has_head))
                def _():
                    out_reg[...] = acts[2].astype(dtype)

            @pl.when(do_cmp)
            def _():
                cs = cmp_slot_ref[tok]
                wc = wcmp_ref[cs]
                proj = (
                    jnp.dot(entry_out, wc[:C], preferred_element_type=f32)
                    + jnp.dot(saved_reg[...], wc[C:], preferred_element_type=f32)
                    + bcmp_ref[cs][0:1, :C].astype(f32)
                )
                acts[0] = jnp.maximum(proj, 0.0)
                chain_capture(tok, (1, 1))
                out_reg[...] = acts[2].astype(dtype)

            @pl.when(do_same)
            def _():
                ss = same_slot_ref[tok]
                attn_col = entry_out[:, :1]
                am = jnp.argmax(attn_col[:, 0].astype(f32), axis=0)
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0)[:, 0] == am
                ).astype(dtype)
                vec = jnp.sum(x * onehot[:, None], axis=0, keepdims=True)
                xsel = x * vec
                head = jnp.dot(xsel, same_wf_ref[ss], preferred_element_type=f32)
                head = head + attn_col.astype(f32) * same_wa_ref[ss, 0]
                head = head + same_b_ref[ss][0:1, :8].astype(f32)
                attn = jax.nn.sigmoid(head[:, :1])
                out_reg[...] = jnp.broadcast_to(attn, (HW, C)).astype(dtype)

            # Store only the two activations the reverse sweep reads back
            # (RESID_SLOTS layout note at top): acts[1]/acts[2] of the 2-conv
            # chains. Relate and same steps store nothing — relate's chain is
            # recomputed from its entry register in the backward; same never
            # reads activations.
            @pl.when((do_chain & (kind != RELATE)) | do_cmp)
            def _():
                atraj_ref[0, t, 0] = acts[1].astype(dtype)
                atraj_ref[0, t, 1] = acts[2].astype(dtype)

        return ()

    b = pl.program_id(0)
    out_reg[...] = x
    saved_reg[...] = jnp.zeros_like(saved_reg)
    tag_ref[0] = TAG_FEAT
    tag_ref[1] = TAG_NONE
    tag_ref[2] = 0

    def loop_cond(carry):
        t, inv = carry
        return (t < T) & (inv == 0)

    def loop_body(carry):
        t, _ = carry
        run_token(t, b)
        return (t + 1, tag_ref[2])

    jax.lax.while_loop(loop_cond, loop_body, (start_ref[b], 0))

    invalid = tag_ref[2] | jnp.where(tag_ref[0] != TAG_FEAT, 1, 0)
    invalid_ref[0] = jnp.full((8, 128), invalid, jnp.int32)
    out_ref[0] = jnp.where(
        invalid == 1, jnp.zeros_like(out_reg), out_reg[...]
    ).reshape(H, W, C)


def _execute_train_fwd_pallas(
    banks, tables, stem_feats, programs, interpret: bool = False
):
    r"""Training forward: (final, invalid, out-trajectory, activation-
    trajectory). The trajectories are the backward kernel's residuals."""
    B, H, W, C = stem_feats.shape
    T = programs.shape[1]
    HW = H * W
    tokens_rev = jnp.flip(programs, axis=1).astype(jnp.int32)
    start_t = jnp.argmax(tokens_rev != 0, axis=1).astype(jnp.int32)
    dtype = stem_feats.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # same_wf
            pl.BlockSpec(memory_space=pltpu.SMEM),  # same_wa
            pl.BlockSpec(memory_space=pltpu.VMEM),  # same_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wcmp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bcmp
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, HW, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, RESID_SLOTS, HW, C),
                         lambda b, *_: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((HW, C), dtype),                     # out_reg
            pltpu.VMEM((HW, C), dtype),                     # saved_reg
            pltpu.VMEM((MAX_CHAIN + 1, HW, C), jnp.float32),  # acts
            pltpu.SMEM((4,), jnp.int32),                    # tags
        ],
    )

    out, invalid, otraj, atraj = pl.pallas_call(
        _interpreter_train_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), dtype),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, T, HW, C), dtype),
            jax.ShapeDtypeStruct((B, T, RESID_SLOTS, HW, C), dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(
        tokens_rev,
        tables["kind"], tables["chain_len"], tables["slot3"],
        tables["head_slot"], tables["cmp_slot"], tables["same_slot"],
        start_t,
        stem_feats,
        banks["w3"], banks["b3"], banks["w1"], banks["b1"],
        banks["same_wf"], banks["same_wa"], banks["same_b"],
        banks["wcmp"], banks["bcmp"],
    )
    return out, invalid[:, 0, 0].astype(bool), otraj, atraj


# ------------------------------------------------------------------ backward ----------
def _interpreter_bwd_kernel(*refs, no_replay: bool = False):
    r"""Positional refs (Pallas order: scalar prefetch, inputs, outputs,
    scratch), parsed per mode below.

    Scalar prefetch (both modes):
      tokens_ref (B, T) int32 reversed (execution order); kind_ref (V,);
      slot3_ref (V, MAX_CHAIN); head_slot_ref / cmp_slot_ref / same_slot_ref
      (V,); invalid_flags (B,) int32 — forward invalid flags (invalid => zero
      grads); start_ref (B,) first non-pad step in execution order (pad prefix
      is a no-op by the reference's skip rule).

    Tensor inputs:
      x_ref (1, H, W, C) stem features block; gfin_ref (1, H, W, C) f32
      cotangent of the final encoding; [no_replay only: otraj_in
      (1, T, HW, C) and atraj_in (1, T, RESID_SLOTS, HW, C) — the training
      forward's streamed residuals]; then the VMEM-resident weight banks
      w3 (S3, 9C, C), b3 (S3, 8, 128), w1 (S1, C, 8), b1 (S1, 8, 128),
      same_wf (Ss, C, 8), same_wa (Ss, 1) SMEM f32, same_b (Ss, 8, 128),
      wcmp (Sc, 2C, C), bcmp (Sc, 8, 128).

    Outputs:
      dx_ref (1, H, W, C) f32 per-example stem gradient, then the
      VMEM-resident f32 gradient-bank accumulators with constant index maps
      (dw3 (S3, 9C, C), db3, dw1 (S1, C, 128; col 0 meaningful), db1, dwf,
      dwa (scalar at [s, 0, 0]), dsb, dwc (Sc, 2C, C), dbc).

    Scratch:
      [replay mode only: reg_out / reg_saved (HW, C) dtype replay registers;
      out_traj (T, HW, C) dtype out-register entry values; acts_traj
      (T, MAX_CHAIN+1, HW, C) dtype replay-captured chain activations];
      lscene_ref (T,) SMEM int32 — index of the last scene step before t
      (-1 = none; the saved register only changes at scene steps, so its
      per-step value is out_traj[lscene[t]] — storing the full saved
      trajectory would double the VMEM footprint past budget);
      acts (MAX_CHAIN+1, HW, C) f32; g_out / g_saved / dx_acc (HW, C) f32.
    """
    if no_replay:
        (tokens_ref, kind_ref, slot3_ref, head_slot_ref, cmp_slot_ref,
         same_slot_ref, invalid_flags, start_ref,
         x_ref, gfin_ref, otraj_in, atraj_in,
         w3_ref, b3_ref, w1_ref, b1_ref, same_wf_ref, same_wa_ref,
         same_b_ref, wcmp_ref, bcmp_ref,
         dx_ref, dw3_ref, db3_ref, dw1_ref, db1_ref, dwf_ref, dwa_ref,
         dsb_ref, dwc_ref, dbc_ref,
         lscene_ref, acts, g_out, g_saved, dx_acc) = refs
        reg_out = reg_saved = out_traj = acts_traj = None
        read_acts = None  # no_replay stages acts per kind (stage_*_acts below)

        def read_otraj(t):
            return otraj_in[0, t]
    else:
        (tokens_ref, kind_ref, slot3_ref, head_slot_ref, cmp_slot_ref,
         same_slot_ref, invalid_flags, start_ref,
         x_ref, gfin_ref,
         w3_ref, b3_ref, w1_ref, b1_ref, same_wf_ref, same_wa_ref,
         same_b_ref, wcmp_ref, bcmp_ref,
         dx_ref, dw3_ref, db3_ref, dw1_ref, db1_ref, dwf_ref, dwa_ref,
         dsb_ref, dwc_ref, dbc_ref,
         reg_out, reg_saved, out_traj, lscene_ref, acts, acts_traj,
         g_out, g_saved, dx_acc) = refs

        def read_otraj(t):
            return out_traj[t]

        def read_acts(t):
            return acts_traj[t]
    # Backward pass of the fused interpreter, per example.
    #
    # Replay mode (the round-3 design): phase 1 re-executes the program,
    # storing the out/saved register values at the entry of every step in
    # VMEM — no tag machine needed: per-step actions on a *valid* example are
    # fully determined by the token kind (any failed predicate would have
    # marked the example invalid, and invalid examples receive zero gradient
    # because the forward zeroes their output).
    #
    # no_replay mode (round 4): the training forward already streamed the
    # register/activation trajectories to HBM as residuals; phase 1 reduces
    # to a scalar SMEM scan computing lscene, and ~one full forward of
    # recompute per backward disappears (the residual block reads overlap
    # the reverse sweep's compute).
    #
    # Phase 2 sweeps the steps in reverse, reading each heavy step's
    # conv-chain activations back from the captured trajectory and
    # backpropagating: conv backward uses the shared flat-layout machinery —
    # 9 per-tap contract-dim0 dots for the weight grad and 9 shifted-pad
    # accumulations of per-tap back-projections (g @ W_k^T) for the input
    # grad. ALL bank gradients — including the unified 3x3 bank (~45 MB f32
    # at CLEVR scale, fitting VMEM alongside the 22 MB bf16 weight bank) —
    # accumulate in VMEM outputs with constant index maps and are written
    # back to HBM once at kernel end; there is no per-layer HBM
    # read-modify-write traffic at all (that DMA was ~2/3 of backward cost
    # in the round-2 kernel, PERF.md trajectory 41.9 -> 24 -> 16 -> this).
    b = pl.program_id(0)
    T = tokens_ref.shape[1]
    H, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    HW = H * W
    dtype = x_ref.dtype
    f32 = jnp.float32

    x = x_ref[0].reshape(HW, C)

    # --- zero the accumulated outputs on the first grid step ------------------
    @pl.when(b == 0)
    def _():
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db3_ref[...] = jnp.zeros_like(db3_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        dwa_ref[...] = jnp.zeros_like(dwa_ref)
        dsb_ref[...] = jnp.zeros_like(dsb_ref)
        dwc_ref[...] = jnp.zeros_like(dwc_ref)
        dbc_ref[...] = jnp.zeros_like(dbc_ref)

    # --- shared helpers --------------------------------------------------------
    fh = _flat_conv_helpers(H, W, C)
    G1, GD = fh["G1"], fh["GD"]
    to_flat, compact_out = fh["to_flat"], fh["compact"]

    def conv_flat(flat_vals, slot, dilation: int, g):
        return fh["conv"](flat_vals, w3_ref, slot, dilation, g) + b3_ref[
            slot
        ][0:1, :C].astype(f32)

    lanes128 = jax.lax.broadcasted_iota(jnp.int32, (HW, 128), 1)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lanes8_128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lanesC = jax.lax.broadcasted_iota(jnp.int32, (HW, C), 1)

    def row0_plane(vec128):
        r"""(128,) -> (8, 128) plane with the vector in row 0."""
        return jnp.where(rows8 == 0, vec128[None, :], 0.0)

    def head_recompute(a_last, hs):
        head = jnp.dot(
            a_last.astype(dtype), w1_ref[hs], preferred_element_type=f32
        ) + b1_ref[hs][0:1, :8].astype(f32)
        return jax.nn.sigmoid(head[:, :1])  # (HW, 1)

    def head_bwd(a_last, hs, attn, g_o):
        r"""Backward through broadcast(sigmoid(head col 0)); returns g wrt a_last."""
        g_attn = jnp.sum(g_o, axis=1, keepdims=True)  # (HW, 1)
        g_h0 = g_attn * attn * (1.0 - attn)           # (HW, 1) f32
        g128 = jnp.where(lanes128 == 0, g_h0, 0.0)    # (HW, 128), col 0 = g_h0
        dw1_ref[hs] = dw1_ref[hs] + jax.lax.dot_general(
            a_last.astype(dtype), g128.astype(dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        db1_ref[hs] = db1_ref[hs] + row0_plane(jnp.sum(g128, axis=0))
        g8 = g128[:, :8]
        return jax.lax.dot_general(  # g_h @ w1^T -> (HW, C)
            g8.astype(dtype), w1_ref[hs],
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )

    def conv_layer_bwd(g_a, slot, dilation: int, inp, outp, g):
        r"""Backward of relu(conv3x3(inp)) in the flat layout: per-tap
        contract-dim0 dots for dw3 (accumulated straight into the VMEM-resident
        grad bank) + db3, and shifted-pad accumulation for the input grad.
        inp/outp are stored f32 activations in the compact (HW, C) layout."""
        g_z = g_a * (outp > 0.0)
        colsum = jnp.sum(g_z, axis=0)  # (C,)
        db3_ref[slot] = db3_ref[slot] + row0_plane(
            jnp.pad(colsum, (0, 128 - C))
        )
        inp_flat = to_flat(inp, g).astype(dtype)
        gz_sl = to_flat(g_z, g)[g["base"]:g["base"] + g["sl"], :].astype(dtype)
        d = dilation
        # dw3[slot] += tap_slice(inp)^T @ g_z per tap, straight into VMEM.
        dparts = []
        for ky in range(3):
            for kx in range(3):
                start = g["base"] + (ky - 1) * d * g["pitch"] + (kx - 1) * d
                dparts.append(jax.lax.dot_general(
                    inp_flat[start:start + g["sl"], :], gz_sl,
                    (((0,), (0,)), ((), ())), preferred_element_type=f32,
                ))
        dw3_ref[slot] = dw3_ref[slot] + jnp.concatenate(dparts, axis=0)
        # Input grad: g_inp[p + off_k] += (g_z @ W_k^T)[p], accumulated as 9
        # shifted pads of the per-tap back-projections in flat space.
        ginp_flat = jnp.zeros((g["flat"], C), f32)
        for ky in range(3):
            for kx in range(3):
                k = ky * 3 + kx
                start = g["base"] + (ky - 1) * d * g["pitch"] + (kx - 1) * d
                gW = jax.lax.dot_general(
                    gz_sl, w3_ref[slot, k * C:(k + 1) * C, :],
                    (((1,), (1,)), ((), ())), preferred_element_type=f32,
                )
                ginp_flat = ginp_flat + jnp.pad(
                    gW, ((start, g["flat"] - start - g["sl"]), (0, 0))
                )
        img = ginp_flat.reshape(g["flat"] // g["pitch"], g["pitch"], C)
        return img[g["pad"]:g["pad"] + H, g["pad"]:g["pad"] + W, :].reshape(HW, C)

    def chain_bwd(tok, dils):
        r"""Recompute a conv chain from the stored entry register into ``acts``
        (compact f32 per layer); the reverse sweep backprops from them. Each
        layer runs in the tightest geometry its dilation allows (``GD``),
        mirroring the forward kernel."""
        L = len(dils)
        for l in range(L):
            g = GD[dils[l]]
            flat = to_flat(acts[l], g).astype(dtype)
            z = conv_flat(flat, slot3_ref[tok, l], dils[l], g)
            acts[l + 1] = compact_out(jnp.maximum(z, 0.0), g)
        return L

    # Per-kind staging of the reverse sweep's chain activations into ``acts``
    # (RESID_SLOTS layout note at top). no_replay: acts[0] is recomputed from
    # the entry register (one product for chains, the two (C,C) projection
    # dots for compare), acts[1]/acts[2] stream in as residuals, and relate's
    # 5-conv chain is recomputed whole (its 6 slots are not stored). replay:
    # all slots come from the replay phase's capture. The conv dots downstream
    # cast their inputs back to ``dtype``, so a recomputed-f32 slot and its
    # stored-bf16 round trip feed the MXU identical operands.
    def stage_relate_acts(t, tok, out_in):
        if no_replay:
            acts[0] = (x * out_in).astype(f32)
            chain_bwd(tok, (1, 2, 4, 8, 1))
        else:
            acts[...] = read_acts(t).astype(f32)

    def stage_chain2_acts(t, tok, out_in):
        if no_replay:
            acts[0] = (x * out_in).astype(f32)
            acts[1] = atraj_in[0, t, 0].astype(f32)
            acts[2] = atraj_in[0, t, 1].astype(f32)
        else:
            acts[...] = read_acts(t).astype(f32)

    def stage_cmp_acts(t, tok, out_in, saved_in):
        if no_replay:
            cs = cmp_slot_ref[tok]
            wc = wcmp_ref[cs]
            proj = (
                jnp.dot(out_in, wc[:C], preferred_element_type=f32)
                + jnp.dot(saved_in, wc[C:], preferred_element_type=f32)
                + bcmp_ref[cs][0:1, :C].astype(f32)
            )
            acts[0] = jnp.maximum(proj, 0.0)
            acts[1] = atraj_in[0, t, 0].astype(f32)
            acts[2] = atraj_in[0, t, 1].astype(f32)
        else:
            acts[...] = read_acts(t).astype(f32)

    # --- per-example body -------------------------------------------------------
    dx_acc[...] = jnp.zeros_like(dx_acc)
    g_out[...] = jnp.zeros_like(g_out)
    g_saved[...] = jnp.zeros_like(g_saved)

    def _replay():
        # ================= phase 1: replay, storing the register trajectory ===
        reg_out[...] = x
        reg_saved[...] = jnp.zeros_like(reg_saved)

        def replay_step(t, last_scene):
            tok = tokens_ref[b, t]
            kind = kind_ref[tok]
            out_traj[t] = reg_out[...]
            lscene_ref[t] = last_scene

            is_chain = (kind == ATTENTION) | (kind == QUERY) | (kind == RELATE)
            is_cmp = kind == COMPARE
            is_same = kind == SAME
            is_scene = kind == SCENE
            is_binop = (kind == AND) | (kind == OR)
            has_head = head_slot_ref[tok] >= 0

            # Register ops predicated (kinds are mutually exclusive, so the
            # heavy branches below read the still-unmodified registers
            # directly — see the forward kernel's rationale).
            @pl.when(is_scene | is_binop)
            def _():
                old_out = reg_out[...]
                old_saved = reg_saved[...]
                minmax = jnp.where(
                    kind == AND, jnp.minimum(old_out, old_saved),
                    jnp.maximum(old_out, old_saved),
                )
                reg_out[...] = jnp.where(is_scene, jnp.ones_like(old_out), minmax)
                reg_saved[...] = jnp.where(is_scene, old_out, old_saved)

            @pl.when(is_chain | is_cmp | is_same)
            def _():
                entry_out = out_traj[t]  # register at entry (just stored)

                @pl.when(is_chain & (kind == RELATE))
                def _():
                    acts[0] = (x * entry_out).astype(f32)
                    chain_bwd(tok, (1, 2, 4, 8, 1))
                    hs = head_slot_ref[tok]
                    attn = head_recompute(acts[5], hs)
                    reg_out[...] = jnp.broadcast_to(attn, (HW, C)).astype(dtype)

                @pl.when(is_chain & (kind != RELATE))
                def _():
                    acts[0] = (x * entry_out).astype(f32)
                    chain_bwd(tok, (1, 1))

                    @pl.when(has_head)
                    def _():
                        hs = head_slot_ref[tok]
                        attn = head_recompute(acts[2], hs)
                        reg_out[...] = jnp.broadcast_to(attn, (HW, C)).astype(dtype)

                    @pl.when(jnp.logical_not(has_head))
                    def _():
                        reg_out[...] = acts[2].astype(dtype)

                @pl.when(is_cmp)
                def _():
                    cs = cmp_slot_ref[tok]
                    wc = wcmp_ref[cs]
                    proj = (
                        jnp.dot(entry_out, wc[:C], preferred_element_type=f32)
                        + jnp.dot(reg_saved[...], wc[C:], preferred_element_type=f32)
                        + bcmp_ref[cs][0:1, :C].astype(f32)
                    )
                    acts[0] = jnp.maximum(proj, 0.0)
                    chain_bwd(tok, (1, 1))
                    reg_out[...] = acts[2].astype(dtype)

                @pl.when(is_same)
                def _():
                    ss = same_slot_ref[tok]
                    attn_col = entry_out[:, :1]
                    am = jnp.argmax(attn_col[:, 0].astype(f32), axis=0)
                    onehot = (
                        jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0)[:, 0] == am
                    ).astype(dtype)
                    vec = jnp.sum(x * onehot[:, None], axis=0, keepdims=True)
                    xsel = x * vec
                    head = jnp.dot(
                        xsel, same_wf_ref[ss], preferred_element_type=f32
                    )
                    head = head + attn_col.astype(f32) * same_wa_ref[ss, 0]
                    head = head + same_b_ref[ss][0:1, :8].astype(f32)
                    attn = jax.nn.sigmoid(head[:, :1])
                    reg_out[...] = jnp.broadcast_to(attn, (HW, C)).astype(dtype)

                # Capture the step's chain activations so the reverse sweep
                # reads them back instead of recomputing the chain (for `same`
                # steps this stores unused garbage — never read back).
                acts_traj[t] = acts[...].astype(dtype)

            return jnp.where(kind == SCENE, t, last_scene)

        jax.lax.fori_loop(start_ref[b], T, replay_step, jnp.int32(-1), unroll=False)

    @pl.when(invalid_flags[b] == 0)
    def _():
        if no_replay:
            # All the replay phase still owes us is lscene: a scalar-only scan
            # (the trajectories themselves stream in as residual inputs).
            def scene_scan(t, last):
                lscene_ref[t] = last
                return jnp.where(kind_ref[tokens_ref[b, t]] == SCENE, t, last)

            jax.lax.fori_loop(start_ref[b], T, scene_scan, jnp.int32(-1),
                              unroll=False)
        else:
            _replay()

        # ================= phase 2: reverse sweep ==============================
        g_out[...] = gfin_ref[0].reshape(HW, C)
        g_saved[...] = jnp.zeros_like(g_saved)

        def bwd_step(i, _):
            t = T - 1 - i
            tok = tokens_ref[b, t]
            kind = kind_ref[tok]
            out_in = read_otraj(t)
            ls = lscene_ref[t]

            is_chain = (kind == ATTENTION) | (kind == QUERY) | (kind == RELATE)
            is_cmp = kind == COMPARE
            is_same = kind == SAME
            is_scene = kind == SCENE
            is_binop = (kind == AND) | (kind == OR)
            has_head = head_slot_ref[tok] >= 0

            go = g_out[...]
            gs = g_saved[...]

            def load_saved_in():
                # The saved register's per-step value is the out-register entry
                # of the last scene step (see lscene_ref) — loaded only by the
                # branches that consume it.
                saved_src = read_otraj(jnp.maximum(ls, 0))
                return jnp.where(ls >= 0, saved_src, jnp.zeros_like(saved_src))

            # ---- cheap register-grad ops, predicated (pad/chain steps skip) --
            @pl.when(is_scene | is_binop)
            def _():
                a = out_in.astype(f32)
                c = load_saved_in().astype(f32)
                # min/max subgradient with 0.5/0.5 tie splitting (== jnp.minimum
                # / torch). Select between f32 masks — Mosaic cannot select
                # between i1 vectors.
                picked_out = jnp.where(
                    kind == AND,
                    jnp.where(a < c, 1.0, 0.0),
                    jnp.where(a > c, 1.0, 0.0),
                )
                w_out = picked_out + jnp.where(a == c, 0.5, 0.0)
                g_out[...] = jnp.where(is_scene, gs, go * w_out)
                g_saved[...] = jnp.where(
                    is_scene, jnp.zeros_like(gs), go * (1.0 - w_out) + gs
                )

            # ---- heavy module backward: ONE outer conditional region ----------
            @pl.when(is_chain | is_cmp | is_same)
            def _():

                @pl.when(is_chain & (kind == RELATE))
                def _():
                    stage_relate_acts(t, tok, out_in)
                    hs = head_slot_ref[tok]
                    attn = head_recompute(acts[5], hs)
                    g_a = head_bwd(acts[5], hs, attn, go)
                    for l, dil in ((4, 1), (3, 8), (2, 4), (1, 2), (0, 1)):
                        g_a = conv_layer_bwd(
                            g_a, slot3_ref[tok, l], dil, acts[l], acts[l + 1],
                            GD[dil],
                        )
                    dx_acc[...] = dx_acc[...] + g_a * out_in.astype(f32)
                    g_out[...] = g_a * x.astype(f32)

                @pl.when(is_chain & (kind != RELATE))
                def _():
                    stage_chain2_acts(t, tok, out_in)

                    @pl.when(has_head)
                    def _():
                        hs = head_slot_ref[tok]
                        attn = head_recompute(acts[2], hs)
                        g_a = head_bwd(acts[2], hs, attn, go)
                        for l in (1, 0):
                            g_a = conv_layer_bwd(
                                g_a, slot3_ref[tok, l], 1, acts[l], acts[l + 1], G1
                            )
                        dx_acc[...] = dx_acc[...] + g_a * out_in.astype(f32)
                        g_out[...] = g_a * x.astype(f32)

                    @pl.when(jnp.logical_not(has_head))
                    def _():
                        g_a = go
                        for l in (1, 0):
                            g_a = conv_layer_bwd(
                                g_a, slot3_ref[tok, l], 1, acts[l], acts[l + 1], G1
                            )
                        dx_acc[...] = dx_acc[...] + g_a * out_in.astype(f32)
                        g_out[...] = g_a * x.astype(f32)

                @pl.when(is_cmp)
                def _():
                    cs = cmp_slot_ref[tok]
                    wc = wcmp_ref[cs]
                    saved_in = load_saved_in()
                    stage_cmp_acts(t, tok, out_in, saved_in)
                    g_a = go
                    for l in (1, 0):
                        g_a = conv_layer_bwd(
                            g_a, slot3_ref[tok, l], 1, acts[l], acts[l + 1], G1
                        )
                    g_pre = g_a * (acts[0] > 0.0)
                    colsum = jnp.sum(g_pre, axis=0)
                    dbc_ref[cs] = dbc_ref[cs] + row0_plane(
                        jnp.pad(colsum, (0, 128 - C))
                    )
                    dwc_ref[cs, :C] = dwc_ref[cs, :C] + jax.lax.dot_general(
                        out_in, g_pre.astype(dtype),
                        (((0,), (0,)), ((), ())), preferred_element_type=f32,
                    )
                    dwc_ref[cs, C:] = dwc_ref[cs, C:] + jax.lax.dot_general(
                        saved_in, g_pre.astype(dtype),
                        (((0,), (0,)), ((), ())), preferred_element_type=f32,
                    )
                    g_out[...] = jax.lax.dot_general(
                        g_pre.astype(dtype), wc[:C],
                        (((1,), (1,)), ((), ())), preferred_element_type=f32,
                    )
                    g_saved[...] = gs + jax.lax.dot_general(
                        g_pre.astype(dtype), wc[C:],
                        (((1,), (1,)), ((), ())), preferred_element_type=f32,
                    )

                @pl.when(is_same)
                def _():
                    ss = same_slot_ref[tok]
                    attn_col = out_in[:, :1]
                    am = jnp.argmax(attn_col[:, 0].astype(f32), axis=0)
                    onehot = (
                        jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0)[:, 0] == am
                    ).astype(dtype)
                    vec = jnp.sum(x * onehot[:, None], axis=0, keepdims=True)
                    xsel = x * vec
                    head = jnp.dot(
                        xsel, same_wf_ref[ss], preferred_element_type=f32
                    )
                    head = head + attn_col.astype(f32) * same_wa_ref[ss, 0]
                    head = head + same_b_ref[ss][0:1, :8].astype(f32)
                    attn = jax.nn.sigmoid(head[:, :1])

                    g_attn = jnp.sum(go, axis=1, keepdims=True)
                    g_h0 = g_attn * attn * (1.0 - attn)  # (HW, 1) f32
                    g128 = jnp.where(lanes128 == 0, g_h0, 0.0)
                    dwf_ref[ss] = dwf_ref[ss] + jax.lax.dot_general(
                        xsel, g128.astype(dtype),
                        (((0,), (0,)), ((), ())), preferred_element_type=f32,
                    )
                    dwa_scalar = jnp.sum(attn_col.astype(f32) * g_h0)
                    dwa_ref[ss] = dwa_ref[ss] + jnp.where(
                        (rows8 == 0) & (lanes8_128 == 0), dwa_scalar, 0.0
                    )
                    dsb_ref[ss] = dsb_ref[ss] + row0_plane(jnp.sum(g128, axis=0))
                    g_xsel = jax.lax.dot_general(  # (HW, C)
                        g128[:, :8].astype(dtype), same_wf_ref[ss],
                        (((1,), (1,)), ((), ())), preferred_element_type=f32,
                    )
                    dx_acc[...] = dx_acc[...] + g_xsel * jnp.broadcast_to(
                        vec, (HW, C)
                    ).astype(f32)
                    g_vec = jnp.sum(x.astype(f32) * g_xsel, axis=0, keepdims=True)
                    dx_acc[...] = dx_acc[...] + onehot.astype(f32)[:, None] * g_vec
                    g_attn_col = g_h0 * same_wa_ref[ss, 0]  # (HW, 1)
                    g_out[...] = jnp.where(lanesC == 0, g_attn_col, 0.0)

            return ()

        # Sweep back only to the first non-pad step (the reversed-order pad
        # prefix is a no-op in both directions).
        jax.lax.fori_loop(0, T - start_ref[b], bwd_step, (), unroll=False)

    # initial out register was the stem features themselves
    dx_ref[0] = (dx_acc[...] + g_out[...]).reshape(H, W, C)


def _execute_bwd_pallas(
    banks, tables, stem_feats, programs, invalid, g_final, interpret=False,
    otraj=None, atraj=None,
):
    r"""``otraj``/``atraj`` are the training forward's streamed residuals;
    when given, the kernel runs in no-replay mode (phase 1 reduced to a
    scalar lscene scan, trajectory blocks streamed from HBM per example)."""
    B, H, W, C = stem_feats.shape
    HW = H * W
    T = programs.shape[1]
    tokens_rev = jnp.flip(programs, axis=1).astype(jnp.int32)
    S3 = banks["w3"].shape[0]
    S1 = banks["w1"].shape[0]
    Ss = banks["same_wf"].shape[0]
    Sc = banks["wcmp"].shape[0]
    f32 = jnp.float32
    no_replay = otraj is not None

    traj_in_specs = [
        pl.BlockSpec((1, T, HW, C), lambda b, *_: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, RESID_SLOTS, HW, C),
                     lambda b, *_: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
    ] if no_replay else []
    replay_scratch = [] if no_replay else [
        pltpu.VMEM((HW, C), stem_feats.dtype),            # reg_out
        pltpu.VMEM((HW, C), stem_feats.dtype),            # reg_saved
        pltpu.VMEM((T, HW, C), stem_feats.dtype),         # out_traj
    ]
    acts_traj_scratch = [] if no_replay else [
        pltpu.VMEM((T, MAX_CHAIN + 1, HW, C), stem_feats.dtype),  # acts_traj
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ] + traj_in_specs + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3 bank (VMEM-resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # same_wf
            pl.BlockSpec(memory_space=pltpu.SMEM),  # same_wa
            pl.BlockSpec(memory_space=pltpu.VMEM),  # same_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wcmp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bcmp
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            # dw3: VMEM-resident accumulator (~45 MB f32 at CLEVR scale) with a
            # constant index map — written back to HBM once at kernel end.
            pl.BlockSpec((S3, 9 * C, C), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S3, 8, 128), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S1, C, 128), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S1, 8, 128), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ss, C, 128), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ss, 8, 128), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ss, 8, 128), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Sc, 2 * C, C), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Sc, 8, 128), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=replay_scratch + [
            pltpu.SMEM((T,), jnp.int32),                         # lscene
            pltpu.VMEM((MAX_CHAIN + 1, H * W, C), f32),          # acts
        ] + acts_traj_scratch + [
            pltpu.VMEM((H * W, C), f32),                         # g_out
            pltpu.VMEM((H * W, C), f32),                         # g_saved
            pltpu.VMEM((H * W, C), f32),                         # dx_acc
        ],
    )

    outs = pl.pallas_call(
        partial(_interpreter_bwd_kernel, no_replay=no_replay),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), f32),
            jax.ShapeDtypeStruct((S3, 9 * C, C), f32),
            jax.ShapeDtypeStruct((S3, 8, 128), f32),
            jax.ShapeDtypeStruct((S1, C, 128), f32),
            jax.ShapeDtypeStruct((S1, 8, 128), f32),
            jax.ShapeDtypeStruct((Ss, C, 128), f32),
            jax.ShapeDtypeStruct((Ss, 8, 128), f32),
            jax.ShapeDtypeStruct((Ss, 8, 128), f32),
            jax.ShapeDtypeStruct((Sc, 2 * C, C), f32),
            jax.ShapeDtypeStruct((Sc, 8, 128), f32),
        ],
        interpret=interpret,
    )(
        tokens_rev,
        tables["kind"], tables["slot3"], tables["head_slot"],
        tables["cmp_slot"], tables["same_slot"],
        invalid.astype(jnp.int32),
        jnp.argmax(tokens_rev != 0, axis=1).astype(jnp.int32),
        stem_feats,
        g_final.astype(f32),
        *([otraj, atraj] if no_replay else []),
        banks["w3"], banks["b3"], banks["w1"], banks["b1"],
        banks["same_wf"], banks["same_wa"], banks["same_b"],
        banks["wcmp"], banks["bcmp"],
    )
    dx, dw3, db3, dw1, db1, dwf, dwa, dsb, dwc, dbc = outs
    d_banks = {
        "w3": dw3.astype(banks["w3"].dtype),
        "b3": db3.astype(banks["b3"].dtype),
        "w1": dw1[:, :, :8].astype(banks["w1"].dtype),
        "b1": db1.astype(banks["b1"].dtype),
        "same_wf": dwf[:, :, :8].astype(banks["same_wf"].dtype),
        "same_wa": dwa[:, 0, :1].astype(banks["same_wa"].dtype),
        "same_b": dsb.astype(banks["same_b"].dtype),
        "wcmp": dwc.astype(banks["wcmp"].dtype),
        "bcmp": dbc.astype(banks["bcmp"].dtype),
    }
    return d_banks, dx.astype(stem_feats.dtype)


# ------------------------------------------------------------------ custom VJP --------
@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _execute_diff(interpret, banks, tables, stem_feats, programs):
    return execute_programs_pallas(banks, tables, None, stem_feats, programs,
                                   interpret=interpret)


# Round-4 default: the training forward streams the register/activation
# trajectories to HBM as residuals, so the backward kernel skips its replay
# phase (~one full forward of recompute per backward; the residual reads
# overlap the reverse sweep's compute). PROBNMN_NMN_REPLAY_BWD=1 forces the
# round-3 replay-and-reverse backward (no residual memory; both paths are
# gradient-tested against each other and the XLA machine).
_REPLAY_BWD = os.environ.get("PROBNMN_NMN_REPLAY_BWD", "") == "1"


def _execute_diff_fwd(interpret, banks, tables, stem_feats, programs):
    if _REPLAY_BWD:
        final, invalid = execute_programs_pallas(
            banks, tables, None, stem_feats, programs, interpret=interpret
        )
        otraj = atraj = None
    else:
        final, invalid, otraj, atraj = _execute_train_fwd_pallas(
            banks, tables, stem_feats, programs, interpret=interpret
        )
    return (final, invalid), (banks, tables, stem_feats, programs, invalid,
                              otraj, atraj)


def _execute_diff_bwd(interpret, residuals, cotangents):
    banks, tables, stem_feats, programs, invalid, otraj, atraj = residuals
    g_final, _g_invalid = cotangents  # invalid is boolean: float0 cotangent
    d_banks, d_stem = _execute_bwd_pallas(
        banks, tables, stem_feats, programs, invalid, g_final,
        interpret=interpret, otraj=otraj, atraj=atraj,
    )
    d_tables = jax.tree_util.tree_map(
        lambda v: np.zeros(v.shape, dtype=jax.dtypes.float0), tables
    )
    d_programs = np.zeros(programs.shape, dtype=jax.dtypes.float0)
    return d_banks, d_tables, d_stem, d_programs


_execute_diff.defvjp(_execute_diff_fwd, _execute_diff_bwd)


def execute_programs_pallas_diff(
    banks: Dict[str, jax.Array],
    tables: Dict[str, jax.Array],
    spec: NMNSpec,
    stem_feats: jax.Array,
    programs: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    r"""Differentiable fused interpreter: the same forward kernel as
    :func:`execute_programs_pallas`, with a custom VJP whose backward pass is
    the replay-and-reverse Pallas kernel (``_interpreter_bwd_kernel``) — this
    is what makes module/joint training run at serving-path speed."""
    del spec  # shapes come from the arrays
    return _execute_diff(interpret, banks, tables, stem_feats, programs)


# ===================================================== data-parallel wrappers
def _dp(fn, mesh):
    r"""shard_map the per-example interpreter call over the mesh's ``data``
    axis (banks/tables replicate, stem features and programs shard) — without
    this a >1-chip mesh would fail to partition the module/joint training step
    (the capability the reference gets from ``nn.DataParallel`` wrapping every
    model, reference ``_trainer.py:98-100``). Verified bit-exact vs the
    single-device call in ``tests/test_nmn_pallas.py``."""
    from probnmn_tpu.parallel.mesh import shard_map_dp

    return shard_map_dp(fn, mesh, n_replicated=2, n_batch=2)


def execute_programs_pallas_dp(
    mesh, banks, tables, spec, stem_feats, programs, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    r"""Data-parallel :func:`execute_programs_pallas` (inference/eval path)."""
    fn = lambda b, t, s, pr: execute_programs_pallas(b, t, spec, s, pr,
                                                     interpret=interpret)
    return _dp(fn, mesh)(banks, tables, stem_feats, programs)


def execute_programs_pallas_diff_dp(
    mesh, banks, tables, spec, stem_feats, programs, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    r"""Data-parallel :func:`execute_programs_pallas_diff` (training path).

    The custom VJP applies per shard: each device replays and reverses its own
    examples; cotangents of the replicated banks are psummed across the data
    axis by the shard_map transpose (the backward kernel's bank-gradient
    accumulation stays per-device)."""
    fn = lambda b, t, s, pr: _execute_diff(interpret, b, t, s, pr)
    return _dp(fn, mesh)(banks, tables, stem_feats, programs)
