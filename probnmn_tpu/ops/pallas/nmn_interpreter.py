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
- the large unified 3x3 conv bank stays in HBM; each chain layer's (9C, C)
  weights are DMA'd by slot index into a VMEM double buffer (next layer's DMA
  overlaps the current layer's matmul). All small banks (1x1 heads, compare
  projections, biases) are VMEM-resident and indexed directly;
- a 3x3 conv at STATIC dilation d is an in-VMEM im2col (9 shifted window copies
  from a padded buffer) followed by ONE (196, 1152) x (1152, 128) MXU matmul
  (Mosaic requires constant sublane offsets, so chains are straight-line per
  kind with a static dilation schedule);
- the tag/dispatch machine is pure scalar SMEM math and the scene/and/or
  register updates are unpredicated vector selects — conditional regions are
  expensive on TPU, so ALL module compute sits behind a single outer
  ``@pl.when`` with per-kind straight-line bodies;
- execution aborts at the first invalid operation, exactly like the reference's
  per-example try/except (nmn.py:202-238) — faithful semantics that double as
  ragged efficiency on malformed programs.

Semantics are identical to ``models/nmn.py::execute_programs`` (same tag machine,
same invalid rules); equivalence is tested in interpret mode and on device.
This is the inference path; training uses the differentiable XLA machine.
"""
from __future__ import annotations

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


# ------------------------------------------------------------------ host tables -------
def build_kernel_tables(params: Dict[str, Any], spec: NMNSpec, dtype=jnp.bfloat16):
    r"""Flatten per-class banks into unified kernel banks + per-token chain tables.

    Banks: ``w3`` (S3, 9, C, C) unified 3x3 weights in HBM (kernel-position
    major); all biases as (S, 8, 128) VMEM-resident planes with data in row 0;
    ``w1`` (S1, C, 8) unified 1x1 heads (out-dim padded 1->8) incl. the same-
    module conv with its attention-channel weight split out (``same_wa``).
    """
    C = spec.module_channels
    kind = np.asarray(spec.token_kind)
    bank = np.asarray(spec.token_bank)
    vocab = kind.shape[0]

    w3_list, b3_list = [], []
    w1_list, b1_list = [], []
    same_w_list, same_b_list = [], []

    def push3(w, b):
        w3_list.append(np.asarray(w))
        b3_list.append(np.asarray(b))
        return len(w3_list) - 1

    def push1(w, b):
        w1_list.append(np.asarray(w))
        b1_list.append(np.asarray(b))
        return len(w1_list) - 1

    p = jax.device_get(params)
    att = {s: [push3(p["attention"]["conv1"]["w"][s], p["attention"]["conv1"]["b"][s]),
               push3(p["attention"]["conv2"]["w"][s], p["attention"]["conv2"]["b"][s]),
               push1(p["attention"]["conv3"]["w"][s], p["attention"]["conv3"]["b"][s])]
           for s in range(p["attention"]["conv1"]["w"].shape[0])}
    qry = {s: [push3(p["query"]["conv1"]["w"][s], p["query"]["conv1"]["b"][s]),
               push3(p["query"]["conv2"]["w"][s], p["query"]["conv2"]["b"][s])]
           for s in range(p["query"]["conv1"]["w"].shape[0])}
    rel = {s: [push3(p["relate"][f"conv{i}"]["w"][s], p["relate"][f"conv{i}"]["b"][s])
               for i in range(1, 6)]
           + [push1(p["relate"]["conv6"]["w"][s], p["relate"]["conv6"]["b"][s])]
           for s in range(p["relate"]["conv1"]["w"].shape[0])}
    cmp_ = {s: [push3(p["compare"]["conv1"]["w"][s], p["compare"]["conv1"]["b"][s]),
                push3(p["compare"]["conv2"]["w"][s], p["compare"]["conv2"]["b"][s])]
            for s in range(p["compare"]["conv1"]["w"].shape[0])}
    for s in range(p["same"]["conv"]["w"].shape[0]):
        same_w_list.append(np.asarray(p["same"]["conv"]["w"][s]))  # (C+1, 1)
        same_b_list.append(np.asarray(p["same"]["conv"]["b"][s]))

    chain_len = np.zeros(vocab, np.int32)
    slot3 = np.zeros((vocab, MAX_CHAIN), np.int32)
    head_slot = np.full(vocab, -1, np.int32)
    cmp_slot = np.zeros(vocab, np.int32)
    same_slot = np.zeros(vocab, np.int32)
    for t in range(vocab):
        k, s = int(kind[t]), int(bank[t])
        if k == ATTENTION:
            chain_len[t] = 2
            slot3[t, :2] = att[s][:2]
            head_slot[t] = att[s][2]
        elif k == QUERY:
            chain_len[t] = 2
            slot3[t, :2] = qry[s]
        elif k == RELATE:
            chain_len[t] = 5
            slot3[t, :5] = rel[s][:5]
            head_slot[t] = rel[s][5]
        elif k == COMPARE:
            chain_len[t] = 2
            slot3[t, :2] = cmp_[s]
            cmp_slot[t] = s
        elif k == SAME:
            same_slot[t] = s

    def bias_plane(bias_rows, width):
        r"""(S, width) biases -> (S, 8, 128) VMEM plane with data in row 0."""
        n = max(len(bias_rows), 1)
        plane = np.zeros((n, 8, 128), np.float32)
        for i, row in enumerate(bias_rows):
            plane[i, 0, : len(row)] = row
        return plane

    # (S, 9*C, C): row k*C + c_in multiplies patch column k*C + c_in (k-major
    # im2col layout, one big MXU matmul per conv instead of 9 small ones).
    w3 = np.stack([w.reshape(9 * C, C) for w in w3_list]) \
        if w3_list else np.zeros((1, 9 * C, C), np.float32)
    w1 = np.stack([np.pad(w, ((0, 0), (0, 7))) for w in w1_list]) \
        if w1_list else np.zeros((1, C, 8), np.float32)
    same_wf = np.stack([np.pad(w[:C], ((0, 0), (0, 7))) for w in same_w_list]) \
        if same_w_list else np.zeros((1, C, 8), np.float32)
    same_wa = np.stack([w[C] for w in same_w_list]) \
        if same_w_list else np.zeros((1, 1), np.float32)
    wcmp = np.asarray(p["compare"]["projection"]["w"])  # (Scmp, 2C, C)

    banks = {
        "w3": jnp.asarray(w3, dtype),
        "b3": jnp.asarray(bias_plane(b3_list, C), dtype),
        "w1": jnp.asarray(w1, dtype),
        "b1": jnp.asarray(bias_plane([np.pad(b, (0, 7)) for b in b1_list], 8), dtype),
        "same_wf": jnp.asarray(same_wf, dtype),
        "same_wa": jnp.asarray(same_wa, jnp.float32),  # SMEM scalars
        "same_b": jnp.asarray(
            bias_plane([np.pad(b, (0, 7)) for b in same_b_list], 8), dtype
        ),
        "wcmp": jnp.asarray(wcmp, dtype),
        "bcmp": jnp.asarray(bias_plane(list(p["compare"]["projection"]["b"]), C), dtype),
    }
    tables = {
        "kind": jnp.asarray(kind, jnp.int32),
        "chain_len": jnp.asarray(chain_len, jnp.int32),
        "slot3": jnp.asarray(slot3, jnp.int32),
        "head_slot": jnp.asarray(head_slot, jnp.int32),
        "cmp_slot": jnp.asarray(cmp_slot, jnp.int32),
        "same_slot": jnp.asarray(same_slot, jnp.int32),
    }
    return banks, tables


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
    # tensor inputs
    x_ref,           # (1, H, W, C) stem features block (VMEM)
    w3_ref,          # (S3, 9C, C) HBM — DMA'd per layer (im2col rows)
    b3_ref,          # (S3, 8, 128) VMEM bias planes (row 0)
    w1_ref,          # (S1, C, 8) VMEM
    b1_ref,          # (S1, 8, 128) VMEM
    same_wf_ref,     # (Ss, C, 8) VMEM
    same_wa_ref,     # (Ss, 1) SMEM (f32 scalars)
    same_b_ref,      # (Ss, 8, 128) VMEM
    wcmp_ref,        # (Sc, 2C, C) VMEM
    bcmp_ref,        # (Sc, 8, 128) VMEM
    # outputs
    out_ref,         # (1, H, W, C) final encoding (VMEM)
    invalid_ref,     # (1, 8, 128) int32 (VMEM; tile-aligned flag plane)
    # scratch
    out_reg,         # (H*W, C) VMEM
    saved_reg,       # (H*W, C) VMEM
    acc,             # (H*W, C) f32 VMEM accumulator
    pad_buf,         # (H + 16, W + 16, C) VMEM padded input for shifted matmuls
    w3_buf,          # (2, 9C, C) VMEM weight double buffer
    patches,         # (H*W, 9C) VMEM im2col buffer
    tag_ref,         # (4,) SMEM: out_tag, saved_tag, invalid
    sems,            # DMA semaphores (2,)
):
    b = pl.program_id(0)
    T = tokens_ref.shape[1]
    H, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    HW = H * W
    dtype = x_ref.dtype

    x = x_ref[0].reshape(HW, C)

    # init registers: out = stem features (FEAT), saved empty. The pad frame of
    # pad_buf is zeroed once; convs only overwrite the interior.
    out_reg[...] = x
    saved_reg[...] = jnp.zeros_like(saved_reg)
    pad_buf[...] = jnp.zeros_like(pad_buf)
    tag_ref[0] = TAG_FEAT
    tag_ref[1] = TAG_NONE
    tag_ref[2] = 0  # invalid

    def start_w3(slot, buf):
        pltpu.make_async_copy(w3_ref.at[slot], w3_buf.at[buf], sems.at[buf]).start()

    def wait_w3(slot, buf):
        pltpu.make_async_copy(w3_ref.at[slot], w3_buf.at[buf], sems.at[buf]).wait()

    def conv3x3_from_buf(inp, buf, bias_slot, dilation: int):
        r"""In-VMEM im2col (9 shifted window copies) + ONE (HW, 9C) x (9C, C)
        MXU matmul; STATIC dilation (Mosaic constant-offset requirement)."""
        d = dilation
        pad_buf[8:8 + H, 8:8 + W, :] = inp.reshape(H, W, C)
        for ky in range(3):
            for kx in range(3):
                oy = 8 + (ky - 1) * d
                ox = 8 + (kx - 1) * d
                k = ky * 3 + kx
                patches[:, k * C:(k + 1) * C] = (
                    pad_buf[oy:oy + H, ox:ox + W, :].reshape(HW, C)
                )
        total = jnp.dot(
            patches[...], w3_buf[buf], preferred_element_type=jnp.float32
        )
        bias = b3_ref[bias_slot][0:1, :C].astype(jnp.float32)  # (1, C)
        return total + bias

    def run_token(t, _):
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

        # ------- cheap register ops: unpredicated vector selects (VPU ~free) --
        old_out = out_reg[...]
        old_saved = saved_reg[...]
        minmax = jnp.where(
            kind == AND, jnp.minimum(old_out, old_saved),
            jnp.maximum(old_out, old_saved),
        )
        out_reg[...] = jnp.where(
            scene_ok, jnp.ones_like(old_out), jnp.where(binop_ok, minmax, old_out)
        )
        saved_reg[...] = jnp.where(scene_ok, old_out, old_saved)

        # ------- heavy module work: ONE outer conditional region --------------
        @pl.when(do_chain | do_cmp | do_same)
        def _():

            @pl.when(do_chain & (kind == RELATE))
            def _():
                # straight-line 5-layer dilated chain + sigmoid head
                start_w3(slot3_ref[tok, 0], 0)
                acc[...] = (x * out_reg[...]).astype(jnp.float32)
                for l, dil in enumerate((1, 2, 4, 8, 1)):
                    cur, nxt = l % 2, (l + 1) % 2
                    if l + 1 < 5:
                        start_w3(slot3_ref[tok, l + 1], nxt)
                    wait_w3(slot3_ref[tok, l], cur)
                    result = conv3x3_from_buf(
                        acc[...].astype(dtype), cur, slot3_ref[tok, l], dil
                    )
                    acc[...] = jnp.maximum(result, 0.0)
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
                start_w3(slot3_ref[tok, 0], 0)
                acc[...] = (x * out_reg[...]).astype(jnp.float32)
                for l in range(2):
                    cur, nxt = l % 2, (l + 1) % 2
                    if l + 1 < 2:
                        start_w3(slot3_ref[tok, l + 1], nxt)
                    wait_w3(slot3_ref[tok, l], cur)
                    result = conv3x3_from_buf(
                        acc[...].astype(dtype), cur, slot3_ref[tok, l], 1
                    )
                    acc[...] = jnp.maximum(result, 0.0)

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
                start_w3(slot3_ref[tok, 0], 0)
                wc = wcmp_ref[cs]  # (2C, C)
                proj = (
                    jnp.dot(out_reg[...], wc[:C], preferred_element_type=jnp.float32)
                    + jnp.dot(saved_reg[...], wc[C:], preferred_element_type=jnp.float32)
                    + bcmp_ref[cs][0:1, :C].astype(jnp.float32)
                )
                acc[...] = jnp.maximum(proj, 0.0)
                for l in range(2):
                    cur, nxt = l % 2, (l + 1) % 2
                    if l + 1 < 2:
                        start_w3(slot3_ref[tok, l + 1], nxt)
                    wait_w3(slot3_ref[tok, l], cur)
                    result = conv3x3_from_buf(
                        acc[...].astype(dtype), cur, slot3_ref[tok, l], 1
                    )
                    acc[...] = jnp.maximum(result, 0.0)
                out_reg[...] = acc[...].astype(dtype)

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

    jax.lax.fori_loop(0, T, run_token, (), unroll=False)

    invalid = tag_ref[2] | jnp.where(tag_ref[0] != TAG_FEAT, 1, 0)
    invalid_ref[0] = jnp.full((8, 128), invalid, jnp.int32)
    out_ref[0] = jnp.where(
        invalid == 1, jnp.zeros_like(out_reg), out_reg[...]
    ).reshape(H, W, C)


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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # w3 (large; stays in HBM)
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
            pl.BlockSpec((1, H, W, C), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((H * W, C), stem_feats.dtype),            # out_reg
            pltpu.VMEM((H * W, C), stem_feats.dtype),            # saved_reg
            pltpu.VMEM((H * W, C), jnp.float32),                 # acc
            pltpu.VMEM((H + 16, W + 16, C), stem_feats.dtype),   # pad_buf
            pltpu.VMEM((2, 9 * C, C), banks["w3"].dtype),        # w3 double buffer
            pltpu.VMEM((H * W, 9 * C), stem_feats.dtype),        # im2col patches
            pltpu.SMEM((4,), jnp.int32),                         # tags
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out, invalid = pl.pallas_call(
        _interpreter_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), stem_feats.dtype),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        tokens_rev,
        tables["kind"], tables["chain_len"], tables["slot3"],
        tables["head_slot"], tables["cmp_slot"], tables["same_slot"],
        stem_feats,
        banks["w3"], banks["b3"], banks["w1"], banks["b1"],
        banks["same_wf"], banks["same_wa"], banks["same_b"],
        banks["wcmp"], banks["bcmp"],
    )
    return out, invalid[:, 0, 0].astype(bool)
