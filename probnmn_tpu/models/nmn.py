r"""
NeuralModuleNetwork: TbD-style module network executing CLEVR programs over image
features — redesigned as a *batched, on-device register machine* instead of the
reference's per-example Python interpreter (reference ``probnmn/models/nmn.py``).

Reference semantics reproduced exactly (``nmn.py:139-275``):

- tokens execute in **reversed** program order with a single-slot register scheme:
  ``output`` starts as the stem features, ``saved_output`` starts empty; ``scene``
  saves ``output`` and resets it to an all-ones attention; binary tokens
  (intersect/union/equal*/less_than/greater_than) consume ``(output, saved_output)``;
  other module tokens consume ``(stem_features, output)``;
- pad/@start@/@end@/unk/``unique`` are no-ops;
- *invalid programs*: any combination that would raise in torch (binary op with an
  empty save slot, a unary module applied to a 128-channel "attention", a comparison
  over non-feature operands) or a final output that is an attention instead of an
  encoding ⇒ zeroed classifier input, prediction forced to @@UNKNOWN@@, loss clamped
  to 3.33 ≈ ln 28 (``nmn.py:194-196``, ``231-238``, ``249-269``);
- loss: per-example CE with answers, else negative max answer log-prob.

TPU-native design: every module class's parameters live in stacked banks (one slot
per program-vocab token of that class, mirroring the reference's one-module-per-token
``add_module`` loop at ``nmn.py:114-115``). A single ``lax.scan`` steps the whole
batch through the program; each step gathers per-example weights by token id and
runs all module classes as im2col batched matmuls (MXU), selecting per example by
token kind. Attentions are stored broadcast across all 128 channels so torch's
NCHW broadcasting semantics (min/max/mul of (1,1,H,W) against (1,C,H,W)) hold
bit-for-bit; a per-register *tag* (ATTN/FEAT/NONE) tracks what torch's dynamic
shapes would have been and drives the invalid-program rules above.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.ops import gconv

# Module kinds (static dispatch table indices).
NOP, SCENE, AND, OR, ATTENTION, QUERY, RELATE, SAME, COMPARE = range(9)
_KIND_NAMES = [
    "nop", "scene", "and", "or", "attention", "query", "relate", "same", "compare",
]

# Register tags: what torch's dynamic channel count would have been.
TAG_NONE, TAG_ATTN, TAG_FEAT = 0, 1, 2

INVALID_LOSS = 3.33  # ≈ ln(28), reference nmn.py:194-196

_NOOP_TOKENS = {"@@PADDING@@", "@start@", "@end@", "@@UNKNOWN@@", "unique"}


def classify_token(token: str) -> int:
    r"""Program-vocab token -> module kind (reference ``nmn.py:90-111``, ``219-229``)."""
    if token in _NOOP_TOKENS:
        return NOP
    if token == "scene":
        return SCENE
    if token == "intersect":
        return AND
    if token == "union":
        return OR
    if "equal" in token or token in {"less_than", "greater_than"}:
        return COMPARE
    if "query" in token or token in {"exist", "count"}:
        return QUERY
    if "relate" in token:
        return RELATE
    if "same" in token:
        return SAME
    return ATTENTION


@dataclass
class NMNSpec:
    r"""Static dispatch tables + architecture sizes (built once from the vocabulary)."""
    token_kind: np.ndarray          # (program_vocab,) int32 module kind per token
    token_bank: np.ndarray          # (program_vocab,) int32 slot in that kind's bank
    bank_sizes: Dict[str, int]      # kind name -> number of bank slots
    num_answers: int = 28
    unk_answer_index: int = 28
    feature_channels: int = 1024
    height: int = 14
    width: int = 14
    module_channels: int = 128
    class_projection_channels: int = 1024
    classifier_linear_size: int = 1024
    # Compute dtype for the conv/matmul path ("float32" or "bfloat16"). MXU
    # multiplies are bf16 with f32 accumulation either way; bf16 halves HBM
    # traffic and runs the systolic array at full rate. Answer logits are always
    # produced in f32.
    compute_dtype: str = "float32"


def make_spec(vocabulary: Vocabulary, config=None) -> NMNSpec:
    tokens = vocabulary.get_index_to_token_vocabulary("programs")
    vocab_size = len(tokens)
    kind = np.zeros(vocab_size, np.int32)
    bank = np.zeros(vocab_size, np.int32)
    counters = {name: 0 for name in _KIND_NAMES}
    for index in range(vocab_size):
        k = classify_token(tokens[index])
        kind[index] = k
        name = _KIND_NAMES[k]
        if k in (ATTENTION, QUERY, RELATE, SAME, COMPARE):
            bank[index] = counters[name]
            counters[name] += 1
    bank_sizes = {n: max(counters[n], 1) for n in ("attention", "query", "relate", "same", "compare")}

    num_answers = vocabulary.get_vocab_size("answers") - 1  # exclude @@UNKNOWN@@
    kwargs: Dict[str, Any] = {}
    if config is not None:
        c = config.NMN
        kwargs = dict(
            feature_channels=c.IMAGE_FEATURE_SIZE[0],
            height=c.IMAGE_FEATURE_SIZE[1],
            width=c.IMAGE_FEATURE_SIZE[2],
            module_channels=c.MODULE_CHANNELS,
            class_projection_channels=c.CLASS_PROJECTION_CHANNELS,
            classifier_linear_size=c.CLASSIFIER_LINEAR_SIZE,
        )
        dtype = getattr(c, "COMPUTE_DTYPE", "auto")
        if dtype == "auto":
            # bf16 on TPU generations that run the fused Pallas interpreter
            # (its VMEM-resident banks and MXU rate are sized for bf16;
            # accumulation stays f32); f32 elsewhere — CPU parity tests and
            # small-VMEM TPUs keep the reference's torch numerics.
            from probnmn_tpu.ops.common import tpu_fused_kernels_supported

            dtype = "bfloat16" if tpu_fused_kernels_supported() else "float32"
        kwargs["compute_dtype"] = dtype
    return NMNSpec(
        token_kind=kind,
        token_bank=bank,
        bank_sizes=bank_sizes,
        num_answers=num_answers,
        unk_answer_index=vocabulary.get_token_index("@@UNKNOWN@@", "answers"),
        **kwargs,
    )


# ------------------------------------------------------------------ init --------------
def _torch_conv_default(key, shape_w, fan_in, c_out):
    r"""torch Conv2d default init: kaiming_uniform(a=√5) ⇒ U(±1/√fan_in) for both."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / fan_in ** 0.5
    w = jax.random.uniform(kw, shape_w, minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (c_out,), minval=-bound, maxval=bound)
    return w, b


def _bank(key, n, ksize, c_in, c_out, kaiming=True):
    r"""Conv bank; reference modules kaiming-init weights (biases keep torch default),
    except ComparisonModule's projection which keeps torch default entirely."""
    params = gconv.init_conv_bank(key, n, ksize, c_in, c_out)
    if not kaiming:
        shape = (n, c_in, c_out) if ksize == 1 else (n, ksize, ksize, c_in, c_out)
        bound = 1.0 / (c_in * ksize * ksize) ** 0.5
        params["w"] = jax.random.uniform(
            jax.random.split(key)[0], shape, minval=-bound, maxval=bound
        )
    return params


def init_nmn_params(key: jax.Array, spec: NMNSpec) -> Dict[str, Any]:
    C = spec.module_channels
    keys = iter(jax.random.split(key, 32))

    stem_w1, stem_b1 = _torch_conv_default(
        next(keys), (3, 3, spec.feature_channels, C), spec.feature_channels * 9, C
    )
    stem_w2, stem_b2 = _torch_conv_default(next(keys), (3, 3, C, C), C * 9, C)

    P = spec.class_projection_channels
    cls_w, cls_b = _torch_conv_default(next(keys), (C, P), C, P)  # 1x1 as matmul
    flat = P * (spec.height // 2) * (spec.width // 2)
    lin1_bound = 1.0 / flat ** 0.5
    k1, k2, k3, k4 = jax.random.split(next(keys), 4)
    lin1_w = jax.random.uniform(k1, (spec.classifier_linear_size, flat), minval=-lin1_bound, maxval=lin1_bound)
    lin1_b = jax.random.uniform(k2, (spec.classifier_linear_size,), minval=-lin1_bound, maxval=lin1_bound)
    lin2_bound = 1.0 / spec.classifier_linear_size ** 0.5
    lin2_w = jax.random.uniform(k3, (spec.num_answers, spec.classifier_linear_size), minval=-lin2_bound, maxval=lin2_bound)
    lin2_b = jax.random.uniform(k4, (spec.num_answers,), minval=-lin2_bound, maxval=lin2_bound)

    nb = spec.bank_sizes
    return {
        "stem": {"w1": stem_w1, "b1": stem_b1, "w2": stem_w2, "b2": stem_b2},
        "classifier": {
            "proj_w": cls_w, "proj_b": cls_b,
            "lin1": {"w": lin1_w, "b": lin1_b},
            "lin2": {"w": lin2_w, "b": lin2_b},
        },
        "attention": {
            "conv1": _bank(next(keys), nb["attention"], 3, C, C),
            "conv2": _bank(next(keys), nb["attention"], 3, C, C),
            "conv3": _bank(next(keys), nb["attention"], 1, C, 1),
        },
        "query": {
            "conv1": _bank(next(keys), nb["query"], 3, C, C),
            "conv2": _bank(next(keys), nb["query"], 3, C, C),
        },
        "relate": {
            f"conv{i}": _bank(next(keys), nb["relate"], 3, C, C) for i in range(1, 6)
        } | {"conv6": _bank(next(keys), nb["relate"], 1, C, 1)},
        "same": {"conv": _bank(next(keys), nb["same"], 1, C + 1, 1)},
        "compare": {
            "projection": _bank(next(keys), nb["compare"], 1, 2 * C, C, kaiming=False),
            "conv1": _bank(next(keys), nb["compare"], 3, C, C),
            "conv2": _bank(next(keys), nb["compare"], 3, C, C),
        },
    }


# ------------------------------------------------------------------ module chains -----
def _bcast(attn: jax.Array, channels: int) -> jax.Array:
    r"""Store a 1-channel attention broadcast over all module channels (torch NCHW
    broadcasting equivalence)."""
    return jnp.broadcast_to(attn, attn.shape[:-1] + (channels,))


def _same_chain(params, feats, attn_full, idx, channels):
    r"""Argmax-location feature gather + cross-correlation (reference
    ``nmn_modules.py:200-208``; per-example batch=1 there, so the argmax is the
    example's own)."""
    batch, h, w, c = feats.shape
    attn = attn_full[..., :1]  # channel 0 holds the broadcast attention
    flat = attn.reshape(batch, h * w)
    am = jnp.argmax(flat, axis=-1)  # first max, like torch max_pool2d indices
    onehot = jax.nn.one_hot(am, h * w, dtype=feats.dtype)
    vec = jnp.einsum("bp,bpc->bc", onehot, feats.reshape(batch, h * w, c))
    x = feats * vec[:, None, None, :]
    x = jnp.concatenate([x, attn], axis=-1)  # (B, H, W, C+1)
    out = jax.nn.sigmoid(gconv.gathered_conv1x1(x, params["conv"], idx))
    return _bcast(out, channels)


def apply_stem(params: Dict[str, Any], features: jax.Array) -> jax.Array:
    out = jax.nn.relu(gconv.conv3x3(features, params["w1"], params["b1"]))
    return jax.nn.relu(gconv.conv3x3(out, params["w2"], params["b2"]))


def apply_classifier(params: Dict[str, Any], x: jax.Array) -> jax.Array:
    out = jax.nn.relu(gconv.conv1x1(x, params["proj_w"], params["proj_b"]))
    out = gconv.max_pool_2x2(out)
    out = out.reshape(out.shape[0], -1)  # NHWC flatten (interop permutes torch weights)
    out = jax.nn.relu(out @ params["lin1"]["w"].T + params["lin1"]["b"])
    return out @ params["lin2"]["w"].T + params["lin2"]["b"]


# ------------------------------------------------------------------ interpreter -------
def _unified_chain_tables(spec: NMNSpec):
    r"""Canonical unified-3x3-bank layout + per-token chain tables.

    Bank slot order: [att.conv1 | att.conv2 | query.conv1 | query.conv2 |
    relate.conv1..conv5 | compare.conv1 | compare.conv2], each block sized by its
    class's bank. ``slot3[t, l]`` gives the unified slot for token t's l-th chain
    layer; ``head[t]`` indexes the unified 1x1 head bank
    [att.conv3 | relate.conv6] (-1 = no head).
    """
    nb = spec.bank_sizes
    n_att, n_q, n_r, n_c = nb["attention"], nb["query"], nb["relate"], nb["compare"]
    offsets = {
        "att1": 0, "att2": n_att,
        "q1": 2 * n_att, "q2": 2 * n_att + n_q,
        "r1": 2 * n_att + 2 * n_q,
    }
    for i in range(2, 6):
        offsets[f"r{i}"] = offsets["r1"] + (i - 1) * n_r
    offsets["c1"] = offsets["r1"] + 5 * n_r
    offsets["c2"] = offsets["c1"] + n_c

    vocab = spec.token_kind.shape[0]
    slot3 = np.zeros((vocab, 5), np.int32)
    head = np.full(vocab, -1, np.int32)
    for t in range(vocab):
        k, s = int(spec.token_kind[t]), int(spec.token_bank[t])
        if k == ATTENTION:
            slot3[t, :2] = (offsets["att1"] + s, offsets["att2"] + s)
            head[t] = s
        elif k == QUERY:
            slot3[t, :2] = (offsets["q1"] + s, offsets["q2"] + s)
        elif k == RELATE:
            slot3[t, :5] = [offsets[f"r{i}"] + s for i in range(1, 6)]
            head[t] = n_att + s
        elif k == COMPARE:
            slot3[t, :2] = (offsets["c1"] + s, offsets["c2"] + s)
    return slot3, head


def _build_unified_banks(params: Dict[str, Any]):
    r"""Stack class banks into the canonical unified layout (differentiable —
    gradients scatter back into the per-class banks through the concatenate)."""
    w3 = jnp.concatenate([
        params["attention"]["conv1"]["w"], params["attention"]["conv2"]["w"],
        params["query"]["conv1"]["w"], params["query"]["conv2"]["w"],
        *[params["relate"][f"conv{i}"]["w"] for i in range(1, 6)],
        params["compare"]["conv1"]["w"], params["compare"]["conv2"]["w"],
    ])
    b3 = jnp.concatenate([
        params["attention"]["conv1"]["b"], params["attention"]["conv2"]["b"],
        params["query"]["conv1"]["b"], params["query"]["conv2"]["b"],
        *[params["relate"][f"conv{i}"]["b"] for i in range(1, 6)],
        params["compare"]["conv1"]["b"], params["compare"]["conv2"]["b"],
    ])
    w1 = jnp.concatenate(
        [params["attention"]["conv3"]["w"], params["relate"]["conv6"]["w"]]
    )
    b1 = jnp.concatenate(
        [params["attention"]["conv3"]["b"], params["relate"]["conv6"]["b"]]
    )
    return {"w3": w3, "b3": b3, "w1": w1, "b1": b1}


def execute_programs(
    params: Dict[str, Any], spec: NMNSpec, stem_feats: jax.Array, programs: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    r"""Run the register machine. Returns (final encodings (B,H,W,C), invalid (B,))."""
    batch, h, w, c = stem_feats.shape
    kind_table = jnp.asarray(spec.token_kind)
    bank_table = jnp.asarray(spec.token_bank)
    slot3_np, head_np = _unified_chain_tables(spec)
    slot3_table = jnp.asarray(slot3_np)
    head_table = jnp.asarray(head_np)
    unified = _build_unified_banks(params)

    # Reversed prefix order (reference nmn.py:203): last token executes first.
    tokens_rev = jnp.flip(programs, axis=1).T  # (T, B)

    init = (
        stem_feats,                                   # out register
        jnp.zeros_like(stem_feats),                   # saved register
        jnp.full((batch,), TAG_FEAT, jnp.int32),      # out tag (starts as features)
        jnp.full((batch,), TAG_NONE, jnp.int32),      # saved tag (starts empty)
        jnp.zeros((batch,), bool),                    # invalid flag
    )

    def step(carry, tok):
        out, saved, out_tag, saved_tag, invalid = carry
        kind = kind_table[tok]
        bank = bank_table[tok]
        slots = slot3_table[tok]            # (B, 5) unified 3x3 slots
        head_slot = head_table[tok]         # (B,) unified head slot (-1 = none)

        att_in = stem_feats * out  # unary-module input (exact under broadcast storage)
        ones_attn = jnp.ones((batch, h, w, c), stem_feats.dtype)
        is_relate = (kind == RELATE)[:, None, None, None]
        is_cmp = (kind == COMPARE)[:, None, None, None]

        # --- unified conv chain: one gathered conv serves every module class ---
        # (the per-class chains share 3x3/128ch structure; relate adds layers
        # 2-4 and its own dilation schedule — computed once, selected by kind,
        # ~2x fewer gathered convs than evaluating every class separately)
        cmp_in = jax.nn.relu(
            gconv.gathered_conv1x1(
                jnp.concatenate([out, saved], axis=-1),
                params["compare"]["projection"], bank,
            )
        )
        x0 = jnp.where(is_cmp, cmp_in, att_in)
        l0 = jax.nn.relu(gconv.gathered_conv3x3(x0, {"w": unified["w3"], "b": unified["b3"]}, slots[:, 0]))
        l1_d1 = jax.nn.relu(gconv.gathered_conv3x3(l0, {"w": unified["w3"], "b": unified["b3"]}, slots[:, 1], dilation=1))
        l1_d2 = jax.nn.relu(gconv.gathered_conv3x3(l0, {"w": unified["w3"], "b": unified["b3"]}, slots[:, 1], dilation=2))
        l1 = jnp.where(is_relate, l1_d2, l1_d1)
        l2 = jax.nn.relu(gconv.gathered_conv3x3(l1, {"w": unified["w3"], "b": unified["b3"]}, slots[:, 2], dilation=4))
        l3 = jax.nn.relu(gconv.gathered_conv3x3(l2, {"w": unified["w3"], "b": unified["b3"]}, slots[:, 3], dilation=8))
        l4 = jax.nn.relu(gconv.gathered_conv3x3(l3, {"w": unified["w3"], "b": unified["b3"]}, slots[:, 4], dilation=1))
        head_in = jnp.where(is_relate, l4, l1)
        head_attn = jax.nn.sigmoid(
            gconv.gathered_conv1x1(
                head_in, {"w": unified["w1"], "b": unified["b1"]},
                jnp.maximum(head_slot, 0),
            )
        )
        attn_out = _bcast(head_attn, c)     # ATTENTION / RELATE result
        feat_out = l1                       # QUERY / COMPARE result

        candidates = [
            out,                                                    # NOP
            ones_attn,                                              # SCENE -> fresh attention
            jnp.minimum(out, saved),                                # AND
            jnp.maximum(out, saved),                                # OR
            attn_out,                                               # ATTENTION
            feat_out,                                               # QUERY
            attn_out,                                               # RELATE
            _same_chain(params["same"], stem_feats, out, bank, c),  # SAME
            feat_out,                                               # COMPARE
        ]
        kind_b = kind[:, None, None, None]
        new_out = candidates[0]
        for k in range(1, 9):
            new_out = jnp.where(kind_b == k, candidates[k], new_out)

        # scene: save current output before resetting.
        is_scene = kind == SCENE
        new_saved = jnp.where(is_scene[:, None, None, None], out, saved)
        new_saved_tag = jnp.where(is_scene, out_tag, saved_tag)

        # Output tags per kind (what torch's channel count would be).
        binop_tag = jnp.where(
            (out_tag == TAG_ATTN) & (saved_tag == TAG_ATTN), TAG_ATTN, TAG_FEAT
        )
        tag_candidates = jnp.stack(
            [
                out_tag,                                        # NOP
                jnp.full_like(out_tag, TAG_ATTN),               # SCENE
                binop_tag,                                      # AND (broadcast result)
                binop_tag,                                      # OR
                jnp.full_like(out_tag, TAG_ATTN),               # ATTENTION
                jnp.full_like(out_tag, TAG_FEAT),               # QUERY
                jnp.full_like(out_tag, TAG_ATTN),               # RELATE
                jnp.full_like(out_tag, TAG_ATTN),               # SAME
                jnp.full_like(out_tag, TAG_FEAT),               # COMPARE
            ],
            axis=0,
        )
        new_out_tag = jnp.take_along_axis(tag_candidates, kind[None, :], axis=0)[0]

        # Invalid-program rules == "what raises in torch" (see module docstring).
        is_binary = (kind == AND) | (kind == OR) | (kind == COMPARE)
        is_unary_module = (kind >= ATTENTION) & (kind <= SAME)
        new_invalid = invalid
        new_invalid |= is_binary & (saved_tag == TAG_NONE)
        new_invalid |= (kind == COMPARE) & (
            (out_tag != TAG_FEAT) | (saved_tag != TAG_FEAT)
        )
        new_invalid |= is_unary_module & (out_tag != TAG_ATTN)

        return (new_out, new_saved, new_out_tag, new_saved_tag, new_invalid), None

    # Rematerialize each interpreter step in the backward pass: without this,
    # autodiff stashes the im2col patches and gathered per-example weights of
    # every step (~19 GB at batch 128 x 26 steps — over HBM capacity). With
    # remat the residuals are just the register carries; the step's convs are
    # recomputed during the backward scan.
    step = jax.checkpoint(step, prevent_cse=False)
    (out, _, out_tag, _, invalid), _ = jax.lax.scan(step, init, tokens_rev)
    # Program must end in an "encoding", not an "attention" (reference nmn.py:231-232).
    invalid |= out_tag != TAG_FEAT
    final = jnp.where(invalid[:, None, None, None], 0.0, out)
    return final, invalid


def _outputs_from_logits(
    logits: jax.Array,
    invalid: jax.Array,
    spec: NMNSpec,
    answers: Optional[jax.Array],
) -> Dict[str, jax.Array]:
    r"""Shared output contract (reference ``nmn.py:244-275``): invalid programs
    predict @@UNKNOWN@@ at loss 3.33; valid ones get per-example CE with answers,
    else the negative max answer log-prob."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    pred_logprob = jnp.max(logprobs, axis=-1)
    predictions = jnp.argmax(logprobs, axis=-1)
    predictions = jnp.where(invalid, spec.unk_answer_index, predictions)
    if answers is not None:
        ce = -jnp.take_along_axis(logprobs, answers[:, None], axis=-1)[:, 0]
        loss = jnp.where(invalid, INVALID_LOSS, ce)
        accuracy = (predictions == answers).mean()
    else:
        loss = jnp.where(invalid, INVALID_LOSS, -pred_logprob)
        accuracy = jnp.zeros(())
    return {
        "predictions": predictions,
        "loss": loss,
        "answer_logits": logits,
        "invalid": invalid,
        "metrics": {
            "answer_accuracy": accuracy,
            "average_invalid": invalid.sum(),
        },
    }


def nmn_forward(
    params: Dict[str, Any],
    spec: NMNSpec,
    features: jax.Array,
    programs: jax.Array,
    answers: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    r"""Full forward. features: (B, H, W, feature_channels) NHWC; programs: (B, T).

    Returns {"predictions": (B,), "loss": (B,), "answer_logits", "invalid",
    "metrics": {answer_accuracy (batch mean; 0 w/o answers), average_invalid (count)}}.
    """
    dtype = jnp.dtype(spec.compute_dtype)
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
        features = features.astype(dtype)
    stem_feats = apply_stem(params["stem"], features)
    final, invalid = execute_programs(params, spec, stem_feats, programs)
    logits = apply_classifier(params["classifier"], final).astype(jnp.float32)
    return _outputs_from_logits(logits, invalid, spec, answers)


def fast_training_available(spec: NMNSpec) -> bool:
    r"""The fused Pallas interpreter (forward + custom-VJP backward) needs a
    large-VMEM TPU generation (v4+ — the unified weight bank and the backward's
    grad banks are VMEM-resident; see ``ops.common.tpu_fused_kernels_supported``)
    and lane-aligned module channels (Mosaic tiling)."""
    from probnmn_tpu.ops.common import tpu_fused_kernels_supported

    return tpu_fused_kernels_supported() and spec.module_channels % 128 == 0


def nmn_forward_fast(
    params: Dict[str, Any],
    spec: NMNSpec,
    features: jax.Array,
    programs: jax.Array,
    answers: Optional[jax.Array] = None,
    interpret: bool = False,
    mesh=None,
) -> Dict[str, jax.Array]:
    r"""Same contract as :func:`nmn_forward`, but the program interpreter is the
    fused Pallas kernel with a residual-trajectory backward kernel (the
    training forward streams each example's register/activation trajectory to
    HBM so the backward skips its replay; ``PROBNMN_NMN_REPLAY_BWD=1`` selects
    the replay-and-reverse variant) — fully differentiable wrt ``params``
    (cotangents scatter back through the traced bank stacking) and
    ``features``. This is the production TRAINING path on
    TPU; gradients match :func:`nmn_forward` (tested in interpret mode against
    the XLA machine, which is itself validated against the torch fixture).

    With ``mesh`` the interpreter runs per-device on its batch shard via
    shard_map (Pallas custom calls cannot auto-partition under GSPMD) — the
    TPU-native form of the reference's DataParallel wrapping of the NMN
    (reference ``_trainer.py:98-100``); the surrounding stem/classifier
    partition under GSPMD as usual."""
    from probnmn_tpu.ops.pallas.nmn_interpreter import (
        build_banks,
        build_tables,
        execute_programs_pallas_diff,
        execute_programs_pallas_diff_dp,
    )

    dtype = jnp.dtype(spec.compute_dtype)
    banks = build_banks(params, spec, dtype)
    tables = build_tables(spec)
    stem_feats = apply_stem(
        jax.tree_util.tree_map(lambda x: x.astype(dtype), params["stem"]),
        features.astype(dtype),
    )
    if mesh is not None:
        final, invalid = execute_programs_pallas_diff_dp(
            mesh, banks, tables, spec, stem_feats, programs, interpret=interpret
        )
    else:
        final, invalid = execute_programs_pallas_diff(
            banks, tables, spec, stem_feats, programs, interpret=interpret
        )
    logits = apply_classifier(
        jax.tree_util.tree_map(lambda x: x.astype(dtype), params["classifier"]), final
    ).astype(jnp.float32)
    return _outputs_from_logits(logits, invalid, spec, answers)


def fast_forward_from_tables(
    banks: Dict[str, jax.Array],
    tables: Dict[str, jax.Array],
    spec: NMNSpec,
    stem_params: Dict[str, Any],
    classifier_params: Dict[str, Any],
    features: jax.Array,
    programs: jax.Array,
    answers: Optional[jax.Array] = None,
    interpret: bool = False,
    mesh=None,
) -> Dict[str, jax.Array]:
    r"""Fused-Pallas forward as a pure function of arrays.

    Unlike :func:`make_fast_inference_fn` (which closes over a parameter
    snapshot), every tensor is an argument here, so one ``jax.jit`` of this
    function stays cached across parameter updates — evaluators rebuild the
    banks each validation without recompiling. With ``mesh`` the interpreter
    runs per-device on its batch shard via shard_map (see
    :func:`nmn_forward_fast`).
    """
    from probnmn_tpu.ops.pallas.nmn_interpreter import (
        execute_programs_pallas,
        execute_programs_pallas_dp,
    )

    dtype = banks["w3"].dtype
    stem_feats = apply_stem(
        jax.tree_util.tree_map(lambda x: x.astype(dtype), stem_params),
        features.astype(dtype),
    )
    if mesh is not None:
        final, invalid = execute_programs_pallas_dp(
            mesh, banks, tables, spec, stem_feats, programs, interpret=interpret
        )
    else:
        final, invalid = execute_programs_pallas(
            banks, tables, spec, stem_feats, programs, interpret=interpret
        )
    logits = apply_classifier(
        jax.tree_util.tree_map(lambda x: x.astype(dtype), classifier_params), final
    ).astype(jnp.float32)
    return _outputs_from_logits(logits, invalid, spec, answers)


def make_fast_inference_fn(params: Dict[str, Any], spec: NMNSpec, interpret: bool = False):
    r"""Build the fused-Pallas inference forward (the hot serving path).

    Precomputes unified weight banks + per-token dispatch tables once, then
    returns a jittable ``forward(features, programs, answers=None)`` with the
    same output contract as :func:`nmn_forward`. ~28x faster than the XLA
    register machine on a v5e chip (the interpreter executes each example's
    program exactly instead of computing every module class at every step).
    For training at kernel speed use :func:`nmn_forward_fast` (differentiable
    via the replay-and-reverse backward kernel).
    """
    from probnmn_tpu.ops.pallas.nmn_interpreter import (
        build_kernel_tables,
        execute_programs_pallas,
    )

    dtype = jnp.dtype(spec.compute_dtype)
    banks, tables = build_kernel_tables(params, spec, dtype=dtype)
    stem_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), params["stem"]
    )
    classifier_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), params["classifier"]
    )

    def forward(features, programs, answers=None):
        stem_feats = apply_stem(stem_params, features.astype(dtype))
        final, invalid = execute_programs_pallas(
            banks, tables, spec, stem_feats, programs, interpret=interpret
        )
        logits = apply_classifier(classifier_params, final).astype(jnp.float32)
        return _outputs_from_logits(logits, invalid, spec, answers)

    return forward
