r"""
Shared functional ops: embeddings, linears, boundary handling, masked softmax,
sequence cross entropy, vectorized @end@-trimming and special-token-masked sampling.

These reproduce, in vectorized jit-friendly form, the AllenNLP/torch behaviors the
reference relies on:

- ``add_boundary``      = ``allennlp.nn.util.add_sentence_boundary_token_ids``
  (reference ``seq2seq_base.py:127-137``).
- ``sequence_cross_entropy`` = ``allennlp.nn.util.sequence_cross_entropy_with_logits``
  with ``average=None`` (per-example masked mean CE).
- ``trim_at_end``       = the per-row Python trimming loop in reference
  ``seq2seq_base.py:278-293``, as a single vectorized mask.
- ``sample_with_blocked_tokens`` = ``torch.multinomial`` over a softmax whose
  @@PADDING@@/@@UNKNOWN@@/@start@ entries were zeroed (not renormalized — multinomial
  normalizes, so blocking logits to -inf is exactly equivalent), reference
  ``seq2seq_base.py:211-215``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def tpu_fused_kernels_supported() -> bool:
    r"""True when the default backend is a TPU generation whose VMEM can hold
    the fused kernels' VMEM-resident banks (they request 64-115 MB
    ``vmem_limit_bytes``; a 22 MB weight bank plus f32 grad banks live in VMEM
    for the kernels' lifetime). v4 and later have ~128 MB VMEM per core; v2/v3
    have ~16 MB, where the fused paths would fail to COMPILE rather than fall
    back — so they are excluded here and the XLA scan/register-machine paths
    (identical semantics) serve those generations."""
    if jax.default_backend() != "tpu":
        return False
    kind = jax.devices()[0].device_kind.lower()  # e.g. "TPU v5 lite"
    return not any(gen in kind for gen in ("v2", "v3"))


# ------------------------------------------------------------------ params ------------
def xavier_uniform(key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    r"""allennlp Embedding default init."""
    fan_in, fan_out = shape[-1], shape[-2] if len(shape) > 1 else shape[-1]
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def init_embedding(key: jax.Array, vocab_size: int, dim: int, pad_index: Optional[int] = None):
    weight = xavier_uniform(key, (vocab_size, dim))
    if pad_index is not None:
        weight = weight.at[pad_index].set(0.0)
    return weight


def embed(weight: jax.Array, tokens: jax.Array, pad_index: Optional[int] = None) -> jax.Array:
    r"""Embedding lookup. With ``pad_index``, emulates torch ``padding_idx``: the pad
    row contributes zeros and receives no gradient through lookups (but a tied output
    layer still updates it, as in torch)."""
    out = weight[tokens]
    if pad_index is not None:
        out = out * (tokens != pad_index)[..., None].astype(out.dtype)
    return out


def init_linear(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True):
    r"""Torch ``nn.Linear`` default init; weight stored torch-style as (out, in)."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    params = {"w": jax.random.uniform(k1, (out_dim, in_dim), minval=-bound, maxval=bound)}
    if bias:
        params["b"] = jax.random.uniform(k2, (out_dim,), minval=-bound, maxval=bound)
    return params


def linear(params, x: jax.Array) -> jax.Array:
    out = x @ params["w"].T
    if "b" in params:
        out = out + params["b"]
    return out


# ------------------------------------------------------------------ sequences ---------
def add_boundary(tokens: jax.Array, pad_index: int, start_index: int, end_index: int) -> jax.Array:
    r"""Prepend @start@ and append @end@ right after each row's last valid token.

    tokens: (B, T) with right-padding. Returns (B, T+2).
    """
    batch, length = tokens.shape
    mask = tokens != pad_index
    lengths = mask.sum(axis=1)
    out = jnp.concatenate(
        [
            jnp.full((batch, 1), start_index, tokens.dtype),
            jnp.where(mask, tokens, 0),
            jnp.zeros((batch, 1), tokens.dtype),
        ],
        axis=1,
    )
    end_onehot = jax.nn.one_hot(lengths + 1, length + 2, dtype=tokens.dtype)
    return out + end_onehot * end_index


def masked_softmax(scores: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    r"""Softmax with masked entries receiving zero weight (allennlp masked_softmax)."""
    scores = jnp.where(mask, scores, NEG_INF)
    return jax.nn.softmax(scores, axis=axis)


def sequence_cross_entropy(
    logits: jax.Array, targets: jax.Array, weights: jax.Array
) -> jax.Array:
    r"""Per-example masked mean token cross entropy.

    logits: (B, T, V); targets, weights: (B, T). Returns (B,). Matches allennlp's
    ``sequence_cross_entropy_with_logits(average=None)`` including the 1e-13 epsilon.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    weights = weights.astype(logits.dtype)
    return (nll * weights).sum(-1) / (weights.sum(-1) + 1e-13)


def trim_at_end(predictions: jax.Array, end_index: int) -> jax.Array:
    r"""Zero out everything after (exclusive of) the first @end@ token per row.

    Matches the reference exactly: rows whose first @end@ is at position 0 become all
    zeros; rows without @end@ are kept whole; the @end@ token itself is kept.
    """
    _, length = predictions.shape
    is_end = predictions == end_index
    has_end = is_end.any(axis=-1)
    first_end = jnp.argmax(is_end, axis=-1)
    positions = jnp.arange(length)
    keep = positions[None, :] <= first_end[:, None]
    keep = jnp.where(has_end[:, None] & (first_end[:, None] > 0), keep, ~has_end[:, None])
    return predictions * keep


def sample_with_blocked_tokens(
    key: jax.Array, logits: jax.Array, blocked: Tuple[int, ...]
) -> jax.Array:
    r"""Categorical sample with certain token ids given zero probability.

    Equivalent to torch's zero-then-multinomial: multinomial renormalizes, so masking
    logits to -inf before a categorical draw yields the identical distribution.
    """
    masked = logits
    for index in blocked:
        masked = masked.at[..., index].set(NEG_INF)
    return jax.random.categorical(key, masked, axis=-1)


def length_normalized_logprob_loss(
    logprobs: jax.Array, predictions: jax.Array, pad_index: int
) -> jax.Array:
    r"""loss = -(sum step-logprobs over non-pad positions) / (count + 1e-12).

    The REINFORCE "loss" for free-running decode (reference ``seq2seq_base.py:235-246``):
    a length-normalized negative sequence log-probability of the sampled tokens, with
    positions after the first @end@ masked out via the already-trimmed predictions.
    """
    mask = (predictions != pad_index).astype(logprobs.dtype)
    total = (logprobs * mask).sum(-1)
    count = mask.sum(-1)
    return -(total / (count + 1e-12))
