r"""
ProgramPrior: LSTM language model over CLEVR programs, with tied input/output
embeddings (reference ``probnmn/models/program_prior.py``).

Architecture (reference ``program_prior.py:50-62``): embedding (pad row zero) ->
masked multi-layer LSTM -> ``Linear(hidden, input, bias=False)`` projection -> output
logits through the *tied* embedding matrix. Teacher-forced next-token CE per example;
"predictions" are per-position categorical samples with @start@/@@PADDING@@/
@@UNKNOWN@@ blocked (reference ``program_prior.py:124-143``).

``sample`` reproduces the reference's free-running ancestral sampler *including its
quirk*: per-step logprobs come from ``log_softmax(output_projection)`` — the
pre-output-layer activations over the ``input_size`` axis, not the vocab logits
(reference ``program_prior.py:246``). It is a diagnostic API, not on the training path.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from probnmn_tpu.ops import rnn
from probnmn_tpu.ops.common import (
    add_boundary,
    embed,
    init_embedding,
    length_normalized_logprob_loss,
    sample_with_blocked_tokens,
    sequence_cross_entropy,
    trim_at_end,
    xavier_uniform,
)


@dataclass(frozen=True)
class ProgramPriorSpec:
    vocab_size: int
    input_size: int = 256
    hidden_size: int = 256
    num_layers: int = 2
    dropout: float = 0.0
    pad_index: int = 0
    unk_index: int = 1
    start_index: int = 2
    end_index: int = 3


def init_program_prior_params(key: jax.Array, spec: ProgramPriorSpec) -> Dict[str, Any]:
    k_emb, k_enc, k_proj = jax.random.split(key, 3)
    bound = 1.0 / (spec.hidden_size ** 0.5)
    return {
        # The embedding doubles as the (tied) output layer weight, exactly as the
        # reference ties ``_output_layer.weight = embedder.weight``.
        "embedding": init_embedding(
            k_emb, spec.vocab_size, spec.input_size, pad_index=spec.pad_index
        ),
        "encoder": rnn.init_lstm_params(
            k_enc, spec.input_size, spec.hidden_size, spec.num_layers
        ),
        # Linear(hidden, input, bias=False), torch default init.
        "projection": jax.random.uniform(
            k_proj, (spec.input_size, spec.hidden_size), minval=-bound, maxval=bound
        ),
    }


def _lm_logits(params: Dict[str, Any], encoded: jax.Array) -> jax.Array:
    projected = encoded @ params["projection"].T
    return projected @ params["embedding"].T, projected


def program_prior_forward(
    params: Dict[str, Any],
    spec: ProgramPriorSpec,
    program_tokens: jax.Array,
    rng: jax.Array,
    train: bool = False,
) -> Dict[str, jax.Array]:
    r"""Teacher-forced LM pass. Returns ``{"predictions": (B, T+1), "loss": (B,)}``.
    ``train=True`` enables torch-style inter-layer LSTM dropout."""
    tokens = add_boundary(program_tokens, spec.pad_index, spec.start_index, spec.end_index)
    mask = tokens != spec.pad_index

    embedded = embed(params["embedding"], tokens, pad_index=spec.pad_index)
    encoded, _ = rnn.lstm_encode(
        params["encoder"], embedded, mask,
        dropout=spec.dropout if train else 0.0,
        dropout_rng=jax.random.fold_in(rng, 991) if train and spec.dropout > 0.0 else None,
    )
    logits, _ = _lm_logits(params, encoded)

    # Ancestral per-position samples (API parity; used for qualitative eval prints).
    blocked = (spec.start_index, spec.pad_index, spec.unk_index)
    predictions = sample_with_blocked_tokens(rng, logits, blocked)
    predictions = predictions[:, :-1] * mask[:, 1:]

    loss = sequence_cross_entropy(logits[:, :-1], tokens[:, 1:], mask[:, 1:])
    return {"predictions": predictions, "loss": loss}


def program_prior_sample(
    params: Dict[str, Any],
    spec: ProgramPriorSpec,
    rng: jax.Array,
    num_samples: int = 1,
    max_sequence_length: int = 28,
) -> Dict[str, jax.Array]:
    r"""Free-running ancestral sampling from @start@ (reference ``program_prior.py:174-301``).

    Returns predictions sorted by ascending loss (length-normalized negative
    "logprob", with the reference's pre-output-layer log-softmax quirk preserved).
    """
    num_steps = max_sequence_length - 1
    blocked = (spec.start_index, spec.pad_index, spec.unk_index)
    hs = jnp.zeros((spec.num_layers, num_samples, spec.hidden_size))
    cs = jnp.zeros_like(hs)
    start = jnp.full((num_samples,), spec.start_index, jnp.int32)

    def step(carry, t):
        hs, cs, last = carry
        embedded = embed(params["embedding"], last, pad_index=spec.pad_index)
        out, hs, cs = rnn.lstm_step_stacked(params["encoder"], embedded, hs, cs)
        logits, projected = _lm_logits(params, out)
        key = jax.random.fold_in(rng, t)
        predicted = sample_with_blocked_tokens(key, logits, blocked)
        # Reference quirk: logprobs over the projection activations, not vocab logits.
        quirk_logprobs = jax.nn.log_softmax(projected, axis=-1)
        chosen = jnp.take_along_axis(quirk_logprobs, predicted[:, None], axis=-1)[:, 0]
        return (hs, cs, predicted), (predicted, chosen)

    (_, _, _), (step_preds, step_logprobs) = jax.lax.scan(
        step, (hs, cs, start), jnp.arange(num_steps)
    )
    predictions = jnp.swapaxes(step_preds, 0, 1)
    logprobs = jnp.swapaxes(step_logprobs, 0, 1)

    predictions = trim_at_end(predictions, spec.end_index)
    loss = length_normalized_logprob_loss(logprobs, predictions, spec.pad_index)
    order = jnp.argsort(loss)  # ascending loss = most probable first
    return {"predictions": predictions[order], "loss": loss[order]}
