r"""
ELBO / REINFORCE estimators as pure functions with explicit carried state
(reference ``probnmn/modules/elbo.py``).

The moving-average baseline is the only mutable state in the reference's
``Reinforce`` module; here it is a scalar threaded through the train-state pytree.
The (unusual) reference update rule is preserved exactly (``elbo.py:28-34``):

    centered = stop_grad(reward) - baseline
    baseline' = baseline + decay * mean(centered)       # NOT the textbook EMA

Because jit requires static shapes, the question-coding/joint phases run the full
batch through the models and mask per-example terms by the supervision flag instead
of gathering dynamic sub-batches; all means below are mask-weighted so the numbers
match the reference's dynamic-subset means.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return x.mean()
    mask = mask.astype(x.dtype)
    return (x * mask).sum() / (mask.sum() + 1e-12)


def reinforce(
    inputs: jax.Array,
    reward: jax.Array,
    baseline: jax.Array,
    decay: float,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    r"""REINFORCE with a decaying moving-average baseline.

    Returns (inputs * centered_reward, new_baseline). ``mask`` restricts the
    baseline update (and downstream means) to the unsupervised sub-batch, matching
    the reference's dynamic-subset behavior.
    """
    centered = jax.lax.stop_gradient(reward) - baseline
    new_baseline = baseline + decay * masked_mean(centered, mask)
    return inputs * centered, new_baseline


def elbo_with_reinforce(
    inference_likelihood: jax.Array,
    reconstruction_likelihood: jax.Array,
    reinforce_reward: jax.Array,
    baseline: jax.Array,
    beta: float,
    decay: float,
    mask: Optional[jax.Array] = None,
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    r"""Fully-Monte-Carlo ELBO (reference ``elbo.py:61-89``).

    kl = REINFORCE(inference_ll, reward) - beta * inference_ll;
    elbo = reconstruction_ll - kl. Returns (diagnostics with (masked) batch means,
    new_baseline). Per-example elbo is also returned under "elbo_per_example" for
    loss composition.
    """
    reinforce_term, new_baseline = reinforce(
        inference_likelihood, reinforce_reward, baseline, decay, mask
    )
    kl_divergence = reinforce_term - beta * inference_likelihood
    elbo = reconstruction_likelihood - kl_divergence
    diagnostics = {
        "reconstruction_likelihood": masked_mean(reconstruction_likelihood, mask),
        "kl_divergence": masked_mean(kl_divergence, mask),
        "elbo": masked_mean(elbo, mask),
        "reinforce_reward": masked_mean(reinforce_reward, mask),
        "elbo_per_example": elbo,
    }
    return diagnostics, new_baseline


def question_coding_reward(
    logprobs_reconstruction: jax.Array,
    logprobs_generation: jax.Array,
    logprobs_prior: jax.Array,
    beta: float,
) -> jax.Array:
    r"""R = log p(x|z) + beta * (log p(z) - log q(z|x))  (reference ``elbo.py:152-159``)."""
    return logprobs_reconstruction + beta * (logprobs_prior - logprobs_generation)


def joint_training_reward(
    logprobs_reconstruction: jax.Array,
    logprobs_generation: jax.Array,
    logprobs_prior: jax.Array,
    logprobs_answering: jax.Array,
    beta: float,
    gamma: float,
) -> jax.Array:
    r"""R = log p(x|z) + beta*log p(z) - beta*log q(z|x) + gamma*log p(a|z,i)
    (reference ``elbo.py:259-270``)."""
    return (
        logprobs_reconstruction
        + beta * logprobs_prior
        - beta * logprobs_generation
        + gamma * logprobs_answering
    )
