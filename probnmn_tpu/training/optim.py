r"""
Optimization: torch-semantics Adam via optax, elementwise gradient clamping, and a
host-side ReduceLROnPlateau matching torch's (reference ``_trainer.py:102-118``).

The reference clamps gradients elementwise to (-5, 5) after backward and before
``optimizer.step`` in every phase trainer; here ``optax.clip(5.0)`` is the first
element of the chain, which is exactly that. Weight decay (0 in all shipped
configs) is applied torch-Adam style: added to the gradient before the moments.

The learning rate is injected as a mutable hyperparameter so the host-side plateau
scheduler can update it without recompiling the jitted train step.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import optax

GRAD_CLAMP = 5.0


def make_optimizer(lr_initial: float, weight_decay: float = 0.0,
                   mu_dtype: str = "float32") -> optax.GradientTransformation:
    r"""``mu_dtype`` ("float32" or "bfloat16", config ``OPTIM.ADAM_MU_DTYPE``)
    stores Adam's first moment in that dtype. The reference always keeps f32
    moments (torch Adam); bf16 halves the first-moment HBM read+write per step
    — a bandwidth lever for the 50M-parameter joint tree — while the second
    moment and the update math stay f32 (optax upcasts mu before use)."""
    adam_mu_dtype = jnp.dtype(mu_dtype)
    if adam_mu_dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"OPTIM.ADAM_MU_DTYPE must be float32/bfloat16, got {mu_dtype}")

    def build(learning_rate):
        steps = [optax.clip(GRAD_CLAMP)]
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8,
                                         mu_dtype=adam_mu_dtype))
        steps.append(optax.scale_by_learning_rate(learning_rate))  # = scale(-lr)
        return optax.chain(*steps)

    return optax.inject_hyperparams(build)(learning_rate=lr_initial)


def set_learning_rate(opt_state, lr: float):
    r"""Replace the injected learning-rate leaf (no recompilation)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class ReduceLROnPlateau:
    r"""torch ``ReduceLROnPlateau(mode="max", threshold=1e-3)`` semantics
    (rel threshold, no cooldown): shrink lr by ``factor`` after ``patience``
    consecutive non-improving observations."""

    def __init__(self, lr_initial: float, factor: float, patience: int, threshold: float = 1e-3,
                 eps: float = 1e-8):
        self.lr = lr_initial
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.eps = eps  # torch: skip the update when old_lr - new_lr <= eps
        self.best = -float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        # torch's is_better for mode="max", threshold_mode="rel" is unconditionally
        # `a > best * (threshold + 1.)` — including for negative `best`, where the
        # rel margin flips direction. Replicated exactly (torch
        # lr_scheduler.ReduceLROnPlateau.is_better).
        is_better = metric > self.best * (1.0 + self.threshold)
        if is_better:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                new_lr = self.lr * self.factor
                if self.lr - new_lr > self.eps:
                    self.lr = new_lr
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> Dict[str, Any]:
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad": self.num_bad,
            "factor": self.factor,
            "patience": self.patience,
            "threshold": self.threshold,
        }

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        for key, value in state.items():
            setattr(self, key, float(value) if key not in ("num_bad", "patience") else int(value))
