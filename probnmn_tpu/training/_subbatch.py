r"""
Static supervised/unsupervised sub-batch windows for the semi-supervised phases.

The reference splits every question_coding / joint_training batch into its
supervised and unsupervised subsets and runs each pass only on its subset
(reference ``question_coding_trainer.py:112-113``, ``joint_training_trainer.py:
131-132`` — dynamic ``nonzero`` gathers). Dynamic shapes don't jit, so rounds
1-2 ran every pass over the full fixed-shape batch with supervision-mask
weighting — numerically identical, but ~25% of every pass's compute is wasted
on rows whose loss is masked to zero (the weighted sampler makes batches
~50/50, reference ``samplers.py:5-26``).

This module restores the reference's subset economics with STATIC shapes:

- the batch pipeline stable-sorts each batch supervised-first (a pure
  permutation of the sampled multiset — the sampler draws i.i.d. with
  replacement, so batch order carries no information);
- supervised passes run on the fixed HEAD window ``[0, cap)`` and unsupervised
  passes on the fixed TAIL window ``[B - cap, B)``, with the per-example
  supervision mask still applied INSIDE each window. Whenever the counts fit
  (``n_sup <= cap`` and ``n_unsup <= cap``) every mask-active row lies inside
  its window, so all masked sums — losses, ELBO diagnostics, the REINFORCE
  baseline update — are exactly the full-batch values (modulo float reduction
  order over a shorter axis).

``cap`` defaults to 3B/4 rounded up to a mesh-divisible multiple of 8. With the
50/50 sampler the fit probability per step is 1 - P(Binomial(B, 1/2) > 3B/4),
~1 - 1e-15 at B=256; the trainers check the host-side count attached by the
pipeline and fall back to the full-batch step on the (astronomically rare)
overflow, so semantics never depend on the tail bound.
"""
from __future__ import annotations

import math
from typing import Optional


SORT_KEY = "supervision"
COUNT_KEY = "_num_" + SORT_KEY  # attached by BatchIterator(sort_descending_by=...)


def subbatch_cap(batch_size: int, mesh=None, frac: float = 0.75) -> Optional[int]:
    r"""Window size for both the supervised head and unsupervised tail, or
    ``None`` when windowing cannot pay (cap would reach the full batch).

    The cap is a multiple of 8 (TPU sublane-friendly batched convs) and of the
    mesh's data-axis size (shard_map requires the windowed batch to divide
    evenly over devices)."""
    align = 8
    if mesh is not None:
        data_n = mesh.shape.get("data", 1)
        align = align * data_n // math.gcd(align, data_n)
    cap = int(math.ceil(frac * batch_size / align)) * align
    if cap >= batch_size:
        return None
    return cap


def fits(num_supervised: Optional[int], batch_size: int, cap: Optional[int]) -> bool:
    r"""True when every supervised row fits the head window and every
    unsupervised row fits the tail window of a supervised-first-sorted batch."""
    if cap is None or num_supervised is None:
        return False
    return num_supervised <= cap and (batch_size - num_supervised) <= cap


def head(x, cap: Optional[int]):
    r"""Supervised window of a supervised-first-sorted batch array."""
    return x if cap is None else x[:cap]


def tail(x, cap: Optional[int]):
    r"""Unsupervised window of a supervised-first-sorted batch array."""
    return x if cap is None else x[x.shape[0] - cap:]
