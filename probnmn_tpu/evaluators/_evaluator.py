r"""
Base evaluation runtime (reference ``probnmn/evaluators/_evaluator.py``).

Evaluation iterates the val split with fixed-shape batches, runs jitted forward
functions, and accumulates host-side metric objects (the reference accumulates
stateful metrics *inside* model forwards; here models are pure and evaluators own
the accumulators — same reported numbers, no host state on the jit path).

``evaluate(num_batches)`` processes exactly ``num_batches`` batches (the reference
has an off-by-one that processes two extra — ``_evaluator.py:88-94``; not
replicated, metric values are averages either way).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

from probnmn_tpu.config import Config


def eval_sharding(trainer):
    r"""Batch sharding for evaluation: when the trainer runs on a mesh, val
    batches shard over the same 'data' axis (the reference's DataParallel wraps
    the shared models at eval too — evaluators receive the trainer's models)."""
    mesh = getattr(trainer, "mesh", None)
    if mesh is None:
        return None
    from probnmn_tpu.parallel.mesh import batch_sharding

    return batch_sharding(mesh)


class _Evaluator:
    def __init__(self, config: Config, trainer, val_batches):
        self._C = config
        self._trainer = trainer
        self._val_batches = val_batches

    def evaluate(self, num_batches: Optional[int] = None) -> Dict[str, Any]:
        self._begin()
        for iteration, batch in enumerate(iter(self._val_batches)):
            if num_batches is not None and iteration >= num_batches:
                break
            self._do_iteration(batch)
        return self._collect()

    def _begin(self) -> None:
        pass

    def _do_iteration(self, batch: Dict[str, Any]) -> None:
        raise NotImplementedError

    def _collect(self) -> Dict[str, Any]:
        raise NotImplementedError

    @property
    def models(self):
        return self._trainer.params
