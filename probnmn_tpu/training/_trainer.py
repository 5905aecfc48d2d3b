r"""
Base training runtime (reference ``probnmn/trainers/_trainer.py``), TPU-native.

Differences from the reference runtime, by design:

- the whole train step (forward, backward, clamp, Adam update, REINFORCE baseline
  update) is ONE jitted function on device; the host loop only feeds batches and
  logs scalars;
- multi-device execution is data-parallel sharding of the batch via
  ``jax.sharding`` (see ``probnmn_tpu.parallel``), not ``nn.DataParallel``;
- the learning rate is a mutable optax hyperparameter driven by a host-side
  ``ReduceLROnPlateau`` identical to torch's (mode="max", rel threshold 1e-3);
- checkpoints are msgpack pytrees with the same named-partial-restore contract.

Matches the reference contract: single Adam over the union of all trainable models'
parameters, ``step() -> {"loss", ...}`` tensorboard logging (nested dicts become
``add_scalars``), ``after_validation(val_metrics)`` consuming a higher-is-better
``val_metrics["metric"]`` for best-checkpoint tracking and LR scheduling, and
``load_checkpoint`` restoring models + optimizer + scheduler + iteration.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import numpy as np
from tensorboardX import SummaryWriter

from probnmn_tpu.config import Config
from probnmn_tpu.training.optim import (
    ReduceLROnPlateau,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)
from probnmn_tpu.utils.checkpointing import CheckpointManager
from probnmn_tpu.utils.observability import StepTimer

logger = logging.getLogger(__name__)


class _Trainer:
    r"""
    Parameters
    ----------
    config: Config
    batches: iterator yielding device batches (cyclic).
    models: Dict[str, Dict] — trainable parameter pytrees keyed by model name.
    serialization_dir: str
    """

    def __init__(
        self,
        config: Config,
        batches,
        models: Dict[str, Any],
        serialization_dir: str,
        mesh=None,
    ):
        self._C = config
        self._batch_source = batches  # kept for per-stage pipeline timers
        self._batches = iter(batches)
        self._params = dict(models)
        # Data-parallel mesh (reference trains DP over --gpu-ids inside _Trainer,
        # reference _trainer.py:92-100). Parameters are placed by the sharding
        # rules (mostly replicated at this model scale); batches arrive sharded
        # over the 'data' axis from the BatchIterator, and GSPMD inserts the
        # gradient all-reduce over ICI inside the jitted train step.
        self._mesh = mesh
        if mesh is not None:
            from probnmn_tpu.parallel.mesh import shard_params

            self._params = shard_params(mesh, self._params)
        else:
            # Host-initialized parameters go to the device once, here — so the
            # first train step doesn't pay (and, through a tunneled runtime,
            # repay) the full parameter upload, and the optimizer state below
            # is created device-resident.
            self._params = jax.device_put(self._params)

        self._tx = make_optimizer(
            self._C.OPTIM.LR_INITIAL, self._C.OPTIM.WEIGHT_DECAY,
            mu_dtype=getattr(self._C.OPTIM, "ADAM_MU_DTYPE", "float32"),
        )
        self._opt_state = self._tx.init(self._params)
        self._lr_scheduler = ReduceLROnPlateau(
            self._C.OPTIM.LR_INITIAL, self._C.OPTIM.LR_GAMMA, self._C.OPTIM.LR_PATIENCE
        )

        self._tensorboard_writer = SummaryWriter(log_dir=serialization_dir)
        self._checkpoint_manager = CheckpointManager(
            serialization_dir=serialization_dir, keep_recent=100
        )
        self._rng = jax.random.PRNGKey(self._C.RANDOM_SEED)
        self._vocabulary = None  # set by phase trainers that support .pth porting
        self._baseline = np.float32(0.0)  # REINFORCE moving-average baseline
        self._iteration: int = -1
        self._step_timer = StepTimer(batch_size=self._C.OPTIM.BATCH_SIZE)
        # Static sub-batch windowing state (training/_subbatch.py); phase
        # trainers that window set _sub_cap and build both step variants.
        self._sub_cap = None
        self._train_step_full = None

    def _select_step(self, batch: Dict[str, Any]):
        r"""Windowed train step when the batch's supervised/unsupervised counts
        fit the static windows (training/_subbatch.py); otherwise the full-batch
        fallback (compiled lazily — with the 50/50 weighted sampler an overflow
        is a ~1e-15-probability event at batch 256)."""
        from probnmn_tpu.training import _subbatch

        n_sup = batch.pop(_subbatch.COUNT_KEY, None)
        if self._sub_cap is None or _subbatch.fits(
            n_sup, self._C.OPTIM.BATCH_SIZE, self._sub_cap
        ):
            return self._train_step
        if self._train_step_full is None:
            self._train_step_full = self._build_step_fn(None)
        return self._train_step_full

    # ------------------------------------------------------------------ step ----------
    def step(self, iteration: Optional[int] = None) -> None:
        batch = next(self._batches)
        output_dict = self._do_iteration(batch)
        self._iteration = iteration if iteration is not None else self._iteration + 1
        self._step_timer.tick()
        if self._iteration % 50 == 0 and self._iteration > 0:
            metrics = dict(self._step_timer.metrics())
            # Per-stage pipeline timers (prefetch wait / H2D dispatch) when the
            # batch source exposes them — long-horizon runs double as a soak
            # test of the input pipeline.
            stage = getattr(self._batch_source, "stage_metrics", None)
            if stage is not None:
                metrics.update(stage())
            for name, value in metrics.items():
                self._tensorboard_writer.add_scalar(
                    f"train/{name}", value, self._iteration
                )
        self._log_output(output_dict)

    def _do_iteration(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        raise NotImplementedError

    def _log_output(self, output_dict: Dict[str, Any]) -> None:
        output_dict = jax.device_get(output_dict)
        for key, value in output_dict.items():
            if isinstance(value, dict):
                scalars = {k: float(v) for k, v in value.items() if np.ndim(v) == 0}
                if scalars:
                    self._tensorboard_writer.add_scalars(
                        f"train/{key}", scalars, self._iteration
                    )
            elif np.ndim(value) == 0:
                self._tensorboard_writer.add_scalar(
                    f"train/{key}", float(value), self._iteration
                )

    # ------------------------------------------------------------------ validation ----
    def _checkpointables(self) -> Dict[str, Any]:
        objects: Dict[str, Any] = dict(self._params)
        objects["optimizer"] = self._opt_state
        objects["scheduler"] = self._lr_scheduler.state_dict()
        objects["reinforce_baseline"] = np.asarray(self._baseline)
        return objects

    def after_validation(
        self, val_metrics: Dict[str, Any], iteration: Optional[int] = None
    ) -> None:
        if iteration is not None:
            self._iteration = iteration

        metric = val_metrics["metric"]
        self._checkpoint_manager.step(self._iteration, self._checkpointables(), metric)

        new_lr = self._lr_scheduler.step(metric)
        self._opt_state = set_learning_rate(self._opt_state, new_lr)
        self._tensorboard_writer.add_scalar("train/lr", new_lr, self._iteration)

        val_metrics = {k: v for k, v in val_metrics.items() if k != "metric"}
        for model_name, metrics in val_metrics.items():
            if not isinstance(metrics, dict):
                continue
            for metric_name, value in metrics.items():
                self._tensorboard_writer.add_scalar(
                    f"val/metrics/{model_name}/{metric_name}", value, self._iteration
                )

    def model_specs(self) -> Dict[str, Any]:
        r"""model name -> spec, for porting reference .pth checkpoints. Phase
        trainers override; the default empty dict disables .pth loading."""
        return {}

    def load_checkpoint(self, checkpoint_path: str, iteration: Optional[int] = None):
        if checkpoint_path.endswith(".pth"):
            # Reference checkpoint: port model weights (optimizer/scheduler state
            # is torch-specific and starts fresh).
            from probnmn_tpu.utils.checkpointing import load_objects_flexible

            restored, ckpt_iteration, _ = load_objects_flexible(
                checkpoint_path, dict(self._params),
                specs=self.model_specs(), vocabulary=self._vocabulary,
            )
            for name in self._params:
                self._params[name] = jax.device_put(restored[name])
            self._iteration = iteration if iteration is not None else ckpt_iteration
            return
        templates = self._checkpointables()
        restored, ckpt_iteration = self._checkpoint_manager.load(checkpoint_path, templates)
        for name in self._params:
            self._params[name] = restored[name]
        self._opt_state = restored["optimizer"]
        self._lr_scheduler.load_state_dict(
            jax.tree_util.tree_map(float, restored["scheduler"])
        )
        self._opt_state = set_learning_rate(self._opt_state, self._lr_scheduler.lr)
        self._baseline = np.float32(restored["reinforce_baseline"])
        self._iteration = iteration if iteration is not None else ckpt_iteration

    # ------------------------------------------------------------------ accessors -----
    @property
    def iteration(self) -> int:
        return self._iteration

    @property
    def mesh(self):
        return self._mesh

    def _replicate(self, pytree):
        r"""Place frozen/auxiliary parameters on the mesh (sharding rules), so
        jitted steps never mix differently-committed inputs."""
        if self._mesh is None:
            return jax.device_put(pytree)
        from probnmn_tpu.parallel.mesh import shard_params

        return shard_params(self._mesh, pytree)

    @property
    def params(self) -> Dict[str, Any]:
        return self._params

    @property
    def learning_rate(self) -> float:
        return get_learning_rate(self._opt_state)

    def next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub
