r"""
Phase 3 trainer: Module Training — NMN over cached image features with programs
sampled from the frozen ProgramGenerator
(reference ``probnmn/trainers/module_training_trainer.py``).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from probnmn_tpu.config import Config
from probnmn_tpu.data.datasets import ModuleTrainingDataset
from probnmn_tpu.data.pipeline import BatchIterator
from probnmn_tpu.data.pipeline import image_to_nhwc
from probnmn_tpu.data.samplers import RandomSampler
from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.models import nmn as nmn_lib
from probnmn_tpu.models import program_generator
from probnmn_tpu.models.seq2seq import seq2seq_forward
from probnmn_tpu.parallel.mesh import auto_mesh, batch_sharding
from probnmn_tpu.training._trainer import _Trainer
from probnmn_tpu.utils.checkpointing import load_objects_flexible


class ModuleTrainingTrainer(_Trainer):
    def __init__(
        self,
        config: Config,
        serialization_dir: str,
        cpu_workers: int = 0,
        in_memory_features: bool = True,
        num_devices=None,
        model_parallel: int = 1,
    ):
        if config.PHASE != "module_training":
            raise ValueError(f"Expected PHASE module_training, found {config.PHASE}")

        vocabulary = Vocabulary.from_files(config.DATA.VOCABULARY)
        dataset = ModuleTrainingDataset(
            config.DATA.TRAIN_TOKENS, config.DATA.TRAIN_FEATURES, in_memory=in_memory_features
        )
        mesh = auto_mesh(num_devices, config.OPTIM.BATCH_SIZE, model_parallel)
        batches = BatchIterator(
            dataset,
            RandomSampler(len(dataset), seed=config.RANDOM_SEED),
            config.OPTIM.BATCH_SIZE,
            sharding=batch_sharding(mesh) if mesh else None,
        )

        self.nmn_spec = nmn_lib.make_spec(vocabulary, config)
        params = nmn_lib.init_nmn_params(
            jax.random.PRNGKey(config.RANDOM_SEED), self.nmn_spec
        )
        super().__init__(config, batches, {"nmn": params}, serialization_dir,
                         mesh=mesh)
        self._vocabulary = vocabulary

        # Frozen ProgramGenerator from the question_coding checkpoint.
        self.pg_spec = program_generator.make_spec(vocabulary, config)
        pg_template = program_generator.init_params(jax.random.PRNGKey(0), self.pg_spec)
        restored, _, _ = load_objects_flexible(
            config.CHECKPOINTS.QUESTION_CODING, {"program_generator": pg_template},
            specs={"program_generator": self.pg_spec}, vocabulary=vocabulary,
        )
        self._pg_params = self._replicate(restored["program_generator"])

        self._train_step = self._build_step_fn()

    def _build_step_fn(self):
        nmn_spec, pg_spec, tx = self.nmn_spec, self.pg_spec, self._tx
        # Fused-Pallas differentiable interpreter on TPU (custom-VJP backward
        # kernel); XLA register machine elsewhere — identical semantics/grads.
        # On a mesh the fused interpreter runs per-device on its batch shard
        # via shard_map (Pallas calls cannot auto-partition under GSPMD).
        if nmn_lib.fast_training_available(nmn_spec):
            from functools import partial

            nmn_forward = partial(nmn_lib.nmn_forward_fast, mesh=self._mesh)
        else:
            nmn_forward = nmn_lib.nmn_forward

        # The generator is frozen here, so sampling needs no gradient: the
        # fused Pallas sampling kernel serves it on TPU (per-shard via
        # shard_map when a mesh is active).
        from probnmn_tpu.models.seq2seq import (
            fast_sampling_available,
            sampling_forward_serving,
        )

        mesh = self._mesh
        use_fast_sampling = fast_sampling_available(pg_spec)

        @jax.jit
        def train_step(params, opt_state, rng, batch, pg_params):
            # Sample programs from the frozen generator (reference :88-98).
            if use_fast_sampling:
                if mesh is not None:
                    from probnmn_tpu.ops.pallas.seq2seq_decode import (
                        fused_sampling_forward_dp,
                    )

                    pg_out = {"predictions": fused_sampling_forward_dp(
                        mesh, pg_params, pg_spec, batch["question"], rng
                    )}
                else:
                    pg_out = sampling_forward_serving(
                        pg_params, pg_spec, batch["question"], rng
                    )
            else:
                pg_out = seq2seq_forward(
                    pg_params, pg_spec, batch["question"], None, "sampling", rng
                )
            programs = jax.lax.stop_gradient(pg_out["predictions"])

            image = image_to_nhwc(batch["image"])

            def loss_fn(p):
                out = nmn_forward(
                    p["nmn"], nmn_spec, image, programs, batch["answer"]
                )
                return out["loss"].mean(), out["metrics"]

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss, "metrics": metrics}

        return train_step

    def _do_iteration(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        self._params, self._opt_state, logs = self._train_step(
            self._params, self._opt_state, self.next_rng(), batch, self._pg_params
        )
        return logs

    def after_validation(self, val_metrics: Dict[str, Any], iteration=None) -> None:
        val_metrics["metric"] = val_metrics["nmn"]["answer_accuracy"]
        super().after_validation(val_metrics, iteration)

    @property
    def pg_params(self):
        return self._pg_params

    def model_specs(self):
        return {"nmn": self.nmn_spec}
