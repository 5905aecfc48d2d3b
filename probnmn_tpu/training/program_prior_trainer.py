r"""
Phase 1 trainer: ProgramPrior LSTM LM over CLEVR programs
(reference ``probnmn/trainers/program_prior_trainer.py``).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from probnmn_tpu.config import Config
from probnmn_tpu.data.datasets import ProgramPriorDataset
from probnmn_tpu.data.pipeline import BatchIterator
from probnmn_tpu.data.samplers import RandomSampler
from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.models.program_prior import (
    ProgramPriorSpec,
    init_program_prior_params,
    program_prior_forward,
)
from probnmn_tpu.parallel.mesh import auto_mesh, batch_sharding
from probnmn_tpu.training._trainer import _Trainer


def make_prior_spec(config: Config, vocabulary: Vocabulary) -> ProgramPriorSpec:
    return ProgramPriorSpec(
        vocab_size=vocabulary.get_vocab_size("programs"),
        input_size=config.PROGRAM_PRIOR.INPUT_SIZE,
        hidden_size=config.PROGRAM_PRIOR.HIDDEN_SIZE,
        num_layers=config.PROGRAM_PRIOR.NUM_LAYERS,
        dropout=config.PROGRAM_PRIOR.DROPOUT,
    )


class ProgramPriorTrainer(_Trainer):
    def __init__(self, config: Config, serialization_dir: str, cpu_workers: int = 0,
                 num_devices=None, model_parallel: int = 1):
        if config.PHASE != "program_prior":
            raise ValueError(f"Expected PHASE program_prior, found {config.PHASE}")

        vocabulary = Vocabulary.from_files(config.DATA.VOCABULARY)
        dataset = ProgramPriorDataset(config.DATA.TRAIN_TOKENS)
        mesh = auto_mesh(num_devices, config.OPTIM.BATCH_SIZE, model_parallel)
        batches = BatchIterator(
            dataset,
            RandomSampler(len(dataset), seed=config.RANDOM_SEED),
            config.OPTIM.BATCH_SIZE,
            sharding=batch_sharding(mesh) if mesh else None,
        )
        self.spec = make_prior_spec(config, vocabulary)
        params = init_program_prior_params(
            jax.random.PRNGKey(config.RANDOM_SEED), self.spec
        )

        super().__init__(config, batches, {"program_prior": params}, serialization_dir,
                         mesh=mesh)
        self._vocabulary = vocabulary
        self._train_step = self._build_step_fn()

    def _build_step_fn(self):
        spec, tx = self.spec, self._tx
        # Fused Pallas LM fwd+BPTT-bwd on TPU; the loss is rng-independent
        # (sampling only feeds qualitative predictions). On a mesh the kernel
        # runs per-device on its batch shard via shard_map.
        from probnmn_tpu.ops.pallas.seq2seq_train import (
            fused_lm_available,
            fused_lm_loss,
            fused_lm_loss_dp,
        )

        mesh = self._mesh
        use_fused = fused_lm_available(spec)

        @jax.jit
        def train_step(params, opt_state, rng, batch):
            def loss_fn(p):
                if use_fused:
                    if mesh is not None:
                        return fused_lm_loss_dp(
                            mesh, p["program_prior"], spec, batch["program"]
                        ).mean()
                    return fused_lm_loss(p["program_prior"], spec, batch["program"]).mean()
                out = program_prior_forward(p["program_prior"], spec, batch["program"], rng, train=True)
                return out["loss"].mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss}

        return train_step

    def _do_iteration(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        self._params, self._opt_state, logs = self._train_step(
            self._params, self._opt_state, self.next_rng(), batch
        )
        return logs

    def after_validation(self, val_metrics: Dict[str, Any], iteration=None) -> None:
        # Reciprocate perplexity to make it "higher is better".
        val_metrics["metric"] = 1.0 / val_metrics["program_prior"]["perplexity"]
        super().after_validation(val_metrics, iteration)

    def model_specs(self):
        return {"program_prior": self.spec}
