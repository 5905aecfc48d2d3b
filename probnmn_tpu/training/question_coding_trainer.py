r"""
Phase 2 trainer: Question Coding — semi-supervised seq2seq VAE with REINFORCE
(reference ``probnmn/trainers/question_coding_trainer.py``).

The reference splits each batch into supervised / unsupervised sub-batches with
dynamic ``nonzero`` gathers; here the batch pipeline sorts each batch
supervised-first and every pass runs on a STATIC head (supervised) or tail
(unsupervised) window with the supervision mask applied inside the window
(``training/_subbatch.py``) — the reference's per-subset economics with
jit-static shapes (SURVEY.md §7 step 4). When windowing is off (tiny batches,
or the rare window overflow) both paths run over the full fixed-shape batch
with mask weighting — numerically identical.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from probnmn_tpu.config import Config
from probnmn_tpu.data.datasets import QuestionCodingDataset
from probnmn_tpu.data.pipeline import BatchIterator
from probnmn_tpu.data.samplers import SupervisionWeightedRandomSampler
from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.models import program_generator, question_reconstructor
from probnmn_tpu.models.program_prior import program_prior_forward, init_program_prior_params
from probnmn_tpu.models.seq2seq import seq2seq_forward
from probnmn_tpu.modules.elbo import (
    elbo_with_reinforce,
    masked_mean,
    question_coding_reward,
)
from probnmn_tpu.parallel.mesh import auto_mesh, batch_sharding
from probnmn_tpu.training import _subbatch
from probnmn_tpu.training._trainer import _Trainer
from probnmn_tpu.training.program_prior_trainer import make_prior_spec
from probnmn_tpu.utils.checkpointing import load_objects_flexible


class QuestionCodingTrainer(_Trainer):
    def __init__(self, config: Config, serialization_dir: str, cpu_workers: int = 0,
                 num_devices=None, model_parallel: int = 1):
        if config.PHASE != "question_coding":
            raise ValueError(f"Expected PHASE question_coding, found {config.PHASE}")

        vocabulary = Vocabulary.from_files(config.DATA.VOCABULARY)
        dataset = QuestionCodingDataset(
            config.DATA.TRAIN_TOKENS,
            num_supervision=config.SUPERVISION,
            supervision_question_max_length=config.SUPERVISION_QUESTION_MAX_LENGTH,
        )
        sampler = SupervisionWeightedRandomSampler(
            dataset.get_supervision_list(), seed=config.RANDOM_SEED
        )
        mesh = auto_mesh(num_devices, config.OPTIM.BATCH_SIZE, model_parallel)
        batches = BatchIterator(dataset, sampler, config.OPTIM.BATCH_SIZE,
                                sharding=batch_sharding(mesh) if mesh else None,
                                sort_descending_by=_subbatch.SORT_KEY)

        self.pg_spec = program_generator.make_spec(vocabulary, config)
        self.qr_spec = question_reconstructor.make_spec(vocabulary, config)
        key = jax.random.PRNGKey(config.RANDOM_SEED)
        k_pg, k_qr = jax.random.split(key)
        models = {
            "program_generator": program_generator.init_params(k_pg, self.pg_spec),
            "question_reconstructor": question_reconstructor.init_params(k_qr, self.qr_spec),
        }
        super().__init__(config, batches, models, serialization_dir, mesh=mesh)
        self._vocabulary = vocabulary

        # Frozen ProgramPrior from the program_prior phase checkpoint.
        self.prior_spec = make_prior_spec(config, vocabulary)
        prior_template = init_program_prior_params(jax.random.PRNGKey(0), self.prior_spec)
        restored, _, _ = load_objects_flexible(
            config.CHECKPOINTS.PROGRAM_PRIOR, {"program_prior": prior_template},
            specs={"program_prior": self.prior_spec}, vocabulary=vocabulary,
        )
        self._prior_params = self._replicate(restored["program_prior"])

        # Static supervised/unsupervised windows over the sorted batch
        # (training/_subbatch.py): each pass runs only on its subset, like the
        # reference's dynamic split (question_coding_trainer.py:112-113).
        self._sub_cap = _subbatch.subbatch_cap(config.OPTIM.BATCH_SIZE, mesh)
        self._train_step = self._build_step_fn(self._sub_cap)
        self._train_step_full = (
            self._train_step if self._sub_cap is None else None
        )  # full-batch fallback, compiled only if a batch overflows the window

    def _build_step_fn(self, cap=None):
        pg_spec, qr_spec, prior_spec = self.pg_spec, self.qr_spec, self.prior_spec
        tx = self._tx
        alpha, beta, delta = self._C.ALPHA, self._C.BETA, self._C.DELTA
        objective = self._C.OBJECTIVE
        # Fused Pallas fwd+BPTT-bwd passes on TPU: custom-VJP kernels are
        # opaque to XLA, which avoids the combined-graph backward blowup (the
        # joint five-pass XLA backward costs ~1.5x the sum of the passes,
        # PERF.md). Pallas custom calls cannot auto-partition under GSPMD, so
        # on a mesh each per-example kernel runs per-device on its batch shard
        # via shard_map (bit-exact vs single device, tested).
        from probnmn_tpu.ops.pallas.seq2seq_train import (
            fused_lm_available,
            fused_lm_loss,
            fused_lm_loss_dp,
            fused_tf_loss,
            fused_tf_loss_dp,
            fused_training_available,
        )

        mesh = self._mesh
        use_fused = (
            fused_training_available(pg_spec)
            and fused_training_available(qr_spec)
            and fused_lm_available(prior_spec)
        )

        def tf_loss(model_params, model_spec, src, tgt, reinforce_norm=False):
            if mesh is not None:
                return fused_tf_loss_dp(mesh, model_params, model_spec, src, tgt,
                                        reinforce_norm)
            return fused_tf_loss(model_params, model_spec, src, tgt, reinforce_norm)

        def lm_loss(model_params, model_spec, tokens):
            if mesh is not None:
                return fused_lm_loss_dp(mesh, model_params, model_spec, tokens)
            return fused_lm_loss(model_params, model_spec, tokens)

        @jax.jit
        def train_step(params, opt_state, baseline, rng, batch, prior_params):
            keys = jax.random.split(rng, 5)
            sup = batch["supervision"].astype(jnp.float32)
            # Static sub-batch windows over the supervised-first-sorted batch
            # (no-ops when cap is None): supervised passes see the head window,
            # unsupervised passes the tail, masks applied inside each window —
            # exactly the reference's per-subset passes (reference
            # question_coding_trainer.py:112-113) with jit-static shapes.
            q_sup = _subbatch.head(batch["question"], cap)
            prog_sup = _subbatch.head(batch["program"], cap)
            sup_w = _subbatch.head(sup, cap)
            q_unsup = _subbatch.tail(batch["question"], cap)
            unsup_w = _subbatch.tail(1.0 - sup, cap)

            def loss_fn(p):
                # Supervised teacher-forced losses (means over the supervised subset).
                if use_fused:
                    pg_sup = {"loss": tf_loss(
                        p["program_generator"], pg_spec, q_sup, prog_sup,
                    )}
                    qr_sup = {"loss": tf_loss(
                        p["question_reconstructor"], qr_spec, prog_sup, q_sup,
                    )}
                else:
                    pg_sup = seq2seq_forward(
                        p["program_generator"], pg_spec,
                        q_sup, prog_sup, "sampling", keys[0], train=True,
                    )
                    qr_sup = seq2seq_forward(
                        p["question_reconstructor"], qr_spec,
                        prog_sup, q_sup, "sampling", keys[1], train=True,
                    )
                pg_loss_sup = masked_mean(pg_sup["loss"], sup_w)
                qr_loss_sup = masked_mean(qr_sup["loss"], sup_w)

                logs: Dict[str, Any] = {
                    "loss": {
                        "question_reconstruction_gt": qr_loss_sup,
                        "program_generation_gt": pg_loss_sup,
                    }
                }
                if objective == "baseline":
                    total = pg_loss_sup + qr_loss_sup
                    return total, (baseline, logs)

                # ELBO over the unsupervised subset: z ~ q(z|x), reconstruct, prior.
                if use_fused:
                    # Two-pass free-running decode: sample z with the fused
                    # sampling kernel (sampling is a stop-gradient), then get
                    # the differentiable length-normalized -log q(z|x) via the
                    # fused teacher-forced kernel in REINFORCE mode — the same
                    # gradient the scan path produces at the same z.
                    from probnmn_tpu.ops.pallas.seq2seq_decode import (
                        fused_sampling_forward,
                        fused_sampling_forward_dp,
                    )

                    pg_frozen = jax.lax.stop_gradient(p["program_generator"])
                    if mesh is not None:
                        z = fused_sampling_forward_dp(
                            mesh, pg_frozen, pg_spec, q_unsup, keys[2]
                        )
                    else:
                        z = fused_sampling_forward(
                            pg_frozen, pg_spec, q_unsup, keys[2]
                        )["predictions"]
                    pg_free = {"loss": tf_loss(
                        p["program_generator"], pg_spec, q_unsup, z, True,
                    ), "predictions": z}
                    qr_rec = {"loss": tf_loss(
                        p["question_reconstructor"], qr_spec, z, q_unsup,
                    )}
                    # Frozen prior: fused LM forward (loss is rng-independent;
                    # the prior's logprobs only enter the detached reward).
                    prior_out = {"loss": lm_loss(prior_params, prior_spec, z)}
                else:
                    pg_free = seq2seq_forward(
                        p["program_generator"], pg_spec,
                        q_unsup, None, "sampling", keys[2], train=True,
                    )
                    z = pg_free["predictions"]
                    qr_rec = seq2seq_forward(
                        p["question_reconstructor"], qr_spec,
                        z, q_unsup, "sampling", keys[3], train=True,
                    )
                    prior_out = program_prior_forward(
                        prior_params, prior_spec, z, keys[4]
                    )

                logprobs_generation = -pg_free["loss"]
                logprobs_reconstruction = -qr_rec["loss"]
                logprobs_prior = -prior_out["loss"]
                reward = question_coding_reward(
                    logprobs_reconstruction, logprobs_generation, logprobs_prior, beta
                )
                diagnostics, new_baseline = elbo_with_reinforce(
                    logprobs_generation, logprobs_reconstruction, reward,
                    baseline, beta, delta, mask=unsup_w,
                )
                elbo = diagnostics.pop("elbo")
                diagnostics.pop("elbo_per_example")
                logs["elbo"] = dict(diagnostics, elbo=elbo)
                total = -elbo + alpha * (qr_loss_sup + pg_loss_sup)
                return total, (new_baseline, logs)

            (_, (new_baseline, logs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_baseline, logs

        return train_step

    def _do_iteration(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        step = self._select_step(batch)
        self._params, self._opt_state, self._baseline, logs = step(
            self._params, self._opt_state, self._baseline, self.next_rng(),
            batch, self._prior_params,
        )
        return logs

    def after_validation(self, val_metrics: Dict[str, Any], iteration=None) -> None:
        val_metrics["metric"] = val_metrics["program_generator"]["sequence_accuracy"]
        super().after_validation(val_metrics, iteration)

    @property
    def prior_params(self):
        return self._prior_params

    def model_specs(self):
        return {"program_generator": self.pg_spec,
                "question_reconstructor": self.qr_spec}
