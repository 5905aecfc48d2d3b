r"""
Phase 4 trainer: Joint Training — full ELBO with the γ-scaled answer
log-likelihood REINFORCE term (reference ``probnmn/trainers/joint_training_trainer.py``
+ ``probnmn/modules/elbo.py:164-280``).

"ours": loss = γ·nmn_loss − elbo + α(L_PG_sup + L_QR_sup), elbo from the fully
Monte-Carlo bound with reward R = log p(x|z) + β log p(z) − β log q(z|x) + γ log p(a|z,i).
"baseline": reward is the answer log-likelihood only and "elbo" is the
REINFORCE-weighted PG loss (reference ``elbo.py:241-250``). All sub-batch means are
supervision-mask weighted over the fixed-shape batch (see question_coding_trainer).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from probnmn_tpu.config import Config
from probnmn_tpu.data.datasets import JointTrainingDataset
from probnmn_tpu.data.pipeline import BatchIterator
from probnmn_tpu.data.pipeline import image_to_nhwc
from probnmn_tpu.data.samplers import SupervisionWeightedRandomSampler
from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.models import nmn as nmn_lib
from probnmn_tpu.models import program_generator, question_reconstructor
from probnmn_tpu.models.program_prior import init_program_prior_params, program_prior_forward
from probnmn_tpu.models.seq2seq import seq2seq_forward
from probnmn_tpu.modules.elbo import (
    elbo_with_reinforce,
    joint_training_reward,
    masked_mean,
    reinforce,
)
from probnmn_tpu.parallel.mesh import auto_mesh, batch_sharding
from probnmn_tpu.training import _subbatch
from probnmn_tpu.training._trainer import _Trainer
from probnmn_tpu.training.program_prior_trainer import make_prior_spec
from probnmn_tpu.utils.checkpointing import load_objects_flexible


class JointTrainingTrainer(_Trainer):
    def __init__(
        self,
        config: Config,
        serialization_dir: str,
        cpu_workers: int = 0,
        in_memory_features: bool = True,
        num_devices=None,
        model_parallel: int = 1,
    ):
        if config.PHASE != "joint_training":
            raise ValueError(f"Expected PHASE joint_training, found {config.PHASE}")

        vocabulary = Vocabulary.from_files(config.DATA.VOCABULARY)
        dataset = JointTrainingDataset(
            config.DATA.TRAIN_TOKENS,
            config.DATA.TRAIN_FEATURES,
            num_supervision=config.SUPERVISION,
            supervision_question_max_length=config.SUPERVISION_QUESTION_MAX_LENGTH,
            in_memory=in_memory_features,
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
        self.nmn_spec = nmn_lib.make_spec(vocabulary, config)
        key = jax.random.PRNGKey(config.RANDOM_SEED)
        k_pg, k_qr, k_nmn = jax.random.split(key, 3)
        models = {
            "program_generator": program_generator.init_params(k_pg, self.pg_spec),
            "question_reconstructor": question_reconstructor.init_params(k_qr, self.qr_spec),
            "nmn": nmn_lib.init_nmn_params(k_nmn, self.nmn_spec),
        }

        # PG + QR come from the question_coding checkpoint, NMN from module_training
        # (reference joint_training_trainer.py:85-90).
        restored, _, _ = load_objects_flexible(
            config.CHECKPOINTS.QUESTION_CODING,
            {
                "program_generator": models["program_generator"],
                "question_reconstructor": models["question_reconstructor"],
            },
            specs={"program_generator": self.pg_spec,
                   "question_reconstructor": self.qr_spec},
            vocabulary=vocabulary,
        )
        models.update(restored)
        restored, _, _ = load_objects_flexible(
            config.CHECKPOINTS.MODULE_TRAINING, {"nmn": models["nmn"]},
            specs={"nmn": self.nmn_spec}, vocabulary=vocabulary,
        )
        models.update(restored)

        super().__init__(config, batches, models, serialization_dir, mesh=mesh)
        self._vocabulary = vocabulary

        # Frozen prior (reference :109-114).
        self.prior_spec = make_prior_spec(config, vocabulary)
        prior_template = init_program_prior_params(jax.random.PRNGKey(0), self.prior_spec)
        restored, _, _ = load_objects_flexible(
            config.CHECKPOINTS.PROGRAM_PRIOR, {"program_prior": prior_template},
            specs={"program_prior": self.prior_spec}, vocabulary=vocabulary,
        )
        self._prior_params = self._replicate(restored["program_prior"])

        # Static supervised/unsupervised windows over the sorted batch
        # (training/_subbatch.py): each pass runs only on its subset, like the
        # reference's dynamic split (joint_training_trainer.py:131-132).
        self._sub_cap = _subbatch.subbatch_cap(config.OPTIM.BATCH_SIZE, mesh)
        self._train_step = self._build_step_fn(self._sub_cap)
        self._train_step_full = (
            self._train_step if self._sub_cap is None else None
        )  # full-batch fallback, compiled only if a batch overflows the window

    def _build_step_fn(self, cap=None):
        pg_spec, qr_spec, nmn_spec, prior_spec = (
            self.pg_spec, self.qr_spec, self.nmn_spec, self.prior_spec,
        )
        tx = self._tx
        alpha, beta, gamma, delta = self._C.ALPHA, self._C.BETA, self._C.GAMMA, self._C.DELTA
        objective = self._C.OBJECTIVE
        # Fused-Pallas differentiable interpreter on TPU (custom-VJP backward
        # kernel); XLA register machine elsewhere — identical semantics/grads.
        # On a mesh the fused interpreter runs per-device on its batch shard
        # via shard_map (Pallas calls cannot auto-partition under GSPMD).
        if nmn_lib.fast_training_available(nmn_spec):
            from functools import partial

            nmn_forward = partial(nmn_lib.nmn_forward_fast, mesh=self._mesh)
        else:
            nmn_forward = nmn_lib.nmn_forward
        # Fused Pallas seq2seq fwd+bwd on TPU (see question_coding_trainer for
        # the rationale); on a mesh each per-example kernel runs per-device on
        # its batch shard via shard_map.
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
            # (no-ops when cap is None): the whole unsupervised side — sampling,
            # reconstruction, prior, NMN — runs on the tail window, the
            # supervised teacher-forced passes on the head window, masks applied
            # inside each window — exactly the reference's per-subset passes
            # (reference joint_training_trainer.py:131-132) with static shapes.
            q_sup = _subbatch.head(batch["question"], cap)
            prog_sup = _subbatch.head(batch["program"], cap)
            sup_w = _subbatch.head(sup, cap)
            q_unsup = _subbatch.tail(batch["question"], cap)
            image_unsup = _subbatch.tail(batch["image"], cap)
            answer_unsup = _subbatch.tail(batch["answer"], cap)
            unsup_w = _subbatch.tail(1.0 - sup, cap)

            def loss_fn(p):
                # --- unsupervised subset: sample z, reconstruct x, answer via NMN ---
                if use_fused:
                    from probnmn_tpu.ops.pallas.seq2seq_decode import (
                        fused_sampling_forward,
                        fused_sampling_forward_dp,
                    )

                    pg_frozen = jax.lax.stop_gradient(p["program_generator"])
                    if mesh is not None:
                        z = fused_sampling_forward_dp(
                            mesh, pg_frozen, pg_spec, q_unsup, keys[0]
                        )
                    else:
                        z = fused_sampling_forward(
                            pg_frozen, pg_spec, q_unsup, keys[0]
                        )["predictions"]
                    pg_free = {"loss": tf_loss(
                        p["program_generator"], pg_spec, q_unsup, z, True,
                    ), "predictions": z}
                    qr_rec = {"loss": tf_loss(
                        p["question_reconstructor"], qr_spec, z, q_unsup,
                    )}
                else:
                    pg_free = seq2seq_forward(
                        p["program_generator"], pg_spec,
                        q_unsup, None, "sampling", keys[0], train=True,
                    )
                    z = pg_free["predictions"]
                    qr_rec = seq2seq_forward(
                        p["question_reconstructor"], qr_spec,
                        z, q_unsup, "sampling", keys[1], train=True,
                    )
                nmn_out = nmn_forward(
                    p["nmn"], nmn_spec, image_to_nhwc(image_unsup), z, answer_unsup
                )
                nmn_loss = masked_mean(nmn_out["loss"], unsup_w)

                logprobs_generation = -pg_free["loss"]
                logprobs_answering = -nmn_out["loss"]

                if objective == "baseline":
                    reinforce_term, new_baseline = reinforce(
                        pg_free["loss"], logprobs_answering, baseline, delta,
                        mask=unsup_w,
                    )
                    elbo = masked_mean(reinforce_term, unsup_w)
                    logs = {
                        "loss": {"nmn": nmn_loss},
                        "elbo": {
                            "elbo": elbo,
                            "reinforce_reward": masked_mean(
                                logprobs_answering, unsup_w
                            ),
                        },
                    }
                    total = gamma * nmn_loss - elbo
                    return total, (new_baseline, logs)

                logprobs_reconstruction = -qr_rec["loss"]
                if use_fused:
                    # Frozen prior: fused LM forward (rng-independent loss).
                    prior_out = {"loss": lm_loss(prior_params, prior_spec, z)}
                else:
                    prior_out = program_prior_forward(
                        prior_params, prior_spec, z, keys[2]
                    )
                logprobs_prior = -prior_out["loss"]
                reward = joint_training_reward(
                    logprobs_reconstruction, logprobs_generation, logprobs_prior,
                    logprobs_answering, beta, gamma,
                )
                diagnostics, new_baseline = elbo_with_reinforce(
                    logprobs_generation, logprobs_reconstruction, reward,
                    baseline, beta, delta, mask=unsup_w,
                )
                elbo = diagnostics.pop("elbo")
                diagnostics.pop("elbo_per_example")

                # --- supervised subset: teacher-forced PG/QR (reference :154-177) ---
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
                        q_sup, prog_sup, "sampling", keys[3], train=True,
                    )
                    qr_sup = seq2seq_forward(
                        p["question_reconstructor"], qr_spec,
                        prog_sup, q_sup, "sampling", keys[4], train=True,
                    )
                pg_loss_sup = masked_mean(pg_sup["loss"], sup_w)
                qr_loss_sup = masked_mean(qr_sup["loss"], sup_w)

                logs = {
                    "loss": {
                        "nmn": nmn_loss,
                        "question_reconstruction_gt": qr_loss_sup,
                        "program_generation_gt": pg_loss_sup,
                    },
                    "elbo": dict(diagnostics, elbo=elbo),
                }
                total = (
                    gamma * nmn_loss - elbo + alpha * (pg_loss_sup + qr_loss_sup)
                )
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
        val_metrics["metric"] = val_metrics["nmn"]["answer_accuracy"]
        super().after_validation(val_metrics, iteration)

    @property
    def prior_params(self):
        return self._prior_params

    def model_specs(self):
        return {"program_generator": self.pg_spec,
                "question_reconstructor": self.qr_spec,
                "nmn": self.nmn_spec}
