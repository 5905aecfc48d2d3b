r"""
Evaluator for the ``joint_training`` phase
(reference ``probnmn/evaluators/joint_training_evaluator.py``): uses the trainer's
ProgramGenerator and NMN; accumulates the PG's seq2seq metrics (teacher-forced
greedy against GT programs) and the NMN's answer accuracy / invalid count.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from probnmn_tpu.config import Config
from probnmn_tpu.data.datasets import JointTrainingDataset
from probnmn_tpu.data.pipeline import EpochIterator, image_to_nhwc
from probnmn_tpu.evaluators._evaluator import _Evaluator, eval_sharding
from probnmn_tpu.models import nmn as nmn_lib
from probnmn_tpu.models.seq2seq import seq2seq_forward
from probnmn_tpu.utils.metrics import Average, BooleanAccuracy, SequenceAccuracy
from probnmn_tpu.evaluators.question_coding_evaluator import _Seq2SeqMetrics


class JointTrainingEvaluator(_Evaluator):
    r"""``program_decode="tf_greedy"`` (default) matches the reference's
    evaluator (per-step argmax under teacher forcing,
    reference ``joint_training_evaluator.py:98-100``); ``"free_greedy"``
    additionally decodes programs free-running greedy from the question alone
    (the inference condition) and feeds THOSE to the NMN — the PG's seq2seq
    metrics stay teacher-forced either way so they remain comparable."""

    def __init__(self, config: Config, trainer, in_memory_features: bool = True,
                 program_decode: str = "tf_greedy"):
        if program_decode not in ("tf_greedy", "free_greedy"):
            raise ValueError(f"unknown program_decode: {program_decode!r}")
        self._free_decode = program_decode == "free_greedy"
        dataset = JointTrainingDataset(
            config.DATA.VAL_TOKENS,
            config.DATA.VAL_FEATURES,
            in_memory=in_memory_features,
        )
        super().__init__(
            config, trainer, EpochIterator(dataset, config.OPTIM.BATCH_SIZE,
                          sharding=eval_sharding(trainer))
        )
        self._pg_spec = trainer.pg_spec
        self._nmn_spec = trainer.nmn_spec
        self._pg_metrics = _Seq2SeqMetrics(SequenceAccuracy())
        self._answer_accuracy = BooleanAccuracy()
        self._average_invalid = Average()

        # Pallas path needs a large-VMEM TPU (v4+) + lane-aligned module
        # channels (see ops.common.tpu_fused_kernels_supported).
        from probnmn_tpu.ops.common import tpu_fused_kernels_supported

        self._use_fast = (
            tpu_fused_kernels_supported()
            and self._nmn_spec.module_channels % 128 == 0
        )
        self._fast_tables = None

        free = self._free_decode

        def nmn_programs(pg_params, batch, pg_out):
            if not free:
                return pg_out["predictions"]
            return seq2seq_forward(
                pg_params, self._pg_spec, batch["question"], None, "greedy"
            )["predictions"]

        def eval_step(params, batch):
            pg_out = seq2seq_forward(
                params["program_generator"], self._pg_spec,
                batch["question"], batch["program"], "greedy",
            )
            nmn_out = nmn_lib.nmn_forward(
                params["nmn"], self._nmn_spec, image_to_nhwc(batch["image"]),
                nmn_programs(params["program_generator"], batch, pg_out),
                batch["answer"],
            )
            return pg_out, nmn_out

        self._eval_step = jax.jit(eval_step)

        mesh = getattr(trainer, "mesh", None)

        def fast_step(banks, tables, stem_p, cls_p, pg_params, batch):
            pg_out = seq2seq_forward(
                pg_params, self._pg_spec, batch["question"], batch["program"], "greedy"
            )
            nmn_out = nmn_lib.fast_forward_from_tables(
                banks, tables, self._nmn_spec, stem_p, cls_p,
                image_to_nhwc(batch["image"]),
                nmn_programs(pg_params, batch, pg_out), batch["answer"],
                mesh=mesh,
            )
            return pg_out, nmn_out

        self._fast_step = jax.jit(fast_step)

    def _begin(self) -> None:
        if self._use_fast:
            from probnmn_tpu.ops.pallas.nmn_interpreter import build_kernel_tables

            self._fast_tables = build_kernel_tables(
                self._trainer.params["nmn"], self._nmn_spec
            )

    def _do_iteration(self, batch: Dict[str, Any]) -> None:
        params = self._trainer.params
        if self._use_fast:
            banks, tables = self._fast_tables
            pg_out, nmn_out = self._fast_step(
                banks, tables, params["nmn"]["stem"], params["nmn"]["classifier"],
                params["program_generator"], batch,
            )
        else:
            pg_out, nmn_out = self._eval_step(params, batch)
        self._pg_metrics.update(pg_out)
        self._answer_accuracy(
            np.asarray(nmn_out["predictions"]), np.asarray(batch["answer"])
        )
        self._average_invalid(float(np.asarray(nmn_out["invalid"]).sum()))

    def _collect(self) -> Dict[str, Any]:
        return {
            "program_generator": self._pg_metrics.collect(),
            "question_reconstructor": {},
            "nmn": {
                "answer_accuracy": self._answer_accuracy.get_metric(reset=True),
                "average_invalid": self._average_invalid.get_metric(reset=True),
            },
        }
