r"""
Evaluator for the ``module_training`` phase
(reference ``probnmn/evaluators/module_training_evaluator.py``): constructs its own
frozen ProgramGenerator from the question-coding checkpoint (:74-79), decodes
programs teacher-forced/greedy against GT programs, executes the NMN, and
accumulates answer accuracy + average invalid programs.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from probnmn_tpu.config import Config
from probnmn_tpu.data.datasets import ModuleTrainingDataset
from probnmn_tpu.data.pipeline import EpochIterator, image_to_nhwc
from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.evaluators._evaluator import _Evaluator, eval_sharding
from probnmn_tpu.models import nmn as nmn_lib
from probnmn_tpu.models import program_generator
from probnmn_tpu.models.seq2seq import seq2seq_forward
from probnmn_tpu.utils.checkpointing import load_objects_flexible
from probnmn_tpu.utils.metrics import Average, BooleanAccuracy


class ModuleTrainingEvaluator(_Evaluator):
    r"""``program_decode`` selects how programs are decoded for the NMN:
    ``"tf_greedy"`` (default) is the reference's evaluator semantics — per-step
    argmax under teacher forcing against the GT program (reference
    ``module_training_evaluator.py:103-105`` passes ``batch["program"]`` with
    ``decoding_strategy="greedy"``); ``"free_greedy"`` decodes free-running
    greedy from the question alone — the actual inference condition
    (``scripts/inference.py``), reported as a separate metric column so model
    quality is separable from decode assistance."""

    def __init__(self, config: Config, trainer, in_memory_features: bool = True,
                 program_decode: str = "tf_greedy"):
        if program_decode not in ("tf_greedy", "free_greedy"):
            raise ValueError(f"unknown program_decode: {program_decode!r}")
        self._free_decode = program_decode == "free_greedy"
        dataset = ModuleTrainingDataset(
            config.DATA.VAL_TOKENS, config.DATA.VAL_FEATURES, in_memory=in_memory_features
        )
        super().__init__(
            config, trainer, EpochIterator(dataset, config.OPTIM.BATCH_SIZE,
                          sharding=eval_sharding(trainer))
        )
        vocabulary = Vocabulary.from_files(config.DATA.VOCABULARY)
        self._pg_spec = program_generator.make_spec(vocabulary, config)
        pg_template = program_generator.init_params(jax.random.PRNGKey(0), self._pg_spec)
        restored, _, _ = load_objects_flexible(
            config.CHECKPOINTS.QUESTION_CODING, {"program_generator": pg_template},
            specs={"program_generator": self._pg_spec}, vocabulary=vocabulary,
        )
        self._pg_params = jax.device_put(restored["program_generator"])
        self._nmn_spec = trainer.nmn_spec

        self._answer_accuracy = BooleanAccuracy()
        self._average_invalid = Average()

        # On TPU, validation runs through the fused Pallas interpreter; the
        # banks are rebuilt from the live parameters at the start of each
        # evaluate() call, while the jitted step stays cached (all-array args).
        # Pallas path needs a large-VMEM TPU (v4+) + lane-aligned module
        # channels (see ops.common.tpu_fused_kernels_supported).
        from probnmn_tpu.ops.common import tpu_fused_kernels_supported

        self._use_fast = (
            tpu_fused_kernels_supported()
            and self._nmn_spec.module_channels % 128 == 0
        )
        self._fast_tables = None

        free = self._free_decode

        def decode_programs(pg_params, batch):
            return seq2seq_forward(
                pg_params, self._pg_spec, batch["question"],
                None if free else batch["program"], "greedy",
            )

        def eval_step(nmn_params, pg_params, batch):
            pg_out = decode_programs(pg_params, batch)
            nmn_out = nmn_lib.nmn_forward(
                nmn_params, self._nmn_spec, image_to_nhwc(batch["image"]),
                pg_out["predictions"], batch["answer"],
            )
            return nmn_out

        self._eval_step = jax.jit(eval_step)

        mesh = getattr(trainer, "mesh", None)

        def fast_step(banks, tables, stem_p, cls_p, pg_params, batch):
            pg_out = decode_programs(pg_params, batch)
            return nmn_lib.fast_forward_from_tables(
                banks, tables, self._nmn_spec, stem_p, cls_p,
                image_to_nhwc(batch["image"]), pg_out["predictions"], batch["answer"],
                mesh=mesh,
            )

        self._fast_step = jax.jit(fast_step)

    def _begin(self) -> None:
        if self._use_fast:
            from probnmn_tpu.ops.pallas.nmn_interpreter import build_kernel_tables

            nmn_params = self._trainer.params["nmn"]
            self._fast_tables = build_kernel_tables(nmn_params, self._nmn_spec)

    def _do_iteration(self, batch: Dict[str, Any]) -> None:
        nmn_params = self._trainer.params["nmn"]
        if self._use_fast:
            banks, tables = self._fast_tables
            out = self._fast_step(
                banks, tables, nmn_params["stem"], nmn_params["classifier"],
                self._pg_params, batch,
            )
        else:
            out = self._eval_step(nmn_params, self._pg_params, batch)
        self._answer_accuracy(np.asarray(out["predictions"]), np.asarray(batch["answer"]))
        self._average_invalid(float(np.asarray(out["invalid"]).sum()))

    def _collect(self) -> Dict[str, Any]:
        return {
            "nmn": {
                "answer_accuracy": self._answer_accuracy.get_metric(reset=True),
                "average_invalid": self._average_invalid.get_metric(reset=True),
            }
        }
