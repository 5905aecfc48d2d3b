r"""
Evaluator for the ``question_coding`` phase
(reference ``probnmn/evaluators/question_coding_evaluator.py``): teacher-forced
greedy decode of both seq2seq models over the val split, accumulating BLEU,
perplexity (``2**avg CE``), sequence accuracy and word error rate — with the
semantic (synonym-canonicalized) sequence accuracy for the reconstructor
(reference ``question_reconstructor.py:48``).
"""
from __future__ import annotations

import logging
from typing import Any, Dict

import jax
import numpy as np

from probnmn_tpu.config import Config
from probnmn_tpu.data.datasets import QuestionCodingDataset
from probnmn_tpu.data.pipeline import EpochIterator
from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.evaluators._evaluator import _Evaluator, eval_sharding
from probnmn_tpu.models.seq2seq import seq2seq_forward
from probnmn_tpu.utils.metrics import (
    Average,
    BleuScore,
    SemanticQuestionReconstructionAccuracy,
    SequenceAccuracy,
    UnigramRecall,
)

logger = logging.getLogger(__name__)


class _Seq2SeqMetrics:
    r"""The four seq2seq eval metrics the reference records per model
    (``seq2seq_base.py:93-99``, ``343-375``)."""

    def __init__(self, sequence_accuracy):
        self.bleu = BleuScore()
        self.log2_perplexity = Average()
        self.sequence_accuracy = sequence_accuracy
        self.unigram_recall = UnigramRecall()

    def update(self, output: Dict[str, Any]) -> None:
        predictions = np.asarray(output["predictions"])
        relevant_targets = np.asarray(output["relevant_targets"])
        relevant_mask = np.asarray(output["relevant_mask"]).astype(np.int64)
        self.bleu(predictions, relevant_targets)
        self.log2_perplexity(float(np.asarray(output["loss"]).mean()))
        clipped = predictions[:, : relevant_targets.shape[-1]][:, None, :]
        self.sequence_accuracy(clipped, relevant_targets, relevant_mask)
        self.unigram_recall(clipped, relevant_targets, relevant_mask)

    def collect(self) -> Dict[str, float]:
        metrics = self.bleu.get_metric(reset=True)
        metrics.update(
            {
                "perplexity": 2 ** self.log2_perplexity.get_metric(reset=True),
                "sequence_accuracy": self.sequence_accuracy.get_metric(reset=True),
                "word_error_rate": 1 - self.unigram_recall.get_metric(reset=True),
            }
        )
        return metrics


class QuestionCodingEvaluator(_Evaluator):
    def __init__(self, config: Config, trainer):
        dataset = QuestionCodingDataset(config.DATA.VAL_TOKENS)
        super().__init__(
            config, trainer, EpochIterator(dataset, config.OPTIM.BATCH_SIZE,
                          sharding=eval_sharding(trainer))
        )
        self._vocabulary = Vocabulary.from_files(config.DATA.VOCABULARY)
        self._pg_spec = trainer.pg_spec
        self._qr_spec = trainer.qr_spec
        self._pg_metrics = _Seq2SeqMetrics(SequenceAccuracy())
        self._qr_metrics = _Seq2SeqMetrics(
            SemanticQuestionReconstructionAccuracy(self._vocabulary)
        )
        self._pg_forward = jax.jit(
            lambda p, s, t: seq2seq_forward(p, self._pg_spec, s, t, "greedy")
        )
        self._qr_forward = jax.jit(
            lambda p, s, t: seq2seq_forward(p, self._qr_spec, s, t, "greedy")
        )
        self._printed = False

    def _begin(self) -> None:
        self._printed = False

    def _do_iteration(self, batch: Dict[str, Any]) -> None:
        params = self._trainer.params
        pg_out = self._pg_forward(
            params["program_generator"], batch["question"], batch["program"]
        )
        qr_out = self._qr_forward(
            params["question_reconstructor"], batch["program"], batch["question"]
        )
        self._pg_metrics.update(pg_out)
        self._qr_metrics.update(qr_out)

        if not self._printed:
            self._printed = True
            for i in range(min(5, len(np.asarray(batch["program"])))):
                logger.info(
                    "GT program    : %s",
                    self._detok(np.asarray(batch["program"])[i], "programs"),
                )
                logger.info(
                    "Decoded prog  : %s",
                    self._detok(np.asarray(pg_out["predictions"])[i], "programs"),
                )
                logger.info(
                    "GT question   : %s",
                    self._detok(np.asarray(batch["question"])[i], "questions"),
                )
                logger.info(
                    "Reconstruction: %s",
                    self._detok(np.asarray(qr_out["predictions"])[i], "questions"),
                )

    def _detok(self, tokens: np.ndarray, namespace: str) -> str:
        return " ".join(
            self._vocabulary.get_token_from_index(int(t), namespace)
            for t in tokens
            if t != 0
        )

    def _collect(self) -> Dict[str, Any]:
        return {
            "program_generator": self._pg_metrics.collect(),
            "question_reconstructor": self._qr_metrics.collect(),
        }
