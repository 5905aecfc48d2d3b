r"""
Evaluator for the ``program_prior`` phase
(reference ``probnmn/evaluators/program_prior_evaluator.py``): accumulates
perplexity ``2 ** avg(CE)`` over the val split and pretty-prints a few sampled
program continuations.
"""
from __future__ import annotations

import logging
from typing import Any, Dict

import jax
import numpy as np

from probnmn_tpu.config import Config
from probnmn_tpu.data.datasets import ProgramPriorDataset
from probnmn_tpu.data.pipeline import EpochIterator
from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.evaluators._evaluator import _Evaluator, eval_sharding
from probnmn_tpu.models.program_prior import program_prior_forward
from probnmn_tpu.utils.metrics import Average

logger = logging.getLogger(__name__)


class ProgramPriorEvaluator(_Evaluator):
    def __init__(self, config: Config, trainer):
        dataset = ProgramPriorDataset(config.DATA.VAL_TOKENS)
        super().__init__(
            config, trainer, EpochIterator(dataset, config.OPTIM.BATCH_SIZE,
                          sharding=eval_sharding(trainer))
        )
        self._vocabulary = Vocabulary.from_files(config.DATA.VOCABULARY)
        self._spec = trainer.spec
        self._log2_perplexity = Average()
        self._forward = jax.jit(
            lambda p, t, r: program_prior_forward(p, self._spec, t, r)
        )
        self._rng = jax.random.PRNGKey(config.RANDOM_SEED + 1)
        self._printed = False

    def _begin(self) -> None:
        self._printed = False

    def _do_iteration(self, batch: Dict[str, Any]) -> None:
        self._rng, sub = jax.random.split(self._rng)
        out = self._forward(self._trainer.params["program_prior"], batch["program"], sub)
        self._log2_perplexity(float(out["loss"].mean()))

        if not self._printed:
            self._printed = True
            programs = np.asarray(batch["program"])[:5]
            predictions = np.asarray(out["predictions"])[:5]
            for gt, pred in zip(programs, predictions):
                logger.info("GT   : %s", self._detokenize(gt))
                logger.info("Pred : %s", self._detokenize(pred))

    def _detokenize(self, tokens: np.ndarray) -> str:
        words = [
            self._vocabulary.get_token_from_index(int(t), "programs")
            for t in tokens
            if t != 0
        ]
        return " ".join(words)

    def _collect(self) -> Dict[str, Any]:
        return {
            "program_prior": {
                "perplexity": 2 ** self._log2_perplexity.get_metric(reset=True)
            }
        }
