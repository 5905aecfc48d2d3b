r"""
QuestionReconstructor: seq2seq from program tokens to question tokens
(reference ``probnmn/models/question_reconstructor.py``): source namespace
"programs", target "questions", ``max_decoding_steps = 45`` (maximum question
length in CLEVR v1.0 train split).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax

from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.models.seq2seq import (
    SAMPLING,
    Seq2SeqSpec,
    init_seq2seq_params,
    seq2seq_forward,
)

MAX_DECODING_STEPS = 45


def make_spec(vocabulary: Vocabulary, config=None) -> Seq2SeqSpec:
    kwargs = {}
    if config is not None:
        c = config.QUESTION_RECONSTRUCTOR
        kwargs = dict(
            input_size=c.INPUT_SIZE,
            hidden_size=c.HIDDEN_SIZE,
            num_layers=c.NUM_LAYERS,
            dropout=c.DROPOUT,
        )
    return Seq2SeqSpec(
        source_vocab_size=vocabulary.get_vocab_size("programs"),
        target_vocab_size=vocabulary.get_vocab_size("questions"),
        max_decoding_steps=MAX_DECODING_STEPS,
        **kwargs,
    )


def init_params(key: jax.Array, spec: Seq2SeqSpec) -> Dict[str, Any]:
    return init_seq2seq_params(key, spec)


def forward(
    params: Dict[str, Any],
    spec: Seq2SeqSpec,
    program_tokens: jax.Array,
    question_tokens: Optional[jax.Array] = None,
    decoding_strategy: str = SAMPLING,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    return seq2seq_forward(
        params, spec, program_tokens, question_tokens, decoding_strategy, rng
    )
