r"""
ProgramGenerator: seq2seq from question tokens to program tokens
(reference ``probnmn/models/program_generator.py``): a ``Seq2SeqSpec`` with
source namespace "questions", target "programs", and ``max_decoding_steps = 26``
(maximum program length in CLEVR v1.0 train split).
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

MAX_DECODING_STEPS = 26


def make_spec(vocabulary: Vocabulary, config=None) -> Seq2SeqSpec:
    kwargs = {}
    if config is not None:
        c = config.PROGRAM_GENERATOR
        kwargs = dict(
            input_size=c.INPUT_SIZE,
            hidden_size=c.HIDDEN_SIZE,
            num_layers=c.NUM_LAYERS,
            dropout=c.DROPOUT,
        )
    return Seq2SeqSpec(
        source_vocab_size=vocabulary.get_vocab_size("questions"),
        target_vocab_size=vocabulary.get_vocab_size("programs"),
        max_decoding_steps=MAX_DECODING_STEPS,
        **kwargs,
    )


def init_params(key: jax.Array, spec: Seq2SeqSpec) -> Dict[str, Any]:
    return init_seq2seq_params(key, spec)


def forward(
    params: Dict[str, Any],
    spec: Seq2SeqSpec,
    question_tokens: jax.Array,
    program_tokens: Optional[jax.Array] = None,
    decoding_strategy: str = SAMPLING,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    return seq2seq_forward(
        params, spec, question_tokens, program_tokens, decoding_strategy, rng
    )
