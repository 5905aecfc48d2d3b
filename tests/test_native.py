"""Native C++ tokenizer vs the pure-Python preprocessing implementations."""
import numpy as np
import pytest

from probnmn_tpu.data import native, preprocessing
from probnmn_tpu.data.vocabulary import SPECIAL_TOKENS, Vocabulary

QUESTIONS = [
    "How many red cubes are there?",
    "Is the big sphere; to the left of the cube, shiny?",
    "What color is it.",
    "weird-token question with OOVWORD?",
]


@pytest.fixture(scope="module")
def vocab():
    words = set()
    for q in QUESTIONS:
        words |= set(preprocessing.tokenize_question(q))
    words.discard("OOVWORD")
    return Vocabulary(
        {
            "questions": SPECIAL_TOKENS + sorted(words),
            "programs": SPECIAL_TOKENS + ["scene", "count", "exist",
                                          "filter_color[red]", "intersect"],
            "answers": ["a", "@@UNKNOWN@@"],
        }
    )


def test_native_library_builds(vocab):
    assert native.get_library() is not None, "g++ toolchain expected in this image"


def test_native_question_tokenization_matches_python(vocab):
    tokenizer = native.NativeTokenizer(vocab, "questions")
    assert tokenizer.native
    ids, lengths = tokenizer.tokenize_questions(QUESTIONS, max_len=20)
    for i, question in enumerate(QUESTIONS):
        expected_tokens = preprocessing.tokenize_question(question)
        expected = [vocab.get_token_index(t, "questions") for t in expected_tokens]
        assert lengths[i] == len(expected)
        np.testing.assert_array_equal(ids[i, : len(expected)], expected)
        assert (ids[i, len(expected):] == 0).all()
    # OOV maps to @@UNKNOWN@@
    assert 1 in ids[3]


def test_native_program_prefix_matches_python(vocab):
    program = [
        {"function": "scene", "inputs": [], "value_inputs": []},
        {"function": "filter_color", "inputs": [0], "value_inputs": ["red"]},
        {"function": "scene", "inputs": [], "value_inputs": []},
        {"function": "filter_color", "inputs": [2], "value_inputs": ["red"]},
        {"function": "intersect", "inputs": [1, 3], "value_inputs": []},
        {"function": "count", "inputs": [4], "value_inputs": []},
    ]
    expected_tokens = preprocessing.tokenize_program(program)
    expected = [vocab.get_token_index(t, "programs") for t in expected_tokens]
    got = native.program_prefix_ids(program, vocab)
    np.testing.assert_array_equal(got, expected)
