"""Unit tests for the evaluation metric accumulators (behavioral spec of the
allennlp metrics the reference relies on — SURVEY.md §2.11)."""
import numpy as np

from probnmn_tpu.data.vocabulary import SPECIAL_TOKENS, Vocabulary
from probnmn_tpu.utils.metrics import (
    Average,
    BleuScore,
    BooleanAccuracy,
    SemanticQuestionReconstructionAccuracy,
    SequenceAccuracy,
    UnigramRecall,
)


def test_average_and_boolean_accuracy():
    avg = Average()
    for v in (1.0, 2.0, 3.0):
        avg(v)
    assert avg.get_metric(reset=True) == 2.0
    assert avg.get_metric() == 0.0  # reset happened

    acc = BooleanAccuracy()
    acc(np.array([1, 2, 3]), np.array([1, 0, 3]))
    acc(np.array([5]), np.array([5]))
    assert acc.get_metric() == 3 / 4


def test_sequence_accuracy_masked_and_beams():
    m = SequenceAccuracy()
    preds = np.array([[[1, 2, 9]], [[1, 2, 3]]])  # (B, 1 beam, T)
    gold = np.array([[1, 2, 4], [1, 2, 3]])
    mask = np.array([[1, 1, 0], [1, 1, 1]])  # first row: position 2 masked out
    m(preds, gold, mask)
    assert m.get_metric() == 1.0  # both match on masked positions


def test_unigram_recall_and_wer():
    m = UnigramRecall()
    preds = np.array([[[5, 6, 0]]])
    gold = np.array([[5, 7, 0]])
    m(preds, gold)
    assert abs(m.get_metric() - 0.5) < 1e-9  # 5 found, 7 missing, pads ignored


def test_bleu_perfect_and_partial():
    m = BleuScore(exclude_indices=(0, 2, 3))
    seq = np.array([[4, 5, 6, 7, 8, 3, 0]])
    m(seq, seq)
    assert abs(m.get_metric()["BLEU"] - 1.0) < 1e-9

    m(np.array([[4, 5, 6, 9, 10]]), np.array([[4, 5, 6, 7, 8]]))
    bleu = m.get_metric()["BLEU"]
    assert 0.0 <= bleu < 1.0


def test_semantic_question_reconstruction_accuracy():
    words = SPECIAL_TOKENS + [
        "the", "ball", "sphere", "is", "to", "left", "of", "cube", "block", "big", "large",
    ]
    vocab = Vocabulary({"questions": words, "programs": SPECIAL_TOKENS, "answers": ["a"]})

    def ids(tokens, length=8):
        out = [vocab.get_token_index(t, "questions") for t in tokens]
        return out + [0] * (length - len(out))

    m = SemanticQuestionReconstructionAccuracy(vocab)
    # "the ball is to the left of the block" vs "the sphere is left of the cube"
    pred = np.array([ids(["the", "ball", "is", "to", "the", "left", "of", "cube"])])
    gold = np.array([ids(["the", "sphere", "is", "to", "the", "left", "of", "block"])])
    # after synonym canonicalization both become: the sphere is <to the> left of cube
    m(pred[:, None, :], gold)
    assert m.get_metric() == 1.0

    m2 = SemanticQuestionReconstructionAccuracy(vocab)
    pred = np.array([ids(["big", "ball"])])
    gold = np.array([ids(["large", "cube"])])
    m2(pred[:, None, :], gold)
    assert m2.get_metric() == 0.0  # big->large matches but ball->sphere != cube
