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


# --------------------------------------------------------------------------
# allennlp-0.9 pinning (SURVEY.md §2.11). allennlp itself cannot be installed
# in this environment (py3.12, no egress), so the reference implementations
# below are INDEPENDENT ports of allennlp 0.9's algorithms transcribed from
# its published source (allennlp/training/metrics/{bleu,unigram_recall,
# sequence_accuracy}.py) — including the non-obvious behaviors the VERDICT
# flagged as drift-prone: the 1e-13 log-smoothing (zero n-gram matches give a
# tiny NONZERO BLEU), the prediction-longer->BP=1 / zero-length->BP=0 brevity
# rules, allennlp's offset-and-split n-gram enumeration, and unigram recall's
# any-beam membership over mask-multiplied gold. The fuzz drives both through
# batches with empty rows, all-excluded rows, beams, and zero-overlap pairs.


def _allennlp_ngrams(row, n, exclude):
    """allennlp 0.9 BLEU._ngrams: offset loop + non-overlapping chunking."""
    from collections import Counter

    counts = Counter()
    row = list(int(x) for x in row)
    if n > len(row):
        return counts
    for start_position in range(n):
        tail = row[start_position:]
        for i in range(0, len(tail) - n + 1, n):
            ngram = tuple(tail[i : i + n])
            if any(x in exclude for x in ngram):
                continue
            counts[ngram] += 1
    return counts


class _AllennlpBleu:
    def __init__(self, exclude=(0, 2, 3)):
        from collections import Counter

        self.exclude = set(exclude)
        self.weights = (0.25, 0.25, 0.25, 0.25)
        self.matches = Counter()
        self.totals = Counter()
        self.pred_len = 0
        self.gold_len = 0

    def __call__(self, predictions, gold):
        for n, _ in enumerate(self.weights, start=1):
            for p_row, g_row in zip(predictions, gold):
                p_counts = _allennlp_ngrams(p_row, n, self.exclude)
                g_counts = _allennlp_ngrams(g_row, n, self.exclude)
                for ngram, count in p_counts.items():
                    self.matches[n] += min(count, g_counts[ngram])
                    self.totals[n] += count
        self.pred_len += int(sum(int(t) not in self.exclude for row in predictions for t in row))
        self.gold_len += int(sum(int(t) not in self.exclude for row in gold for t in row))

    def get_metric(self):
        import math

        if self.pred_len > self.gold_len:
            bp = 1.0
        elif self.gold_len == 0 or self.pred_len == 0:
            bp = 0.0
        else:
            bp = math.exp(1.0 - self.gold_len / self.pred_len)
        score = sum(
            w * (math.log(self.matches[n] + 1e-13) - math.log(self.totals[n] + 1e-13))
            for n, w in enumerate(self.weights, start=1)
        )
        return bp * math.exp(score)


def _allennlp_unigram_recall(predictions, gold, mask):
    """allennlp 0.9 UnigramRecall.__call__ at the reference's call signature
    (no end_index -> sys.maxsize, i.e. no beam truncation)."""
    correct, count = 0.0, 0
    for i in range(len(gold)):
        masked_gold = [int(g) * int(m) for g, m in zip(gold[i], mask[i])]
        cleaned = [x for x in masked_gold if x != 0]
        retval = 0.0
        for word in cleaned:
            stillsearch = True
            for beam in predictions[i]:
                if stillsearch and word in [int(x) for x in beam]:
                    retval += 1.0 / len(cleaned)
                    stillsearch = False
        correct += retval
        count += 1
    return correct / count if count else 0.0


def _allennlp_sequence_accuracy(predictions, gold, mask):
    """allennlp 0.9 SequenceAccuracy: mask-MULTIPLIED compare, any beam."""
    correct = 0
    for i in range(len(gold)):
        mg = [int(g) * int(m) for g, m in zip(gold[i], mask[i])]
        hit = any(
            [int(p) * int(m) for p, m in zip(beam, mask[i])] == mg
            for beam in predictions[i]
        )
        correct += int(hit)
    return correct / len(gold) if len(gold) else 0.0


def test_bleu_zero_match_smoothing_matches_allennlp():
    """Zero 4-gram (and here zero ANY-gram) overlap: allennlp's 1e-13 smoothing
    yields a specific tiny nonzero BLEU — exactly what we must report."""
    pred = np.array([[4, 5, 6, 7, 8]])
    gold = np.array([[9, 10, 11, 12, 13]])
    ours = BleuScore(exclude_indices=(0, 2, 3))
    ours(pred, gold)
    ref = _AllennlpBleu()
    ref(pred, gold)
    want = ref.get_metric()
    got = ours.get_metric()["BLEU"]
    assert want > 0.0  # smoothed, NOT zero
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_metrics_fuzz_match_allennlp_09():
    """200 random multi-batch accumulations against the independent allennlp-0.9
    ports: BLEU (smoothing, brevity, excluded n-grams), UnigramRecall
    (mask-multiplied gold, any-beam), SequenceAccuracy (beams + masks)."""
    rs = np.random.RandomState(0)
    for trial in range(200):
        V = rs.randint(5, 14)
        T = rs.randint(1, 9)
        B = rs.randint(1, 5)
        K = rs.randint(1, 3)
        n_updates = rs.randint(1, 4)

        bleu_ours = BleuScore(exclude_indices=(0, 2, 3))
        bleu_ref = _AllennlpBleu()
        ur_ours, sa_ours = UnigramRecall(), SequenceAccuracy()
        ur_want_num = sa_want_num = 0.0
        ur_want_den = sa_want_den = 0
        for _ in range(n_updates):
            preds_b = rs.randint(0, V, (B, K, T))
            gold = rs.randint(0, V, (B, T))
            mask = (rs.rand(B, T) < 0.8).astype(np.int64)
            # BLEU is called beamless in the reference (top beam)
            bleu_ours(preds_b[:, 0], gold)
            bleu_ref(preds_b[:, 0], gold)
            ur_ours(preds_b, gold, mask)
            sa_ours(preds_b, gold, mask)
            ur_want_num += _allennlp_unigram_recall(preds_b, gold, mask) * B
            ur_want_den += B
            sa_want_num += _allennlp_sequence_accuracy(preds_b, gold, mask) * B
            sa_want_den += B

        np.testing.assert_allclose(
            bleu_ours.get_metric()["BLEU"], bleu_ref.get_metric(), rtol=1e-9,
            err_msg=f"BLEU trial {trial}",
        )
        np.testing.assert_allclose(
            ur_ours.get_metric(), ur_want_num / ur_want_den, rtol=1e-9,
            err_msg=f"UnigramRecall trial {trial}",
        )
        np.testing.assert_allclose(
            sa_ours.get_metric(), sa_want_num / sa_want_den, rtol=1e-9,
            err_msg=f"SequenceAccuracy trial {trial}",
        )


def test_bleu_canned_allennlp_values():
    """Hand-computed fixtures under allennlp-0.9 semantics."""
    # Case 1: pred shares a trigram; lengths equal -> BP = 1.
    # valid pred tokens: [4,5,6,7]; gold: [4,5,6,9]
    # 1-gram: m=3 t=4; 2-gram: m=2 t=3; 3-gram: m=1 t=2; 4-gram: m=0 t=1
    m = BleuScore(exclude_indices=(0, 2, 3))
    m(np.array([[4, 5, 6, 7]]), np.array([[4, 5, 6, 9]]))
    import math

    want = math.exp(
        0.25 * (math.log(3 + 1e-13) - math.log(4 + 1e-13))
        + 0.25 * (math.log(2 + 1e-13) - math.log(3 + 1e-13))
        + 0.25 * (math.log(1 + 1e-13) - math.log(2 + 1e-13))
        + 0.25 * (math.log(0 + 1e-13) - math.log(1 + 1e-13))
    )
    np.testing.assert_allclose(m.get_metric()["BLEU"], want, rtol=1e-9)

    # Case 2: all prediction tokens excluded -> pred_len 0 -> BP 0 -> BLEU 0.
    m2 = BleuScore(exclude_indices=(0, 2, 3))
    m2(np.array([[0, 2, 3, 0]]), np.array([[4, 5, 6, 7]]))
    assert m2.get_metric()["BLEU"] == 0.0


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
