"""NMN register machine vs an independent per-example torch interpreter fixture.

The fixture replays the reference's dynamic execution model (reversed prefix order,
single-slot register scheme, try/except invalid handling — SURVEY.md §2.6) with
torch modules whose weights are ported from our parameter banks. Programs cover
every module kind plus the invalid-program paths.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from probnmn_tpu.data.vocabulary import SPECIAL_TOKENS, Vocabulary
from probnmn_tpu.models import nmn

PROGRAM_TOKENS = SPECIAL_TOKENS + [
    "scene", "unique", "intersect", "union",
    "equal_color", "less_than", "count", "exist", "query_shape",
    "relate[left]", "same_size", "filter_color[red]", "filter_shape[cube]",
]


@pytest.fixture(scope="module")
def setup():
    vocab = Vocabulary(
        {
            "questions": SPECIAL_TOKENS + ["w"],
            "programs": PROGRAM_TOKENS,
            "answers": [f"a{i}" for i in range(5)] + ["@@UNKNOWN@@"],
        }
    )
    spec = nmn.make_spec(vocab)
    # Tiny geometry keeps the torch fixture fast.
    spec.feature_channels = 12
    spec.height = spec.width = 6
    spec.module_channels = 8
    spec.class_projection_channels = 16
    spec.classifier_linear_size = 10
    params = nmn.init_nmn_params(jax.random.PRNGKey(0), spec)
    return vocab, spec, params


def t(x):
    return torch.tensor(np.asarray(x))


def conv_from_bank(bank, slot, ksize):
    w, b = np.asarray(bank["w"])[slot], np.asarray(bank["b"])[slot]
    if ksize == 1 and w.ndim == 2:
        wt = torch.tensor(w.T[:, :, None, None])  # (Cin,Cout)->(Cout,Cin,1,1)
    else:
        wt = torch.tensor(w.transpose(3, 2, 0, 1))  # HWIO->OIHW
    return wt, torch.tensor(b)


class TorchInterpreter:
    """Reference-semantics interpreter: per-example, dynamic shapes, NCHW."""

    def __init__(self, params, spec, vocab):
        self.p, self.spec, self.vocab = params, spec, vocab

    def conv(self, x, bank, slot, ksize, dilation=1):
        w, b = conv_from_bank(bank, slot, ksize)
        pad = dilation if ksize == 3 else 0
        return F.conv2d(x, w, b, padding=pad, dilation=dilation)

    def stem(self, feats):
        s = self.p["stem"]
        w1 = t(s["w1"]).permute(3, 2, 0, 1)
        w2 = t(s["w2"]).permute(3, 2, 0, 1)
        x = F.relu(F.conv2d(feats, w1, t(s["b1"]), padding=1))
        return F.relu(F.conv2d(x, w2, t(s["b2"]), padding=1))

    def classifier(self, x):
        c = self.p["classifier"]
        w = t(c["proj_w"]).T[:, :, None, None]
        x = F.relu(F.conv2d(x, w, t(c["proj_b"])))
        x = F.max_pool2d(x, 2, 2)
        x = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)  # NHWC flatten, as ours
        x = F.relu(x @ t(c["lin1"]["w"]).T + t(c["lin1"]["b"]))
        return x @ t(c["lin2"]["w"]).T + t(c["lin2"]["b"])

    def run_module(self, token, feats, output, saved):
        p, dim = self.p, self.spec.module_channels
        kind = nmn.classify_token(token)
        slot = int(self.spec.token_bank[self.vocab.get_token_index(token, "programs")])
        if kind == nmn.AND:
            return torch.min(output, saved)
        if kind == nmn.OR:
            return torch.max(output, saved)
        if kind == nmn.ATTENTION:
            x = torch.mul(feats, output.repeat(1, dim, 1, 1))
            x = F.relu(self.conv(x, p["attention"]["conv1"], slot, 3))
            x = F.relu(self.conv(x, p["attention"]["conv2"], slot, 3))
            return torch.sigmoid(self.conv(x, p["attention"]["conv3"], slot, 1))
        if kind == nmn.QUERY:
            x = torch.mul(feats, output.repeat(1, dim, 1, 1))
            x = F.relu(self.conv(x, p["query"]["conv1"], slot, 3))
            return F.relu(self.conv(x, p["query"]["conv2"], slot, 3))
        if kind == nmn.RELATE:
            x = torch.mul(feats, output.repeat(1, dim, 1, 1))
            for i, d in enumerate((1, 2, 4, 8, 1), start=1):
                x = F.relu(self.conv(x, p["relate"][f"conv{i}"], slot, 3, dilation=d))
            return torch.sigmoid(self.conv(x, p["relate"]["conv6"], slot, 1))
        if kind == nmn.SAME:
            size = output.size(2)
            _, idx = F.max_pool2d(output, size, return_indices=True)
            sel = feats.index_select(2, idx[0, 0, 0, 0] // size)
            sel = sel.index_select(3, idx[0, 0, 0, 0] % size)
            x = torch.mul(feats, sel.repeat(1, 1, size, size))
            x = torch.cat([x, output], dim=1)
            return torch.sigmoid(self.conv(x, p["same"]["conv"], slot, 1))
        if kind == nmn.COMPARE:
            x = torch.cat([output, saved], 1)
            x = F.relu(self.conv(x, p["compare"]["projection"], slot, 1))
            x = F.relu(self.conv(x, p["compare"]["conv1"], slot, 3))
            return F.relu(self.conv(x, p["compare"]["conv2"], slot, 3))
        raise AssertionError(token)

    def forward(self, features, programs, answers):
        feats_all = self.stem(features)
        batch = features.shape[0]
        outs, valid = [], []
        for n in range(batch):
            feat_input = feats_all[n : n + 1]
            output, saved = feat_input, None
            try:
                for i in reversed(programs[n].tolist()):
                    token = self.vocab.get_token_from_index(i, "programs")
                    if token in {"@@PADDING@@", "@start@", "@end@", "@@UNKNOWN@@", "unique"}:
                        continue
                    if token == "scene":
                        saved = output
                        output = torch.ones_like(feat_input)[:, :1]
                        continue
                    if "equal" in token or token in {"intersect", "union", "less_than", "greater_than"}:
                        output = self.run_module(token, feat_input, output, saved)
                    else:
                        output = self.run_module(token, feat_input, output, None)
                if output.size(1) != self.spec.module_channels:
                    raise ValueError("must end in encoding")
                outs.append(output)
                valid.append(1)
            except Exception:
                outs.append(torch.zeros_like(feat_input))
                valid.append(0)
        logits = self.classifier(torch.cat(outs, 0))
        logprobs = F.log_softmax(logits, -1)
        pred_lp, preds = logprobs.max(-1)
        valid = torch.tensor(valid)
        preds[valid == 0] = self.spec.unk_answer_index
        loss = F.cross_entropy(logits, answers, reduction="none")
        loss[valid == 0] = nmn.INVALID_LOSS
        return logits, preds, loss, 1 - valid


def _programs(vocab, rows, length=8):
    out = np.zeros((len(rows), length), np.int64)
    for i, row in enumerate(rows):
        ids = [vocab.get_token_index(tok, "programs") for tok in row]
        out[i, : len(ids)] = ids
    return out


PROGRAM_CASES = [
    # valid: classic unary chains, binary set ops, compare, relate, same
    ["count", "filter_color[red]", "scene"],
    ["equal_color", "query_shape", "filter_color[red]", "scene",
     "query_shape", "filter_shape[cube]", "scene"],
    ["count", "intersect", "filter_color[red]", "scene", "filter_shape[cube]", "scene"],
    ["count", "union", "filter_color[red]", "scene", "filter_shape[cube]", "scene"],
    ["count", "same_size", "filter_color[red]", "scene"],
    ["count", "filter_shape[cube]", "relate[left]", "filter_color[red]", "scene"],
    ["exist", "filter_color[red]", "scene", "unique"],        # noop token inside
    ["@end@", "count", "filter_color[red]", "scene"],         # boundary tokens are noops
    # invalid: unary on features (no scene), ends-in-attention, binary w/o save slot
    ["count", "filter_color[red]"],
    ["filter_color[red]", "scene"],
    ["count", "intersect", "filter_color[red]", "scene"],     # intersect(attn, FEAT-save)
    ["intersect"],
    [],                                                        # all padding -> valid (stem passthrough)
]
EXPECTED_INVALID = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 0]


def test_nmn_matches_torch_reference_interpreter(setup):
    vocab, spec, params = setup
    programs = _programs(vocab, PROGRAM_CASES)
    batch = len(PROGRAM_CASES)
    rs = np.random.RandomState(0)
    features = rs.randn(batch, spec.height, spec.width, spec.feature_channels).astype(np.float32)
    answers = rs.randint(0, spec.num_answers, (batch,))

    out = nmn.nmn_forward(
        params, spec, jnp.asarray(features), jnp.asarray(programs), jnp.asarray(answers)
    )

    interp = TorchInterpreter(params, spec, vocab)
    tlogits, tpreds, tloss, tinvalid = interp.forward(
        torch.tensor(features).permute(0, 3, 1, 2), torch.tensor(programs), torch.tensor(answers)
    )

    np.testing.assert_array_equal(np.asarray(out["invalid"]).astype(int), tinvalid.numpy())
    np.testing.assert_array_equal(np.asarray(out["invalid"]).astype(int), EXPECTED_INVALID)
    np.testing.assert_allclose(np.asarray(out["answer_logits"]), tlogits.numpy(), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["predictions"]), tpreds.numpy())
    np.testing.assert_allclose(np.asarray(out["loss"]), tloss.numpy(), atol=1e-4)


def test_nmn_no_answer_loss_is_neg_max_logprob(setup):
    vocab, spec, params = setup
    programs = _programs(vocab, [["count", "filter_color[red]", "scene"], ["intersect"]])
    rs = np.random.RandomState(1)
    features = jnp.asarray(
        rs.randn(2, spec.height, spec.width, spec.feature_channels).astype(np.float32)
    )
    out = nmn.nmn_forward(params, spec, features, jnp.asarray(programs))
    lp = np.asarray(jax.nn.log_softmax(out["answer_logits"], -1))
    np.testing.assert_allclose(np.asarray(out["loss"])[0], -lp[0].max(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["loss"])[1], nmn.INVALID_LOSS)
    assert int(np.asarray(out["predictions"])[1]) == spec.unk_answer_index


def test_nmn_gradients_flow_to_used_banks(setup):
    vocab, spec, params = setup
    programs = _programs(vocab, [["count", "filter_color[red]", "scene"]])
    rs = np.random.RandomState(2)
    features = jnp.asarray(
        rs.randn(1, spec.height, spec.width, spec.feature_channels).astype(np.float32)
    )
    answers = jnp.asarray([0])

    def loss_fn(p):
        return nmn.nmn_forward(p, spec, features, programs, answers)["loss"].mean()

    grads = jax.grad(loss_fn)(params)
    # query bank slot for "count" must receive gradient; relate bank must not.
    count_slot = spec.token_bank[vocab.get_token_index("count", "programs")]
    gq = np.asarray(grads["query"]["conv1"]["w"])[count_slot]
    assert np.abs(gq).max() > 0
    gr = np.asarray(grads["relate"]["conv1"]["w"])
    assert np.abs(gr).max() == 0
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(grads)[0])).all()


def test_nmn_bfloat16_path(setup):
    """bf16 compute path: identical invalid mask and (argmax) predictions agree
    with f32 on the overwhelming majority of examples."""
    import copy
    vocab, spec, params = setup
    bf_spec = copy.copy(spec)
    bf_spec.compute_dtype = "bfloat16"
    programs = _programs(vocab, PROGRAM_CASES)
    rs = np.random.RandomState(0)
    features = jnp.asarray(
        rs.randn(len(PROGRAM_CASES), spec.height, spec.width, spec.feature_channels).astype(np.float32)
    )
    out32 = nmn.nmn_forward(params, spec, features, jnp.asarray(programs))
    out16 = nmn.nmn_forward(params, bf_spec, features, jnp.asarray(programs))
    np.testing.assert_array_equal(np.asarray(out32["invalid"]), np.asarray(out16["invalid"]))
    assert out16["answer_logits"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out16["answer_logits"]), np.asarray(out32["answer_logits"]),
        atol=0.15,
    )
