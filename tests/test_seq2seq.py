"""Behavioral and torch-parity tests for the seq2seq stack and the program prior.

The torch models below are small re-derivations of the semantics the reference
gets from allennlp 0.9's SimpleSeq2Seq (documented in SURVEY.md §2.4): decoder
hidden initialized from the final encoder state, zero-initialized context, masked
dot-product attention with the previous decoder hidden, single LSTMCell over
concat(attended, embedded), linear projection. They serve as independent fixtures
to pin down our lax.scan implementation.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from probnmn_tpu.models.seq2seq import (
    Seq2SeqSpec,
    init_seq2seq_params,
    seq2seq_forward,
)
from probnmn_tpu.models.program_prior import (
    ProgramPriorSpec,
    init_program_prior_params,
    program_prior_forward,
    program_prior_sample,
)

PAD, UNK, START, END = 0, 1, 2, 3


def _spec():
    return Seq2SeqSpec(
        source_vocab_size=13,
        target_vocab_size=11,
        input_size=8,
        hidden_size=10,
        num_layers=2,
        max_decoding_steps=7,
    )


class TorchSeq2Seq(torch.nn.Module):
    """Semantics fixture: allennlp-SimpleSeq2Seq-style decode, built from spec."""

    def __init__(self, params, spec):
        super().__init__()
        self.spec = spec
        self.src_emb = torch.tensor(np.asarray(params["source_embedding"]))
        self.tgt_emb = torch.tensor(np.asarray(params["target_embedding"]))
        self.encoder = torch.nn.LSTM(
            spec.input_size, spec.hidden_size, spec.num_layers, batch_first=True
        )
        sd = {}
        for layer, p in enumerate(params["encoder"]):
            sd[f"weight_ih_l{layer}"] = torch.tensor(np.asarray(p["w_ih"]))
            sd[f"weight_hh_l{layer}"] = torch.tensor(np.asarray(p["w_hh"]))
            sd[f"bias_ih_l{layer}"] = torch.tensor(np.asarray(p["b_ih"]))
            sd[f"bias_hh_l{layer}"] = torch.tensor(np.asarray(p["b_hh"]))
        self.encoder.load_state_dict(sd)
        self.cell = torch.nn.LSTMCell(
            spec.hidden_size + spec.input_size, spec.hidden_size
        )
        self.cell.load_state_dict(
            {
                "weight_ih": torch.tensor(np.asarray(params["decoder_cell"]["w_ih"])),
                "weight_hh": torch.tensor(np.asarray(params["decoder_cell"]["w_hh"])),
                "bias_ih": torch.tensor(np.asarray(params["decoder_cell"]["b_ih"])),
                "bias_hh": torch.tensor(np.asarray(params["decoder_cell"]["b_hh"])),
            }
        )
        self.proj_w = torch.tensor(np.asarray(params["output_projection"]["w"]))
        self.proj_b = torch.tensor(np.asarray(params["output_projection"]["b"]))

    @staticmethod
    def _add_boundary(tokens):
        out = []
        max_len = tokens.shape[1] + 2
        for row in tokens.tolist():
            row = [t for t in row if t != PAD]
            row = [START] + row + [END]
            row = row + [PAD] * (max_len - len(row))
            out.append(row)
        return torch.tensor(out)

    def forward(self, source_tokens, target_tokens):
        source = self._add_boundary(source_tokens)[:, 1:]
        mask = source != PAD
        lengths = mask.sum(1)
        emb = self.src_emb[source] * mask.unsqueeze(-1)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            emb, lengths, batch_first=True, enforce_sorted=False
        )
        enc_out, (hn, _) = self.encoder(packed)
        enc_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            enc_out, batch_first=True, total_length=source.shape[1]
        )
        h = hn[-1]
        c = torch.zeros_like(h)

        targets = self._add_boundary(target_tokens)
        num_steps = targets.shape[1] - 1
        logits_all = []
        for t in range(num_steps):
            token = targets[:, t]
            emb_t = self.tgt_emb[token]
            scores = torch.einsum("bsh,bh->bs", enc_out, h)
            scores = scores.masked_fill(~mask, -1e9)
            att = torch.softmax(scores, -1)
            attended = torch.einsum("bs,bsh->bh", att, enc_out)
            h, c = self.cell(torch.cat([attended, emb_t], -1), (h, c))
            logits_all.append(h @ self.proj_w.T + self.proj_b)
        logits = torch.stack(logits_all, 1)
        # per-example masked mean CE over shifted targets
        rel_t = targets[:, 1:]
        rel_m = (rel_t != PAD).float()
        lp = torch.log_softmax(logits, -1)
        nll = -lp.gather(-1, rel_t.unsqueeze(-1)).squeeze(-1)
        loss = (nll * rel_m).sum(-1) / (rel_m.sum(-1) + 1e-13)
        return logits, loss


def test_teacher_forced_matches_torch_fixture():
    spec = _spec()
    params = init_seq2seq_params(jax.random.PRNGKey(0), spec)
    rs = np.random.RandomState(0)
    src = np.zeros((3, 5), np.int32)
    tgt = np.zeros((3, 4), np.int32)
    for i, L in enumerate([5, 3, 1]):
        src[i, :L] = rs.randint(4, spec.source_vocab_size, L)
    for i, L in enumerate([4, 2, 3]):
        tgt[i, :L] = rs.randint(4, spec.target_vocab_size, L)

    out = seq2seq_forward(
        params, spec, jnp.asarray(src), jnp.asarray(tgt), decoding_strategy="greedy"
    )
    tmodel = TorchSeq2Seq(params, spec)
    tlogits, tloss = tmodel(torch.tensor(src), torch.tensor(tgt))

    np.testing.assert_allclose(
        np.asarray(out["logits"]), tlogits.detach().numpy(), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(out["loss"]), tloss.detach().numpy(), atol=2e-5)


def test_free_decode_shapes_and_trimming():
    spec = _spec()
    params = init_seq2seq_params(jax.random.PRNGKey(0), spec)
    src = jnp.array([[5, 6, 7, 0, 0], [8, 9, 0, 0, 0]], jnp.int32)
    out = seq2seq_forward(
        params, spec, src, decoding_strategy="sampling", rng=jax.random.PRNGKey(7)
    )
    assert out["predictions"].shape == (2, spec.max_decoding_steps)
    assert out["loss"].shape == (2,)
    preds = np.asarray(out["predictions"])
    # no blocked tokens ever sampled; everything after first @end@ is PAD
    assert not np.isin(preds, [UNK, START]).any()
    for row in preds:
        if (row == END).any():
            end_pos = int(np.argmax(row == END))
            assert (row[end_pos + 1:] == PAD).all()


def test_free_decode_loss_is_length_normalized_neg_logprob():
    spec = _spec()
    params = init_seq2seq_params(jax.random.PRNGKey(1), spec)
    src = jnp.array([[5, 6, 7, 0, 0]], jnp.int32)
    out = seq2seq_forward(
        params, spec, src, decoding_strategy="sampling", rng=jax.random.PRNGKey(3)
    )
    preds = np.asarray(out["predictions"])[0]
    logits = np.asarray(out["logits"])[0]
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    mask = preds != PAD
    if mask.sum() > 0:
        expected = -(lp[np.arange(len(preds)), preds] * mask).sum() / (mask.sum() + 1e-12)
        np.testing.assert_allclose(np.asarray(out["loss"])[0], expected, rtol=1e-5)


def test_greedy_is_deterministic_and_sampling_varies():
    spec = _spec()
    params = init_seq2seq_params(jax.random.PRNGKey(2), spec)
    src = jnp.array([[5, 6, 7, 8, 9]] * 4, jnp.int32)
    g1 = seq2seq_forward(params, spec, src, decoding_strategy="greedy")
    g2 = seq2seq_forward(params, spec, src, decoding_strategy="greedy")
    np.testing.assert_array_equal(
        np.asarray(g1["predictions"]), np.asarray(g2["predictions"])
    )
    s1 = seq2seq_forward(params, spec, src, rng=jax.random.PRNGKey(0))
    s2 = seq2seq_forward(params, spec, src, rng=jax.random.PRNGKey(1))
    assert (np.asarray(s1["predictions"]) != np.asarray(s2["predictions"])).any()


def test_padding_invariance():
    """Extra right-padding on the source must not change the output logits."""
    spec = _spec()
    params = init_seq2seq_params(jax.random.PRNGKey(4), spec)
    src_a = jnp.array([[5, 6, 7, 0, 0]], jnp.int32)
    src_b = jnp.array([[5, 6, 7, 0, 0, 0, 0, 0]], jnp.int32)
    tgt = jnp.array([[4, 5, 6]], jnp.int32)
    out_a = seq2seq_forward(params, spec, src_a, tgt, decoding_strategy="greedy")
    out_b = seq2seq_forward(params, spec, src_b, tgt, decoding_strategy="greedy")
    np.testing.assert_allclose(
        np.asarray(out_a["logits"]), np.asarray(out_b["logits"]), atol=1e-5
    )


# ---------------------------------------------------------------- program prior -------


class TorchPriorFixture(torch.nn.Module):
    def __init__(self, params, spec):
        super().__init__()
        self.emb = torch.tensor(np.asarray(params["embedding"]))
        self.proj = torch.tensor(np.asarray(params["projection"]))
        self.encoder = torch.nn.LSTM(
            spec.input_size, spec.hidden_size, spec.num_layers, batch_first=True
        )
        sd = {}
        for layer, p in enumerate(params["encoder"]):
            sd[f"weight_ih_l{layer}"] = torch.tensor(np.asarray(p["w_ih"]))
            sd[f"weight_hh_l{layer}"] = torch.tensor(np.asarray(p["w_hh"]))
            sd[f"bias_ih_l{layer}"] = torch.tensor(np.asarray(p["b_ih"]))
            sd[f"bias_hh_l{layer}"] = torch.tensor(np.asarray(p["b_hh"]))
        self.encoder.load_state_dict(sd)

    def forward(self, tokens_with_boundary):
        mask = tokens_with_boundary != PAD
        lengths = mask.sum(1)
        emb = self.emb[tokens_with_boundary] * mask.unsqueeze(-1)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            emb, lengths, batch_first=True, enforce_sorted=False
        )
        enc, _ = self.encoder(packed)
        enc, _ = torch.nn.utils.rnn.pad_packed_sequence(
            enc, batch_first=True, total_length=tokens_with_boundary.shape[1]
        )
        logits = (enc @ self.proj.T) @ self.emb.T
        rel_t = tokens_with_boundary[:, 1:]
        rel_m = (rel_t != PAD).float()
        lp = torch.log_softmax(logits[:, :-1], -1)
        nll = -lp.gather(-1, rel_t.unsqueeze(-1)).squeeze(-1)
        return (nll * rel_m).sum(-1) / (rel_m.sum(-1) + 1e-13)


def test_program_prior_loss_matches_torch_fixture():
    spec = ProgramPriorSpec(vocab_size=12, input_size=8, hidden_size=9, num_layers=2)
    params = init_program_prior_params(jax.random.PRNGKey(0), spec)
    tokens = np.array([[5, 6, 7, 0, 0], [8, 9, 10, 11, 4], [6, 0, 0, 0, 0]], np.int32)

    out = program_prior_forward(params, spec, jnp.asarray(tokens), jax.random.PRNGKey(1))

    fixture = TorchPriorFixture(params, spec)
    with_boundary = TorchSeq2Seq._add_boundary(torch.tensor(tokens))
    tloss = fixture(with_boundary)
    np.testing.assert_allclose(np.asarray(out["loss"]), tloss.detach().numpy(), atol=2e-5)
    # predictions: blocked tokens never sampled at unmasked positions, padded elsewhere
    preds = np.asarray(out["predictions"])
    assert preds.shape == (3, tokens.shape[1] + 1)
    rel_mask = np.asarray(with_boundary[:, 1:] != PAD)
    assert (preds[~rel_mask] == 0).all()
    assert not np.isin(preds[rel_mask], [START, UNK]).any()


def test_program_prior_sample():
    spec = ProgramPriorSpec(vocab_size=12, input_size=16, hidden_size=9, num_layers=2)
    params = init_program_prior_params(jax.random.PRNGKey(0), spec)
    out = program_prior_sample(
        params, spec, jax.random.PRNGKey(5), num_samples=6, max_sequence_length=10
    )
    assert out["predictions"].shape == (6, 9)
    loss = np.asarray(out["loss"])
    assert (np.diff(loss) >= -1e-6).all()  # sorted ascending


def test_program_prior_sample_quirk_matches_torch_fixture():
    """Numerical fixture for the reference's ``sample()`` quirk
    (reference ``program_prior.py:246``): per-step logprobs come from
    ``log_softmax`` over the PRE-output-layer projection activations (width
    ``input_size``), gathered at the sampled vocab index — NOT from the vocab
    logits. The torch fixture recomputes the length-normalized sequence loss
    for the jax-sampled sequences under shared tokens (teacher-forced replay:
    every unmasked step's inputs are preserved by @end@-trimming)."""
    spec = ProgramPriorSpec(vocab_size=12, input_size=16, hidden_size=9, num_layers=2)
    params = init_program_prior_params(jax.random.PRNGKey(0), spec)
    out = program_prior_sample(
        params, spec, jax.random.PRNGKey(5), num_samples=8, max_sequence_length=10
    )
    preds = torch.tensor(np.asarray(out["predictions"], np.int64))
    mask = (preds != PAD).float()
    # @end@ sampled at step 0 trims to an all-pad row (reference's
    # ``if end_index > 0`` rule) whose loss is 0/(0+eps) = 0 under the shared
    # formula below; require some real sequences so the check isn't vacuous.
    assert (mask.sum(1) > 0).any()

    fixture = TorchPriorFixture(params, spec)
    inputs = torch.cat(
        [torch.full((preds.shape[0], 1), START, dtype=torch.int64), preds[:, :-1]],
        dim=1,
    )
    emb = fixture.emb[inputs] * (inputs != PAD).unsqueeze(-1)
    enc, _ = fixture.encoder(emb)
    projected = enc @ fixture.proj.T  # (B, T, input_size) pre-output-layer
    quirk_lp = torch.log_softmax(projected, -1).gather(
        -1, preds.unsqueeze(-1)
    ).squeeze(-1)
    expected_loss = -(quirk_lp * mask).sum(-1) / (mask.sum(-1) + 1e-12)
    np.testing.assert_allclose(
        np.asarray(out["loss"]), expected_loss.detach().numpy(), atol=1e-5
    )

    # The quirk is load-bearing: standard vocab-logit logprobs do NOT match.
    logits = projected @ fixture.emb.T
    std_lp = torch.log_softmax(logits, -1).gather(-1, preds.unsqueeze(-1)).squeeze(-1)
    std_loss = -(std_lp * mask).sum(-1) / (mask.sum(-1) + 1e-12)
    nondegenerate = np.asarray(mask.sum(1) > 0)
    assert np.abs(
        np.asarray(out["loss"]) - std_loss.detach().numpy()
    )[nondegenerate].max() > 1e-3


# ------------------------------------------------------------------ beam search


def test_beam_size_one_equals_greedy():
    """beam_size=1 must reproduce greedy decode token-for-token and match its
    length-normalized loss (the nesting contract in beam_search_forward)."""
    from probnmn_tpu.models.seq2seq import beam_search_forward

    spec = _spec()
    params = init_seq2seq_params(jax.random.PRNGKey(11), spec)
    src = jnp.array(
        [[5, 6, 7, 0, 0], [8, 9, 10, 11, 0], [4, 4, 4, 0, 0]], jnp.int32
    )
    greedy = seq2seq_forward(params, spec, src, decoding_strategy="greedy")
    beam = beam_search_forward(params, spec, src, beam_size=1)
    np.testing.assert_array_equal(
        np.asarray(beam["predictions"]), np.asarray(greedy["predictions"])
    )
    np.testing.assert_allclose(
        np.asarray(beam["loss"]), np.asarray(greedy["loss"]), rtol=1e-5
    )


def test_beam_search_shapes_trimming_and_score_order():
    from probnmn_tpu.models.seq2seq import beam_search_forward

    spec = _spec()
    params = init_seq2seq_params(jax.random.PRNGKey(12), spec)
    src = jnp.array([[5, 6, 7, 8, 0], [9, 10, 0, 0, 0]], jnp.int32)
    K = 5
    out = beam_search_forward(params, spec, src, beam_size=K)
    B, T = 2, spec.max_decoding_steps
    assert out["predictions"].shape == (B, T)
    assert out["beam_predictions"].shape == (B, K, T)
    assert out["beam_scores"].shape == (B, K)
    scores = np.asarray(out["beam_scores"])
    assert (np.diff(scores, axis=-1) <= 1e-6).all(), "hypotheses must be sorted"
    # every hypothesis is trimmed: nothing but PAD after the first @end@
    for row in np.asarray(out["beam_predictions"]).reshape(B * K, T):
        if (row == END).any():
            end_pos = int(np.argmax(row == END))
            assert (row[end_pos + 1:] == PAD).all()


def test_beam_search_never_worse_than_greedy_and_monotone_in_width():
    """The beam-best cumulative score must dominate the greedy path's score
    (greedy is in the width-K search space), and widening the beam can only
    improve the best score."""
    from probnmn_tpu.models.seq2seq import beam_search_forward

    spec = _spec()
    params = init_seq2seq_params(jax.random.PRNGKey(13), spec)
    src = jnp.array(
        [[5, 6, 7, 0, 0], [8, 9, 10, 11, 12], [6, 6, 6, 6, 0], [12, 4, 9, 0, 0]],
        jnp.int32,
    )
    greedy = seq2seq_forward(params, spec, src, decoding_strategy="greedy")
    greedy_preds = np.asarray(greedy["predictions"])
    greedy_len = (greedy_preds != PAD).sum(-1)
    greedy_total = -np.asarray(greedy["loss"]) * greedy_len  # un-normalized

    b2 = beam_search_forward(params, spec, src, beam_size=2)
    b6 = beam_search_forward(params, spec, src, beam_size=6)
    best2 = np.asarray(b2["beam_scores"])[:, 0]
    best6 = np.asarray(b6["beam_scores"])[:, 0]
    assert (best2 >= greedy_total - 1e-4).all()
    assert (best6 >= best2 - 1e-4).all()


def test_beam_search_scores_match_replayed_logprobs():
    """A hypothesis's reported cumulative score must equal the sum of the
    model's step logprobs along that hypothesis (replayed by teacher-forcing
    its tokens) — i.e. the scores are real sequence logprobs, not artifacts."""
    from probnmn_tpu.models.seq2seq import beam_search_forward

    spec = _spec()
    params = init_seq2seq_params(jax.random.PRNGKey(14), spec)
    src = jnp.array([[5, 6, 7, 8, 9]], jnp.int32)
    out = beam_search_forward(params, spec, src, beam_size=3)
    preds = np.asarray(out["beam_predictions"])[0]
    scores = np.asarray(out["beam_scores"])[0]
    for k in range(3):
        row = preds[k]
        length = int((row != PAD).sum())
        if length == 0 or not (row == END).any():
            continue  # all-zero trim quirk rows can't be replayed verbatim
        # teacher-force the hypothesis WITHOUT the trailing @end@ (add_boundary
        # re-appends it) and read the chained logprobs from the logits
        tf = seq2seq_forward(
            params, spec, src, jnp.asarray(row[None, : length - 1], jnp.int32)
        )
        lp = np.asarray(jax.nn.log_softmax(np.asarray(tf["logits"])[0], axis=-1))
        targets = np.append(row[: length - 1], END)
        replayed = lp[np.arange(length), targets].sum()
        np.testing.assert_allclose(scores[k], replayed, rtol=1e-4, atol=1e-4)
