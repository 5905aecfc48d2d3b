"""Reference-checkpoint porting: synthesize state_dicts with the reference's key
names (torch layouts), port them, and verify forward equivalence against direct
torch computations driven from the raw state_dict (non-circular: the torch side
never sees our parameter format)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from probnmn_tpu.data.vocabulary import SPECIAL_TOKENS, Vocabulary
from probnmn_tpu.models import nmn
from probnmn_tpu.models.program_prior import ProgramPriorSpec, program_prior_forward
from probnmn_tpu.models.seq2seq import Seq2SeqSpec, seq2seq_forward
from probnmn_tpu.utils import torch_interop


def test_seq2seq_port_roundtrip():
    spec = Seq2SeqSpec(
        source_vocab_size=9, target_vocab_size=7, input_size=6, hidden_size=5,
        num_layers=2, max_decoding_steps=4,
    )
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(6, 5, 2, batch_first=True)
    cell = torch.nn.LSTMCell(5 + 6, 5)
    proj = torch.nn.Linear(5, 7)
    state = {
        "_source_embedder.token_embedder_tokens.weight": torch.randn(9, 6),
        "_target_embedder.weight": torch.randn(7, 6),
    }
    state.update({f"_encoder._module.{k}": v for k, v in lstm.state_dict().items()})
    state.update({f"_decoder_cell.{k}": v for k, v in cell.state_dict().items()})
    state.update({f"_output_projection_layer.{k}": v for k, v in proj.state_dict().items()})

    params = torch_interop.seq2seq_from_state_dict(state, spec)
    np.testing.assert_array_equal(
        np.asarray(params["encoder"][1]["w_hh"]),
        state["_encoder._module.weight_hh_l1"].numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(params["decoder_cell"]["w_ih"]), state["_decoder_cell.weight_ih"].numpy()
    )
    # forward runs on ported params
    out = seq2seq_forward(
        params, spec, jnp.array([[4, 5, 6, 0]]), jnp.array([[4, 5, 0]]), "greedy"
    )
    assert np.isfinite(np.asarray(out["loss"])).all()


def test_program_prior_port_tied_embedding():
    spec = ProgramPriorSpec(vocab_size=8, input_size=6, hidden_size=5, num_layers=1)
    torch.manual_seed(1)
    lstm = torch.nn.LSTM(6, 5, 1, batch_first=True)
    state = {
        "_embedder.token_embedder_programs.weight": torch.randn(8, 6),
        "_projection_layer.weight": torch.randn(6, 5),
        # tied output layer also present in reference checkpoints; must be ignored
        "_output_layer.weight": torch.randn(8, 6),
    }
    state.update({f"_encoder._module.{k}": v for k, v in lstm.state_dict().items()})
    params = torch_interop.program_prior_from_state_dict(state, spec)
    np.testing.assert_array_equal(
        np.asarray(params["embedding"]),
        state["_embedder.token_embedder_programs.weight"].numpy(),
    )
    out = program_prior_forward(
        params, spec, jnp.array([[4, 5, 6, 0]]), jax.random.PRNGKey(0)
    )
    assert np.isfinite(np.asarray(out["loss"])).all()


def test_nmn_port_matches_direct_torch_forward():
    """Port a synthetic reference-style NMN state_dict, then compare our forward
    against a direct torch computation from the raw state_dict."""
    vocab = Vocabulary(
        {
            "questions": SPECIAL_TOKENS + ["w"],
            "programs": SPECIAL_TOKENS + ["scene", "count", "filter_color[red]"],
            "answers": ["a", "b", "c", "@@UNKNOWN@@"],
        }
    )
    spec = nmn.make_spec(vocab)
    spec.feature_channels = 10
    spec.height = spec.width = 6
    spec.module_channels = 4
    spec.class_projection_channels = 8
    spec.classifier_linear_size = 6
    C = spec.module_channels

    torch.manual_seed(2)
    state = {
        "stem.0.weight": torch.randn(C, 10, 3, 3), "stem.0.bias": torch.randn(C),
        "stem.2.weight": torch.randn(C, C, 3, 3), "stem.2.bias": torch.randn(C),
        "classifier.0.weight": torch.randn(8, C, 1, 1), "classifier.0.bias": torch.randn(8),
        "classifier.4.weight": torch.randn(6, 8 * 3 * 3), "classifier.4.bias": torch.randn(6),
        "classifier.6.weight": torch.randn(3, 6), "classifier.6.bias": torch.randn(3),
        # modules registered under their token names (reference nmn.py:114-115)
        "count.conv1.weight": torch.randn(C, C, 3, 3), "count.conv1.bias": torch.randn(C),
        "count.conv2.weight": torch.randn(C, C, 3, 3), "count.conv2.bias": torch.randn(C),
        "filter_color[red].conv1.weight": torch.randn(C, C, 3, 3),
        "filter_color[red].conv1.bias": torch.randn(C),
        "filter_color[red].conv2.weight": torch.randn(C, C, 3, 3),
        "filter_color[red].conv2.bias": torch.randn(C),
        "filter_color[red].conv3.weight": torch.randn(1, C, 1, 1),
        "filter_color[red].conv3.bias": torch.randn(1),
    }
    params = torch_interop.nmn_from_state_dict(state, spec, vocab)

    rs = np.random.RandomState(0)
    feats = rs.randn(2, 6, 6, 10).astype(np.float32)
    program = ["count", "filter_color[red]", "scene"]
    programs = np.zeros((2, 5), np.int64)
    programs[:, : len(program)] = [vocab.get_token_index(t, "programs") for t in program]
    answers = np.array([0, 2])

    ours = nmn.nmn_forward(
        params, spec, jnp.asarray(feats), jnp.asarray(programs), jnp.asarray(answers)
    )

    # ---- direct torch forward from the raw state_dict (reference semantics) ----
    x = torch.tensor(feats).permute(0, 3, 1, 2)
    s = {k: v for k, v in state.items()}
    h = F.relu(F.conv2d(x, s["stem.0.weight"], s["stem.0.bias"], padding=1))
    stem_out = F.relu(F.conv2d(h, s["stem.2.weight"], s["stem.2.bias"], padding=1))
    # program execution (reversed): scene -> filter (attention) -> count (query)
    attn = torch.ones_like(stem_out[:, :1])
    a = torch.mul(stem_out, attn.repeat(1, C, 1, 1))
    a = F.relu(F.conv2d(a, s["filter_color[red].conv1.weight"], s["filter_color[red].conv1.bias"], padding=1))
    a = F.relu(F.conv2d(a, s["filter_color[red].conv2.weight"], s["filter_color[red].conv2.bias"], padding=1))
    attn = torch.sigmoid(F.conv2d(a, s["filter_color[red].conv3.weight"], s["filter_color[red].conv3.bias"]))
    q = torch.mul(stem_out, attn.repeat(1, C, 1, 1))
    q = F.relu(F.conv2d(q, s["count.conv1.weight"], s["count.conv1.bias"], padding=1))
    q = F.relu(F.conv2d(q, s["count.conv2.weight"], s["count.conv2.bias"], padding=1))
    # classifier with torch's NCHW channel-major flatten
    c = F.relu(F.conv2d(q, s["classifier.0.weight"], s["classifier.0.bias"]))
    c = F.max_pool2d(c, 2, 2)
    c = c.reshape(c.shape[0], -1)
    c = F.relu(c @ s["classifier.4.weight"].T + s["classifier.4.bias"])
    logits = c @ s["classifier.6.weight"].T + s["classifier.6.bias"]
    loss = F.cross_entropy(logits, torch.tensor(answers), reduction="none")

    np.testing.assert_allclose(
        np.asarray(ours["answer_logits"]), logits.detach().numpy(), rtol=2e-5, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours["loss"]), loss.detach().numpy(), rtol=2e-5, atol=1e-3
    )
    assert not np.asarray(ours["invalid"]).any()


def test_trainer_loads_reference_pth_checkpoint(tmp_path):
    """End-to-end: a reference-style .pth (torch-serialized, reference key names)
    loads through the phase trainer's checkpoint paths."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from clevr_fixtures import build_fixture_data, make_fixture_config
    from probnmn_tpu.training.program_prior_trainer import ProgramPriorTrainer

    root = str(tmp_path)
    build_fixture_data(root, n_train=16, n_val=8)
    config = make_fixture_config(root, "program_prior")
    np.random.seed(config.RANDOM_SEED)
    trainer = ProgramPriorTrainer(config, os.path.join(root, "run"))

    # reference-style checkpoint: {"program_prior": state_dict, "optimizer": ..., "iteration": N}
    torch.manual_seed(3)
    V = 16  # fixture program vocab size
    D, H = config.PROGRAM_PRIOR.INPUT_SIZE, config.PROGRAM_PRIOR.HIDDEN_SIZE
    lstm = torch.nn.LSTM(D, H, config.PROGRAM_PRIOR.NUM_LAYERS, batch_first=True)
    state = {
        "_embedder.token_embedder_programs.weight": torch.randn(V, D),
        "_projection_layer.weight": torch.randn(D, H),
        "_output_layer.weight": torch.randn(V, D),
    }
    state.update({f"_encoder._module.{k}": v for k, v in lstm.state_dict().items()})
    pth = os.path.join(root, "reference.pth")
    torch.save({"program_prior": state, "optimizer": {"dummy": 1}, "iteration": 777}, pth)

    trainer.load_checkpoint(pth)
    np.testing.assert_array_equal(
        np.asarray(trainer.params["program_prior"]["embedding"]),
        state["_embedder.token_embedder_programs.weight"].numpy(),
    )
    # training continues from the ported weights
    batch = next(trainer._batches)
    logs = trainer._do_iteration(batch)
    assert np.isfinite(float(logs["loss"]))
