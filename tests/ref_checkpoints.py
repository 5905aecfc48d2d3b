"""Synthesize reference-format ``.pth`` checkpoints: torch-serialized state
dicts under the reference's exact key names/layouts (allennlp Seq2SeqBase,
ProgramPrior, per-token NMN modules — reference ``checkpointing.py:93-105``),
so the port->evaluate pipeline can be exercised end to end without the real
v1.0 release files."""
import numpy as np
import torch

from probnmn_tpu.models.nmn import (
    ATTENTION,
    COMPARE,
    QUERY,
    RELATE,
    SAME,
)


def _r(rs, *shape):
    return torch.tensor(rs.randn(*shape).astype(np.float32) * 0.1)


def make_seq2seq_state(source_vocab, target_vocab, input_size, hidden_size,
                       num_layers, seed):
    """State dict of the reference Seq2SeqBase (allennlp SimpleSeq2Seq guts)."""
    rs = np.random.RandomState(seed)
    D, H = input_size, hidden_size
    state = {
        "_source_embedder.token_embedder_tokens.weight": _r(rs, source_vocab, D),
        "_target_embedder.weight": _r(rs, target_vocab, D),
        "_decoder_cell.weight_ih": _r(rs, 4 * H, H + D),
        "_decoder_cell.weight_hh": _r(rs, 4 * H, H),
        "_decoder_cell.bias_ih": _r(rs, 4 * H),
        "_decoder_cell.bias_hh": _r(rs, 4 * H),
        "_output_projection_layer.weight": _r(rs, target_vocab, H),
        "_output_projection_layer.bias": _r(rs, target_vocab),
    }
    for layer in range(num_layers):
        din = D if layer == 0 else H
        state[f"_encoder._module.weight_ih_l{layer}"] = _r(rs, 4 * H, din)
        state[f"_encoder._module.weight_hh_l{layer}"] = _r(rs, 4 * H, H)
        state[f"_encoder._module.bias_ih_l{layer}"] = _r(rs, 4 * H)
        state[f"_encoder._module.bias_hh_l{layer}"] = _r(rs, 4 * H)
    return state


def make_prior_state(vocab_size, input_size, hidden_size, num_layers, seed):
    rs = np.random.RandomState(seed)
    D, H = input_size, hidden_size
    state = {
        "_embedder.token_embedder_programs.weight": _r(rs, vocab_size, D),
        "_projection_layer.weight": _r(rs, D, H),
        # tied output layer is serialized by the reference but ignored on port
        "_output_layer.weight": _r(rs, vocab_size, D),
    }
    for layer in range(num_layers):
        din = D if layer == 0 else H
        state[f"_encoder._module.weight_ih_l{layer}"] = _r(rs, 4 * H, din)
        state[f"_encoder._module.weight_hh_l{layer}"] = _r(rs, 4 * H, H)
        state[f"_encoder._module.bias_ih_l{layer}"] = _r(rs, 4 * H)
        state[f"_encoder._module.bias_hh_l{layer}"] = _r(rs, 4 * H)
    return state


def make_nmn_state(vocabulary, spec, seed):
    """Per-token module state dict exactly as the reference registers it
    (reference ``nmn.py:85-115``: one parameterized module instance per
    program-vocab token, keyed by the token string)."""
    rs = np.random.RandomState(seed)
    C = spec.module_channels
    P = spec.class_projection_channels
    flat = P * (spec.height // 2) * (spec.width // 2)
    state = {
        "stem.0.weight": _r(rs, C, spec.feature_channels, 3, 3),
        "stem.0.bias": _r(rs, C),
        "stem.2.weight": _r(rs, C, C, 3, 3), "stem.2.bias": _r(rs, C),
        "classifier.0.weight": _r(rs, P, C, 1, 1), "classifier.0.bias": _r(rs, P),
        "classifier.4.weight": _r(rs, spec.classifier_linear_size, flat),
        "classifier.4.bias": _r(rs, spec.classifier_linear_size),
        "classifier.6.weight": _r(rs, spec.num_answers, spec.classifier_linear_size),
        "classifier.6.bias": _r(rs, spec.num_answers),
    }
    index_to_token = vocabulary.get_index_to_token_vocabulary("programs")
    for index in range(len(index_to_token)):
        token = index_to_token[index]
        kind = int(spec.token_kind[index])
        if kind == ATTENTION:
            state[f"{token}.conv1.weight"] = _r(rs, C, C, 3, 3)
            state[f"{token}.conv1.bias"] = _r(rs, C)
            state[f"{token}.conv2.weight"] = _r(rs, C, C, 3, 3)
            state[f"{token}.conv2.bias"] = _r(rs, C)
            state[f"{token}.conv3.weight"] = _r(rs, 1, C, 1, 1)
            state[f"{token}.conv3.bias"] = _r(rs, 1)
        elif kind == QUERY:
            for name in ("conv1", "conv2"):
                state[f"{token}.{name}.weight"] = _r(rs, C, C, 3, 3)
                state[f"{token}.{name}.bias"] = _r(rs, C)
        elif kind == RELATE:
            for i in range(1, 6):
                state[f"{token}.conv{i}.weight"] = _r(rs, C, C, 3, 3)
                state[f"{token}.conv{i}.bias"] = _r(rs, C)
            state[f"{token}.conv6.weight"] = _r(rs, 1, C, 1, 1)
            state[f"{token}.conv6.bias"] = _r(rs, 1)
        elif kind == SAME:
            state[f"{token}.conv.weight"] = _r(rs, 1, C + 1, 1, 1)
            state[f"{token}.conv.bias"] = _r(rs, 1)
        elif kind == COMPARE:
            state[f"{token}.projection.weight"] = _r(rs, C, 2 * C, 1, 1)
            state[f"{token}.projection.bias"] = _r(rs, C)
            for name in ("conv1", "conv2"):
                state[f"{token}.{name}.weight"] = _r(rs, C, C, 3, 3)
                state[f"{token}.{name}.bias"] = _r(rs, C)
    return state


def save_reference_pth(path, objects, iteration=0):
    """Reference checkpoint layout: {model_name: state_dict, ..., "iteration": N}
    (reference ``checkpointing.py:93-105``)."""
    payload = dict(objects)
    payload["optimizer"] = {}
    payload["iteration"] = iteration
    torch.save(payload, path)
