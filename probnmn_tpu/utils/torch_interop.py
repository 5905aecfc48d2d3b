r"""
Reference-checkpoint interop: load kdexd/probnmn-clevr ``.pth`` checkpoints
(v1.0 release) into this framework's parameter pytrees, weight-for-weight.

Key mappings (reference module attribute names -> our pytree):

- ProgramPrior (``program_prior.py:50-62``): ``_embedder.token_embedder_programs
  .weight`` -> embedding (tied output layer needs no copy), ``_encoder._module
  .{weight,bias}_{ih,hh}_l{k}`` -> encoder layers, ``_projection_layer.weight``
  -> projection.
- Seq2SeqBase / allennlp SimpleSeq2Seq (``seq2seq_base.py``): source embedder,
  encoder LSTM, ``_target_embedder.weight``, ``_decoder_cell.*``,
  ``_output_projection_layer.*``.
- NeuralModuleNetwork (``nmn.py:67-115``): stem/classifier Sequentials, plus one
  torch module per program-vocab token (registered under the token name, e.g.
  ``filter_color[red].conv1.weight``) gathered into our stacked per-class banks
  by the same token -> bank-slot assignment ``make_spec`` produces.

Layout conversions: conv OIHW -> HWIO; 1x1 convs -> (C_in, C_out) matrices; the
classifier's first Linear permuted from torch's channel-major flatten to our
NHWC flatten.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.models.nmn import (
    ATTENTION,
    COMPARE,
    QUERY,
    RELATE,
    SAME,
    NMNSpec,
)
from probnmn_tpu.models.program_prior import ProgramPriorSpec
from probnmn_tpu.models.seq2seq import Seq2SeqSpec


def _np(state: Mapping[str, Any], key: str) -> np.ndarray:
    value = state[key]
    if hasattr(value, "numpy"):
        value = value.detach().cpu().numpy()
    return np.asarray(value)


def _lstm_layers(state: Mapping[str, Any], prefix: str, num_layers: int):
    return [
        {
            "w_ih": jnp.asarray(_np(state, f"{prefix}.weight_ih_l{k}")),
            "w_hh": jnp.asarray(_np(state, f"{prefix}.weight_hh_l{k}")),
            "b_ih": jnp.asarray(_np(state, f"{prefix}.bias_ih_l{k}")),
            "b_hh": jnp.asarray(_np(state, f"{prefix}.bias_hh_l{k}")),
        }
        for k in range(num_layers)
    ]


def _conv_hwio(state, key):
    return jnp.asarray(_np(state, key).transpose(2, 3, 1, 0))  # OIHW -> HWIO


def _conv_1x1(state, key):
    w = _np(state, key)  # (O, I, 1, 1)
    return jnp.asarray(w[:, :, 0, 0].T)  # -> (I, O)


def program_prior_from_state_dict(
    state: Mapping[str, Any], spec: ProgramPriorSpec
) -> Dict[str, Any]:
    return {
        "embedding": jnp.asarray(
            _np(state, "_embedder.token_embedder_programs.weight")
        ),
        "encoder": _lstm_layers(state, "_encoder._module", spec.num_layers),
        "projection": jnp.asarray(_np(state, "_projection_layer.weight")),
    }


def seq2seq_from_state_dict(state: Mapping[str, Any], spec: Seq2SeqSpec) -> Dict[str, Any]:
    return {
        "source_embedding": jnp.asarray(
            _np(state, "_source_embedder.token_embedder_tokens.weight")
        ),
        "encoder": _lstm_layers(state, "_encoder._module", spec.num_layers),
        "target_embedding": jnp.asarray(_np(state, "_target_embedder.weight")),
        "decoder_cell": {
            "w_ih": jnp.asarray(_np(state, "_decoder_cell.weight_ih")),
            "w_hh": jnp.asarray(_np(state, "_decoder_cell.weight_hh")),
            "b_ih": jnp.asarray(_np(state, "_decoder_cell.bias_ih")),
            "b_hh": jnp.asarray(_np(state, "_decoder_cell.bias_hh")),
        },
        "output_projection": {
            "w": jnp.asarray(_np(state, "_output_projection_layer.weight")),
            "b": jnp.asarray(_np(state, "_output_projection_layer.bias")),
        },
    }


def nmn_from_state_dict(
    state: Mapping[str, Any], spec: NMNSpec, vocabulary: Vocabulary
) -> Dict[str, Any]:
    C = spec.module_channels
    H2, W2 = spec.height // 2, spec.width // 2
    P = spec.class_projection_channels

    # Classifier first Linear: torch flattens NCHW (c-major); ours flattens NHWC.
    lin1_w = _np(state, "classifier.4.weight")  # (out, P*H2*W2) c-major
    lin1_w = lin1_w.reshape(-1, P, H2, W2).transpose(0, 2, 3, 1).reshape(lin1_w.shape[0], -1)

    params: Dict[str, Any] = {
        "stem": {
            "w1": _conv_hwio(state, "stem.0.weight"),
            "b1": jnp.asarray(_np(state, "stem.0.bias")),
            "w2": _conv_hwio(state, "stem.2.weight"),
            "b2": jnp.asarray(_np(state, "stem.2.bias")),
        },
        "classifier": {
            "proj_w": _conv_1x1(state, "classifier.0.weight"),
            "proj_b": jnp.asarray(_np(state, "classifier.0.bias")),
            "lin1": {
                "w": jnp.asarray(lin1_w),
                "b": jnp.asarray(_np(state, "classifier.4.bias")),
            },
            "lin2": {
                "w": jnp.asarray(_np(state, "classifier.6.weight")),
                "b": jnp.asarray(_np(state, "classifier.6.bias")),
            },
        },
    }

    # Gather per-token modules into stacked banks (zero-filled unused slots keep
    # bank shapes identical to init_nmn_params).
    nb = spec.bank_sizes

    def bank3(n):
        return {"w": np.zeros((n, 3, 3, C, C), np.float32), "b": np.zeros((n, C), np.float32)}

    banks = {
        "attention": {"conv1": bank3(nb["attention"]), "conv2": bank3(nb["attention"]),
                      "conv3": {"w": np.zeros((nb["attention"], C, 1), np.float32),
                                "b": np.zeros((nb["attention"], 1), np.float32)}},
        "query": {"conv1": bank3(nb["query"]), "conv2": bank3(nb["query"])},
        "relate": {f"conv{i}": bank3(nb["relate"]) for i in range(1, 6)}
        | {"conv6": {"w": np.zeros((nb["relate"], C, 1), np.float32),
                     "b": np.zeros((nb["relate"], 1), np.float32)}},
        "same": {"conv": {"w": np.zeros((nb["same"], C + 1, 1), np.float32),
                          "b": np.zeros((nb["same"], 1), np.float32)}},
        "compare": {"projection": {"w": np.zeros((nb["compare"], 2 * C, C), np.float32),
                                   "b": np.zeros((nb["compare"], C), np.float32)},
                    "conv1": bank3(nb["compare"]), "conv2": bank3(nb["compare"])},
    }

    def set3(bank, slot, token, conv_name):
        bank["w"][slot] = _np(state, f"{token}.{conv_name}.weight").transpose(2, 3, 1, 0)
        bank["b"][slot] = _np(state, f"{token}.{conv_name}.bias")

    def set1(bank, slot, token, conv_name):
        w = _np(state, f"{token}.{conv_name}.weight")
        bank["w"][slot] = w[:, :, 0, 0].T
        bank["b"][slot] = _np(state, f"{token}.{conv_name}.bias")

    index_to_token = vocabulary.get_index_to_token_vocabulary("programs")
    for index in range(len(index_to_token)):
        token = index_to_token[index]
        kind = int(spec.token_kind[index])
        slot = int(spec.token_bank[index])
        if kind == ATTENTION:
            set3(banks["attention"]["conv1"], slot, token, "conv1")
            set3(banks["attention"]["conv2"], slot, token, "conv2")
            set1(banks["attention"]["conv3"], slot, token, "conv3")
        elif kind == QUERY:
            set3(banks["query"]["conv1"], slot, token, "conv1")
            set3(banks["query"]["conv2"], slot, token, "conv2")
        elif kind == RELATE:
            for i in range(1, 6):
                set3(banks["relate"][f"conv{i}"], slot, token, f"conv{i}")
            set1(banks["relate"]["conv6"], slot, token, "conv6")
        elif kind == SAME:
            set1(banks["same"]["conv"], slot, token, "conv")
        elif kind == COMPARE:
            set1(banks["compare"]["projection"], slot, token, "projection")
            set3(banks["compare"]["conv1"], slot, token, "conv1")
            set3(banks["compare"]["conv2"], slot, token, "conv2")

    params.update(
        {
            class_name: {
                conv_name: {"w": jnp.asarray(b["w"]), "b": jnp.asarray(b["b"])}
                for conv_name, b in class_banks.items()
            }
            for class_name, class_banks in banks.items()
        }
    )
    return params


MODEL_PORTERS = {
    "program_prior": program_prior_from_state_dict,
    "program_generator": seq2seq_from_state_dict,
    "question_reconstructor": seq2seq_from_state_dict,
}


def load_reference_checkpoint(
    path: str,
    specs: Dict[str, Any],
    vocabulary: Vocabulary,
) -> Dict[str, Any]:
    r"""Load a reference ``.pth`` checkpoint (torch serialization) and port every
    model named in ``specs`` (model_name -> spec). Returns {model_name: params}.
    """
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    out: Dict[str, Any] = {}
    for name, spec in specs.items():
        if name not in checkpoint:
            continue
        state = checkpoint[name]
        if name == "nmn":
            out[name] = nmn_from_state_dict(state, spec, vocabulary)
        else:
            out[name] = MODEL_PORTERS[name](state, spec)
    return out
