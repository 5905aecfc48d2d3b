"""Preprocessing: prefix-notation program tokenization, question tokenization,
vocabulary building, H5 writing (golden-file style on tiny synthetic CLEVR json),
and ResNet conv+BN folding parity vs torch."""
import json
import os

import numpy as np
import torch

import jax
import jax.numpy as jnp

from probnmn_tpu.data.preprocessing import (
    build_vocabulary,
    tokenize_program,
    tokenize_question,
)
from probnmn_tpu.data.readers import ClevrTokensReader
from probnmn_tpu.models import resnet


def _program(entries):
    return [
        {"function": fn, "inputs": inputs, "value_inputs": values}
        for fn, inputs, values in entries
    ]


def test_tokenize_question_reference_semantics():
    q = "What number of other things are there; of the same size?"
    tokens = tokenize_question(q)
    assert tokens == [
        "What", "number", "of", "other", "things", "are", "there", ";",
        "of", "the", "same", "size",
    ]
    # "?" and "." dropped, ";" and "," kept as tokens
    assert ";" in tokens and "?" not in tokens


def test_tokenize_program_prefix_notation():
    # scene -> filter_color[red] -> count, with the root LAST in the list
    # (CLEVR convention); prefix = pre-order traversal from the root.
    program = _program(
        [
            ("scene", [], []),
            ("filter_color", [0], ["red"]),
            ("count", [1], []),
        ]
    )
    assert tokenize_program(program) == ["count", "filter_color[red]", "scene"]


def test_tokenize_program_binary_tree():
    # equal_color(query_color(unique(filter[cube](scene))),
    #             query_color(unique(filter[sphere](scene))))
    program = _program(
        [
            ("scene", [], []),
            ("filter_shape", [0], ["cube"]),
            ("unique", [1], []),
            ("query_color", [2], []),
            ("scene", [], []),
            ("filter_shape", [4], ["sphere"]),
            ("unique", [5], []),
            ("query_color", [6], []),
            ("equal_color", [3, 7], []),
        ]
    )
    assert tokenize_program(program) == [
        "equal_color",
        "query_color", "unique", "filter_shape[cube]", "scene",
        "query_color", "unique", "filter_shape[sphere]", "scene",
    ]


TINY_JSON = {
    "questions": [
        {
            "question": "How many red cubes are there?",
            "image_index": 0,
            "answer": "2",
            "program": _program(
                [("scene", [], []), ("filter_color", [0], ["red"]),
                 ("filter_shape", [1], ["cube"]), ("count", [2], [])]
            ),
        },
        {
            "question": "Is there a blue sphere?",
            "image_index": 1,
            "answer": "yes",
            "program": _program(
                [("scene", [], []), ("filter_color", [0], ["blue"]),
                 ("exist", [1], [])]
            ),
        },
    ]
}


def test_build_vocabulary_and_preprocess_script(tmp_path):
    json_path = tmp_path / "clevr.json"
    json_path.write_text(json.dumps(TINY_JSON))

    vocab = build_vocabulary(TINY_JSON["questions"])
    assert vocab.get_token_index("@@PADDING@@", "programs") == 0
    assert vocab.get_token_index("filter_color[red]", "programs") > 3
    assert vocab.get_token_index("@@UNKNOWN@@", "answers") == vocab.get_vocab_size("answers") - 1
    assert sorted(["2", "yes"]) == [
        vocab.get_token_from_index(i, "answers")
        for i in range(vocab.get_vocab_size("answers") - 1)
    ]
    vocab_dir = str(tmp_path / "vocab")
    vocab.save_to_files(vocab_dir)

    # Run the preprocessing CLI end-to-end.
    from scripts.preprocess import preprocess_questions as pq

    out_h5 = str(tmp_path / "tokens.h5")
    import sys
    argv = sys.argv
    sys.argv = [
        "preprocess_questions.py", "-c", str(json_path), "-v", vocab_dir,
        "-o", out_h5, "-s", "train",
    ]
    try:
        with open(pq.__file__) as f:
            code = compile(f.read(), pq.__file__, "exec")
        exec(code, {"__name__": "__main__", "__file__": pq.__file__})
    finally:
        sys.argv = argv

    reader = ClevrTokensReader(out_h5)
    assert reader.split == "train"
    assert len(reader) == 2
    # programs stored in prefix notation, zero-padded to split max length (4)
    decoded = [
        vocab.get_token_from_index(int(t), "programs")
        for t in reader.programs[0] if t != 0
    ]
    assert decoded == ["count", "filter_shape[cube]", "filter_color[red]", "scene"]
    assert reader.answers[0] == vocab.get_token_index("2", "answers")
    assert reader.image_indices.tolist() == [0, 1]


def test_resnet_conv_bn_folding_matches_torch():
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(5, 7, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(7)
    bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.normal_(); bn.bias.data.normal_()
    bn.eval()

    state = {
        "conv.weight": conv.weight.detach(),
        "bn.weight": bn.weight.detach(), "bn.bias": bn.bias.detach(),
        "bn.running_mean": bn.running_mean, "bn.running_var": bn.running_var,
    }
    ported = resnet._port_conv(state, "conv", "bn")

    x = torch.randn(2, 5, 8, 8)
    expected = bn(conv(x)).detach().numpy()
    got = resnet._conv_bn(ported, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), expected, atol=1e-4
    )


def test_resnet_stage3_output_shape():
    params = resnet.init_resnet101_stage3_params(jax.random.PRNGKey(0))
    images = jnp.zeros((1, 224, 224, 3))
    out = resnet.resnet101_stage3(params, images)
    assert out.shape == (1, 14, 14, 1024)
