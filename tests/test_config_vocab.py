import os

import pytest
import yaml

from probnmn_tpu.config import Config
from probnmn_tpu.data.vocabulary import Vocabulary, SPECIAL_TOKENS


REFERENCE_CONFIGS = "/root/reference/configs"


def test_config_defaults():
    c = Config()
    assert c.PHASE == "joint_training"
    assert c.SUPERVISION == 1000
    assert c.OPTIM.BATCH_SIZE == 256
    assert c.ALPHA == 100.0 and c.BETA == 0.1 and c.GAMMA == 1.0 and c.DELTA == 0.99
    assert c.NMN.IMAGE_FEATURE_SIZE == [1024, 14, 14]


@pytest.mark.parametrize(
    "fname",
    [f for f in sorted(os.listdir(REFERENCE_CONFIGS)) if f.endswith(".yml")]
    if os.path.isdir(REFERENCE_CONFIGS)
    else [],
)
def test_reference_yaml_files_load_unchanged(fname):
    c = Config(os.path.join(REFERENCE_CONFIGS, fname))
    raw = yaml.safe_load(open(os.path.join(REFERENCE_CONFIGS, fname)))

    def check(node_dict, cfg):
        for key, value in node_dict.items():
            got = getattr(cfg, key)
            if isinstance(value, dict):
                check(value, got)
            else:
                assert got == value, (fname, key, got, value)

    check(raw, c)


def test_config_override_list_and_immutability(tmp_path):
    yml = tmp_path / "c.yml"
    yml.write_text("ALPHA: 1000.0\nBETA: 0.5\n")
    c = Config(str(yml), ["OPTIM.BATCH_SIZE", 2048, "BETA", 0.7])
    assert c.ALPHA == 1000.0
    assert c.OPTIM.BATCH_SIZE == 2048
    assert c.BETA == 0.7
    with pytest.raises(AttributeError):
        c.ALPHA = 5.0
    with pytest.raises(KeyError):
        Config(str(yml), ["NO.SUCH.KEY", 1])


def test_config_dump_roundtrip(tmp_path):
    c = Config(None, ["OPTIM.LR_INITIAL", 0.003])
    path = tmp_path / "dump.yml"
    c.dump(str(path))
    c2 = Config(str(path))
    assert c2.OPTIM.LR_INITIAL == 0.003
    assert c2.to_dict() == c.to_dict()


def _toy_vocab():
    return Vocabulary(
        {
            "questions": SPECIAL_TOKENS + ["what", "color", "is", "the", "cube"],
            "programs": SPECIAL_TOKENS + ["scene", "count", "filter_color[red]"],
            "answers": ["red", "blue", "0", "1", "@@UNKNOWN@@"],
        },
        non_padded_namespaces=["answers"],
    )


def test_vocabulary_special_token_indices():
    v = _toy_vocab()
    for ns in ("questions", "programs"):
        assert v.get_token_index("@@PADDING@@", ns) == 0
        assert v.get_token_index("@@UNKNOWN@@", ns) == 1
        assert v.get_token_index("@start@", ns) == 2
        assert v.get_token_index("@end@", ns) == 3
    # answers: non-padded, @@UNKNOWN@@ at the end
    assert v.get_token_index("red", "answers") == 0
    assert v.get_token_index("@@UNKNOWN@@", "answers") == v.get_vocab_size("answers") - 1


def test_vocabulary_oov_behavior():
    v = _toy_vocab()
    assert v.get_token_index("zebra", "questions") == 1  # maps to @@UNKNOWN@@
    assert v.get_token_from_index(4, "questions") == "what"


def test_vocabulary_files_roundtrip(tmp_path):
    v = _toy_vocab()
    d = str(tmp_path / "vocab")
    v.save_to_files(d)
    # AllenNLP directory format: padded namespaces start at @@UNKNOWN@@ (padding
    # implicit), non-padded namespaces list all tokens.
    qlines = open(os.path.join(d, "questions.txt")).read().splitlines()
    assert qlines[0] == "@@UNKNOWN@@"
    alines = open(os.path.join(d, "answers.txt")).read().splitlines()
    assert alines[0] == "red" and alines[-1] == "@@UNKNOWN@@"

    v2 = Vocabulary.from_files(d)
    for ns in v.namespaces:
        assert v2.get_token_to_index_vocabulary(ns) == v.get_token_to_index_vocabulary(ns)
