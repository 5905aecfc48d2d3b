"""Synthetic CLEVR-shaped fixtures: vocabulary dir + token/feature H5s + config.

Everything is tiny (seq lens, channels) so the full 4-phase pipeline runs in
seconds on one CPU core, but structurally faithful: real program-token names
(so the NMN builds all module kinds), valid prefix-notation programs, H5 layouts
identical to the reference preprocessing output.
"""
import os

import h5py
import numpy as np

from probnmn_tpu.config import Config
from probnmn_tpu.data.vocabulary import SPECIAL_TOKENS, Vocabulary

PROGRAM_TOKENS = SPECIAL_TOKENS + [
    "scene", "unique", "intersect", "union", "equal_color", "count", "exist",
    "query_shape", "relate[left]", "same_size", "filter_color[red]",
    "filter_shape[cube]",
]
QUESTION_WORDS = SPECIAL_TOKENS + [
    "what", "how", "many", "is", "there", "a", "red", "cube", "sphere", "left",
    "of", "the", "color", "shape", "same", "size", ";",
]
ANSWERS = ["0", "1", "2", "blue", "cube", "no", "red", "sphere", "yes", "@@UNKNOWN@@"]

PROGRAM_TEMPLATES = [
    ["count", "filter_color[red]", "scene"],
    ["exist", "filter_shape[cube]", "scene"],
    ["query_shape", "unique", "filter_color[red]", "scene"],
    ["count", "intersect", "filter_color[red]", "scene", "filter_shape[cube]", "scene"],
    ["count", "same_size", "filter_color[red]", "scene"],
    ["count", "filter_shape[cube]", "relate[left]", "filter_color[red]", "scene"],
    ["equal_color", "query_shape", "unique", "filter_color[red]", "scene",
     "query_shape", "unique", "filter_shape[cube]", "scene"],
]

MAX_PROGRAM_LEN = 10
MAX_QUESTION_LEN = 12
NUM_IMAGES = 6
FEATURE_SHAPE = (12, 6, 6)  # (C, H, W) as stored in the H5 (NCHW like the reference)


def build_vocab(directory: str) -> Vocabulary:
    vocab = Vocabulary(
        {
            "questions": QUESTION_WORDS,
            "programs": PROGRAM_TOKENS,
            "answers": ANSWERS,
        },
        non_padded_namespaces=["answers"],
    )
    vocab.save_to_files(directory)
    return vocab


def write_tokens_h5(path: str, vocab: Vocabulary, split: str, n: int, seed: int) -> None:
    rs = np.random.RandomState(seed)
    programs = np.zeros((n, MAX_PROGRAM_LEN), np.int64)
    questions = np.zeros((n, MAX_QUESTION_LEN), np.int64)
    answers = np.zeros((n,), np.int64)
    image_indices = rs.randint(0, NUM_IMAGES, (n,))
    for i in range(n):
        template = PROGRAM_TEMPLATES[rs.randint(len(PROGRAM_TEMPLATES))]
        ids = [vocab.get_token_index(t, "programs") for t in template]
        programs[i, : len(ids)] = ids
        qlen = rs.randint(4, MAX_QUESTION_LEN + 1)
        questions[i, :qlen] = rs.randint(4, len(QUESTION_WORDS), qlen)
        answers[i] = rs.randint(0, len(ANSWERS) - 1)
    with h5py.File(path, "w") as f:
        f.attrs["split"] = split
        if split != "test":
            f.create_dataset("programs", data=programs)
            f.create_dataset("answers", data=answers)
        f.create_dataset("questions", data=questions)
        f.create_dataset("image_indices", data=image_indices)


def write_features_h5(path: str, split: str, seed: int) -> None:
    rs = np.random.RandomState(seed)
    feats = rs.randn(NUM_IMAGES, *FEATURE_SHAPE).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.attrs["split"] = split
        f.create_dataset("features", data=feats)


def make_fixture_config(root: str, phase: str, extra_overrides=()) -> Config:
    overrides = [
        "PHASE", phase,
        "DATA.VOCABULARY", os.path.join(root, "vocab"),
        "DATA.TRAIN_TOKENS", os.path.join(root, "train_tokens.h5"),
        "DATA.VAL_TOKENS", os.path.join(root, "val_tokens.h5"),
        "DATA.TEST_TOKENS", os.path.join(root, "test_tokens.h5"),
        "DATA.TRAIN_FEATURES", os.path.join(root, "train_features.h5"),
        "DATA.VAL_FEATURES", os.path.join(root, "val_features.h5"),
        "DATA.TEST_FEATURES", os.path.join(root, "test_features.h5"),
        "CHECKPOINTS.PROGRAM_PRIOR", os.path.join(root, "program_prior_best.ckpt"),
        "CHECKPOINTS.QUESTION_CODING", os.path.join(root, "question_coding_best.ckpt"),
        "CHECKPOINTS.MODULE_TRAINING", os.path.join(root, "module_training_best.ckpt"),
        "OPTIM.BATCH_SIZE", 8,
        "OPTIM.NUM_ITERATIONS", 10,
        "OPTIM.LR_INITIAL", 0.01,
        "SUPERVISION", 12,
        "SUPERVISION_QUESTION_MAX_LENGTH", 10,
        "PROGRAM_PRIOR.INPUT_SIZE", 16, "PROGRAM_PRIOR.HIDDEN_SIZE", 12,
        "PROGRAM_PRIOR.NUM_LAYERS", 1,
        "PROGRAM_GENERATOR.INPUT_SIZE", 16, "PROGRAM_GENERATOR.HIDDEN_SIZE", 12,
        "PROGRAM_GENERATOR.NUM_LAYERS", 1,
        "QUESTION_RECONSTRUCTOR.INPUT_SIZE", 16, "QUESTION_RECONSTRUCTOR.HIDDEN_SIZE", 12,
        "QUESTION_RECONSTRUCTOR.NUM_LAYERS", 1,
        "NMN.IMAGE_FEATURE_SIZE", list(FEATURE_SHAPE),
        "NMN.MODULE_CHANNELS", 8,
        "NMN.CLASS_PROJECTION_CHANNELS", 16,
        "NMN.CLASSIFIER_LINEAR_SIZE", 12,
    ] + list(extra_overrides)
    return Config(None, overrides)


def build_fixture_data(root: str, n_train: int = 40, n_val: int = 16) -> Vocabulary:
    os.makedirs(root, exist_ok=True)
    vocab = build_vocab(os.path.join(root, "vocab"))
    write_tokens_h5(os.path.join(root, "train_tokens.h5"), vocab, "train", n_train, 0)
    write_tokens_h5(os.path.join(root, "val_tokens.h5"), vocab, "val", n_val, 1)
    write_tokens_h5(os.path.join(root, "test_tokens.h5"), vocab, "test", n_val, 2)
    write_features_h5(os.path.join(root, "train_features.h5"), "train", 3)
    write_features_h5(os.path.join(root, "val_features.h5"), "val", 4)
    write_features_h5(os.path.join(root, "test_features.h5"), "test", 5)
    return vocab
