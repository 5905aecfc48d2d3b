r"""
Phase datasets (reference ``probnmn/data/datasets.py``), numpy-native.

Each dataset supports ``__len__`` / ``__getitem__(index) -> dict of np arrays`` and
— crucially for throughput — ``get_batch(indices)`` vectorized gathers that the
batch pipeline uses to build fixed-shape host batches without per-example Python.

The supervision subset is selected with the *global* NumPy RNG exactly as the
reference does (``datasets.py:67-78``): filter questions longer than
``supervision_question_max_length``, then ``np.random.choice(..., replace=False)``.
Given the same ``RANDOM_SEED`` this reproduces the reference's supervised example
ids bit-for-bit — which examples carry program supervision is load-bearing for
semi-supervised parity.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from probnmn_tpu.data.readers import ClevrImageFeaturesReader, ClevrTokensReader


def _make_supervision_list(
    tokens: ClevrTokensReader, num_supervision: int, supervision_question_max_length: int
) -> np.ndarray:
    supervision_list = np.zeros(len(tokens))
    if tokens.split == "train" and num_supervision < len(tokens):
        example_indices = np.ones(len(tokens))
        question_lengths = (tokens.questions != 0).sum(-1)
        example_indices[question_lengths > supervision_question_max_length] = 0
        example_indices = example_indices.nonzero()[0]
        # Deterministic for a fixed global numpy seed (set in scripts/train.py).
        supervision_examples = np.random.choice(
            example_indices, replace=False, size=num_supervision
        )
        supervision_list[supervision_examples] = 1
    else:
        supervision_list += 1
    return supervision_list.astype(np.int64)


class ProgramPriorDataset:
    r"""Yields {"program"} only (reference ``datasets.py:8-32``)."""

    def __init__(self, tokens_h5path: str):
        self._reader = ClevrTokensReader(tokens_h5path)

    def __len__(self):
        return len(self._reader)

    def __getitem__(self, index):
        return {"program": self._reader.programs[index].astype(np.int64)}

    def get_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        return {"program": self._reader.programs[indices].astype(np.int64)}

    @property
    def split(self):
        return self._reader.split


class QuestionCodingDataset:
    r"""{"program", "question", "supervision"} (reference ``datasets.py:35-107``)."""

    def __init__(
        self,
        tokens_h5path: str,
        num_supervision: int = 699989,
        supervision_question_max_length: int = 40,
    ):
        self._tokens = ClevrTokensReader(tokens_h5path)
        self._supervision_list = _make_supervision_list(
            self._tokens, num_supervision, supervision_question_max_length
        )

    def __len__(self):
        return len(self._tokens)

    def __getitem__(self, index):
        return {
            "program": self._tokens.programs[index].astype(np.int64),
            "question": self._tokens.questions[index].astype(np.int64),
            "supervision": self._supervision_list[index],
        }

    def get_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        return {
            "program": self._tokens.programs[indices].astype(np.int64),
            "question": self._tokens.questions[indices].astype(np.int64),
            "supervision": self._supervision_list[indices],
        }

    def get_supervision_list(self) -> np.ndarray:
        return self._supervision_list

    @property
    def split(self):
        return self._tokens.split


class ModuleTrainingDataset:
    r"""{"question", "answer", "image", "program"} (reference ``datasets.py:110-146``)."""

    def __init__(self, tokens_h5path: str, features_h5path: str, in_memory: bool = True):
        self._tokens = ClevrTokensReader(tokens_h5path)
        self._features = ClevrImageFeaturesReader(features_h5path, in_memory)

    def __len__(self):
        return len(self._tokens)

    def __getitem__(self, index):
        return {
            "question": self._tokens.questions[index].astype(np.int64),
            "answer": self._tokens.answers[index].astype(np.int64),
            "image": np.asarray(self._features[self._tokens.image_indices[index]], np.float32),
            "program": self._tokens.programs[index].astype(np.int64),
        }

    def get_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        image_indices = self._tokens.image_indices[indices]
        return {
            "question": self._tokens.questions[indices].astype(np.int64),
            "answer": self._tokens.answers[indices].astype(np.int64),
            "image": np.asarray(self._features[image_indices], np.float32),
            "program": self._tokens.programs[indices].astype(np.int64),
        }

    @property
    def split(self):
        return self._tokens.split


class JointTrainingDataset:
    r"""Union of the above; test split yields {"question_index", "question", "image"}
    (reference ``datasets.py:149-240``)."""

    def __init__(
        self,
        tokens_h5path: str,
        features_h5path: str,
        num_supervision: int = 699989,
        supervision_question_max_length: int = 30,
        in_memory: bool = True,
    ):
        self._tokens = ClevrTokensReader(tokens_h5path)
        self._features = ClevrImageFeaturesReader(features_h5path, in_memory)
        self._supervision_list = _make_supervision_list(
            self._tokens, num_supervision, supervision_question_max_length
        )

    def __len__(self):
        return len(self._tokens)

    def __getitem__(self, index):
        return self.get_batch(np.asarray([index]))

    def get_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        image_indices = self._tokens.image_indices[indices]
        if self.split == "test":
            return {
                "question_index": np.asarray(indices, np.int64),
                "question": self._tokens.questions[indices].astype(np.int64),
                "image": np.asarray(self._features[image_indices], np.float32),
            }
        return {
            "question": self._tokens.questions[indices].astype(np.int64),
            "answer": self._tokens.answers[indices].astype(np.int64),
            "program": self._tokens.programs[indices].astype(np.int64),
            "image": np.asarray(self._features[image_indices], np.float32),
            "supervision": self._supervision_list[indices],
        }

    def get_supervision_list(self) -> np.ndarray:
        return self._supervision_list

    @property
    def split(self):
        return self._tokens.split
