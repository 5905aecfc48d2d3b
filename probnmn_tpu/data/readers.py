r"""
HDF5 readers (reference ``probnmn/data/readers.py``), torch-free.

``ClevrTokensReader``: loads the whole token file into host memory (questions,
programs, answers, image_indices + a ``split`` attr; test split has no
programs/answers). ``ClevrImageFeaturesReader``: a ``features`` dataset of shape
(num_images, 1024, 14, 14); optionally memory-resident, otherwise read per index —
feature files are 50-100 GB, so the streaming path keeps one persistent h5py handle
(instead of the reference's reopen-per-item) and supports batched fancy indexing
for the prefetch pipeline.
"""
from __future__ import annotations

import threading
from typing import Dict

import h5py
import numpy as np


class ClevrTokensReader:
    def __init__(self, tokens_h5path: str):
        with h5py.File(tokens_h5path, "r") as f:
            self._split = f.attrs["split"]
            if isinstance(self._split, bytes):
                self._split = self._split.decode()
            if self._split != "test":
                self.programs = f["programs"][:]
                self.answers = f["answers"][:]
            self.questions = f["questions"][:]
            self.image_indices = f["image_indices"][:]

    def __len__(self) -> int:
        return len(self.image_indices)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        if self.split == "test":
            return {
                "question": self.questions[index],
                "image_index": self.image_indices[index],
            }
        return {
            "program": self.programs[index],
            "question": self.questions[index],
            "answer": self.answers[index],
            "image_index": self.image_indices[index],
        }

    @property
    def split(self) -> str:
        return self._split


class ClevrImageFeaturesReader:
    r"""Features reader; ``__getitem__`` accepts an int or a sorted index array."""

    def __init__(self, features_h5path: str, in_memory: bool = True):
        self.features_h5path = features_h5path
        self._in_memory = in_memory
        self._handle = None
        # Streaming reads may come from multiple threads (e.g. the HTTP
        # serving CLI); the lazy open must not race and leak handles.
        self._open_lock = threading.Lock()
        with h5py.File(features_h5path, "r") as f:
            self._split = f.attrs["split"]
            if isinstance(self._split, bytes):
                self._split = self._split.decode()
            self._num = f["features"].shape[0]
            self.features = f["features"][:] if in_memory else None

    def __len__(self) -> int:
        return self._num

    def _file(self):
        if self._handle is None:
            with self._open_lock:
                if self._handle is None:
                    self._handle = h5py.File(self.features_h5path, "r")
        return self._handle

    def __getitem__(self, index):
        if self._in_memory:
            return self.features[index]
        if np.ndim(index) == 0:
            return self._file()["features"][int(index)]
        # h5py fancy indexing needs sorted unique indices; undo the sort after.
        index = np.asarray(index)
        order = np.argsort(index, kind="stable")
        sorted_idx = index[order]
        uniq, inverse = np.unique(sorted_idx, return_inverse=True)
        block = self._file()["features"][uniq.tolist()]
        out = block[inverse]
        undo = np.empty_like(order)
        undo[order] = np.arange(len(order))
        return out[undo]

    @property
    def split(self) -> str:
        return self._split
