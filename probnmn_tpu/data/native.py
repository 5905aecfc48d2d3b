r"""
ctypes bindings for the native C++ preprocessing runtime
(``native/clevr_tokenizer.cpp``): batch question tokenization and program
prefix compilation without per-example Python loops.

The shared library is built on demand with g++ (cached next to the source);
every entry point has a pure-Python fallback (``probnmn_tpu.data.preprocessing``)
so the package works without a toolchain. Equality between the two paths is
covered by tests.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from probnmn_tpu.data import preprocessing
from probnmn_tpu.data.vocabulary import Vocabulary

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SOURCE = os.path.join(_NATIVE_DIR, "clevr_tokenizer.cpp")
_LIBRARY = os.path.join(_NATIVE_DIR, "libclevr_tokenizer.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build_library() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIBRARY, _SOURCE],
            check=True,
            capture_output=True,
        )
        return True
    except Exception as error:  # toolchain missing or compile error
        logger.warning("Native tokenizer build failed (%s); using Python fallback.", error)
        return False


def get_library() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIBRARY) or (
        os.path.exists(_SOURCE)
        and os.path.getmtime(_SOURCE) > os.path.getmtime(_LIBRARY)
    ):
        if not os.path.exists(_SOURCE) or not _build_library():
            _load_failed = True
            return None
    lib = ctypes.CDLL(_LIBRARY)
    lib.clevr_vocab_create.restype = ctypes.c_void_p
    lib.clevr_vocab_create.argtypes = [ctypes.c_char_p, ctypes.c_int32]
    lib.clevr_vocab_free.argtypes = [ctypes.c_void_p]
    lib.clevr_tokenize_questions.restype = ctypes.c_int32
    lib.clevr_tokenize_questions.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.clevr_program_prefix.restype = ctypes.c_int32
    lib.clevr_program_prefix.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    _lib = lib
    return _lib


class NativeTokenizer:
    r"""Batch tokenizer over one vocabulary namespace. Falls back to Python."""

    def __init__(self, vocabulary: Vocabulary, namespace: str = "questions"):
        self._vocabulary = vocabulary
        self._namespace = namespace
        self._handle = None
        lib = get_library()
        if lib is not None:
            tokens = [
                vocabulary.get_token_from_index(i, namespace)
                for i in range(vocabulary.get_vocab_size(namespace))
            ]
            blob = b"\0".join(t.encode() for t in tokens) + b"\0"
            self._handle = lib.clevr_vocab_create(blob, len(tokens))
            self._unk = vocabulary.get_token_index("@@UNKNOWN@@", namespace)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def tokenize_questions(
        self, questions: Sequence[str], max_len: int = 64
    ) -> Tuple[np.ndarray, np.ndarray]:
        r"""Returns (ids (n, max_len) int32 zero-padded, lengths (n,))."""
        lib = get_library()
        if self._handle is None or lib is None:
            rows = [preprocessing.tokenize_question(q) for q in questions]
            lengths = np.asarray([len(r) for r in rows], np.int32)
            out = np.zeros((len(rows), max_len), np.int32)
            for i, row in enumerate(rows):
                for j, token in enumerate(row[:max_len]):
                    out[i, j] = self._vocabulary.get_token_index(token, self._namespace)
            return out, lengths
        blob = b"\0".join(q.encode() for q in questions) + b"\0"
        out = np.zeros((len(questions), max_len), np.int32)
        lengths = np.zeros(len(questions), np.int32)
        lib.clevr_tokenize_questions(
            self._handle, blob, len(questions), self._unk,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_len,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out, lengths

    def __del__(self):
        lib = _lib
        if lib is not None and self._handle is not None:
            lib.clevr_vocab_free(self._handle)


def program_prefix_ids(
    program_list: List[Dict[str, Any]], vocabulary: Vocabulary, max_out: int = 64
) -> np.ndarray:
    r"""Program annotation list -> prefix-notation vocab ids (native or fallback)."""
    lib = get_library()
    if lib is None or not program_list:
        tokens = preprocessing.tokenize_program(program_list) if program_list else []
        return np.asarray(
            [vocabulary.get_token_index(t, "programs") for t in tokens], np.int32
        )
    func_ids = np.asarray(
        [
            vocabulary.get_token_index(preprocessing.program_token_name(t), "programs")
            for t in program_list
        ],
        np.int32,
    )
    offsets = np.zeros(len(program_list) + 1, np.int32)
    children: List[int] = []
    for i, token in enumerate(program_list):
        children.extend(token["inputs"])
        offsets[i + 1] = len(children)
    child_index = np.asarray(children, np.int32)
    if child_index.size == 0:
        child_index = np.zeros(1, np.int32)
    out = np.zeros(max_out, np.int32)
    n = lib.clevr_program_prefix(
        func_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        child_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(program_list),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_out,
    )
    if n < 0:
        raise ValueError(f"program prefix longer than {max_out}")
    return out[:n]
