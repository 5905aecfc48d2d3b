r"""
CheckpointManager: periodic serialization of named pytrees with best-checkpoint
tracking and *partial named restore* (reference ``probnmn/utils/checkpointing.py``).

Files are single msgpack blobs (flax.serialization) holding
``{name: pytree_state, ..., "iteration": int}``. Partial loading is load-bearing:
each phase constructs a manager with only the models it needs and restores those
names from an upstream multi-model checkpoint (e.g. the module-training phase pulls
just ``program_generator`` out of the question-coding checkpoint). Unknown names in
the file are ignored with a log line; registered names missing from the file are
reported back.

The earliest-checkpoint pruning bug in the reference (``checkpointing.py:55,111`` —
an AttributeError on a stale attribute name) is fixed here, as SURVEY.md §2.10
prescribes. Interop with reference ``.pth`` checkpoints lives in
``probnmn_tpu.utils.torch_interop``.
"""
from __future__ import annotations

import logging
import os
import pathlib
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)


def save_objects(path: str, objects: Dict[str, Any], iteration: int = -1) -> None:
    payload = {name: serialization.to_state_dict(obj) for name, obj in objects.items()}
    payload["iteration"] = iteration
    data = serialization.msgpack_serialize(payload)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_objects(
    path: str, templates: Dict[str, Any]
) -> Tuple[Dict[str, Any], int, List[str]]:
    r"""Restore the named subtrees present in both ``templates`` and the file.

    Returns (restored dict — templates overwritten where found, iteration,
    names_not_found_in_file).
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    iteration = int(payload.pop("iteration", -1))

    restored: Dict[str, Any] = {}
    not_found: List[str] = []
    for name, template in templates.items():
        if name in payload:
            logger.info("Loading %s from %s", name, path)
            restored[name] = serialization.from_state_dict(template, payload[name])
        else:
            restored[name] = template
            not_found.append(name)
    for name in payload:
        if name not in templates:
            logger.info("%s not found in checkpointables.", name)
    if not_found:
        logger.info("Checkpointables not found in file: %s", not_found)
    return restored, iteration, not_found


def load_objects_flexible(
    path: str,
    templates: Dict[str, Any],
    specs: Optional[Dict[str, Any]] = None,
    vocabulary=None,
) -> Tuple[Dict[str, Any], int, List[str]]:
    r"""Like :func:`load_objects`, but transparently accepts reference ``.pth``
    checkpoints (torch serialization; ported weight-for-weight via
    ``utils.torch_interop``). ``specs`` maps each template name to its model
    spec; ``vocabulary`` is needed for the NMN's per-token banks."""
    if path.endswith(".pth"):
        from probnmn_tpu.utils import torch_interop

        assert specs is not None, "porting a .pth checkpoint requires model specs"
        ported = torch_interop.load_reference_checkpoint(
            path, {k: specs[k] for k in templates}, vocabulary
        )
        restored = dict(templates)
        not_found = []
        for name in templates:
            if name in ported:
                logger.info("Ported %s from reference checkpoint %s", name, path)
                restored[name] = ported[name]
            else:
                not_found.append(name)
        if not_found:
            logger.info("Checkpointables not found in file: %s", not_found)
        return restored, -1, not_found
    return load_objects(path, templates)


class CheckpointManager:
    r"""
    Parameters
    ----------
    serialization_dir: str
        Directory for ``checkpoint_{iteration}.ckpt`` files and ``checkpoint_best.ckpt``.
    keep_recent: int
        Number of recent checkpoints kept on disk (best checkpoint always kept).
    """

    SUFFIX = ".ckpt"

    def __init__(self, serialization_dir: str = "/tmp", keep_recent: int = 10):
        self.serialization_dir = pathlib.Path(serialization_dir)
        self.serialization_dir.mkdir(parents=True, exist_ok=True)
        self.keep_recent = keep_recent
        self._best_metric = -1e-12
        self._recent_iterations: List[int] = []

    def step(
        self, iteration: int, objects: Dict[str, Any], metric: Optional[float] = None
    ) -> None:
        objects = jax.device_get(objects)
        path = self.serialization_dir / f"checkpoint_{iteration}{self.SUFFIX}"
        save_objects(str(path), objects, iteration)

        if metric is not None and metric > self._best_metric:
            self._best_metric = metric
            save_objects(
                str(self.serialization_dir / f"checkpoint_best{self.SUFFIX}"),
                objects,
                iteration,
            )

        self._recent_iterations.append(iteration)
        while len(self._recent_iterations) > self.keep_recent:
            earliest = self._recent_iterations.pop(0)
            stale = self.serialization_dir / f"checkpoint_{earliest}{self.SUFFIX}"
            if stale.exists():
                stale.unlink()

    def load(self, checkpoint_path: str, templates: Dict[str, Any]):
        logger.info("Loading checkpoint from %s", checkpoint_path)
        restored, iteration, _ = load_objects(checkpoint_path, templates)
        return restored, iteration
