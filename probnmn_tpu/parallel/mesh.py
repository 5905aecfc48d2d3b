r"""
Device mesh + sharding rules.

The reference's only parallelism is single-process ``nn.DataParallel`` scatter/
gather over GPUs (reference ``_trainer.py:98-100``). TPU-natively this becomes a
``jax.sharding.Mesh`` with the batch sharded over the ``data`` axis and parameters
replicated (or sharded over ``model`` where a dimension allows): under jit, GSPMD
inserts the gradient all-reduce over ICI automatically — no NCCL, no explicit
collectives in user code.

Model scale note: all four models total <20M params, so data parallelism is the
profitable strategy; the ``model`` axis exists to shard the largest leaves (the
NMN classifier and per-token module banks — the latter is effectively *expert
parallelism* over module instances) and, mostly, to exercise multi-axis sharding
in the multichip dry-run.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    r"""Mesh of shape (n_devices // model_parallel, model_parallel) over
    ('data', 'model')."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def auto_mesh(
    num_devices: Optional[int] = None,
    batch_size: Optional[int] = None,
    model_parallel: int = 1,
) -> Optional[Mesh]:
    r"""Production-trainer mesh policy (replaces the reference's ``--gpu-ids``
    DataParallel, reference ``_trainer.py:92-100``): ``None``/1 -> single device
    (no mesh), 0 -> all devices, N -> N devices; the data axis is clamped to the
    largest count dividing ``batch_size`` (batches shard evenly — XLA collectives
    need equal shards, unlike torch DataParallel's ragged scatter).
    ``model_parallel`` > 1 reserves that many devices per data shard for the
    'model' axis (NMN bank expert-parallelism / classifier sharding — see
    ``_param_spec``); it must divide ``num_devices`` or it falls back to 1."""
    n = len(jax.devices()) if num_devices == 0 else (num_devices or 1)
    n = min(n, len(jax.devices()))
    if n <= 1:
        return None
    mp = model_parallel if model_parallel > 0 and n % model_parallel == 0 else 1
    data = n // mp
    if batch_size is not None:
        while data > 1 and batch_size % data != 0:
            data -= 1
    n = data * mp
    return make_mesh(n, model_parallel=mp) if n > 1 else None


def shard_map_dp(fn, mesh: Mesh, n_replicated: int, n_batch: int):
    r"""shard_map a per-example fused-kernel call over the mesh's leading
    (data) axis: the first ``n_replicated`` args replicate (``P()``), the next
    ``n_batch`` args shard their leading dim, and every output leaf shards its
    leading dim. This is the one pattern behind all the Pallas data-parallel
    wrappers (``ops/pallas/seq2seq_train.py``, ``ops/pallas/nmn_interpreter.py``
    — the kernels are per-example maps, so batch sharding needs no
    collectives; Pallas custom calls cannot auto-partition under GSPMD).
    ``check_vma=False`` because the kernels' outputs are genuinely per-shard;
    replicated-arg cotangents are psummed by the shard_map transpose.
    (``seq2seq_decode.fused_sampling_forward_dp`` keeps bespoke specs — its
    noise tensor shards a non-leading dim and its rng key needs a per-shard
    fold-in.)"""
    from jax import shard_map

    data = P(mesh.axis_names[0])
    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(),) * n_replicated + (data,) * n_batch,
        out_specs=data,
        check_vma=False,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    r"""Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def _param_spec(path: Tuple, leaf) -> P:
    r"""Sharding rule for a parameter leaf, keyed by its tree path.

    - NMN conv banks (leading axis = module instance): shard axis 0 over 'model'
      when divisible — expert-parallel over module instances.
    - Large classifier / projection matrices: shard the output dim over 'model'.
    - Everything else: replicated (these models are small; ICI all-gather of tiny
      weights would cost more than it saves).
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    shape = getattr(leaf, "shape", ())
    if any(n in ("attention", "query", "relate", "same", "compare") for n in names):
        return P(MODEL_AXIS) if shape and shape[0] > 1 else P()
    if "classifier" in names and len(shape) == 2:
        return P(MODEL_AXIS, None)
    return P()


def shard_params(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    r"""Place parameters on the mesh according to ``_param_spec`` (divisibility-
    checked; falls back to replication when a dim does not divide the axis)."""
    model_size = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        spec = _param_spec(path, leaf)
        # Fall back to replication when the sharded dim does not divide the axis.
        for dim, axis_name in enumerate(spec):
            if axis_name is not None and leaf.shape[dim] % model_size != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
