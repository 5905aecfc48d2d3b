r"""ReduceLROnPlateau parity with torch (reference ``_trainer.py:112-118`` uses
``torch.optim.lr_scheduler.ReduceLROnPlateau(mode="max", factor=LR_GAMMA,
patience=LR_PATIENCE, threshold=1e-3)``), including negative metric values where
the relative threshold margin flips direction."""
import numpy as np
import pytest
import torch

from probnmn_tpu.training.optim import ReduceLROnPlateau


def _torch_lr_trajectory(metrics, lr0, factor, patience):
    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([param], lr=lr0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=factor, patience=patience, threshold=1e-3
    )
    out = []
    for m in metrics:
        sched.step(m)
        out.append(opt.param_groups[0]["lr"])
    return out


@pytest.mark.parametrize("offset", [0.0, -5.0], ids=["positive", "negative"])
def test_reduce_lr_on_plateau_matches_torch(offset):
    rs = np.random.RandomState(3)
    metrics = list(rs.randn(200) * 0.7 + offset)
    ours = ReduceLROnPlateau(1e-3, factor=0.5, patience=3)
    got = [ours.step(m) for m in metrics]
    want = _torch_lr_trajectory(metrics, 1e-3, 0.5, 3)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_reduce_lr_on_plateau_negative_plateau_reduces():
    r"""A flat negative metric is a plateau: torch's unconditional
    ``a > best * (1 + threshold)`` means -1.0 never beats best=-1.0."""
    ours = ReduceLROnPlateau(1e-2, factor=0.1, patience=2)
    lrs = [ours.step(-1.0) for _ in range(5)]
    want = _torch_lr_trajectory([-1.0] * 5, 1e-2, 0.1, 2)
    np.testing.assert_allclose(lrs, want, rtol=1e-12)


def test_adam_mu_dtype_bf16_halves_moment_storage_and_tracks_f32():
    r"""OPTIM.ADAM_MU_DTYPE=bfloat16 (extension; the reference's torch Adam is
    always f32): first moment stored bf16, updates stay close to the f32
    optimizer over a short trajectory."""
    import jax
    import jax.numpy as jnp
    from probnmn_tpu.training.optim import make_optimizer

    params = {"w": jnp.asarray(np.random.RandomState(0).randn(64, 64), jnp.float32)}

    def loss(p):
        return jnp.sum(jnp.sin(p["w"]) ** 2)

    trajs = {}
    for mu_dtype in ("float32", "bfloat16"):
        tx = make_optimizer(1e-2, mu_dtype=mu_dtype)
        state = tx.init(params)
        mu_leaves = [
            leaf for leaf in jax.tree_util.tree_leaves(state)
            if hasattr(leaf, "dtype") and leaf.shape == (64, 64)
        ]
        assert any(leaf.dtype == jnp.dtype(mu_dtype) for leaf in mu_leaves)
        p = params
        for _ in range(20):
            grads = jax.grad(loss)(p)
            updates, state = tx.update(grads, state, p)
            import optax
            p = optax.apply_updates(p, updates)
        trajs[mu_dtype] = p["w"]
    # bf16 first moment perturbs the trajectory only at bf16 resolution.
    np.testing.assert_allclose(trajs["bfloat16"], trajs["float32"], atol=5e-3)

    with pytest.raises(ValueError):
        make_optimizer(1e-2, mu_dtype="float16")
