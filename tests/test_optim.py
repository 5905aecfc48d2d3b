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
