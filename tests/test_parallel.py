"""Multi-device sharding on the virtual 8-device CPU mesh: mesh construction,
parameter placement rules, and a data-parallel train step with XLA-inserted
gradient all-reduce."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from probnmn_tpu.models.program_prior import (
    ProgramPriorSpec,
    init_program_prior_params,
    program_prior_forward,
)
from probnmn_tpu.parallel import mesh as mesh_lib
from probnmn_tpu.training.optim import make_optimizer


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    m = mesh_lib.make_mesh(8, model_parallel=2)
    assert dict(m.shape) == {"data": 4, "model": 2}
    m1 = mesh_lib.make_mesh(8)
    assert dict(m1.shape) == {"data": 8, "model": 1}


def test_data_parallel_train_step_matches_single_device():
    spec = ProgramPriorSpec(vocab_size=12, input_size=8, hidden_size=8, num_layers=1)
    params = init_program_prior_params(jax.random.PRNGKey(0), spec)
    tx = make_optimizer(1e-2)
    opt_state = tx.init(params)
    rs = np.random.RandomState(0)
    batch = jnp.asarray(rs.randint(4, 12, (16, 6)), jnp.int32)
    rng = jax.random.PRNGKey(1)

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            return program_prior_forward(p, spec, batch, rng)["loss"].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # single device
    p1, _, loss1 = jax.jit(train_step)(params, opt_state, batch)

    # 8-way data parallel: batch sharded, params replicated
    m = mesh_lib.make_mesh(8)
    with m:
        sharded_batch = mesh_lib.shard_batch(m, {"x": batch})["x"]
        sharded_params = mesh_lib.shard_params(m, params)
        sharded_opt = tx.init(sharded_params)
        p8, _, loss8 = jax.jit(train_step)(sharded_params, sharded_opt, sharded_batch)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_param_sharding_rules_fall_back_when_not_divisible():
    m = mesh_lib.make_mesh(8, model_parallel=2)
    params = {
        "attention": {"conv1": {"w": jnp.zeros((6, 3, 3, 8, 8))}},  # 6 % 2 == 0 -> sharded
        "same": {"conv": {"w": jnp.zeros((5, 9, 1))}},              # 5 % 2 != 0 -> replicated
    }
    with m:
        placed = mesh_lib.shard_params(m, params)
    att_sharding = placed["attention"]["conv1"]["w"].sharding
    same_sharding = placed["same"]["conv"]["w"].sharding
    assert att_sharding.spec[0] == "model"
    assert all(axis is None for axis in same_sharding.spec)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
