r"""
Fused teacher-forced seq2seq forward + BPTT backward vs the XLA scan path.

``fused_tf_loss`` (``ops/pallas/seq2seq_train.py``) must reproduce, in
interpret mode at f32, BOTH the per-example loss and every parameter-gradient
leaf of ``seq2seq_forward``'s teacher-forced CE (reference ``Seq2SeqBase``
loss scheme, seq2seq_base.py:295-341), and — in REINFORCE mode — of the
free-running length-normalized logprob loss evaluated at the same sampled
sequence (seq2seq_base.py:235-246; sampling is a stop-gradient, so the
gradients coincide).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probnmn_tpu.models.seq2seq import Seq2SeqSpec, init_seq2seq_params, seq2seq_forward
from probnmn_tpu.ops.pallas.seq2seq_train import fused_tf_loss

SPEC = Seq2SeqSpec(source_vocab_size=90, target_vocab_size=50, max_decoding_steps=26)


def _batch(seed, batch=12, src_len=45, tgt_len=26):
    rs = np.random.RandomState(seed)
    src = rs.randint(4, SPEC.source_vocab_size, (batch, src_len)).astype(np.int32)
    src *= np.arange(src_len)[None, :] < rs.randint(2, src_len, (batch,))[:, None]
    tgt = rs.randint(4, SPEC.target_vocab_size, (batch, tgt_len)).astype(np.int32)
    tgt *= np.arange(tgt_len)[None, :] < rs.randint(2, tgt_len, (batch,))[:, None]
    src[0] = rs.randint(4, SPEC.source_vocab_size, (src_len,))  # full-length row
    return jnp.asarray(src), jnp.asarray(tgt)


def _grad_trees_match(gk, gx, atol=5e-6):
    for (pk, vk), (_, vx) in zip(
        jax.tree_util.tree_flatten_with_path(gk)[0],
        jax.tree_util.tree_flatten_with_path(gx)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(vk), np.asarray(vx), atol=atol,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(pk)}",
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_teacher_forced_loss_and_grads_match_xla(seed):
    params = init_seq2seq_params(jax.random.PRNGKey(seed), SPEC)
    src, tgt = _batch(seed)
    loss_k = fused_tf_loss(params, SPEC, src, tgt, False, jnp.float32, 4, True)
    out_x = seq2seq_forward(params, SPEC, src, tgt, "sampling", jax.random.PRNGKey(0))
    np.testing.assert_allclose(loss_k, out_x["loss"], atol=1e-5)

    gk = jax.grad(
        lambda p: fused_tf_loss(p, SPEC, src, tgt, False, jnp.float32, 4, True).mean()
    )(params)
    gx = jax.grad(
        lambda p: seq2seq_forward(p, SPEC, src, tgt, "sampling", jax.random.PRNGKey(0))[
            "loss"
        ].mean()
    )(params)
    _grad_trees_match(gk, gx)


def test_reinforce_mode_matches_free_running_gradients():
    r"""Two-pass free-running decode: sampling is a stop-gradient, so the
    fused REINFORCE-mode TF pass at the sampled z must reproduce jax.grad of
    the scan path's free-running loss (same rng => same z)."""
    params = init_seq2seq_params(jax.random.PRNGKey(3), SPEC)
    src, _ = _batch(3)
    rng = jax.random.PRNGKey(42)
    out = seq2seq_forward(params, SPEC, src, None, "sampling", rng)
    z = out["predictions"]
    loss_k = fused_tf_loss(params, SPEC, src, z, True, jnp.float32, 4, True)
    np.testing.assert_allclose(loss_k, out["loss"], atol=1e-5)

    gk = jax.grad(
        lambda p: fused_tf_loss(p, SPEC, src, z, True, jnp.float32, 4, True).mean()
    )(params)
    gx = jax.grad(
        lambda p: seq2seq_forward(p, SPEC, src, None, "sampling", rng)["loss"].mean()
    )(params)
    _grad_trees_match(gk, gx)


def test_weighted_per_example_cotangents():
    r"""The VJP must honor arbitrary per-example cotangents (the trainers take
    supervision-masked means, not plain means)."""
    params = init_seq2seq_params(jax.random.PRNGKey(5), SPEC)
    src, tgt = _batch(5)
    w = jnp.asarray(np.random.RandomState(7).rand(src.shape[0]).astype(np.float32))
    gk = jax.grad(
        lambda p: (w * fused_tf_loss(p, SPEC, src, tgt, False, jnp.float32, 4, True)).sum()
    )(params)
    gx = jax.grad(
        lambda p: (w * seq2seq_forward(
            p, SPEC, src, tgt, "sampling", jax.random.PRNGKey(0))["loss"]).sum()
    )(params)
    _grad_trees_match(gk, gx)


def test_all_pad_target_row_is_harmless():
    r"""A fully-empty sampled row (end-at-step-0 trim) must give zero loss and
    finite gradients in REINFORCE mode."""
    params = init_seq2seq_params(jax.random.PRNGKey(6), SPEC)
    src, tgt = _batch(6)
    z = tgt.at[1].set(0)
    loss_k = fused_tf_loss(params, SPEC, src, z, True, jnp.float32, 4, True)
    assert float(jnp.abs(loss_k[1])) == 0.0
    gk = jax.grad(
        lambda p: fused_tf_loss(p, SPEC, src, z, True, jnp.float32, 4, True).mean()
    )(params)
    for _, leaf in jax.tree_util.tree_flatten_with_path(gk)[0]:
        assert bool(jnp.isfinite(leaf).all())


# ------------------------------------------------------------------ LM mode --
from probnmn_tpu.models.program_prior import (  # noqa: E402
    ProgramPriorSpec,
    init_program_prior_params,
    program_prior_forward,
)
from probnmn_tpu.ops.pallas.seq2seq_train import fused_lm_loss  # noqa: E402

LM_SPEC = ProgramPriorSpec(vocab_size=50)


def _lm_batch(seed, batch=12, length=26):
    rs = np.random.RandomState(seed)
    tok = rs.randint(4, LM_SPEC.vocab_size, (batch, length)).astype(np.int32)
    tok *= np.arange(length)[None, :] < rs.randint(2, length, (batch,))[:, None]
    tok[0] = rs.randint(4, LM_SPEC.vocab_size, (length,))  # full-length row
    return jnp.asarray(tok)


@pytest.mark.parametrize("seed", [0, 1])
def test_lm_loss_and_grads_match_xla(seed):
    r"""``fused_lm_loss`` must reproduce ``program_prior_forward``'s loss and
    every gradient leaf — including the TIED embedding's summed output-layer +
    input-lookup contributions (reference program_prior.py:60-62)."""
    params = init_program_prior_params(jax.random.PRNGKey(seed), LM_SPEC)
    tok = _lm_batch(seed)
    loss_k = fused_lm_loss(params, LM_SPEC, tok, jnp.float32, 4, True)
    out_x = program_prior_forward(params, LM_SPEC, tok, jax.random.PRNGKey(0))
    np.testing.assert_allclose(loss_k, out_x["loss"], atol=1e-5)

    gk = jax.grad(
        lambda p: fused_lm_loss(p, LM_SPEC, tok, jnp.float32, 4, True).mean()
    )(params)
    gx = jax.grad(
        lambda p: program_prior_forward(p, LM_SPEC, tok, jax.random.PRNGKey(0))[
            "loss"
        ].mean()
    )(params)
    _grad_trees_match(gk, gx)


def test_lm_weighted_cotangents():
    params = init_program_prior_params(jax.random.PRNGKey(2), LM_SPEC)
    tok = _lm_batch(2)
    w = jnp.asarray(np.random.RandomState(9).rand(tok.shape[0]).astype(np.float32))
    gk = jax.grad(
        lambda p: (w * fused_lm_loss(p, LM_SPEC, tok, jnp.float32, 4, True)).sum()
    )(params)
    gx = jax.grad(
        lambda p: (w * program_prior_forward(
            p, LM_SPEC, tok, jax.random.PRNGKey(0))["loss"]).sum()
    )(params)
    _grad_trees_match(gk, gx)


# --------------------------------------------------- data-parallel shard_map --
def test_shard_map_dp_matches_single_device():
    r"""``fused_tf_loss_dp`` (per-device kernels on batch shards) must be
    bit-exact with the single-device call — forward and every gradient leaf.
    This is what lets the fused kernels run under the production mesh, where
    Pallas custom calls cannot auto-partition."""
    from jax.sharding import Mesh
    from probnmn_tpu.ops.pallas.seq2seq_train import fused_tf_loss_dp

    params = init_seq2seq_params(jax.random.PRNGKey(0), SPEC)
    src, tgt = _batch(0, batch=16)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    dp = lambda p: fused_tf_loss_dp(
        mesh, p, SPEC, src, tgt, False,
        compute_dtype=jnp.float32, batch_block=2, interpret=True,
    )
    single = lambda p: fused_tf_loss(p, SPEC, src, tgt, False, jnp.float32, 2, True)
    np.testing.assert_array_equal(np.asarray(jax.jit(dp)(params)),
                                  np.asarray(single(params)))
    g_dp = jax.grad(lambda p: dp(p).mean())(params)
    g_1d = jax.grad(lambda p: single(p).mean())(params)
    # Param cotangents are psummed across shards; the reduction order differs
    # from the single-device sequential grid accumulation, so compare at the
    # usual tolerance instead of bitwise.
    for a, b in zip(jax.tree_util.tree_leaves(g_dp), jax.tree_util.tree_leaves(g_1d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_shard_map_lm_dp_matches_single_device():
    from jax.sharding import Mesh
    from probnmn_tpu.ops.pallas.seq2seq_train import fused_lm_loss_dp

    params = init_program_prior_params(jax.random.PRNGKey(1), LM_SPEC)
    tok = _lm_batch(1, batch=16)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    dp = lambda p: fused_lm_loss_dp(
        mesh, p, LM_SPEC, tok, compute_dtype=jnp.float32, batch_block=2,
        interpret=True,
    )
    single = lambda p: fused_lm_loss(p, LM_SPEC, tok, jnp.float32, 2, True)
    np.testing.assert_array_equal(np.asarray(jax.jit(dp)(params)),
                                  np.asarray(single(params)))
    g_dp = jax.grad(lambda p: dp(p).mean())(params)
    g_1d = jax.grad(lambda p: single(p).mean())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_dp), jax.tree_util.tree_leaves(g_1d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)
