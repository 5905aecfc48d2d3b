r"""
Fused Pallas seq2seq sampling kernel vs the XLA scan path.

The kernel (``ops/pallas/seq2seq_decode.py``) absorbs boundary handling, the
masked encoder, the attentive sampling decoder, @end@ trimming and the
length-normalized loss. Driven by an EXPLICIT Gumbel-noise tensor it must
produce bit-identical token streams to :func:`sampling_forward_with_noise_xla`
(the same Gumbel-max draw composed from the scan path's building blocks);
these tests run the kernel in interpret mode on the CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probnmn_tpu.models.seq2seq import Seq2SeqSpec, init_seq2seq_params, seq2seq_forward
from probnmn_tpu.ops.pallas.seq2seq_decode import (
    _round_up,
    fused_sampling_forward,
    sampling_forward_with_noise_xla,
)

SPEC = Seq2SeqSpec(source_vocab_size=90, target_vocab_size=50, max_decoding_steps=26)


def _random_batch(batch=16, length=45, seed=0, full_row=True):
    rs = np.random.RandomState(seed)
    src = rs.randint(4, SPEC.source_vocab_size, (batch, length)).astype(np.int32)
    lens = rs.randint(2, length, (batch,))
    src = src * (np.arange(length)[None, :] < lens[:, None])
    if full_row:
        src[0] = rs.randint(4, SPEC.source_vocab_size, (length,))  # no padding at all
    return jnp.asarray(src)


def _gumbel(rng, batch):
    return jax.random.gumbel(
        rng, (SPEC.max_decoding_steps, batch, _round_up(SPEC.target_vocab_size, 128)),
        jnp.float32,
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_xla_replica_exactly(seed):
    params = init_seq2seq_params(jax.random.PRNGKey(seed), SPEC)
    src = _random_batch(seed=seed)
    noise = _gumbel(jax.random.PRNGKey(100 + seed), src.shape[0])
    out_k = fused_sampling_forward(
        params, SPEC, src, jax.random.PRNGKey(0),
        compute_dtype=jnp.float32, batch_block=8, noise=noise, interpret=True,
    )
    out_x = sampling_forward_with_noise_xla(params, SPEC, src, noise)
    np.testing.assert_array_equal(out_k["predictions"], out_x["predictions"])
    np.testing.assert_allclose(out_k["logprobs"], out_x["logprobs"], atol=2e-4)
    np.testing.assert_allclose(out_k["loss"], out_x["loss"], atol=2e-4)


def test_end_at_step0_row_zeroed():
    r"""The reference trim quirk: a row whose first sampled token is @end@
    becomes all zeros with zero loss (``trim_at_end``, reference
    ``seq2seq_base.py:278-293``)."""
    params = init_seq2seq_params(jax.random.PRNGKey(0), SPEC)
    src = _random_batch()
    noise = _gumbel(jax.random.PRNGKey(5), src.shape[0])
    noise = noise.at[0, 1, :].set(-1e9).at[0, 1, SPEC.end_index].set(1e9)
    out_k = fused_sampling_forward(
        params, SPEC, src, jax.random.PRNGKey(0),
        compute_dtype=jnp.float32, batch_block=8, noise=noise, interpret=True,
    )
    out_x = sampling_forward_with_noise_xla(params, SPEC, src, noise)
    np.testing.assert_array_equal(out_k["predictions"], out_x["predictions"])
    assert bool((out_k["predictions"][1] == 0).all())
    assert float(out_k["loss"][1]) == 0.0


def test_bf16_compute_dtype_runs_and_stays_close():
    params = init_seq2seq_params(jax.random.PRNGKey(3), SPEC)
    src = _random_batch(seed=3)
    noise = _gumbel(jax.random.PRNGKey(7), src.shape[0])
    out_b = fused_sampling_forward(
        params, SPEC, src, jax.random.PRNGKey(0),
        compute_dtype=jnp.bfloat16, batch_block=8, noise=noise, interpret=True,
    )
    out_x = sampling_forward_with_noise_xla(params, SPEC, src, noise)
    # bf16 matmuls can flip near-tied Gumbel argmaxes; demand near-total
    # agreement rather than bit equality.
    agree = float((out_b["predictions"] == out_x["predictions"]).mean())
    assert agree > 0.95, agree


def test_batch_padding_to_block():
    r"""Batches that don't divide the block are padded and sliced back."""
    params = init_seq2seq_params(jax.random.PRNGKey(1), SPEC)
    src = _random_batch(batch=11, seed=4)
    noise = _gumbel(jax.random.PRNGKey(9), 11)
    out_k = fused_sampling_forward(
        params, SPEC, src, jax.random.PRNGKey(0),
        compute_dtype=jnp.float32, batch_block=8, noise=noise, interpret=True,
    )
    out_x = sampling_forward_with_noise_xla(params, SPEC, src, noise)
    assert out_k["predictions"].shape == (11, SPEC.max_decoding_steps)
    np.testing.assert_array_equal(out_k["predictions"], out_x["predictions"])


def test_loss_matches_production_loss_definition():
    r"""The in-kernel loss must equal ``length_normalized_logprob_loss`` applied
    to the kernel's own (trimmed) predictions/logprobs — i.e. the exact
    free-running loss of ``seq2seq_forward`` (reference seq2seq_base.py:235-246)."""
    from probnmn_tpu.ops.common import length_normalized_logprob_loss

    params = init_seq2seq_params(jax.random.PRNGKey(2), SPEC)
    src = _random_batch(seed=5)
    noise = _gumbel(jax.random.PRNGKey(11), src.shape[0])
    out_k = fused_sampling_forward(
        params, SPEC, src, jax.random.PRNGKey(0),
        compute_dtype=jnp.float32, batch_block=8, noise=noise, interpret=True,
    )
    recomputed = length_normalized_logprob_loss(
        out_k["logprobs"], out_k["predictions"], SPEC.pad_index
    )
    np.testing.assert_allclose(out_k["loss"], recomputed, atol=1e-5)


def test_xla_replica_is_distributionally_equivalent_to_scan_path():
    r"""Sanity that the Gumbel-max replica samples the same distribution as
    ``jax.random.categorical`` in the production scan path: over many draws the
    per-token frequencies agree."""
    params = init_seq2seq_params(jax.random.PRNGKey(4), SPEC)
    src = _random_batch(batch=64, seed=6)
    freq = np.zeros((2, SPEC.target_vocab_size))
    for rep in range(4):
        noise = _gumbel(jax.random.PRNGKey(rep), src.shape[0])
        p_g = np.asarray(
            sampling_forward_with_noise_xla(params, SPEC, src, noise)["predictions"]
        )
        p_c = np.asarray(
            seq2seq_forward(params, SPEC, src, None, "sampling", jax.random.PRNGKey(50 + rep))[
                "predictions"
            ]
        )
        freq[0] += np.bincount(p_g[p_g > 0].ravel(), minlength=SPEC.target_vocab_size)
        freq[1] += np.bincount(p_c[p_c > 0].ravel(), minlength=SPEC.target_vocab_size)
    freq /= freq.sum(axis=1, keepdims=True)
    assert np.abs(freq[0] - freq[1]).sum() < 0.15


def test_shard_map_sampling_dp_matches_single_device():
    r"""``fused_sampling_forward_dp`` (per-device kernels on batch shards) is
    bit-exact with the single-device call when driven by the same explicit
    noise tensor (the hardware-PRNG branch has no CPU interpreter; on TPU it
    folds the shard index into the key so shards draw independent noise)."""
    from jax.sharding import Mesh
    from probnmn_tpu.ops.pallas.seq2seq_decode import fused_sampling_forward_dp

    params = init_seq2seq_params(jax.random.PRNGKey(0), SPEC)
    src = _random_batch(batch=16, seed=11)
    noise = _gumbel(jax.random.PRNGKey(13), 16)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    preds_dp = jax.jit(lambda p, s, n: fused_sampling_forward_dp(
        mesh, p, SPEC, s, jax.random.PRNGKey(5), noise=n,
        compute_dtype=jnp.float32, batch_block=2, interpret=True,
    ))(params, src, noise)
    single = fused_sampling_forward(
        params, SPEC, src, jax.random.PRNGKey(5),
        compute_dtype=jnp.float32, batch_block=2, noise=noise, interpret=True,
    )["predictions"]
    np.testing.assert_array_equal(np.asarray(preds_dp), np.asarray(single))


def test_serving_dispatcher_falls_back_to_scan_off_tpu():
    r"""``sampling_forward_serving`` must use the XLA scan path on non-TPU
    backends (same outputs as ``seq2seq_forward`` for the same key) and keep
    the fused-path gate false here."""
    from probnmn_tpu.models.seq2seq import (
        fast_sampling_available,
        sampling_forward_serving,
    )

    assert jax.default_backend() == "cpu"
    assert not fast_sampling_available(SPEC)
    params = init_seq2seq_params(jax.random.PRNGKey(0), SPEC)
    src = _random_batch(seed=21)
    rng = jax.random.PRNGKey(9)
    out = sampling_forward_serving(params, SPEC, src, rng)
    ref = seq2seq_forward(params, SPEC, src, None, "sampling", rng)
    np.testing.assert_array_equal(out["predictions"], ref["predictions"])
    np.testing.assert_allclose(out["loss"], ref["loss"], atol=1e-6)
