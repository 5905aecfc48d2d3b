"""Interpret-mode equivalence of the fused Pallas NMN interpreter against the
XLA register machine (which itself is validated against a torch reference
interpreter in test_nmn.py). On-device equivalence is additionally exercised by
bench/verify runs on real TPU hardware."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probnmn_tpu.data.vocabulary import SPECIAL_TOKENS, Vocabulary
from probnmn_tpu.models import nmn
from probnmn_tpu.ops.pallas.nmn_interpreter import (
    build_kernel_tables,
    execute_programs_pallas,
)

from tests.test_nmn import PROGRAM_CASES, PROGRAM_TOKENS, _programs


@pytest.fixture(scope="module")
def setup():
    vocab = Vocabulary(
        {
            "questions": SPECIAL_TOKENS + ["w"],
            "programs": PROGRAM_TOKENS,
            "answers": [f"a{i}" for i in range(5)] + ["@@UNKNOWN@@"],
        }
    )
    spec = nmn.make_spec(vocab)
    spec.feature_channels = 12
    spec.height = spec.width = 6
    spec.module_channels = 8
    spec.class_projection_channels = 16
    spec.classifier_linear_size = 10
    params = nmn.init_nmn_params(jax.random.PRNGKey(0), spec)
    return vocab, spec, params


def test_pallas_interpreter_matches_xla_machine(setup):
    vocab, spec, params = setup
    programs = jnp.asarray(_programs(vocab, PROGRAM_CASES))
    rs = np.random.RandomState(0)
    feats = jnp.asarray(
        rs.randn(len(PROGRAM_CASES), spec.height, spec.width, spec.feature_channels)
        .astype(np.float32)
    )
    stem = nmn.apply_stem(params["stem"], feats)
    ref_out, ref_invalid = nmn.execute_programs(params, spec, stem, programs)

    banks, tables = build_kernel_tables(params, spec, dtype=jnp.float32)
    out, invalid = execute_programs_pallas(
        banks, tables, spec, stem, programs, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(invalid), np.asarray(ref_invalid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)


def test_fast_inference_fn_matches_nmn_forward(setup):
    vocab, spec, params = setup
    programs = jnp.asarray(_programs(vocab, PROGRAM_CASES))
    rs = np.random.RandomState(1)
    feats = jnp.asarray(
        rs.randn(len(PROGRAM_CASES), spec.height, spec.width, spec.feature_channels)
        .astype(np.float32)
    )
    answers = jnp.asarray(rs.randint(0, spec.num_answers, (len(PROGRAM_CASES),)))

    ref = nmn.nmn_forward(params, spec, feats, programs, answers)
    fast = nmn.make_fast_inference_fn(params, spec, interpret=True)
    out = fast(feats, programs, answers)

    np.testing.assert_array_equal(np.asarray(out["invalid"]), np.asarray(ref["invalid"]))
    np.testing.assert_array_equal(
        np.asarray(out["predictions"]), np.asarray(ref["predictions"])
    )
    np.testing.assert_allclose(np.asarray(out["loss"]), np.asarray(ref["loss"]), atol=1e-5)


def test_pallas_interpreter_gradients_match_xla_machine(setup):
    """The replay-and-reverse backward kernel == autodiff through the XLA
    register machine, for every parameter bank and the input features, over
    programs covering all module kinds + invalid paths (interpret mode)."""
    vocab, spec, params = setup
    programs = jnp.asarray(_programs(vocab, PROGRAM_CASES))
    rs = np.random.RandomState(7)
    B = len(PROGRAM_CASES)
    feats = jnp.asarray(
        rs.randn(B, spec.height, spec.width, spec.feature_channels).astype(np.float32)
    )
    answers = jnp.asarray(rs.randint(0, spec.num_answers, (B,)))

    def loss_ref(p, f):
        return nmn.nmn_forward(p, spec, f, programs, answers)["loss"].mean()

    def loss_fast(p, f):
        return nmn.nmn_forward_fast(
            p, spec, f, programs, answers, interpret=True
        )["loss"].mean()

    la, (ga, gfa) = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, feats)
    lb, (gb, gfb) = jax.value_and_grad(loss_fast, argnums=(0, 1))(params, feats)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gfa), np.asarray(gfb), atol=2e-5, rtol=1e-4)
    for (path_a, va), (path_b, vb) in zip(
        jax.tree_util.tree_flatten_with_path(ga)[0],
        jax.tree_util.tree_flatten_with_path(gb)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=5e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path_a),
        )


def test_noreplay_backward_bit_exact_vs_replay(setup):
    """The round-4 residual-trajectory backward (training forward streams the
    register/activation trajectories; backward skips replay) is BIT-EXACT
    against the round-3 replay-and-reverse backward — same quantization
    points by construction — over programs covering all module kinds,
    invalid paths, and an all-pad row."""
    from probnmn_tpu.ops.pallas import nmn_interpreter as ni

    vocab, spec, params = setup
    programs = np.asarray(_programs(vocab, PROGRAM_CASES))
    programs[0] = 0  # an all-pad row
    programs = jnp.asarray(programs)
    rs = np.random.RandomState(11)
    B = programs.shape[0]
    feats = jnp.asarray(
        rs.randn(B, spec.height, spec.width, spec.feature_channels).astype(np.float32)
    )
    stem = nmn.apply_stem(params["stem"], feats)
    banks, tables = build_kernel_tables(params, spec, dtype=jnp.float32)

    # Training forward (with residual outputs) == inference forward.
    f_inf, inv_inf = execute_programs_pallas(
        banks, tables, spec, stem, programs, interpret=True
    )
    f_tr, inv_tr, otraj, atraj = ni._execute_train_fwd_pallas(
        banks, tables, stem, programs, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(inv_inf), np.asarray(inv_tr))
    np.testing.assert_array_equal(np.asarray(f_inf), np.asarray(f_tr))

    # Both backward modes, driven directly through _execute_bwd_pallas.
    g_final = jnp.asarray(rs.randn(*f_inf.shape).astype(np.float32))
    d_banks_old, d_stem_old = ni._execute_bwd_pallas(
        banks, tables, stem, programs, inv_inf, g_final, interpret=True
    )
    d_banks_new, d_stem_new = ni._execute_bwd_pallas(
        banks, tables, stem, programs, inv_tr, g_final, interpret=True,
        otraj=otraj, atraj=atraj,
    )
    np.testing.assert_array_equal(np.asarray(d_stem_old), np.asarray(d_stem_new))
    for key in d_banks_old:
        np.testing.assert_array_equal(
            np.asarray(d_banks_old[key]), np.asarray(d_banks_new[key]),
            err_msg=key,
        )


def test_pallas_gradient_fuzz_random_programs(setup):
    """Property fuzz: random token soups (valid and invalid mixes) keep the
    Pallas VJP identical to the XLA machine's gradients."""
    vocab, spec, params = setup
    rs = np.random.RandomState(11)
    V = vocab.get_vocab_size("programs")
    B, T = 16, 9
    programs = jnp.asarray(rs.randint(0, V, (B, T)).astype(np.int64))
    feats = jnp.asarray(
        rs.randn(B, spec.height, spec.width, spec.feature_channels).astype(np.float32)
    )
    answers = jnp.asarray(rs.randint(0, spec.num_answers, (B,)))

    def loss_ref(p):
        return nmn.nmn_forward(p, spec, feats, programs, answers)["loss"].sum()

    def loss_fast(p):
        return nmn.nmn_forward_fast(
            p, spec, feats, programs, answers, interpret=True
        )["loss"].sum()

    ga = jax.grad(loss_ref)(params)
    gb = jax.grad(loss_fast)(params)
    for (path_a, va), (_, vb) in zip(
        jax.tree_util.tree_flatten_with_path(ga)[0],
        jax.tree_util.tree_flatten_with_path(gb)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=5e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path_a),
        )


def test_tri_implementation_forward_fuzz(setup):
    """Hundreds of random programs (garbage soups + template-built valid ones)
    produce identical invalid masks/predictions and matching losses across all
    THREE implementations: torch per-example fixture, XLA register machine,
    and the fused Pallas kernel (interpret mode). SURVEY §6 parity protocol."""
    import torch
    from tests.test_nmn import TorchInterpreter

    vocab, spec, params = setup
    rs = np.random.RandomState(23)
    V = vocab.get_vocab_size("programs")
    T = 10

    def tok(name):
        return vocab.get_token_index(name, "programs")

    def template_program():
        # [reduce] + filter chain + scene (+ optionally a second chain via a
        # binary op) — mostly valid, occasionally not (short truncations).
        body = [tok(rs.choice(["count", "exist", "query_shape"]))]
        if rs.rand() < 0.3:
            body = [tok(rs.choice(["intersect", "union", "equal_color"]))] + body
        for _ in range(rs.randint(1, 4)):
            body.append(tok(rs.choice(
                ["filter_color[red]", "filter_shape[cube]", "relate[left]", "same_size"]
            )))
        body.append(tok("scene"))
        if rs.rand() < 0.4:
            body += [tok("filter_color[red]"), tok("scene")]
        return body[:T] + [0] * max(0, T - len(body))

    soups = rs.randint(0, V, (128, T))
    templates = np.asarray([template_program() for _ in range(96)])
    programs = jnp.asarray(np.concatenate([soups, templates]).astype(np.int64))
    B = programs.shape[0]
    feats = jnp.asarray(
        rs.randn(B, spec.height, spec.width, spec.feature_channels).astype(np.float32)
    )
    answers = jnp.asarray(rs.randint(0, spec.num_answers, (B,)))

    xla = nmn.nmn_forward(params, spec, feats, programs, answers)
    fast = nmn.nmn_forward_fast(params, spec, feats, programs, answers, interpret=True)
    interp = TorchInterpreter(params, spec, vocab)
    tlogits, tpreds, tloss, tinvalid = interp.forward(
        torch.tensor(np.asarray(feats)).permute(0, 3, 1, 2),
        torch.tensor(np.asarray(programs)),
        torch.tensor(np.asarray(answers, np.int64)),
    )

    # some soups must be invalid AND some templates valid, else the fuzz is vacuous
    inv = np.asarray(xla["invalid"])
    assert inv[:128].sum() > 30
    assert (~inv[128:]).sum() > 30

    np.testing.assert_array_equal(inv.astype(int), tinvalid.numpy())
    np.testing.assert_array_equal(np.asarray(fast["invalid"]), inv)
    np.testing.assert_array_equal(np.asarray(xla["predictions"]), tpreds.numpy())
    np.testing.assert_array_equal(np.asarray(fast["predictions"]), tpreds.numpy())
    np.testing.assert_allclose(np.asarray(xla["loss"]), tloss.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fast["loss"]), tloss.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(fast["answer_logits"]), tlogits.numpy(), atol=1e-4
    )


def test_shard_map_nmn_dp_matches_single_device(setup):
    r"""``nmn_forward_fast(mesh=...)`` (per-device fused interpreter kernels on
    batch shards via shard_map) must match the single-device call — forward
    bit-exact, every gradient leaf at tolerance. This is what lets the fused
    NMN run under the production mesh in module/joint training (the capability
    the reference gets from DataParallel wrapping the NMN, ``_trainer.py:98-100``);
    Pallas custom calls cannot auto-partition under GSPMD."""
    from jax.sharding import Mesh

    vocab, spec, params = setup
    rs = np.random.RandomState(31)
    V = vocab.get_vocab_size("programs")
    B, T = 16, 9
    programs = jnp.asarray(rs.randint(0, V, (B, T)).astype(np.int64))
    feats = jnp.asarray(
        rs.randn(B, spec.height, spec.width, spec.feature_channels).astype(np.float32)
    )
    answers = jnp.asarray(rs.randint(0, spec.num_answers, (B,)))
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1), ("data", "model"))

    def fwd(p, mesh_arg):
        return nmn.nmn_forward_fast(
            p, spec, feats, programs, answers, interpret=True, mesh=mesh_arg
        )

    out_dp = jax.jit(lambda p: fwd(p, mesh))(params)
    out_1d = fwd(params, None)
    np.testing.assert_array_equal(
        np.asarray(out_dp["invalid"]), np.asarray(out_1d["invalid"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_dp["loss"]), np.asarray(out_1d["loss"])
    )

    g_dp = jax.grad(lambda p: fwd(p, mesh)["loss"].mean())(params)
    g_1d = jax.grad(lambda p: fwd(p, None)["loss"].mean())(params)
    # Bank cotangents are psummed across shards; reduction order differs from
    # the single-device sequential-grid accumulation, hence tolerance not bitwise.
    for (path_a, va), (_, vb) in zip(
        jax.tree_util.tree_flatten_with_path(g_dp)[0],
        jax.tree_util.tree_flatten_with_path(g_1d)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=5e-6,
            err_msg=jax.tree_util.keystr(path_a),
        )


def test_shard_map_nmn_inference_dp_matches_single_device(setup):
    r"""``fast_forward_from_tables(mesh=...)`` — the evaluators' mesh path —
    matches the single-device fused inference call bit-exactly."""
    from jax.sharding import Mesh

    vocab, spec, params = setup
    rs = np.random.RandomState(37)
    V = vocab.get_vocab_size("programs")
    B, T = 16, 9
    programs = jnp.asarray(rs.randint(0, V, (B, T)).astype(np.int64))
    feats = jnp.asarray(
        rs.randn(B, spec.height, spec.width, spec.feature_channels).astype(np.float32)
    )
    answers = jnp.asarray(rs.randint(0, spec.num_answers, (B,)))
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1), ("data", "model"))

    banks, tables = build_kernel_tables(params, spec, dtype=jnp.float32)
    out_dp = jax.jit(lambda b, t: nmn.fast_forward_from_tables(
        b, t, spec, params["stem"], params["classifier"], feats, programs,
        answers, interpret=True, mesh=mesh,
    ))(banks, tables)
    out_1d = nmn.fast_forward_from_tables(
        banks, tables, spec, params["stem"], params["classifier"], feats,
        programs, answers, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(out_dp["invalid"]), np.asarray(out_1d["invalid"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_dp["predictions"]), np.asarray(out_1d["predictions"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_dp["loss"]), np.asarray(out_1d["loss"])
    )


def test_flat_conv_geometry_matches_lax_conv():
    r"""Unit-test the flat-layout 9-dot conv machinery directly: for every
    dilation the relate chain uses (1, 2, 4, 8), a single conv through
    ``_flat_conv_helpers`` must equal ``lax.conv_general_dilated`` with SAME
    padding on a random image (the program-level fuzz covers these only
    through full chains)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from probnmn_tpu.ops.pallas.nmn_interpreter import _flat_conv_helpers

    H = W = 14
    C = 128
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(H * W, C).astype(np.float32))
    w9 = jnp.asarray(rs.randn(1, 9 * C, C).astype(np.float32) * 0.05)

    # Every (dilation, geometry) pair the kernels use: the tight per-dilation
    # geometries (GD) plus G8 as a catch-all that must stay valid for d <= 8.
    for dil, gname in ((1, "G1"), (2, "G2"), (4, "G4"), (8, "G8"),
                       (2, "G8"), (4, "G8"), (1, "G2")):

        def kern(x_ref, w_ref, o_ref, _dil=dil, _gname=gname):
            # the helpers build iota masks, which must trace inside the kernel
            fh = _flat_conv_helpers(H, W, C)
            g = fh[_gname]
            flat = fh["to_flat"](x_ref[:], g)
            out = fh["conv"](flat, w_ref, 0, _dil, g)
            o_ref[:] = fh["compact"](out, g)

        got = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((H * W, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=True,
        )(img, w9)

        # reference: lax conv with SAME padding at this dilation. The bank
        # rows are [tap k rows kC:(k+1)C] with taps in (ky, kx) row-major
        # order, i.e. HWIO weights.
        lhs = img.reshape(1, H, W, C)
        rhs = w9[0].reshape(3, 3, C, C)
        want = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1, 1), padding="SAME",
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0].reshape(H * W, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, err_msg=f"dilation {dil}")
