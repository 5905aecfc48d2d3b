r"""
Gathered-weight ("per-example expert") convolutions for the Neural Module Network.

The reference instantiates one torch ``nn.Conv2d`` stack per program-vocabulary token
and dispatches on tokens in a per-example Python loop (reference ``nmn.py:85-115``,
``197-238``). TPU-natively, every module class's parameters live in a stacked *bank*
(leading axis = module instance), and a batch step gathers each example's weights by
token id and applies the convolution as an im2col + batched matmul — a (196 x C·k²)
x (C·k² x C_out) contraction per example that maps straight onto the MXU. No Python
loops, no dynamic shapes, differentiable through the gather (scatter-add into banks).

Layouts: activations NHWC; 3x3 bank kernels (n, 3, 3, C_in, C_out) [HWIO per slot];
1x1 bank kernels (n, C_in, C_out). ``conv_general_dilated_patches`` emits the patch
feature axis channel-major (C_in, ky, kx) — weight reshapes below match that order
(verified against ``lax.conv_general_dilated``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def kaiming_normal(key: jax.Array, shape: Tuple[int, ...], fan_in: int) -> jax.Array:
    r"""torch ``kaiming_normal_`` (fan_in, relu gain): std = sqrt(2 / fan_in)."""
    return jax.random.normal(key, shape, jnp.float32) * (2.0 / fan_in) ** 0.5


def init_conv_bank(
    key: jax.Array, n: int, ksize: int, c_in: int, c_out: int
) -> dict:
    r"""A bank of n torch-Conv2d-initialized filters: kaiming-normal weight,
    uniform ±1/sqrt(fan_in) bias (torch's default conv bias init)."""
    kw, kb = jax.random.split(key)
    fan_in = c_in * ksize * ksize
    if ksize == 1:
        w = kaiming_normal(kw, (n, c_in, c_out), fan_in)
    else:
        w = kaiming_normal(kw, (n, ksize, ksize, c_in, c_out), fan_in)
    bound = 1.0 / fan_in ** 0.5
    b = jax.random.uniform(kb, (n, c_out), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def extract_patches(x: jax.Array, dilation: int = 1) -> jax.Array:
    r"""3x3 same-padded (dilated) patches of NHWC x -> (B, H, W, C*9), channel-major."""
    d = dilation
    return jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(3, 3),
        window_strides=(1, 1),
        padding=((d, d), (d, d)),
        rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def gathered_conv3x3(
    x: jax.Array,
    bank: dict,
    idx: jax.Array,
    dilation: int = 1,
    patches: Optional[jax.Array] = None,
) -> jax.Array:
    r"""Per-example 3x3 conv: example b uses bank slot idx[b].

    x: (B, H, W, C_in); bank["w"]: (n, 3, 3, C_in, C_out); idx: (B,) int.
    Pass precomputed ``patches`` to share the im2col across several banks.
    """
    if patches is None:
        patches = extract_patches(x, dilation)
    n, kh, kw, c_in, c_out = bank["w"].shape
    # Match the channel-major patch order: (C_in, ky, kx) x C_out.
    w_flat = jnp.transpose(bank["w"], (0, 3, 1, 2, 4)).reshape(n, c_in * kh * kw, c_out)
    w_g = w_flat[idx]  # (B, C*9, C_out)
    b_g = bank["b"][idx]  # (B, C_out)
    out = jnp.einsum("bhwk,bko->bhwo", patches, w_g)
    return out + b_g[:, None, None, :]


def gathered_conv1x1(x: jax.Array, bank: dict, idx: jax.Array) -> jax.Array:
    r"""Per-example 1x1 conv. x: (B, H, W, C_in); bank["w"]: (n, C_in, C_out)."""
    w_g = bank["w"][idx]
    b_g = bank["b"][idx]
    out = jnp.einsum("bhwc,bco->bhwo", x, w_g)
    return out + b_g[:, None, None, :]


def conv3x3(x: jax.Array, w: jax.Array, b: jax.Array, dilation: int = 1) -> jax.Array:
    r"""Shared-weight 3x3 same conv, NHWC/HWIO."""
    d = dilation
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b[None, None, None, :]


def conv1x1(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    r"""Shared-weight 1x1 conv as a matmul. w: (C_in, C_out)."""
    return x @ w + b[None, None, None, :]


def max_pool_2x2(x: jax.Array) -> jax.Array:
    r"""2x2/stride-2 max pool, NHWC (torch ``MaxPool2d(2)``; floors odd dims)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
