r"""
ResNet-101 stage-3 feature extractor (inference-only), for CLEVR image feature
extraction (reference ``scripts/preprocess/extract_features.py:98-105``: torchvision
``resnet101`` with ``layer4``/``avgpool``/``fc`` replaced by identity — i.e. the
(1024, 14, 14) stage-3 output for 224x224 inputs).

Functional JAX implementation, NHWC activations, HWIO kernels, frozen batch-norm
folded as scale/shift (inference semantics: y = gamma * (x - mean) / sqrt(var + eps)
+ beta). ``params_from_torch_state_dict`` ports torchvision ``resnet101`` weights
(ImageNet) so extracted features match the reference bit-for-bit up to conv
reassociation; without a weights file the extractor runs randomly initialized
(documented loudly — parity requires the torchvision checkpoint).
"""
from __future__ import annotations

from typing import Any, Dict, List, Mapping

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5

# (blocks, mid_channels, out_channels, stride) per stage; stage-3 cut (no layer4).
STAGES = [
    (3, 64, 256, 1),    # layer1
    (4, 128, 512, 2),   # layer2
    (23, 256, 1024, 2), # layer3
]


def _conv_init(key, shape):
    fan_in = shape[0] * shape[1] * shape[2]
    return jax.random.normal(key, shape) * (2.0 / fan_in) ** 0.5


def _bn_init(channels):
    return {
        "scale": jnp.ones((channels,)),
        "shift": jnp.zeros((channels,)),
    }


def init_resnet101_stage3_params(key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    params: Dict[str, Any] = {
        "conv1": {"w": _conv_init(next(keys), (7, 7, 3, 64)), "bn": _bn_init(64)},
        "layers": [],
    }
    in_ch = 64
    for blocks, mid, out, stride in STAGES:
        stage: List[Dict[str, Any]] = []
        for i in range(blocks):
            block = {
                "conv1": {"w": _conv_init(next(keys), (1, 1, in_ch, mid)), "bn": _bn_init(mid)},
                "conv2": {"w": _conv_init(next(keys), (3, 3, mid, mid)), "bn": _bn_init(mid)},
                "conv3": {"w": _conv_init(next(keys), (1, 1, mid, out)), "bn": _bn_init(out)},
            }
            if i == 0:
                block["downsample"] = {
                    "w": _conv_init(next(keys), (1, 1, in_ch, out)),
                    "bn": _bn_init(out),
                }
            stage.append(block)
            in_ch = out
        params["layers"].append(stage)
    return params


def _conv_bn(p, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out * p["bn"]["scale"] + p["bn"]["shift"]


def _bottleneck(block, x, stride):
    out = jax.nn.relu(_conv_bn(block["conv1"], x))
    out = jax.nn.relu(_conv_bn(block["conv2"], out, stride=stride))
    out = _conv_bn(block["conv3"], out)
    identity = _conv_bn(block["downsample"], x, stride=stride) if "downsample" in block else x
    return jax.nn.relu(out + identity)


def resnet101_stage3(params: Dict[str, Any], images: jax.Array) -> jax.Array:
    r"""images: (B, 224, 224, 3) normalized NHWC -> (B, 14, 14, 1024)."""
    # conv1 7x7/2, pad 3 (torch) -> explicit padding
    x = jax.lax.conv_general_dilated(
        images, params["conv1"]["w"], (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x * params["conv1"]["bn"]["scale"] + params["conv1"]["bn"]["shift"]
    x = jax.nn.relu(x)
    # maxpool 3x3/2 pad 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    for stage, (blocks, _, _, stride) in zip(params["layers"], STAGES):
        for i, block in enumerate(stage):
            x = _bottleneck(block, x, stride if i == 0 else 1)
    return x


# ------------------------------------------------------------------ torch interop -----
def _fold_bn(state: Mapping[str, np.ndarray], prefix: str) -> Dict[str, jnp.ndarray]:
    gamma = np.asarray(state[f"{prefix}.weight"])
    beta = np.asarray(state[f"{prefix}.bias"])
    mean = np.asarray(state[f"{prefix}.running_mean"])
    var = np.asarray(state[f"{prefix}.running_var"])
    scale = gamma / np.sqrt(var + BN_EPS)
    return {
        "scale": jnp.asarray(scale, jnp.float32),
        "shift": jnp.asarray(beta - mean * scale, jnp.float32),
    }


def _port_conv(state: Mapping[str, np.ndarray], conv_key: str, bn_key: str):
    w = np.asarray(state[f"{conv_key}.weight"])  # OIHW
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0), jnp.float32),  # -> HWIO
        "bn": _fold_bn(state, bn_key),
    }


def params_from_torch_state_dict(state: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    r"""Port a torchvision ``resnet101`` state_dict (tensors or ndarrays)."""
    state = {k: np.asarray(v) for k, v in state.items()}
    params: Dict[str, Any] = {
        "conv1": _port_conv(state, "conv1", "bn1"),
        "layers": [],
    }
    for stage_index, (blocks, _, _, _) in enumerate(STAGES, start=1):
        stage = []
        for i in range(blocks):
            prefix = f"layer{stage_index}.{i}"
            block = {
                "conv1": _port_conv(state, f"{prefix}.conv1", f"{prefix}.bn1"),
                "conv2": _port_conv(state, f"{prefix}.conv2", f"{prefix}.bn2"),
                "conv3": _port_conv(state, f"{prefix}.conv3", f"{prefix}.bn3"),
            }
            if f"{prefix}.downsample.0.weight" in state:
                block["downsample"] = _port_conv(
                    state, f"{prefix}.downsample.0", f"{prefix}.downsample.1"
                )
            stage.append(block)
        params["layers"].append(stage)
    return params


# Image preprocessing constants — NOTE the reference's nonstandard third std value
# (0.224 instead of 0.225), preserved for feature parity (extract_features.py:66-71).
IMAGE_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGE_STD = np.array([0.229, 0.224, 0.224], np.float32)
IMAGE_SIZE = 224
