r"""
Extract ResNet-101 stage-3 features from CLEVR images into an H5 file (reference
``scripts/preprocess/extract_features.py``): images sorted by filename, resized
to 224x224, normalized with the reference's constants (including its nonstandard
blue-channel std 0.224), features stored as (N, 1024, 14, 14) float with attr
``split``.

TPU-native: the extractor is a jit-compiled batched forward. ImageNet weights
are loaded from a torchvision ``resnet101`` checkpoint via ``--weights-pth``
(no network access assumed); without it the extractor is randomly initialized
and a loud warning is emitted — feature parity with the reference REQUIRES the
torchvision weights.
"""
import argparse
import glob
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import h5py
import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from probnmn_tpu.models import resnet

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("-i", "--image-dir", default="data/images/train")
parser.add_argument("-o", "--output-h5path", default="data/clevr_train_features.h5")
parser.add_argument("-s", "--split", default="train", choices=["train", "val", "test"])
parser.add_argument("-b", "--batch-size", type=int, default=128)
parser.add_argument("--gpu-ids", nargs="+", type=int, default=[0], help="Ignored.")
parser.add_argument("--cpu-workers", type=int, default=0, help="Ignored.")
parser.add_argument(
    "--weights-pth", default="",
    help="Path to a torchvision resnet101 state_dict (.pth) for ImageNet weights.",
)


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    image = Image.open(path).convert("RGB")
    image = image.resize((resnet.IMAGE_SIZE, resnet.IMAGE_SIZE), Image.BILINEAR)
    array = np.asarray(image, np.float32) / 255.0
    return (array - resnet.IMAGE_MEAN) / resnet.IMAGE_STD


def main(args):
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger(__name__)

    image_paths = sorted(glob.glob(os.path.join(args.image_dir, "*.png")))
    logger.info("Found %d images", len(image_paths))

    if args.weights_pth:
        import torch

        state = torch.load(args.weights_pth, map_location="cpu")
        params = resnet.params_from_torch_state_dict(
            {k: v.numpy() for k, v in state.items()}
        )
        logger.info("Loaded ImageNet weights from %s", args.weights_pth)
    else:
        params = resnet.init_resnet101_stage3_params(jax.random.PRNGKey(0))
        logger.warning(
            "NO --weights-pth GIVEN: extracting with RANDOM weights. Feature "
            "parity with the reference requires torchvision resnet101 weights."
        )

    extract = jax.jit(lambda imgs: resnet.resnet101_stage3(params, imgs))

    with h5py.File(args.output_h5path, "w") as output_h5:
        output_h5.attrs["split"] = args.split
        features = output_h5.create_dataset(
            "features", (len(image_paths), 1024, 14, 14), dtype="float32"
        )
        for start in tqdm(range(0, len(image_paths), args.batch_size)):
            batch_paths = image_paths[start : start + args.batch_size]
            batch = np.stack([load_image(p) for p in batch_paths])
            # Pad the final batch to keep jit shapes static.
            pad = args.batch_size - len(batch_paths)
            if pad:
                batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:], np.float32)])
            out = np.asarray(extract(jnp.asarray(batch)))[: len(batch_paths)]
            # NHWC -> NCHW, the reference H5 layout.
            features[start : start + len(batch_paths)] = out.transpose(0, 3, 1, 2)
    logger.info("Wrote features to %s", args.output_h5path)


if __name__ == "__main__":
    main(parser.parse_args())
