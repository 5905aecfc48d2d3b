from setuptools import find_packages, setup

setup(
    name="probnmn-tpu",
    version="0.1.0",
    author="probnmn-tpu developers",
    description=(
        "TPU-native (JAX/XLA/Pallas) framework for Probabilistic Neural-Symbolic "
        "Models for Interpretable Visual Question Answering on CLEVR"
    ),
    license="MIT",
    zip_safe=True,
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=[
        "jax", "numpy", "h5py", "pyyaml", "flax", "optax", "tensorboardX", "tqdm",
    ],
)
