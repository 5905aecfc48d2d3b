r"""
probnmn_tpu: a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
kdexd/probnmn-clevr — Probabilistic Neural-Symbolic VQA on CLEVR.

Layers (bottom-up): config -> data (vocabulary, readers, datasets, samplers,
pipeline) -> ops (LSTM/attention/conv kernels) -> models (ProgramPrior,
ProgramGenerator, QuestionReconstructor, NeuralModuleNetwork) -> modules (ELBO /
REINFORCE) -> training & evaluation runtimes -> CLI scripts.
"""
__version__ = "0.1.0"

from probnmn_tpu.config import Config  # noqa: F401
