"""theanet_tpu — a TPU-native (JAX/XLA/Pallas) image-classification training
framework with the full capability surface of the Theano reference
``rakeshvar/theanet``: in-graph per-batch augmentation, dict-driven network
specs, per-layer momentum SGD with L1/L2/max-norm, multiple output heads,
pickle checkpoint/resume, and pluggable dataset modules — redesigned for the
MXU/HBM/ICI rather than translated.
"""

from . import layers
from .model import (
    NeuralNet,
    get_layers_info,
    get_training_params_info,
    get_wts_info,
)

__version__ = "0.1.0"

__all__ = [
    "layers",
    "NeuralNet",
    "get_layers_info",
    "get_wts_info",
    "get_training_params_info",
]
