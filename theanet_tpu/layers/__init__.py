"""Public layer registry (parity with reference theanet/layer/__init__.py:1-7).

The net builder dispatches layer-spec names through this module with getattr,
like the reference (neuralnet.py:87,121).
"""

from .base import Layer, DEFAULT_REG
from .input import InputLayer, ElasticLayer, ColorLayer
from .conv import ConvLayer, PoolLayer, MeanLayer
from .dense import HiddenLayer, DropOutLayer
from .out import SoftmaxLayer, ExpLossLayer, HingeLayer, CenteredOutLayer, OutputMixin
from .aux import LocationInfo, AuxConcatLayer, SoftAuxLayer

__all__ = [
    "Layer",
    "DEFAULT_REG",
    "InputLayer",
    "ElasticLayer",
    "ColorLayer",
    "ConvLayer",
    "PoolLayer",
    "MeanLayer",
    "HiddenLayer",
    "DropOutLayer",
    "SoftmaxLayer",
    "ExpLossLayer",
    "HingeLayer",
    "CenteredOutLayer",
    "OutputMixin",
    "LocationInfo",
    "AuxConcatLayer",
    "SoftAuxLayer",
]
