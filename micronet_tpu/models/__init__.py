"""Model zoo: NIN, NIN-GC, CIFAR ResNets, LeNet (reference micronet/models)."""

from . import lenet, nin, nin_gc, resnet
from .lenet import LeNet
from .resnet import resnet18, resnet34, resnet50, resnet101, resnet152

__all__ = [
    "nin",
    "nin_gc",
    "resnet",
    "lenet",
    "LeNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
]
