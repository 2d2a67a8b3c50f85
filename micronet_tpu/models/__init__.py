"""Model zoo: NIN, NIN-GC, CIFAR ResNets, LeNet (reference micronet/models)
plus the net-new LLM serving families (TinyDecoder demo, Llama)."""

from . import lenet, nin, nin_gc, resnet
from .lenet import LeNet
from .llama import Llama, LlamaConfig, llama3_8b, llama_tiny, quantize_llama
from .resnet import resnet18, resnet34, resnet50, resnet101, resnet152

__all__ = [
    "nin",
    "nin_gc",
    "resnet",
    "lenet",
    "LeNet",
    "Llama",
    "LlamaConfig",
    "llama3_8b",
    "llama_tiny",
    "quantize_llama",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
]
