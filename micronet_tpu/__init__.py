"""micronet_tpu — TPU-native low-bit quantized training + inference framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the full capability set of
the reference library ``666DZY666/micronet`` (see SURVEY.md): DoReFa and IAO
high-bit fake-quant QAT/PTQ/QAFT, ternary/binary (wbwtab) low-bit training,
both BN-fusion schemes, BN-gamma channel pruning, and an integer-simulation
inference engine — built TPU-first: NHWC/HWIO layouts, functional quantizer
state, GSPMD sharding for data/tensor parallelism, Pallas kernels on the hot
paths.
"""

__version__ = "0.1.0"

from . import quant
from .quant.config import QuantConfig
from .selftest import quant_test_auto, quant_test_manual

__all__ = [
    "quant",
    "QuantConfig",
    "quant_test_manual",
    "quant_test_auto",
    "__version__",
]


def __getattr__(name):
    # lazy subpackage imports keep `import micronet_tpu` light
    if name in ("nn", "models", "train", "prune", "infer", "ops", "parallel", "utils"):
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
