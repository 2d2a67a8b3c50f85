"""Shared kernel-dispatch predicate.

``jax.default_backend()`` alone is the wrong question for "should this
pallas_call run for real": under ``jax.default_device(cpu)`` (used to
route eager EXPORT work — BN fusion, engine freezing — to the local CPU
while the process default stays the tunneled TPU) the backend still
reports "tpu" but the op executes on a CPU device, and Mosaic refuses
("Only interpret mode is supported on CPU backend"). Every dispatcher
asks :func:`on_tpu` instead, which also honors the default_device
override.
"""

from __future__ import annotations

import jax

__all__ = ["on_tpu"]


def on_tpu() -> bool:
    """True iff an op issued HERE (current default device/backend) will
    execute on a real TPU."""
    if jax.default_backend() != "tpu":
        return False
    dev = jax.config.jax_default_device
    if dev is None:
        return True
    if isinstance(dev, str):  # jax.default_device("cpu") string form
        return dev.split(":")[0] == "tpu"
    return getattr(dev, "platform", "tpu") == "tpu"
