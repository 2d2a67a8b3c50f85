"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the JAX way — N virtual CPU devices
(SURVEY.md §4) — so the suite needs no TPU hardware.

This environment preloads jax already bound to a live (shared, tunneled)
TPU platform at interpreter start, so env vars set here are too late;
instead the backend is re-pointed in process: jax_platforms=cpu +
jax_num_cpu_devices=8 + clear_backends. Set MICRONET_TEST_TPU=1 to
deliberately run the suite against the real chip.
"""

import os

import jax

if not os.environ.get("MICRONET_TEST_TPU"):
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:  # pragma: no cover - older jax fallback
        jax._src.xla_bridge._clear_backends()
    assert jax.default_backend() == "cpu", jax.default_backend()

jax.config.update("jax_default_matmul_precision", "highest")
