"""Force the CPU backend in-process (importable prelude for scripts).

This environment preloads jax bound to the live tunneled TPU at
interpreter start (sitecustomize), so ``JAX_PLATFORMS=cpu`` in the
environment is too late — the backend must be re-pointed in process,
exactly as tests/conftest.py does. ``import tests._cpu`` (or
``exec(open('tests/_cpu.py').read())``) before any jax computation.
"""

import os

import jax

if not os.environ.get("MICRONET_TEST_TPU"):
    jax.config.update("jax_num_cpu_devices", int(os.environ.get("MICRONET_CPU_DEVICES", "8")))
    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:  # pragma: no cover - older jax fallback
        jax._src.xla_bridge._clear_backends()
    assert jax.default_backend() == "cpu", jax.default_backend()
