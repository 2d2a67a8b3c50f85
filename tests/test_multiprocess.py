import pytest
"""Two-process DCN-path test (VERDICT r1 item 6).

Spawns two real OS processes, each with 4 virtual CPU devices, joined via
``jax.distributed.initialize`` into one 8-device / 2-host cluster — the
CPU stand-in for a multi-host TPU pod. Complements the single-process
8-way mesh tests (test_train.py): this exercises the actual DCN bring-up
(coordinator handshake, cross-process global arrays, multihost
checkpoint IO), which a single process never touches.

The per-worker assertions live in ``_mp_worker.py``; here we check both
workers exit cleanly and observed the SAME loss (the global batch is
split across processes, so equal losses mean the cross-process psum
actually pooled both halves).
"""

import os
import re
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_qat(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # belt and braces: jax may be imported at interpreter start
    # (sitecustomize), so pin the platform via env here too — the worker
    # additionally re-points via jax.config, conftest-style
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=_REPO,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    losses = []
    for pid, out in enumerate(outs):
        m = re.search(rf"WORKER{pid} OK loss=([\d.]+)", out)
        assert m, f"worker {pid} missing OK line:\n{out[-2000:]}"
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1], losses
