"""Pytree checkpoints: params + quant state + BN state + optimizer state.

The reference saves ``{best_acc, state_dict}`` (plus ``cfg`` for pruned
models) with fixed filenames, only on accuracy improvement, stripping the
DataParallel ``module.`` prefix (iao/main.py:32-98). Here the analogue is
the full nnx state pytree — nnx.Param, QuantStat (observer min/max, scale,
zero_point, BN running stats), and optimizer moments all ride along, which
is exactly how the QAT -> QAFT -> fuse handoffs work (SURVEY.md §5).

Format: a single ``np.savez`` archive of flattened ``path -> array`` plus a
tiny JSON header (step, best_acc, model cfg). No orbax dependency; files
are portable and human-inspectable via ``np.load``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import nnx

__all__ = [
    "save_state",
    "save_state_async",
    "wait_for_saves",
    "load_state",
    "state_to_arrays",
    "arrays_to_state",
]


def _flatten(state: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def state_to_arrays(model: nnx.Module) -> Dict[str, np.ndarray]:
    """Full nnx state (Param + QuantStat + BatchStat + ...) as flat arrays."""
    return _flatten(nnx.state(model))


def arrays_to_state(model: nnx.Module, arrays: Dict[str, np.ndarray]) -> None:
    """Load flat arrays back into ``model`` (shapes must match)."""
    state = nnx.state(model)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    new_leaves = []
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing {key}")
        arr = arrays[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs model {np.shape(leaf)}"
            )
        new_leaves.append(jax.numpy.asarray(arr))
    nnx.update(model, jax.tree_util.tree_unflatten(treedef, new_leaves))


def _snapshot_arrays(
    model: nnx.Module,
    optimizer: Optional[nnx.Optimizer],
    step: int,
    best_acc: float,
    extra: Optional[Dict[str, Any]],
) -> Dict[str, np.ndarray]:
    """Device->host snapshot + header, shared by the sync and async
    writers so the two paths can never produce divergent formats."""
    arrays = {f"model/{k}": v for k, v in state_to_arrays(model).items()}
    if optimizer is not None:
        arrays.update(
            {f"opt/{k}": v for k, v in _flatten(nnx.state(optimizer)).items()}
        )
    header = json.dumps({"step": step, "best_acc": best_acc, "extra": extra or {}})
    arrays["__header__"] = np.frombuffer(header.encode(), dtype=np.uint8)
    return arrays


def _write_atomic(path: str, arrays: Dict[str, np.ndarray], tag: str = "") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp{tag}.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def save_state(
    path: str,
    model: nnx.Module,
    *,
    optimizer: Optional[nnx.Optimizer] = None,
    step: int = 0,
    best_acc: float = 0.0,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a checkpoint. ``extra`` holds JSON-serializable metadata (e.g.
    the pruned-model ``cfg`` list, mirroring normal_regular_prune.py:239)."""
    _write_atomic(path, _snapshot_arrays(model, optimizer, step, best_acc, extra))


_PENDING_SAVES: list = []  # (thread, errbox) pairs
_SAVE_SEQ = [0]


def save_state_async(
    path: str,
    model: nnx.Module,
    *,
    optimizer: Optional[nnx.Optimizer] = None,
    step: int = 0,
    best_acc: float = 0.0,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Non-blocking checkpoint: device->host snapshot happens NOW (so the
    training loop may mutate state immediately after), the npz compression
    + disk write run on a background thread. Each writer gets a UNIQUE tmp
    file and waits for the previous writer before its atomic os.replace,
    so overlapping saves can neither interleave bytes nor land out of
    order. Write errors are captured and re-raised by
    :func:`wait_for_saves` (the Trainer calls it at the end of fit())."""
    import threading

    arrays = _snapshot_arrays(model, optimizer, step, best_acc, extra)
    prev = _PENDING_SAVES[-1][0] if _PENDING_SAVES else None
    _SAVE_SEQ[0] += 1
    tag = f".{_SAVE_SEQ[0]}"
    errbox: list = []

    def write():
        try:
            if prev is not None:
                prev.join()  # keep replace order == save order
            _write_atomic(path, arrays, tag)
        except Exception as e:  # surfaced by wait_for_saves
            errbox.append(e)

    t = threading.Thread(target=write, daemon=True)
    t.start()
    _PENDING_SAVES.append((t, errbox))


def wait_for_saves() -> None:
    """Join all outstanding async checkpoint writes; raise if any failed
    (a silently-lost checkpoint would defeat preemption safety)."""
    errors = []
    while _PENDING_SAVES:
        t, errbox = _PENDING_SAVES.pop()
        t.join()
        errors.extend(errbox)
    if errors:
        raise RuntimeError(f"async checkpoint write(s) failed: {errors}")


def load_state(
    path: str,
    model: nnx.Module,
    *,
    optimizer: Optional[nnx.Optimizer] = None,
) -> Tuple[int, float, Dict[str, Any]]:
    """Restore ``model`` (and optionally optimizer) in place.

    Returns (step, best_acc, extra) — the resume contract of the
    reference's ``--resume`` (iao/main.py:431-459).
    """
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    header = json.loads(bytes(arrays.pop("__header__")).decode())
    model_arrays = {
        k[len("model/") :]: v for k, v in arrays.items() if k.startswith("model/")
    }
    arrays_to_state(model, model_arrays)
    if optimizer is not None:
        opt_arrays = {
            k[len("opt/") :]: v for k, v in arrays.items() if k.startswith("opt/")
        }
        state = nnx.state(optimizer)
        leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
        new_leaves = []
        for p, leaf in leaves:
            key = "/".join(str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
            new_leaves.append(
                jax.numpy.asarray(opt_arrays[key]) if key in opt_arrays else leaf
            )
        nnx.update(optimizer, jax.tree_util.tree_unflatten(treedef, new_leaves))
    return header["step"], header["best_acc"], header["extra"]
