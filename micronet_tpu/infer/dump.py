"""Human-readable model / parameter dumps.

The reference's bn-fuse and quant_model_para tools save, next to every
exported model, ``.txt`` renderings of the module tree and of the full
state dict (wbwtab/bn_fuse/bn_fuse.py:155-200, dorefa/quant_model_test/
quant_model_para.py:60-98) so deploy engineers can eyeball the fused
weights, scales and zero points without loading torch. Equivalent here:

- ``dump_model_txt(path, model)``   — module tree with per-layer param
  shapes/dtypes and the quant-critical scalars (scale, zero_point,
  alpha), then every state array printed in full.
- ``dump_params_json(path, model)`` — machine-readable summary (shapes,
  dtypes, scales/zero-points as lists) for tooling.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np
from flax import nnx

from ..train.checkpoint import state_to_arrays

__all__ = ["dump_model_txt", "dump_params_json"]

_QUANT_KEYS = ("scale", "zero_point", "act_scale", "w_scale", "alpha", "out_scale")


def _module_tree_lines(model: nnx.Module) -> list:
    lines = []
    for path, mod in nnx.iter_modules(model):
        name = "/".join(str(p) for p in path) or "<root>"
        attrs = []
        for k, v in vars(mod).items():
            if isinstance(v, nnx.Variable):
                arr = np.asarray(v.get_value())
                attrs.append(f"{k}{list(arr.shape)}:{arr.dtype}")
            elif isinstance(v, (int, float, bool, str, tuple)) and not k.startswith(
                "_"
            ):
                attrs.append(f"{k}={v}")
        lines.append(f"{name}: {type(mod).__name__}({', '.join(attrs)})")
    return lines


def dump_model_txt(path: str, model: nnx.Module) -> None:
    """Write the module tree + full parameter values as text (the
    reference's paired ``*.txt`` / ``*_para.txt`` dumps, in one file)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = state_to_arrays(model)
    with open(path, "w") as f:
        f.write("# module tree\n")
        for line in _module_tree_lines(model):
            f.write(line + "\n")
        f.write("\n# parameters\n")
        for key in sorted(arrays):
            arr = arrays[key]
            f.write(f"\n{key}  shape={list(arr.shape)}  dtype={arr.dtype}\n")
            f.write(
                np.array2string(
                    arr, threshold=np.inf, max_line_width=120, precision=6
                )
                + "\n"
            )


def dump_params_json(path: str, model: nnx.Module) -> None:
    """Machine-readable summary: every array's shape/dtype, with the
    quant-critical small tensors (scales, zero points, alpha) inlined."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = state_to_arrays(model)
    out: Dict[str, Any] = {}
    for key in sorted(arrays):
        arr = arrays[key]
        entry: Dict[str, Any] = {"shape": list(arr.shape), "dtype": str(arr.dtype)}
        leaf = key.rsplit("/", 2)
        small = arr.size <= 4096
        if small and any(q in leaf for q in _QUANT_KEYS):
            entry["values"] = np.asarray(arr, dtype=np.float64).reshape(-1).tolist()
        out[key] = entry
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
