"""Network-slimming (BN-gamma) channel pruning, arXiv 1708.06519.

Behavioral port of the reference pruning engine (SURVEY.md §2.4):

- sparsity: L1 subgradient ``s * sign(gamma)`` added to every BN weight
  grad after backward (``updateBN``, pruning/main.py:65-69);
- global threshold at the ``percent`` quantile of |gamma| across the first
  ``layers-1`` BN layers (normal_regular_prune.py:61-84);
- per-layer mask ``|gamma| > thr`` with a >=1-channel floor (:101-104);
- "regular" rounding of the surviving channel count to the nearest
  multiple of ``base_number`` (:106-124), re-thresholding by the
  ``remain``-th largest |gamma| (``ge``, ties keep extras — reproduced);
- grouped-conv mode (gc_prune.py:62-84): per-layer base = the smallest
  common multiple of the adjacent layers' group counts, groups derived
  from weight shapes; masks/cfg only, weights NOT copied (the reference
  retrains nin_gc from scratch at the pruned widths);
- model surgery (normal mode): a new net built at ``cfg`` widths with
  surviving BN rows + conv out/in slices + linear in-features copied
  (:182-231); checkpoint carries {cfg, state} so the smaller model
  rebuilds (:239-241).

All tensor layout is HWIO/NHWC: conv out-channel = axis 3, in-channel =
axis 2 (the reference's OIHW dims 0/1).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..nn import modules as M
from ..nn.transform import _children

__all__ = [
    "bn_l1_grad_update",
    "compute_prune_masks",
    "gc_base_numbers",
    "prune_model",
    "sparsity_report",
]


def _ordered_modules(model: nnx.Module) -> List[nnx.Module]:
    """Module list in definition order (the analogue of model.modules())."""
    out: List[nnx.Module] = []

    def rec(m: nnx.Module):
        for _, child, _ in _children(m):
            out.append(child)
            rec(child)

    rec(model)
    return out


# --------------------------------------------------------------------------
# sparsity training hook (updateBN)
# --------------------------------------------------------------------------


def bn_l1_grad_update(model: nnx.Module, grads: nnx.State, s: float) -> nnx.State:
    """Add ``s * sign(gamma)`` to every BatchNorm2d weight grad
    (pruning/main.py:65-69). Call between value_and_grad and the optimizer
    update; pure on the grads pytree."""
    gammas = {}
    for path, mod in nnx.iter_modules(model):
        if isinstance(mod, M.BatchNorm2d):
            gammas[tuple(path) + ("weight",)] = mod.weight[...]
    bn_paths = set(gammas)

    flat = nnx.to_flat_state(grads)
    new_flat = []
    for path, leaf in flat:
        if tuple(path) in bn_paths:
            g = gammas[tuple(path)]
            leaf = type(leaf)(leaf[...] + s * jnp.sign(g))
        new_flat.append((path, leaf))
    return nnx.from_flat_state(new_flat)


# --------------------------------------------------------------------------
# mask computation
# --------------------------------------------------------------------------


def _prunable_bns(model: nnx.Module, layers: Optional[int]) -> List[M.BatchNorm2d]:
    """First ``layers - 1`` BatchNorm2d modules in definition order — the
    classifier conv's BN stays (normal_regular_prune.py:63-67). With
    ``layers=None`` every BN is prunable."""
    bns = [m for m in _ordered_modules(model) if isinstance(m, M.BatchNorm2d)]
    if layers is not None:
        bns = bns[: layers - 1]
    return bns


def _round_regular(remain: int, base: int, total: int) -> int:
    """Regular-channel rounding (normal_regular_prune.py:106-124): snap to
    the nearer multiple of ``base`` (upper wins ties), capped at total."""
    if base <= 1 or remain % base == 0 or remain <= base:
        return remain
    v, n = 0, 1
    while v < remain:
        n += 1
        v = base * n
    if remain - (v - base) < v - remain:
        remain = v - base
    else:
        remain = v
    return min(remain, total)


def gc_base_numbers(model: nnx.Module) -> List[int]:
    """Per-BN rounding base for grouped-conv models (gc_prune.py:62-84):
    LCM of the group counts of the adjacent convs, groups derived from
    weight shapes (out_ch of conv j / in_ch-per-group of conv j+1)."""
    convs = [m for m in _ordered_modules(model) if isinstance(m, M.Conv2d)]
    nums = [c.weight[...].shape[3] for c in convs]  # out channels
    chans = [c.weight[...].shape[2] for c in convs]  # in channels / groups
    groups = [1] + [nums[j] // chans[j + 1] for j in range(len(nums) - 1)]
    bases = []
    for j in range(len(groups) - 1):
        a, b = groups[j], groups[j + 1]
        bases.append(int(np.lcm(a, b)))
    return bases


def compute_prune_masks(
    model: nnx.Module,
    percent: float,
    *,
    base_number: int = 1,
    gc: bool = False,
    layers: Optional[int] = None,
    zero_pruned: bool = True,
) -> Tuple[List[int], List[np.ndarray], float]:
    """Global-threshold mask computation over prunable BNs.

    Returns ``(cfg, masks, pruned_ratio)``. With ``zero_pruned`` the old
    model's pruned gamma/beta are zeroed in place (the reference's
    pre-prune test state, normal_regular_prune.py:126-127).
    """
    bns = _prunable_bns(model, layers)
    if not bns:
        return [], [], 0.0
    gammas = [np.abs(np.asarray(bn.weight[...])) for bn in bns]
    all_g = np.sort(np.concatenate(gammas))
    total = all_g.size
    thre_index = min(int(total * percent), total - 1)
    thr = all_g[thre_index]

    bases = gc_base_numbers(model) if gc else None
    cfg: List[int] = []
    masks: List[np.ndarray] = []
    pruned = 0
    for i, (bn, g) in enumerate(zip(bns, gammas)):
        mask = (g > thr).astype(np.float32)
        remain = int(mask.sum())
        if remain == 0:  # >=1-channel floor (:101-104)
            remain = 1
            mask[:] = 0.0
            mask[int(np.argmax(g))] = 1.0
        base = bases[i] if gc else base_number
        rounded = _round_regular(remain, base, g.size)
        if rounded != remain:
            order = np.sort(g)
            thre_1 = order[-rounded]
            mask = (g >= thre_1).astype(np.float32)  # ties keep extras (ref ge)
        remain = rounded
        pruned += mask.size - int(mask.sum())
        cfg.append(int(remain))
        masks.append(mask)
        if zero_pruned:
            bn.weight[...] = bn.weight[...] * jnp.asarray(mask)
            bn.bias[...] = bn.bias[...] * jnp.asarray(mask)
    return cfg, masks, pruned / total


# --------------------------------------------------------------------------
# model surgery
# --------------------------------------------------------------------------


def prune_model(
    model: nnx.Module,
    new_model: nnx.Module,
    masks: Sequence[np.ndarray],
    *,
    layers: Optional[int] = None,
) -> nnx.Module:
    """Copy surviving channels old -> new (normal_regular_prune.py:182-231).

    ``new_model`` must be the same architecture built at the pruned ``cfg``
    widths (e.g. ``nin.Net(cfg, rngs=...)``). Walks both trees in
    definition order: pruned BNs copy masked rows; convs slice input
    channels by the previous mask and output channels by the current one;
    the post-prunable-range conv/linear slices inputs only.
    """
    olds = _ordered_modules(model)
    news = _ordered_modules(new_model)
    assert len(olds) == len(news), "architecture mismatch"
    n_prunable = len(_prunable_bns(model, layers))

    def idx(mask: np.ndarray) -> np.ndarray:
        return np.flatnonzero(np.asarray(mask))

    start = np.arange(3)  # input image channels all kept
    mask_i = 0
    end = idx(masks[0]) if masks else None
    for m0, m1 in zip(olds, news):
        if isinstance(m0, M.BatchNorm2d):
            if mask_i < n_prunable:
                sel = idx(masks[mask_i])
                m1.weight[...] = jnp.asarray(np.asarray(m0.weight[...])[sel])
                m1.bias[...] = jnp.asarray(np.asarray(m0.bias[...])[sel])
                m1.running_mean[...] = jnp.asarray(
                    np.asarray(m0.running_mean[...])[sel]
                )
                m1.running_var[...] = jnp.asarray(
                    np.asarray(m0.running_var[...])[sel]
                )
                mask_i += 1
                start = sel
                end = idx(masks[mask_i]) if mask_i < len(masks) else None
            else:
                m1.weight[...] = m0.weight[...]
                m1.bias[...] = m0.bias[...]
                m1.running_mean[...] = m0.running_mean[...]
                m1.running_var[...] = m0.running_var[...]
        elif isinstance(m0, M.Conv2d):
            w = np.asarray(m0.weight[...])  # HWIO
            if mask_i < n_prunable and end is not None:
                w = w[:, :, start, :][:, :, :, end]  # slice in, then out
                m1.weight[...] = jnp.asarray(w)
                if m0.bias is not None:
                    m1.bias[...] = jnp.asarray(np.asarray(m0.bias[...])[end])
            else:  # conv past the prunable range: slice inputs only
                m1.weight[...] = jnp.asarray(w[:, :, start, :])
                if m0.bias is not None:
                    m1.bias[...] = m0.bias[...]
        elif isinstance(m0, M.Linear):
            w = np.asarray(m0.weight[...])  # (in, out)
            m1.weight[...] = jnp.asarray(w[start, :])
            if m0.bias is not None:
                m1.bias[...] = m0.bias[...]
    return new_model


def sparsity_report(model: nnx.Module) -> dict:
    """Per-BN |gamma| stats — observability for sparsity training."""
    out = {}
    for i, bn in enumerate(
        m for m in _ordered_modules(model) if isinstance(m, M.BatchNorm2d)
    ):
        g = np.abs(np.asarray(bn.weight[...]))
        out[f"bn{i}"] = {
            "channels": int(g.size),
            "mean_abs_gamma": float(g.mean()),
            "frac_below_1e-2": float((g < 1e-2).mean()),
        }
    return out
