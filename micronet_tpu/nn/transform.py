"""`prepare()` — the model-tree quantization transform.

Behavioral port of the three recursive rewrites (SURVEY.md §2.1-2.3):

- IAO (iao/quantize.py:1501-1824): Conv2d -> QuantConv2d, or — with
  ``bn_fuse`` — the (Conv2d, following sibling BatchNorm2d) pair ->
  (QuantBNFuseConv2d, Identity); ConvTranspose2d/Linear/LeakyReLU/Sigmoid/
  pools/Add -> quant variants. Plain ReLU is deliberately left alone ("it
  will be fused in quant_inference", iao/quantize.py:1705-1709).
- DoReFa (dorefa/quantize.py:202-323): Conv2d/ConvTranspose2d/Linear ->
  quant variants, skipping the FIRST quantizable layer
  (``layer_counter[0] > 1``).
- wbwtab (wbwtab/quantize.py:247-347): convs quantized only when
  ``1 < counter < layer_num`` (first AND last stay float); ReLU -> binary
  ActivationQuantizer in the range ``0 < counter < layer_num``.

The mechanism is nnx-native: walk a module's attributes (and nnx.List
containers) in insertion order — the analogue of torch ``named_children``
order — and swap entries in place. The result stays a plain nnx module
tree: jit/grad/shard as usual.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Callable, Iterator, List, Optional, Tuple

from flax import nnx

from ..quant.config import QuantConfig
from . import modules as M
from . import qat_dorefa, qat_iao, qat_wbwtab

__all__ = ["prepare", "prepare_iao", "prepare_dorefa", "prepare_wbwtab"]

Setter = Callable[[nnx.Module], None]


def _order_key(val) -> float:
    """Definition-order key: a module's own ``_mn_order`` stamp (see
    OrderedModule) or the min over its descendants (covers containers and
    user modules that don't subclass OrderedModule)."""
    own = vars(val).get("_mn_order") if hasattr(val, "__dict__") else None
    if own is not None:
        return own
    best = float("inf")
    if isinstance(val, nnx.List):
        for item in val:
            if isinstance(item, (nnx.Module, nnx.List)):
                best = min(best, _order_key(item))
    elif isinstance(val, nnx.Module):
        for k, v in vars(val).items():
            if not k.startswith("_") and isinstance(v, (nnx.Module, nnx.List)):
                best = min(best, _order_key(v))
    return best


def _transfer_stamp(new: nnx.Module, old: nnx.Module) -> None:
    stamp = vars(old).get("_mn_order")
    if stamp is not None and isinstance(new, nnx.Module):
        new._mn_order = stamp


def _children(module: nnx.Module) -> Iterator[Tuple[str, nnx.Module, Setter]]:
    """Yield (name, child, setter) in DEFINITION order.

    Python dict order cannot be trusted here: flax graph rebuilds
    (deepcopy, nnx.clone, even the split/merge inside nnx.value_and_grad)
    alphabetize module attributes. Entries are therefore sorted by the
    construction-order stamps (OrderedModule). nnx.List containers are
    flattened into their parent's scope (list order is inherently stable)
    so e.g. Sequential's layers behave like torch named_children — which
    is what Conv->BN adjacency pairing relies on. Setters transfer the
    old child's stamp onto its replacement so rewrites keep its position.
    """
    entries = [
        (name, val)
        for name, val in vars(module).items()
        if not name.startswith("_") and isinstance(val, (nnx.Module, nnx.List))
    ]
    entries.sort(key=lambda kv: _order_key(kv[1]))
    for name, val in entries:
        if isinstance(val, nnx.List):
            for i in range(len(val)):
                item = val[i]
                if isinstance(item, nnx.Module):

                    def _set(new, _lst=val, _i=i, _old=item):
                        _lst[_i] = new
                        _transfer_stamp(new, _old)  # after: assignment re-stamps

                    yield f"{name}[{i}]", item, _set
        else:

            def _set(new, _mod=module, _name=name, _old=val):
                setattr(_mod, _name, new)
                _transfer_stamp(new, _old)  # after: assignment re-stamps

            yield name, val, _set


def _restore_attr_order(dst: nnx.Module, src: nnx.Module) -> None:
    """Recursively reorder ``dst``'s attribute dict to match ``src``'s.

    flax's ``Module.__deepcopy__``/``nnx.clone`` rebuild modules from the
    graph representation, which alphabetizes attributes — destroying the
    insertion order that Conv->BN adjacency pairing (and torch
    named_children parity in general) depends on. Structure is identical
    after a copy, so walking both trees and re-inserting keys in source
    order restores it.
    """
    dd = vars(dst)
    for key, sval in list(vars(src).items()):
        if key in dd:
            dd[key] = dd.pop(key)  # re-insert in src order
            dval = dd[key]
            if isinstance(sval, nnx.List) and isinstance(dval, nnx.List):
                for i in range(min(len(sval), len(dval))):
                    if isinstance(sval[i], nnx.Module) and isinstance(
                        dval[i], nnx.Module
                    ):
                        _restore_attr_order(dval[i], sval[i])
            elif isinstance(sval, nnx.Module) and isinstance(dval, nnx.Module):
                _restore_attr_order(dval, sval)


def _copy_model(model: nnx.Module) -> nnx.Module:
    new = copy.deepcopy(model)
    _restore_attr_order(new, model)
    return new


def _conv_args(c: M.Conv2d) -> dict:
    return dict(
        in_channels=c.in_channels,
        out_channels=c.out_channels,
        kernel_size=c.kernel_size,
        stride=c.stride,
        padding=c.padding,
        dilation=c.dilation,
        groups=c.groups,
        bias=c.bias is not None,
    )


def _convt_args(c: M.ConvTranspose2d) -> dict:
    return dict(
        in_channels=c.in_channels,
        out_channels=c.out_channels,
        kernel_size=c.kernel_size,
        stride=c.stride,
        padding=c.padding,
        output_padding=c.output_padding,
        groups=c.groups,
        bias=c.bias is not None,
        dilation=c.dilation,
    )


def _copy_wb(dst, src) -> None:
    dst.weight[...] = src.weight[...]
    if src.bias is not None:
        dst.bias[...] = src.bias[...]


# --------------------------------------------------------------------------
# IAO
# --------------------------------------------------------------------------


def _count_quantizable_iao(module: nnx.Module, bn_fuse: bool) -> int:
    """Number of conv/convT/linear layers :func:`_add_quant_op_iao` will
    quantize — mirrors its walk exactly (in bn_fuse mode a Conv2d counts
    only when the following sibling BN pairs with it)."""
    total = 0
    pending = False
    for _, child, _ in _children(module):
        if type(child) is M.Conv2d:
            if bn_fuse:
                pending = True
            else:
                total += 1
        elif type(child) is M.BatchNorm2d and bn_fuse and pending:
            pending = False
            total += 1
        elif type(child) is (M.ConvTranspose2d) or type(child) is M.Linear:
            total += 1
        else:
            total += _count_quantizable_iao(child, bn_fuse)
    return total


def _layer_cfg(cfg: QuantConfig, idx: int, total: int) -> QuantConfig:
    """Apply the first/last-layer bit exceptions (QuantConfig docstring;
    the reference's skip-first/skip-last rules widened into per-position
    bit overrides so the whole net still freezes to the int engine)."""
    a, w = cfg.a_bits, cfg.w_bits
    if idx == 0:
        a = cfg.first_layer_a_bits or a
        w = cfg.first_layer_w_bits or w
    if idx == total - 1:
        a = cfg.last_layer_a_bits or a
        w = cfg.last_layer_w_bits or w
    if (a, w) == (cfg.a_bits, cfg.w_bits):
        return cfg
    import dataclasses as _dc

    return _dc.replace(cfg, a_bits=a, w_bits=w)


def _add_quant_op_iao(
    module: nnx.Module,
    cfg: QuantConfig,
    rngs: nnx.Rngs,
    _ctr: Optional[list] = None,
    _total: int = 0,
) -> None:
    if _ctr is None:
        _ctr = [0]
        _total = _count_quantizable_iao(module, cfg.bn_fuse)

    def next_cfg() -> QuantConfig:
        c = _layer_cfg(cfg, _ctr[0], _total)
        _ctr[0] += 1
        return c

    pending_conv: Optional[Tuple[M.Conv2d, Setter]] = None
    for _, child, set_child in _children(module):
        # exact-type checks: quant layers subclass the float layers, and
        # already-prepared modules must not be re-wrapped
        if type(child) is M.Conv2d:
            if cfg.bn_fuse:
                pending_conv = (child, set_child)
            else:
                q = qat_iao.QuantConv2d(
                    cfg=next_cfg(), rngs=rngs, **_conv_args(child)
                )
                _copy_wb(q, child)
                set_child(q)
        elif type(child) is M.BatchNorm2d and cfg.bn_fuse and pending_conv is not None:
            conv, set_conv = pending_conv
            pending_conv = None
            q = qat_iao.QuantBNFuseConv2d(
                eps=child.eps,
                momentum=child.momentum,
                cfg=next_cfg(),
                rngs=rngs,
                **_conv_args(conv),
            )
            _copy_wb(q, conv)
            q.gamma[...] = child.weight[...]
            q.beta[...] = child.bias[...]
            q.running_mean[...] = child.running_mean[...]
            q.running_var[...] = child.running_var[...]
            set_conv(q)
            set_child(M.Identity())
        elif type(child) is M.ConvTranspose2d:
            q = qat_iao.QuantConvTranspose2d(
                cfg=next_cfg(), rngs=rngs, **_convt_args(child)
            )
            _copy_wb(q, child)
            set_child(q)
        elif type(child) is M.Linear:
            q = qat_iao.QuantLinear(
                child.in_features,
                child.out_features,
                bias=child.bias is not None,
                cfg=next_cfg(),
                rngs=rngs,
            )
            _copy_wb(q, child)
            set_child(q)
        elif type(child) is M.LeakyReLU:
            set_child(qat_iao.QuantLeakyReLU(child.negative_slope, cfg=cfg))
        elif type(child) is M.Sigmoid:
            set_child(qat_iao.QuantSigmoid(cfg))
        elif type(child) is M.MaxPool2d:
            set_child(
                qat_iao.QuantMaxPool2d(
                    child.kernel_size, child.stride, child.padding, cfg=cfg
                )
            )
        elif type(child) is M.AvgPool2d:
            set_child(
                qat_iao.QuantAvgPool2d(
                    child.kernel_size, child.stride, child.padding, cfg=cfg
                )
            )
        elif type(child) is M.AdaptiveAvgPool2d:
            set_child(qat_iao.QuantAdaptiveAvgPool2d(child.output_size, cfg=cfg))
        elif type(child) is M.Add:
            set_child(qat_iao.QuantAdd(cfg=cfg))
        elif type(child) is M.Concat:
            set_child(qat_iao.QuantConcat(child.axis, cfg=cfg))
        else:
            _add_quant_op_iao(child, cfg, rngs, _ctr, _total)


def prepare_iao(
    model: nnx.Module,
    cfg: QuantConfig,
    *,
    inplace: bool = False,
    rngs: Optional[nnx.Rngs] = None,
) -> nnx.Module:
    """IAO prepare (iao/quantize.py:1791-1824)."""
    if not inplace:
        model = _copy_model(model)  # deepcopy + attr-order restore (see _restore_attr_order)
    _add_quant_op_iao(model, cfg, rngs or nnx.Rngs(0))
    return model


# --------------------------------------------------------------------------
# DoReFa
# --------------------------------------------------------------------------


def _add_quant_op_dorefa(
    module: nnx.Module, cfg: QuantConfig, counter: List[int], rngs: nnx.Rngs
) -> None:
    for _, child, set_child in _children(module):
        if type(child) is M.Conv2d:
            counter[0] += 1
            if counter[0] > 1:  # skip the first quantizable layer
                q = qat_dorefa.QuantConv2d(cfg=cfg, rngs=rngs, **_conv_args(child))
                _copy_wb(q, child)
                set_child(q)
        elif type(child) is M.ConvTranspose2d:
            counter[0] += 1
            if counter[0] > 1:
                q = qat_dorefa.QuantConvTranspose2d(
                    cfg=cfg, rngs=rngs, **_convt_args(child)
                )
                _copy_wb(q, child)
                set_child(q)
        elif type(child) is M.Linear:
            counter[0] += 1
            if counter[0] > 1:
                q = qat_dorefa.QuantLinear(
                    child.in_features,
                    child.out_features,
                    bias=child.bias is not None,
                    cfg=cfg,
                    rngs=rngs,
                )
                _copy_wb(q, child)
                set_child(q)
        else:
            _add_quant_op_dorefa(child, cfg, counter, rngs)


def prepare_dorefa(
    model: nnx.Module,
    cfg: QuantConfig,
    *,
    inplace: bool = False,
    rngs: Optional[nnx.Rngs] = None,
) -> nnx.Module:
    """DoReFa prepare (dorefa/quantize.py:307-323)."""
    if not inplace:
        model = _copy_model(model)  # deepcopy + attr-order restore (see _restore_attr_order)
    _add_quant_op_dorefa(model, cfg, [0], rngs or nnx.Rngs(0))
    return model


# --------------------------------------------------------------------------
# wbwtab
# --------------------------------------------------------------------------


def _count_convs(module: nnx.Module) -> int:
    n = 0
    for _, child, _ in _children(module):
        if type(child) in (M.Conv2d, M.ConvTranspose2d):
            n += 1
        else:
            n += _count_convs(child)
    return n


def _add_quant_op_wbwtab(
    module: nnx.Module,
    cfg: QuantConfig,
    counter: List[int],
    layer_num: int,
    rngs: nnx.Rngs,
) -> None:
    for _, child, set_child in _children(module):
        if type(child) is M.Conv2d:
            counter[0] += 1
            if 1 < counter[0] < layer_num:  # skip first AND last
                q = qat_wbwtab.QuantConv2d(cfg=cfg, rngs=rngs, **_conv_args(child))
                _copy_wb(q, child)
                set_child(q)
        elif type(child) is M.ConvTranspose2d:
            counter[0] += 1
            if 1 < counter[0] < layer_num:
                q = qat_wbwtab.QuantConvTranspose2d(
                    cfg=cfg, rngs=rngs, **_convt_args(child)
                )
                _copy_wb(q, child)
                set_child(q)
        elif type(child) is M.ReLU:
            if 0 < counter[0] < layer_num:
                set_child(qat_wbwtab.ActivationQuantizer(A=cfg.A))
        else:
            _add_quant_op_wbwtab(child, cfg, counter, layer_num, rngs)


def prepare_wbwtab(
    model: nnx.Module,
    cfg: QuantConfig,
    *,
    inplace: bool = False,
    rngs: Optional[nnx.Rngs] = None,
) -> nnx.Module:
    """wbwtab prepare (wbwtab/quantize.py:334-347)."""
    if not inplace:
        model = _copy_model(model)  # deepcopy + attr-order restore (see _restore_attr_order)
    layer_num = _count_convs(model)
    _add_quant_op_wbwtab(model, cfg, [0], layer_num, rngs or nnx.Rngs(0))
    return model


# --------------------------------------------------------------------------
# unified entry
# --------------------------------------------------------------------------

_PREPARE = {"iao": prepare_iao, "dorefa": prepare_dorefa, "wbwtab": prepare_wbwtab}


def prepare(
    model: nnx.Module,
    cfg: Optional[QuantConfig] = None,
    *,
    method: str = "iao",
    inplace: bool = False,
    rngs: Optional[nnx.Rngs] = None,
    **overrides,
) -> nnx.Module:
    """Rewrite ``model``'s tree with quant layers per ``method``.

    ``overrides`` update fields of ``cfg`` (or of a default QuantConfig),
    e.g. ``prepare(m, method="dorefa", a_bits=4, w_bits=4)``.
    """
    if method not in _PREPARE:
        raise ValueError(f"unknown method {method!r}; pick from {sorted(_PREPARE)}")
    cfg = cfg or QuantConfig()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return _PREPARE[method](model, cfg, inplace=inplace, rngs=rngs)
