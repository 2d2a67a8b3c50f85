"""Base NN modules (flax.nnx), the rewrite anchors for quantization.

The reference quantizes models by walking the torch module tree and swapping
``nn.Conv2d/Linear/...`` children for quant variants (iao/quantize.py:
1501-1788). We keep that ergonomic contract — a mutable module graph that
:func:`micronet_tpu.nn.transform.prepare` rewrites — but on ``flax.nnx``
with NHWC/HWIO layouts and pure-functional compute underneath.

``Add`` mirrors base_module/op.py:5-11: a trivial residual-add module whose
only purpose is to be findable/replaceable by the quant transform.

Mode control: modules carry a plain ``training: bool`` attribute; flip it
recursively with :func:`train_mode` / :func:`eval_mode` (static flag ->
train/eval trace exactly like torch's two graphs).
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from . import functional as F

_ORDER = itertools.count()


def _stamp_assignment_order(val) -> None:
    """Overwrite ``_mn_order`` with a fresh stamp (nnx.List items in list
    order). Called from ``OrderedModule.__setattr__`` so that attribute
    ASSIGNMENT order — torch ``named_children`` insertion order, the
    semantics the reference's tree rewrites assume — governs tree walks
    even when submodules were *constructed* in a different order."""
    # nnx.List subclasses nnx.Module: test it first, else items are
    # never re-stamped and only the List object would get a fresh stamp
    if isinstance(val, nnx.List):
        val._mn_order = next(_ORDER)
        for item in val:
            _stamp_assignment_order(item)
    elif isinstance(val, nnx.Module):
        val._mn_order = next(_ORDER)


class OrderedModule(nnx.Module):
    """nnx.Module that records its definition order.

    flax graph rebuilds (deepcopy, nnx.clone, and even the split/merge
    inside ``nnx.value_and_grad``/``nnx.jit``) re-insert module attributes
    ALPHABETICALLY, destroying the definition order that Conv->BN pairing,
    pruning surgery, and engine chain planning depend on. Modules therefore
    carry an ``_mn_order`` stamp — a plain static attribute that rides the
    graphdef through any rebuild (rebuilds restore attributes via
    ``vars().update``, bypassing ``__setattr__``, so stamps survive
    untouched) — and :func:`micronet_tpu.nn.transform._children` sorts by
    it. Stamps are (re)issued on attribute assignment into an
    OrderedModule parent (``__setattr__`` below), so out-of-order
    pre-construction (`bn = BN(); conv = Conv(); self.conv = conv;
    self.bn = bn`) still walks in assignment order; construction-time
    stamping (``__init_subclass__``) remains as the fallback for children
    held by plain ``nnx.Module`` parents. Aliasing one module under two
    names keeps only the later position (same as the stamp being one
    attribute of the module)."""

    def __setattr__(self, name: str, value) -> None:
        if not name.startswith("_") and isinstance(value, (nnx.Module, nnx.List)):
            _stamp_assignment_order(value)
        super().__setattr__(name, value)

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        orig = cls.__dict__.get("__init__")
        if orig is None or getattr(orig, "_mn_wrapped", False):
            if orig is None and "__init__" not in cls.__dict__:
                # no own __init__: stamp via a trivial one calling super
                def init(self, *a, _cls=cls, **k):
                    super(_cls, self).__init__(*a, **k)
                    if "_mn_order" not in vars(self):
                        self._mn_order = next(_ORDER)

                init._mn_wrapped = True
                cls.__init__ = init
            return

        @functools.wraps(orig)
        def init(self, *a, **k):
            orig(self, *a, **k)
            if "_mn_order" not in vars(self):
                self._mn_order = next(_ORDER)

        init._mn_wrapped = True
        cls.__init__ = init

__all__ = [
    "Conv2d",
    "ConvTranspose2d",
    "Linear",
    "BatchNorm2d",
    "ReLU",
    "LeakyReLU",
    "Sigmoid",
    "MaxPool2d",
    "AvgPool2d",
    "AdaptiveAvgPool2d",
    "Add",
    "Concat",
    "Identity",
    "Flatten",
    "Sequential",
    "train_mode",
    "eval_mode",
]

IntPair = Union[int, Tuple[int, int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def train_mode(model: nnx.Module) -> nnx.Module:
    """Put all submodules in training mode (observer/BN-stat updates on)."""
    model.set_attributes(training=True, raise_if_not_found=False)
    return model


def eval_mode(model: nnx.Module) -> nnx.Module:
    """Put all submodules in eval mode (frozen statistics)."""
    model.set_attributes(training=False, raise_if_not_found=False)
    return model


def _uniform(key, shape, bound):
    return jax.random.uniform(
        key, shape, dtype=jnp.float32, minval=-bound, maxval=bound
    )


class Conv2d(OrderedModule):
    """2-D convolution, NHWC x HWIO (torch nn.Conv2d parity incl. default
    kaiming-uniform init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)))."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: IntPair,
        stride: IntPair = 1,
        padding: IntPair = 0,
        dilation: IntPair = 1,
        groups: int = 1,
        bias: bool = True,
        *,
        rngs: nnx.Rngs,
    ):
        kh, kw = _pair(kernel_size)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kh, kw)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.dilation = _pair(dilation)
        self.groups = groups
        fan_in = (in_channels // groups) * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        self.weight = nnx.Param(
            _uniform(rngs.params(), (kh, kw, in_channels // groups, out_channels), bound)
        )
        self.bias = (
            nnx.Param(_uniform(rngs.params(), (out_channels,), bound)) if bias else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.conv2d(
            x,
            self.weight[...],
            None if self.bias is None else self.bias[...],
            self.stride,
            self.padding,
            self.dilation,
            self.groups,
        )


class ConvTranspose2d(OrderedModule):
    """2-D transposed convolution (torch nn.ConvTranspose2d parity).

    Kernel shape (kh, kw, in_channels, out_channels // groups).
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: IntPair,
        stride: IntPair = 1,
        padding: IntPair = 0,
        output_padding: IntPair = 0,
        groups: int = 1,
        bias: bool = True,
        dilation: IntPair = 1,
        *,
        rngs: nnx.Rngs,
    ):
        kh, kw = _pair(kernel_size)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kh, kw)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.output_padding = _pair(output_padding)
        self.dilation = _pair(dilation)
        self.groups = groups
        fan_in = (out_channels // groups) * kh * kw  # torch uses weight dim-1 fan
        bound = 1.0 / math.sqrt(fan_in)
        self.weight = nnx.Param(
            _uniform(
                rngs.params(), (kh, kw, in_channels, out_channels // groups), bound
            )
        )
        self.bias = (
            nnx.Param(_uniform(rngs.params(), (out_channels,), bound)) if bias else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.conv_transpose2d(
            x,
            self.weight[...],
            None if self.bias is None else self.bias[...],
            self.stride,
            self.padding,
            self.output_padding,
            self.dilation,
            self.groups,
        )


class Linear(OrderedModule):
    """Dense layer with kernel (in, out) (torch nn.Linear parity)."""

    def __init__(
        self, in_features: int, out_features: int, bias: bool = True, *, rngs: nnx.Rngs
    ):
        self.in_features = in_features
        self.out_features = out_features
        bound = 1.0 / math.sqrt(in_features)
        self.weight = nnx.Param(
            _uniform(rngs.params(), (in_features, out_features), bound)
        )
        self.bias = (
            nnx.Param(_uniform(rngs.params(), (out_features,), bound)) if bias else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.linear(
            x, self.weight[...], None if self.bias is None else self.bias[...]
        )


class BatchNorm2d(OrderedModule):
    """Batch normalization over NHWC with torch semantics.

    Normalizes with the *biased* batch variance; updates running_var with the
    *unbiased* one; ``running = (1 - momentum) * running + momentum * batch``
    — exactly torch's rule so BN-fusion arithmetic carries over. Running
    stats live in ``nnx.BatchStat`` so they ride checkpoints but not the
    optimizer.
    """

    def __init__(
        self,
        num_features: int,
        eps: float = 1e-5,
        momentum: float = 0.1,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.training = True
        self.weight = nnx.Param(jnp.ones((num_features,), jnp.float32))  # gamma
        self.bias = nnx.Param(jnp.zeros((num_features,), jnp.float32))  # beta
        self.running_mean = nnx.BatchStat(jnp.zeros((num_features,), jnp.float32))
        self.running_var = nnx.BatchStat(jnp.ones((num_features,), jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.training:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(0, 1, 2))
            var = jnp.var(x32, axis=(0, 1, 2))  # biased, used to normalize
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            self.running_mean[...] = (
                (1 - m) * self.running_mean[...] + m * jax.lax.stop_gradient(mean)
            )
            self.running_var[...] = (
                (1 - m) * self.running_var[...] + m * jax.lax.stop_gradient(unbiased)
            )
        else:
            mean = self.running_mean[...]
            var = self.running_var[...]
        inv = jax.lax.rsqrt(var + self.eps) * self.weight[...]
        return ((x - mean) * inv + self.bias[...]).astype(x.dtype)


class ReLU(OrderedModule):
    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.relu(x)


class LeakyReLU(OrderedModule):
    def __init__(self, negative_slope: float = 0.01):
        self.negative_slope = negative_slope

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.leaky_relu(x, self.negative_slope)


class Sigmoid(OrderedModule):
    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.sigmoid(x)


class MaxPool2d(OrderedModule):
    def __init__(
        self,
        kernel_size: IntPair,
        stride: Optional[IntPair] = None,
        padding: IntPair = 0,
    ):
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride) if stride is not None else self.kernel_size
        self.padding = _pair(padding)

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.max_pool2d(x, self.kernel_size, self.stride, self.padding)


class AvgPool2d(OrderedModule):
    def __init__(
        self,
        kernel_size: IntPair,
        stride: Optional[IntPair] = None,
        padding: IntPair = 0,
    ):
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride) if stride is not None else self.kernel_size
        self.padding = _pair(padding)

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.avg_pool2d(x, self.kernel_size, self.stride, self.padding)


class AdaptiveAvgPool2d(OrderedModule):
    def __init__(self, output_size: IntPair):
        self.output_size = _pair(output_size)

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.adaptive_avg_pool2d(x, self.output_size)


class Add(OrderedModule):
    """Residual add; exists as a rewrite anchor for QuantAdd
    (base_module/op.py:5-11, resnet.py:57-65)."""

    def __call__(self, res: jax.Array, shortcut: jax.Array) -> jax.Array:
        return res + shortcut


class Concat(OrderedModule):
    """Channel concat rewrite anchor. The reference stubs this out
    (base_module/op.py:14-24 and the QuantConcat branch are commented,
    iao/quantize.py:1765-1772); here it is implemented and quantizable."""

    def __init__(self, axis: int = -1):
        self.axis = axis  # NHWC: channels last

    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        return jnp.concatenate([a, b], axis=self.axis)


class Identity(OrderedModule):
    def __call__(self, x: jax.Array) -> jax.Array:
        return x


class Flatten(OrderedModule):
    def __call__(self, x: jax.Array) -> jax.Array:
        return x.reshape(x.shape[0], -1)


class Sequential(OrderedModule):
    """Ordered container; children are named ``layers[i]`` and iterated in
    insertion order, which is what Conv->BN adjacency detection relies on."""

    def __init__(self, *layers: nnx.Module):
        self.layers = nnx.List(layers)

    def __call__(self, x: jax.Array) -> jax.Array:
        for layer in self.layers:
            x = layer(x)
        return x

    def __iter__(self):
        return iter(self.layers)

    def __len__(self):
        return len(self.layers)

    def __getitem__(self, i):
        return self.layers[i]
