"""Network-in-Network for CIFAR-10 (reference models/nin.py:4-65), NHWC.

9x ConvBNReLU (cfg-driven widths, default [192,160,96,192,192,192,192,192]),
two MaxPool(3, s2, p1), a 10-way 1x1 conv classifier, AvgPool(8) and
flatten. ``cfg`` drives channel widths so pruned checkpoints
({cfg, params}) rebuild the smaller net (normal_regular_prune.py:182-241).
"""

from __future__ import annotations

from typing import Optional, Sequence

from flax import nnx

from ..nn import modules as M

DEFAULT_CFG = [192, 160, 96, 192, 192, 192, 192, 192]


class ConvBNReLU(M.OrderedModule):
    """conv + BN + ReLU triple (nin.py:4-39) — the BN-fuse rewrite pairs
    the conv with the following BN by adjacency."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        groups: int = 1,
        bias: bool = True,
        eps: float = 1e-5,
        momentum: float = 0.1,
        *,
        rngs: nnx.Rngs,
    ):
        self.conv = M.Conv2d(
            in_channels,
            out_channels,
            kernel_size,
            stride=stride,
            padding=padding,
            dilation=dilation,
            groups=groups,
            bias=bias,
            rngs=rngs,
        )
        self.bn = M.BatchNorm2d(out_channels, eps=eps, momentum=momentum)
        self.relu = M.ReLU()

    def __call__(self, x):
        return self.relu(self.bn(self.conv(x)))


class Net(M.OrderedModule):
    def __init__(self, cfg: Optional[Sequence[int]] = None, num_classes: int = 10, *, rngs: nnx.Rngs):
        if cfg is None:
            cfg = DEFAULT_CFG
        self.cfg = list(cfg)
        self.model = M.Sequential(
            ConvBNReLU(3, cfg[0], kernel_size=5, stride=1, padding=2, rngs=rngs),
            ConvBNReLU(cfg[0], cfg[1], kernel_size=1, rngs=rngs),
            ConvBNReLU(cfg[1], cfg[2], kernel_size=1, rngs=rngs),
            M.MaxPool2d(kernel_size=3, stride=2, padding=1),
            ConvBNReLU(cfg[2], cfg[3], kernel_size=5, stride=1, padding=2, rngs=rngs),
            ConvBNReLU(cfg[3], cfg[4], kernel_size=1, rngs=rngs),
            ConvBNReLU(cfg[4], cfg[5], kernel_size=1, rngs=rngs),
            M.MaxPool2d(kernel_size=3, stride=2, padding=1),
            ConvBNReLU(cfg[5], cfg[6], kernel_size=3, stride=1, padding=1, rngs=rngs),
            ConvBNReLU(cfg[6], cfg[7], kernel_size=1, rngs=rngs),
            ConvBNReLU(cfg[7], num_classes, kernel_size=1, rngs=rngs),
            M.AvgPool2d(kernel_size=8, stride=1, padding=0),
        )

    def __call__(self, x):
        x = self.model(x)
        return x.reshape(x.shape[0], -1)
