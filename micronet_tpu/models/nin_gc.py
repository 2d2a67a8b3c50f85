"""NIN with grouped convolutions + channel shuffle (reference
models/nin_gc.py), NHWC. Default cfg [256,256,256,512,512,512,1024,1024];
group counts 2/2/16/4/4/32/8 and per-layer shuffle flags match the
reference wiring (nin_gc.py:62-147)."""

from __future__ import annotations

from typing import Optional, Sequence

from flax import nnx

from ..nn import functional as F
from ..nn import modules as M

DEFAULT_CFG = [256, 256, 256, 512, 512, 512, 1024, 1024]


class ConvBNReLU(M.OrderedModule):
    """conv+BN+ReLU with optional pre-conv channel shuffle
    (nin_gc.py:18-61)."""

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
        channel_shuffle: int = 0,
        shuffle_groups: int = 1,
        *,
        rngs: nnx.Rngs,
    ):
        self.channel_shuffle_flag = channel_shuffle
        self.shuffle_groups = shuffle_groups
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
        if self.channel_shuffle_flag:
            x = F.channel_shuffle(x, self.shuffle_groups)
        return self.relu(self.bn(self.conv(x)))


class Net(M.OrderedModule):
    def __init__(self, cfg: Optional[Sequence[int]] = None, num_classes: int = 10, *, rngs: nnx.Rngs):
        if cfg is None:
            cfg = DEFAULT_CFG
        self.cfg = list(cfg)
        self.model = M.Sequential(
            ConvBNReLU(3, cfg[0], kernel_size=5, stride=1, padding=2, rngs=rngs),
            ConvBNReLU(cfg[0], cfg[1], kernel_size=1, groups=2, channel_shuffle=0, rngs=rngs),
            ConvBNReLU(cfg[1], cfg[2], kernel_size=1, groups=2, channel_shuffle=1, shuffle_groups=2, rngs=rngs),
            M.MaxPool2d(kernel_size=2, stride=2, padding=0),
            ConvBNReLU(cfg[2], cfg[3], kernel_size=3, stride=1, padding=1, groups=16, channel_shuffle=1, shuffle_groups=2, rngs=rngs),
            ConvBNReLU(cfg[3], cfg[4], kernel_size=1, groups=4, channel_shuffle=1, shuffle_groups=16, rngs=rngs),
            ConvBNReLU(cfg[4], cfg[5], kernel_size=1, groups=4, channel_shuffle=1, shuffle_groups=4, rngs=rngs),
            M.MaxPool2d(kernel_size=2, stride=2, padding=0),
            ConvBNReLU(cfg[5], cfg[6], kernel_size=3, stride=1, padding=1, groups=32, channel_shuffle=1, shuffle_groups=4, rngs=rngs),
            ConvBNReLU(cfg[6], cfg[7], kernel_size=1, groups=8, channel_shuffle=1, shuffle_groups=32, rngs=rngs),
            ConvBNReLU(cfg[7], num_classes, kernel_size=1, rngs=rngs),
            M.AvgPool2d(kernel_size=8, stride=1, padding=0),
        )

    def __call__(self, x):
        x = self.model(x)
        return x.reshape(x.shape[0], -1)
