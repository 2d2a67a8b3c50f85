"""CIFAR ResNet-18/34/50/101/152 (reference models/resnet.py), NHWC.

Residual adds are routed through :class:`micronet_tpu.nn.modules.Add` so the
quant transform can swap in QuantAdd with a union (shared) scale
(resnet.py:57-65, 111-119). The post-add ReLU is a bare function (the
reference constructs ``nn.ReLU`` inline in forward, so it is never a child
module and never rewritten — we match by calling ``jax.nn.relu`` directly).
"""

from __future__ import annotations

import jax
from flax import nnx

from ..nn import modules as M


class BasicBlock(M.OrderedModule):
    expansion = 1

    def __init__(self, in_channels: int, out_channels: int, stride: int = 1, *, rngs: nnx.Rngs):
        self.residual_function = M.Sequential(
            M.Conv2d(in_channels, out_channels, 3, stride=stride, padding=1, bias=False, rngs=rngs),
            M.BatchNorm2d(out_channels),
            M.ReLU(),
            M.Conv2d(out_channels, out_channels * BasicBlock.expansion, 3, padding=1, bias=False, rngs=rngs),
            M.BatchNorm2d(out_channels * BasicBlock.expansion),
        )
        if stride != 1 or in_channels != BasicBlock.expansion * out_channels:
            self.shortcut = M.Sequential(
                M.Conv2d(in_channels, out_channels * BasicBlock.expansion, 1, stride=stride, bias=False, rngs=rngs),
                M.BatchNorm2d(out_channels * BasicBlock.expansion),
            )
        else:
            self.shortcut = M.Sequential()
        self.add = M.Add()

    def __call__(self, x):
        return jax.nn.relu(self.add(self.residual_function(x), self.shortcut(x)))


class BottleNeck(M.OrderedModule):
    expansion = 4

    def __init__(self, in_channels: int, out_channels: int, stride: int = 1, *, rngs: nnx.Rngs):
        self.residual_function = M.Sequential(
            M.Conv2d(in_channels, out_channels, 1, bias=False, rngs=rngs),
            M.BatchNorm2d(out_channels),
            M.ReLU(),
            M.Conv2d(out_channels, out_channels, 3, stride=stride, padding=1, bias=False, rngs=rngs),
            M.BatchNorm2d(out_channels),
            M.ReLU(),
            M.Conv2d(out_channels, out_channels * BottleNeck.expansion, 1, bias=False, rngs=rngs),
            M.BatchNorm2d(out_channels * BottleNeck.expansion),
        )
        if stride != 1 or in_channels != out_channels * BottleNeck.expansion:
            self.shortcut = M.Sequential(
                M.Conv2d(in_channels, out_channels * BottleNeck.expansion, 1, stride=stride, bias=False, rngs=rngs),
                M.BatchNorm2d(out_channels * BottleNeck.expansion),
            )
        else:
            self.shortcut = M.Sequential()
        self.add = M.Add()

    def __call__(self, x):
        return jax.nn.relu(self.add(self.residual_function(x), self.shortcut(x)))


class ResNet(M.OrderedModule):
    def __init__(self, block, num_block, num_classes: int = 10, *, rngs: nnx.Rngs):
        self.in_channels = 64
        self.conv1 = M.Sequential(
            M.Conv2d(3, 64, 3, padding=1, bias=False, rngs=rngs),
            M.BatchNorm2d(64),
            M.ReLU(),
        )
        self.conv2_x = self._make_layer(block, 64, num_block[0], 1, rngs)
        self.conv3_x = self._make_layer(block, 128, num_block[1], 2, rngs)
        self.conv4_x = self._make_layer(block, 256, num_block[2], 2, rngs)
        self.conv5_x = self._make_layer(block, 512, num_block[3], 2, rngs)
        self.avg_pool = M.AdaptiveAvgPool2d((1, 1))
        self.fc = M.Linear(512 * block.expansion, num_classes, rngs=rngs)

    def _make_layer(self, block, out_channels, num_blocks, stride, rngs):
        strides = [stride] + [1] * (num_blocks - 1)
        layers = []
        for s in strides:
            layers.append(block(self.in_channels, out_channels, s, rngs=rngs))
            self.in_channels = out_channels * block.expansion
        return M.Sequential(*layers)

    def __call__(self, x):
        out = self.conv1(x)
        out = self.conv2_x(out)
        out = self.conv3_x(out)
        out = self.conv4_x(out)
        out = self.conv5_x(out)
        out = self.avg_pool(out)
        out = out.reshape(out.shape[0], -1)
        return self.fc(out)


def resnet18(*, rngs: nnx.Rngs, num_classes: int = 10):
    return ResNet(BasicBlock, [2, 2, 2, 2], num_classes, rngs=rngs)


def resnet34(*, rngs: nnx.Rngs, num_classes: int = 10):
    return ResNet(BasicBlock, [3, 4, 6, 3], num_classes, rngs=rngs)


def resnet50(*, rngs: nnx.Rngs, num_classes: int = 10):
    return ResNet(BottleNeck, [3, 4, 6, 3], num_classes, rngs=rngs)


def resnet101(*, rngs: nnx.Rngs, num_classes: int = 10):
    return ResNet(BottleNeck, [3, 4, 23, 3], num_classes, rngs=rngs)


def resnet152(*, rngs: nnx.Rngs, num_classes: int = 10):
    return ResNet(BottleNeck, [3, 8, 36, 3], num_classes, rngs=rngs)
