"""Small LeNet-style net used by the package smoke tests
(reference micronet/__init__.py:6-123 builds LeNet variants through every
quant flavor as its ship-with-the-package self-test)."""

from __future__ import annotations

from flax import nnx

from ..nn import modules as M


class LeNet(M.OrderedModule):
    """conv-BN-ReLU x2 (+pool) then FC head; 32x32x3 input, NHWC."""

    def __init__(self, num_classes: int = 10, *, rngs: nnx.Rngs):
        self.features = M.Sequential(
            M.Conv2d(3, 6, 5, rngs=rngs),
            M.BatchNorm2d(6),
            M.ReLU(),
            M.MaxPool2d(2, 2),
            M.Conv2d(6, 16, 5, rngs=rngs),
            M.BatchNorm2d(16),
            M.ReLU(),
            M.MaxPool2d(2, 2),
        )
        self.flatten = M.Flatten()
        self.classifier = M.Sequential(
            M.Linear(16 * 5 * 5, 120, rngs=rngs),
            M.ReLU(),
            M.Linear(120, 84, rngs=rngs),
            M.ReLU(),
            M.Linear(84, num_classes, rngs=rngs),
        )

    def __call__(self, x):
        x = self.features(x)
        x = self.flatten(x)
        return self.classifier(x)
