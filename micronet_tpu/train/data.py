"""CIFAR-10 input pipeline, TPU-first.

The reference uses torchvision CIFAR-10 with RandomCrop(32, padding=4) +
RandomHorizontalFlip + per-channel normalize (e.g. iao/main.py:300-331).
Here the dataset is loaded once into host RAM as uint8, and augmentation +
normalization run **on device, inside jit, for the whole batch at once**
(vectorized pad/dynamic-slice/flip) — no Python-worker dataloader, no
per-sample host loop; the batch pipeline fuses into the train step.

Dataset discovery: the standard "cifar-10-batches-py" pickle batches are
searched in ``CIFAR10_DIR``, ``./data``, ``~/data``. With no dataset on
disk (this build environment has no network egress), a deterministic
synthetic stand-in with the same shapes/cardinality keeps every pipeline
runnable end-to-end; ``source`` in the returned dataset says which you got.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Cifar10", "load_cifar10", "augment_batch", "normalize_batch"]

# torchvision-style normalization used across the reference drivers
# (iao/main.py:307-309): mean/std 0.5 per channel.
MEAN = np.array([0.5, 0.5, 0.5], np.float32)
STD = np.array([0.5, 0.5, 0.5], np.float32)

_SEARCH = (
    os.environ.get("CIFAR10_DIR", ""),
    "data/cifar-10-batches-py",
    os.path.expanduser("~/data/cifar-10-batches-py"),
    "/root/data/cifar-10-batches-py",
)


@dataclass
class Cifar10:
    train_images: np.ndarray  # (50000, 32, 32, 3) uint8
    train_labels: np.ndarray  # (50000,) int32
    test_images: np.ndarray  # (10000, 32, 32, 3) uint8
    test_labels: np.ndarray  # (10000,) int32
    source: str  # "disk" | "synthetic"


def _load_pickle_batches(root: str) -> Optional[Tuple[np.ndarray, ...]]:
    try:
        xs, ys = [], []
        for i in range(1, 6):
            with open(os.path.join(root, f"data_batch_{i}"), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            xs.append(d[b"data"])
            ys.append(d[b"labels"])
        with open(os.path.join(root, "test_batch"), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        tx, ty = d[b"data"], d[b"labels"]
    except (OSError, KeyError, pickle.UnpicklingError):
        return None
    tr_x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    te_x = np.asarray(tx).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return (
        tr_x.astype(np.uint8),
        np.concatenate([np.asarray(y) for y in ys]).astype(np.int32),
        te_x.astype(np.uint8),
        np.asarray(ty).astype(np.int32),
    )


def _synthetic(n_train: int, n_test: int) -> Tuple[np.ndarray, ...]:
    """Deterministic class-conditional images: each class has a distinct
    spatial-frequency pattern + noise, so models can actually fit it and
    accuracy numbers are meaningful smoke signals (not CIFAR results).

    ``MICRONET_SYNTHETIC_NOISE`` (default 0.6) scales the per-pixel noise:
    at 0.6 every flavor reaches ~100% (smoke-test regime); the acc-delta
    table (benchmarks/acc_table.py) raises it so fp32 lands near CIFAR-10
    levels and bit-width deltas become visible."""
    rng = np.random.RandomState(0)
    noise = float(os.environ.get("MICRONET_SYNTHETIC_NOISE", 0.6))

    def make(n):
        y = rng.randint(0, 10, size=n).astype(np.int32)
        yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        base = np.stack(
            [
                np.sin(xx * (0.2 + 0.13 * k) + yy * (0.1 * k))
                + np.cos(yy * (0.15 + 0.11 * k))
                for k in range(10)
            ]
        )  # (10, 32, 32)
        img = base[y][..., None].repeat(3, axis=-1)
        img = img + noise * rng.randn(n, 32, 32, 3)
        img = (img - img.min()) / (img.max() - img.min())
        return (img * 255).astype(np.uint8), y

    tr_x, tr_y = make(n_train)
    te_x, te_y = make(n_test)
    return tr_x, tr_y, te_x, te_y


def load_cifar10(
    synthetic_ok: bool = True, synthetic_size: Optional[int] = None
) -> Cifar10:
    if synthetic_size is None:
        # one knob so separate processes (CLI stages, acc-table flavors)
        # train on the SAME deterministic stand-in set
        synthetic_size = int(os.environ.get("MICRONET_SYNTHETIC_SIZE", 2048))
    # native C++ parser for the binary distribution first (fastest), then
    # the python-pickle batches
    from . import native_loader

    for root in _SEARCH:
        if not root:
            continue
        bin_root = root.replace("cifar-10-batches-py", "cifar-10-batches-bin")
        got = native_loader.load_cifar_bin(bin_root)
        if got is not None:
            return Cifar10(*got, source="disk")
        if os.path.isdir(root):
            got = _load_pickle_batches(root)
            if got is not None:
                return Cifar10(*got, source="disk")
    if not synthetic_ok:
        raise FileNotFoundError(
            "cifar-10-batches-py not found in CIFAR10_DIR/./data/~/data"
        )
    tr_x, tr_y, te_x, te_y = _synthetic(synthetic_size, max(synthetic_size // 5, 256))
    return Cifar10(tr_x, tr_y, te_x, te_y, source="synthetic")


# --------------------------------------------------------------------------
# device-side augmentation (runs under jit, whole batch at once)
# --------------------------------------------------------------------------


def normalize_batch(images_u8: jax.Array) -> jax.Array:
    """uint8 NHWC -> normalized float32 (ToTensor + Normalize(0.5, 0.5))."""
    x = images_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(MEAN)) / jnp.asarray(STD)


def augment_batch(key: jax.Array, images_u8: jax.Array) -> jax.Array:
    """RandomCrop(32, pad=4) + RandomHorizontalFlip + normalize, vectorized.

    Equivalent in distribution to the reference's torchvision transforms
    (iao/main.py:303-312), but executed on device for the whole batch: one
    pad, a vmapped dynamic_slice with per-sample offsets, a flip mask.
    """
    n = images_u8.shape[0]
    k1, k2 = jax.random.split(key)
    # pad the RAW uint8 image with 0 (black) BEFORE normalizing, like
    # torchvision RandomCrop(32, 4): padding pixels normalize to -1, not
    # to the mid-gray that padding in normalized space would produce
    x = jnp.pad(images_u8, ((0, 0), (4, 4), (4, 4), (0, 0)))
    x = normalize_batch(x)
    offs = jax.random.randint(k1, (n, 2), 0, 9)  # 0..8 inclusive

    def crop(img, off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (32, 32, 3))

    x = jax.vmap(crop)(x, offs)
    flip = jax.random.bernoulli(k2, 0.5, (n, 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


def epoch_batches(
    key: jax.Array,
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool = True,
    drop_remainder: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Host-side batch iterator (shuffling only; math stays on device)."""
    n = images.shape[0]
    idx = np.arange(n)
    if shuffle:
        perm_seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        np.random.RandomState(perm_seed).shuffle(idx)
    from . import native_loader

    end = (n // batch_size) * batch_size if drop_remainder else n
    for i in range(0, end, batch_size):
        j = idx[i : i + batch_size]
        if shuffle and native_loader.available() and images.dtype == np.uint8:
            yield native_loader.gather_u8(images, j), labels[j]
        else:
            yield images[j], labels[j]
