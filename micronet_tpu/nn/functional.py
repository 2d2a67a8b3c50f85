"""Functional NN ops in TPU-native layouts (NHWC activations, HWIO kernels).

These replace the reference's torch.nn.functional surface (F.conv2d,
F.conv_transpose2d, F.linear, F.max_pool2d, F.avg_pool2d,
F.adaptive_avg_pool2d — used throughout iao/quantize.py:492-507, 626-635,
1156, 1332-1438) with `jax.lax` primitives that XLA tiles directly onto the
MXU. All padding/semantics match torch's (symmetric integer padding,
count_include_pad=True average pooling) so checkpoint-level parity holds.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "linear",
    "max_pool2d",
    "avg_pool2d",
    "adaptive_avg_pool2d",
    "channel_shuffle",
]

IntPair = Union[int, Tuple[int, int], Sequence[int]]

# NHWC activations, HWIO kernels, NHWC outputs.
_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def _pair(v: IntPair) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntPair = 1,
    padding: IntPair = 0,
    dilation: IntPair = 1,
    groups: int = 1,
    preferred_element_type=jnp.float32,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC (torch F.conv2d semantics).

    ``kernel`` has shape (kh, kw, in_channels // groups, out_channels).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=_CONV_DIMS,
        feature_group_count=groups,
        preferred_element_type=preferred_element_type,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def conv_transpose2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntPair = 1,
    padding: IntPair = 0,
    output_padding: IntPair = 0,
    dilation: IntPair = 1,
    groups: int = 1,
    preferred_element_type=jnp.float32,
) -> jax.Array:
    """2-D transposed convolution (torch F.conv_transpose2d semantics).

    ``preferred_element_type=jnp.int32`` runs an integer transpose conv
    (int8 inputs, int32 accumulation) and returns the raw accumulator
    (no cast back to the input dtype) — the int engine's path.

    ``kernel`` has shape (kh, kw, in_channels, out_channels // groups) —
    the HWIO analogue of torch's (in, out // groups, kh, kw). Implemented as
    the gradient convolution: input dilation by ``stride``, spatially
    flipped kernel with in/out swapped, and edge padding
    ``dilation * (k - 1) - padding`` (+ output_padding on the high side).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    dh, dw = _pair(dilation)
    kh, kw = kernel.shape[0], kernel.shape[1]
    in_channels = kernel.shape[2]

    pad = (
        (dh * (kh - 1) - ph, dh * (kh - 1) - ph + oph),
        (dw * (kw - 1) - pw, dw * (kw - 1) - pw + opw),
    )

    def one_group(xg, kg):
        # kg: (kh, kw, in_g, out_g) — already I=in/O=out for the gradient
        # conv; only the spatial flip is needed.
        kflip = jnp.flip(kg, axis=(0, 1))
        return jax.lax.conv_general_dilated(
            xg,
            kflip,
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=(sh, sw),
            rhs_dilation=(dh, dw),
            dimension_numbers=_CONV_DIMS,
            preferred_element_type=preferred_element_type,
        )

    if groups == 1:
        y = one_group(x, kernel)
    else:
        in_g = in_channels // groups
        ys = [
            one_group(
                x[..., g * in_g : (g + 1) * in_g],
                kernel[:, :, g * in_g : (g + 1) * in_g, :],
            )
            for g in range(groups)
        ]
        y = jnp.concatenate(ys, axis=-1)
    int_path = preferred_element_type is not None and jnp.issubdtype(
        preferred_element_type, jnp.integer
    )
    if bias is not None:
        if int_path:
            # a float bias would silently truncate into the int32
            # accumulator; the engine applies bias in the f32 epilogue
            raise ValueError("bias is not supported on the integer path")
        y = y + bias.astype(y.dtype)
    if int_path:
        return y  # raw int32 accumulator for the int engine
    return y.astype(x.dtype)


def linear(
    x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """Dense layer: ``x @ kernel (+ bias)`` with kernel (in, out)."""
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def max_pool2d(
    x: jax.Array,
    kernel_size: IntPair,
    stride: Optional[IntPair] = None,
    padding: IntPair = 0,
) -> jax.Array:
    """Max pooling, NHWC (torch F.max_pool2d; padding fills with -inf)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    ph, pw = _pair(padding)
    init = (
        -jnp.inf
        if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
    )
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def avg_pool2d(
    x: jax.Array,
    kernel_size: IntPair,
    stride: Optional[IntPair] = None,
    padding: IntPair = 0,
    count_include_pad: bool = True,
) -> jax.Array:
    """Average pooling, NHWC (torch F.avg_pool2d default semantics:
    count_include_pad=True divides by the full window size everywhere)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    ph, pw = _pair(padding)
    c = x.shape[-1]
    # Implemented as a depthwise conv with a constant mean kernel rather
    # than lax.reduce_window(add): the window-sum primitive fails JAX
    # linearization under jit-of-grad ("Linearization failed to produce
    # known values for all output primals"), while conv differentiates
    # everywhere and maps onto the same hardware loops.
    x32 = x.astype(jnp.float32)
    kernel = jnp.ones((kh, kw, 1, c), jnp.float32)
    summed = jax.lax.conv_general_dilated(
        x32,
        kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    if count_include_pad or (ph == 0 and pw == 0):
        return (summed / (kh * kw)).astype(x.dtype)
    ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
    counts = jax.lax.conv_general_dilated(
        ones,
        jnp.ones((kh, kw, 1, 1), jnp.float32),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=1,
        precision=jax.lax.Precision.HIGHEST,
    )
    return (summed / counts).astype(x.dtype)


def adaptive_avg_pool2d(x: jax.Array, output_size: IntPair) -> jax.Array:
    """Adaptive average pooling to a target (H, W), NHWC.

    Matches torch semantics: bin i spans [floor(i*In/Out), ceil((i+1)*In/Out)).
    The common divisible case lowers to a plain strided average pool (MXU/VPU
    friendly); the general case falls back to per-bin means (static shapes,
    unrolled at trace time).
    """
    oh, ow = _pair(output_size)
    h, w = x.shape[1], x.shape[2]
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if h % oh == 0 and w % ow == 0:
        return avg_pool2d(x, (h // oh, w // ow), stride=(h // oh, w // ow))
    rows = [
        (int(np.floor(i * h / oh)), int(np.ceil((i + 1) * h / oh))) for i in range(oh)
    ]
    cols = [
        (int(np.floor(j * w / ow)), int(np.ceil((j + 1) * w / ow))) for j in range(ow)
    ]
    out_rows = []
    for r0, r1 in rows:
        out_cols = [
            jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2), keepdims=True)
            for c0, c1 in cols
        ]
        out_rows.append(jnp.concatenate(out_cols, axis=2))
    return jnp.concatenate(out_rows, axis=1)


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """Channel shuffle for grouped convolutions (nin_gc.py:4-15), NHWC.

    Implemented as a STATIC last-axis permutation gather rather than the
    reshape/swapaxes/reshape composition: the 5-D transposed
    intermediate ``(..., c/g, g)`` can get materialized with an (8,128)
    tile on a minor-most axis of size ``g`` — measured 64x layout
    padding (a 256 MB buffer became 16 GB and OOM'd the PTQ program).
    A 1-D channel gather is layout-neutral and XLA folds it into the
    surrounding convs the same way.
    """
    b, h, w, c = x.shape
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    # perm[j] = source channel of output j: output flattens (c/g, g), so
    # j = k * g + r  <-  channel r * (c/g) + k of the input
    perm = np.arange(c).reshape(groups, c // groups).T.reshape(-1)
    return jnp.take(x, jnp.asarray(perm), axis=3)
