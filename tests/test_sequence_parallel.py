"""Ring attention (parallel/sequence.py) — sequence parallelism over an
8-device CPU mesh, checked against the dense attention oracle: values
and gradients, causal and full."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from micronet_tpu.parallel.sequence import attention_reference, ring_attention

T, H, D, S = 32, 2, 8, 8


def _mesh(s=S):
    return Mesh(np.array(jax.devices()[:s]), ("seq",))


def _qkv(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (T, H, D), jnp.float32) for k in ks)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.slow
def test_ring_matches_dense(causal):
    q, k, v = _qkv(0)
    y_ring = ring_attention(q, k, v, _mesh(), causal=causal)
    y_ref = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_ref), atol=1e-5)


@pytest.mark.slow
def test_ring_matches_dense_fewer_devices():
    q, k, v = _qkv(1)
    y_ring = ring_attention(q, k, v, _mesh(4), causal=True)
    y_ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_ref), atol=1e-5)


@pytest.mark.slow
def test_ring_gradients_match_dense():
    q, k, v = _qkv(2)
    mesh = _mesh()
    tgt = jax.random.normal(jax.random.PRNGKey(9), (T, H, D))

    def loss_ring(q, k, v):
        return jnp.mean((ring_attention(q, k, v, mesh, causal=True) - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.mean((attention_reference(q, k, v, causal=True) - tgt) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ring_jits_as_one_program():
    q, k, v = _qkv(3)
    mesh = _mesh()
    f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh, causal=True))
    y = f(q, k, v)
    np.testing.assert_allclose(
        np.asarray(y),
        np.asarray(attention_reference(q, k, v, causal=True)),
        atol=1e-5,
    )


@pytest.mark.slow
def test_zigzag_matches_contiguous_and_dense():
    """The balanced (zigzag) causal schedule == the contiguous schedule ==
    the dense oracle, values and gradients, including odd device counts
    where the stripe permutations are least trivial."""
    for s in (2, 4, 8):
        mesh = _mesh(s)
        ks = jax.random.split(jax.random.PRNGKey(s), 3)
        q, k, v = (jax.random.normal(kk, (4 * s, 2, 8), jnp.float32) for kk in ks)

        def loss_zz(q):
            return jnp.mean(ring_attention(q, k, v, mesh, causal=True) ** 2)

        def loss_ct(q):
            return jnp.mean(
                ring_attention(q, k, v, mesh, causal=True, balanced=False) ** 2
            )

        vz, gz = jax.value_and_grad(loss_zz)(q)
        vc, gc = jax.value_and_grad(loss_ct)(q)
        np.testing.assert_allclose(float(vz), float(vc), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gz), np.asarray(gc), atol=1e-5)
        y = ring_attention(q, k, v, mesh, causal=True)
        np.testing.assert_allclose(
            np.asarray(y),
            np.asarray(attention_reference(q, k, v, causal=True)),
            atol=1e-5,
        )


def test_zigzag_odd_local_falls_back():
    """Odd per-device length can't split into stripes — the contiguous
    schedule serves it, still matching the oracle."""
    mesh = _mesh(4)
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q, k, v = (jax.random.normal(kk, (12, 2, 8), jnp.float32) for kk in ks)  # t_loc=3, odd
    y = ring_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(
        np.asarray(y),
        np.asarray(attention_reference(q, k, v, causal=True)),
        atol=1e-5,
    )
