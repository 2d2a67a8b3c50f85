"""Observer state-evolution tests (reference iao/quantize.py:15-139)."""

import jax.numpy as jnp
import numpy as np
import pytest

from micronet_tpu.quant.observers import (
    ema_minmax_update,
    histogram_update,
    init_histogram_state,
    init_minmax_state,
    minmax_update,
    percentile_absmax,
)


def test_minmax_first_batch_overwrites():
    s = init_minmax_state((1,))
    s = minmax_update(s, jnp.array([1.0, 2.0, 3.0]))
    # zeros init must NOT leak in: min is 1.0, not 0.0
    assert float(s.min_val[0]) == 1.0
    assert float(s.max_val[0]) == 3.0
    assert bool(s.initialized)


def test_minmax_cumulative():
    s = init_minmax_state((1,))
    s = minmax_update(s, jnp.array([1.0, 3.0]))
    s = minmax_update(s, jnp.array([2.0, 2.5]))  # inside current range: no change
    assert float(s.min_val[0]) == 1.0 and float(s.max_val[0]) == 3.0
    s = minmax_update(s, jnp.array([-5.0, 10.0]))
    assert float(s.min_val[0]) == -5.0 and float(s.max_val[0]) == 10.0


def test_minmax_per_channel_hwio():
    # HWIO kernel (2,2,3,4): per-out-channel stats, shape (1,1,1,4)
    rng = np.random.RandomState(0)
    w = rng.randn(2, 2, 3, 4).astype(np.float32)
    s = init_minmax_state((1, 1, 1, 4))
    s = minmax_update(s, jnp.asarray(w), axes=(0, 1, 2))
    np.testing.assert_allclose(
        np.asarray(s.min_val)[0, 0, 0], w.reshape(-1, 4).min(0), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s.max_val)[0, 0, 0], w.reshape(-1, 4).max(0), rtol=1e-6
    )


def test_ema_minmax_momentum():
    s = init_minmax_state((1,))
    s = ema_minmax_update(s, jnp.array([0.0, 10.0]), momentum=0.1)
    assert float(s.max_val[0]) == 10.0  # first batch overwrites
    s = ema_minmax_update(s, jnp.array([0.0, 20.0]), momentum=0.1)
    np.testing.assert_allclose(float(s.max_val[0]), 0.9 * 10.0 + 0.1 * 20.0)
    np.testing.assert_allclose(float(s.min_val[0]), 0.0)


def test_percentile_absmax_matches_kthvalue():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = rng.randn(10000).astype(np.float32)
    for pct in (0.5, 0.9999, 0.999999):
        ours = float(percentile_absmax(jnp.asarray(x), pct))
        k = int(pct * x.size)
        k = max(min(k, x.size), 1)
        ref = float(torch.kthvalue(torch.tensor(np.abs(x)), k)[0])
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_histogram_observer_ema_and_min_stays_zero():
    s = init_histogram_state((1,))
    x1 = jnp.linspace(-1.0, 1.0, 1000)
    s = histogram_update(s, x1, percentile=1.0, momentum=0.1)
    np.testing.assert_allclose(float(s.max_val[0]), 1.0, rtol=1e-6)
    s = histogram_update(s, 2.0 * x1, percentile=1.0, momentum=0.1)
    np.testing.assert_allclose(float(s.max_val[0]), 0.9 * 1.0 + 0.1 * 2.0, rtol=1e-6)
    assert float(s.min_val[0]) == 0.0
