import numpy as np
import jax.numpy as jnp

from pysdr_tpu.ops import scanops


def serial_linrec(a, b, y_prev):
    y = np.empty_like(b)
    prev = y_prev
    for i in range(len(b)):
        prev = a[i] * prev + b[i]
        y[i] = prev
    return y


def test_linrec_matches_serial(rng):
    n = 1000
    a = rng.uniform(0.5, 0.999, n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    y, last = scanops.linrec(jnp.asarray(a), jnp.asarray(b), jnp.float32(0.3))
    g = serial_linrec(a.astype(np.float64), b.astype(np.float64), 0.3)
    np.testing.assert_allclose(np.asarray(y), g, rtol=1e-4, atol=1e-4)
    assert abs(float(last) - g[-1]) < 1e-4


def test_one_pole_is_reference_agc_loop(rng):
    # reference sigs/agc.m:6-13: y = filter(beta, [1, beta-1], x), beta=0.1
    beta = 0.1
    x = np.abs(rng.standard_normal(500)).astype(np.float32)
    y, _ = scanops.one_pole(jnp.asarray(x), beta, jnp.float32(0.0))
    import scipy.signal as ss
    g = ss.lfilter([beta], [1, beta - 1], x)
    np.testing.assert_allclose(np.asarray(y), g, rtol=1e-4, atol=1e-5)


def test_one_pole_streaming(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    yf, _ = scanops.one_pole(jnp.asarray(x), 0.01, jnp.float32(0.0))
    prev = jnp.float32(0.0)
    parts = []
    for i in range(0, 4096, 512):
        y, prev = scanops.one_pole(jnp.asarray(x[i:i + 512]), 0.01, prev)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(yf),
                               rtol=1e-4, atol=1e-5)


def test_dc_block_removes_dc(rng):
    x = (rng.standard_normal(8192) * 0.1 + 5.0).astype(np.float32)
    state = (jnp.float32(0), jnp.float32(0))
    y, state = scanops.dc_block(jnp.asarray(x), jnp.float32(0.9985), state)
    y = np.asarray(y)
    assert abs(np.mean(y[4000:])) < 0.01  # DC gone after settling
