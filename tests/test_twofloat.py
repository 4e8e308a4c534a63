"""Property tests for the double-float32 building blocks (utils.twofloat).

These primitives carry the exactness claims of the device prepare_sim
engines (ranks_device / menv_device run on f32-only backends yet must
reproduce f64 ORDER), so each error-free-transform property is pinned
directly against float64 references here, independent of the engines.
"""

import numpy as np
import numpy.testing as npt

import jax.numpy as jnp

from abacusutils_tpu.utils import twofloat as tf

RNG = np.random.default_rng(7)


def _rand_f32(n, scale=2000.0):
    return (RNG.random(n, np.float64) * scale - scale / 2).astype(np.float32)


def test_two_sum_exact():
    a = _rand_f32(4096)
    b = _rand_f32(4096, scale=0.01)  # wildly different magnitudes
    s, e = tf.two_sum(jnp.asarray(a), jnp.asarray(b))
    s, e = np.asarray(s, np.float64), np.asarray(e, np.float64)
    npt.assert_array_equal(s + e, a.astype(np.float64) + b.astype(np.float64))


def test_df_sq_accuracy():
    v = RNG.random(4096) * 1e3 + 1e-3
    hi, lo = tf.split2_f64(v)
    ph, pl = tf.df_sq(jnp.asarray(hi), jnp.asarray(lo))
    got = np.asarray(ph, np.float64) + np.asarray(pl, np.float64)
    rel = np.abs(got - v**2) / v**2
    assert rel.max() < 2.0**-45, rel.max()


def test_df_d2_matches_f64_order():
    # near-degenerate squared distances: pairs of points whose f64 d2
    # differ at the ~1e-9 relative level must still order correctly
    n = 2048
    ax, ay, az = (_rand_f32(n) for _ in range(3))
    bx, by, bz = (_rand_f32(n) for _ in range(3))
    # second pair set = tiny perturbation of the first
    cx = (bx.astype(np.float64) + RNG.normal(0, 1e-6, n)).astype(np.float32)
    d2 = lambda p, q: sum(  # noqa: E731
        (np.asarray(u, np.float64) - np.asarray(v, np.float64)) ** 2
        for u, v in zip(p, q)
    )
    ref1 = d2((ax, ay, az), (bx, by, bz))
    ref2 = d2((ax, ay, az), (cx, by, bz))
    h1, l1 = tf.df_d2(*map(jnp.asarray, (ax, ay, az, bx, by, bz)))
    h2, l2 = tf.df_d2(*map(jnp.asarray, (ax, ay, az, cx, by, bz)))
    got = np.asarray(h1, np.float64) + np.asarray(l1, np.float64)
    rel = np.abs(got - ref1) / np.maximum(ref1, 1e-30)
    assert rel.max() < 2.0**-44, rel.max()
    # order agreement wherever f64 separates the two by > 2^-44 relative
    sep = np.abs(ref1 - ref2) / np.maximum(ref1, 1e-30) > 2.0**-44
    le = np.asarray(tf.df_le(h1, l1, h2, l2))
    npt.assert_array_equal(le[sep], (ref1 <= ref2)[sep])


def test_split2_preserves_order():
    v = np.sort(RNG.random(8192) * 1e6)
    # inject adjacent near-ties (f64 neighbors)
    v[1::2] = np.nextafter(v[::2], np.inf)
    hi, lo = tf.split2_f64(v)
    key = np.stack([hi.astype(np.float64), lo.astype(np.float64)], 1)
    order = np.lexsort((key[:, 1], key[:, 0]))
    assert (np.diff(v[order]) >= 0).all()


def test_split3_exact_and_total_order():
    v = RNG.random(8192) * 1e9 - 5e8
    hi, lo, lo2 = tf.split3_f64(v)
    npt.assert_array_equal(
        hi.astype(np.float64) + lo.astype(np.float64) + lo2.astype(np.float64),
        v,
    )
    # distinct f64 values must sort identically through the triple
    u = np.unique(v)
    h, l1, l2 = tf.split3_f64(u)
    order = np.lexsort((l2, l1, h))
    npt.assert_array_equal(order, np.arange(len(u)))


def test_split_f32_overflow_collapses_to_inf():
    v = np.array([1.0, 2e38, 7e38, -7e38])
    hi, lo = tf.split2_f64(v)
    assert np.isinf(hi[2]) and np.isinf(hi[3]) and hi[3] < 0
    npt.assert_array_equal(lo[2:], 0.0)


def test_df_sum_pow2_compensates():
    import math

    n = 1024
    x = RNG.random(n) * np.exp(RNG.normal(0, 8, n))
    x32 = x.astype(np.float32)
    hi, lo = tf.df_sum_pow2(jnp.asarray(x32), jnp.zeros(n, jnp.float32))
    ref = math.fsum(x32.astype(np.float64))
    got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
    assert abs(got - ref) / abs(ref) < 1e-12
    # plain f32 summation would NOT meet that bound on this spread
    assert abs(float(x32.sum()) - ref) / abs(ref) > 1e-12


def test_df_min_and_le_semantics():
    hi = jnp.asarray(np.array([[1.0, 1.0, 2.0, np.inf]], np.float32))
    lo = jnp.asarray(np.array([[1e-8, -1e-8, 0.0, 0.0]], np.float32))
    mh, ml = tf.df_min(hi, lo, axis=1)
    assert float(mh[0]) == 1.0 and float(ml[0]) == np.float32(-1e-8)
    # NaN hi compares False both ways (d2 <= r2 masking convention)
    nan = jnp.full((1,), jnp.nan, jnp.float32)
    one = jnp.ones((1,), jnp.float32)
    zero = jnp.zeros((1,), jnp.float32)
    assert not bool(tf.df_le(nan, zero, one, zero)[0])
    assert not bool(tf.df_le(one, zero, nan, zero)[0])
