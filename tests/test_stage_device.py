"""Device-side deposit staging == host staging, layout-for-layout.

group_inputs2d_device (one multi-operand device sort + per-cell slice
expansion, ops/grid.py:stage_grouped2d) must reproduce group_inputs2d's
host layout exactly: both stable-sort the same (x-cell, y-block) key
(ops/grid.py:cell_key_2d mirrors build_paint_plan2d's host _cells_1d), so
every padded slot — including within-cell order and fill values — matches.
The host path is pinned by the pipeline/power suites; this equality pins
the device path bench.py actually runs.
"""

import numpy as np

from abacusutils_tpu.models.pipeline import group_inputs2d, group_inputs2d_device

LBOX = 250.0
NMESH = 16
YB = 4
CHUNK = 64


def _catalog(n, seed, clustered=False):
    rng = np.random.default_rng(seed)
    if clustered:
        centers = (rng.random((32, 2), dtype=np.float32) - 0.5) * LBOX
        which = rng.integers(0, 32, n)
        xy = centers[which] + rng.normal(0, 3, (n, 2)).astype(np.float32)
        x, y = (np.mod(xy[:, i] + LBOX / 2, LBOX) - LBOX / 2 for i in (0, 1))
    else:
        x, y = ((rng.random(n, dtype=np.float32) - 0.5) * LBOX for _ in (0, 1))
    return {
        'x': x.astype(np.float32),
        'y': y.astype(np.float32),
        'z': ((rng.random(n, dtype=np.float32) - 0.5) * LBOX),
        'randoms': rng.random(n, dtype=np.float32),
        'w': rng.normal(0, 1, n).astype(np.float32),
    }


def test_device_staging_matches_host_uniform():
    cat = _catalog(20_000, seed=1)
    g_h, plan_h = group_inputs2d(cat, NMESH, LBOX, yb=YB, chunk=CHUNK)
    g_d, plan_d = group_inputs2d_device(cat, NMESH, LBOX, yb=YB, chunk=CHUNK)
    assert plan_d.K == plan_h.K
    for k in cat:
        a, b = np.asarray(g_h[k], np.float32), np.asarray(g_d[k])
        assert a.shape == b.shape
        assert np.array_equal(a, b), k


def test_device_staging_matches_host_clustered():
    # uneven occupancy: exercises the capacity sizing + per-cell fill path
    cat = _catalog(30_000, seed=2, clustered=True)
    g_h, plan_h = group_inputs2d(cat, NMESH, LBOX, yb=YB, chunk=CHUNK)
    g_d, plan_d = group_inputs2d_device(cat, NMESH, LBOX, yb=YB, chunk=CHUNK)
    assert plan_d.K == plan_h.K
    for k in cat:
        assert np.array_equal(np.asarray(g_h[k], np.float32),
                              np.asarray(g_d[k])), k
    # pad slots carry the populate-nothing sentinel in 'randoms'
    occupied = (np.asarray(g_d['randoms']) != 2.0).sum()
    assert occupied == 30_000
