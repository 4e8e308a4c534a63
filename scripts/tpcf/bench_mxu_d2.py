#!/usr/bin/env python
"""Ablation: pair distances via the MXU matmul identity
d^2 = ||a||^2 + ||b||^2 - 2 a.b  (VERDICT r4 item 4).

The production combo kernel computes per-pair d^2 with direct VPU
subtract/square ops; this variant moves the cross term to the MXU as a
batched (Pc, capA, 2|3) x (Pc, 2|3, capB) dot (precision=HIGHEST — the
XLA 3-pass bf16 split; the Mosaic HIGHEST hang is Pallas-only) with both
sides centered on the neighbor row's first point to tame cancellation.

Expectations this script measures rather than argues:
- Throughput: the kernel is VPU-roofline at ~75 ops/pair of which the
  distance math is ~7-10; the histogram's ~60 threshold compares stay on
  the VPU either way, so the ceiling of this rewrite is ~10%. The K=2/3
  contraction also runs the MXU at <2% utilization (K pads to the tile).
- Exactness: the matmul form rounds differently from (a-b)^2 and loses
  ~|c|^2 * eps absolutely to cancellation, so counts are NOT bit-identical
  — near-edge pairs can flip bins, breaking the brute-force equality
  contract the production kernel is pinned to. The script reports the
  count deltas alongside the timings.

Usage: python scripts/tpcf/bench_mxu_d2.py [n_points ...]
"""

import json
import sys
import time
from functools import partial

import numpy as np

import os

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_here, '..', '..'))
sys.path.insert(0, _here)
from bench import clustered_points  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from abacusutils_tpu.ops import tpcf  # noqa: E402
from abacusutils_tpu.utils.compile_cache import enable as enable_cache  # noqa: E402

enable_cache()


@partial(jax.jit, static_argnames=('mode', 'nb1', 'nb2', 'capA', 'capB', 'Pc',
                                   'use_wrap'))
def _combo_counts_mxu(A, B, ia, ib, iw, edges2, aux, lbox, mode, nb1, nb2,
                      capA, capB, Pc, use_wrap):
    """tpcf._combo_counts with r^2 built from the matmul identity."""
    nblk = ia.shape[0] // Pc
    if mode == 'rppi':
        thr2 = jnp.arange(nb2 + 1, dtype=jnp.float32)
    else:
        thr2 = jnp.concatenate(
            [jnp.arange(nb2, dtype=jnp.float32),
             jnp.full((1,), jnp.inf, jnp.float32)]
        )
    nd = 2 if mode == 'rppi' else 3

    def blk(counts, t):
        ja = jax.lax.dynamic_slice(ia, (t,), (Pc,))
        jb = jax.lax.dynamic_slice(ib, (t,), (Pc,))
        ra = tpcf._rows(A, ja)
        rb = tpcf._rows(B, jb)
        ax, ay, az = ra[:, :capA], ra[:, capA:2 * capA], ra[:, 2 * capA:3 * capA]
        bx, by, bz = rb[:, :capB], rb[:, capB:2 * capB], rb[:, 2 * capB:3 * capB]
        if use_wrap:
            jw = jax.lax.dynamic_slice(iw, (t,), (Pc,))
            wx = (jw // 9 - 1).astype(jnp.float32) * lbox
            wy = (jw // 3 % 3 - 1).astype(jnp.float32) * lbox
            wz = (jw % 3 - 1).astype(jnp.float32) * lbox
            ax = ax - wx[:, None]
            ay = ay - wy[:, None]
            azs = az - wz[:, None]
        else:
            azs = az
        # center both sides on the neighbor row's first slot (a real point
        # for every live cell; inf pad rows poison to NaN and vanish in the
        # cumulative-histogram differences)
        cx, cy, cz = bx[:, :1], by[:, :1], bz[:, :1]
        at = jnp.stack([ax - cx, ay - cy] + ([azs - cz] if nd == 3 else []), 2)
        bt = jnp.stack([bx - cx, by - cy] + ([bz - cz] if nd == 3 else []), 1)
        G = jax.lax.dot_general(
            at, bt, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        na = (at * at).sum(2)
        nb = (bt * bt).sum(1)
        r2 = na[:, :, None] + nb[:, None, :] - 2.0 * G
        if mode == 'rppi':
            if use_wrap:
                dz = jnp.abs(azs[:, :, None] - bz[:, None, :])
            else:
                dz = jnp.abs(tpcf._min_image(
                    az[:, :, None] - bz[:, None, :], lbox))
            q = dz
        else:
            if not use_wrap:
                # no item-constant wrap: fall back per-pair for dz only
                dz = jnp.abs(tpcf._min_image(
                    az[:, :, None] - bz[:, None, :], lbox))
            else:
                dz = jnp.abs(azs[:, :, None] - bz[:, None, :])
            s = jnp.sqrt(jnp.maximum(r2, 0.0))
            q = jnp.where(s > 0, dz / s, 0.0) * aux
        return counts + tpcf._hist2d_cum(r2, q, edges2[:nb1 + 1], thr2), None

    counts = jnp.zeros((nb1 + 1, nb2 + 1), jnp.int32)
    counts, _ = jax.lax.scan(
        blk, counts, jnp.arange(nblk, dtype=jnp.int32) * Pc
    )
    h = counts[:-1, :] - counts[1:, :]
    return h[:, :-1] - h[:, 1:]


def run(n):
    lbox = 2000.0
    pos = clustered_points(n, lbox)
    pos_d = jax.block_until_ready(jax.device_put(pos.astype(np.float32)))
    rpbins = np.logspace(-1, np.log10(30.0), 9)
    pimax = 30
    out = {'n': n}

    prod = tpcf._combo_counts

    def timed(label):
        # warm (compile + stage), then best of 3
        c = tpcf.pair_counts_rppi(pos_d, rpbins, pimax, lbox)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            c = tpcf.pair_counts_rppi(pos_d, rpbins, pimax, lbox)
            best = min(best, time.perf_counter() - t0)
        out[f'{label}_warm_s'] = round(best, 3)
        return c

    c0 = timed('direct')
    tpcf._combo_counts = _combo_counts_mxu
    try:
        c1 = timed('mxu')
    finally:
        tpcf._combo_counts = prod

    d = np.abs(c1.astype(np.int64) - c0.astype(np.int64))
    out['bins_differing'] = int((d > 0).sum())
    out['max_abs_count_delta'] = int(d.max())
    out['total_pairs'] = int(c0.sum())
    out['mxu_speedup'] = round(out['direct_warm_s'] / out['mxu_warm_s'], 3)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    ns = [int(a) for a in sys.argv[1:]] or [4_000_000, 10_000_000]
    for n in ns:
        run(n)
