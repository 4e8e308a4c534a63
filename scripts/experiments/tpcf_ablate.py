#!/usr/bin/env python
"""Ablate the cell-list pair kernel: where does the time go?

Synthetic (C, K) cell layout mimicking the 4e6-point bench's dominant class:
C=165K cells at cap 32, K2=104 neighbors, 14 offsets. Measures:
  full      - current kernel (distances + searchsorted + factorized hist)
  dist-only - distances + reduce (no binning)
  hist-only - precomputed bins + factorized hist matmul
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

C = 32 * 1024
K1 = 32
K2 = 104
NOFF = 14
NB1, NB2 = 8, 30
LBOX = 2000.0
PAIRS = C * K1 * K2 * NOFF


def min_image(d, lbox):
    return d - lbox * jnp.round(d / lbox)


@partial(jax.jit, static_argnames=('variant', 'nblk'))
def run(g1, g2, nbr, edges2, variant, nblk):
    x1, y1, z1, i1 = g1
    cb = C // nblk

    def one_offset(counts, o):
        rows = nbr[:, o]
        xn, yn, zn, jn = (a[rows] for a in g2)

        def block(counts, b):
            sl = lambda a, w: jax.lax.dynamic_slice(a, (b, 0), (cb, w))
            dx = min_image(sl(x1, K1)[:, :, None] - sl(xn, K2)[:, None, :], LBOX)
            dy = min_image(sl(y1, K1)[:, :, None] - sl(yn, K2)[:, None, :], LBOX)
            dz = jnp.abs(min_image(sl(z1, K1)[:, :, None] - sl(zn, K2)[:, None, :], LBOX))
            r2 = dx * dx + dy * dy
            if variant == 'dist':
                return counts + jnp.sum(r2 < 900.0, dtype=jnp.int32).reshape(1, 1), None
            b2 = jnp.floor(dz).astype(jnp.int32)
            ok = (dz < 30.0) & jnp.isfinite(r2)
            b1v = jnp.searchsorted(edges2, r2, side='right') - 1
            ok = ok & (b1v >= 0) & (b1v < NB1)
            ok = ok & (sl(i1, K1)[:, :, None] != sl(jn, K2)[:, None, :])
            if variant == 'nohist':
                return counts + jnp.sum(jnp.where(ok, b1v * NB2 + b2, 0), dtype=jnp.int32).reshape(1, 1), None
            cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, NB1), 1)
            cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, NB2), 1)
            oh1 = ((b1v.reshape(-1, 1) == cols1) & ok.reshape(-1, 1)).astype(jnp.bfloat16)
            oh2 = (b2.reshape(-1, 1) == cols2).astype(jnp.bfloat16)
            blk = jax.lax.dot_general(oh1, oh2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return counts + blk.astype(jnp.int32), None

        counts, _ = jax.lax.scan(block, counts, jnp.arange(nblk) * cb)
        return counts, None

    shape = (1, 1) if variant in ('dist', 'nohist') else (NB1, NB2)
    counts, _ = jax.lax.scan(one_offset, jnp.zeros(shape, jnp.int32), jnp.arange(NOFF))
    return counts


def main():
    rng = np.random.default_rng(0)
    def mk(k):
        return (
            jnp.asarray(rng.random((C, k), np.float32) * LBOX),
            jnp.asarray(rng.random((C, k), np.float32) * LBOX),
            jnp.asarray(rng.random((C, k), np.float32) * LBOX),
            jnp.asarray(rng.integers(0, 1 << 20, (C, k)).astype(np.int32)),
        )
    g1, g2 = mk(K1), mk(K2)
    nbr = jnp.asarray(rng.integers(0, C, (C, 27)).astype(np.int32))
    edges2 = jnp.asarray((np.logspace(-1, np.log10(30.0), NB1 + 1) ** 2).astype(np.float32))
    nblk = max(1, C // max(1, 2_000_000 // (K1 * K2)))

    for variant in ('dist', 'nohist', 'full'):
        np.asarray(run(g1, g2, nbr, edges2, variant, nblk))
        t0 = time.perf_counter()
        np.asarray(run(g1, g2, nbr, edges2, variant, nblk))
        dt = time.perf_counter() - t0
        print(f'{variant:8s} {dt:.3f}s  {PAIRS/dt/1e9:.2f} Gpair/s', flush=True)


if __name__ == '__main__':
    main()
