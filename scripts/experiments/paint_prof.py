#!/usr/bin/env python
"""Deposit-path profiling on real TPU: time each stage of the fused bench
step separately (populate / halo paint / particle paint / FFT+bin) and
candidate deposit variants, on synthetic pre-grouped inputs (no host-side
argsort needed)."""

import sys
import time

import numpy as np

from abacusutils_tpu.utils.compile_cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

NMESH = 256
LBOX = 2000.0
K_H = 40960
K_P = 204800
CHUNK = 8192
FRAC_H = 10_000_000 / (256 * K_H)  # real-row fraction to mimic bench occupancy
FRAC_P = 50_000_000 / (256 * K_P)


def synth_grouped(K, frac, seed):
    """Grouped SoA arrays shaped (nmesh*K,), x within its slab, a `frac`
    fraction of slots real (rest padded: randoms=2 -> populate nothing)."""
    rng = np.random.default_rng(seed)
    n = NMESH * K
    cell = LBOX / NMESH
    slab = np.repeat(np.arange(NMESH, dtype=np.float32), K)
    x = (slab + rng.random(n, dtype=np.float32) - 0.5) * cell - LBOX / 2
    real = rng.random(n) < frac
    out = {
        'x': x.astype(np.float32),
        'y': (rng.random(n, dtype=np.float32) * LBOX - LBOX / 2),
        'z': (rng.random(n, dtype=np.float32) * LBOX - LBOX / 2),
        'vz': rng.normal(0, 300, n).astype(np.float32),
        'randoms': np.where(real, rng.random(n), 2.0).astype(np.float32),
        'deltac': np.zeros(n, np.float32),
        'fenv': np.zeros(n, np.float32),
    }
    return out


def main():
    dev = jax.devices()[0]
    print('device:', dev, file=sys.stderr, flush=True)

    hg = synth_grouped(K_H, FRAC_H, 1)
    hg['mass'] = (10 ** (11 + 4 * np.random.default_rng(2).random(NMESH * K_H) ** 3)).astype(np.float32)
    hg['multis'] = np.ones(NMESH * K_H, np.float32)
    hg['vdevz'] = np.zeros(NMESH * K_H, np.float32)

    pg = synth_grouped(K_P, FRAC_P, 3)
    pg['hvelz'] = pg['vz'].copy()
    pg['hmass'] = (10 ** (12 + 3 * np.random.default_rng(4).random(NMESH * K_P) ** 3)).astype(np.float32)
    pg['weights'] = np.full(NMESH * K_P, 20.0, np.float32)

    t0 = time.perf_counter()
    hg = {k: jax.device_put(v, dev) for k, v in hg.items()}
    pg = {k: jax.device_put(v, dev) for k, v in pg.items()}
    jax.block_until_ready(pg)
    print('upload', round(time.perf_counter() - t0, 1), 's', file=sys.stderr, flush=True)

    from abacusutils_tpu.models.pipeline import make_bin_plan_arrays, populate_weights
    from abacusutils_tpu.ops.grid import paint_grouped

    params = {
        'logM_cut': 12.8, 'logM1': 14.0, 'sigma': 0.3, 'alpha': 1.0,
        'kappa': 0.4, 'alpha_c': 0.3, 'alpha_s': 1.0, 'ic': 1.0,
        'Acent': 0.0, 'Asat': 0.0, 'Bcent': 0.0, 'Bsat': 0.0,
    }
    binplan, counts = make_bin_plan_arrays(NMESH, LBOX, NMESH // 2)
    binplan = jax.device_put(binplan, dev)

    half_l = jnp.float32(LBOX / 2)

    @jax.jit
    def stage_populate(hg, pg, params):
        z_c, keep_c, z_s, keep_s = populate_weights(hg, pg, params, True, 1e-2)
        return z_c.sum() + z_s.sum() + keep_c.sum() + keep_s.sum()

    @jax.jit
    def stage_paint_h(hg, params):
        z_c, keep_c, _, _ = populate_weights(hg, hg, params, True, 1e-2)
        grid = jnp.zeros((NMESH, NMESH, NMESH), jnp.float32)
        grid = paint_grouped(
            grid,
            (hg['x'] + half_l).reshape(NMESH, K_H),
            (hg['y'] + half_l).reshape(NMESH, K_H),
            (z_c + half_l).reshape(NMESH, K_H),
            keep_c.reshape(NMESH, K_H),
            LBOX, 0.0, NMESH, K_H, CHUNK, False,
        )
        return grid.sum()

    @jax.jit
    def stage_paint_p(hg, pg, params):
        _, _, z_s, keep_s = populate_weights(hg, pg, params, True, 1e-2)
        grid = jnp.zeros((NMESH, NMESH, NMESH), jnp.float32)
        grid = paint_grouped(
            grid,
            (pg['x'] + half_l).reshape(NMESH, K_P),
            (pg['y'] + half_l).reshape(NMESH, K_P),
            (z_s + half_l).reshape(NMESH, K_P),
            keep_s.reshape(NMESH, K_P),
            LBOX, 0.0, NMESH, K_P, CHUNK, False,
        )
        return grid.sum()

    from abacusutils_tpu.ops.power import _segsum_sorted

    @jax.jit
    def stage_fft_bin(grid, binplan):
        delta = grid * (grid.size / jnp.float32(1e7)) - 1.0
        delta_k = jnp.fft.rfftn(delta) * jnp.float32(1.0 / grid.size)
        p3d = jnp.abs(delta_k) ** 2
        perm, bounds, dup_sorted = binplan
        return _segsum_sorted(p3d.reshape(-1)[perm] * dup_sorted, bounds)

    grid0 = jax.device_put(np.random.default_rng(5).random((NMESH,) * 3).astype(np.float32), dev)

    def bench(name, fn, *args, iters=5):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        print(f'{name}: {dt*1000:.1f} ms', flush=True)
        return dt

    # hg doubles as its own "part" dict in stage_populate? needs part keys
    hgp = dict(hg)
    hgp.setdefault('hvelz', hg['vz'])
    hgp.setdefault('hmass', hg['mass'])
    hgp.setdefault('weights', hg['multis'])

    bench('populate(h+p)', stage_populate, hg, {**pg}, params)
    bench('paint_halo  (10.5M slots)', stage_paint_h, hgp, params)
    bench('paint_part  (52.4M slots)', stage_paint_p, hgp, pg, params)
    bench('fft+bin     (256^3)', stage_fft_bin, grid0, binplan)


if __name__ == '__main__':
    main()
