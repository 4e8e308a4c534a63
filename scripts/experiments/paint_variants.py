#!/usr/bin/env python
"""Candidate deposit optimizations measured on real TPU:
V1 roll-based one-hot (2 compares instead of 6)
V2 per-row compaction (sort by keep) + paint only K_SEL slots
V3 sort-cost / gather-cost microbenches
"""

import sys
import time
from functools import partial

import numpy as np

from abacusutils_tpu.utils.compile_cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

NMESH = 256
LBOX = 2000.0
K_P = 204800
CHUNK = 8192
SELECT_FRAC = 0.23  # ~ bench: 14M of 60M


def _force(r):
    """Force completion via host transfer of one element per output leaf."""
    for leaf in jax.tree_util.tree_leaves(r):
        np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[0]))


def bench(name, fn, *args, iters=5):
    r = fn(*args)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        _force(r)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name}: {dt*1000:.1f} ms', flush=True)
    return dt


from abacusutils_tpu.ops.grid import _axis_cloud  # noqa: E402


def _paint_grouped_roll(grid, xg, yg, zg, wg, box, offset, nmesh, K, chunk):
    """Variant: one compare + two rolls per axis instead of three compares."""
    ix, wx = _axis_cloud(xg, box, offset, nmesh, 'tsc', True)
    iy, wy = _axis_cloud(yg, box, offset, nmesh, 'tsc', True)
    iz, wz = _axis_cloud(zg, box, offset, nmesh, 'tsc', True)
    iy = jnp.mod(iy, nmesh)
    iz = jnp.mod(iz, nmesh)

    cols = jnp.arange(nmesh, dtype=jnp.int32)
    nchunk = K // chunk

    def cell_body(c, grid):
        def chunk_body(t, acc):
            sl = lambda a: jax.lax.dynamic_slice(a, (c, t * chunk), (1, chunk))[0]  # noqa: E731
            iy_c, iz_c = sl(iy), sl(iz)
            w_c = sl(wg)
            wy_c = [(sl(w) * w_c)[:, None] for w in wy]
            wz_c = [sl(w)[:, None] for w in wz]
            wx_c = [sl(w) for w in wx]

            def onehot(i0, w3):
                M = (cols[None, :] == i0[:, None]).astype(jnp.float32)
                return (
                    w3[0] * jnp.roll(M, -1, axis=1)
                    + w3[1] * M
                    + w3[2] * jnp.roll(M, 1, axis=1)
                )

            Wy = onehot(iy_c, wy_c)
            Wz = onehot(iz_c, wz_c)
            A = jnp.concatenate([(wx_c[o][:, None] * Wy) for o in range(3)], axis=1)
            D = jax.lax.dot_general(
                A, Wz, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + D

        D = jax.lax.fori_loop(
            0, nchunk, chunk_body, jnp.zeros((3 * nmesh, nmesh), jnp.float32)
        )
        D = D.reshape(3, nmesh, nmesh)
        for o in range(3):
            plane = jnp.mod(c + o - 1, nmesh)
            row = jax.lax.dynamic_slice(grid, (plane, 0, 0), (1, nmesh, nmesh))
            grid = jax.lax.dynamic_update_slice(grid, row + D[o][None], (plane, 0, 0))
        return grid

    return jax.lax.fori_loop(0, nmesh, cell_body, grid)


def _paint_grouped_yblock(
    gridp, xg, yg, zg, wg, box, offset, nmesh, B, K2, chunk, zfold=False
):
    """Variant: particles grouped by (x-cell, y-block of height B); the y
    one-hot is only B+2 wide and the x-fold LHS 3*(B+2). gridp is a
    y-padded accumulator (nmesh, nmesh+2, nmesh). zfold=True additionally
    folds the z stencil into 3 shifted matmuls (LHS-weighted) so no dense
    256-wide weighted Wz is built."""
    nyb = nmesh // B
    ncell = nmesh * nyb
    ix, wx = _axis_cloud(xg, box, offset, nmesh, 'tsc', True)
    iy, wy = _axis_cloud(yg, box, offset, nmesh, 'tsc', True)
    iz, wz = _axis_cloud(zg, box, offset, nmesh, 'tsc', True)
    iy = jnp.mod(iy, nmesh)
    iz = jnp.mod(iz, nmesh)

    colsB = jnp.arange(B + 2, dtype=jnp.int32)
    colsZ = jnp.arange(nmesh, dtype=jnp.int32)
    nchunk = K2 // chunk

    def cell_body(c, gridp):
        cx = c // nyb
        y0 = (c % nyb) * B

        def chunk_body(t, acc):
            sl = lambda a: jax.lax.dynamic_slice(a, (c, t * chunk), (1, chunk))[0]  # noqa: E731
            iy_c = sl(iy) - y0 + 1  # local coords in [0, B+2)
            iz_c = sl(iz)
            w_c = sl(wg)
            wy_c = [(sl(w) * w_c)[:, None] for w in wy]
            wz_c = [sl(w)[:, None] for w in wz]
            wx_c = [sl(w) for w in wx]

            My = (colsB[None, :] == iy_c[:, None]).astype(jnp.float32)
            Wy = (
                wy_c[0] * jnp.roll(My, -1, axis=1)
                + wy_c[1] * My
                + wy_c[2] * jnp.roll(My, 1, axis=1)
            )
            A = jnp.concatenate([(wx_c[o][:, None] * Wy) for o in range(3)], axis=1)
            Mz = (colsZ[None, :] == iz_c[:, None]).astype(jnp.float32)
            if zfold:
                D = jnp.zeros((3 * (B + 2), nmesh), jnp.float32)
                for b, wzb in enumerate(wz_c):
                    Db = jax.lax.dot_general(
                        A * wzb, Mz, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    D = D + jnp.roll(Db, b - 1, axis=1)
            else:
                Wz = (
                    wz_c[0] * jnp.roll(Mz, -1, axis=1)
                    + wz_c[1] * Mz
                    + wz_c[2] * jnp.roll(Mz, 1, axis=1)
                )
                D = jax.lax.dot_general(
                    A, Wz, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return acc + D

        D = jax.lax.fori_loop(
            0, nchunk, chunk_body, jnp.zeros((3 * (B + 2), nmesh), jnp.float32)
        )
        D = D.reshape(3, B + 2, nmesh)
        for o in range(3):
            plane = jnp.mod(cx + o - 1, nmesh)
            row = jax.lax.dynamic_slice(gridp, (plane, y0, 0), (1, B + 2, nmesh))
            gridp = jax.lax.dynamic_update_slice(
                gridp, row + D[o][None], (plane, y0, 0)
            )
        return gridp

    return jax.lax.fori_loop(0, ncell, cell_body, gridp)


def _fold_ypad(gridp, nmesh):
    out = gridp[:, 1 : nmesh + 1, :]
    out = out.at[:, nmesh - 1, :].add(gridp[:, 0, :])
    out = out.at[:, 0, :].add(gridp[:, nmesh + 1, :])
    return out


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    n = NMESH * K_P
    cell = LBOX / NMESH
    slab = np.repeat(np.arange(NMESH, dtype=np.float32), K_P)
    xg = ((slab + rng.random(n, dtype=np.float32) - 0.5) * cell) % LBOX
    yg = rng.random(n, dtype=np.float32) * LBOX
    zg = rng.random(n, dtype=np.float32) * LBOX
    wg = (rng.random(n) < SELECT_FRAC).astype(np.float32)

    xg, yg, zg, wg = (jax.device_put(a, dev) for a in (xg, yg, zg, wg))
    jax.block_until_ready(wg)
    print('uploaded', file=sys.stderr, flush=True)

    from abacusutils_tpu.ops.grid import _paint_grouped

    @jax.jit
    def v0(xg, yg, zg, wg):
        grid = jnp.zeros((NMESH,) * 3, jnp.float32)
        return _paint_grouped(
            grid, xg.reshape(NMESH, K_P), yg.reshape(NMESH, K_P),
            zg.reshape(NMESH, K_P), wg.reshape(NMESH, K_P),
            LBOX, 0.0, NMESH, K_P, CHUNK, False,
        ).sum()

    @jax.jit
    def v1(xg, yg, zg, wg):
        grid = jnp.zeros((NMESH,) * 3, jnp.float32)
        return _paint_grouped_roll(
            grid, xg.reshape(NMESH, K_P), yg.reshape(NMESH, K_P),
            zg.reshape(NMESH, K_P), wg.reshape(NMESH, K_P),
            LBOX, 0.0, NMESH, K_P, CHUNK,
        ).sum()

    # V2: compaction cost — stable 4-operand sort by (w==0) then slice
    K_SEL = 65536

    @jax.jit
    def compact_sort(xg, yg, zg, wg):
        key = (wg.reshape(NMESH, K_P) == 0).astype(jnp.int32)
        xs, ys, zs, ws = jax.lax.sort(
            (key, xg.reshape(NMESH, K_P), yg.reshape(NMESH, K_P),
             zg.reshape(NMESH, K_P), wg.reshape(NMESH, K_P)),
            dimension=1, is_stable=False, num_keys=1,
        )[1:]
        return xs[:, :K_SEL], ys[:, :K_SEL], zs[:, :K_SEL], ws[:, :K_SEL]

    @jax.jit
    def compact_argsort_gather(xg, yg, zg, wg):
        key = (wg.reshape(NMESH, K_P) == 0).astype(jnp.int32)
        idx = jnp.argsort(key, axis=1, stable=False)[:, :K_SEL]
        take = lambda a: jnp.take_along_axis(a.reshape(NMESH, K_P), idx, axis=1)  # noqa: E731
        return take(xg), take(yg), take(zg), take(wg)

    @jax.jit
    def v2_paint_compact(xs, ys, zs, ws):
        grid = jnp.zeros((NMESH,) * 3, jnp.float32)
        return _paint_grouped(
            grid, xs, ys, zs, ws, LBOX, 0.0, NMESH, K_SEL, CHUNK, False,
        ).sum()

    r0 = bench('v0 current paint (52.4M)', v0, xg, yg, zg, wg)
    r1 = bench('v1 roll one-hot  (52.4M)', v1, xg, yg, zg, wg)

    # --- yblock variants: regroup the SAME particles by (x-cell, y-block)
    import sys as _sys

    only = set(_sys.argv[1:]) or {'32', '64'}
    for B in (32, 64):
        if str(B) not in only:
            continue
        nyb = NMESH // B
        xh, yh, zh, wh = (np.asarray(a) for a in (xg, yg, zg, wg))
        # mirror the kernel's float32 cell rounding exactly
        inv_h = np.float32(NMESH) / np.float32(LBOX)
        cxi = (
            np.floor(xh.astype(np.float32) * inv_h + np.float32(0.5)).astype(np.int64)
            % NMESH
        )
        cyi = (
            np.floor(yh.astype(np.float32) * inv_h + np.float32(0.5)).astype(np.int64)
            % NMESH
        )
        bucket = cxi * nyb + cyi // B
        order = np.argsort(bucket, kind='stable')
        counts = np.bincount(bucket, minlength=NMESH * nyb)
        K2 = int(np.ceil(counts.max() / CHUNK) * CHUNK)
        ncell = NMESH * nyb
        pad = np.full((ncell, K2), len(xh), np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)])
        within = np.arange(len(xh)) - starts[bucket[order]]
        pad[bucket[order], within] = order
        ext = lambda a, fill=0.0: np.concatenate([a, np.full(1, fill, a.dtype)])[pad]  # noqa: E731
        xb, yb_, zb, wb = ext(xh), ext(yh), ext(zh), ext(wh)
        print(f'B={B}: ncell={ncell} K2={K2} padded={ncell*K2/1e6:.1f}M', flush=True)
        xb, yb_, zb, wb = (jax.device_put(a, dev) for a in (xb, yb_, zb, wb))
        jax.block_until_ready(wb)

        @partial(jax.jit, static_argnames=('zfold',))
        def v3(xb, yb_, zb, wb, zfold=False, B=B, K2=K2):
            gridp = jnp.zeros((NMESH, NMESH + 2, NMESH), jnp.float32)
            gridp = _paint_grouped_yblock(
                gridp, xb, yb_, zb, wb, LBOX, 0.0, NMESH, B, K2, CHUNK, zfold
            )
            return _fold_ypad(gridp, NMESH)

        g3 = v3(xb, yb_, zb, wb, zfold=False)
        g0 = jax.jit(
            lambda x, y, z, w: _paint_grouped(
                jnp.zeros((NMESH,) * 3, jnp.float32),
                x.reshape(NMESH, K_P), y.reshape(NMESH, K_P),
                z.reshape(NMESH, K_P), w.reshape(NMESH, K_P),
                LBOX, 0.0, NMESH, K_P, CHUNK, False,
            )
        )(xg, yg, zg, wg)
        err = float(jnp.max(jnp.abs(g3 - g0)))
        print(f'B={B} max|grid diff| vs v0: {err:.2e}', flush=True)
        bench(f'v3 yblock B={B} (plain Wz)', lambda a, b, c, d: v3(a, b, c, d, zfold=False).ravel()[0], xb, yb_, zb, wb)
        g3z = v3(xb, yb_, zb, wb, zfold=True)
        errz = float(jnp.max(jnp.abs(g3z - g0)))
        print(f'B={B} zfold max|grid diff| vs v0: {errz:.2e}', flush=True)
        bench(f'v3 yblock B={B} (zfold)', lambda a, b, c, d: v3(a, b, c, d, zfold=True).ravel()[0], xb, yb_, zb, wb)


if __name__ == '__main__':
    main()
