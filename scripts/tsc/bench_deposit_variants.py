#!/usr/bin/env python
"""Deposit one-hot-construction ablation (VERDICT r3 push on the paint
floor): variants of the z-stencil construction in paint_grouped_yb.

A: production kernel (Wz = compare + 2 lane-rolls + weighted combine).
C: single compare -> plain one-hot M; fold the 3 z-weights into a
   3x-stacked LHS (one wide dot), shift-add the OUTPUT rows (256-element
   rolls of the small result instead of chunk x nmesh lane rolls).
D: like A but the compare runs in u8 (iz fits a byte at nmesh<=256),
   widened to f32 after.
CD: C with the u8 compare.

Prints one JSON line per variant: seconds per deposit of N slots.
"""

import json
import sys
import time
from functools import partial

import numpy as np


def main(n=50_000_000, nmesh=256, B=32, chunk=32768, iters=3):
    import jax
    import jax.numpy as jnp

    from abacusutils_tpu.utils.compile_cache import enable
    enable()

    from abacusutils_tpu.ops.grid import (
        _axis_cloud,
        fold_ypad,
        paint_grouped_yb,
        stage_grouped2d,
    )

    lbox = 2000.0
    # generate on device: a 2 GB H2D over the dev tunnel would dominate
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    cols = [jax.random.uniform(k, (n,), jnp.float32) * lbox for k in keys]
    cols.append(jnp.ones(n, jnp.float32))
    jax.device_get(cols[0][-1:])
    (xg, yg, zg, wg), K2 = stage_grouped2d(
        cols, nmesh, lbox, B, [0.0, 0.0, 0.0, 0.0], chunk=chunk
    )
    nyb = nmesh // B
    ncell = nmesh * nyb
    shaped = [a.reshape(ncell, K2) for a in (xg, yg, zg, wg)]
    print(f'K2={K2} ncell={ncell}', file=sys.stderr, flush=True)

    def variant_kernel(mode):
        @partial(jax.jit, static_argnames=())
        def run(xg, yg, zg, wg):
            gridp = jnp.zeros((nmesh, nmesh + 2, nmesh), jnp.float32)
            if mode == 'A':
                gridp = paint_grouped_yb(
                    gridp, xg, yg, zg, wg, lbox, 0.0, nmesh, B, K2, chunk
                )
                return fold_ypad(gridp, nmesh).sum()
            ix, wx = _axis_cloud(xg, lbox, 0.0, nmesh, 'tsc', True)
            iy, wy = _axis_cloud(yg, lbox, 0.0, nmesh, 'tsc', True)
            iz, wz = _axis_cloud(zg, lbox, 0.0, nmesh, 'tsc', True)
            iy = jnp.mod(iy, nmesh)
            iz = jnp.mod(iz, nmesh)
            colsB = jnp.arange(B + 2, dtype=jnp.int32)
            if 'u8' in mode:
                colsZ = jnp.arange(nmesh, dtype=jnp.int32).astype(jnp.uint8)
            elif 'u16' in mode:
                # 2 indices per f32 lane; valid to nmesh <= 65536
                colsZ = jnp.arange(nmesh, dtype=jnp.int32).astype(jnp.uint16)
            else:
                colsZ = jnp.arange(nmesh, dtype=jnp.int32)
            nchunk = K2 // chunk

            def cell_body(c, gridp):
                cx = c // nyb
                y0 = (c % nyb) * B

                def chunk_body(t, acc):
                    sl = lambda a: jax.lax.dynamic_slice(  # noqa: E731
                        a, (c, t * chunk), (1, chunk))[0]
                    iy_c = sl(iy) - y0 + 1
                    iz_c = sl(iz)
                    w_c = sl(wg)
                    wy_c = [(sl(w) * w_c)[:, None] for w in wy]
                    wz_c = [sl(w) for w in wz]
                    wx_c = [sl(w) for w in wx]

                    # y one-hot (same in all variants)
                    My = (colsB[None, :] == iy_c[:, None]).astype(jnp.float32)
                    Wy = (
                        wy_c[0] * jnp.roll(My, -1, axis=1)
                        + wy_c[1] * My
                        + wy_c[2] * jnp.roll(My, 1, axis=1)
                    )
                    A = jnp.concatenate(
                        [(wx_c[o][:, None] * Wy) for o in range(3)], axis=1
                    )  # (chunk, 3*(B+2))

                    if 'u8' in mode:
                        Mz = (colsZ[None, :] == iz_c.astype(jnp.uint8)[:, None])
                        Mz = Mz.astype(jnp.float32)
                    elif 'u16' in mode:
                        Mz = (colsZ[None, :] == iz_c.astype(jnp.uint16)[:, None])
                        Mz = Mz.astype(jnp.float32)
                    else:
                        Mz = (colsZ[None, :] == iz_c[:, None]).astype(jnp.float32)

                    if mode.startswith('C'):
                        # stack the 3 z-weight scalings of A; one wide dot;
                        # shift-add small output rows
                        A3 = jnp.concatenate(
                            [A * wz_c[o][:, None] for o in range(3)], axis=1
                        )  # (chunk, 9*(B+2))
                        D3 = jax.lax.dot_general(
                            A3, Mz, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (9*(B+2), nmesh)
                        r = 3 * (B + 2)
                        D = (
                            jnp.roll(D3[:r], -1, axis=1)
                            + D3[r:2 * r]
                            + jnp.roll(D3[2 * r:], 1, axis=1)
                        )
                    else:  # 'D' (u8 compare, A-style combine)
                        Wz = (
                            wz_c[0][:, None] * jnp.roll(Mz, -1, axis=1)
                            + wz_c[1][:, None] * Mz
                            + wz_c[2][:, None] * jnp.roll(Mz, 1, axis=1)
                        )
                        D = jax.lax.dot_general(
                            A, Wz, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    return acc + D

                D = jax.lax.fori_loop(
                    0, nchunk, chunk_body,
                    jnp.zeros((3 * (B + 2), nmesh), jnp.float32),
                )
                D = D.reshape(3, B + 2, nmesh)
                for o in range(3):
                    plane = jnp.mod(cx + o - 1, nmesh)
                    row = jax.lax.dynamic_slice(
                        gridp, (plane, y0, 0), (1, B + 2, nmesh)
                    )
                    gridp = jax.lax.dynamic_update_slice(
                        gridp, row + D[o][None], (plane, y0, 0)
                    )
                return gridp

            gridp = jax.lax.fori_loop(0, ncell, cell_body, gridp)
            return fold_ypad(gridp, nmesh).sum()

        return run

    results = {}
    modes = ('A', 'C', 'D_u8', 'C_u8') if nmesh <= 256 else \
            ('A', 'C', 'D_u16', 'C_u16')
    for mode in modes:
        fn = variant_kernel(mode)
        try:
            t0 = time.perf_counter()
            s = float(fn(*shaped))
            compile_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(iters):
                s2 = float(fn(*shaped))
            dt = (time.perf_counter() - t0) / iters
            assert abs(s2 - n) / n < 1e-3, (mode, s2)
            results[mode] = round(dt, 4)
            print(f'{mode}: {dt:.4f}s (compile {compile_t:.1f}s) sum={s2:.0f}',
                  file=sys.stderr, flush=True)
        except Exception as e:
            results[mode] = f'err: {e}'
            print(mode, 'ERROR', e, file=sys.stderr, flush=True)
    print(json.dumps({'n': n, 'nmesh': nmesh, 'B': B, 'chunk': chunk,
                      'seconds': results}))


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:]))
