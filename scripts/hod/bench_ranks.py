#!/usr/bin/env python
"""prepare_sim rank decorations at slab scale: host per-halo loop vs the
batched device engine (models/hod/ranks_device.py).

Reference workload: prepare_sim.py:886-977 — five rank fields per subsampled
particle, computed halo by halo with a fresh cKDTree and ten argsorts per
halo; the reference documents this serial loop as its bottleneck. The device
engine runs the same math as a handful of whole-slab programs: one
multi-operand segment sort per rank key and a capacity-classed pairwise
minimum for the nearest-neighbor distance.

Synthesizes a slab with a power-law halo mass function (many tens-of-
particle halos, a few thousands-of-particle ones), times both engines, and
prints one JSON line. The device wall time includes host key prep (alpha
chain), uploads, and the five rank downloads — the honest end-to-end cost a
prepare_sim slab would pay.
"""

import argparse
import json
import time

import numpy as np


def synth_slab(n_target, seed=17):
    rng = np.random.default_rng(seed)
    # power-law sizes: P(n) ~ n^-2 over [20, 4000]
    u = rng.random(int(n_target / 55) * 2)
    lo, hi = 20.0, 4000.0
    sizes = (lo ** -1 - u * (lo ** -1 - hi ** -1)) ** -1
    pn = sizes.astype(np.int64)
    pn = pn[np.cumsum(pn) <= n_target]
    ps = np.concatenate([[0], np.cumsum(pn)])[:-1]
    n = int(pn.sum())
    n_halo = len(pn)
    hpos = (rng.random((n_halo, 3)) * 500).astype(np.float32)
    hvel = rng.normal(0, 300, (n_halo, 3)).astype(np.float32)
    N = (pn * rng.uniform(5, 20, n_halo)).astype(np.int64)
    r25 = (rng.random(n_halo) * 0.2 + 0.05).astype(np.float32)
    r98 = (r25 * rng.uniform(1.5, 5.5, n_halo)).astype(np.float32)
    ppos = np.empty((n, 3), np.float32)
    pvel = np.empty((n, 3), np.float32)
    submask = np.zeros(n, bool)
    for j in range(n_halo):
        sl = slice(ps[j], ps[j] + pn[j])
        ppos[sl] = hpos[j] + rng.normal(0, 0.4, (pn[j], 3)).astype(np.float32)
        pvel[sl] = hvel[j] + rng.normal(0, 120, (pn[j], 3)).astype(np.float32)
        m = rng.random(pn[j]) < 0.7
        if m.sum() < 2:
            m[:2] = True
        submask[sl] = m
    return ps, pn, n, hpos, hvel, N, r25, r98, ppos, pvel, submask


def run(n_target=1_200_000, host=True, verbose=True):
    from abacusutils_tpu.utils.compile_cache import enable

    enable()

    import jax

    from abacusutils_tpu.models.hod.prepare_sim import _rank_fields
    from abacusutils_tpu.models.hod.ranks_device import rank_fields_device

    Mpart, h = 2.1e9, 0.6736
    ps, pn, n, hpos, hvel, N, r25, r98, ppos, pvel, submask = synth_slab(n_target)
    n_halo = len(ps)
    if verbose:
        print(
            f'slab: {n} particles in {n_halo} halos '
            f'(max {pn.max()}, backend {jax.default_backend()})',
            flush=True,
        )

    # per-particle halo columns (what prepare_slab's loop accumulates)
    seg = np.full(n, -1, np.int32)
    nsub_p = np.zeros(n)
    hpos_p = np.zeros((n, 3), np.float32)
    hvel_p = np.zeros((n, 3), np.float32)
    mass_p = np.zeros(n)
    r25_p = np.zeros(n, np.float32)
    r98_p = np.zeros(n, np.float32)
    for j in range(n_halo):
        sl = slice(ps[j], ps[j] + pn[j])
        seg[sl] = j
        nsub_p[sl] = submask[sl].sum()
        hpos_p[sl] = hpos[j]
        hvel_p[sl] = hvel[j]
        mass_p[sl] = N[j] * Mpart
        r25_p[sl] = r25[j]
        r98_p[sl] = r98[j]

    out = {'n_part': n, 'n_halo': n_halo, 'backend': jax.default_backend()}

    args = (ppos, pvel, submask, seg, nsub_p, ps, pn,
            hpos_p, hvel_p, mass_p, r25_p, r98_p, h)
    t0 = time.perf_counter()
    dev = rank_fields_device(*args)
    out['device_cold_s'] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    dev = rank_fields_device(*args)
    out['device_warm_s'] = round(time.perf_counter() - t0, 3)
    if verbose:
        print(f'device: cold {out["device_cold_s"]} s, warm {out["device_warm_s"]} s', flush=True)

    if host:
        hostr = [np.full(n, -1.0) for _ in range(5)]
        t0 = time.perf_counter()
        for j in range(n_halo):
            sl = slice(ps[j], ps[j] + pn[j])
            m = submask[sl]
            idx = np.arange(ps[j], ps[j] + pn[j])[m]
            _rank_fields(
                idx, ppos[sl][m], pvel[sl][m], ppos[sl],
                hpos[j], hvel[j], N[j] * Mpart, r25[j], r98[j], h, *hostr,
            )
        out['host_loop_s'] = round(time.perf_counter() - t0, 3)
        out['speedup_warm'] = round(out['host_loop_s'] / out['device_warm_s'], 2)
        # agreement: raw mismatches per field, then a tie-aware flip count
        # for the NN rank (mutual-nearest ties have unspecified order under
        # numpy's unstable argsort — ranks_device docstring — so only
        # mismatches among UNTIED nn values are real flips)
        sel = submask & (seg >= 0)
        mism = [
            int((np.abs(d[sel] - hh[sel]) > 1e-12).sum())
            for d, hh in zip(dev, hostr)
        ]
        out['mismatch_frac'] = round(max(mism[:4]) / int(sel.sum()), 6)
        # the four host-key fields share the exact key arrays with the
        # host loop, so any rank mismatch can only be a tied-key
        # permutation (numpy's unstable argsort): assert per-halo rank
        # MULTISETS match and report real flips (should be 0)
        key_flips = 0
        for f in range(4):
            if not mism[f]:
                continue
            for j in range(n_halo):
                sl = slice(ps[j], ps[j] + pn[j])
                m = submask[sl]
                if not np.array_equal(
                    np.sort(dev[f][sl][m]), np.sort(hostr[f][sl][m])
                ):
                    key_flips += 1
        out['key_flips'] = key_flips
        flips_c = 0
        if mism[4]:
            from scipy.spatial import cKDTree

            for j in range(n_halo):
                sl = slice(ps[j], ps[j] + pn[j])
                m = submask[sl]
                if (np.abs(dev[4][sl][m] - hostr[4][sl][m]) <= 1e-12).all():
                    continue
                nn = cKDTree(ppos[sl]).query(ppos[sl][m], k=2)[0][:, 1]
                _, inv, cnt = np.unique(
                    nn, return_inverse=True, return_counts=True
                )
                untied = cnt[inv] == 1
                flips_c += int(
                    (np.abs(dev[4][sl][m][untied] - hostr[4][sl][m][untied])
                     > 1e-12).sum()
                )
                # tied groups must still be permutations of each other
                flips_c += 0 if np.array_equal(
                    np.sort(dev[4][sl][m]), np.sort(hostr[4][sl][m])
                ) else int((~untied).sum())
        out['nn_flips'] = flips_c
        if verbose:
            print(
                f'host loop: {out["host_loop_s"]} s; per-field mismatches '
                f'{mism}; real NN flips {flips_c}',
                flush=True,
            )
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=1_200_000)
    ap.add_argument('--no-host', action='store_true')
    args = ap.parse_args()
    run(args.n, host=not args.no_host)
