#!/usr/bin/env python3
"""Compare calc_power against nbodykit's FFTPower on the same particles
(counterpart of reference scripts/power/nbodykit_power.py). Requires the
optional `nbodykit` package; the test suite instead uses analytic
single-mode checks plus the bundled reference goldens."""

import argparse

import numpy as np


def main(n=10**6, nmesh=128, box=1000.0):
    try:
        from nbodykit.lab import ArrayCatalog, FFTPower
    except ImportError as e:  # pragma: no cover - optional comparison
        raise SystemExit('nbodykit is required for this comparison script.') from e

    from abacusutils_tpu.ops.power import calc_power

    rng = np.random.default_rng(300)
    pos = (rng.random((n, 3)) * box).astype(np.float32)

    res = calc_power(
        pos, box, nmesh=nmesh, paste='TSC', compensated=True, interlaced=True
    )

    cat = ArrayCatalog({'Position': pos})
    mesh = cat.to_mesh(
        Nmesh=nmesh, BoxSize=box, resampler='tsc', compensated=True,
        interlaced=True,
    )
    dk = 2 * np.pi / box
    r = FFTPower(
        mesh, mode='1d', dk=dk, kmin=dk / 2, kmax=np.pi * nmesh / box + 1e-6
    )
    pk_nb = r.power['power'].real - r.attrs['shotnoise']
    pk = np.asarray(res['power']).ravel() - box**3 / n

    ok = np.isfinite(pk_nb) & (np.asarray(r.power['modes']) > 0)
    frac = np.abs(pk[ok] / pk_nb[ok] - 1)
    print(f'mean |frac diff| = {frac.mean():.2e}, max = {frac.max():.2e}')


if __name__ == '__main__':
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('-n', type=int, default=10**6)
    ap.add_argument('--nmesh', type=int, default=128)
    ap.add_argument('--box', type=float, default=1000.0)
    main(**vars(ap.parse_args()))
