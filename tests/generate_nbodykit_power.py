#!/usr/bin/env python3
"""Regenerate the nbodykit P(k,mu)/P_ell golden file for the statistical
power-spectrum comparison (counterpart of reference
tests/generate_nbodykit_power.py, which saves k/power/modes/power_ell via
nbodykit's FFTPower on `test_pos.npz` positions).

Requires the optional `nbodykit` package. The reference checkout ships the
resulting `nbodykit_power.npz` golden but not the `test_pos.npz` inputs, so
this generator first creates and saves a deterministic particle set; runs
against an existing test_pos.npz when present.
"""

import argparse
from pathlib import Path

import numpy as np

LBOX = 1000.0
NMESH = 72
NBINS_K = NMESH // 2
NBINS_MU = 4
POLES = (0, 2, 4)


def main(out='nbodykit_power.npz', posfile='test_pos.npz', n=10**6, seed=300):
    try:
        from nbodykit.lab import ArrayCatalog, FFTPower
    except ImportError as e:  # pragma: no cover - optional generator
        raise SystemExit(
            'nbodykit is required to regenerate the golden spectra '
            '(pip install nbodykit); the repo tests use analytic checks '
            'plus the bundled reference goldens.'
        ) from e

    if Path(posfile).is_file():
        pos = np.load(posfile)['pos']
    else:
        rng = np.random.default_rng(seed)
        pos = (rng.random((n, 3)) * LBOX).astype(np.float32)
        np.savez(posfile, pos=pos)

    cat = ArrayCatalog({'Position': pos})
    mesh = cat.to_mesh(
        Nmesh=NMESH, BoxSize=LBOX, resampler='tsc', compensated=True,
        interlaced=True, position='Position',
    )
    dk = 2 * np.pi / LBOX
    kmax = np.pi * NMESH / LBOX + 1e-6
    r = FFTPower(
        mesh, mode='2d', Nmu=NBINS_MU, poles=list(POLES),
        dk=(kmax - dk / 2) / NBINS_K, kmin=dk / 2, kmax=kmax, los=[0, 0, 1],
    )
    k = r.power['k']
    power = r.power['power'].real - r.attrs['shotnoise']
    modes = r.power['modes']
    power_ell = np.stack(
        [
            r.poles[f'power_{ell}'].real - (r.attrs['shotnoise'] if ell == 0 else 0)
            for ell in POLES
        ]
    )
    np.savez(out, k=k, power=power, modes=modes, power_ell=power_ell)
    print(f'wrote {out}')


if __name__ == '__main__':
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('-o', '--out', default='nbodykit_power.npz')
    ap.add_argument('--posfile', default='test_pos.npz')
    main(**vars(ap.parse_args()))
