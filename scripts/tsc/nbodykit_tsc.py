#!/usr/bin/env python3
"""Regenerate the nbodykit TSC-mesh golden files used by tests/test_tsc.py
(counterpart of reference scripts/tsc/nbodykit_tsc.py).

Requires the optional `nbodykit` package (not a framework dependency);
paints the same deterministic random particle set with nbodykit's TSC
painter and saves the mesh to `nbodykit_tsc_ngrid{N}.asdf`.
"""

import argparse

import numpy as np

from abacusutils_tpu.io.asdf_file import write_asdf


def main(ngrid=256, box=123.0, n=10**5, seed=1234, out=None):
    try:
        from nbodykit.lab import ArrayCatalog
    except ImportError as e:  # pragma: no cover - optional generator
        raise SystemExit(
            'nbodykit is required to regenerate the golden meshes '
            '(pip install nbodykit); the repo tests use the bundled goldens.'
        ) from e

    rng = np.random.default_rng(seed)
    pos = rng.random((n, 3), dtype=np.float32) * box

    cat = ArrayCatalog({'Position': pos})
    mesh = cat.to_mesh(Nmesh=ngrid, BoxSize=box, resampler='tsc').paint()
    # nbodykit paints mean-normalized; store raw counts scale for comparison
    dens = np.asarray(mesh) * (n / ngrid**3)

    fn = out or f'nbodykit_tsc_ngrid{ngrid}.asdf'
    write_asdf(fn, {'data': {'dens': dens}, 'header': {
        'ngrid': ngrid, 'box': box, 'n': n, 'seed': seed, 'resampler': 'tsc',
    }})
    print(f'wrote {fn}')


if __name__ == '__main__':
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--ngrid', type=int, default=256)
    ap.add_argument('--box', type=float, default=123.0)
    ap.add_argument('-n', type=int, default=10**5)
    ap.add_argument('--seed', type=int, default=1234)
    ap.add_argument('-o', '--out')
    main(**vars(ap.parse_args()))
