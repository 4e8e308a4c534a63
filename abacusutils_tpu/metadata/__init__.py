"""Per-simulation metadata registry: cosmology + code parameters + state.

Same contract as the reference `abacusnbody.metadata.get_meta`
(/root/reference/abacusnbody/metadata/__init__.py:13-38, abacussummit.py:23-82):
msgpack-compressed per-sim `param`/`state` tables and the CLASS linear power
spectrum, bundled in ASDF files.

The metadata bundles are *data products* (not code); they are searched for in:
1. `$ABACUS_METADATA_DIR`
2. this package directory
3. the reference checkout's `abacusnbody/metadata` (read-only), if present
"""

import os
from pathlib import Path

import msgpack
import numpy as np

from ..io.asdf_file import open_asdf

__all__ = ['get_meta']

metadata = None
metadata_fns = [
    'abacussummit_headers_compressed.asdf',
    'abacusdesi2_headers_compressed.asdf',
]

_SEARCH_DIRS = [
    os.environ.get('ABACUS_METADATA_DIR'),
    str(Path(__file__).parent),
    '/root/reference/abacusnbody/metadata',
]


def _load_all():
    global metadata
    metadata = {}
    found_any = False
    for d in _SEARCH_DIRS:
        if not d or not Path(d).is_dir():
            continue
        for fn in metadata_fns:
            p = Path(d) / fn
            if not p.is_file():
                continue
            found_any = True
            af = open_asdf(p)
            tree = dict(af.tree)
            tree.pop('asdf_library', None)
            tree.pop('history', None)
            for sim, rec in tree.items():
                if sim in metadata:
                    continue
                entry = {
                    'param': msgpack.loads(
                        np.asarray(rec['param']).tobytes(), strict_map_key=False
                    ),
                    'state': msgpack.loads(
                        np.asarray(rec['state']).tobytes(), strict_map_key=False
                    ),
                }
                if 'CLASS_power_spectrum' in rec:
                    entry['CLASS_power_spectrum'] = rec['CLASS_power_spectrum']
                metadata[sim] = entry
        if found_any:
            # first dir that has files wins for those sims; keep scanning
            # remaining dirs to pick up sims they don't cover
            continue
    if not metadata:
        raise FileNotFoundError(
            f'No metadata bundles {metadata_fns} found in search dirs '
            f'{[d for d in _SEARCH_DIRS if d]}. Set $ABACUS_METADATA_DIR.'
        )


def get_meta(simname, redshift=None):
    """Get the (time-independent, and optionally per-redshift state) metadata
    for a simulation by name."""
    if not simname.startswith('Abacus'):
        raise ValueError(
            f'It is unknown what simulation set "{simname}" belongs to '
            'based on the simulation name.'
        )

    global metadata
    if metadata is None:
        _load_all()

    if simname not in metadata:
        raise ValueError(
            f'Simulation "{simname}" is not in metadata files "{metadata_fns}"'
        )

    res = dict(metadata[simname]['param'])
    if 'CLASS_power_spectrum' in metadata[simname]:
        res['CLASS_power_spectrum'] = metadata[simname]['CLASS_power_spectrum']

    if redshift is not None:
        if not isinstance(redshift, str):
            redshift = f'z{redshift:.3f}'
        if not redshift.startswith('z'):
            redshift = 'z' + redshift
        if redshift not in metadata[simname]['state']:
            raise ValueError(
                f'Redshift {redshift} metadata not present for "{simname}" '
                f'in metadata files "{metadata_fns}"'
            )
        res.update(metadata[simname]['state'][redshift])

    return res
