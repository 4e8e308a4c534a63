#!/usr/bin/env python
"""Generate a vendored AbacusSummit metadata bundle.

The only metadata data product shipped with the reference checkout is the
DESI2 file; AbacusSummit entries are synthesized at runtime from a
same-cosmology DESI2 donor (see abacusutils_tpu/metadata/__init__.py).
This script bakes that synthesis into a bundle for the most commonly used
Summit boxes so standalone installs resolve them without the donor hop.
Entries keep the ``_synthesized_from`` marker so per-redshift state is
still derived from the GrowthTable on demand.

Usage: python scripts/metadata/make_summit_bundle.py [outfile]
"""

import sys
from pathlib import Path

import msgpack
import numpy as np


def main(outfn=None):
    import abacusutils_tpu.metadata as meta_mod
    from abacusutils_tpu.io.asdf_file import write_asdf

    pkg_dir = Path(meta_mod.__file__).parent
    outfn = Path(outfn or pkg_dir / 'abacussummit_headers_compressed.asdf')

    sims = [
        'AbacusSummit_base_c000_ph000',
        'AbacusSummit_base_c000_ph006',
        'AbacusSummit_highbase_c000_ph100',
        'AbacusSummit_hugebase_c000_ph000',
        'AbacusSummit_huge_c000_ph201',
        'AbacusSummit_high_c000_ph100',
        'AbacusSummit_small_c000_ph3000',
    ]

    tree = {}
    want_class = True  # full CLASS table only on the first entry (shared cosmology)
    for sim in sims:
        meta_mod.get_meta(sim)  # populates the registry via donor synthesis
        entry = meta_mod.metadata[sim]
        rec = {
            'param': np.frombuffer(msgpack.dumps(entry['param']), dtype=np.uint8),
            'state': np.frombuffer(msgpack.dumps({}), dtype=np.uint8),
        }
        if want_class and 'CLASS_power_spectrum' in entry:
            rec['CLASS_power_spectrum'] = {
                k: np.ascontiguousarray(v)
                for k, v in entry['CLASS_power_spectrum'].items()
            }
            want_class = False
        tree[sim] = rec

    write_asdf(str(outfn), tree, compression='blsc')
    print(f'wrote {outfn} ({outfn.stat().st_size} bytes, {len(sims)} sims)')


if __name__ == '__main__':
    main(*sys.argv[1:2])
