#!/usr/bin/env python3
"""Gather per-simulation headers into a metadata ASDF.

Counterpart of the reference scripts/metadata/gather_metadata.py (which
walks the NERSC AbacusSummit tree and reads each sim's IC-file header for
the growth tables and linear P(k)). This version walks a local simulation
root: for every `<root>/<SimName>/`, it reads

- `abacus.par` or any `header` ASDF tree (param: the simulation parameters,
  including GrowthTable / CLASS_power_spectrum when present), and
- per-redshift `halos/z*/header` state headers (state: z-slice quantities),

and writes `<out>.asdf` with one `{param, state}` record per sim, ready for
compress.py.

Usage: gather_metadata.py SIMROOT -o abacussummit_headers.asdf
"""

import argparse
from pathlib import Path

from abacusutils_tpu.io.asdf_file import open_asdf, write_asdf


def read_header_tree(path):
    """Read an ASDF header file's tree as a plain dict (no binary blocks)."""
    af = open_asdf(path)
    tree = dict(af.tree)
    tree.pop('asdf_library', None)
    tree.pop('history', None)
    return tree


def gather_sim(simdir):
    rec = {}
    # parameters: prefer an explicit header ASDF at the sim root
    for cand in ('header.asdf', 'abacus.par.asdf', 'header'):
        p = simdir / cand
        if p.is_file():
            rec['param'] = read_header_tree(p)
            break
    # states: one per redshift from the halo catalog headers
    states = {}
    for zdir in sorted(simdir.glob('halos/z*')):
        hdr = zdir / 'header'
        if not hdr.is_file():
            infos = sorted(zdir.glob('halo_info/halo_info_*.asdf'))
            if not infos:
                continue
            tree = read_header_tree(infos[0])
            states[zdir.name] = tree.get('header', tree)
        else:
            states[zdir.name] = read_header_tree(hdr)
        if 'param' not in rec:
            rec['param'] = dict(states[zdir.name])
    if states:
        rec['state'] = states
    return rec


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('simroot', type=Path)
    ap.add_argument('-o', '--output', default='headers.asdf')
    args = ap.parse_args()

    tree = {}
    for simdir in sorted(args.simroot.glob('Abacus*')):
        if not simdir.is_dir():
            continue
        rec = gather_sim(simdir)
        if rec:
            tree[simdir.name] = rec
            print(f'{simdir.name}: param={bool(rec.get("param"))} '
                  f'states={len(rec.get("state", {}))}')
    write_asdf(args.output, tree)
    print(f'wrote {len(tree)} sims to {args.output}')


if __name__ == '__main__':
    main()
