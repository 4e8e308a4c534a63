#!/usr/bin/env python3
"""Compress a gathered metadata ASDF into the registry format.

Counterpart of the reference scripts/metadata/compress.py: each sim's
`param`/`state` dicts are packed with msgpack into uint8 arrays (which the
ASDF blosc blocks then compress), producing the
`*_headers_compressed.asdf` bundles that `abacusutils_tpu.metadata.get_meta`
reads.

Usage: compress.py headers.asdf -o abacussummit_headers_compressed.asdf
         [--rmstate] [--rmpk]
"""

import argparse

import msgpack
import numpy as np

from abacusutils_tpu.io.asdf_file import open_asdf, write_asdf


def _plain(obj):
    """Make a tree msgpack-serializable (numpy scalars/arrays -> python)."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('input')
    ap.add_argument('-o', '--output', required=True)
    ap.add_argument('--rmstate', action='store_true',
                    help='drop per-z states (smaller bundle)')
    ap.add_argument('--rmpk', action='store_true',
                    help='drop CLASS_power_spectrum tables')
    args = ap.parse_args()

    af = open_asdf(args.input)
    tree = dict(af.tree)
    tree.pop('asdf_library', None)
    tree.pop('history', None)

    out = {}
    for sim, rec in tree.items():
        param = _plain(rec.get('param', {}))
        pk = param.pop('CLASS_power_spectrum', None)
        entry = {
            'param': np.frombuffer(msgpack.dumps(param), dtype=np.uint8),
            'state': np.frombuffer(
                msgpack.dumps({} if args.rmstate else _plain(rec.get('state', {}))),
                dtype=np.uint8,
            ),
        }
        if pk is not None and not args.rmpk:
            entry['CLASS_power_spectrum'] = {
                k: np.asarray(v) for k, v in pk.items()
            }
        out[sim] = entry

    write_asdf(args.output, out)
    print(f'wrote {len(out)} compressed sim records to {args.output}')


if __name__ == '__main__':
    main()
