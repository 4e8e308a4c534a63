"""Particle-file readers for Abacus ASDF outputs (rvint / pack9 / packed PID).

Behavior parity with the reference's ``abacusnbody.data.read_abacus``
(/root/reference/abacusnbody/data/read_abacus.py:34-212), re-designed around
a declarative format registry in the style of :mod:`~abacusutils_tpu.io.compaso`'s
FieldSpec table. Decoding happens on host into preallocated numpy buffers;
downstream device code consumes the resulting SoA float arrays.
"""

import warnings
from os.path import basename

import numpy as np

from .asdf_file import open_asdf
from .bitpacked import unpack_pids, unpack_rvint
from .pack9 import unpack_pack9
from .table import Table

__all__ = ['read_asdf']

# Logical fields a packed-PID column can expand into.
_PID_FIELDS = ('pid', 'lagr_pos', 'tagged', 'density', 'lagr_idx')

# Raw on-disk column name -> default field selection when `load` is omitted.
# 'aux' (the raw packed words) is additionally requestable for every format.
_FORMAT_REGISTRY = {
    'rvint': ('pos', 'vel'),
    'pack9': ('pos', 'vel'),
    'packedpid': ('pid',),
    'pid': ('pid',),
}


def read_asdf(fn, load=None, colname=None, dtype=np.float32, verbose=True, **kwargs):
    """Decode one Abacus particle ASDF file into a Table.

    Parameters mirror the reference API: ``load`` selects logical fields
    (subset of pos/vel/pid/lagr_pos/tagged/density/lagr_idx/aux), ``colname``
    names the raw data column when auto-detection is ambiguous, ``dtype`` is
    the float width for decoded positions/velocities. ``data_key`` /
    ``header_key`` / ``ppd`` are accepted as keyword overrides.
    """
    tree_data_key = kwargs.get('data_key', 'data')
    tree_header_key = kwargs.get('header_key', 'header')

    with open_asdf(fn, lazy_load=True) as af:
        blobs = af.tree[tree_data_key]
        column = _pick_column(blobs, colname, fn)
        fields = _select_fields(column, load, kwargs)

        header = af.tree[tree_header_key]
        _annotate_lightcone(header, fn, verbose)

        packed = np.asarray(blobs[column])
        n_stored = len(packed)

        cols = {}
        if column in ('rvint', 'pack9'):
            # Decoders fill caller-owned buffers and report how many rows of
            # the (possibly over-allocated) blob were real particles.
            pos = np.empty((n_stored, 3), dtype=dtype) if 'pos' in fields else False
            vel = np.empty((n_stored, 3), dtype=dtype) if 'vel' in fields else False
            if column == 'rvint':
                counts = unpack_rvint(
                    packed, header['BoxSize'], float_dtype=dtype, posout=pos, velout=vel
                )
            else:
                counts = unpack_pack9(
                    packed,
                    header['BoxSize'],
                    header['VelZSpace_to_kms'],
                    float_dtype=dtype,
                    posout=pos,
                    velout=vel,
                )
            n_valid = max(counts)
            if 'pos' in fields:
                cols['pos'] = pos
            if 'vel' in fields:
                cols['vel'] = vel
        elif 'pid' in column:
            ppd = kwargs.get('ppd', int(round(header['ppd'])))
            wanted = {f: (f in fields) for f in _PID_FIELDS}
            cols.update(
                unpack_pids(
                    packed, box=header['BoxSize'], ppd=ppd, float_dtype=dtype, **wanted
                )
            )
            n_valid = n_stored
        else:
            raise ValueError(f'{fn}: no decoder for data column {column!r}')

        if 'aux' in fields:
            cols['aux'] = packed

    out = Table(meta=header)
    for name, arr in cols.items():
        out.add_column(arr, name=name, copy=False)
    return out[:n_valid]


def _pick_column(blobs, requested, fn):
    """Resolve which raw data column to decode, auto-detecting if needed."""
    if requested is not None:
        return requested
    hits = [c for c in _FORMAT_REGISTRY if c in blobs]
    if len(hits) == 1:
        return hits[0]
    known = tuple(_FORMAT_REGISTRY)
    if not hits:
        raise ValueError(
            f'{fn}: found none of the known data columns {known}; pass colname='
        )
    raise ValueError(f'{fn}: multiple candidate data columns {hits}; pass colname=')


def _select_fields(column, load, kwargs):
    """Normalize the requested field set, honoring the deprecated
    load_pos/load_vel switches and per-format defaults."""
    lp = kwargs.pop('load_pos', None)
    lv = kwargs.pop('load_vel', None)
    if lp is not None or lv is not None:
        if load is not None:
            warnings.warn(
                'Both `load` and deprecated `load_pos`/`load_vel` given; '
                'the deprecated switches are ignored.'
            )
        else:
            warnings.warn(
                '`load_pos`/`load_vel` are deprecated; use load=("pos","vel").',
                FutureWarning,
            )
            # Each switch defaults on when the *other* one is explicitly off.
            load = []
            if lp or (lp is None and lv is False):
                load.append('pos')
            if lv or (lv is None and lp is False):
                load.append('vel')

    if load is None:
        if column in _FORMAT_REGISTRY:
            load = _FORMAT_REGISTRY[column]
        elif 'pid' in column:
            load = ('pid',)
        else:
            load = ('pos', 'vel')
    return tuple(load)


def _annotate_lightcone(header, fn, verbose):
    """Light cone outputs store A+B subsamples in one file; record the
    combined fraction in the header like the reference does."""
    if header.get('OutputType', None) != 'LightCone':
        return
    if header.get('SimSet', None) == 'AbacusSummit':
        frac = header['ParticleSubsampleA'] + header['ParticleSubsampleB']
        header['SubsampleFraction'] = frac
        if verbose:
            print(
                f'Loading "{basename(fn)}" (light cone: A+B subsamples, '
                f'{int(frac * 100):d}% of particles)'
            )
