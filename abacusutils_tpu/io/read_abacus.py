"""Particle-oriented reader for Abacus ASDF files (rvint, pack9, packed PIDs).

Capability-parity with the reference's `abacusnbody.data.read_abacus.read_asdf`
(/root/reference/abacusnbody/data/read_abacus.py:34-212), returning a
:class:`~abacusutils_tpu.io.table.Table` instead of an astropy Table.
"""

import warnings
from os.path import basename

import numpy as np

from .asdf_file import open_asdf
from .bitpacked import unpack_pids, unpack_rvint
from .pack9 import unpack_pack9
from .table import Table

__all__ = ['read_asdf']

ASDF_DATA_KEY = 'data'
ASDF_HEADER_KEY = 'header'


def read_asdf(fn, load=None, colname=None, dtype=np.float32, verbose=True, **kwargs):
    """Read an Abacus ASDF particle file into a Table.

    load: subset of ('pos','vel','pid','lagr_pos','tagged','density',
    'lagr_idx','aux'); colname: 'rvint'/'pack9'/'packedpid'/'pid' (auto-detected
    by default).
    """
    data_key = kwargs.get('data_key', ASDF_DATA_KEY)
    header_key = kwargs.get('header_key', ASDF_HEADER_KEY)

    with open_asdf(fn, lazy_load=True) as af:
        if colname is None:
            _colnames = ['rvint', 'pack9', 'packedpid', 'pid']
            for cn in _colnames:
                if cn in af.tree[data_key]:
                    if colname is not None:
                        raise ValueError(
                            f'More than one key of {_colnames} found in asdf file {fn}. '
                            'Need to specify colname!'
                        )
                    colname = cn
            if colname is None:
                raise ValueError(
                    f'Could not find any of {_colnames} in asdf file {fn}. '
                    'Need to specify colname!'
                )

        load = _resolve_columns(colname, load, kwargs)

        header = af.tree[header_key]
        data = np.asarray(af.tree[data_key][colname])

        Nmax = len(data)

        # light cone files contain both A and B subsamples
        OutputType = header.get('OutputType', None)
        if OutputType == 'LightCone':
            if header['SimSet'] == 'AbacusSummit':
                SubsampleFraction = (
                    header['ParticleSubsampleA'] + header['ParticleSubsampleB']
                )
                header['SubsampleFraction'] = SubsampleFraction
                if verbose:
                    print(
                        f'Loading "{basename(fn)}", which contains the A and B '
                        f'subsamples ({int(SubsampleFraction * 100):d}% total)'
                    )

        table = Table(meta=header)
        if 'pos' in load:
            table.add_column(np.empty((Nmax, 3), dtype=dtype), copy=False, name='pos')
        if 'vel' in load:
            table.add_column(np.empty((Nmax, 3), dtype=dtype), copy=False, name='vel')
        if 'aux' in load:
            table.add_column(data, copy=False, name='aux')

        if colname == 'rvint':
            _posout = table['pos'] if 'pos' in load else False
            _velout = table['vel'] if 'vel' in load else False
            npos, nvel = unpack_rvint(
                data, header['BoxSize'], float_dtype=dtype, posout=_posout, velout=_velout
            )
            nread = max(npos, nvel)
        elif colname == 'pack9':
            _posout = table['pos'] if 'pos' in load else False
            _velout = table['vel'] if 'vel' in load else False
            npos, nvel = unpack_pack9(
                data,
                header['BoxSize'],
                header['VelZSpace_to_kms'],
                float_dtype=dtype,
                posout=_posout,
                velout=_velout,
            )
            nread = max(npos, nvel)
        elif 'pid' in colname:
            ppd = kwargs.get('ppd', int(round(header['ppd'])))
            pid_kwargs = {
                k: (k in load)
                for k in ('pid', 'lagr_pos', 'tagged', 'density', 'lagr_idx')
            }
            cols = unpack_pids(
                data, box=header['BoxSize'], ppd=ppd, float_dtype=dtype, **pid_kwargs
            )
            for n, col in cols.items():
                table.add_column(col, name=n, copy=False)
            nread = len(data)

    return table[:nread]


def _resolve_columns(colname, load, kwargs):
    """Default column selection given the file's data column
    (reference read_abacus.py:181-212)."""
    load_pos = kwargs.pop('load_pos', None)
    load_vel = kwargs.pop('load_vel', None)
    if load_pos is not None or load_vel is not None:
        if load is None:
            warnings.warn(
                '`load_pos` and `load_vel` are deprecated; use `load=("pos","vel")`.',
                FutureWarning,
            )
            load = []
            if load_pos or (load_pos is None and load_vel is False):
                load += ['pos']
            if load_vel or (load_vel is None and load_pos is False):
                load += ['vel']
        else:
            warnings.warn(
                '`load` and deprecated `load_pos`/`load_vel` specified. '
                'Ignoring deprecated parameters.'
            )

    if load is None:
        load = []
        if colname in ('pack9', 'rvint'):
            load += ['pos', 'vel']
        if 'pid' in colname:
            load += ['pid']
    return tuple(load)
