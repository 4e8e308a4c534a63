"""A minimal column-store Table with the subset of the astropy.table.Table API
used by the reference package (cf. reference usage in
compaso_halo_catalog.py, read_abacus.py, power_spectrum.py).

Columns are plain numpy arrays (or lazy NDArrayRef handles that materialize on
access). Supports: column get/set, row slicing/masking, add/remove/rename
column, `meta` dict, iteration over colnames, len, and ECSV write/read for the
HOD galaxy-catalog output format (reference GRAND_HOD.py:1698 writes ECSV).
"""

import numpy as np

__all__ = ['Table']


class _Columns(dict):
    def get(self, key, default=None):
        return super().get(key, default)


class Table:
    def __init__(self, data=None, meta=None, copy=True):
        self.columns = _Columns()
        self.meta = dict(meta) if meta else {}
        if data is not None:
            if isinstance(data, Table):
                meta2 = data.meta
                data = {k: data[k] for k in data.colnames}
                self.meta.update(meta2)
            for k, v in data.items():
                self.add_column(v, name=k, copy=copy)

    # -- column API ----------------------------------------------------------
    @property
    def colnames(self):
        return list(self.columns.keys())

    def add_column(self, col, name=None, copy=True):
        if name is None:
            name = f'col{len(self.columns)}'
        arr = np.asarray(col) if not hasattr(col, 'load') else col
        if copy and isinstance(arr, np.ndarray):
            arr = arr.copy()
        self.columns[name] = arr

    def remove_column(self, name):
        del self.columns[name]

    def remove_columns(self, names):
        for n in names:
            self.remove_column(n)

    def rename_column(self, old, new):
        # preserve ordering
        self.columns = _Columns(
            (new if k == old else k, v) for k, v in self.columns.items()
        )

    def replace_column(self, name, col, copy=True):
        if name not in self.columns:
            raise KeyError(name)
        self.columns[name] = np.array(col, copy=copy)

    def update(self, other, copy=True):
        items = other.items() if isinstance(other, dict) else [
            (k, other[k]) for k in other.colnames
        ]
        for k, v in items:
            self.add_column(v, name=k, copy=copy)

    def _materialize(self, name):
        col = self.columns[name]
        if hasattr(col, 'load'):
            col = col.load()
            self.columns[name] = col
        return col

    # -- item access ----------------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return self._materialize(key)
        if isinstance(key, (list, tuple)) and key and isinstance(key[0], str):
            t = Table(meta=self.meta)
            for k in key:
                t.add_column(self._materialize(k), name=k, copy=False)
            return t
        # row slice / mask / fancy index
        t = Table(meta=self.meta)
        for k in self.colnames:
            t.add_column(self._materialize(k)[key], name=k, copy=False)
        return t

    def __setitem__(self, key, value):
        if isinstance(key, str):
            if key in self.columns and not np.isscalar(value):
                self.columns[key] = np.asarray(value)
            elif key in self.columns:
                self._materialize(key)[:] = value
            else:
                self.add_column(value, name=key, copy=False)
        else:
            # row assignment from another table
            if isinstance(value, Table):
                for k in self.colnames:
                    self._materialize(k)[key] = value[k]
            else:
                for k in self.colnames:
                    self._materialize(k)[key] = value

    def __contains__(self, key):
        return key in self.columns

    def __len__(self):
        if not self.columns:
            return 0
        first = next(iter(self.columns.values()))
        return len(first)

    def __iter__(self):
        return iter(self.colnames)

    def keys(self):
        return self.columns.keys()

    def items(self):
        return ((k, self._materialize(k)) for k in self.colnames)

    def __repr__(self):
        cols = ', '.join(
            f'{k}[{getattr(self.columns[k], "dtype", "?")}]' for k in self.colnames
        )
        return f'<Table length={len(self)} cols=({cols})>'

    # -- ECSV ------------------------------------------------------------------
    _ECSV_TYPES = {
        'int8': np.int8, 'int16': np.int16, 'int32': np.int32, 'int64': np.int64,
        'uint8': np.uint8, 'uint16': np.uint16, 'uint32': np.uint32,
        'uint64': np.uint64, 'float32': np.float32, 'float64': np.float64,
        'bool': np.bool_, 'string': 'U32',
    }

    def write(self, fn, format='ascii.ecsv', overwrite=True):
        """Write in the ECSV format astropy uses (subset; scalar columns only)."""
        import yaml as _yaml

        if format != 'ascii.ecsv':
            raise NotImplementedError(format)
        names = self.colnames
        cols = [self._materialize(k) for k in names]
        for k, c in zip(names, cols):
            if c.ndim != 1:
                raise NotImplementedError(f'ECSV write of non-1D column {k}')
        inv = {v: k for k, v in self._ECSV_TYPES.items() if isinstance(v, type)}
        with open(fn, 'w') as f:
            f.write('# %ECSV 1.0\n# ---\n')
            f.write('# datatype:\n')
            for k, c in zip(names, cols):
                tname = inv.get(c.dtype.type, str(c.dtype))
                f.write(f'# - {{name: {k}, datatype: {tname}}}\n')
            if self.meta:
                meta_yaml = _yaml.safe_dump({'meta': _plain(self.meta)}, default_flow_style=False)
                for line in meta_yaml.splitlines():
                    f.write(f'# {line}\n')
            f.write('# schema: astropy-2.0\n')
            f.write(' '.join(names) + '\n')
            stacked = np.rec.fromarrays(cols, names=names)
            fmt = ' '.join(
                '%d' if np.issubdtype(c.dtype, np.integer) else '%.9g'
                if c.dtype == np.float32
                else '%.17g'
                if np.issubdtype(c.dtype, np.floating)
                else '%s'
                for c in cols
            )
            np.savetxt(f, stacked, fmt=fmt)

    @classmethod
    def read(cls, fn, format='ascii.ecsv'):
        import yaml as _yaml

        names, dtypes, meta_lines = [], [], []
        with open(fn) as f:
            lines = f.readlines()
        i = 0
        for i, line in enumerate(lines):
            if not line.startswith('#'):
                break
            # strip '# ' but preserve indentation (meta is nested YAML)
            s = line[1:].removeprefix(' ').rstrip('\n')
            st = s.strip()
            if st.startswith('- {name:'):
                body = _yaml.safe_load(st[2:])
                names.append(body['name'])
                dtypes.append(cls._ECSV_TYPES.get(body['datatype'], body['datatype']))
            elif st and not st.startswith(('%ECSV', '---', 'datatype:', 'schema:')):
                meta_lines.append(s)
        header = lines[i].split()
        assert header == names, (header, names)
        data = np.loadtxt(lines[i + 1 :], dtype=[(n, d) for n, d in zip(names, dtypes)], ndmin=1)
        t = cls({n: data[n] for n in names}, copy=False)
        if meta_lines:
            try:
                m = _yaml.safe_load('\n'.join(meta_lines))
                if isinstance(m, dict) and 'meta' in m:
                    t.meta.update(m['meta'])
            except _yaml.YAMLError:
                pass
        return t


def _plain(obj):
    """Convert numpy scalars/arrays to plain python for YAML metadata."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.generic):
        return obj.item()
    return obj
