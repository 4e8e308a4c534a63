"""Minimal ASDF container reader/writer, implemented from the ASDF format spec.

Replaces the reference's dependency on the `asdf` package (and its Blosc
extension, /root/reference/abacusnbody/data/asdf.py) with a self-contained
implementation sufficient for Abacus data products:

- YAML tree with `!core/ndarray-1.0.0` nodes resolved lazily against binary
  blocks (`lazy_load` semantics).
- Binary blocks with optional `blsc` compression (see
  :mod:`abacusutils_tpu.io.blosc`); `zlib` also supported.
- astropy table tags (`tag:astropy.org:astropy/table/table-*`) are mapped to
  :class:`abacusutils_tpu.io.table.Table` on read, so golden test files
  written by the reference can be consumed without astropy.

File layout (ASDF standard 1.x):

    #ASDF 1.0.0
    #ASDF_STANDARD 1.5.0
    %YAML 1.1
    %TAG ! tag:stsci.edu:asdf/
    --- !core/asdf-1.1.0
    <tree>
    ...
    <binary blocks>  each: d3 42 4c 4b ("\\xd3BLK"), u16be header_size,
                     header = u32be flags, 4-byte compression label,
                     u64be allocated_size, u64be used_size, u64be data_size,
                     16-byte md5; then `used_size` bytes of data.
    [#ASDF BLOCK INDEX ...]  (ignored on read, written for compat)
"""

import hashlib
import io
import re
import struct
import zlib

import numpy as np
import yaml

from .blosc import ChunkedBloscDecoder
from .table import Table

__all__ = ['AsdfFile', 'open_asdf', 'write_asdf', 'set_nthreads']

BLOCK_MAGIC = b'\xd3BLK'
INDEX_MAGIC = b'#ASDF BLOCK INDEX'

_DTYPES = {
    'int8': np.int8,
    'int16': np.int16,
    'int32': np.int32,
    'int64': np.int64,
    'uint8': np.uint8,
    'uint16': np.uint16,
    'uint32': np.uint32,
    'uint64': np.uint64,
    'float32': np.float32,
    'float64': np.float64,
    'bool8': np.bool_,
    'complex64': np.complex64,
    'complex128': np.complex128,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}

_NTHREADS = 4


def set_nthreads(nthreads):
    """Number of threads used for block decompression (blosc chunks decode in
    parallel; zstd releases the GIL). Mirrors the reference's
    `abacusnbody.data.asdf.set_nthreads`."""
    global _NTHREADS
    _NTHREADS = max(1, int(nthreads))


class _Tagged:
    """A YAML node with an unrecognized application tag."""

    __slots__ = ('tag', 'value')

    def __init__(self, tag, value):
        self.tag = tag
        self.value = value

    def __repr__(self):
        return f'_Tagged({self.tag!r}, {self.value!r})'


def _make_loader():
    class Loader(yaml.SafeLoader):
        pass

    def construct_tagged(loader, tag_suffix, node):
        if isinstance(node, yaml.MappingNode):
            value = loader.construct_mapping(node, deep=True)
        elif isinstance(node, yaml.SequenceNode):
            value = loader.construct_sequence(node, deep=True)
        else:
            value = loader.construct_scalar(node)
        return _Tagged(tag_suffix, value)

    Loader.add_multi_constructor('tag:stsci.edu:asdf/', construct_tagged)
    Loader.add_multi_constructor('tag:astropy.org:astropy/', construct_tagged)
    Loader.add_multi_constructor('!', construct_tagged)
    return Loader


_Loader = _make_loader()


class NDArrayRef:
    """Lazy handle to an ndarray stored in an ASDF binary block."""

    def __init__(self, info, asdf_file):
        self._info = info
        self._af = asdf_file
        self.shape = tuple(info.get('shape', ()))
        dt = np.dtype(_DTYPES[info['datatype']])
        if info.get('byteorder', 'little') == 'big':
            dt = dt.newbyteorder('>')
        self.dtype = dt
        self._data = None

    def __len__(self):
        return self.shape[0] if self.shape else 0

    @property
    def ndim(self):
        return len(self.shape)

    def load(self):
        if self._data is None:
            raw = self._af._read_block(self._info['source'])
            offset = self._info.get('offset', 0)
            count = int(np.prod(self.shape, dtype=np.int64)) if self.shape else 1
            arr = np.frombuffer(raw, dtype=self.dtype, count=count, offset=offset)
            self._data = arr.reshape(self.shape)
        return self._data

    def __array__(self, dtype=None, copy=None):
        a = self.load()
        if dtype is not None:
            a = a.astype(dtype, copy=False)
        return a

    def __getitem__(self, idx):
        return self.load()[idx]


def _resolve(node, af):
    """Recursively resolve _Tagged wrappers into python/numpy objects."""
    if isinstance(node, _Tagged):
        tag = node.tag
        if 'core/ndarray' in tag:
            if isinstance(node.value, list):
                # inline ndarray
                return np.array(node.value)
            return NDArrayRef(node.value, af)
        if re.search(r'table/table-', tag):
            cols = {}
            for col in node.value.get('columns', []):
                cv = _resolve(col, af)
                if isinstance(cv, dict):
                    cols[cv['name']] = cv['data']
            t = Table(cols, copy=False)
            meta = node.value.get('meta')
            if meta:
                t.meta.update(_resolve(meta, af))
            return t
        if re.search(r'table/column', tag):
            return {k: _resolve(v, af) for k, v in node.value.items()}
        return _resolve(node.value, af)
    if isinstance(node, dict):
        return {k: _resolve(v, af) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(v, af) for v in node]
    return node


class AsdfFile:
    """Read-only view of an ASDF file with lazy block loading."""

    def __init__(self, fn, lazy_load=True, memmap=False, nthreads=None):
        self._fn = fn
        self._fp = open(fn, 'rb')
        self._nthreads = nthreads or _NTHREADS
        self._block_cache = {}
        self._parse()
        if not lazy_load:
            for i in range(len(self._blocks)):
                self._read_block(i)

    # -- container parsing --------------------------------------------------
    def _parse(self):
        fp = self._fp
        data = fp.read()
        self._raw = data
        end = data.find(b'\n...')
        if end == -1:
            yaml_src = data
            blk = data.find(BLOCK_MAGIC)
            yaml_src = data[:blk] if blk >= 0 else data
            pos = blk
        else:
            # include the "..." end-of-document marker line
            nl = data.find(b'\n', end + 1)
            yaml_src = data[: nl + 1 if nl >= 0 else len(data)]
            pos = nl + 1
        tree = yaml.load(yaml_src.decode('utf-8'), Loader=_Loader)
        if isinstance(tree, _Tagged):
            tree = tree.value

        # find binary blocks
        self._blocks = []
        n = len(data)
        while 0 <= pos < n:
            # skip padding up to next magic
            next_magic = data.find(BLOCK_MAGIC, pos)
            if next_magic == -1:
                break
            pos = next_magic
            (hsize,) = struct.unpack_from('>H', data, pos + 4)
            hdr = data[pos + 6 : pos + 6 + hsize]
            flags = struct.unpack_from('>I', hdr, 0)[0]
            compression = hdr[4:8]
            alloc, used, dsize = struct.unpack_from('>QQQ', hdr, 8)
            data_start = pos + 6 + hsize
            self._blocks.append(
                dict(
                    flags=flags,
                    compression=compression.rstrip(b'\x00').decode() or None,
                    allocated=alloc,
                    used=used,
                    data_size=dsize,
                    offset=data_start,
                )
            )
            pos = data_start + alloc

        self.tree = _resolve(tree, self)

    def _read_block(self, i):
        if i in self._block_cache:
            return self._block_cache[i]
        b = self._blocks[i]
        raw = self._raw[b['offset'] : b['offset'] + b['used']]
        comp = b['compression']
        if comp is None:
            out = np.frombuffer(raw, dtype=np.uint8)
        elif comp == 'blsc':
            out = np.empty(b['data_size'], dtype=np.uint8)
            ChunkedBloscDecoder(self._nthreads).decompress(raw, out)
        elif comp == 'zlib':
            out = np.frombuffer(zlib.decompress(raw), dtype=np.uint8)
        else:
            raise NotImplementedError(f'block compression {comp!r}')
        self._block_cache[i] = out
        return out

    # -- dict-like access ---------------------------------------------------
    def __getitem__(self, key):
        return self.tree[key]

    def __contains__(self, key):
        return key in self.tree

    def keys(self):
        return self.tree.keys()

    def close(self):
        if self._fp is not None:
            self._fp.close()
            self._fp = None
        self._raw = None
        self._block_cache.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_asdf(fn, lazy_load=True, memmap=False, **kwargs):
    return AsdfFile(fn, lazy_load=lazy_load, memmap=memmap, **kwargs)


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


class _NDArrayMarker:
    def __init__(self, source, datatype, shape):
        self.source = source
        self.datatype = datatype
        self.shape = shape


class _ColumnMarker:
    def __init__(self, name, data):
        self.name = name
        self.data = data


class _TableMarker:
    def __init__(self, columns, meta):
        self.columns = columns  # list of _ColumnMarker
        self.meta = meta


def _yaml_represent_ndarray_marker(dumper, m):
    return dumper.represent_mapping(
        '!core/ndarray-1.0.0',
        {
            'source': m.source,
            'datatype': m.datatype,
            'byteorder': 'little',
            'shape': list(m.shape),
        },
    )


class _Dumper(yaml.SafeDumper):
    pass


def _yaml_represent_table_marker(dumper, t):
    return dumper.represent_mapping(
        'tag:astropy.org:astropy/table/table-1.0.0',
        {'columns': t.columns, 'meta': t.meta, 'qtable': False},
    )


def _yaml_represent_column_marker(dumper, c):
    return dumper.represent_mapping(
        'tag:astropy.org:astropy/table/column-1.0.0',
        {'data': c.data, 'name': c.name},
    )


_Dumper.add_representer(_NDArrayMarker, _yaml_represent_ndarray_marker)
_Dumper.add_representer(_TableMarker, _yaml_represent_table_marker)
_Dumper.add_representer(_ColumnMarker, _yaml_represent_column_marker)
# numpy scalars in headers
for _t in (np.float32, np.float64):
    _Dumper.add_representer(_t, lambda d, v: d.represent_float(float(v)))
for _t in (np.int8, np.int16, np.int32, np.int64, np.uint8, np.uint16, np.uint32, np.uint64):
    _Dumper.add_representer(_t, lambda d, v: d.represent_int(int(v)))
_Dumper.add_representer(np.bool_, lambda d, v: d.represent_bool(bool(v)))


def _extract_arrays(tree, arrays):
    """Replace ndarrays in the tree with _NDArrayMarker placeholders."""
    if isinstance(tree, Table):
        # serialize with the astropy table tags so the file reads back as a
        # Table (with meta) here and opens in stock asdf/astropy as well
        return _TableMarker(
            [_ColumnMarker(k, _extract_arrays(tree[k], arrays)) for k in tree.colnames],
            _extract_arrays(dict(tree.meta), arrays),
        )
    if isinstance(tree, dict):
        return {k: _extract_arrays(v, arrays) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_extract_arrays(v, arrays) for v in tree]
    if isinstance(tree, (np.ndarray, NDArrayRef)):
        arr = np.ascontiguousarray(np.asarray(tree))
        arr = arr.astype(arr.dtype.newbyteorder('<'), copy=False)
        src = len(arrays)
        arrays.append(arr)
        return _NDArrayMarker(src, _DTYPE_NAMES[arr.dtype.newbyteorder('=')], arr.shape)
    return tree


def write_asdf(fn, tree, compression=None, nthreads=None, clevel=1, shuffle=True):
    """Write `tree` (nested dicts/lists/ndarrays/Tables) to an ASDF file.

    compression: None or 'blsc' (zstd+shuffle blosc chunks, the Abacus format,
    cf. reference ic_fields.compress_asdf usage).
    """
    arrays = []
    marked = _extract_arrays(tree, arrays)

    yaml_body = yaml.dump(
        marked,
        Dumper=_Dumper,
        default_flow_style=None,
        sort_keys=False,
        allow_unicode=True,
        width=100,
    )

    buf = io.BytesIO()
    buf.write(b'#ASDF 1.0.0\n#ASDF_STANDARD 1.5.0\n')
    buf.write(b'%YAML 1.1\n%TAG ! tag:stsci.edu:asdf/\n--- !core/asdf-1.1.0\n')
    buf.write(yaml_body.encode())
    buf.write(b'...\n')

    block_offsets = []
    for arr in arrays:
        raw = arr.view(np.uint8).reshape(-1)
        if compression == 'blsc':
            payload = ChunkedBloscDecoder(nthreads or _NTHREADS).compress(
                raw, arr.dtype.itemsize, clevel=clevel, shuffle=shuffle
            )
            comp_label = b'blsc'
        elif compression is None:
            payload = raw.tobytes()
            comp_label = b'\x00\x00\x00\x00'
        else:
            raise ValueError(f'unknown compression {compression!r}')
        md5 = hashlib.md5(raw.tobytes()).digest()
        block_offsets.append(buf.tell())
        buf.write(BLOCK_MAGIC)
        hdr = (
            struct.pack('>I', 0)
            + comp_label
            + struct.pack('>QQQ', len(payload), len(payload), raw.nbytes)
            + md5
        )
        buf.write(struct.pack('>H', len(hdr)))
        buf.write(hdr)
        buf.write(payload)

    if block_offsets:
        buf.write(INDEX_MAGIC + b'\n')
        buf.write(b'%YAML 1.1\n---\n')
        for off in block_offsets:
            buf.write(f'- {off}\n'.encode())
        buf.write(b'...\n')

    with open(fn, 'wb') as f:
        f.write(buf.getvalue())
