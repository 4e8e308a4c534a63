"""asdf-extension-compatible blosc codec classes.

The reference registers blosc with the `asdf` package through a Compressor /
Extension pair (reference data/asdf.py:23-215). This package's ASDF reader is
self-contained (io/asdf_file.py), so these classes exist for API
compatibility: same labels, same framed wire format ([4-byte BE length][blosc
chunk]...), same compress/decompress surface — backed by io/blosc's zstd
codec (and its threaded native C++ path on decompress).
"""

import struct

import numpy as np

from .blosc import ChunkedBloscDecoder, compress_chunk

try:  # subclass the real asdf interfaces when asdf is installed, so the
    # entry-point registration (pyproject "asdf.extensions") passes asdf's
    # extension validation; plain objects otherwise
    from asdf.extension import Compressor as _Compressor
    from asdf.extension import Extension as _Extension
except ImportError:  # pragma: no cover - asdf optional
    _Compressor = object
    _Extension = object

__all__ = ['BloscCompressor', 'AbacusExtension']


class BloscCompressor(_Compressor):
    """Blosc compression as used by Abacus (reference data/asdf.py:23-183)."""

    @property
    def label(self):
        """The binary block header label indicating blosc compression."""
        return b'blsc'

    def compress(self, data, **kwargs):
        """Yield length-prefixed blosc chunks for `data` (a memoryview).

        Accepts the reference's kwargs; `cname` is zstd-only here (the only
        codec AbacusSummit data uses), and nthreads applies to decompression
        via the native decoder rather than per-chunk threading.
        """
        data = memoryview(data)
        assert data.contiguous
        kwargs.pop('nthreads', None)
        compression_block_size = kwargs.pop('compression_block_size', 1 << 22)
        blosc_block_size = kwargs.pop('blosc_block_size', 512 * 1024)
        typesize = kwargs.pop('typesize', 'auto')
        clevel = kwargs.pop('clevel', 1)
        cname = kwargs.pop('cname', 'zstd')
        if cname != 'zstd':
            raise ValueError(f'only the zstd codec is supported, got {cname!r}')
        shuffle = kwargs.pop('shuffle', 'shuffle')
        if shuffle not in ('shuffle', None):
            raise ValueError(f'unsupported shuffle mode {shuffle!r}')
        this_typesize = data.itemsize if typesize == 'auto' else typesize
        nelem = compression_block_size // data.itemsize
        for i in range(0, len(data), nelem):
            comp = compress_chunk(
                data[i:i + nelem],
                typesize=this_typesize if shuffle == 'shuffle' else 1,
                clevel=clevel,
                shuffle=shuffle == 'shuffle',
                blocksize=blosc_block_size,
            )
            yield struct.pack('!I', len(comp)) + comp

    def decompress(self, blocks, out, **kwargs):
        """Decompress an iterable of framed byte blocks into `out`
        (a contiguous uint8 buffer); returns the byte count."""
        out = np.frombuffer(out, dtype=np.uint8)
        buf = b''.join(bytes(b) for b in blocks)
        dec = ChunkedBloscDecoder(nthreads=kwargs.pop('nthreads', 4))
        return dec.decompress(buf, out)


class AbacusExtension(_Extension):
    """Extension-registration shim (reference data/asdf.py:186-215).

    Registered with third-party ``asdf`` through the ``asdf.extensions``
    entry point in pyproject.toml (reference pyproject.toml:44-45), so
    ``asdf.open`` on any blsc-compressed file just works when asdf is
    installed."""

    @property
    def extension_uri(self):
        return 'asdf://abacusnbody.org/extensions/abacus-0.0.1'

    @property
    def compressors(self):
        return [BloscCompressor()]
