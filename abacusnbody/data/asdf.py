"""Compat alias for abacusnbody.data.asdf (blosc ASDF support)."""

from abacusutils_tpu.io.asdf_file import open_asdf, set_nthreads, write_asdf  # noqa: F401
from abacusutils_tpu.io.asdf_ext import AbacusExtension, BloscCompressor  # noqa: F401
from abacusutils_tpu.io.blosc import (  # noqa: F401
    ChunkedBloscDecoder,
    compress_chunk,
    decompress_chunk,
)
