"""Compat alias for abacusnbody.data.pack9."""

from abacusutils_tpu.io.pack9 import unpack_pack9  # noqa: F401
