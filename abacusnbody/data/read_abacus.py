"""Compat alias for abacusnbody.data.read_abacus."""

from abacusutils_tpu.io.read_abacus import read_asdf  # noqa: F401
