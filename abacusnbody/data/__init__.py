"""Compat aliases for abacusnbody.data."""

from abacusutils_tpu.io.read_abacus import read_asdf  # noqa: F401
