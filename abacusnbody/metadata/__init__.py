"""Compat alias for abacusnbody.metadata."""

from abacusutils_tpu.metadata import get_meta  # noqa: F401
