"""Compat alias for abacusnbody.metadata.abacussummit."""

from abacusutils_tpu.metadata import get_meta  # noqa: F401
