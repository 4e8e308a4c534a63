"""Compat alias for abacusnbody.analysis.cic."""

from abacusutils_tpu.ops.grid import cic_serial  # noqa: F401
