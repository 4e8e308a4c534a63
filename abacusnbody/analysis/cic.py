"""Compat alias for abacusnbody.analysis.cic."""

from abacusutils_tpu.ops.grid import cic_serial, rightwrap  # noqa: F401
