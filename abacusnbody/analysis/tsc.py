"""Compat alias for abacusnbody.analysis.tsc."""

from abacusutils_tpu.ops.grid import partition_parallel, tsc_parallel  # noqa: F401
