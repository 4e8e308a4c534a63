"""Compat alias for abacusnbody.util (reference util.py:4-59)."""

from abacusutils_tpu.utils.cumsum import cumsum  # noqa: F401
