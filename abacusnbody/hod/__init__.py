"""Compat aliases for abacusnbody.hod."""

from abacusutils_tpu.models.hod import AbacusHOD  # noqa: F401
