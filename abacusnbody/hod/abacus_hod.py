"""Compat alias for abacusnbody.hod.abacus_hod."""

from abacusutils_tpu.models.hod.abacus_hod import AbacusHOD  # noqa: F401
