"""Compat alias for abacusnbody.hod.zcv.advect_fields."""

from abacusutils_tpu.models.zcv.advect_fields import *  # noqa: F401,F403
