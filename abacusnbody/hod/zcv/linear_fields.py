"""Compat alias for abacusnbody.hod.zcv.linear_fields."""

from abacusutils_tpu.models.zcv.linear_fields import *  # noqa: F401,F403
