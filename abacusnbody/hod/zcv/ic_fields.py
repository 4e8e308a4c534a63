"""Compat alias for abacusnbody.hod.zcv.ic_fields."""

from abacusutils_tpu.models.zcv.ic_fields import *  # noqa: F401,F403
