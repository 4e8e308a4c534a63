"""Compat alias for abacusnbody.hod.zcv.tools_cv."""

from abacusutils_tpu.models.zcv.tools_cv import *  # noqa: F401,F403
