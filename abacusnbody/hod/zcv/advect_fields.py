"""Compat alias for abacusnbody.hod.zcv.advect_fields."""

from abacusutils_tpu.models.zcv.advect_fields import *  # noqa: F401,F403
from abacusutils_tpu.models.hod.utils import ArgParseFormatter  # noqa: F401,E402

if __name__ == '__main__':
    from abacusutils_tpu.models.zcv.advect_fields import _cli

    _cli()
