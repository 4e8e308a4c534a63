"""Compat alias for abacusnbody.hod.zcv.zenbu_window."""

from abacusutils_tpu.models.zcv.zenbu_window import *  # noqa: F401,F403
from abacusutils_tpu.models.hod.utils import ArgParseFormatter  # noqa: F401,E402

if __name__ == '__main__':
    from abacusutils_tpu.models.zcv.zenbu_window import _cli

    _cli()
