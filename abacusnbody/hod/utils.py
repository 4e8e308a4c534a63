"""Compat alias for abacusnbody.hod.utils."""

from abacusutils_tpu.models.hod.utils import (  # noqa: F401
    ArgParseFormatter,
    exception_handler,
    mkdir,
    setup_logging,
)
