"""Compat alias for abacusnbody.data.bitpacked."""

from abacusutils_tpu.io.bitpacked import (  # noqa: F401
    AUXDENS,
    AUXPID,
    AUXTAGGED,
    PID_FIELDS,
    ZERODEN,
    empty_bitpacked_arrays,
    unpack_pids,
    unpack_rvint,
)
