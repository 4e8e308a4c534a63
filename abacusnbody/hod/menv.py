"""Compat alias for abacusnbody.hod.menv."""

from abacusutils_tpu.models.hod.menv import (  # noqa: F401
    concat_to_arr,
    do_Menv_from_tree,
    msum_batch,
    msum_core,
    msum_in_batches,
    query_inds,
)
