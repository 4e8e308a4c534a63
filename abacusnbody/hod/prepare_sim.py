"""Compat alias for abacusnbody.hod.prepare_sim (CLI-compatible)."""

from abacusutils_tpu.models.hod.prepare_sim import (  # noqa: F401
    calc_fenv_opt,
    calc_shearmark,
    gen_rand,
    get_vertices_cube,
    is_in_cube,
    load_env_halos,
    main,
    make_edge_pad_filter,
    periodic_dx,
    prepare_slab,
    submask_particles,
    subsample_halos,
    unwrap_x_for_slab,
)
from abacusutils_tpu.models.hod.utils import ArgParseFormatter  # noqa: F401

if __name__ == '__main__':
    main()
