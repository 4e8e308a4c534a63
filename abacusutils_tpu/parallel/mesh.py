r"""Multi-chip sharding of the HOD->P(k) pipeline over a jax device Mesh.

The reference has no distributed backend — multi-node runs are independent
"chunk" jobs (abacus_hod.py:97-100). Here the box scales across chips the
TPU way (SURVEY.md §2.7): halos/particles are sharded over the mesh's data
axis with `shard_map`, every chip paints its shard into a full local grid,
grid deposits are `psum`-reduced over ICI, and the FFT + mode histograms run
on the reduced grid (histogram bins are small, so a final psum of bins is
free). Galaxy populations stay shard-local; only reductions cross chips.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pipeline import _paint_weighted, populate_weights
from ..ops.power import _bin_kmu_sums

__all__ = ['make_mesh', 'sharded_hod_pk', 'shard_particles']


def make_mesh(devices=None, axis='data'):
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_particles(mesh, arrays, axis='data'):
    """Place a dict of arrays with leading particle axis onto the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    n = mesh.shape[axis]

    def _put(a, fill):
        pad = (-a.shape[0]) % n
        if pad:
            a = np.concatenate([a, np.full((pad,) + a.shape[1:], fill, a.dtype)])
        return jax.device_put(a, sharding)

    # pad `randoms` with 2.0 (> any marker) so padded rows populate nothing
    return {
        k: _put(np.asarray(v), 2.0 if k == 'randoms' else 0.0)
        for k, v in arrays.items()
    }


def sharded_hod_pk(
    mesh, halo, part, params, kedges2, muedges2, lbox, velz2kms, nmesh, nbins_k,
    rsd=True, axis='data',
):
    """Populate + P(k) with halos/particles sharded over `axis`.

    Per-shard padded rows must carry randoms > marker (e.g. randoms=1,
    mass tiny) so they populate nothing. Returns (power_sum, counts, n_gal)
    replicated on every device.
    """

    @partial(
        jax.jit,
        static_argnames=(),
    )
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            {k: P(axis) for k in halo},
            {k: P(axis) for k in part},
            {k: P() for k in params},
            P(), P(),
        ),
        out_specs=(P(), P(), P()),
    )
    def step(halo_l, part_l, params_l, kedges2_l, muedges2_l):
        inv_velz2kms = 1.0 / velz2kms
        z_c, keep_c, z_s, keep_s = populate_weights(
            halo_l, part_l, params_l, rsd, inv_velz2kms
        )
        n_gal = jax.lax.psum(keep_c.sum() + keep_s.sum(), axis)

        grid = jnp.zeros(nmesh * nmesh * nmesh, jnp.float32)
        grid = _paint_weighted(halo_l['x'], halo_l['y'], z_c, keep_c, nmesh, lbox, grid)
        grid = _paint_weighted(part_l['x'], part_l['y'], z_s, keep_s, nmesh, lbox, grid)
        # the only cross-chip data dependency: grid deposits ride ICI
        grid = jax.lax.psum(grid, axis).reshape(nmesh, nmesh, nmesh)

        delta = grid * (grid.size / n_gal) - 1.0
        delta_k = jnp.fft.rfftn(delta) * jnp.float32(1.0 / grid.size)
        p3d = jnp.abs(delta_k) ** 2

        counts, wsum, _, _ = _bin_kmu_sums(
            p3d, kedges2_l, muedges2_l, nmesh, nbins_k, 1, ()
        )
        return wsum, counts, n_gal

    return step(halo, part, params, jnp.asarray(kedges2), jnp.asarray(muedges2))
