r"""Slab-decomposed FFT pipeline over a device mesh.

`parallel.mesh.calc_power_sharded`'s default path replicates the full
nmesh^3 grid on every chip and psums the deposits — fine at nmesh<=256, but
the zcv pipeline runs meshes up to 1024+, where a replicated f32 grid is
4 GiB/chip before the FFT (SURVEY.md section 7 "Large FFTs"). This module
keeps the grid sharded end to end:

- real space: x-slabs. Each chip paints only its (nmesh/n + 4, Y, Z)
  extended slab; the two halo planes on each side ride ICI with ppermute
  ring shifts (the TSC stencil reaches one plane past the slab, and host
  slab bucketing is allowed +-1 cell of f32 slack).
- Fourier space: y-slabs. The 3D rfft factors into local rfft(z) + fft(y),
  ONE all-to-all transpose over ICI, and a local fft(x).
- binning: each chip bins its local modes with a per-shard _ModeBinPlan
  (ops.power) built for its ky rows; bin sums psum over ICI.

Per-chip memory is ~1/n of the replicated path at every stage. The
reference has no distributed analogue (single-node pocketfft,
power_spectrum.py:860-901); this is the TPU-first scaling story of
SURVEY.md section 2.7.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ['slab_rfftn', 'slab_irfftn', 'paint_slab', 'shard_slabs',
           'calc_power_sharded_slab']


def slab_rfftn(slab, axis):
    """3D rfft of an x-sharded real grid, called INSIDE shard_map.

    slab: (X/n, Y, Z) real, this device's x-slab. Returns (X, Y/n, Zr)
    complex — the rfftn result sharded over ky rows. Only the transpose
    (one all_to_all) crosses chips; the 1D FFTs are local.
    """
    c = jnp.fft.rfft(slab, axis=2)
    c = jnp.fft.fft(c, axis=1)
    c = jax.lax.all_to_all(c, axis, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(c, axis=0)


def slab_irfftn(ck, axis, n1d):
    """Inverse of slab_rfftn: (X, Y/n, Zr) complex -> (X/n, Y, Z) real."""
    c = jnp.fft.ifft(ck, axis=0)
    c = jax.lax.all_to_all(c, axis, split_axis=0, concat_axis=1, tiled=True)
    c = jnp.fft.ifft(c, axis=1)
    return jnp.fft.irfft(c, n=n1d, axis=2)


def paint_slab(px, py, pz, w, nmesh, lbox, axis, ndev, centered=True):
    """TSC deposit into this device's x-slab, called INSIDE shard_map.

    Particles must be pre-bucketed to slabs within +-1 cell (shard_slabs).
    Deposits land in an extended (xl+4, Y, Z) slab whose two halo planes per
    side are exchanged with ring ppermutes and folded into the core.
    Returns the (xl, Y, Z) core slab.
    """
    from ..ops.grid import _axis_cloud

    xl = nmesh // ndev
    half_l = jnp.float32(lbox) / 2 if centered else jnp.float32(0.0)
    ix, wx = _axis_cloud(px + half_l, lbox, 0.0, nmesh, 'tsc', True)
    iy, wy = _axis_cloud(py + half_l, lbox, 0.0, nmesh, 'tsc', True)
    iz, wz = _axis_cloud(pz + half_l, lbox, 0.0, nmesh, 'tsc', True)

    x0 = jax.lax.axis_index(axis).astype(jnp.int32) * xl
    # halo-frame x cell of the stencil center, min-imaged so box wraparound
    # (slab 0 / slab n-1) stays small
    rel = jnp.mod(ix - x0 + nmesh // 2, nmesh) - nmesh // 2 + 2
    fy = [jnp.mod(iy + o, nmesh) for o in (-1, 0, 1)]
    fz = [jnp.mod(iz + o, nmesh) for o in (-1, 0, 1)]
    grid = jnp.zeros((xl + 4) * nmesh * nmesh, jnp.float32)
    for a in range(3):
        fxa = rel + (a - 1)
        okx = (fxa >= 0) & (fxa < xl + 4)
        fxa = jnp.where(okx, fxa, 0)
        for b in range(3):
            wab = wx[a] * wy[b] * w * okx.astype(jnp.float32)
            fab = (fxa * nmesh + fy[b]) * nmesh
            for c in range(3):
                grid = grid.at[fab + fz[c]].add(wab * wz[c])
    g = grid.reshape(xl + 4, nmesh, nmesh)

    fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
    bwd = [(i, (i - 1) % ndev) for i in range(ndev)]
    # device i's right halo covers the first two planes of slab i+1 (and its
    # left halo the last two planes of slab i-1)
    from_prev = jax.lax.ppermute(g[xl + 2:xl + 4], axis, fwd)
    from_next = jax.lax.ppermute(g[0:2], axis, bwd)
    core = g[2:xl + 2]
    core = core.at[0:2].add(from_prev)
    core = core.at[xl - 2:xl].add(from_next)
    return core


def shard_slabs(mesh, pos, w, nmesh, lbox, axis='data', centered=True):
    """Bucket particles by x-slab (mirroring _axis_cloud's f32 cell round)
    and place each bucket on its device, padded to a common length with
    weight-0 rows. Returns a dict of (ndev * maxc,) sharded SoA arrays."""
    ndev = mesh.shape[axis]
    xl = nmesh // ndev
    pos = np.asarray(pos)
    x = pos[:, 0].astype(np.float32)
    if centered:
        x = x + np.float32(lbox / 2)
    x = np.where(x >= np.float32(lbox), x - np.float32(lbox), x)
    x = np.where(x < 0, x + np.float32(lbox), x)
    ix = np.floor(
        x * (np.float32(nmesh) / np.float32(lbox)) + np.float32(0.5)
    ).astype(np.int64)
    slab = (ix // xl) % ndev
    order = np.argsort(slab, kind='stable')
    counts = np.bincount(slab, minlength=ndev)
    maxc = max(int(counts.max()), 1)
    sharding = NamedSharding(mesh, P(axis))
    cols = {
        'x': pos[:, 0].astype(np.float32),
        'y': pos[:, 1].astype(np.float32),
        'z': pos[:, 2].astype(np.float32),
        'weights': np.asarray(w, np.float32),
    }
    out = {}
    starts = np.concatenate([[0], np.cumsum(counts)])
    for k, col in cols.items():
        buf = np.zeros(ndev * maxc, np.float32)
        for d in range(ndev):
            seg = order[starts[d]:starts[d + 1]]
            buf[d * maxc:d * maxc + len(seg)] = col[seg]
        out[k] = jax.device_put(buf, sharding)
    return out


def calc_power_sharded_slab(
    pos, lbox, mesh, kbins=None, mubins=1, k_max=None, logk=False,
    nmesh=256, w=None, poles=(), axis='data',
):
    """P(k,mu)/P_ell with the density grid sharded end to end (x-slab paint,
    transpose rfftn, y-slab mode binning). Bin-for-bin equal (up to FFT
    rounding) to ops.power.calc_power / the replicated calc_power_sharded,
    with per-chip grid memory ~1/n_devices. Use for zcv-scale meshes
    (nmesh >= 512); parallel.mesh.calc_power_sharded dispatches here."""
    from ..ops.power import _get_mode_bin_plan, _segsum_sorted, get_k_mu_edges

    ndev = mesh.shape[axis]
    if nmesh % ndev:
        raise ValueError(f'nmesh={nmesh} must divide by n_devices={ndev}')
    if k_max is None:
        k_max = np.pi * nmesh / lbox
    nbins_k = nmesh // 2 if kbins is None else int(kbins)
    nbins_mu = int(mubins)
    kedges, muedges = get_k_mu_edges(lbox, k_max, nbins_k, nbins_mu, logk)
    dk = 2 * np.pi / lbox
    poles = tuple(int(p) for p in poles)
    kedges2 = ((kedges / dk) ** 2).astype(np.float32)
    muedges2 = (muedges**2).astype(np.float32)

    yl = nmesh // ndev
    plans = [
        _get_mode_bin_plan(
            int(nmesh), kedges2, muedges2, poles, yslab=(d * yl, (d + 1) * yl)
        )
        for d in range(ndev)
    ]
    shard = NamedSharding(mesh, P(axis))
    pole_nz = tuple(p for p in poles if p != 0)
    nbins = nbins_k * nbins_mu
    use_mm = nbins_mu == 1 and nbins_k <= 256

    def stack(get):
        return jax.device_put(np.stack([np.asarray(get(p)) for p in plans]), shard)

    if use_mm:
        binargs = (
            stack(lambda p: p.seg),
            tuple(stack(lambda p, q=q: p.pole_w_flat[q]) for q in pole_nz),
        )
    else:
        binargs = (
            stack(lambda p: p.perm), stack(lambda p: p.bounds),
            stack(lambda p: p.kbounds), stack(lambda p: p.dup_sorted),
            {q: stack(lambda p, q=q: p.pole_w[q]) for q in pole_nz},
        )

    pos = np.asarray(pos, np.float32)
    n_part = len(pos)
    if w is None:
        w = np.ones(n_part, np.float32)
    arrs = shard_slabs(mesh, pos, w, nmesh, lbox, axis=axis)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=({k: P(axis) for k in arrs},) + (P(axis),) * len(binargs),
        out_specs=(P(), P()),
        check_vma=False,  # scan carry init in _segsum_matmul is unvarying
    )
    def step(a, *bin_l):
        from ..ops.power import _segsum_matmul

        core = paint_slab(
            a['x'], a['y'], a['z'], a['weights'], nmesh, lbox, axis, ndev
        )
        # reference quirk kept: normalize by particle COUNT, not total weight
        # (get_field power_spectrum.py:808-857 uses len(pos))
        delta = core * (jnp.float32(nmesh) ** 3 / jnp.float32(n_part)) - 1.0
        delta_k = slab_rfftn(delta, axis) * jnp.float32(1.0 / float(nmesh) ** 3)
        p3d = jnp.abs(delta_k) ** 2
        if use_mm:
            seg_l, pw_l = bin_l
            out = _segsum_matmul(
                p3d.reshape(-1), seg_l[0], nbins, nmesh // 2 + 1,
                pole_w=tuple(pw[0] for pw in pw_l),
            )
            wsum = out[0] if pw_l else out
            psums = out[1:] if pw_l else jnp.zeros((0, nbins_k), jnp.float32)
        else:
            perm_l, bounds_l, kbounds_l, dup_l, pole_w_l = bin_l
            vp = p3d.reshape(-1)[perm_l[0]]
            wsum = _segsum_sorted(vp * dup_l[0], bounds_l[0])
            psums = jnp.stack(
                [_segsum_sorted(vp * pole_w_l[p][0], kbounds_l[0])
                 for p in pole_w_l]
            ) if pole_w_l else jnp.zeros((0, nbins_k), jnp.float32)
        return jax.lax.psum(wsum, axis), jax.lax.psum(psums, axis)

    wsum, psums = step(arrs, *binargs)
    counts = sum(np.asarray(p.counts, np.float64) for p in plans)
    ksum = sum(np.asarray(p.ksum, np.float64) for p in plans)

    from .mesh import _assemble_power_output

    return _assemble_power_output(
        np.asarray(wsum), np.asarray(psums), counts, ksum,
        kedges, poles, lbox, dk, nbins_k, nbins_mu,
    )
