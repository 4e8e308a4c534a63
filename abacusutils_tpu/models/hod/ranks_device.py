r"""Device rank decorations for prepare_sim: all halos in one program.

The reference computes the per-particle rank fields (distance / velocity /
radial-velocity / NFW-perihelion ranks and the nearest-neighbor
concentration rank) in a serial per-halo Python loop with a fresh cKDTree
per halo (reference prepare_sim.py:886-977) — its own documented
bottleneck. Here the same math runs as segment operations over the staged
particle arrays:

- each rank = ONE multi-operand device sort of (halo segment, key) over
  every particle at once, with the in-segment position recovered by a
  cumulative-max scan (no per-element gathers);
- the NFW perihelion iteration is elementwise (20 fixed steps, like the
  reference's loop);
- the nearest-neighbor distance takes two routes: halos with <= 64
  particles (the vast majority) pack into one (halo, slot) layout and
  reduce as big chunked pairwise tiles (per-halo dynamic slices pay ~5 us
  of addressing each — the menv_device lesson); bigger halos run a
  capacity-classed per-window scan whose large tiles amortize that
  overhead.

RNG draws are untouched: the submasks are drawn by the caller in the
reference's exact per-halo order before this module runs (the rank math
consumes no randomness), so h5 golden parity is preserved.

Tie-breaking: the device sorts are STABLE (ties rank by file order).
numpy's argsort default (the host loop) is introsort — unstable, with
implementation-defined tie order. Ties are real in the NN rank (mutual
nearest neighbors share the exact same distance), so host and device
ranksc can swap ranks WITHIN a tied group; every untied rank matches
exactly (test_ranks_device.py). The other four keys are continuous and
tie only for symmetric configurations.

Rank keys mirror the host loop's dtype flow statement for statement
(float32 distance/velocity keys; the NFW iteration promotes to float64
through the f64 `alpha`, whose prefactor chain is evaluated on host in
the reference's exact expression order). On CPU backends the whole
computation runs under a local `jax.experimental.enable_x64()` scope so
that promotion happens bit-for-bit like the host loop (the global x64
flag stays off) and the ranks equal the host loop's exactly away from
genuine key ties; on TPU (no f64) keys round to f32, which can flip the
rank of two particles whose keys agree to ~1e-7 relative — physically
degenerate pairs (measured at 1.2M-particle slab scale: ~0.002% flips
for the f32-keyed distance/velocity ranks, 4.5% for the NFW perihelion
rank, 18% for the NN rank; scripts/hod/bench_ranks.py). prepare_slab's
default ranks_engine='auto' therefore picks this engine only on CPU
backends. The (rank-mean)/mean normalization always runs on host in f64
(ranks and means are exact integers/half-integers, so it is
bit-identical to the host loop on either backend).
"""

import contextlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['rank_fields_device']


@jax.jit
def _seg_rank(seg, sel, key):
    """Rank of `key` among the SELECTED particles of each segment.

    seg: int32 segment id per particle (-1 = in no segment); sel: bool.
    Returns ranks as key-dtype floats (position within segment after
    sorting selected particles by key; unselected/unsegmented particles
    get arbitrary trailing positions — callers mask them)."""
    n = seg.shape[0]
    inf = jnp.array(np.inf, key.dtype)
    big = jnp.where(sel & (seg >= 0), key, inf)  # unselected last in segment
    segk = jnp.where(seg >= 0, seg, jnp.int32(2**30))
    iota = jnp.arange(n, dtype=jnp.int32)
    sseg, _, sidx = jax.lax.sort((segk, big, iota), num_keys=2)
    is_start = jnp.concatenate([jnp.ones(1, bool), sseg[1:] != sseg[:-1]])
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, iota, 0)
    )
    pos = (iota - start_pos).astype(key.dtype)
    return jnp.zeros(n, key.dtype).at[sidx].set(pos)


def _norm_ranks_host(rank, sel, nsub_p):
    """Reference normalization (rank - mean)/mean with mean=(nsub-1)/2,
    in f64 on host like the per-halo loop (np.mean of int ranks is an
    exact f64 integer/half-integer, so this is bit-identical to it);
    singletons (nsub==1) get 0, unselected particles get -1."""
    mean = (nsub_p - 1.0) * 0.5
    safe = np.where(mean > 0, mean, 1.0)
    out = (rank - mean) / safe
    out[nsub_p == 1] = 0.0
    out[~sel] = -1.0
    return out


@partial(jax.jit, static_argnames=('cap', 'block'))
def _nn_class_scan(out, px, py, pz, starts, counts, cap, block):
    """Nearest-neighbor distance for every particle of each halo in one
    capacity class: per halo, dynamic-slice the contiguous (cap,) window
    out of the (padded) file-order coordinate arrays, compute the pairwise
    minimum distance in row chunks, and write back masked (pad slots and
    other halos' overlap keep their old values). `block` halos are
    unrolled per fori step to amortize loop overhead on small caps."""
    nh = starts.shape[0]
    inf = jnp.array(np.inf, px.dtype)
    rchunk = max(1, min(cap, (1 << 21) // cap))
    n_rblocks = -(-cap // rchunk)

    def one_halo(out, s, cnt):
        wx = jax.lax.dynamic_slice(px, (s,), (cap,))
        wy = jax.lax.dynamic_slice(py, (s,), (cap,))
        wz = jax.lax.dynamic_slice(pz, (s,), (cap,))
        valid = jnp.arange(cap) < cnt

        def rblock(r, acc):
            r0 = r * rchunk
            sl = lambda a: jax.lax.dynamic_slice(a, (r0,), (rchunk,))  # noqa: E731
            dx = sl(wx)[:, None] - wx[None, :]
            dy = sl(wy)[:, None] - wy[None, :]
            dz = sl(wz)[:, None] - wz[None, :]
            d2 = dx * dx + dy * dy + dz * dz
            col_ok = valid[None, :]
            self_m = (
                (jnp.arange(rchunk)[:, None] + r0) == jnp.arange(cap)[None, :]
            )
            d2 = jnp.where(col_ok & ~self_m, d2, inf)
            return jax.lax.dynamic_update_slice(acc, d2.min(axis=1), (r0,))

        nn2 = jax.lax.fori_loop(0, n_rblocks, rblock, jnp.zeros(cap, px.dtype))
        nn = jnp.sqrt(nn2)
        old = jax.lax.dynamic_slice(out, (s,), (cap,))
        return jax.lax.dynamic_update_slice(
            out, jnp.where(valid, nn, old), (s,)
        )

    def body(b, out):
        for k in range(block):
            i = jnp.minimum(b * block + k, nh - 1)
            # repeats of the last halo are idempotent (same window/values)
            out = one_halo(out, starts[i], counts[i])
        return out

    return jax.lax.fori_loop(0, -(-nh // block), body, out)


_NN_VEC_CAP = 64  # halos this small batch through the packed layout


@partial(jax.jit, static_argnames=('nrows', 'capG', 'cblock'))
def _nn_small_vec(px, py, pz, src, dest, nrows, capG, cblock):
    """NN distances for all halos with <= capG particles at once: pack
    each halo into one row of an (nrows, capG) layout (pads at +inf) and
    process row chunks as (cblock, capG, capG) pairwise tiles — per-halo
    dynamic slices pay ~5 us of addressing each, which dominates at 1e5+
    small halos (the menv_device lesson). Returns the flat (nrows*capG,)
    layout of NN distances; callers unpack via the same dest map."""
    S = nrows * capG

    def pack(col):
        base = jnp.full((S,), jnp.inf, col.dtype)
        return base.at[dest].set(col[src], mode='drop', unique_indices=True)

    X = pack(px).reshape(nrows, capG)
    Y = pack(py).reshape(nrows, capG)
    Z = pack(pz).reshape(nrows, capG)
    iota = jnp.arange(capG)
    eye_inf = jnp.where(
        iota[:, None] == iota[None, :], jnp.asarray(jnp.inf, px.dtype), 0.0
    )

    def blk(carry, b):
        c0 = b * cblock
        z0 = jnp.zeros((), c0.dtype)
        sl = lambda A: jax.lax.dynamic_slice(  # noqa: E731
            A, (c0, z0), (cblock, capG)
        )
        x, y, z = sl(X), sl(Y), sl(Z)
        dx = x[:, :, None] - x[:, None, :]
        dy = y[:, :, None] - y[:, None, :]
        dz = z[:, :, None] - z[:, None, :]
        d2 = (dx * dx + dy * dy) + dz * dz + eye_inf[None]
        # pad slots are +inf coords: inf - inf = nan -> replace with inf
        d2 = jnp.where(jnp.isnan(d2), jnp.asarray(jnp.inf, d2.dtype), d2)
        return carry, jnp.sqrt(d2.min(axis=2))

    _, out = jax.lax.scan(
        blk, 0, jnp.arange(nrows // cblock, dtype=jnp.int32)
    )
    return out.reshape(S)


def _nn_dists(ppos, pstart, pnum, dtype):
    """Nearest-neighbor distance (sqrt, matching cKDTree.query(k=2)'s f64
    math) for every particle of every listed halo window: small halos
    (<= 64 particles, the vast majority of a slab) batch through one
    packed-layout pairwise kernel; big halos run the capacity-classed
    window scan (whose large tiles amortize the per-window addressing).
    Device-resident end to end."""
    n = len(ppos)
    pstart = np.asarray(pstart, np.int64)
    pnum = np.asarray(pnum, np.int64)
    if len(pstart) == 0:
        return jnp.zeros(n, dtype)

    px = jnp.asarray(np.asarray(ppos[:, 0], dtype))
    py = jnp.asarray(np.asarray(ppos[:, 1], dtype))
    pz = jnp.asarray(np.asarray(ppos[:, 2], dtype))
    nn = jnp.zeros(n, dtype)

    big = pnum > _NN_VEC_CAP
    if big.any():
        ps_b, pn_b = pstart[big], pnum[big]
        cap_of = 2 ** np.ceil(np.log2(pn_b)).astype(int)
        maxcap = int(cap_of.max())
        pad = jnp.full(maxcap, jnp.inf, dtype)
        pxd = jnp.concatenate([px, pad])
        pyd = jnp.concatenate([py, pad])
        pzd = jnp.concatenate([pz, pad])
        out = jnp.concatenate([nn, jnp.zeros(maxcap, dtype)])
        for cap in np.unique(cap_of):
            in_c = cap_of == cap
            block = int(max(1, min(16, 4096 // cap)))
            out = _nn_class_scan(
                out, pxd, pyd, pzd,
                jnp.asarray(ps_b[in_c], jnp.int32),
                jnp.asarray(pn_b[in_c], jnp.int32),
                int(cap), block,
            )
        nn = out[:n]

    small = ~big
    if small.any():
        ps_s, pn_s = pstart[small], pnum[small]
        capG = max(8, 1 << int(pn_s.max() - 1).bit_length())
        cblock = max(256, (1 << 24) // (capG * capG))
        H = len(ps_s)
        Hpad = -(-H // cblock) * cblock
        rank = np.arange(int(pn_s.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(np.concatenate([[0], pn_s]))[:-1], pn_s
        )
        src = np.repeat(ps_s, pn_s) + rank
        dest = np.repeat(np.arange(H, dtype=np.int64), pn_s) * capG + rank
        src_d = jnp.asarray(src.astype(np.int32))
        flat = _nn_small_vec(
            px, py, pz, src_d, jnp.asarray(dest.astype(np.int32)),
            int(Hpad), int(capG), int(cblock),
        )
        nn = nn.at[src_d].set(flat[jnp.asarray(dest.astype(np.int32))],
                              mode='drop', unique_indices=True)
    return nn

@jax.jit
def _rank_keys(dx, dy, dz, dvx, dvy, dvz, alpha, rs_p):
    """Elementwise rank keys mirroring the host loop's dtype flow: f32
    dist^2 / v^2 / radial velocity, and the NFW perihelion rp^2 whose
    20-step iteration promotes to f64 through `alpha` (reference
    prepare_sim.py:943-977)."""
    dist2 = dx * dx + dy * dy + dz * dz
    v2 = dvx * dvx + dvy * dvy + dvz * dvz
    r0 = jnp.sqrt(dist2)
    # host order: normalize each component by r0 FIRST, then dot
    nx, ny, nz = dx / r0, dy / r0, dz / r0
    vrad = dvx * nx + dvy * ny + dvz * nz

    v_rad2 = vrad * vrad
    v_tan2 = v2 - v_rad2
    r0_kpc = r0 * 1000
    x2 = v_tan2 / (v_tan2 + v_rad2)
    factorA = v_tan2 + v_rad2
    factorB = jnp.log(1 + r0_kpc / rs_p)

    def it(x2):
        oldx = jnp.sqrt(x2)
        return v_tan2 / (
            factorA
            + alpha * (jnp.log(1 + oldx * r0_kpc / rs_p) / oldx - factorB)
        )

    # the host's first pass runs the inner math in f32 (x2 still f32) and
    # the f64 alpha promotes the OUTPUT — unroll it so the fori carry
    # dtype is stable and the promotion order matches bit-for-bit
    x2 = it(x2)
    x2 = jax.lax.fori_loop(0, 19, lambda _, x: it(x), x2)
    x2 = jnp.where(jnp.isnan(x2), jnp.ones((), x2.dtype), x2)
    rp2 = (r0_kpc * r0_kpc) * x2
    return dist2, v2, vrad, rp2


def rank_fields_device(
    ppos, pvel, submask, seg, nsub_p, pstart, pnum,
    hpos_p, hvel_p, mass_p, r25_p, r98_p, h,
):
    """Device twin of the reference's per-halo `_rank_fields` loop over
    every ranked halo at once (reference prepare_sim.py:886-977).

    ppos/pvel: (N,3) file-order particle arrays (f32). submask: bool keep
    mask. seg: int32 per-particle ranked-halo segment id (-1 = not
    ranked). nsub_p: selected count of the particle's halo, per particle.
    pstart/pnum: per-ranked-halo windows into the particle arrays (ALL
    particles of the halo — the NN rank sees unselected neighbors too).
    hpos_p/hvel_p: (N,3) host-halo pos/vel per particle (f32);
    mass_p/r25_p/r98_p: per-particle halo columns (mass f64 Msun/h,
    radii f32).

    Returns (ranks, ranksv, ranksp, ranksr, ranksc) length-N float64
    arrays with the reference's conventions: -1 for unselected particles,
    0 for single-selection halos.
    """
    # f64 keys where the host loop has them (the NFW iteration and the
    # cKDTree NN distances): CPU backends get a local x64 scope so the
    # alpha promotion happens bit-for-bit like the host; TPU (no f64)
    # rounds the keys to f32 (docstring caveat).
    if bool(jax.config.read('jax_enable_x64')) or jax.default_backend() == 'cpu':
        x64, ctx = True, jax.enable_x64(True)
    else:
        x64, ctx = False, contextlib.nullcontext()
    f32 = np.float32
    ppos = np.asarray(ppos, f32)
    pvel = np.asarray(pvel, f32)
    seg_np = np.asarray(seg, np.int32)
    sel_np = np.asarray(submask, bool) & (seg_np >= 0)

    dxh = ppos - np.asarray(hpos_p, f32)
    dvh = pvel - np.asarray(hvel_p, f32)

    # alpha per particle, on host, in the reference's exact expression and
    # scalar-promotion order (f32 radii -> f32 concentration terms, f64
    # mass -> f64 alpha; the division by r0_kpc sits mid-chain)
    r25_p = np.asarray(r25_p, f32)
    r98_p = np.asarray(r98_p, f32)
    m = np.asarray(mass_p, np.float64) / h
    with np.errstate(invalid='ignore', divide='ignore'):
        c = r98_p / r25_p
        r0_host = np.sqrt(np.sum(dxh * dxh, axis=1))
        r0_kpc = r0_host * 1000
        alpha = (
            1.0 / (np.log(1 + c) - c / (1 + c))
            * 2 * 6.67e-11 * m * 2e30 / r0_kpc / 3.086e19 / 1e6
        )
    if not x64:
        alpha = alpha.astype(f32)

    with ctx:
        seg = jnp.asarray(seg_np)
        sel = jnp.asarray(sel_np)
        dist2, v2, vrad, rp2 = _rank_keys(
            jnp.asarray(dxh[:, 0]), jnp.asarray(dxh[:, 1]),
            jnp.asarray(dxh[:, 2]),
            jnp.asarray(dvh[:, 0]), jnp.asarray(dvh[:, 1]),
            jnp.asarray(dvh[:, 2]),
            jnp.asarray(alpha), jnp.asarray(r25_p),
        )
        nn = _nn_dists(ppos, pstart, pnum, np.float64 if x64 else f32)
        ranks_int = [
            np.asarray(_seg_rank(seg, sel, key), np.float64)
            for key in (dist2, v2, rp2, vrad, nn)
        ]

    nsub_p = np.asarray(nsub_p, np.float64)
    out = [_norm_ranks_host(r, sel_np, nsub_p) for r in ranks_int]
    ranks, ranksv, ranksp, ranksr, ranksc = out
    return ranks, ranksv, ranksp, ranksr, ranksc
