r"""Pallas TPU kernel for the TSC deposit: fused one-hot build + MXU matmul.

The pure-XLA MXU paint (ops.grid.paint_grouped) spends most of its time
materializing (chunk, 3*nmesh) stencil matrices in HBM and contracting over
the full y width. This kernel
- groups particles by (x-cell, y-block) so the y one-hot is only yb+2 wide
  (~12x fewer matmul FLOPs than the full-width formulation), and
- builds the stencil matrices in VMEM and feeds the MXU directly (no HBM
  round-trip for the one-hots).

Per grid step (cell c, chunk t): particles' A = w*wx_ox*wy_oy one-hot over
3*(yb+2) local columns (plus lane padding), Wz = wz one-hot over nmesh;
out[c] += A^T @ Wz accumulates in VMEM across chunks. A cheap XLA fold then
shifts the per-cell (3 x-planes, yb+2 ghost columns) blocks into the global
grid (no write races: the fold owns the only adds).

STATUS: experimental — the kernel is correct (interpret-mode tested) but
does NOT beat the XLA planned paint (0.31-0.37 s vs 0.265 s / 30M at
nmesh=256 on v5e; it is one-hot-construction bound on the VPU, not MXU
bound), so the bench and get_field use ops.grid.paint_planned2. The host
grouping half of this module (build_paint_plan2d / PaintPlan2D) IS the
production staging path for the planned paint.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['build_paint_plan2d', 'paint_grouped2d', 'PaintPlan2D']


class PaintPlan2D:
    def __init__(self, pad_idx, nmesh, yb, box, offset, K):
        self.pad_idx = pad_idx  # (ncell, K) int32 into ext arrays
        self.nmesh = nmesh
        self.yb = yb
        self.box = box
        self.offset = offset
        self.K = K

    @property
    def ncell(self):
        return self.nmesh * (self.nmesh // self.yb)


def _cells_1d(p1d, box, offset, nmesh):
    boxf = np.float32(box)
    x = np.where(p1d >= boxf, p1d - boxf, p1d)
    x = np.where(x < 0, x + boxf, x)
    p = (x + np.float32(offset)) * (np.float32(nmesh) / boxf)
    return (np.floor(p + np.float32(0.5)).astype(np.int32)) % nmesh


def build_paint_plan2d(px, py, nmesh, box, yb=16, offset=0.0, chunk=512):
    """Group particles by (x-cell, y-block of `yb` cells); host-side, once
    per catalog (x and y are never RSD-shifted along z)."""
    assert nmesh % yb == 0
    px = np.asarray(px, np.float32)
    py = np.asarray(py, np.float32)
    ix = _cells_1d(px, box, offset, nmesh)
    iy = _cells_1d(py, box, offset, nmesh)
    nyb = nmesh // yb
    key = ix * nyb + iy // yb
    ncell = nmesh * nyb

    order = np.argsort(key, kind='stable').astype(np.int32)
    counts = np.bincount(key, minlength=ncell)
    if chunk == 'auto':
        # tight 128-aligned capacity, one tile per cell (ops.grid
        # deposit_tiles); recover the tile size with deposit_chunk(K)
        from .grid import deposit_tiles

        K, _ = deposit_tiles(int(counts.max()))
    else:
        K = int(np.ceil(max(counts.max(), 1) / chunk) * chunk)
    N = len(px)
    pad_idx = np.full((ncell, K), N, dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    sorted_key = key[order]
    within = np.arange(N, dtype=np.int64) - starts[sorted_key]
    pad_idx[sorted_key, within] = order
    return PaintPlan2D(jnp.asarray(pad_idx), int(nmesh), int(yb), float(box), float(offset), K)


CB = 8  # cells per block (TPU min sublane tiling)


def _deposit_kernel(
    x_ref, y_ref, z_ref, w_ref, out_ref, *, nmesh, yb, nyb, box, offset, mpad,
    ypad, npass=3,
):
    """One (8-cell group, chunk) step.

    The y one-hot Ay is built once (3 iota-compare passes); the three TSC
    x-offsets become three scaled matmuls Ay*c_ox @ Wz written to disjoint
    row ranges [ox*ypad, ox*ypad+ypad) of the output block — avoiding the
    9-pass (ox, oy) one-hot expansion, which ablation showed dominated the
    kernel (VPU-bound, +0.27s of 0.45s at 30M particles)."""
    c = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    inv_h = jnp.float32(nmesh) / jnp.float32(box)
    boxf = jnp.float32(box)
    half = jnp.float32(0.5)

    def stencil(p):
        x = jnp.where(p >= boxf, p - boxf, p)
        x = jnp.where(x < 0, x + boxf, x)
        g = (x + jnp.float32(offset)) * inv_h
        i0 = jnp.floor(g + half)
        d = i0 - g
        return i0.astype(jnp.int32), (
            half * (half + d) ** 2,
            jnp.float32(0.75) - d * d,
            half * (half - d) ** 2,
        )

    xs = x_ref[...]  # (CB, chunk)
    tk = xs.shape[1]
    _, wx = stencil(xs)
    iy, wy = stencil(y_ref[...])
    iz, wz = stencil(z_ref[...])
    ws = w_ref[...]

    # per-row y-block index: cells in this block are c*CB .. c*CB+CB-1
    rows = jax.lax.broadcasted_iota(jnp.int32, (CB, tk), 0)
    cyb = jnp.mod(c * CB + rows, nyb)
    iy_loc = jnp.mod(iy, nmesh) - cyb * yb + 1  # ghost-shifted local column

    colsA = jax.lax.broadcasted_iota(jnp.int32, (CB, tk, mpad), 2)
    Ay = jnp.zeros((CB, tk, mpad), jnp.float32)
    for oy in range(3):
        target = (iy_loc + (oy - 1))[:, :, None]
        Ay = Ay + jnp.where(colsA == target, wy[oy][:, :, None], 0.0)

    colsZ = jax.lax.broadcasted_iota(jnp.int32, (CB, tk, nmesh), 2)
    izm = jnp.mod(iz, nmesh)
    Wz = jnp.zeros((CB, tk, nmesh), jnp.float32)
    for oz in range(3):
        target = jnp.mod(izm + (oz - 1), nmesh)[:, :, None]
        Wz = Wz + jnp.where(colsZ == target, wz[oz][:, :, None], 0.0)

    # The MXU's default f32 matmul is a single bf16 pass (~2e-3 relative
    # error). npass=3 splits both operands into bf16 hi+lo and takes the
    # three largest cross terms (error ~ lo*lo ~ 4e-6); npass=1 accepts the
    # single pass, which is plenty for P(k) (random ~2e-3 deposit rounding).
    def _split(m):
        hi = m.astype(jnp.bfloat16).astype(jnp.float32)
        return hi, m - hi

    dims = (((1,), (1,)), ((0,), (0,)))
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    if npass != 1:
        Wz_hi, Wz_lo = _split(Wz)
    for ox in range(3):
        A_ox = Ay * (wx[ox] * ws)[:, :, None]
        if npass == 1:
            blk = dot(A_ox, Wz)
        else:
            A_hi, A_lo = _split(A_ox)
            blk = dot(A_hi, Wz_hi) + dot(A_hi, Wz_lo) + dot(A_lo, Wz_hi)
        out_ref[:, ox * ypad : (ox + 1) * ypad, :] += blk[:, :ypad, :]


@partial(
    jax.jit,
    static_argnames=('box', 'offset', 'nmesh', 'yb', 'K', 'chunk', 'npass', 'interpret'),
)
def _paint2d_blocks(xg, yg, zg, wg, box, offset, nmesh, yb, K, chunk, npass=3, interpret=False):
    nyb = nmesh // yb
    ncell = nmesh * nyb
    yw = yb + 2
    mpad = max(128, -(-yw // 128) * 128)  # Ay one-hot lane width
    ypad = -(-yw // 8) * 8  # per-ox output row stride (sublane aligned)

    kernel = partial(
        _deposit_kernel, nmesh=nmesh, yb=yb, nyb=nyb, box=box, offset=offset,
        mpad=mpad, ypad=ypad, npass=npass,
    )
    assert ncell % CB == 0
    grid = (ncell // CB, K // chunk)
    blocks = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CB, chunk), lambda c, t: (c, t), memory_space=pltpu.VMEM)
        ] * 4,
        out_specs=pl.BlockSpec(
            (CB, 3 * ypad, nmesh), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ncell, 3 * ypad, nmesh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xg, yg, zg, wg)
    return blocks


@partial(jax.jit, static_argnames=('nmesh', 'yb'))
def _fold_blocks(blocks, grid, nmesh, yb):
    """Fold per-(x-cell, y-block) deposit blocks into the global grid."""
    nyb = nmesh // yb
    yw = yb + 2
    ypad = blocks.shape[1] // 3
    b = blocks.reshape(nmesh, nyb, 3, ypad, nmesh)[:, :, :, :yw, :]

    for ox in range(3):
        planes = b[:, :, ox, :, :]  # (nmesh, nyb, yw, nmesh)
        core = planes[:, :, 1 : yb + 1, :].reshape(nmesh, nmesh, nmesh)
        contrib = core
        # ghost columns: y = block_start - 1 and y = block_start + yb (wrapped)
        left_cols = (jnp.arange(nyb) * yb - 1) % nmesh
        right_cols = (jnp.arange(nyb) * yb + yb) % nmesh
        contrib = contrib.at[:, left_cols, :].add(planes[:, :, 0, :])
        contrib = contrib.at[:, right_cols, :].add(planes[:, :, yw - 1, :])
        grid = grid + jnp.roll(contrib, ox - 1, axis=0)
    return grid


def paint_grouped2d(plan, xg, yg, zg, wg, grid=None, chunk=512, npass=3, interpret=False):
    """TSC paint from (ncell, K) grouped arrays via the Pallas deposit kernel.

    xg..wg must already be gathered into the plan's (ncell, K) layout (use
    plan.pad_idx with a zero-weight sentinel row appended to each source).
    `interpret=True` runs the kernel in the Pallas interpreter (CPU tests)."""
    nmesh = plan.nmesh
    if grid is None:
        grid = jnp.zeros((nmesh, nmesh, nmesh), jnp.float32)
    blocks = _paint2d_blocks(
        xg, yg, zg, wg, plan.box, plan.offset, nmesh, plan.yb, plan.K,
        int(chunk), int(npass), bool(interpret),
    )
    return _fold_blocks(blocks, grid, nmesh, plan.yb)
