"""Pallas TPU ray/triangle sweep — the RT-core replacement's hot kernel.

Replaces `optixTrace`'s hardware BVH traversal for the primitive test
itself: a VMEM-resident sweep that keeps every intermediate on-chip.

Layout: rays ride the **lane** dimension (128 per row, RB rows per grid
step) as SoA component planes; triangle chunks ride the **sublane**
dimension ((TC, 1, 1) scalars broadcast against (RB, 128) ray planes), so
every Moller-Trumbore term is a full (TC, RB, 128) VPU op. The running
closest hit lives in the output VMEM block, revisited across the
triangle-chunk grid dimension (matmul-accumulator pattern), so HBM sees
exactly one read of rays/tris and one write of (t, index) per sweep.

Barycentrics are *not* carried through the sweep; the winner triangle is
re-tested once afterwards in XLA (one test per ray) — cheaper than
carrying u/v through every chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_DISTANCE = 1e16
_DET_EPS = 1e-12

LANES = 128
DEFAULT_RB = 8    # ray rows per grid step (RB*128 rays)
DEFAULT_TC = 32   # triangles per chunk (sublane dim)


def _kernel(tri_ref, rox, roy, roz, rdx, rdy, rdz, tmn, tmx, tbest, ibest):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        tbest[:] = jnp.full_like(tbest[:], MAX_DISTANCE)
        ibest[:] = jnp.full_like(ibest[:], -1)

    # triangle scalars (TC, 1, 1)
    def col(i):
        return tri_ref[:, i][:, None, None]

    p0x, p0y, p0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)

    # ray planes (RB, 128) -> broadcast against (TC, 1, 1)
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]

    # pvec = rd x e2
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    det_safe = jnp.where(jnp.abs(det) < _DET_EPS, _DET_EPS, det)
    # fast reciprocal + one Newton-Raphson step (~full f32 precision,
    # far cheaper than the exact VPU divide)
    r = pl.reciprocal(det_safe, approx=True)
    inv = r * (2.0 - det_safe * r)
    tvx = ox - p0x
    tvy = oy - p0y
    tvz = oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    # qvec = tvec x e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv

    hit = (
        (jnp.abs(det) >= _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmn[:])
        & (t < tmx[:])
    )
    t = jnp.where(hit, t, MAX_DISTANCE)

    tmin_c = jnp.min(t, axis=0)             # (RB, 128)
    jmin = jnp.argmin(t, axis=0)            # (RB, 128) i32
    better = tmin_c < tbest[:]
    tbest[:] = jnp.where(better, tmin_c, tbest[:])
    ibest[:] = jnp.where(better, c * tri_ref.shape[0] + jmin, ibest[:])


def _kernel_unrolled(tri_ref, rox, roy, roz, rdx, rdy, rdz, tmn, tmx, tbest, ibest):
    """Variant: unrolled python loop over the chunk's triangles with 2D
    (RB, 128) ops — fewer live VMEM temps than the 3D broadcast form."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        tbest[:] = jnp.full_like(tbest[:], MAX_DISTANCE)
        ibest[:] = jnp.full_like(ibest[:], -1)

    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    tmn_v, tmx_v = tmn[:], tmx[:]
    tc = tri_ref.shape[0]
    base = c * tc

    best_t = tbest[:]
    best_i = ibest[:]
    for j in range(tc):
        p0x, p0y, p0z = tri_ref[j, 0], tri_ref[j, 1], tri_ref[j, 2]
        e1x, e1y, e1z = tri_ref[j, 3], tri_ref[j, 4], tri_ref[j, 5]
        e2x, e2y, e2z = tri_ref[j, 6], tri_ref[j, 7], tri_ref[j, 8]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        det_safe = jnp.where(jnp.abs(det) < _DET_EPS, _DET_EPS, det)
        r = pl.reciprocal(det_safe, approx=True)
        inv = r * (2.0 - det_safe * r)
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        ok = (
            (jnp.abs(det) >= _DET_EPS)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > tmn_v)
            & (t < tmx_v)
            & (t < best_t)
        )
        best_t = jnp.where(ok, t, best_t)
        best_i = jnp.where(ok, base + j, best_i)
    tbest[:] = best_t
    ibest[:] = best_i


@functools.partial(
    jax.jit, static_argnames=("rb", "tc", "interpret", "unrolled")
)
def sweep_triangles(
    rox: jnp.ndarray,
    roy: jnp.ndarray,
    roz: jnp.ndarray,
    rdx: jnp.ndarray,
    rdy: jnp.ndarray,
    rdz: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    tri: jnp.ndarray,   # (T, 12): p0 xyz, e1 xyz, e2 xyz, pad
    rb: int = DEFAULT_RB,
    tc: int = DEFAULT_TC,
    interpret: bool = False,
    unrolled: bool = False,
):
    """Closest-hit sweep over ray component planes (N,) each.
    Returns (t (N,), idx (N,) i32; idx<0 = miss).

    N must be a multiple of rb*128 and T a multiple of tc (pad upstream;
    padding triangles must be degenerate, padding rays get tmax<=tmin).
    """
    n = rox.shape[0]
    t_total = tri.shape[0]
    assert n % (rb * LANES) == 0, n
    assert t_total % tc == 0, t_total
    rows = n // LANES

    def plane(x):
        return x.reshape(rows, LANES)

    grid = (rows // rb, t_total // tc)
    ray_spec = pl.BlockSpec(
        (rb, LANES), lambda r, c: (r, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (tc, tri.shape[1]), lambda r, c: (c, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (rb, LANES), lambda r, c: (r, 0), memory_space=pltpu.VMEM
    )

    tbest, ibest = pl.pallas_call(
        _kernel_unrolled if unrolled else _kernel,
        grid=grid,
        in_specs=[tri_spec] + [ray_spec] * 8,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=55 * n * t_total, bytes_accessed=n * 40 + t_total * 48,
            transcendentals=0,
        ),
    )(
        tri,
        plane(rox), plane(roy), plane(roz),
        plane(rdx), plane(rdy), plane(rdz),
        plane(tmin), plane(tmax),
    )
    return tbest.reshape(n), ibest.reshape(n)


def pack_triangles(p0, p1, p2, pad_to: int = DEFAULT_TC) -> jnp.ndarray:
    """Host/trace-time packing: (T,3)x3 -> (T_pad, 12) SoA rows
    [p0, e1, e2, 0...]. Padding rows are degenerate (all zero => det 0)."""
    t = p0.shape[0]
    e1 = p1 - p0
    e2 = p2 - p0
    tri = jnp.concatenate(
        [p0, e1, e2, jnp.zeros((t, 3), p0.dtype)], axis=1
    )
    pad = (-t) % pad_to
    if pad:
        tri = jnp.concatenate([tri, jnp.zeros((pad, 12), tri.dtype)], axis=0)
    return tri
