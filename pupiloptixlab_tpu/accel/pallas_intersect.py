"""Pallas TPU ray/triangle sweep — the RT-core replacement's hot kernel.

Replaces `optixTrace`'s hardware BVH traversal: a VMEM-resident sweep
over Morton-ordered triangle chunks with per-chunk AABB culling (an
LBVH-lite):

* Grid: one step per ray tile (RB rows x 128 lanes of SoA ray planes).
  The whole packed triangle table rides in VMEM (48 B/triangle; ~300k
  triangles fit), and the kernel walks its chunks with an in-kernel
  fori_loop — no per-chunk grid overhead.
* Culling: the flattener sorts triangles by centroid Morton code, so each
  TC-triangle chunk is spatially compact. Chunk AABBs arrive as a
  scalar-prefetched SMEM table; the kernel slab-tests each AABB against
  the whole ray tile and `pl.when`-skips the Moller-Trumbore loop when no
  ray can improve its current closest hit. Coherent tiles (camera,
  shadow) skip most chunks — block-level, divergence-free traversal.
* The running closest hit lives in the output VMEM block; HBM sees one
  read of rays/tris and one write of (t, index) per sweep.

Barycentrics are *not* carried through the sweep; the winner triangle is
re-tested once afterwards in XLA (one test per ray).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mosaic_params import ray_grid_params

MAX_DISTANCE = 1e16
_DET_EPS = 1e-12

LANES = 128
DEFAULT_RB = 8    # ray rows per grid step (RB*128 rays)
DEFAULT_TC = 64   # triangles per chunk (sublane dim)


def _kernel_grid(tri_ref, rox, roy, roz, rdx, rdy, rdz, tmn, tmx, tbest, ibest):
    """Small-scene kernel: grid = (ray tiles, tri chunks), no culling.
    The accumulator output block is revisited across the chunk dimension."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        tbest[:] = jnp.full_like(tbest[:], MAX_DISTANCE)
        ibest[:] = jnp.full_like(ibest[:], -1)

    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]

    def col(i):
        return tri_ref[:, i][:, None, None]

    p0x, p0y, p0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)

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

    hit = (
        (jnp.abs(det) >= _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmn[:])
        & (t < tmx[:])
    )
    t = jnp.where(hit, t, MAX_DISTANCE)

    tmin_c = jnp.min(t, axis=0)
    jmin = jnp.argmin(t, axis=0)
    better = tmin_c < tbest[:]
    tbest[:] = jnp.where(better, tmin_c, tbest[:])
    ibest[:] = jnp.where(better, c * tri_ref.shape[0] + jmin, ibest[:])


def _kernel_grid_any(tri_ref, rox, roy, roz, rdx, rdy, rdz, tmn, tmx, occ):
    """Small-scene ANY-HIT kernel: no closest-hit bookkeeping; occluded
    lanes are sticky across the chunk grid (shadow rays,
    render/emitter.h:91-100 terminate-on-first-hit)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        occ[:] = jnp.zeros_like(occ[:])

    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]

    def col(i):
        return tri_ref[:, i][:, None, None]

    p0x, p0y, p0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)

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

    hit = (
        (jnp.abs(det) >= _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmn[:])
        & (t < tmx[:])
    )
    hit_any = jnp.any(hit, axis=0)
    occ[:] = jnp.where(hit_any, 1, occ[:])


@functools.partial(jax.jit, static_argnames=("rb", "tc", "interpret"))
def sweep_triangles_any(
    rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
    tri: jnp.ndarray,
    boxes: jnp.ndarray,
    rb: int = DEFAULT_RB,
    tc: int = DEFAULT_TC,
    interpret: bool = False,
):
    """Occlusion-only chunk sweep; returns (N,) i32 (1 = occluded).
    Small scenes only (the BVH path has its own any-hit kernel); saves
    the closest-hit min/argmin bookkeeping on every shadow sweep."""
    n = rox.shape[0]
    t_total = tri.shape[0]
    assert n % (rb * LANES) == 0, n
    rows = n // LANES
    n_chunks = t_total // tc

    def plane(x):
        return x.reshape(rows, LANES)

    grid = (rows // rb, max(n_chunks, 1))
    ray_spec = pl.BlockSpec(
        (rb, LANES), lambda r, c: (r, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (tc, tri.shape[1]), lambda r, c: (c, 0), memory_space=pltpu.VMEM
    )
    occ = pl.pallas_call(
        _kernel_grid_any,
        grid=grid,
        in_specs=[tri_spec] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
        compiler_params=ray_grid_params(extra_arbitrary=1),
        cost_estimate=pl.CostEstimate(
            flops=50 * n * t_total, bytes_accessed=n * 36 + t_total * 48,
            transcendentals=0,
        ),
    )(
        tri,
        plane(rox), plane(roy), plane(roz),
        plane(rdx), plane(rdy), plane(rdz),
        plane(tmin), plane(tmax),
    )
    return occ.reshape(n)


GROUP = 32  # chunks per super-chunk (second culling level)


def _make_kernel(tc: int, n_chunks: int, n_groups: int):
    def kernel(box_ref, sbox_ref, tri_ref, rox, roy, roz, rdx, rdy, rdz,
               irx, iry, irz, tmn, tmx, tbest, ibest):
        tbest[:] = jnp.full_like(tbest[:], MAX_DISTANCE)
        ibest[:] = jnp.full_like(ibest[:], -1)

        ox, oy, oz = rox[:], roy[:], roz[:]
        dx, dy, dz = rdx[:], rdy[:], rdz[:]
        ix, iy, iz = irx[:], iry[:], irz[:]
        tmn_v, tmx_v = tmn[:], tmx[:]

        def box_test(ref, base):
            """Slab test of box ref[base:base+6] against the ray tile."""
            bx0, by0, bz0 = ref[base + 0], ref[base + 1], ref[base + 2]
            bx1, by1, bz1 = ref[base + 3], ref[base + 4], ref[base + 5]
            tx0 = (bx0 - ox) * ix
            tx1 = (bx1 - ox) * ix
            ty0 = (by0 - oy) * iy
            ty1 = (by1 - oy) * iy
            tz0 = (bz0 - oz) * iz
            tz1 = (bz1 - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), tmn_v),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), jnp.minimum(tbest[:], tmx_v)),
            )
            return jnp.any(tn <= tf)

        def tri_chunk(c):
            """Moller-Trumbore over chunk c (traced index ok)."""
            rows = tri_ref[pl.ds(c * tc, tc), :]

            def col(i):
                return rows[:, i][:, None, None]

            p0x, p0y, p0z = col(0), col(1), col(2)
            e1x, e1y, e1z = col(3), col(4), col(5)
            e2x, e2y, e2z = col(6), col(7), col(8)

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

            hit = (
                (jnp.abs(det) >= _DET_EPS)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > tmn_v)
                & (t < tmx_v)
            )
            t = jnp.where(hit, t, MAX_DISTANCE)

            tmin_c = jnp.min(t, axis=0)   # (RB, 128)
            jmin = jnp.argmin(t, axis=0)  # (RB, 128) i32
            better = tmin_c < tbest[:]
            tbest[:] = jnp.where(better, tmin_c, tbest[:])
            ibest[:] = jnp.where(better, c * tc + jmin, ibest[:])

        if n_groups <= 1:
            # small scene: static unrolled chunk loop, no culling overhead
            for c in range(n_chunks):
                tri_chunk(c)
            return

        def group_body(g, _):
            @pl.when(box_test(sbox_ref, g * 8))
            def _():
                def chunk_body(c, _):
                    @pl.when(box_test(box_ref, c * 8))
                    def _():
                        tri_chunk(c)

                    return _

                jax.lax.fori_loop(
                    g * GROUP,
                    jnp.minimum((g + 1) * GROUP, n_chunks),
                    chunk_body,
                    None,
                )

            return _

        jax.lax.fori_loop(0, n_groups, group_body, None)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rb", "tc", "interpret")
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
    tri: jnp.ndarray,     # (T, 12): p0 xyz, e1 xyz, e2 xyz, pad
    boxes: jnp.ndarray,   # (T/tc, 8): chunk AABB min xyz, max xyz, pad
    rb: int = DEFAULT_RB,
    tc: int = DEFAULT_TC,
    interpret: bool = False,
):
    """Closest-hit sweep over ray component planes (N,) each.
    Returns (t (N,), idx (N,) i32; idx<0 = miss).

    N must be a multiple of rb*128 and T a multiple of tc (pad upstream;
    padding triangles must be degenerate, padding chunks get inverted
    never-hit boxes, padding rays get tmax<=tmin).
    """
    n = rox.shape[0]
    t_total = tri.shape[0]
    assert n % (rb * LANES) == 0, n
    assert t_total % tc == 0, t_total
    rows = n // LANES
    n_chunks = t_total // tc

    def plane(x):
        return x.reshape(rows, LANES)

    def safe_inv(d):
        mag = jnp.maximum(jnp.abs(d), 1e-12)
        return jnp.where(d < 0, -1.0, 1.0) / mag

    if n_chunks <= 4:
        # small scene: chunk-per-grid-step sweep, no culling machinery
        grid = (rows // rb, n_chunks)
        ray_spec2 = pl.BlockSpec(
            (rb, LANES), lambda r, c: (r, 0), memory_space=pltpu.VMEM
        )
        tri_spec2 = pl.BlockSpec(
            (tc, tri.shape[1]), lambda r, c: (c, 0), memory_space=pltpu.VMEM
        )
        out_spec2 = pl.BlockSpec(
            (rb, LANES), lambda r, c: (r, 0), memory_space=pltpu.VMEM
        )
        tbest, ibest = pl.pallas_call(
            _kernel_grid,
            grid=grid,
            in_specs=[tri_spec2] + [ray_spec2] * 8,
            out_specs=(out_spec2, out_spec2),
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            ),
            interpret=interpret,
            compiler_params=ray_grid_params(extra_arbitrary=1),
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

    def ray_map(r, *_):
        return (r, 0)

    def tri_map(r, *_):
        return (0, 0)

    ray_spec = pl.BlockSpec((rb, LANES), ray_map, memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(
        (t_total, tri.shape[1]), tri_map, memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((rb, LANES), ray_map, memory_space=pltpu.VMEM)

    # super-chunk boxes: min/max over each GROUP of chunk boxes
    n_groups = (n_chunks + GROUP - 1) // GROUP if n_chunks > GROUP else 1
    pad_c = n_groups * GROUP - n_chunks
    boxes_p = boxes
    if pad_c and n_groups > 1:
        never = jnp.tile(
            jnp.array([[1e30, 1e30, 1e30, -1e30, -1e30, -1e30, 0, 0]], boxes.dtype),
            (pad_c, 1),
        )
        boxes_p = jnp.concatenate([boxes, never], axis=0)
    if n_groups > 1:
        grp = boxes_p.reshape(n_groups, GROUP, 8)
        sboxes = jnp.concatenate(
            [grp[:, :, 0:3].min(axis=1), grp[:, :, 3:6].max(axis=1),
             jnp.zeros((n_groups, 2), boxes.dtype)],
            axis=1,
        )
    else:
        sboxes = jnp.zeros((1, 8), boxes.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # flat chunk + super-chunk AABBs in SMEM
        grid=(rows // rb,),
        in_specs=[tri_spec] + [ray_spec] * 11,
        out_specs=(out_spec, out_spec),
    )

    tbest, ibest = pl.pallas_call(
        _make_kernel(tc, n_chunks, n_groups),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=ray_grid_params(),
        cost_estimate=pl.CostEstimate(
            flops=55 * n * t_total, bytes_accessed=n * 52 + t_total * 48,
            transcendentals=0,
        ),
    )(
        boxes_p.reshape(-1), sboxes.reshape(-1), tri,
        plane(rox), plane(roy), plane(roz),
        plane(rdx), plane(rdy), plane(rdz),
        plane(safe_inv(rdx)), plane(safe_inv(rdy)), plane(safe_inv(rdz)),
        plane(tmin), plane(tmax),
    )
    return tbest.reshape(n), ibest.reshape(n)
