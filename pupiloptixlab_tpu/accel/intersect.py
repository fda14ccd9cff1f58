"""Ray/scene intersection — the OptiX accel-build/traverse replacement.

The reference offloads traversal to RT cores via GAS/IAS handles
(world/gas_manager.cpp, world/ias_manager.cpp) and `optixTrace`. On TPU,
intersection is a data-parallel sweep: every ray tests triangle chunks
(Moller-Trumbore, watertight enough at fp32 with the reference's 1e-3 ray
offsets) and the analytic unit-sphere primitives in their instance frames
(supporting ellipsoids, like OptiX sphere primitives under instance
transforms). The sweep is a `lax.scan` over triangle chunks carrying the
running closest hit, so the (N_rays x T) intermediate never materializes
beyond one chunk — XLA fuses the elementwise test into the reduction.

A BVH variant (accel/bvh.py) accelerates large scenes; this brute-force
path is the correctness oracle and remains optimal for small scenes.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from pupiloptixlab_tpu.flatten.types import RenderConfig, SceneData
from pupiloptixlab_tpu.render.sampling import MAX_DISTANCE

_DET_EPS = 1e-12


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass
class Hit:
    t: jnp.ndarray        # (N,) hit distance; MAX_DISTANCE on miss
    prim: jnp.ndarray     # (N,) i32 primitive index (tri or sphere)
    kind: jnp.ndarray     # (N,) i32: 0 tri, 1 sphere, -1 miss
    u: jnp.ndarray        # (N,) barycentric u (weight of p1)
    v: jnp.ndarray        # (N,) barycentric v (weight of p2)

    @property
    def hit_mask(self) -> jnp.ndarray:
        return self.kind >= 0


def _tri_chunk_test(ro, rd, p0, p1, p2, tmin, tmax):
    """Moller-Trumbore: rays (N,3) x tris (C,3) -> (N,C) t/u/v/hit."""
    e1 = p1 - p0  # (C,3)
    e2 = p2 - p0
    pvec = jnp.cross(rd[:, None, :], e2[None, :, :])  # (N,C,3)
    det = jnp.sum(e1[None, :, :] * pvec, axis=-1)  # (N,C)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _DET_EPS, _DET_EPS, det)
    tvec = ro[:, None, :] - p0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(rd[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) >= _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin[:, None])
        & (t < tmax[:, None])
    )
    return t, u, v, hit


def _pick_chunk(n_rays: int, n_tris: int, budget: int = 1 << 22) -> int:
    """Chunk triangles so the (N, C) intermediates stay ~budget elements."""
    c = max(budget // max(n_rays, 1), 8)
    return min(c, n_tris)


def _sweep_tris(ro, rd, tmin, tmax, scene: SceneData, best_t, best_prim, best_kind, best_u, best_v):
    n_tris = scene.tris.p0.shape[0]
    n_rays = ro.shape[0]
    chunk = _pick_chunk(n_rays, n_tris)
    pad = (-n_tris) % chunk
    def padded(a):
        if pad:
            return jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        return a

    p0 = padded(scene.tris.p0).reshape(-1, chunk, 3)
    p1 = padded(scene.tris.p1).reshape(-1, chunk, 3)
    p2 = padded(scene.tris.p2).reshape(-1, chunk, 3)

    def body(carry, tri_chunk):
        bt, bp, bk, bu, bv = carry
        c0, c1, c2, base = tri_chunk
        t, u, v, hit = _tri_chunk_test(ro, rd, c0, c1, c2, tmin, tmax)
        t = jnp.where(hit, t, MAX_DISTANCE)
        j = jnp.argmin(t, axis=1)  # (N,)
        rows = jnp.arange(t.shape[0])
        tj = t[rows, j]
        better = tj < bt
        bt = jnp.where(better, tj, bt)
        bp = jnp.where(better, base + j.astype(jnp.int32), bp)
        bk = jnp.where(better, 0, bk)
        bu = jnp.where(better, u[rows, j], bu)
        bv = jnp.where(better, v[rows, j], bv)
        return (bt, bp, bk, bu, bv), None

    bases = (jnp.arange(p0.shape[0]) * chunk).astype(jnp.int32)
    carry = (best_t, best_prim, best_kind, best_u, best_v)
    carry, _ = jax.lax.scan(body, carry, (p0, p1, p2, bases))
    return carry


def _sphere_tests(ro, rd, scene: SceneData, tmin, tmax):
    """Analytic unit-sphere hits in each sphere's object frame.

    Returns (t (N,S), hit (N,S)). t is the world-parameterized distance
    (the object-space transform preserves the ray parameter).
    """
    w2o = scene.spheres.w2o  # (S,3,4)
    ro_o = jnp.einsum("sij,nj->nsi", w2o[:, :, :3], ro) + w2o[None, :, :, 3]
    rd_o = jnp.einsum("sij,nj->nsi", w2o[:, :, :3], rd)
    a = jnp.sum(rd_o * rd_o, axis=-1)
    b = jnp.sum(ro_o * rd_o, axis=-1)
    c = jnp.sum(ro_o * ro_o, axis=-1) - 1.0
    disc = b * b - a * c
    valid = (disc >= 0.0) & (a > _DET_EPS)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / jnp.maximum(a, _DET_EPS)
    t0 = (-b - sq) * inv_a
    t1 = (-b + sq) * inv_a
    in0 = (t0 > tmin[:, None]) & (t0 < tmax[:, None])
    in1 = (t1 > tmin[:, None]) & (t1 < tmax[:, None])
    t = jnp.where(in0, t0, t1)
    hit = valid & (in0 | in1)
    return jnp.where(hit, t, MAX_DISTANCE), hit


# Tunables for the Pallas sweep (read at trace time; retracing picks up
# changes). Defaults chosen by on-chip frame-level sweeps.
PALLAS_RB = 8
PALLAS_UNROLLED = False


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _recompute_barycentrics(ro, rd, idx, scene: SceneData):
    """One Moller-Trumbore re-test of the winning triangle per ray —
    cheaper than carrying u/v through the sweep."""
    safe = jnp.maximum(idx, 0)
    row = scene.tris.packed[safe]  # (N,12)
    p0, e1, e2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
    pvec = jnp.cross(rd, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) < _DET_EPS, _DET_EPS, det)
    tvec = ro - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(rd * qvec, axis=-1) * inv
    return u, v


def _sweep_tris_pallas(ro, rd, tmin, tmax, scene: SceneData):
    from pupiloptixlab_tpu.accel.pallas_intersect import LANES, sweep_triangles

    n = ro.shape[0]
    block = LANES * PALLAS_RB
    pad = (-n) % block
    if pad:
        zero3 = jnp.zeros((pad, 3), jnp.float32)
        ro = jnp.concatenate([ro, zero3], 0)
        rd = jnp.concatenate([rd, zero3], 0)
        tmin = jnp.concatenate([tmin, jnp.zeros(pad, jnp.float32)], 0)
        tmax = jnp.concatenate([tmax, jnp.zeros(pad, jnp.float32)], 0)
    t, idx = sweep_triangles(
        ro, rd, tmin, tmax, scene.tris.packed,
        rb=PALLAS_RB, tc=64, unrolled=PALLAS_UNROLLED,
    )
    t, idx = t[:n], idx[:n]
    u, v = _recompute_barycentrics(ro[:n], rd[:n], idx, scene)
    hit = idx >= 0
    return (
        jnp.where(hit, t, MAX_DISTANCE),
        jnp.where(hit, idx, 0),
        jnp.where(hit, 0, -1),
        jnp.where(hit, u, 0.0),
        jnp.where(hit, v, 0.0),
    )


def intersect_closest(
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    scene: SceneData,
    config: RenderConfig,
) -> Hit:
    n = ro.shape[0]
    best_t = jnp.full(n, MAX_DISTANCE, jnp.float32)
    best_prim = jnp.zeros(n, jnp.int32)
    best_kind = jnp.full(n, -1, jnp.int32)
    best_u = jnp.zeros(n, jnp.float32)
    best_v = jnp.zeros(n, jnp.float32)

    if config.tri_count > 0 and _use_pallas():
        best_t, best_prim, best_kind, best_u, best_v = _sweep_tris_pallas(
            ro, rd, tmin, tmax, scene
        )
    elif config.tri_count > 0:
        best_t, best_prim, best_kind, best_u, best_v = _sweep_tris(
            ro, rd, tmin, tmax, scene, best_t, best_prim, best_kind, best_u, best_v
        )
    if config.sphere_count > 0:
        t_s, hit_s = _sphere_tests(ro, rd, scene, tmin, tmax)
        j = jnp.argmin(t_s, axis=1)
        rows = jnp.arange(n)
        tj = t_s[rows, j]
        better = hit_s[rows, j] & (tj < best_t)
        best_t = jnp.where(better, tj, best_t)
        best_prim = jnp.where(better, j.astype(jnp.int32), best_prim)
        best_kind = jnp.where(better, 1, best_kind)
    return Hit(t=best_t, prim=best_prim, kind=best_kind, u=best_u, v=best_v)


def intersect_any(
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    scene: SceneData,
    config: RenderConfig,
) -> jnp.ndarray:
    """Occlusion test (shadow rays): any hit in (tmin, tmax) -> True."""
    hit = intersect_closest(ro, rd, tmin, tmax, scene, config)
    return hit.hit_mask
