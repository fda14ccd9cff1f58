"""Hit-point local geometry reconstruction.

Parity: optix::Geometry::GetHitLocalGeometry (render/geometry.h:48-96):
barycentric interpolation of normal/uv for triangles, analytic normals
for spheres in their instance frames, and the twosided flip that turns
the shading normal toward the viewer (geometry.h:91-95).

All per-triangle attributes come back in ONE packed-row gather
(one-hot matmul on the MXU, accel/gather.py) instead of ~20 scalar table
lookups. Triangle hit positions use ray parameterization (ro + t*rd)
rather than re-interpolating vertex positions — equivalent up to fp32
rounding, and the reference's 1e-3 ray offsets dominate either way.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from pupiloptixlab_tpu.accel.gather import gather_rows
from pupiloptixlab_tpu.accel.intersect import Hit
from pupiloptixlab_tpu.flatten.types import (
    MAT_TWOSIDED,
    TRI_EMITTER,
    TRI_MAT,
    TRI_N0,
    TRI_N1,
    TRI_N2,
    TRI_UV0,
    TRI_UV1,
    TRI_UV2,
    SceneData,
)
from pupiloptixlab_tpu.render.sampling import dot, normalize, sphere_texcoord


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass
class LocalGeometry:
    position: jnp.ndarray    # (N,3)
    normal: jnp.ndarray      # (N,3) shading normal (twosided-flipped)
    uv: jnp.ndarray          # (N,2)
    mat_id: jnp.ndarray      # (N,) i32
    emitter_id: jnp.ndarray  # (N,) i32 (-1 when not emissive)


def get_local_geometry(
    scene: SceneData,
    hit: Hit,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    sphere_count: int = -1,
) -> LocalGeometry:
    """``sphere_count`` (static) skips the sphere branch when 0; -1 means
    unknown (emit both branches)."""
    spheres = scene.spheres
    prim = hit.prim
    is_sphere = hit.kind == 1

    position = ro + hit.t[:, None] * rd

    # triangles: one packed gather for normals/uv/ids
    attrs = gather_rows(scene.tris.attrs, prim)
    w0 = (1.0 - hit.u - hit.v)[:, None]
    w1 = hit.u[:, None]
    w2 = hit.v[:, None]
    nrm_tri = normalize(
        attrs[:, TRI_N0] * w0 + attrs[:, TRI_N1] * w1 + attrs[:, TRI_N2] * w2
    )
    uv_tri = attrs[:, TRI_UV0] * w0 + attrs[:, TRI_UV1] * w1 + attrs[:, TRI_UV2] * w2
    mat_tri = attrs[:, TRI_MAT].astype(jnp.int32)
    emit_tri = attrs[:, TRI_EMITTER].astype(jnp.int32)

    if sphere_count != 0:
        # spheres (geometry.h:82-89); tiny table -> native gathers are fine
        sp = jnp.minimum(prim, spheres.w2o.shape[0] - 1)
        w2o = spheres.w2o[sp]
        local = jnp.einsum("nij,nj->ni", w2o[:, :, :3], position) + w2o[:, :, 3]
        nrm_sph = normalize(jnp.einsum("nji,nj->ni", w2o[:, :, :3], local))
        nrm_sph = jnp.where(spheres.flip_normal[sp][:, None], -nrm_sph, nrm_sph)
        uv_sph = sphere_texcoord(normalize(local))
        normal = jnp.where(is_sphere[:, None], nrm_sph, nrm_tri)
        uv = jnp.where(is_sphere[:, None], uv_sph, uv_tri)
        mat_id = jnp.where(is_sphere, spheres.mat_id[sp], mat_tri)
        emitter_id = jnp.where(is_sphere, spheres.emitter_id[sp], emit_tri)
    else:
        normal, uv, mat_id, emitter_id = nrm_tri, uv_tri, mat_tri, emit_tri

    mat_id = jnp.where(hit.hit_mask, mat_id, 0)
    emitter_id = jnp.where(hit.hit_mask, emitter_id, -1)

    # twosided flip toward viewer (geometry.h:91-95)
    twosided = scene.materials.packed[:, MAT_TWOSIDED][mat_id] > 0.5
    flip = (dot(-rd, normal) < 0.0) & twosided
    normal = jnp.where(flip[:, None], -normal, normal)

    return LocalGeometry(
        position=position, normal=normal, uv=uv, mat_id=mat_id, emitter_id=emitter_id
    )
