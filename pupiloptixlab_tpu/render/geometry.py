"""Hit-point local geometry reconstruction.

Parity: optix::Geometry::GetHitLocalGeometry (render/geometry.h:48-96):
barycentric interpolation of position/normal/uv for triangles, analytic
normals for spheres in their instance frames, and the twosided flip that
turns the shading normal toward the viewer (geometry.h:91-95).
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from pupiloptixlab_tpu.accel.intersect import Hit
from pupiloptixlab_tpu.flatten.types import SceneData
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
    scene: SceneData, hit: Hit, ro: jnp.ndarray, rd: jnp.ndarray
) -> LocalGeometry:
    tris, spheres = scene.tris, scene.spheres
    prim = hit.prim
    is_sphere = hit.kind == 1

    # triangles
    w0 = (1.0 - hit.u - hit.v)[:, None]
    w1 = hit.u[:, None]
    w2 = hit.v[:, None]
    pos_tri = tris.p0[prim] * w0 + tris.p1[prim] * w1 + tris.p2[prim] * w2
    nrm_tri = normalize(
        tris.n0[prim] * w0 + tris.n1[prim] * w1 + tris.n2[prim] * w2
    )
    uv_tri = tris.uv0[prim] * w0 + tris.uv1[prim] * w1 + tris.uv2[prim] * w2

    # spheres (geometry.h:82-89)
    sp = jnp.minimum(prim, spheres.w2o.shape[0] - 1)
    pos_sph = ro + hit.t[:, None] * rd
    w2o = spheres.w2o[sp]
    local = (
        jnp.einsum("nij,nj->ni", w2o[:, :, :3], pos_sph) + w2o[:, :, 3]
    )
    nrm_sph = normalize(jnp.einsum("nji,nj->ni", w2o[:, :, :3], local))
    nrm_sph = jnp.where(
        spheres.flip_normal[sp][:, None], -nrm_sph, nrm_sph
    )
    uv_sph = sphere_texcoord(normalize(local))

    position = jnp.where(is_sphere[:, None], pos_sph, pos_tri)
    normal = jnp.where(is_sphere[:, None], nrm_sph, nrm_tri)
    uv = jnp.where(is_sphere[:, None], uv_sph, uv_tri)
    mat_id = jnp.where(is_sphere, spheres.mat_id[sp], tris.mat_id[prim])
    emitter_id = jnp.where(is_sphere, spheres.emitter_id[sp], tris.emitter_id[prim])
    mat_id = jnp.where(hit.hit_mask, mat_id, 0)
    emitter_id = jnp.where(hit.hit_mask, emitter_id, -1)

    # twosided flip toward viewer (geometry.h:91-95)
    twosided = scene.materials.twosided[mat_id]
    flip = (dot(-rd, normal) < 0.0) & twosided
    normal = jnp.where(flip[:, None], -normal, normal)

    return LocalGeometry(
        position=position, normal=normal, uv=uv, mat_id=mat_id, emitter_id=emitter_id
    )
