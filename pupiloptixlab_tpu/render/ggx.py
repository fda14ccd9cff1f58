"""GGX microfacet distribution: Smith masking, NDF, VNDF sampling.

Parity: render/material/ggx.h. The reference ships the full float2-alpha
(anisotropic) Smith/VNDF math (ggx.h:66-103) but its loaders never
populate alpha_v from XML; here the anisotropic path is implemented AND
loaded (scene/materials.py parses ``alpha_u``/``alpha_v``), going beyond
the reference. Every function takes ``alpha`` (= alpha_u) and an
optional ``alpha_v`` (None = isotropic, alpha_v := alpha). Vectors are
Vec3 planes in the local shading frame (z-up, tangent = the hit's
deterministic ONB x-axis); everything batched over (N,).
"""

from __future__ import annotations

import jax.numpy as jnp

from pupiloptixlab_tpu.render.vec import Vec3, where


def _axes(alpha, alpha_v):
    return alpha, (alpha if alpha_v is None else alpha_v)


def smith_lambda(w: Vec3, alpha, alpha_v=None):
    au, av = _axes(alpha, alpha_v)
    z2 = jnp.maximum(w.z * w.z, 1e-12)
    a2 = (w.x * w.x * au * au + w.y * w.y * av * av) / z2
    return (-1.0 + jnp.sqrt(1.0 + a2)) / 2.0


def g1(w: Vec3, alpha, alpha_v=None):
    return 1.0 / (1.0 + smith_lambda(w, alpha, alpha_v))


def g(wi: Vec3, wo: Vec3, alpha, alpha_v=None):
    return g1(wi, alpha, alpha_v) * g1(wo, alpha, alpha_v)


def d(wh: Vec3, alpha, alpha_v=None):
    au, av = _axes(alpha, alpha_v)
    au2 = jnp.maximum(au * au, 1e-12)
    av2 = jnp.maximum(av * av, 1e-12)
    t = wh.x * wh.x / au2 + wh.y * wh.y / av2 + wh.z * wh.z
    return 1.0 / jnp.maximum(jnp.pi * jnp.sqrt(au2 * av2) * t * t, 1e-20)


def pdf(wo: Vec3, wh: Vec3, alpha, alpha_v=None):
    """VNDF pdf: D * G1(wo) * (wo.wh) / |wo.z| (ggx.h:31-37)."""
    return d(wh, alpha, alpha_v) * g1(wo, alpha, alpha_v) * wo.dot(wh) / jnp.maximum(
        jnp.abs(wo.z), 1e-12
    )


def sample(wo: Vec3, alpha, u1, u2, alpha_v=None) -> Vec3:
    """Heitz VNDF visible-normal sampling (ggx.h:39-57; anisotropic
    stretch per ggx.h:66-79)."""
    au, av = _axes(alpha, alpha_v)
    vh = Vec3(au * wo.x, av * wo.y, wo.z).normalized()
    lensq = vh.x * vh.x + vh.y * vh.y
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-18))
    # tangent frame around vh; degenerate when wo ~ +z
    ok = wo.z < 0.9999
    t1 = where(
        ok,
        Vec3(-vh.y * inv_len, vh.x * inv_len, jnp.zeros_like(inv_len)),
        Vec3.full(inv_len.shape[0], 1.0, 0.0, 0.0),
    )
    t2 = vh.cross(t1)

    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh.z)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2

    pz = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = Vec3(
        p1 * t1.x + p2 * t2.x + pz * vh.x,
        p1 * t1.y + p2 * t2.y + pz * vh.y,
        p1 * t1.z + p2 * t2.z + pz * vh.z,
    )
    return Vec3(au * nh.x, av * nh.y, jnp.maximum(nh.z, 0.0)).normalized()
