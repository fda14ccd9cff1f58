"""GGX microfacet distribution: Smith masking, NDF, VNDF sampling.

Parity: render/material/ggx.h (isotropic path, visible-normal sampling on
— the reference's default via GGX_Sample_Visible_Area). Vectors are Vec3
planes in the local shading frame (z-up); everything batched over (N,).
"""

from __future__ import annotations

import jax.numpy as jnp

from pupiloptixlab_tpu.render.vec import Vec3, where


def smith_lambda(w: Vec3, alpha):
    a2 = alpha * alpha
    z2 = jnp.maximum(w.z * w.z, 1e-12)
    return (-1.0 + jnp.sqrt(1.0 + (w.x * w.x + w.y * w.y) * a2 / z2)) / 2.0


def g1(w: Vec3, alpha):
    return 1.0 / (1.0 + smith_lambda(w, alpha))


def g(wi: Vec3, wo: Vec3, alpha):
    return g1(wi, alpha) * g1(wo, alpha)


def d(wh: Vec3, alpha):
    a2 = jnp.maximum(alpha * alpha, 1e-12)
    t = (wh.x * wh.x + wh.y * wh.y) / a2 + wh.z * wh.z
    return 1.0 / jnp.maximum(jnp.pi * a2 * t * t, 1e-20)


def pdf(wo: Vec3, wh: Vec3, alpha):
    """VNDF pdf: D * G1(wo) * (wo.wh) / |wo.z| (ggx.h:31-37)."""
    return d(wh, alpha) * g1(wo, alpha) * wo.dot(wh) / jnp.maximum(
        jnp.abs(wo.z), 1e-12
    )


def sample(wo: Vec3, alpha, u1, u2) -> Vec3:
    """Heitz VNDF visible-normal sampling (ggx.h:39-57)."""
    vh = Vec3(alpha * wo.x, alpha * wo.y, wo.z).normalized()
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
    return Vec3(alpha * nh.x, alpha * nh.y, jnp.maximum(nh.z, 0.0)).normalized()
