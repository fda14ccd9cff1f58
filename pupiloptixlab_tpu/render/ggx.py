"""GGX microfacet distribution: Smith masking, NDF, VNDF sampling.

Parity: render/material/ggx.h (isotropic path, visible-normal sampling on
— the reference's default via GGX_Sample_Visible_Area). All functions are
batched over the leading dims; vectors are (..., 3) in the local shading
frame (z-up).
"""

from __future__ import annotations

import jax.numpy as jnp

from pupiloptixlab_tpu.render.sampling import normalize


def smith_lambda(w, alpha):
    a2 = alpha * alpha
    v2 = w * w
    z2 = jnp.maximum(v2[..., 2], 1e-12)
    return (-1.0 + jnp.sqrt(1.0 + (v2[..., 0] + v2[..., 1]) * a2 / z2)) / 2.0


def g1(w, alpha):
    return 1.0 / (1.0 + smith_lambda(w, alpha))


def g(wi, wo, alpha):
    return g1(wi, alpha) * g1(wo, alpha)


def d(wh, alpha):
    a2 = jnp.maximum(alpha * alpha, 1e-12)
    v2 = wh * wh
    t = (v2[..., 0] + v2[..., 1]) / a2 + v2[..., 2]
    return 1.0 / jnp.maximum(jnp.pi * a2 * t * t, 1e-20)


def pdf(wo, wh, alpha):
    """VNDF pdf: D * G1(wo) * (wo.wh) / |wo.z| (ggx.h:31-37)."""
    won = jnp.sum(wo * wh, axis=-1)
    return d(wh, alpha) * g1(wo, alpha) * won / jnp.maximum(jnp.abs(wo[..., 2]), 1e-12)


def sample(wo, alpha, u1, u2):
    """Heitz VNDF visible-normal sampling (ggx.h:39-57)."""
    a = alpha[..., None]
    vh = normalize(
        jnp.stack([a[..., 0] * wo[..., 0], a[..., 0] * wo[..., 1], wo[..., 2]], axis=-1)
    )
    # Tangent frame around vh; degenerate when vh ~ +z.
    lensq = vh[..., 0] * vh[..., 0] + vh[..., 1] * vh[..., 1]
    # cross((0,0,1), vh) = (-vh.y, vh.x, 0)
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-18))
    t1 = jnp.where(
        (wo[..., 2] < 0.9999)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len, jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], vh.dtype), vh.shape),
    )
    t2 = jnp.cross(vh, t1)

    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2

    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))[..., None] * vh
    )
    ne = jnp.stack(
        [a[..., 0] * nh[..., 0], a[..., 0] * nh[..., 1], jnp.maximum(nh[..., 2], 0.0)],
        axis=-1,
    )
    return normalize(ne)
