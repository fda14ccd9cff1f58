"""Fresnel terms (render/material/fresnel.h parity), batched jnp."""

from __future__ import annotations

import jax.numpy as jnp


def dielectric_reflectance(eta, cos_theta_i):
    """Exact dielectric Fresnel; returns (F, cos_theta_t).

    ``cos_theta_t`` carries the transmitted cosine with the reference's
    sign convention (fresnel.h:7-29): opposite sign to cos_theta_i; 0 on
    total internal reflection (F = 1).
    """
    scale = jnp.where(cos_theta_i > 0.0, 1.0 / eta, eta)
    cos_t2 = 1.0 - (1.0 - cos_theta_i * cos_theta_i) * scale * scale
    tir = cos_t2 <= 0.0

    ci = jnp.abs(cos_theta_i)
    ct = jnp.sqrt(jnp.maximum(cos_t2, 0.0))
    rs = (ci - eta * ct) / jnp.maximum(ci + eta * ct, 1e-20)
    rp = (eta * ci - ct) / jnp.maximum(eta * ci + ct, 1e-20)
    f = 0.5 * (rs * rs + rp * rp)

    cos_theta_t = jnp.where(cos_theta_i > 0.0, -ct, ct)
    return jnp.where(tir, 1.0, f), jnp.where(tir, 0.0, cos_theta_t)


def conductor_reflectance(eta, k, cos_theta_i):
    """Scalar conductor Fresnel (fresnel.h:31-48); broadcasts over rgb."""
    c2 = cos_theta_i * cos_theta_i
    s2 = 1.0 - c2
    s4 = s2 * s2

    t1 = eta * eta - k * k - s2
    a2pb2 = jnp.sqrt(jnp.maximum(t1 * t1 + 4.0 * k * k * eta * eta, 0.0))
    a = jnp.sqrt(jnp.maximum(0.5 * (a2pb2 + t1), 0.0))

    term1 = a2pb2 + c2
    term2 = 2.0 * a * cos_theta_i
    rs2 = (term1 - term2) / jnp.maximum(term1 + term2, 1e-20)

    term3 = a2pb2 * c2 + s4
    term4 = term2 * s2
    rp2 = rs2 * (term3 - term4) / jnp.maximum(term3 + term4, 1e-20)
    return 0.5 * (rp2 + rs2)


def conductor_reflectance_rgb(eta, k, cos_theta_i):
    """Vec3 eta/k with per-lane scalar cos (fresnel.h:50-56)."""
    from pupiloptixlab_tpu.render.vec import Vec3

    return Vec3(
        conductor_reflectance(eta.x, k.x, cos_theta_i),
        conductor_reflectance(eta.y, k.y, cos_theta_i),
        conductor_reflectance(eta.z, k.z, cos_theta_i),
    )


def diffuse_reflectance(eta):
    """Hemispherical diffuse Fresnel fit (fresnel.h:58-85)."""
    low = -1.4399 * eta * eta + 0.7099 * eta + 0.6681 + 0.0636 / eta
    ie = 1.0 / eta
    high = (
        0.919317
        - 3.4793 * ie
        + 6.75335 * ie**2
        - 7.80989 * ie**3
        + 4.98554 * ie**4
        - 1.36881 * ie**5
    )
    return jnp.where(eta < 1.0, low, high)
