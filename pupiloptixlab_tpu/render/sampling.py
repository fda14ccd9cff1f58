"""Device sampling / frame / misc helpers.

Parity: optix/util.h — uniform triangle/sphere/hemisphere and
cosine-hemisphere sampling with pdfs, Reflect/Refract, the Pixar ONB
(BuildONB/ToLocal/ToWorld), sphere uv, ACES tone map, luminance, and the
balance-heuristic ``mis_weight(x, y) = x / (x + y)``.

All functions are batched: vectors are (..., 3) float32 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6
MAX_DISTANCE = 1e16
RAY_OFFSET = 1e-3  # reference t_min (main.cu:79)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v):
    return v / jnp.maximum(length(v), 1e-20)[..., None]


def is_zero(v, eps: float = EPS):
    """abs-all-below-eps test (optix/util.h:169-180)."""
    if v.ndim and v.shape[-1] == 3:
        return jnp.all(jnp.abs(v) < eps, axis=-1)
    return jnp.abs(v) < eps


def mis_weight(x, y):
    """Balance heuristic (optix/util.h:165-167)."""
    return x / (x + y)


def luminance(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


# -- sampling ---------------------------------------------------------------

def uniform_sample_triangle(u1, u2):
    """Barycentric factors (x, y, z) for v0, v1, v2 (optix/util.h:33-37)."""
    s = jnp.sqrt(u1)
    return jnp.stack([1.0 - s, s * (1.0 - u2), u2 * s], axis=-1)


def uniform_sample_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), z], axis=-1)


def cosine_sample_hemisphere(u1, u2):
    sin_t = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), z], axis=-1)


def cosine_hemisphere_pdf(v):
    return jnp.where(v[..., 2] > 0.0, v[..., 2] / jnp.pi, 0.0)


def uniform_sample_hemisphere(u1, u2):
    z = 1.0 - 2.0 * u1
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.abs(z)], axis=-1)


def uniform_hemisphere_pdf(v):
    return jnp.where(v[..., 2] > 0.0, 0.5 / jnp.pi, 0.0)


# -- reflection / refraction (local frame, z-up) -----------------------------

def reflect_z(v):
    """Mirror about the z axis (optix/util.h:74-78)."""
    return jnp.stack([-v[..., 0], -v[..., 1], v[..., 2]], axis=-1)


def reflect(v, n):
    """Mirror ``v`` about normal ``n``; both point away from the surface."""
    return -v + 2.0 * dot(v, n)[..., None] * n


def refract_z(v, cos_theta_t, eta):
    """Smooth refraction about z (optix/util.h:80-83)."""
    scale = -jnp.where(cos_theta_t < 0.0, 1.0 / eta, eta)
    out = jnp.stack([scale * v[..., 0], scale * v[..., 1], cos_theta_t], axis=-1)
    return normalize(out)


def refract(v, n, cos_theta_t, eta):
    """Refraction about microfacet normal n (optix/util.h:85-88)."""
    eta = jnp.where(cos_theta_t < 0.0, 1.0 / eta, eta)
    return n * (dot(v, n) * eta + cos_theta_t)[..., None] - v * eta[..., None]


# -- orthonormal basis (Pixar, optix/util.h:95-115) --------------------------

def build_onb(n):
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    b1 = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    b2 = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return b1, b2


def to_local(v, n):
    b1, b2 = build_onb(n)
    return jnp.stack([dot(v, b1), dot(v, b2), dot(v, n)], axis=-1)


def to_world(v, n):
    b1, b2 = build_onb(n)
    return b1 * v[..., 0:1] + b2 * v[..., 1:2] + n * v[..., 2:3]


# -- misc --------------------------------------------------------------------

def sphere_texcoord(local_p):
    """Unit-sphere uv (optix/util.h:117-128)."""
    phi = jnp.arctan2(local_p[..., 1], local_p[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    theta = jnp.arccos(jnp.clip(local_p[..., 2], -1.0, 1.0))
    return jnp.stack([phi * 0.5 / jnp.pi, theta / jnp.pi], axis=-1)


def aces_tonemap(color, adapted_lum: float = 1.0):
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = color * adapted_lum
    return (x * (a * x + b)) / (x * (c * x + d) + e)


def gamma_correct(color, gamma: float = 2.2):
    return jnp.power(jnp.maximum(color, 0.0), 1.0 / gamma)
