"""RNG stream quality + Vec3 algebra unit tests."""

import jax.numpy as jnp
import numpy as np

from pupiloptixlab_tpu.render import rng
from pupiloptixlab_tpu.render.vec import Vec3, where


def test_rng_uniformity_and_independence():
    n = 100_000
    state = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(7))
    state, (u1, u2) = rng.next_floats(state, 2)
    a, b = np.asarray(u1), np.asarray(u2)
    assert 0.0 <= a.min() and a.max() < 1.0
    assert abs(a.mean() - 0.5) < 0.01
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.02  # successive draws decorrelated
    # lane independence: neighboring pixels decorrelated
    assert abs(np.corrcoef(a[:-1], a[1:])[0, 1]) < 0.02


def test_rng_seed_changes_stream():
    n = 1024
    s1 = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(1))
    s2 = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(2))
    _, u1 = rng.next_float(s1)
    _, u2 = rng.next_float(s2)
    assert not np.allclose(np.asarray(u1), np.asarray(u2))


def test_rng_matches_reference_formula():
    """One lane must reproduce the scalar TEA(4)+LCG of cuda/random.h."""
    def scalar_tea(v0, v1, rounds=4):
        s0 = 0
        M = 0xFFFFFFFF
        for _ in range(rounds):
            s0 = (s0 + 0x9E3779B9) & M
            v0 = (v0 + ((((v1 << 4) & M) + 0xA341316C) ^ ((v1 + s0) & M) ^ (((v1 >> 5) + 0xC8013EA4) & M))) & M
            v1 = (v1 + ((((v0 << 4) & M) + 0xAD90777D) ^ ((v0 + s0) & M) ^ (((v0 >> 5) + 0x7E95761E) & M))) & M
        return v0

    def scalar_next(seed):
        seed = (1664525 * seed + 1013904223) & 0xFFFFFFFF
        return seed, (seed & 0x00FFFFFF) / 0x01000000

    pix, sd = 12345, 999
    state = rng.tea_init(jnp.asarray([pix], jnp.uint32), jnp.uint32(sd))
    assert int(state[0]) == scalar_tea(pix, sd)
    s, u = rng.next_float(state)
    s_ref, u_ref = scalar_next(scalar_tea(pix, sd))
    assert int(s[0]) == s_ref
    assert abs(float(u[0]) - u_ref) < 1e-9


def test_vec3_algebra():
    a = Vec3(jnp.asarray([1.0]), jnp.asarray([2.0]), jnp.asarray([3.0]))
    b = Vec3(jnp.asarray([4.0]), jnp.asarray([5.0]), jnp.asarray([6.0]))
    assert float(a.dot(b)[0]) == 32.0
    c = a.cross(b)
    np.testing.assert_allclose(
        [float(c.x[0]), float(c.y[0]), float(c.z[0])], [-3, 6, -3]
    )
    n = a.normalized()
    np.testing.assert_allclose(float(n.length()[0]), 1.0, rtol=1e-6)
    s = where(jnp.asarray([True]), a, b)
    assert float(s.x[0]) == 1.0
    np.testing.assert_allclose((a - b).to_array(), [[-3, -3, -3]])
    np.testing.assert_allclose((a * 2.0).to_array(), [[2, 4, 6]])
    np.testing.assert_allclose((-a).to_array(), [[-1, -2, -3]])


def test_vec3_is_pytree():
    import jax

    a = Vec3(jnp.ones(4), jnp.zeros(4), jnp.ones(4))
    leaves = jax.tree_util.tree_leaves(a)
    assert len(leaves) == 3
    out = jax.jit(lambda v: v * 2.0)(a)
    np.testing.assert_allclose(np.asarray(out.x), 2.0)
