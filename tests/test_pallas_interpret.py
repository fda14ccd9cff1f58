"""Interpret-mode parity for the Pallas TPU kernels.

The test suite pins JAX_PLATFORMS=cpu (conftest), so the production
dispatchers in accel/gather.py and accel/intersect.py branch to their XLA
fallbacks and the Pallas kernels themselves would otherwise never run.
These tests execute the kernels via ``interpret=True`` — which still
simulates dtype casts (the round-1 bf16 table-quantization bug reproduces
under interpret) — and assert they match the native-XLA oracles on
randomized tables, CDFs and ray/triangle sets.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.accel.gather import (
    _count_less_pallas,
    _gather_cols_pallas,
    _transpose_cols_pallas,
)
from pupiloptixlab_tpu.accel.pallas_intersect import (
    LANES,
    MAX_DISTANCE,
    sweep_triangles,
)


@pytest.mark.parametrize("t_rows", [7, 300, 2048, 5000])
def test_gather_cols_interpret_matches_xla(t_rows):
    r = np.random.RandomState(t_rows)
    c = 12
    table = r.randn(t_rows, c).astype(np.float32) * 100.0
    # integer ids packed as floats — the exactness-critical payload
    # (TRI_MAT / TRI_EMITTER / TEX_OFFSET columns): must survive above 256
    table[:, 3] = r.randint(0, 300000, size=t_rows).astype(np.float32)
    idx = r.randint(0, t_rows, size=3000).astype(np.int32)

    want = table[idx].T  # XLA/numpy oracle
    got = np.asarray(
        _gather_cols_pallas(jnp.asarray(table.T), jnp.asarray(idx), interpret=True)
    )
    np.testing.assert_array_equal(got, want)  # bit-for-bit, not allclose


@pytest.mark.parametrize("n,c", [(1024, 24), (5000, 12), (2048, 1), (3000, 128)])
def test_transpose_cols_interpret_matches_xla(n, c):
    """The big-table gather fallback's (N, C) -> (C, N) relayout kernel
    (wide-table gathers consumed plane-wise; see gather.py note)."""
    r = np.random.RandomState(n + c)
    x = r.randn(n, c).astype(np.float32) * 100.0
    x[:, 0] = r.randint(0, 300000, size=n).astype(np.float32)
    got = np.asarray(_transpose_cols_pallas(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, x.T)


def test_gather_cols_interpret_clamps_out_of_range():
    table = np.arange(40, dtype=np.float32).reshape(10, 4)
    idx = np.array([-3, 0, 9, 12], np.int32)
    got = np.asarray(
        _gather_cols_pallas(jnp.asarray(table.T), jnp.asarray(idx), interpret=True)
    )
    want = table[np.clip(idx, 0, 9)].T
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("t_rows", [5, 512, 1300])
def test_count_less_interpret_matches_searchsorted(t_rows):
    r = np.random.RandomState(t_rows)
    table = np.sort(r.rand(t_rows).astype(np.float32))
    q = r.rand(4000).astype(np.float32)
    # include exact table values: side='left' semantics must hold
    q[:t_rows] = table[::-1][:min(t_rows, 4000)]
    want = np.searchsorted(table, q, side="left").astype(np.int32)
    got = np.asarray(
        _count_less_pallas(jnp.asarray(table), jnp.asarray(q), interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def _random_tris(r, t):
    p0 = r.rand(t, 3).astype(np.float32) * 2.0 - 1.0
    e1 = (r.rand(t, 3).astype(np.float32) - 0.5) * 0.8
    e2 = (r.rand(t, 3).astype(np.float32) - 0.5) * 0.8
    return p0, e1, e2


def _brute_force(p0, e1, e2, ro, rd, tmin, tmax):
    """Numpy Moller-Trumbore oracle over all (ray, tri) pairs."""
    pv = np.cross(rd[:, None, :], e2[None, :, :])
    det = np.einsum("tj,ntj->nt", e1, pv)
    inv = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
    tv = ro[:, None, :] - p0[None, :, :]
    u = np.einsum("ntj,ntj->nt", tv, pv) * inv
    qv = np.cross(tv, e1[None, :, :])
    v = np.einsum("nj,ntj->nt", rd, qv) * inv
    t = np.einsum("tj,ntj->nt", e2, qv) * inv
    ok = (
        (np.abs(det) >= 1e-12)
        & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > tmin[:, None]) & (t < tmax[:, None])
    )
    t = np.where(ok, t, MAX_DISTANCE)
    idx = t.argmin(axis=1).astype(np.int32)
    tbest = t.min(axis=1)
    idx = np.where(tbest < MAX_DISTANCE, idx, -1)
    return tbest, idx


@pytest.mark.parametrize("t_tris,label", [(128, "grid"), (512, "culled")])
def test_sweep_triangles_interpret_matches_brute_force(t_tris, label):
    """128 tris = 2 chunks -> the small-scene grid kernel; 512 tris =
    8 chunks -> the scalar-prefetch culled kernel (n_groups==1 path)."""
    r = np.random.RandomState(7 + t_tris)
    tc = 64
    p0, e1, e2 = _random_tris(r, t_tris)
    packed = np.zeros((t_tris, 12), np.float32)
    packed[:, 0:3], packed[:, 3:6], packed[:, 6:9] = p0, e1, e2
    # chunk AABBs over the triangle verts, matching the flattener layout
    verts = np.stack([p0, p0 + e1, p0 + e2], axis=1).reshape(-1, tc * 3, 3)
    boxes = np.zeros((t_tris // tc, 8), np.float32)
    boxes[:, 0:3] = verts.min(axis=1)
    boxes[:, 3:6] = verts.max(axis=1)

    n = LANES * 8
    ro = np.zeros((n, 3), np.float32)
    ro[:, 2] = -3.0
    ro += (r.rand(n, 3).astype(np.float32) - 0.5) * 0.4
    rd = r.rand(n, 3).astype(np.float32) - 0.5
    rd[:, 2] += 1.0
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    tmin = np.full(n, 1e-3, np.float32)
    tmax = np.full(n, MAX_DISTANCE, np.float32)

    want_t, want_i = _brute_force(p0, e1, e2, ro, rd, tmin, tmax)
    got_t, got_i = sweep_triangles(
        *(jnp.asarray(a) for a in (ro[:, 0], ro[:, 1], ro[:, 2],
                                   rd[:, 0], rd[:, 1], rd[:, 2], tmin, tmax)),
        jnp.asarray(packed), jnp.asarray(boxes),
        rb=8, tc=tc, interpret=True,
    )
    got_t, got_i = np.asarray(got_t), np.asarray(got_i)
    hit = want_i >= 0
    assert hit.any() and (~hit).any(), "fixture should mix hits and misses"
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_t[hit], want_t[hit], rtol=2e-5, atol=1e-5)
    assert (got_t[~hit] >= MAX_DISTANCE).all()
