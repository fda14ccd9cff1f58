"""Wide-BVH builder invariants + interpret-mode traversal parity.

The BVH is the GAS/optixTrace analog (reference world/gas_manager.cpp +
example/path_tracer/main.cu:77-82): accel/bvh.py builds 8-wide
median-split node tables at flatten time and accel/pallas_bvh.py walks
them per ray tile. CPU tests run the kernels via interpret=True against
a numpy brute-force oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pupiloptixlab_tpu.accel.bvh import build_bvh, max_stack_depth, pick_leaf_size
from pupiloptixlab_tpu.accel.pallas_bvh import (
    MAX_DISTANCE,
    STACK_SIZE,
    bvh_anyhit,
    bvh_closest,
)


def _random_soup(r, t, tcl):
    t_pad = ((t + tcl - 1) // tcl) * tcl
    p0 = np.zeros((t_pad, 3), np.float32)
    p1 = np.zeros_like(p0)
    p2 = np.zeros_like(p0)
    p0[:t] = r.rand(t, 3).astype(np.float32) * 4 - 2
    p1[:t] = p0[:t] + (r.rand(t, 3).astype(np.float32) - 0.5) * 0.4
    p2[:t] = p0[:t] + (r.rand(t, 3).astype(np.float32) - 0.5) * 0.4
    return p0, p1, p2, t_pad


def _rays(r, n):
    ro = np.zeros((n, 3), np.float32)
    ro[:, 2] = -4.0
    ro += (r.rand(n, 3).astype(np.float32) - 0.5)
    rd = r.rand(n, 3).astype(np.float32) - 0.5
    rd[:, 2] += 1.2
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    tmin = np.full(n, 1e-3, np.float32)
    tmax = np.full(n, MAX_DISTANCE, np.float32)
    return ro, rd, tmin, tmax


def _brute(p0, e1, e2, vmask, ro, rd, tmin, tmax):
    pv = np.cross(rd[:, None, :], e2[None, :, :])
    det = np.einsum("tj,ntj->nt", e1, pv)
    inv = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
    tv = ro[:, None, :] - p0[None, :, :]
    u = np.einsum("ntj,ntj->nt", tv, pv) * inv
    qv = np.cross(tv, e1[None, :, :])
    v = np.einsum("nj,ntj->nt", rd, qv) * inv
    t = np.einsum("tj,ntj->nt", e2, qv) * inv
    ok = (
        (np.abs(det) >= 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > tmin[:, None]) & (t < tmax[:, None]) & vmask[None, :]
    )
    t = np.where(ok, t, MAX_DISTANCE)
    i = t.argmin(1).astype(np.int32)
    tb = t.min(1)
    return tb, np.where(tb < MAX_DISTANCE, i, -1)


def test_builder_invariants():
    r = np.random.RandomState(11)
    tcl = 16
    p0, p1, p2, t_pad = _random_soup(r, 3000, tcl)
    bvh = build_bvh(p0, p1, p2, 3000, tcl)

    # the order is a permutation of all padded rows
    assert np.array_equal(np.sort(bvh.order), np.arange(t_pad))
    ids = bvh.child.reshape(-1, 8)
    boxes = bvh.boxes.reshape(-1, 8, 8)
    assert ids.shape[0] == bvh.n_nodes and boxes.shape[0] == bvh.n_nodes
    # every leaf start is TCL-aligned and leaves tile the row range once
    empty = boxes[..., 0] >= 1e30  # never-hit point boxes
    leaf_starts = -(ids[(ids < 0) & ~empty]) - 1
    assert np.array_equal(np.sort(leaf_starts), np.arange(0, t_pad, tcl))
    # internal child ids point forward (root = node 0)
    internal = (ids > 0) & ~empty
    rows = np.broadcast_to(np.arange(ids.shape[0])[:, None], ids.shape)
    assert (ids[internal] > rows[internal]).all()
    # node boxes contain their leaf triangles
    lo = np.minimum(np.minimum(p0, p1), p2)[bvh.order]
    hi = np.maximum(np.maximum(p0, p1), p2)[bvh.order]
    valid = bvh.order < 3000
    picks = np.random.RandomState(0).choice(bvh.n_nodes, 10)
    for ni in picks:
        for k in range(8):
            cid = ids[ni, k]
            if cid >= 0 or empty[ni, k]:
                continue
            s = -cid - 1
            m = valid[s:s + tcl]
            if m.any():
                assert (boxes[ni, k, 0:3] <= lo[s:s + tcl][m].min(0) + 1e-6).all()
                assert (boxes[ni, k, 3:6] >= hi[s:s + tcl][m].max(0) - 1e-6).all()
    # traversal stack bound
    assert max_stack_depth(bvh.child) < STACK_SIZE


def test_pick_leaf_size_scales():
    assert pick_leaf_size(20 * 1024) == 16  # round-3 frame-time optimum
    assert pick_leaf_size(20 * 1024, min_tcl=32) == 32  # streamed scenes
    big = pick_leaf_size(4 * 1024 * 1024)  # 4M tris still fits SMEM
    assert (4 * 1024 * 1024 // big) // 7 + 8 <= 160 * 1024 // 36


@pytest.mark.parametrize("t_tris", [900, 5000])
@pytest.mark.parametrize("pop2", [False, True])
def test_bvh_closest_matches_brute_force(t_tris, pop2):
    r = np.random.RandomState(5 + t_tris)
    tcl = 16
    p0, p1, p2, t_pad = _random_soup(r, t_tris, tcl)
    bvh = build_bvh(p0, p1, p2, t_tris, tcl)
    o = bvh.order
    p0o, p1o, p2o = p0[o], p1[o], p2[o]
    packed = np.concatenate(
        [p0o, p1o - p0o, p2o - p0o, np.zeros((t_pad, 3), np.float32)], 1
    )
    n = 1024
    ro, rd, tmin, tmax = _rays(r, n)
    want_t, want_i = _brute(p0o, p1o - p0o, p2o - p0o, o < t_tris, ro, rd, tmin, tmax)

    args = [jnp.asarray(a) for a in (ro[:, 0], ro[:, 1], ro[:, 2],
                                     rd[:, 0], rd[:, 1], rd[:, 2], tmin, tmax)]
    bargs = (jnp.asarray(packed), jnp.asarray(bvh.child),
             jnp.asarray(bvh.axis), jnp.asarray(bvh.boxes))
    got_t, got_i = bvh_closest(*args, *bargs, rb=4, tcl=tcl, interpret=True,
                               pop2=pop2)
    got_t, got_i = np.asarray(got_t), np.asarray(got_i)
    hit = want_i >= 0
    assert hit.any() and (~hit).any()
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_t[hit], want_t[hit], rtol=3e-5, atol=1e-5)

    occ = np.asarray(bvh_anyhit(*args, *bargs, rb=4, tcl=tcl, interpret=True,
                                pop2=pop2))
    np.testing.assert_array_equal(occ, hit)


def test_bvh_closest_mxu_matches_classic():
    """The MXU-MT variant (leaf Moller-Trumbore as one HIGHEST-precision
    dot_general against the linear-form table) must agree with the
    classic per-leaf kernel. Off by default (measured slower on TPU:
    492 vs 407 ms mesh_env at tcl=32); kept as the PUPIL_MXU_MT A/B
    knob."""
    r = np.random.RandomState(77)
    tcl = 32
    p0, p1, p2, t_pad = _random_soup(r, 2100, tcl)
    bvh = build_bvh(p0, p1, p2, 2100, tcl)
    o = bvh.order
    p0o, p1o, p2o = p0[o], p1[o], p2[o]
    packed = np.concatenate(
        [p0o, p1o - p0o, p2o - p0o, np.zeros((t_pad, 3), np.float32)], 1
    )
    n = 1024
    ro, rd, tmin, tmax = _rays(r, n)
    args = [jnp.asarray(a) for a in (ro[:, 0], ro[:, 1], ro[:, 2],
                                     rd[:, 0], rd[:, 1], rd[:, 2], tmin, tmax)]
    bargs = (jnp.asarray(packed), jnp.asarray(bvh.child),
             jnp.asarray(bvh.axis), jnp.asarray(bvh.boxes))
    t_c, i_c = bvh_closest(*args, *bargs, rb=4, tcl=tcl, interpret=True)
    t_m, i_m = bvh_closest(*args, *bargs, rb=4, tcl=tcl, interpret=True,
                           mxu=True)
    np.testing.assert_array_equal(np.asarray(i_m), np.asarray(i_c))
    hit = np.asarray(i_c) >= 0
    np.testing.assert_allclose(np.asarray(t_m)[hit], np.asarray(t_c)[hit],
                               rtol=3e-5, atol=1e-5)


def test_anyhit_respects_tmax():
    """Occlusion must test only (tmin, tmax) — a hit beyond the light
    distance is NOT occlusion (render/emitter.h:91-100 semantics)."""
    r = np.random.RandomState(2)
    tcl = 16
    # a 2k-tri wall at z=2 (big enough that flatten would use the BVH)
    t = 2048
    p0 = np.zeros((t, 3), np.float32)
    g = np.stack(np.meshgrid(np.arange(64), np.arange(32)), -1).reshape(-1, 2)
    p0[:, 0] = g[:, 0] * 0.25 - 8.0
    p0[:, 1] = g[:, 1] * 0.25 - 4.0
    p0[:, 2] = 2.0
    p1 = p0 + np.array([0.3, 0, 0], np.float32)
    p2 = p0 + np.array([0, 0.3, 0], np.float32)
    bvh = build_bvh(p0, p1, p2, t, tcl)
    o = bvh.order
    packed = np.concatenate(
        [p0[o], (p1 - p0)[o], (p2 - p0)[o], np.zeros((t, 3), np.float32)], 1
    )
    n = 1024
    ro = np.zeros((n, 3), np.float32)
    rd = np.zeros((n, 3), np.float32)
    rd[:, 2] = 1.0
    tmin = np.full(n, 1e-3, np.float32)
    near = np.full(n, 1.0, np.float32)   # light closer than the wall
    far = np.full(n, 10.0, np.float32)   # light beyond the wall
    args = lambda tmx: [jnp.asarray(a) for a in (
        ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2], tmin, tmx)]
    bargs = (jnp.asarray(packed), jnp.asarray(bvh.child),
             jnp.asarray(bvh.axis), jnp.asarray(bvh.boxes))
    occ_near = np.asarray(bvh_anyhit(*args(near), *bargs, rb=4, tcl=tcl, interpret=True))
    occ_far = np.asarray(bvh_anyhit(*args(far), *bargs, rb=4, tcl=tcl, interpret=True))
    assert not occ_near.any()
    assert occ_far.all()


def test_flatten_builds_bvh_for_mesh_scene():
    from pupiloptixlab_tpu.flatten import flatten_scene
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene("/root/repo/data/mesh_env.xml")
    scene.sensor.film.w, scene.sensor.film.h = 64, 64
    data, config = flatten_scene(scene)
    assert config.bvh_nodes > 0 and config.bvh_tcl >= 16
    assert data.tris.bvh_child.shape[0] == config.bvh_nodes * 8
    assert data.tris.bvh_boxes.shape == (config.bvh_nodes * 8, 8)
    # the root's children boxes must jointly contain the whole soup
    boxes = np.asarray(data.tris.bvh_boxes).reshape(-1, 8, 8)
    root_lo = boxes[0, :, 0:3].min(0)
    root_hi = boxes[0, :, 3:6].max(0)
    packed = np.asarray(data.tris.packed)
    p0 = packed[:, 0:3]
    e1 = packed[:, 3:6]
    e2 = packed[:, 6:9]
    nz = (np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0
    pts = np.concatenate([p0[nz], (p0 + e1)[nz], (p0 + e2)[nz]], 0)
    assert (root_lo <= pts.min(0) + 1e-4).all()
    assert (root_hi >= pts.max(0) - 1e-4).all()


@pytest.mark.heavy
def test_bvh_streaming_matches_resident():
    """Forced HBM-streaming traversal (leaf DMA) must agree with the
    VMEM-resident kernel exactly (interpret mode emulates the DMA).

    Heavy tier: interpret mode dispatches each traversal op eagerly per
    while-loop iteration — minutes on the 1-core host even at this size."""
    # interpret mode executes the traversal op-by-op per while iteration,
    # so the sizes here are the smallest that still exercise a multi-level
    # tree + the DMA ring (runtime, not coverage, is the constraint)
    r = np.random.RandomState(11)
    tcl = 16
    p0, p1, p2, t_pad = _random_soup(r, 512, tcl)
    bvh = build_bvh(p0, p1, p2, 512, tcl)
    o = bvh.order
    p0o, p1o, p2o = p0[o], p1[o], p2[o]
    tri = jnp.asarray(np.concatenate(
        [p0o, p1o - p0o, p2o - p0o, np.zeros((t_pad, 3), np.float32)], 1
    ))
    n = 1024
    ro, rd, tmin, tmax = _rays(r, n)
    args = (
        *[jnp.asarray(a) for a in (ro[:, 0], ro[:, 1], ro[:, 2],
                                   rd[:, 0], rd[:, 1], rd[:, 2], tmin, tmax)],
        tri,
        jnp.asarray(bvh.child), jnp.asarray(bvh.axis), jnp.asarray(bvh.boxes),
    )
    t_a, i_a = bvh_closest(*args, tcl=tcl, interpret=True, stream=False)
    t_b, i_b = bvh_closest(*args, tcl=tcl, interpret=True, stream=True)
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
    occ_a = bvh_anyhit(*args, tcl=tcl, interpret=True, stream=False)
    occ_b = bvh_anyhit(*args, tcl=tcl, interpret=True, stream=True)
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))


@pytest.mark.heavy
def test_bvh_streaming_packed_matches_resident():
    """Power-of-two tcl streams via the PACKED table (_pack_stream:
    4 tris per 128-lane row, tcl/4-row leaf DMAs) — must agree with the
    resident kernel exactly, including the argmin index decode (for
    DISTINCT hit distances; on exact ties the packed j-order may pick a
    different coincident triangle — documented in _mt_packed, and random
    soup produces no exact ties)."""
    r = np.random.RandomState(7)
    tcl = 32
    p0, p1, p2, t_pad = _random_soup(r, 500, tcl)
    bvh = build_bvh(p0, p1, p2, 500, tcl)
    o = bvh.order
    p0o, p1o, p2o = p0[o], p1[o], p2[o]
    tri = jnp.asarray(np.concatenate(
        [p0o, p1o - p0o, p2o - p0o, np.zeros((t_pad, 3), np.float32)], 1
    ))
    n = 1024
    ro, rd, tmin, tmax = _rays(r, n)
    args = (
        *[jnp.asarray(a) for a in (ro[:, 0], ro[:, 1], ro[:, 2],
                                   rd[:, 0], rd[:, 1], rd[:, 2], tmin, tmax)],
        tri,
        jnp.asarray(bvh.child), jnp.asarray(bvh.axis), jnp.asarray(bvh.boxes),
    )
    t_a, i_a = bvh_closest(*args, tcl=tcl, interpret=True, stream=False)
    t_b, i_b = bvh_closest(*args, tcl=tcl, interpret=True, stream=True)
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
    occ_a = bvh_anyhit(*args, tcl=tcl, interpret=True, stream=False)
    occ_b = bvh_anyhit(*args, tcl=tcl, interpret=True, stream=True)
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))


@pytest.mark.heavy
def test_bvh_streaming_count_iters():
    """Streamed count_iters: t matches, idx carries pops*65536+drains
    per tile, with drains >= the tile's true leaf visits.

    Heavy tier: see test_bvh_streaming_matches_resident."""
    r = np.random.RandomState(13)
    tcl = 16
    p0, p1, p2, t_pad = _random_soup(r, 512, tcl)
    bvh = build_bvh(p0, p1, p2, 512, tcl)
    o = bvh.order
    tri = jnp.asarray(np.concatenate(
        [p0[o], p1[o] - p0[o], p2[o] - p0[o],
         np.zeros((t_pad, 3), np.float32)], 1
    ))
    n = 1024
    ro, rd, tmin, tmax = _rays(r, n)
    args = (
        *[jnp.asarray(a) for a in (ro[:, 0], ro[:, 1], ro[:, 2],
                                   rd[:, 0], rd[:, 1], rd[:, 2], tmin, tmax)],
        tri,
        jnp.asarray(bvh.child), jnp.asarray(bvh.axis), jnp.asarray(bvh.boxes),
    )
    t_a, _ = bvh_closest(*args, tcl=tcl, interpret=True, stream=True)
    t_c, code = bvh_closest(
        *args, tcl=tcl, interpret=True, stream=True, count_iters=True
    )
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_c))
    code = int(np.asarray(code).reshape(-1)[0])
    pops, drains = code // 65536, code % 65536
    assert pops > 0 and drains > 0
    # a tile can't drain fewer leaves than the tree holds on its path;
    # sanity: drains bounded by total leaves + ring size
    assert drains <= 512 // tcl + 16
