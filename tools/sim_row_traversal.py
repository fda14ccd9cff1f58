"""Estimate the win from per-ROW (128-ray) traversal state vs the
current per-TILE (1024-ray) shared traversal.

Method (CPU, no TPU needed): render one bounce's real rays on the CPU
backend, sort them with the production sort key, then for each ray
compute the MINIMAL leaf set a perfect traversal visits = leaves whose
AABB intersects the segment [tmin, t_hit]. The per-tile union of those
sets is what the shared-stack kernel tests today; the per-row union is
what an 8-way independent-row kernel would test (its iteration count is
the MAX row count in the tile, since rows run in lockstep).

Prints tris-tested ratios; >2x means the per-row kernel is worth
building.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from pupiloptixlab_tpu.accel.intersect import (
        _ray_sort_key_leaf, intersect_closest,
    )
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render import bsdf as bsdf_mod
    from pupiloptixlab_tpu.render import rng as rngm
    from pupiloptixlab_tpu.render.camera import generate_rays
    from pupiloptixlab_tpu.render.geometry import get_local_geometry
    from pupiloptixlab_tpu.render.sampling import (
        MAX_DISTANCE, RAY_OFFSET, to_local, to_world,
    )
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene("/root/repo/data/mesh_env.xml")
    scene.sensor.film.w, scene.sensor.film.h = 960, 540  # quarter 1080p
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    n = config.width * config.height

    st = rngm.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(1))
    st, (jx, jy) = rngm.next_floats(st, 2)
    ro, rd = generate_rays(camera, config.width, config.height, jx, jy)
    tmin = jnp.full(n, RAY_OFFSET, jnp.float32)
    tmax = jnp.full(n, MAX_DISTANCE, jnp.float32)
    hit = intersect_closest(ro, rd, tmin, tmax, data, config, coherent=False)
    geo = get_local_geometry(data, hit, ro, rd, config.sphere_count)
    local = bsdf_mod.get_local_bsdf(
        data.materials, data.textures, geo.mat_id, geo.uv, config.mat_types,
        config.mat_tex_kinds, config.mat_tex_filters,
    )
    st, us = rngm.next_floats(st, 3)
    wo_local = to_local(-rd, geo.normal)
    wi_s, _, _, _ = bsdf_mod.sample(local, wo_local, *us, config.mat_types)
    brd = to_world(wi_s, geo.normal)
    bro = geo.position
    active = np.asarray(hit.hit_mask)
    oprim = jnp.where(hit.kind == 0, hit.prim, -1)

    # bounce hit distances (for the segment clamp)
    bhit = intersect_closest(
        bro, brd, tmin, tmax, data, config, coherent=False,
        origin_prim=oprim, mask=hit.hit_mask,
    )
    bt = np.asarray(jnp.where(bhit.hit_mask, bhit.t, MAX_DISTANCE))

    # sort by the production key
    (k1,) = _ray_sort_key_leaf(oprim, brd, config, hit.hit_mask)
    order = np.argsort(np.asarray(k1), kind="stable")

    ox = np.asarray(bro.x)[order]
    oy = np.asarray(bro.y)[order]
    oz = np.asarray(bro.z)[order]
    dx = np.asarray(brd.x)[order]
    dy = np.asarray(brd.y)[order]
    dz = np.asarray(brd.z)[order]
    seg = bt[order]
    live = active[order]

    # leaf AABBs from the packed tri table (BVH order, tcl groups)
    tri = np.asarray(data.tris.packed)  # (T, 12) p0, e1, e2
    tcl = config.bvh_tcl
    T = tri.shape[0]
    n_leaves = T // tcl
    p0 = tri[:, 0:3]
    p1 = p0 + tri[:, 3:6]
    p2 = p0 + tri[:, 6:9]
    lo = np.minimum(np.minimum(p0, p1), p2).reshape(n_leaves, tcl, 3)
    hi = np.maximum(np.maximum(p0, p1), p2).reshape(n_leaves, tcl, 3)
    # ignore degenerate padding rows (all-zero)
    degen = (np.abs(tri[:, 3:9]).sum(1) < 1e-12).reshape(n_leaves, tcl)
    big = np.where(degen[:, :, None], np.inf, 1.0)
    llo = np.where(degen[:, :, None], np.inf, lo).min(axis=1)
    lhi = np.where(degen[:, :, None], -np.inf, hi).max(axis=1)
    del big

    TILE, ROW = 1024, 128
    n_tiles = 64  # sample
    rs = np.random.RandomState(0)
    tile_ids = rs.choice(len(ox) // TILE, n_tiles, replace=False)

    def leaves_hit(o, d, smax):
        """(R,) rays vs (L,) leaf boxes -> (R, L) bool segment test."""
        inv = np.where(np.abs(d) < 1e-12, 1e12 * np.sign(d + 1e-30), 1.0 / d)
        t0 = (llo[None, :, :] - o[:, None, :]) * inv[:, None, :]
        t1 = (lhi[None, :, :] - o[:, None, :]) * inv[:, None, :]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        return (tn <= tf) & (tf > 0) & (tn < smax[:, None])

    tile_sum = row_sum = rowmax_sum = live_tiles = 0
    for ti in tile_ids:
        s = ti * TILE
        o = np.stack([ox[s:s+TILE], oy[s:s+TILE], oz[s:s+TILE]], 1)
        d = np.stack([dx[s:s+TILE], dy[s:s+TILE], dz[s:s+TILE]], 1)
        lv = live[s:s+TILE]
        if not lv.any():
            continue
        live_tiles += 1
        m = leaves_hit(o, d, seg[s:s+TILE] * 1.001)
        m[~lv] = False
        tile_union = m.any(axis=0).sum()
        row_counts = [
            m[r*ROW:(r+1)*ROW].any(axis=0).sum() for r in range(TILE // ROW)
        ]
        tile_sum += tile_union
        row_sum += np.mean(row_counts)
        rowmax_sum += np.max(row_counts)

    print(f"live tiles sampled: {live_tiles}")
    print(f"mean leaves/tile union (current kernel): {tile_sum/live_tiles:.1f}")
    print(f"mean leaves/row union  (ideal 128-ray): {row_sum/live_tiles:.1f}")
    print(f"mean MAX row count     (lockstep cost): {rowmax_sum/live_tiles:.1f}")
    print(f"per-row kernel speedup bound (tile/max-row): "
          f"{tile_sum/max(rowmax_sum,1):.2f}x")


if __name__ == "__main__":
    main()
