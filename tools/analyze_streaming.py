"""Model the streamed-traversal design space for big_env on the CPU.

For real bounce-1 rays (production sort key, 1024-ray tiles) computes,
per candidate leaf size tcl: the ideal per-tile LEAF UNION (DMA count
lower bound), the tested-triangle volume (MT cost proxy), and the
ADJACENCY rate — the fraction of union leaves whose successor row range
is also in the union (the win available to run-coalesced DMA: fetching
2 adjacent leaves per DMA halves fetches where adjacency holds).

Usage: JAX_PLATFORMS=cpu python tools/analyze_streaming.py [scene.xml]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
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

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pupil_big_env/big_env.xml"
    film_w = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    scene = load_scene(path)
    scene.sensor.film.w = film_w
    scene.sensor.film.h = film_w * 9 // 16
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    n = config.width * config.height
    print(f"tris={config.tri_count} tcl={config.bvh_tcl} film={n}", flush=True)

    st = rngm.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(1))
    st, (jx, jy) = rngm.next_floats(st, 2)
    ro, rd = generate_rays(camera, config.width, config.height, jx, jy)
    tmin = jnp.full(n, RAY_OFFSET, jnp.float32)
    tmax = jnp.full(n, MAX_DISTANCE, jnp.float32)
    hit = intersect_closest(ro, rd, tmin, tmax, data, config, coherent=False)
    print("primary sweep done", flush=True)
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

    bhit = intersect_closest(
        bro, brd, tmin, tmax, data, config, coherent=False,
        origin_prim=oprim, mask=hit.hit_mask,
    )
    bt = np.asarray(jnp.where(bhit.hit_mask, bhit.t, MAX_DISTANCE))
    print("bounce sweep done", flush=True)

    (k1,) = _ray_sort_key_leaf(oprim, brd, config, hit.hit_mask)

    # -- sort-key variants (offline search over origin/direction splits).
    # The production key groups origins by leaf>>2 (tuned on 20k-tri
    # mesh_env, ~1.3k leaves); at 405k tris (12.7k leaves) the coarse
    # cell holds far more geometry, so finer origin bits may matter
    # more than direction bits.
    op = np.asarray(oprim)
    tclc = max(config.bvh_tcl, 1)
    n_leaves = max(config.tri_count // tclc, 1)
    leaf_of = np.where(
        (op >= 0) & (op < config.tri_count), op // tclc, n_leaves
    ).astype(np.uint64)
    dxa, dya, dza = (np.asarray(v) for v in (brd.x, brd.y, brd.z))

    def dir_morton(bits):
        q = lambda v: np.clip(
            ((v + 1.0) * (1 << (bits - 1))).astype(np.uint64),
            0, (1 << bits) - 1,
        )
        def expand(v):
            out = np.zeros_like(v)
            for b in range(bits):
                out |= ((v >> b) & 1) << (3 * b)
            return out
        return (
            (expand(q(dxa)) << 2) | (expand(q(dya)) << 1) | expand(q(dza))
        )

    maskb = np.asarray(hit.hit_mask)

    def make_key(shift, dirbits):
        grp = np.minimum(leaf_of >> shift, (1 << 20) - 1)
        k = (grp << (3 * dirbits)) | dir_morton(dirbits)
        return np.where(maskb, k, np.uint64(1) << 62)

    variants = [("production", np.asarray(k1).astype(np.uint64))]
    for shift, dirbits in ((2, 6), (1, 6), (0, 6), (0, 4), (0, 2), (3, 6)):
        variants.append(
            (f"leaf>>{shift}|dir{3*dirbits}b", make_key(shift, dirbits))
        )

    order = np.argsort(np.asarray(k1), kind="stable")
    ox, oy, oz = (np.asarray(v)[order] for v in (bro.x, bro.y, bro.z))
    dx, dy, dz = (np.asarray(v)[order] for v in (brd.x, brd.y, brd.z))
    seg = bt[order]
    live = active[order]

    tri = np.asarray(data.tris.packed)
    T = tri.shape[0]
    p0 = tri[:, 0:3]
    p1 = p0 + tri[:, 3:6]
    p2 = p0 + tri[:, 6:9]
    degen = np.abs(tri[:, 3:9]).sum(1) < 1e-12
    tlo = np.where(degen[:, None], np.inf, np.minimum(np.minimum(p0, p1), p2))
    thi = np.where(degen[:, None], -np.inf, np.maximum(np.maximum(p0, p1), p2))

    TILE = 1024
    n_tiles = 48
    rs = np.random.RandomState(0)
    cand = [i for i in range(len(ox) // TILE)
            if live[i * TILE : (i + 1) * TILE].any()]
    tile_ids = rs.choice(cand, min(n_tiles, len(cand)), replace=False)

    for tcl in (16, 32, 64, 128):
        if T % tcl:
            continue
        L = T // tcl
        llo = tlo.reshape(L, tcl, 3).min(axis=1)
        lhi = thi.reshape(L, tcl, 3).max(axis=1)

        u_sum = tri_sum = adj_sum = run_sum = 0.0
        for ti in tile_ids:
            s = ti * TILE
            o = np.stack([ox[s:s+TILE], oy[s:s+TILE], oz[s:s+TILE]], 1)
            d = np.stack([dx[s:s+TILE], dy[s:s+TILE], dz[s:s+TILE]], 1)
            inv = np.where(np.abs(d) < 1e-12, 1e12, 1.0 / d)
            t0 = (llo[None] - o[:, None]) * inv[:, None]
            t1 = (lhi[None] - o[:, None]) * inv[:, None]
            tn = np.minimum(t0, t1).max(axis=2)
            tf = np.maximum(t0, t1).min(axis=2)
            m = (tn <= tf) & (tf > 0) & (tn < (seg[s:s+TILE] * 1.001)[:, None])
            m[~live[s:s+TILE]] = False
            u = np.nonzero(m.any(axis=0))[0]
            if len(u) == 0:
                continue
            u_sum += len(u)
            tri_sum += len(u) * tcl
            adj = np.isin(u + 1, u).mean() if len(u) else 0.0
            adj_sum += adj
            # DMA count with pairwise run coalescing (greedy 2-runs)
            runs = 0
            i = 0
            uset = set(u.tolist())
            for v in u:
                if v in uset:
                    runs += 1
                    uset.discard(v)
                    uset.discard(v + 1)
            run_sum += runs
        k = len(tile_ids)
        print(
            f"tcl={tcl:4d}: leaves/tile {u_sum/k:7.1f}  "
            f"tris-tested/tile {tri_sum/k:8.0f}  "
            f"adjacency {adj_sum/k:5.2f}  "
            f"2-run DMAs/tile {run_sum/k:7.1f} "
            f"({run_sum/max(u_sum,1):.2f}x of leaves)",
            flush=True,
        )

    # -- key-variant unions at the production tcl ------------------------
    tcl = tclc
    L = T // tcl
    llo = tlo.reshape(L, tcl, 3).min(axis=1)
    lhi = thi.reshape(L, tcl, 3).max(axis=1)
    bx, by, bz = (np.asarray(v) for v in (bro.x, bro.y, bro.z))
    print(f"-- key variants at tcl={tcl} --", flush=True)
    for name, key in variants:
        o2 = np.argsort(key, kind="stable")
        ox2, oy2, oz2 = bx[o2], by[o2], bz[o2]
        dx2, dy2, dz2 = dxa[o2], dya[o2], dza[o2]
        seg2 = bt[o2]
        live2 = active[o2]
        cand2 = [i for i in range(len(ox2) // TILE)
                 if live2[i * TILE:(i + 1) * TILE].any()]
        ids2 = np.random.RandomState(1).choice(
            cand2, min(n_tiles, len(cand2)), replace=False
        )
        u_sum = 0.0
        for ti in ids2:
            s = ti * TILE
            o = np.stack([ox2[s:s+TILE], oy2[s:s+TILE], oz2[s:s+TILE]], 1)
            d = np.stack([dx2[s:s+TILE], dy2[s:s+TILE], dz2[s:s+TILE]], 1)
            inv = np.where(np.abs(d) < 1e-12, 1e12, 1.0 / d)
            t0 = (llo[None] - o[:, None]) * inv[:, None]
            t1 = (lhi[None] - o[:, None]) * inv[:, None]
            tn = np.minimum(t0, t1).max(axis=2)
            tf = np.maximum(t0, t1).min(axis=2)
            m = (tn <= tf) & (tf > 0) & (tn < (seg2[s:s+TILE] * 1.001)[:, None])
            m[~live2[s:s+TILE]] = False
            u_sum += m.any(axis=0).sum()
        print(f"  {name:22s}: leaves/tile {u_sum/len(ids2):7.1f}", flush=True)


if __name__ == "__main__":
    main()
