"""Model per-tile leaf unions under cheaper secondary-ray orderings.

The per-sweep global lax.sort costs ~12 ms + ~7 ms unpermute at 1080p.
Block-order lanes are ALREADY origin-coherent (a 1024-lane tile is one
8x128 pixel block), so a WINDOWED sort (sort lanes only within W-lane
windows, by direction) would cut the sort's O(n log n) depth and the
operand movement while — possibly — keeping tile unions close to the
global (origin-leaf | direction) key. This script measures mean leaf
unions per 1024-ray tile for real mesh_env bounce-1 and shadow-1 rays
under each ordering on the CPU.

Usage: JAX_PLATFORMS=cpu python tools/analyze_window_sort.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def unions(ox, oy, oz, dx, dy, dz, seg, live, llo, lhi, n_tiles=64, seed=0):
    TILE = 1024
    rs = np.random.RandomState(seed)
    cand = [i for i in range(len(ox) // TILE)
            if live[i * TILE : (i + 1) * TILE].any()]
    ids = rs.choice(cand, min(n_tiles, len(cand)), replace=False)
    tot = 0.0
    for ti in ids:
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
        tot += m.any(axis=0).sum()
    return tot / len(ids)


def main():
    import jax.numpy as jnp

    from pupiloptixlab_tpu.accel.intersect import (
        _ray_sort_key_leaf, intersect_closest,
    )
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render import bsdf as bsdf_mod
    from pupiloptixlab_tpu.render import emitter as emitter_mod
    from pupiloptixlab_tpu.render import rng as rngm
    from pupiloptixlab_tpu.render.geometry import get_local_geometry
    from pupiloptixlab_tpu.render.integrator import _block_pix
    from pupiloptixlab_tpu.render.camera import generate_rays_for
    from pupiloptixlab_tpu.render.sampling import (
        MAX_DISTANCE, RAY_OFFSET, to_local, to_world,
    )
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene("/root/repo/data/mesh_env.xml")
    w, h = 1920, 1080
    scene.sensor.film.w, scene.sensor.film.h = w, h
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    n = w * h

    # BLOCK-ORDER primaries, exactly like the production integrator
    pix = jnp.asarray(_block_pix(w, h))
    st = rngm.tea_init(pix.astype(jnp.uint32), jnp.uint32(1))
    st, (jx, jy) = rngm.next_floats(st, 2)
    ro, rd = generate_rays_for(camera, w, h, pix, jx, jy)
    tmin = jnp.full(n, RAY_OFFSET, jnp.float32)
    tmax = jnp.full(n, MAX_DISTANCE, jnp.float32)
    hit = intersect_closest(ro, rd, tmin, tmax, data, config, coherent=True)
    geo = get_local_geometry(data, hit, ro, rd, config.sphere_count)
    local = bsdf_mod.get_local_bsdf(
        data.materials, data.textures, geo.mat_id, geo.uv, config.mat_types,
        config.mat_tex_kinds, config.mat_tex_filters,
    )
    st, us = rngm.next_floats(st, 7)
    u_rr, u_sel, u_l1, u_l2, u_b0, u_b1, u_b2 = us
    wo_local = to_local(-rd, geo.normal)
    wi_s, _, _, _ = bsdf_mod.sample(local, wo_local, u_b0, u_b1, u_b2,
                                    config.mat_types)
    brd = to_world(wi_s, geo.normal)
    bro = geo.position
    active = np.asarray(hit.hit_mask)
    oprim = jnp.where(hit.kind == 0, hit.prim, -1)

    idx_e, use_env = emitter_mod.select_emitter(data.emitters, config, u_sel)
    es = emitter_mod.sample_direct(
        data.emitters, data.textures, config, idx_e, use_env,
        geo.position, geo.normal, u_l1, u_l2,
    )
    nol = np.asarray(geo.normal.dot(es.wi))
    smask = active & (nol > 0.0)

    bhit = intersect_closest(
        bro, brd, tmin, tmax, data, config, coherent=False,
        origin_prim=oprim, mask=hit.hit_mask,
    )
    bt = np.asarray(jnp.where(bhit.hit_mask, bhit.t, MAX_DISTANCE))
    sd = np.asarray(es.distance)

    tri = np.asarray(data.tris.packed)
    tcl = config.bvh_tcl
    L = tri.shape[0] // tcl
    p0 = tri[:, 0:3]
    p1 = p0 + tri[:, 3:6]
    p2 = p0 + tri[:, 6:9]
    degen = np.abs(tri[:, 3:9]).sum(1) < 1e-12
    llo = np.where(degen[:, None], np.inf,
                   np.minimum(np.minimum(p0, p1), p2)).reshape(L, tcl, 3).min(1)
    lhi = np.where(degen[:, None], -np.inf,
                   np.maximum(np.maximum(p0, p1), p2)).reshape(L, tcl, 3).max(1)

    def dir_key(dxx, dyy, dzz):
        def q6(v):
            return np.clip(((v + 1.0) * 32.0).astype(np.uint32), 0, 63)

        def expand6(v):
            v = (v | (v << 8)) & np.uint32(0x0300F00F)
            v = (v | (v << 4)) & np.uint32(0x030C30C3)
            v = (v | (v << 2)) & np.uint32(0x09249249)
            return v
        return ((expand6(q6(dxx)) << 2) | (expand6(q6(dyy)) << 1)
                | expand6(q6(dzz)))

    for name, o3, d3, seg, lv in (
        ("bounce-1", bro, brd, bt, active),
        ("shadow-1", bro, es.wi, sd, smask),
    ):
        ox, oy, oz = (np.asarray(v) for v in (o3.x, o3.y, o3.z))
        dx, dy, dz = (np.asarray(v) for v in (d3.x, d3.y, d3.z))

        (k1,) = _ray_sort_key_leaf(
            jnp.asarray(oprim), d3, config, jnp.asarray(lv)
        )
        g = np.argsort(np.asarray(k1), kind="stable")
        print(f"-- {name}")
        u = unions(ox[g], oy[g], oz[g], dx[g], dy[g], dz[g], seg[g], lv[g],
                   llo, lhi)
        print(f"  global leaf|dir sort : {u:7.1f} leaves/tile")
        u = unions(ox, oy, oz, dx, dy, dz, seg, lv, llo, lhi)
        print(f"  unsorted block order : {u:7.1f}")
        dk = dir_key(dx, dy, dz)
        dk = np.where(lv, dk, np.uint32(0xFFFFFFFF))
        for wlog in (12, 13, 14):
            wsz = 1 << wlog
            order = np.arange(n)
            for s in range(0, n, wsz):
                sl = slice(s, s + wsz)
                order[sl] = s + np.argsort(dk[sl], kind="stable")
            u = unions(ox[order], oy[order], oz[order],
                       dx[order], dy[order], dz[order], seg[order],
                       lv[order], llo, lhi)
            print(f"  windowed dir sort {wsz:5d}: {u:7.1f}")


if __name__ == "__main__":
    main()
