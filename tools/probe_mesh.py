"""Frame-level cost breakdown of the mesh_env scene on the real TPU.

Times whole-frame variants (depth 1..4) plus isolated sweep loops so the
683 ms frame can be attributed to primary sweep / bounce sweeps / shadow
sweeps / sort overhead / shading. Every number is a full jit dispatch
timed over several iterations (per-op microbenchmarks lie through the
axon tunnel — see CLAUDE.md).

Usage: python tools/probe_mesh.py [--scene data/mesh_env.xml]
"""

from __future__ import annotations

import argparse
import numpy as np
import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp


def _time(fn, iters=4):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(i + 1)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/repo/data/mesh_env.xml")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--mode", default="frames",
                    choices=["frames", "sweeps", "bounce", "iters"])
    ap.add_argument("--depths", default="1,4")
    args = ap.parse_args()

    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render_frame
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene(args.scene)
    scene.sensor.film.w, scene.sensor.film.h = args.width, args.height
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    n = config.width * config.height
    print(f"tris={config.tri_count} bvh_nodes={config.bvh_nodes} "
          f"tcl={config.bvh_tcl} n={n}")

    # --- whole frames at increasing depth --------------------------------
    if args.mode == "frames":
        for depth in [int(d) for d in args.depths.split(",")]:
            cfg = dataclasses.replace(config, max_depth=depth)

            def frame(i, cfg=cfg):
                # fresh accum each call: render_frame donates it
                accum = jnp.zeros((n, 3), jnp.float32)
                a, bufs = render_frame(
                    data, camera, jnp.uint32(i), jnp.int32(i), accum, cfg
                )
                return bufs["frame"]

            ms = _time(frame)
            print(f"frame depth={depth}: {ms:.1f} ms", flush=True)
        return

    # --- isolated sweeps --------------------------------------------------
    # Incoherent rays approximating bounce rays: random directions from
    # random surface-ish points (use primary hit positions as origins).
    from pupiloptixlab_tpu.accel.intersect import intersect_any, intersect_closest
    from pupiloptixlab_tpu.render import rng
    from pupiloptixlab_tpu.render.camera import generate_rays
    from pupiloptixlab_tpu.render.sampling import MAX_DISTANCE, RAY_OFFSET
    from pupiloptixlab_tpu.render.vec import Vec3

    state = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(9))
    state, (jx, jy) = rng.next_floats(state, 2)
    ro, rd = generate_rays(camera, config.width, config.height, jx, jy)
    tmin = jnp.full(n, RAY_OFFSET, jnp.float32)
    tmax = jnp.full(n, MAX_DISTANCE, jnp.float32)

    @jax.jit
    def primary_hitpos(ro=ro, rd=rd):
        hit = intersect_closest(ro, rd, tmin, tmax, data, config, coherent=False)
        t = jnp.where(hit.hit_mask, hit.t, 1.0)
        pos = ro + rd * t
        return pos.x, pos.y, pos.z, hit.hit_mask, hit.prim, hit.kind

    px, py, pz, hmask, hprim, hkind = primary_hitpos()
    pos = Vec3(px, py, pz)
    state, (u1, u2) = rng.next_floats(state, 2)
    # uniform sphere directions = worst-case incoherent bounce rays
    z = u1 * 2.0 - 1.0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = u2 * 6.2831853
    bdir = Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)
    oprim = jnp.where(hkind == 0, hprim, -1)

    @partial(jax.jit, static_argnames=("coherent", "use_mask", "use_oprim"))
    def closest_sweep(seed, coherent, use_mask=False, use_oprim=True):
        return intersect_closest(
            pos, bdir, tmin, tmax, data, config, coherent=coherent,
            origin_prim=oprim if use_oprim else None,
            mask=hmask if use_mask else None,
        ).t

    @partial(jax.jit, static_argnames=("use_oprim",))
    def any_sweep(seed, use_oprim=True):
        return intersect_any(
            pos, bdir, tmin, tmax, data, config, coherent=False,
            origin_prim=oprim if use_oprim else None, mask=hmask,
        )

    if args.mode == "iters":
        # Iteration/leaf-visit statistics of the REAL closest kernel on
        # real bounce-1 rays, via the count_iters debug plane.
        from pupiloptixlab_tpu.accel.intersect import (
            RB_RESIDENT, _ray_sort_key_leaf, _sorted_ray_sweep,
        )
        from pupiloptixlab_tpu.accel.pallas_bvh import bvh_closest
        from pupiloptixlab_tpu.render import bsdf as bsdf_mod
        from pupiloptixlab_tpu.render import rng as rngm
        from pupiloptixlab_tpu.render.geometry import get_local_geometry
        from pupiloptixlab_tpu.render.sampling import to_local, to_world

        hit = intersect_closest(ro, rd, tmin, tmax, data, config,
                                coherent=False)
        geo = get_local_geometry(data, hit, ro, rd, config.sphere_count)
        local = bsdf_mod.get_local_bsdf(
            data.materials, data.textures, geo.mat_id, geo.uv,
            config.mat_types, config.mat_tex_kinds, config.mat_tex_filters,
        )
        st = rngm.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(7))
        st, us = rngm.next_floats(st, 3)
        wo_local = to_local(Vec3(-rd.x, -rd.y, -rd.z), geo.normal)
        wi_s, _, _, _ = bsdf_mod.sample(local, wo_local, *us, config.mat_types)
        brd = to_world(wi_s, geo.normal)
        oprim2 = jnp.where(hit.kind == 0, hit.prim, -1)
        sort_keys = _ray_sort_key_leaf(oprim2, brd, config, hit.hit_mask)
        tmax_m = jnp.where(hit.hit_mask, tmax, -1.0)

        # sort manually (no unpermute — tile identity must survive)
        arrays = [geo.position.x, geo.position.y, geo.position.z,
                  brd.x, brd.y, brd.z, tmin, tmax_m]
        sorted_ops = jax.lax.sort(
            [*sort_keys, *arrays], dimension=0, num_keys=2, is_stable=False
        )
        arrays = list(sorted_ops[2:])
        block = 128 * RB_RESIDENT
        pad = (-n) % block
        if pad:
            arrays = [jnp.concatenate([a, jnp.zeros(pad, a.dtype)])
                      for a in arrays]
        t, code = bvh_closest(
            *arrays, data.tris.packed, data.tris.bvh_child,
            data.tris.bvh_axis, data.tris.bvh_boxes,
            rb=RB_RESIDENT, tcl=config.bvh_tcl, count_iters=True,
        )
        code = np.asarray(code).reshape(-1)[::block]
        iters = code // 65536
        leaves = code % 65536
        print(f"tiles: {len(code)}")
        print(f"iterations/tile: mean {iters.mean():.1f} p50 "
              f"{np.percentile(iters, 50):.0f} p90 {np.percentile(iters, 90):.0f} "
              f"max {iters.max()}")
        print(f"leaf visits/tile: mean {leaves.mean():.1f} p50 "
              f"{np.percentile(leaves, 50):.0f} p90 {np.percentile(leaves, 90):.0f}")
        print(f"total iterations: {iters.sum()}  leaf MTs: {leaves.sum()}")
        return

    if args.mode == "bounce":
        # Stage-level timing with REAL bounce-1 inputs: primary hit ->
        # geometry+bsdf gathers -> NEE (sample+eval+shadow) -> BSDF
        # sample + closest. Each stage is one jit at frame width.
        from pupiloptixlab_tpu.render import bsdf as bsdf_mod
        from pupiloptixlab_tpu.render import emitter as emitter_mod
        from pupiloptixlab_tpu.render.geometry import get_local_geometry
        from pupiloptixlab_tpu.render.sampling import to_local, to_world
        from pupiloptixlab_tpu.accel.intersect import Hit

        @jax.jit
        def primary(seed):
            hit = intersect_closest(ro, rd, tmin, tmax, data, config,
                                    coherent=False)
            return hit.t, hit.prim, hit.kind

        t_, prim_, kind_ = primary(0)
        hit = Hit(t=t_, prim=prim_, kind=kind_,
                  inst=jnp.zeros_like(prim_))
        print(f"primary sweep: {_time(primary):.1f} ms", flush=True)

        @jax.jit
        def gathers(seed):
            geo = get_local_geometry(data, hit, ro, rd, config.sphere_count)
            local = bsdf_mod.get_local_bsdf(
                data.materials, data.textures, geo.mat_id, geo.uv,
                config.mat_types, config.mat_tex_kinds, config.mat_tex_filters,
            )
            return geo.position.x + local.alpha

        print(f"geo+bsdf gathers: {_time(gathers):.1f} ms", flush=True)

        geo = get_local_geometry(data, hit, ro, rd, config.sphere_count)
        local = bsdf_mod.get_local_bsdf(
            data.materials, data.textures, geo.mat_id, geo.uv,
            config.mat_types, config.mat_tex_kinds, config.mat_tex_filters,
        )
        active = hit.hit_mask
        oprim2 = jnp.where(hit.kind == 0, hit.prim, -1)

        from pupiloptixlab_tpu.render import rng as rngm

        st = rngm.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3))
        st, us = rngm.next_floats(st, 7)
        u_rr, u_sel, u_l1, u_l2, u_b0, u_b1, u_b2 = us

        @jax.jit
        def nee_sample(seed):
            idx, use_env = emitter_mod.select_emitter(data.emitters, config, u_sel)
            es = emitter_mod.sample_direct(
                data.emitters, data.textures, config, idx, use_env,
                geo.position, geo.normal, u_l1, u_l2,
            )
            wo_local = to_local(Vec3(-rd.x, -rd.y, -rd.z), geo.normal)
            wi_local = to_local(es.wi, geo.normal)
            f_nee, pdf_b = bsdf_mod.evaluate(local, wo_local, wi_local, config.mat_types)
            return es.wi.x + f_nee.x + es.distance + pdf_b

        print(f"NEE sample+eval: {_time(nee_sample):.1f} ms", flush=True)

        idx, use_env = emitter_mod.select_emitter(data.emitters, config, u_sel)
        es = emitter_mod.sample_direct(
            data.emitters, data.textures, config, idx, use_env,
            geo.position, geo.normal, u_l1, u_l2,
        )
        wo_local = to_local(Vec3(-rd.x, -rd.y, -rd.z), geo.normal)
        nol = geo.normal.dot(es.wi)
        shadow_mask = active & (nol > 0.0)

        @jax.jit
        def shadow(seed):
            return intersect_any(
                geo.position, es.wi, tmin, es.distance, data, config,
                coherent=False, origin_prim=oprim2, mask=shadow_mask,
            )

        print(f"shadow any-hit: {_time(shadow):.1f} ms", flush=True)

        wi_s, f_s, pdf_s, lobe = bsdf_mod.sample(
            local, wo_local, u_b0, u_b1, u_b2, config.mat_types
        )
        new_rd = to_world(wi_s, geo.normal)

        @jax.jit
        def bounce_closest(seed):
            return intersect_closest(
                geo.position, new_rd, tmin, tmax, data, config,
                coherent=False, origin_prim=oprim2, mask=active,
            ).t

        print(f"bounce closest: {_time(bounce_closest):.1f} ms", flush=True)

        @jax.jit
        def bsdf_sample_only(seed):
            wi, f, p, lb = bsdf_mod.sample(
                local, wo_local, u_b0, u_b1, u_b2, config.mat_types
            )
            return wi.x + f.x + p

        print(f"bsdf sample: {_time(bsdf_sample_only):.1f} ms", flush=True)

        hit2 = intersect_closest(
            geo.position, new_rd, tmin, tmax, data, config,
            coherent=False, origin_prim=oprim2, mask=active,
        )

        @jax.jit
        def hit_shade(seed):
            geo2 = get_local_geometry(data, hit2, geo.position, new_rd,
                                      config.sphere_count)
            local2 = bsdf_mod.get_local_bsdf(
                data.materials, data.textures, geo2.mat_id, geo2.uv,
                config.mat_types, config.mat_tex_kinds, config.mat_tex_filters,
            )
            emit_rad, emit_pdf, sel_p = emitter_mod.eval_hit_emitter(
                data.emitters, data.textures, config, geo2.emitter_id,
                geo2.position, geo2.normal, geo2.uv, geo.position,
            )
            return geo2.position.x + local2.alpha + emit_rad.x + emit_pdf

        print(f"hit geo+bsdf+emitter: {_time(hit_shade):.1f} ms", flush=True)

        @jax.jit
        def env_resolve(seed):
            env_rad, env_pdf = emitter_mod.eval_env(
                data.emitters, data.textures, config, new_rd
            )
            return env_rad.x + env_pdf

        print(f"eval_env: {_time(env_resolve):.1f} ms", flush=True)
        return

    ms_sorted = _time(lambda i: closest_sweep(i, False))
    print(f"bounce closest sorted:   {ms_sorted:.1f} ms", flush=True)
    ms_masked = _time(lambda i: closest_sweep(i, False, use_mask=True))
    print(f"bounce closest masked:   {ms_masked:.1f} ms", flush=True)
    ms_nosort = _time(lambda i: closest_sweep(i, True))
    print(f"bounce closest UNsorted: {ms_nosort:.1f} ms", flush=True)
    ms_any = _time(lambda i: any_sweep(i))
    print(f"shadow any sorted+mask:  {ms_any:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
