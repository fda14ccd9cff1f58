"""Measure streamed-traversal composition on big_env (real TPU).

For the primary and bounce-1 closest sweeps at 1080p: per-tile pops and
leaf drains (count_iters), sweep wall time, and the implied DMA traffic,
so the streaming bottleneck (DMA bytes vs DMA count vs VPU) is measured
rather than guessed.  Run from the repo root: python -m tools.probe_bigenv_iters
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pupiloptixlab_tpu.accel.intersect import (
        _ray_sort_key_leaf, _sorted_ray_sweep, intersect_closest,
    )
    from pupiloptixlab_tpu.accel.pallas_bvh import bvh_closest
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
    scene = load_scene(path)
    scene.sensor.film.w, scene.sensor.film.h = 1920, 1080
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    n = config.width * config.height
    tcl = config.bvh_tcl
    rb = 8
    print(f"tris={config.tri_count} tcl={tcl} nodes={config.bvh_nodes}",
          flush=True)

    st = rngm.tea_init(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(1))
    st, (jx, jy) = rngm.next_floats(st, 2)
    ro, rd = generate_rays(camera, config.width, config.height, jx, jy)
    tmin = jnp.full(n, RAY_OFFSET, jnp.float32)
    tmax = jnp.full(n, MAX_DISTANCE, jnp.float32)

    def sweep(ro_, rd_, keys, count, mask=None):
        tmx = tmax if mask is None else jnp.where(mask, tmax, -1.0)

        def run(arrays):
            return bvh_closest(
                *arrays, data.tris.packed, data.tris.bvh_child,
                data.tris.bvh_axis, data.tris.bvh_boxes,
                rb=rb, tcl=tcl, count_iters=count,
            )

        return _sorted_ray_sweep(
            ro_, rd_, tmin, tmx, False, 9999, run,
            sort_keys=keys, rb=rb,
        )

    def timeit(fn, iters=6):
        """Delta-method frame timing: block_until_ready lies through the
        axon tunnel, so force a REAL host sync (np scalar) and measure
        (time of N iters+sync) - (time of 1 iter+sync) over N-1 — the
        ~31 ms dispatch+transfer overhead cancels."""
        out = fn()
        _ = float(jnp.sum(out[0]))
        t0 = time.perf_counter()
        out = fn()
        _ = float(jnp.sum(out[0]))
        t1 = time.perf_counter()
        for _i in range(iters):
            out = fn()
        _ = float(jnp.sum(out[0]))
        t2 = time.perf_counter()
        return out, ((t2 - t1) - (t1 - t0)) / (iters - 1) * 1e3

    def stats(code, label, ms):
        c = np.asarray(code).reshape(-1, rb * 128)[:, 0]
        pops, drains = c // 65536, c % 65536
        bytes_per_drain = tcl * 128 * 4
        total_dma = float(drains.sum()) * bytes_per_drain
        print(json.dumps({
            "sweep": label, "ms": round(ms, 1),
            "tiles": int(c.shape[0]),
            "pops_mean": round(float(pops.mean()), 1),
            "pops_max": int(pops.max()),
            "drains_mean": round(float(drains.mean()), 1),
            "drains_max": int(drains.max()),
            "dma_MB": round(total_dma / 1e6, 1),
            "implied_GBps": round(total_dma / (ms / 1e3) / 1e9, 1),
        }), flush=True)

    # primary sweep (coherent: unsorted block order in production, but
    # here sorted=off to match). Timings print BEFORE any count_iters
    # kernel runs: the count variant has faulted on hardware before, and
    # the non-count numbers must survive that.
    (t_p2, _), ms_p2 = timeit(lambda: sweep(ro, rd, None, False))
    print(json.dumps({"sweep": "primary", "ms": round(ms_p2, 1)}), flush=True)

    # bounce-1 rays via the real integrator machinery
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
    oprim = jnp.where(hit.kind == 0, hit.prim, -1)
    keys = _ray_sort_key_leaf(oprim, brd, config, hit.hit_mask)

    (t_b2, _), ms_b2 = timeit(lambda: sweep(bro, brd, keys, False,
                                            hit.hit_mask))
    print(json.dumps({"sweep": "bounce1", "ms": round(ms_b2, 1)}), flush=True)

    # count_iters passes LAST (see above)
    (t_p, code_p), _ = timeit(lambda: sweep(ro, rd, None, True), iters=1)
    stats(code_p, "primary", ms_p2)
    (t_b, code_b), _ = timeit(
        lambda: sweep(bro, brd, keys, True, hit.hit_mask), iters=1)
    stats(code_b, "bounce1", ms_b2)


if __name__ == "__main__":
    main()
