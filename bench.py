"""Benchmark harness: PT with MIS throughput on the current accelerator.

Prints ONE JSON line. Primary metric: Mrays/sec/chip on the Cornell-box
scene at 1080p 1 spp (BASELINE.json target: 100 Mrays/s/chip). The same
line also carries the HARD path — the 20k-triangle mesh + envmap scene
(BASELINE config 4) at 1080p 1 spp through the BVH traversal kernels —
as ``mesh_env_mrays`` / ``mesh_env_ms``, so large-scene perf is visible
to the driver every round.

Ray counting matches the reference's notion of traced rays: one primary
ray per pixel plus, per bounce iteration, one NEE shadow ray and one
BSDF continuation ray per lane (masked lanes still execute sweeps).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _bench_scene(path: str, width=1920, height=1080, iters=4):
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render_frame
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene(path)
    scene.sensor.film.w, scene.sensor.film.h = width, height
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)

    n = config.width * config.height
    accum = jnp.zeros((n, 3), jnp.float32)

    # warm-up / compile
    accum, bufs = render_frame(
        data, camera, jnp.uint32(0), jnp.int32(0), accum, config
    )
    jax.block_until_ready(bufs["frame"])

    t0 = time.perf_counter()
    for i in range(iters):
        accum, bufs = render_frame(
            data, camera, jnp.uint32(i + 1), jnp.int32(i + 1), accum, config
        )
    jax.block_until_ready(bufs["frame"])
    dt = (time.perf_counter() - t0) / iters

    rays_per_frame = n * (1 + 2 * (config.max_depth - 1))
    return rays_per_frame / dt / 1e6, dt * 1e3, config


def _bench_big_env(width=1920, height=1080, iters=3):
    """Streamed-BVH scene (~405k tris > the 8 MB VMEM residency cutoff):
    generated on first use under /tmp, cached across runs."""
    import pathlib
    import subprocess
    import sys

    xml = pathlib.Path("/tmp/pupil_big_env/big_env.xml")
    if not xml.exists():
        subprocess.run(
            [sys.executable, "tools/make_big_scene.py", str(xml.parent), "450"],
            check=True, capture_output=True, timeout=300,
            cwd=pathlib.Path(__file__).parent,
        )
        if not xml.exists():
            raise FileNotFoundError(xml)
    return _bench_scene(str(xml), width, height, iters)


def _bench_denoise(width=1920, height=1080):
    """A-trous denoiser (5 iterations, albedo+normal guides) at 1080p.

    True DEVICE time via the in-jit chain-slope method: k applications
    are chained inside ONE jitted fori_loop (one dispatch through the
    axon tunnel), timed at k=1 and k=6, slope = (t6 - t1)/5. Host-side
    per-call loops measure tunnel dispatch (~31 ms/executable), not
    device time."""
    import time
    from functools import partial

    import numpy as np

    from pupiloptixlab_tpu.denoise.atrous import atrous_denoise

    rs = np.random.RandomState(3)
    color = jnp.asarray(rs.rand(height, width, 3).astype(np.float32))
    albedo = jnp.asarray(rs.rand(height, width, 3).astype(np.float32))
    nr = rs.randn(height, width, 3).astype(np.float32)
    nr /= np.maximum(np.linalg.norm(nr, axis=-1, keepdims=True), 1e-9)
    normal = jnp.asarray(nr)

    @partial(jax.jit, static_argnames=("k",))
    def chain(c, a, n, k):
        return jax.lax.fori_loop(
            0, k, lambda i, o: atrous_denoise(o, a, n), c
        )

    def timed(k):
        np.asarray(chain(color, albedo, normal, k)[:1, :1])  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(color, albedo, normal, k)[:1, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    return max(timed(6) - timed(1), 0.0) / 5 * 1e3


def _bench_spectral(width=768, height=512, iters=4):
    """Hero-wavelength spectral transport cost on the dispersion demo
    scene, vs the same scene forced to RGB (the lift's per-factor cost;
    render/spectral.py). Returns (spectral_ms, rgb_ms)."""
    import dataclasses

    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render_frame
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene("data/dispersion.xml")
    scene.sensor.film.w, scene.sensor.film.h = width, height
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    n = config.width * config.height
    out = []
    for cfg in (config, dataclasses.replace(config, spectral=False)):
        accum = jnp.zeros((n, 3), jnp.float32)
        accum, bufs = render_frame(
            data, camera, jnp.uint32(0), jnp.int32(0), accum, cfg
        )
        jax.block_until_ready(bufs["frame"])
        t0 = time.perf_counter()
        for i in range(iters):
            accum, bufs = render_frame(
                data, camera, jnp.uint32(i + 1), jnp.int32(i + 1), accum, cfg
            )
        jax.block_until_ready(bufs["frame"])
        out.append((time.perf_counter() - t0) / iters * 1e3)
    return out[0], out[1]


def _bench_restir(width=1920, height=1080, iters=4, gi=False):
    """ReSTIR DI (or GI) frame time on the reference's many-light scene."""
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.restir import restir_frame
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene("/root/reference/data/static/restir_test.xml")
    scene.sensor.film.w, scene.sensor.film.h = width, height
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    n = config.width * config.height
    if gi:
        from pupiloptixlab_tpu.render.restir_gi import restir_gi_frame

        def step(i, prev, accum):
            return restir_gi_frame(
                data, camera, jnp.uint32(i), prev, accum, jnp.int32(i),
                config,
            )
    else:
        def step(i, prev, accum):
            return restir_frame(
                data, camera, jnp.uint32(i), prev, accum, jnp.int32(i),
                config,
            )

    prev = jnp.zeros((n, 19), jnp.float32)  # packed reservoir rows
    accum = jnp.zeros((n, 3), jnp.float32)
    accum, prev, frame = step(0, prev, accum)
    jax.block_until_ready(frame)
    t0 = time.perf_counter()
    for i in range(iters):
        accum, prev, frame = step(i + 1, prev, accum)
    jax.block_until_ready(frame)
    return (time.perf_counter() - t0) / iters * 1e3


def _bench_restir_quality(width=960, height=540, warm_frames=8,
                          truth_frames=192):
    """Equal-time STREAMING quality: ReSTIR-DI vs plain PT on the
    many-light scene (the comparison ReSTIR exists to win; reference
    scene /root/reference/data/static/restir_test.xml). Both estimators
    target DIRECT lighting (PT at max_depth=2 = emission + NEE/MIS
    direct, the integral ReSTIR-DI computes); truth is a long PT
    accumulation. The protocol is the interactive one ReSTIR is built
    for: each renderer shows a fresh PER-FRAME estimate every frame
    (accumulate off); ReSTIR's reservoirs warm up over ``warm_frames``
    and its steady-state frame is compared against a PT frame of
    round(restir_ms / pt_ms) independent samples — equal per-frame
    wall-clock. Returns (mse_ratio, restir_ms, pt_ms): mse_ratio =
    PT_relMSE / ReSTIR_relMSE — >1 means ReSTIR is ahead.

    Measured r5 on TPU: 0.64 steady-state (and 0.47 under the harsher
    from-scratch equal-time accumulation protocol) — PT depth-2 is
    cheap enough here that ~2 fresh NEE+MIS samples beat one warmed
    reservoir; see ROADMAP's ReSTIR cost levers."""
    import dataclasses

    import numpy as np

    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render, render_frame
    from pupiloptixlab_tpu.render.restir import restir_frame
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene("/root/reference/data/static/restir_test.xml")
    scene.sensor.film.w, scene.sensor.film.h = width, height
    data, config = flatten_scene(scene)
    config = dataclasses.replace(config, max_depth=2, accumulate=True)
    camera = camera_block_from_scene(scene)
    n = config.width * config.height
    cfg_stream = dataclasses.replace(config, accumulate=False)

    def pt_run(frames):
        accum = jnp.zeros((n, 3), jnp.float32)
        for i in range(frames):
            accum, bufs = render_frame(
                data, camera, jnp.uint32(i), jnp.int32(i), accum, config
            )
        jax.block_until_ready(accum)
        return accum

    def restir_stream(frames):
        # per-frame estimates: reservoir history carries across frames,
        # the radiance shown each frame is that frame's alone
        prev = jnp.zeros((n, 19), jnp.float32)
        frame = jnp.zeros((n, 3), jnp.float32)
        for i in range(frames):
            frame, prev, _ = restir_frame(
                data, camera, jnp.uint32(i), prev, frame, jnp.int32(i),
                cfg_stream,
            )
        jax.block_until_ready(frame)
        return frame

    # compile both programs, then time one frame of each (best of 3)
    pt_run(1), restir_stream(1)
    pt_ms = min(_timeit(lambda: pt_run(1)) for _ in range(3)) * 1e3
    restir_ms = min(_timeit(lambda: restir_stream(1)) for _ in range(3)) * 1e3

    truth = np.asarray(pt_run(truth_frames))
    denom = float(np.mean(truth**2)) + 1e-12

    # PT's equal-time frame: k independent samples in one frame budget
    # (seeds disjoint from the truth run)
    k = max(1, round(restir_ms / max(pt_ms, 1e-6)))
    img_pt = np.asarray(
        render(data, camera, config, spp=k, seed0=5000)
    ).reshape(n, 3)
    img_restir = np.asarray(restir_stream(warm_frames))
    mse_restir = float(np.mean((img_restir - truth) ** 2)) / denom
    mse_pt = float(np.mean((img_pt - truth) ** 2)) / denom
    return mse_pt / max(mse_restir, 1e-12), restir_ms, pt_ms


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _bench_interactive(width=1920, height=1080, frames=20, stride=1):
    """Sustained interactive rate on cornell 1080p THROUGH the display
    path: each frame = render + on-device ACES/gamma/uint8 quantize +
    device->host fetch (the DisplayClient pump, display/client.py:76-96;
    BASELINE config 5). The fetch of frame i overlaps frame i+1's
    render (async dispatch), so the rate is max(render, fetch) — on
    this rig the 21-26 MB/s axon tunnel makes the 6 MB uint8 fetch the
    ceiling (see INTERACTIVE.md). Returns fps."""
    import numpy as np

    from pupiloptixlab_tpu.display.tonemap import to_display_u8
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render_frame
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene("/root/reference/data/static/cornellbox.xml")
    scene.sensor.film.w, scene.sensor.film.h = width, height
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    n = config.width * config.height
    accum = jnp.zeros((n, 3), jnp.float32)

    def one(i, accum):
        accum, bufs = render_frame(
            data, camera, jnp.uint32(i), jnp.int32(i), accum, config
        )
        frame = bufs["frame"]
        if stride > 1:  # motion-preview fetch (display/client.py)
            frame = frame.reshape(height, width, 3)
        return accum, to_display_u8(frame, stride=stride)

    accum, u8 = one(0, accum)  # compile
    np.asarray(u8)
    t0 = time.perf_counter()
    pending = None
    for i in range(frames):
        accum, u8 = one(i + 1, accum)  # dispatch frame i+1 ...
        if pending is not None:
            np.asarray(pending)  # ... while frame i crosses the link
        pending = u8
    np.asarray(pending)
    return frames / (time.perf_counter() - t0)


def main() -> None:
    cornell_mrays, cornell_ms, config = _bench_scene(
        "/root/reference/data/static/cornellbox.xml"
    )
    mesh_mrays, mesh_ms, mesh_config = _bench_scene("/root/repo/data/mesh_env.xml")
    try:
        big_mrays, big_ms, big_config = _bench_big_env()
        big = {
            "big_env_mrays": round(big_mrays, 2),
            "big_env_ms": round(big_ms, 2),
            "big_env_tris": big_config.tri_count,
        }
    except Exception as exc:  # generator/asset failure must not kill bench
        big = {"big_env_error": str(exc)[:120]}
    denoise_ms = _bench_denoise()
    # engine-cost fields (VERDICT r3 #9): regressions in the spectral /
    # ReSTIR engines become driver-visible round over round
    extra = {}
    try:
        sp_ms, rgb_ms = _bench_spectral()
        extra["spectral_ms"] = round(sp_ms, 2)
        extra["spectral_rgb_ms"] = round(rgb_ms, 2)
    except Exception as exc:
        extra["spectral_error"] = str(exc)[:120]
    try:
        extra["restir_ms"] = round(_bench_restir(), 2)
    except Exception as exc:
        extra["restir_error"] = str(exc)[:120]
    try:
        extra["restir_gi_ms"] = round(_bench_restir(gi=True), 2)
    except Exception as exc:
        extra["restir_gi_error"] = str(exc)[:120]
    try:
        q, rq_ms, pt_ms = _bench_restir_quality()
        # >1 = ReSTIR beats equal-time PT on the many-light scene
        extra["restir_quality_vs_pt"] = round(q, 2)
        extra["restir_quality_ms"] = round(rq_ms, 2)
        extra["restir_quality_pt_ms"] = round(pt_ms, 2)
    except Exception as exc:
        extra["restir_quality_error"] = str(exc)[:120]
    try:
        extra["interactive_fps"] = round(_bench_interactive(), 2)
    except Exception as exc:
        extra["interactive_error"] = str(exc)[:120]
    try:
        # camera-drag motion preview: quarter-size u8 fetch (stride 2)
        extra["interactive_preview_fps"] = round(
            _bench_interactive(stride=2), 2
        )
    except Exception as exc:
        extra["interactive_preview_error"] = str(exc)[:120]

    print(
        json.dumps(
            {
                "metric": "Mrays/sec/chip (cornell 1080p 1spp PT+MIS)",
                "value": round(cornell_mrays, 2),
                "unit": "Mray/s",
                "vs_baseline": round(cornell_mrays / 100.0, 3),
                "ms_per_frame": round(cornell_ms, 2),
                "mesh_env_mrays": round(mesh_mrays, 2),
                "mesh_env_ms": round(mesh_ms, 2),
                "mesh_env_tris": mesh_config.tri_count,
                "mesh_env_bvh_nodes": mesh_config.bvh_nodes,
                **big,
                **extra,
                "denoise_ms": round(denoise_ms, 2),
                "device": str(jax.devices()[0].platform),
                "max_depth": config.max_depth,
            }
        )
    )


if __name__ == "__main__":
    main()
