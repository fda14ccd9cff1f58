"""Sequential TPU measurement suite — run after the axon tunnel returns.

Each stage is a fresh subprocess (frame-level timing is only meaningful
that way through the tunnel; see CLAUDE.md) with a hard timeout, so one
wedged stage can't hang the suite. Results append to the log as they
land. Usage:  python -m tools.tpu_suite [--quick]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

LOG = "/tmp/tpu_suite.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run(name, code, timeout=900, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout, env=e,
        )
        out = (r.stdout + r.stderr).strip().splitlines()
        # prefer the JSON result line (stderr warnings print after stdout)
        json_lines = [l for l in out if l.startswith("{")]
        tail = json_lines[-1] if json_lines else (out[-1] if out else "")
        log(f"{name}: rc={r.returncode} {time.time()-t0:.0f}s :: {tail}")
        return r.returncode == 0, tail
    except subprocess.TimeoutExpired:
        log(f"{name}: TIMEOUT after {timeout}s")
        return False, ""


PROBE = "import jax; print('devices', jax.devices())"

MESH_FRAME = """
import time, json, jax, jax.numpy as jnp
from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render.integrator import render_frame
from pupiloptixlab_tpu.scene import load_scene
scene = load_scene('data/mesh_env.xml')
scene.sensor.film.w, scene.sensor.film.h = 1920, 1080
data, config = flatten_scene(scene)
camera = camera_block_from_scene(scene)
n = config.width * config.height
accum = jnp.zeros((n, 3), jnp.float32)
accum, bufs = render_frame(data, camera, jnp.uint32(0), jnp.int32(0), accum, config)
jax.block_until_ready(bufs['frame'])
t0 = time.perf_counter()
for i in range(4):
    accum, bufs = render_frame(data, camera, jnp.uint32(i+1), jnp.int32(i+1), accum, config)
jax.block_until_ready(bufs['frame'])
dt = (time.perf_counter()-t0)/4
print(json.dumps({'mesh_env_ms': round(dt*1e3,1), 'mrays': round(n*(1+2*(config.max_depth-1))/dt/1e6,1)}))
"""

SPECTRAL_TPU = """
import time, json, dataclasses, numpy as np, jax, jax.numpy as jnp
from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render.integrator import render_frame
from pupiloptixlab_tpu.scene import load_scene
scene = load_scene('data/dispersion.xml')
scene.sensor.film.w, scene.sensor.film.h = 768, 512
data, config = flatten_scene(scene)
camera = camera_block_from_scene(scene)
n = config.width * config.height
res = {}
for name, cfg in [('spectral', config), ('rgb', dataclasses.replace(config, spectral=False))]:
    accum = jnp.zeros((n,3), jnp.float32)
    accum, bufs = render_frame(data, camera, jnp.uint32(0), jnp.int32(0), accum, cfg)
    jax.block_until_ready(bufs['frame'])
    t0 = time.perf_counter()
    for i in range(4):
        accum, bufs = render_frame(data, camera, jnp.uint32(i+1), jnp.int32(i+1), accum, cfg)
    jax.block_until_ready(bufs['frame'])
    res[name+'_ms'] = round((time.perf_counter()-t0)/4*1e3, 1)
    res[name+'_mean'] = round(float(jnp.mean(accum)), 4)
print(json.dumps(res))
"""

BIG_ENV_DEPTH = """
import time, json, jax, jax.numpy as jnp
from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render.integrator import render_frame
from pupiloptixlab_tpu.scene import load_scene
scene = load_scene('/tmp/pupil_big_env/big_env.xml')
scene.sensor.film.w, scene.sensor.film.h = 1920, 1080
data, config = flatten_scene(scene)
camera = camera_block_from_scene(scene)
n = config.width * config.height
accum = jnp.zeros((n, 3), jnp.float32)
accum, bufs = render_frame(data, camera, jnp.uint32(0), jnp.int32(0), accum, config)
jax.block_until_ready(bufs['frame'])
t0 = time.perf_counter()
for i in range(3):
    accum, bufs = render_frame(data, camera, jnp.uint32(i+1), jnp.int32(i+1), accum, config)
jax.block_until_ready(bufs['frame'])
dt = (time.perf_counter()-t0)/3
import os
print(json.dumps({'depth': os.environ.get('PUPIL_STREAM_DEPTH','2'), 'big_env_ms': round(dt*1e3,1)}))
"""


DENOISE_ONLY = """
import json
import bench
ms = bench._bench_denoise()
print(json.dumps({'denoise_ms': round(ms, 2)}))
"""


def main():
    quick = "--quick" in sys.argv
    log("=== tpu_suite start ===")
    ok, _ = run("probe", PROBE, timeout=120)
    if not ok:
        log("tunnel still down; aborting")
        return 1
    # A/B: n-way pop (sync amortization) and megacore grid semantics
    run("mesh_env (pop2 mega1 baseline)", MESH_FRAME, timeout=900)
    run("mesh_env (pop4)", MESH_FRAME, timeout=900,
        env={"PUPIL_POP_N": "4"})
    run("mesh_env (mega off)", MESH_FRAME, timeout=900,
        env={"PUPIL_MEGACORE": "0"})
    run("mesh_env (rb16)", MESH_FRAME, timeout=900,
        env={"PUPIL_RB": "16"})
    run("mesh_env (rb16 pop4)", MESH_FRAME, timeout=900,
        env={"PUPIL_RB": "16", "PUPIL_POP_N": "4"})
    # A/B: pallas transpose in the big-table gather fallback
    run("mesh_env (xla transpose)", MESH_FRAME, timeout=900,
        env={"PUPIL_NO_PALLAS_TRANSPOSE": "1"})
    # denoiser alone, contention-sensitive: run FIRST after the frame
    # stages, fresh process
    run("denoise_only", DENOISE_ONLY, timeout=900)
    # headline bench
    ok, tail = run("bench", "import bench; bench.main()", timeout=1500)
    if ok:
        with open("/tmp/last_bench.json", "w") as f:
            f.write(tail)
    if quick:
        log("=== quick done ===")
        return 0
    # spectral on TPU + cost vs rgb
    run("spectral_tpu", SPECTRAL_TPU, timeout=900)
    # stream-depth sweep for the streamed big scene
    for depth in ("2", "4", "8"):
        run(f"big_env depth={depth}", BIG_ENV_DEPTH, timeout=900,
            env={"PUPIL_STREAM_DEPTH": depth})
    # streamed leaf-size sweep (bigger slices amortize each DMA)
    for tcl in ("64", "128"):
        run(f"big_env tcl={tcl}", BIG_ENV_DEPTH, timeout=900,
            env={"PUPIL_TCL": tcl})
    run("big_env tcl=64 depth=4", BIG_ENV_DEPTH, timeout=900,
        env={"PUPIL_TCL": "64", "PUPIL_STREAM_DEPTH": "4"})
    log("=== tpu_suite done ===")
    return 0


if __name__ == "__main__":
    sys.exit(main())
