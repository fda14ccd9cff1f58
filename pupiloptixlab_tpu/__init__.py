"""pupiloptixlab_tpu — a TPU-native real-time path-tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PupilOptixLab
(reference: /root/reference): mitsuba3-style XML scenes, a world/resource
system, a progressive path tracer with NEE + balance-heuristic MIS, seven
BSDFs, per-triangle area lights, environment-map importance sampling, AOVs,
a denoiser hook and an interactive system/pass runtime.

Where the reference leans on NVIDIA hardware (OptiX accel structures, SBT
dispatch, CUDA textures, DX12 display), this package is designed TPU-first:

* scene data is flattened to static-shape structure-of-arrays jnp buffers,
* the render loop is a single jit-compiled wavefront program
  (generate -> intersect -> shade -> NEE shadow -> accumulate),
* material dispatch is branchless masked evaluation over a dense
  material table (replaces optixDirectCall / SBT),
* ray/primitive intersection runs as vectorized XLA (with Pallas kernels
  for the hot paths) instead of RT cores,
* multi-chip scaling shards pixels/samples over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

# Belt-and-braces backend pin: honoring JAX_PLATFORMS=cpu must not
# depend on plugin discovery. The container's sitecustomize registers a
# TPU PJRT plugin at interpreter start, and when that plugin's remote
# endpoint is unreachable its discovery can block a process that only
# asked for the CPU backend; jax.config.update applied before the first
# backend is created pins CPU deterministically (same approach as
# tests/conftest.py).
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from pupiloptixlab_tpu.scene.scene import Scene, load_scene  # noqa: F401
