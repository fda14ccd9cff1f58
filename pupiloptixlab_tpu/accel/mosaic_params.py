"""Shared Mosaic compiler parameters for the sweep/traversal kernels.

Megacore: TPU v4/v5p chips carry TWO TensorCores; Mosaic splits a grid
dimension marked ``parallel`` across them, roughly halving wall time for
kernels whose grid steps are independent. Every ray-sweep kernel here
qualifies: each grid step owns one ray tile, writes a disjoint output
block, and scratch/SMEM state is per-core. The reference's analog is
simply the GPU SM grid of ``optixLaunch`` (optix/pass.h:69-87) — on TPU
the second core must be asked for explicitly.

``PUPIL_MEGACORE=0`` disables the annotation (A/B knob; single-core
chips like v5e ignore it either way).
"""

from __future__ import annotations

import os

from jax.experimental.pallas import tpu as pltpu


def _enabled() -> bool:
    return os.environ.get("PUPIL_MEGACORE", "1") != "0"


def ray_grid_params(extra_arbitrary: int = 0, extra_parallel: int = 0):
    """CompilerParams marking the leading (ray-tile) grid dim parallel.

    ``extra_parallel``: additional independent trailing dims (e.g. the
    column-block dim of the denoiser). ``extra_arbitrary``: trailing
    grid dims that accumulate into the same output block (e.g. the
    chunk dim of the small-scene sweep) and must stay sequential.
    """
    if not _enabled():
        return None
    sems = (
        ("parallel",)
        + ("parallel",) * extra_parallel
        + ("arbitrary",) * extra_arbitrary
    )
    return pltpu.CompilerParams(dimension_semantics=sems)
