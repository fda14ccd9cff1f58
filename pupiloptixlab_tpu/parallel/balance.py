"""Cost-balanced tile sharding — the multi-chip load balancer.

Static pixel-slab sharding (parallel/sharding.py) gives every chip the
same NUMBER of rays but not the same WORK: traversal cost varies ~10x
across a frame (sky tiles exit at the root slab test; dense-geometry
tiles pop ~30 nodes — tools/sim_row_traversal.py measurements). With
contiguous slabs, one chip owns the expensive region and the rest idle
at the frame barrier.

The TPU-native fix is a STATIC REBALANCE, not a work-stealing queue:
XLA programs are compiled once over fixed shapes, so instead of chips
stealing tiles at runtime (a dynamic-shape pattern the compiler cannot
tile), we PERMUTE the 1024-pixel sweep tiles before the lane axis
shards — each chip's contiguous lane slab then holds an equal-cost mix.
Per-pixel RNG is keyed by pixel id (render/rng.py), so the image is
bit-identical under any permutation; the only cost is one block-granular
un-permute gather at frame end (contiguous 1024-row moves, riding ICI
on a mesh).

Cost model: per-tile traversal ITERATION COUNTS from the real kernel
(``bvh_closest(count_iters=True)`` on this viewpoint's primary rays) —
the same counter the ROADMAP's "shared sample counter" would expose, read
per-frame instead of per-pop. Refresh whenever the camera moves far
enough that per-chip sums drift (cheap: one extra primary sweep).

Reference: none — the reference is single-GPU (SURVEY §2.10); its
hardware scheduler load-balances *warps* within the one chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pupiloptixlab_tpu.flatten.types import CameraBlock, RenderConfig, SceneData

_TILE = 1024  # lanes per sweep tile == pixels per block (8 x 128)


def tile_costs(
    scene: SceneData, camera: CameraBlock, config: RenderConfig
) -> np.ndarray:
    """Per-tile primary-traversal iteration counts (T,) for this
    viewpoint — the load-balancing cost model, measured by the actual
    traversal kernel (count_iters debug output packs
    iterations * 65536 + leaf visits per tile)."""
    from pupiloptixlab_tpu.accel.pallas_bvh import bvh_closest
    from pupiloptixlab_tpu.render.camera import generate_rays_for
    from pupiloptixlab_tpu.render.integrator import _block_pix
    from pupiloptixlab_tpu.render.rng import tea_init, next_floats

    assert config.bvh_nodes > 0, "cost model needs the BVH path"
    w, h = config.width, config.height
    n = w * h
    pix = jnp.asarray(_block_pix(w, h))
    state = tea_init(pix.astype(jnp.uint32), jnp.uint32(0))
    _, (jx, jy) = next_floats(state, 2)
    ro, rd = generate_rays_for(camera, w, h, pix, jx, jy)
    tmin = jnp.full(n, 1e-3, jnp.float32)
    tmax = jnp.full(n, 1e16, jnp.float32)
    _, ib = bvh_closest(
        ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, tmin, tmax,
        scene.tris.packed, scene.tris.bvh_child, scene.tris.bvh_axis,
        scene.tris.bvh_boxes, tcl=config.bvh_tcl, count_iters=True,
        stream=False, pop2=False,
        rb=8,  # cost granularity is the 1024-pixel block, not PUPIL_RB
        interpret=jax.default_backend() != "tpu",
    )
    per_lane = np.asarray(ib).reshape(n // _TILE, _TILE)
    return (per_lane[:, 0] >> 16).astype(np.int64)


def balanced_tile_perm(costs: np.ndarray, n_chips: int) -> np.ndarray:
    """Permutation (T,) assigning tiles to ``n_chips`` contiguous lane
    slabs with near-equal cost sums: capacity-bounded greedy LPT —
    tiles sorted by cost descending, each assigned to the currently
    lightest bin that still has room (every bin must end with exactly
    T/n_chips tiles, since the lane slabs are equal-size). T must divide
    evenly by n_chips (films are block-divisible and meshes are 2^k)."""
    t = costs.shape[0]
    assert t % n_chips == 0, (t, n_chips)
    cap = t // n_chips
    order = np.argsort(-costs, kind="stable")
    bins: list[list[int]] = [[] for _ in range(n_chips)]
    sums = np.zeros(n_chips, np.int64)
    for tile in order:
        open_bins = [k for k in range(n_chips) if len(bins[k]) < cap]
        chip = min(open_bins, key=lambda k: sums[k])
        bins[chip].append(int(tile))
        sums[chip] += costs[tile]
    return np.concatenate([np.asarray(b, np.int32) for b in bins])


def render_frame_balanced(
    mesh: Mesh,
    scene: SceneData,
    camera: CameraBlock,
    seed,
    sample_cnt,
    accum,
    config: RenderConfig,
    tile_perm: np.ndarray,
):
    """render_frame_sharded with a cost-balanced tile permutation: the
    sweeps run over permuted tiles (balanced per-chip work), the outputs
    un-permute inside the jit (block-granular gather), so accum and all
    buffers stay row-major / slab-sharded exactly like the unbalanced
    path."""
    from pupiloptixlab_tpu.render.integrator import render_frame

    def step(scene, camera, seed, cnt, accum, perm):
        return render_frame(scene, camera, seed, cnt, accum, config, perm)

    pix = NamedSharding(mesh, P("pixels"))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(
        step,
        in_shardings=(rep, rep, rep, rep, pix, rep),
        out_shardings=(pix, {"frame": pix, "albedo": pix, "normal": pix,
                             "test": pix}),
        donate_argnums=(4,),
    )
    return fn(scene, camera, jnp.uint32(seed), jnp.int32(sample_cnt),
              accum, jnp.asarray(tile_perm))
