"""Pallas TPU wide-BVH traversal — per-ray-tile ordered descent.

The optixTrace replacement for large meshes (reference:
example/path_tracer/main.cu:77-82 traverses a hardware BVH per ray).
TPUs have no per-lane gather, so the traversal unit is a RAY TILE
(rb x 128 rays): the tile walks an 8-WIDE tree (accel/bvh.py) together,
descending into every child ANY lane's slab test passes.

Why 8-wide: scalar control flow on TPU pays a vector->scalar sync
(reduction + branch) per traversal step. A binary tree pays it per
node and measured SLOWER than the flat chunk sweep (1.8 vs 3.4 Mray/s
on a 20k-tri scene); the wide tree tests all 8 children in ONE
VPU-shaped (8, rb, 128) slab test and packs their any-hit bits into a
single scalar mask — one sync per 8 nodes, and the tree is 3x
shallower. This is the CWBVH idea with the warp replaced by a VPU tile.

Mechanics:

* child-id + axis tables ride in SMEM (scalar prefetch); the 8 child
  boxes of a node are one sublane-aligned (8, 8) dynamic slice of a
  VMEM table;
* the traversal stack is an SMEM scratch array; children are pushed
  far-to-near (build-time sort along the node's dominant axis + the
  tile's direction sign picks the iteration direction);
* slab tests clamp tfar by each lane's running closest-hit ``tbest``,
  so ordered descent prunes far subtrees once hits are found;
* a leaf is one contiguous TCL-row slice of the packed triangle table
  (dynamic ``pl.ds`` fetch), tested with vectorized Moller-Trumbore;
* the any-hit variant (shadow rays; reference render/emitter.h:91-100
  terminate-on-first-hit) keeps an ``occluded`` mask instead of
  (t, index): occluded lanes drop out of every slab test, so a fully
  occluded tile prunes the remaining tree to nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mosaic_params import ray_grid_params

MAX_DISTANCE = 1e16
_DET_EPS = 1e-12

import os as _os

LANES = 128
STACK_SIZE = 128  # dual-pop pushes up to 14 children/iteration
# Ray rows per tile (fallback when the caller passes no rb). 8 is the
# f32 sublane tile — Mosaic requires block sublane counts divisible by
# 8, so 1024 rays (8 x 128) is the smallest legal tile. The production
# path (accel/intersect.py::_rb_for) picks 16 for VMEM-resident tables
# and 8 for streamed ones from tpu_suite A/B measurements and passes it
# explicitly (with the sort pad quantum kept consistent); PUPIL_RB
# overrides everywhere.
DEFAULT_RB = int(_os.environ.get("PUPIL_RB", "8"))
# In-flight leaf DMAs in streaming mode (ring of scratch buffers); the
# fetch consumed at iteration i was issued at i - depth.
# PUPIL_STREAM_DEPTH overrides for sweeps (debug knob).
DEFAULT_STREAM_DEPTH = int(_os.environ.get("PUPIL_STREAM_DEPTH", "2"))
# Nodes popped per vector->scalar sync in the resident kernels (A/B
# knob; 2 measured best-known, 4 halves syncs again at the cost of
# wasted slab tests on shallow stacks).
POP_N = int(_os.environ.get("PUPIL_POP_N", "2"))
# Debug knob: force the UNPACKED streamed layout even when tcl is
# packed-eligible (isolates packed-kernel issues on hardware; the
# count_iters+packed combination has faulted on a real chip).
NO_PACK = int(_os.environ.get("PUPIL_NO_PACK", "0"))
# Leaves tested per inner drain-loop iteration in the resident kernels.
# >1 halves (etc.) the Mosaic while-loop overhead per leaf at the cost
# of one duplicate/garbage leaf MT when the stack depth isn't a
# multiple: SAFE because any leaf slice only ever contributes TRUE
# intersections (tbest/occ take a min/or over real triangle hits, and
# dead lanes carry empty ray intervals), the same argument that lets
# streamed dead fetches run unguarded. Clamped >= 1: the drain loop
# decrements by DRAIN_N, so 0/negative would never terminate.
# NOTE (count_iters diagnostics): with DRAIN_N > 1 the leaf counter
# counts stack DRAINS, not MT invocations — clamped duplicate re-tests
# are invisible in the counter.
DRAIN_N = max(1, int(_os.environ.get("PUPIL_DRAIN_N", "1")))


def _moller_trumbore(rows, ox, oy, oz, dx, dy, dz, tmn_v, tmx_v):
    """Vectorized MT over a (TCL, 12) leaf slice vs an (rb, 128) tile.
    Returns per-pair t with misses at MAX_DISTANCE, shape (TCL, rb, 128).
    """
    def col(i):
        return rows[:, i][:, None, None]

    return _moller_trumbore_cols(col, ox, oy, oz, dx, dy, dz, tmn_v, tmx_v)


def _moller_trumbore_cols(col, ox, oy, oz, dx, dy, dz, tmn_v, tmx_v):
    p0x, p0y, p0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3), col(4), col(5)
    e2x, e2y, e2z = col(6), col(7), col(8)

    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    det_safe = jnp.where(jnp.abs(det) < _DET_EPS, _DET_EPS, det)
    r = pl.reciprocal(det_safe, approx=True)
    inv = r * (2.0 - det_safe * r)
    tvx = ox - p0x
    tvy = oy - p0y
    tvz = oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv

    hit = (
        (jnp.abs(det) >= _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmn_v)
        & (t < tmx_v)
    )
    return jnp.where(hit, t, MAX_DISTANCE)


def _mt_packed(rows, ox, oy, oz, dx, dy, dz, tmn_v, tmx_v):
    """MT over a PACKED streamed leaf slice (see _pack_stream): rows is
    (rpl, 128) with 4 triangles per row at lane stride 32, so a tcl-tri
    leaf is rpl = tcl/4 sublanes — a 4x smaller HBM fetch than the
    (tcl, 128) row-per-triangle layout (narrow-minor HBM slices don't
    compile; 128-lane minor is mandatory, so density must come from
    packing MORE triangles per row, not fewer lanes). Unpacking is the
    same static single-lane slice + broadcast _slab8 uses — no
    transpose, no gather. Returns t of shape (4*rpl, rb, 128) in
    j-order: pair j <-> leaf-local triangle 4*(j % rpl) + j // rpl.

    Tie-break caveat: argmin over j picks the smallest J, and j-order
    interleaves local indices, so when two triangles of one leaf hit at
    EXACTLY the same t (coincident/duplicated geometry) the winning
    index can differ from the resident kernel's smallest-local-index
    choice. t and hit/miss are unaffected; only which of two coincident
    triangles reports. Accepted deviation (a composite (t, local) key
    would cost extra VPU work per leaf for a degenerate-geometry-only
    case)."""
    parts = []
    for k in range(4):
        def col(i, _k=k):
            return rows[:, 32 * _k + i][:, None, None]

        parts.append(
            _moller_trumbore_cols(col, ox, oy, oz, dx, dy, dz, tmn_v, tmx_v)
        )
    return jnp.concatenate(parts, axis=0)


def _packed_local(jmin, rpl: int):
    """Decode the j-order argmin of _mt_packed to the leaf-local
    triangle index (rpl is a power of two)."""
    lb = rpl.bit_length() - 1
    return 4 * (jmin & (rpl - 1)) + (jmin >> lb)


def _pack_stream(tri: jnp.ndarray) -> jnp.ndarray:
    """(T, 12) packed rows -> (T/4, 128) streamed table: triangle
    4g+k of the tree order lives at row g, lanes [32k, 32k+12)."""
    t, c = tri.shape
    g = tri.reshape(t // 4, 4, c)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, 32 - c)))
    return g.reshape(t // 4, 128)


def _slab8(blk, ox, oy, oz, ix, iy, iz, tmn_v, tfar_clamp):
    """Slab test of 8 child boxes (blk: (8, 8) rows) against the tile.
    Returns (tn, tf) of shape (8, rb, 128)."""
    def c(i):
        return blk[:, i][:, None, None]

    tx0 = (c(0) - ox) * ix
    ty0 = (c(1) - oy) * iy
    tz0 = (c(2) - oz) * iz
    tx1 = (c(3) - ox) * ix
    ty1 = (c(4) - oy) * iy
    tz1 = (c(5) - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), tmn_v),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), tfar_clamp),
    )
    return tn, tf


def _dual_pop(nstack_ref, box_ref, ax_ref, child_ref,
              ox, oy, oz, ix, iy, iz, tmn_v, tfar_clamp, sx, sy, sz,
              nsp, lsp, lstack_ref, ordered: bool, n_pop: int = 2):
    """Pop ``n_pop`` internal nodes per vector->scalar sync.

    The single-pop loop pays one VPU-reduction -> scalar-branch sync per
    node; at ~20 pops/tile that sync is the dominant per-pop cost once
    leaves drain in the inner while. Here all popped nodes' 8-child slab
    tests run back to back and their votes land in ONE (n_pop*8, 1)
    reduction, so the sync count divides by n_pop. Ordering degrades
    gracefully: the stack top (nearest) still contributes its children
    above deeper nodes', and closest-hit correctness never depends on
    visit order (tbest only prunes). Idle pop slots clamp to the root
    and gate their bits to 0 — extra VECTOR work only, no extra sync,
    which is the right trade while the sync dominates. ``ordered=False``
    (any-hit) skips the near-first child iteration. n_pop is a power of
    two <= 4 (bits pack into one i32)."""
    haves = [nsp > i for i in range(n_pop)]
    nodes = [
        jnp.maximum(
            jnp.where(h, nstack_ref[jnp.maximum(nsp - 1 - i, 0)], 0), 0
        )
        for i, h in enumerate(haves)
    ]
    for h in haves:
        nsp = nsp - h.astype(jnp.int32)
    hs = []
    for nd in nodes:
        blk = box_ref[pl.ds(pl.multiple_of(nd * 8, 8), 8), :]
        tn, tf = _slab8(blk, ox, oy, oz, ix, iy, iz, tmn_v, tfar_clamp)
        hs.append(jnp.any(jnp.any(tn <= tf, axis=2), axis=1, keepdims=True))
    w = jnp.concatenate(hs, axis=0)  # (n_pop*8, 1)
    weights = 1 << jax.lax.broadcasted_iota(jnp.int32, (n_pop * 8, 1), 0)
    bits = jnp.sum(w.astype(jnp.int32) * weights)  # ONE sync for n_pop pops
    bits_k = [
        jnp.where(h, (bits >> (8 * i)) & 0xFF, 0)
        for i, h in enumerate(haves)
    ]
    nsp2, lsp2 = nsp, lsp
    # deeper stack entries push FIRST so the top node's (nearer)
    # children stay on top
    for node, bitsk in zip(nodes[::-1], bits_k[::-1]):
        if ordered:
            axis = ax_ref[node]
            fwd = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
        for k in range(8):
            if ordered:
                kk = jnp.where(fwd == 1, 7 - k, k)
            else:
                kk = k
            take = (bitsk >> kk) & 1
            cid = child_ref[node * 8 + kk]
            is_leaf_c = (cid < 0).astype(jnp.int32)
            nstack_ref[nsp2] = cid
            nsp2 = nsp2 + take * (1 - is_leaf_c)
            lstack_ref[lsp2] = -cid - 1
            lsp2 = lsp2 + take * is_leaf_c
    return nsp2, lsp2


def _mt_cols_table(tri: jnp.ndarray, center) -> jnp.ndarray:
    """(T, 12) packed rows -> (10, 4T) linear-form table for the MXU MT.

    Moller-Trumbore is bilinear in (triangle constants) x (ray
    quantities): with the per-ray feature f = [d, c=(ro-ctr) x d,
    ro-ctr, 1] (10 floats) and N = e1 x e2,

        det      = f . [-N, 0, 0, 0]
        u * det  = f . [p0c x e2,  e2, 0, 0]
        v * det  = f . [-(p0c x e1), -e1, 0, 0]
        t * det  = f . [0, 0, N, -(p0c . N)]

    so ONE (10, 128) x (10, N) contraction per 32-tri leaf produces all
    four quantities for every (tri, ray) pair on the MXU instead of
    ~50 VPU ops per pair. Recentering by the scene centroid keeps the
    f32 conditioning at classic-MT level (validated hit-plausible max
    err BELOW classic f32 MT). Lanes are grouped per leaf:
    [det(tcl) | u(tcl) | v(tcl) | t(tcl)] with tcl = 32 -> 128-lane
    slices, exactly one aligned lane-slice per leaf."""
    t = tri.shape[0]
    p0 = tri[:, 0:3] - center[None, :]
    e1 = tri[:, 3:6]
    e2 = tri[:, 6:9]
    n = jnp.cross(e1, e2)
    zero3 = jnp.zeros_like(p0)
    zero1 = jnp.zeros((t, 1), tri.dtype)
    g_det = jnp.concatenate([-n, zero3, zero3, zero1], 1)          # (T, 10)
    g_u = jnp.concatenate([jnp.cross(p0, e2), e2, zero3, zero1], 1)
    g_v = jnp.concatenate([-jnp.cross(p0, e1), -e1, zero3, zero1], 1)
    g_t = jnp.concatenate(
        [zero3, zero3, n, -jnp.sum(p0 * n, 1, keepdims=True)], 1
    )
    # (T, 4, 10) -> leaf-grouped (T/32, 4, 32, 10): per leaf the 128
    # lanes are [det x32 | u x32 | v x32 | t x32]
    g = jnp.stack([g_det, g_u, g_v, g_t], axis=1)
    g = g.reshape(t // 32, 32, 4, 10).transpose(0, 2, 1, 3)
    return g.reshape(4 * t, 10).T  # (10, 4T)


def _make_closest_kernel(tcl: int, stream: bool = False, stream_depth: int = 2,
                         count_iters: bool = False, instanced: bool = False,
                         pop2: bool = False, packed: bool = False):
    rpl = tcl // 4  # packed streamed rows per leaf

    def kernel(*refs):
        if instanced:
            # extra scalar-prefetch tables: world-leaf payloads + 3x4
            # world->object matrices (flat f32). The leaf drain
            # transforms the ray TILE into the leaf instance's object
            # space; directions are NOT renormalized so the MT's t stays
            # the world parameter and tbest pruning is unchanged.
            (child_ref, ax_ref, ls_ref, li_ref, w2o_ref,
             box_ref, tri_ref,
             rox, roy, roz, rdx, rdy, rdz, irx, iry, irz, tmn, tmx,
             tbest, ibest, lbest, nstack_ref, lstack_ref, *dma) = refs
            lbest[:] = jnp.full_like(lbest[:], -1)
            n_leaf_tab = ls_ref.shape[0]
        else:
            (child_ref, ax_ref, box_ref, tri_ref,
             rox, roy, roz, rdx, rdy, rdz, irx, iry, irz, tmn, tmx,
             tbest, ibest, nstack_ref, lstack_ref, *dma) = refs
        tbest[:] = jnp.full_like(tbest[:], MAX_DISTANCE)
        ibest[:] = jnp.full_like(ibest[:], -1)
        # triangle COUNT of the table (packed streamed tables carry 4
        # triangles per physical row)
        t_rows = tri_ref.shape[0] * (4 if packed else 1)

        ox, oy, oz = rox[:], roy[:], roz[:]
        dx, dy, dz = rdx[:], rdy[:], rdz[:]
        ix, iy, iz = irx[:], iry[:], irz[:]
        tmn_v, tmx_v = tmn[:], tmx[:]

        # tile direction signs -> child iteration direction per axis
        sx = (jnp.sum(dx) >= 0.0).astype(jnp.int32)
        sy = (jnp.sum(dy) >= 0.0).astype(jnp.int32)
        sz = (jnp.sum(dz) >= 0.0).astype(jnp.int32)

        nstack_ref[0] = 0

        def leaf_copy(start, j):
            # computed-slot ring: dma[0] is ONE (nbuf*rows, 128) buffer,
            # dma[1] a DMA semaphore ARRAY — slot j (a traced scalar)
            # picks the sublane slice + semaphore, so the drain loop has
            # no unrolled pl.when blocks (one wait + one start per
            # iteration regardless of stream_depth).  start is a
            # TRIANGLE index (tcl-multiple); packed tables fetch the
            # rpl-row slice that holds the leaf (4x fewer bytes).
            if packed:
                src = tri_ref.at[
                    pl.ds(pl.multiple_of(start // 4, rpl), rpl), :
                ]
                dst = dma[0].at[pl.ds(pl.multiple_of(j * rpl, rpl), rpl), :]
            else:
                src = tri_ref.at[pl.ds(start, tcl), :]
                dst = dma[0].at[pl.ds(pl.multiple_of(j * tcl, tcl), tcl), :]
            return pltpu.make_async_copy(src, dst, dma[1].at[j])

        def slot_rows(j):
            r = rpl if packed else tcl
            return dma[0][pl.ds(pl.multiple_of(j * r, r), r), :]

        def clamp_leaf(s):
            return pl.multiple_of(jnp.clip(s, 0, t_rows - tcl), tcl)

        def _best_update(t, start):
            tmin_c = jnp.min(t, axis=0)
            jmin = jnp.argmin(t, axis=0)
            if packed:
                jmin = _packed_local(jmin, rpl)
            better = tmin_c < tbest[:]
            tbest[:] = jnp.where(better, tmin_c, tbest[:])
            ibest[:] = jnp.where(better, start + jmin, ibest[:])
            return better

        def mt_update(rows, start):
            mt = _mt_packed if packed else _moller_trumbore
            t = mt(rows, ox, oy, oz, dx, dy, dz, tmn_v, tmx_v)
            _best_update(t, start)

        def mt_update_inst(li, rows=None):
            li = jnp.clip(li, 0, n_leaf_tab - 1)
            start = clamp_leaf(ls_ref[li])
            inst = li_ref[li]

            def w(k):
                return w2o_ref[inst * 12 + k]

            oxo = w(0) * ox + w(1) * oy + w(2) * oz + w(3)
            oyo = w(4) * ox + w(5) * oy + w(6) * oz + w(7)
            ozo = w(8) * ox + w(9) * oy + w(10) * oz + w(11)
            dxo = w(0) * dx + w(1) * dy + w(2) * dz
            dyo = w(4) * dx + w(5) * dy + w(6) * dz
            dzo = w(8) * dx + w(9) * dy + w(10) * dz
            if rows is None:  # VMEM-resident table (never packed)
                rows = tri_ref[pl.ds(start, tcl), :]
                t = _moller_trumbore(
                    rows, oxo, oyo, ozo, dxo, dyo, dzo, tmn_v, tmx_v,
                )
            else:
                mt = _mt_packed if packed else _moller_trumbore
                t = mt(rows, oxo, oyo, ozo, dxo, dyo, dzo, tmn_v, tmx_v)
            better = _best_update(t, start)
            lbest[:] = jnp.where(better, li, lbest[:])

        def pop_and_push(nsp, lsp):
            """Pop one internal node, wide-test its 8 children, push
            (this is the vector work a streamed leaf DMA overlaps).
            Mosaic constraints (measured, see CLAUDE.md): the
            VMEM-mutating pl.when blocks sit at the TOP level of the
            loop body, and all SMEM stack stores are unconditional with
            conditional index bumps."""
            have_node = nsp > 0
            # dead slots may hold leaf ids (unconditional stores below),
            # so clamp the idle-pop read to the root (bits gate to 0)
            node = jnp.where(have_node, nstack_ref[jnp.maximum(nsp - 1, 0)], 0)
            node = jnp.maximum(node, 0)
            nsp = nsp - have_node.astype(jnp.int32)
            blk = box_ref[pl.ds(pl.multiple_of(node * 8, 8), 8), :]
            tn, tf = _slab8(
                blk, ox, oy, oz, ix, iy, iz, tmn_v,
                jnp.minimum(tbest[:], tmx_v),
            )
            # keepdims all the way down: a rank-1 vector intermediate
            # here crashes Mosaic's layout inference (VectorLayout::join
            # check failure in inferElementwise)
            hit2 = jnp.any(tn <= tf, axis=2)  # (8, rb)
            want = jnp.any(hit2, axis=1, keepdims=True)  # (8, 1)
            weights = 1 << jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            bits = jnp.sum(want.astype(jnp.int32) * weights)  # ONE sync
            bits = jnp.where(have_node, bits, 0)
            axis = ax_ref[node]
            fwd = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
            nsp2, lsp2 = nsp, lsp
            for k in range(8):
                # children sorted ascending along axis: dir>=0 means low k
                # is near -> iterate far-to-near so near is popped first
                kk = jnp.where(fwd == 1, 7 - k, k)
                take = (bits >> kk) & 1
                cid = child_ref[node * 8 + kk]
                is_leaf_c = (cid < 0).astype(jnp.int32)
                # unconditional store + conditional bump: uncommitted
                # slots are dead
                nstack_ref[nsp2] = cid
                nsp2 = nsp2 + take * (1 - is_leaf_c)
                lstack_ref[lsp2] = -cid - 1
                lsp2 = lsp2 + take * is_leaf_c
            return nsp2, lsp2

        if stream:
            # PIPELINED two-stack traversal: a rotating ring of
            # ``stream_depth`` scratch buffers keeps that many leaf DMAs
            # in flight, so the fetch consumed at iteration i was issued
            # at iteration i - depth and had depth iterations of wide
            # tests + MTs to land (round 2's single-buffer prefetch gave
            # it ONE iteration — still DMA-latency bound at ~10 us/pop).
            # Carry holds the ring of in-flight row starts, oldest
            # first (-1 = dead fetch of row 0, run through the MT
            # UNGUARDED: testing leaf 0's real triangles on a dead slot
            # only ever records true intersections, so closest/any-hit
            # results are unchanged and no conditional VMEM store is
            # needed). Each iteration waits + restarts the SAME ring
            # slot, keeping every DMA waited exactly once.
            nbuf = stream_depth

            def start_of(v):
                # instanced: the stack holds leaf-table indices; the DMA
                # row start resolves through ls_ref (dead -1 -> leaf 0,
                # consumed UNGUARDED like the baked dead fetch)
                if instanced:
                    return clamp_leaf(ls_ref[jnp.clip(v, 0, n_leaf_tab - 1)])
                return clamp_leaf(v)

            def cond(c):
                live = (c[0] > 0) | (c[1] > 0)
                for s in c[3:3 + nbuf]:
                    live = live | (s >= 0)
                return live

            def body(c):
                # NESTED drain (mirrors the resident kernel): the inner
                # while consumes one in-flight leaf per iteration and
                # restarts its ring slot with the next stacked leaf, so
                # the slab8 + vector->scalar sync of pop_and_push runs
                # once per NODE, not once per LEAF (~3.5 leaves/node on
                # real trees; the flat loop paid an idle pop's slab test
                # on every drain iteration). In-flight fetches persist
                # ACROSS pops: a fetch issued before a pop lands while
                # the pop's wide test runs. When the node stack is empty
                # the inner loop also drains the remaining live ring
                # entries (dead restarts), so the outer epilogue only
                # ever retires dead fetches.
                nsp, lsp, phase = c[0], c[1], c[2]
                sq = c[3:3 + nbuf]

                def drain_cond(ic):
                    ring_live = ic[2] >= 0
                    for s in ic[3:3 + nbuf]:
                        ring_live = ring_live | (s >= 0)
                    return (ic[0] > 0) | ((nsp == 0) & ring_live)

                def drain_body(ic):
                    lspd, ph = ic[0], ic[1]
                    dq = ic[2:2 + nbuf]
                    have_next = lspd > 0
                    nstart_raw = lstack_ref[jnp.maximum(lspd - 1, 0)]
                    nstart = jnp.where(have_next, nstart_raw, -1)
                    lspd2 = lspd - have_next.astype(jnp.int32)
                    s0 = dq[0]
                    leaf_copy(start_of(s0), ph).wait()
                    if instanced:
                        mt_update_inst(s0, slot_rows(ph))
                    else:
                        mt_update(slot_rows(ph), clamp_leaf(s0))
                    leaf_copy(start_of(nstart), ph).start()
                    ph2 = jnp.where(ph + 1 >= nbuf, 0, ph + 1)
                    tail = (ic[2 + nbuf] + 1,) if count_iters else ()
                    return (lspd2, ph2) + dq[1:] + (nstart,) + tail

                ic = jax.lax.while_loop(
                    drain_cond, drain_body,
                    (lsp, phase) + sq + ((c[3 + nbuf],) if count_iters else ()),
                )
                lsp2, phase2, sq2 = ic[0], ic[1], ic[2:2 + nbuf]
                nsp2, lsp3 = pop_and_push(nsp, lsp2)
                # counter order: (leaf drains, pops)
                tail = (ic[2 + nbuf], c[3 + nbuf + 1] + 1) if count_iters else ()
                return (nsp2, lsp3, phase2) + sq2 + tail

            for j in range(nbuf):  # prime the ring (dead fetches)
                leaf_copy(start_of(jnp.int32(0)), jnp.int32(j)).start()
            init = (1, 0, 0) + (-1,) * nbuf
            if count_iters:
                # counters: (leaf drains incl. dead-ring waits, pops);
                # packed like the resident kernel: pops*65536 + leaves
                fin = jax.lax.while_loop(cond, body, init + (0, 0))
                ibest[:] = jnp.full_like(
                    ibest[:], fin[3 + nbuf + 1] * 65536 + fin[3 + nbuf]
                )
            else:
                jax.lax.while_loop(cond, body, init)
            for j in range(nbuf):  # retire the final in-flight fetches
                leaf_copy(start_of(jnp.int32(0)), jnp.int32(j)).wait()
        else:
            # VMEM-resident table: an INNER while drains every stacked
            # leaf (the loop condition guarantees one, so the MT needs
            # no pl.when and — crucially — no vector->scalar sync),
            # then the outer body pops one node. Iteration counts on
            # real 1080p bounce rays are near the ideal leaf-union bound
            # (29.8/tile vs ~25 minimal) but the old 1-leaf-per-
            # iteration loop paid ~1.7 us of sync + slab + scalar pushes
            # around each ~0.5 us MT; with ~26 leaves but only ~10 node
            # pops per tile this moves all of that overhead to the pops.
            def drain_cond(s):
                return s > 0

            def drain_body(s):
                # DRAIN_N leaves per iteration; index clamps below 0 re-
                # test an already-drained slot — harmless (see DRAIN_N)
                for j in range(DRAIN_N):
                    lstart = lstack_ref[jnp.maximum(s - 1 - j, 0)]
                    if instanced:
                        mt_update_inst(lstart)
                    else:
                        start = clamp_leaf(lstart)
                        mt_update(tri_ref[pl.ds(start, tcl), :], start)
                return jnp.maximum(s - DRAIN_N, 0)

            def cond(c):
                nsp, lsp = c[0], c[1]
                return (nsp > 0) | (lsp > 0)

            def body(c):
                nsp, lsp = c[0], c[1]
                jax.lax.while_loop(drain_cond, drain_body, lsp)
                if pop2:
                    nsp2, lsp2 = _dual_pop(
                        nstack_ref, box_ref, ax_ref, child_ref,
                        ox, oy, oz, ix, iy, iz, tmn_v,
                        jnp.minimum(tbest[:], tmx_v), sx, sy, sz,
                        nsp, jnp.int32(0), lstack_ref, ordered=True,
                        n_pop=POP_N,
                    )
                else:
                    nsp2, lsp2 = pop_and_push(nsp, jnp.int32(0))
                if count_iters:
                    # the drain always empties the stack: leaves += lsp
                    return (nsp2, lsp2, c[2] + 1, c[3] + lsp)
                return (nsp2, lsp2)

            if count_iters:
                _, _, iters, leaves = jax.lax.while_loop(
                    cond, body, (1, 0, 0, 0)
                )
                ibest[:] = jnp.full_like(ibest[:], iters * 65536 + leaves)
            else:
                jax.lax.while_loop(cond, body, (1, 0))

    return kernel


def _make_closest_kernel_mxu(tcl: int):
    """Resident closest-hit traversal with the leaf MT on the MXU.

    Identical two-stack structure to the classic resident kernel; the
    per-leaf Moller-Trumbore is replaced by ONE (10, 128) x (10, N)
    dot_general at Precision.HIGHEST against the linear-form table
    (_mt_cols_table), producing det / u*det / v*det / t*det for all
    (tri, ray) pairs of the leaf. Requires tcl == 32 (one 128-lane
    table slice per leaf).

    Pair results live in LANE layout (rows = tris, lanes = rays), so
    the running closest hit is kept in (1, N) scratch; the (rb, 128)
    view the slab test needs is refreshed by one relayout per NODE POP
    (stale between pops is safe: tbest only prunes)."""

    def kernel(center_ref, child_ref, ax_ref, box_ref, mt_ref,
               rox, roy, roz, rdx, rdy, rdz, irx, iry, irz, tmn, tmx,
               tbest, ibest,
               nstack_ref, lstack_ref, f_ref, tb_l, ib_l):
        rb = rox.shape[0]
        n = rb * LANES

        ox, oy, oz = rox[:], roy[:], roz[:]
        dx, dy, dz = rdx[:], rdy[:], rdz[:]
        ix, iy, iz = irx[:], iry[:], irz[:]
        tmn_v, tmx_v = tmn[:], tmx[:]

        # per-ray feature rows [d | (ro-ctr) x d | ro-ctr | 1] in lane
        # layout (one (rb,128) -> (1, N) relayout per plane, per tile)
        cx0, cy0, cz0 = center_ref[0], center_ref[1], center_ref[2]
        rcx, rcy, rcz = ox - cx0, oy - cy0, oz - cz0
        ccx = rcy * dz - rcz * dy
        ccy = rcz * dx - rcx * dz
        ccz = rcx * dy - rcy * dx

        def lane(p):
            return p.reshape(1, n)

        f_ref[0:1, :] = lane(dx)
        f_ref[1:2, :] = lane(dy)
        f_ref[2:3, :] = lane(dz)
        f_ref[3:4, :] = lane(ccx)
        f_ref[4:5, :] = lane(ccy)
        f_ref[5:6, :] = lane(ccz)
        f_ref[6:7, :] = lane(rcx)
        f_ref[7:8, :] = lane(rcy)
        f_ref[8:9, :] = lane(rcz)
        f_ref[9:10, :] = jnp.ones((1, n), jnp.float32)
        tmn_l = lane(tmn_v)
        tmx_l = lane(tmx_v)

        tb_l[:] = jnp.full_like(tb_l[:], MAX_DISTANCE)
        ib_l[:] = jnp.full_like(ib_l[:], -1)

        sx = (jnp.sum(dx) >= 0.0).astype(jnp.int32)
        sy = (jnp.sum(dy) >= 0.0).astype(jnp.int32)
        sz = (jnp.sum(dz) >= 0.0).astype(jnp.int32)

        nstack_ref[0] = 0
        f_all = f_ref[:]

        def mt_update(start):
            lane0 = pl.multiple_of(start * 4, 128)
            g = mt_ref[:, pl.ds(lane0, 128)]  # (10, 128)
            out = jax.lax.dot_general(
                g, f_all, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (128, N): rows [det | u*det | v*det | t*det] x tcl
            det = out[0:tcl, :]
            up = out[tcl : 2 * tcl, :]
            vp = out[2 * tcl : 3 * tcl, :]
            tp = out[3 * tcl : 4 * tcl, :]
            det_safe = jnp.where(jnp.abs(det) < _DET_EPS, _DET_EPS, det)
            r = pl.reciprocal(det_safe, approx=True)
            inv = r * (2.0 - det_safe * r)
            t = tp * inv
            ok = (
                (jnp.abs(det) >= _DET_EPS)
                & (up * det >= 0.0)
                & (vp * det >= 0.0)
                & ((det - up - vp) * det >= 0.0)
                & (t > tmn_l)
                & (t < tmx_l)
            )
            t = jnp.where(ok, t, MAX_DISTANCE)
            tmin_c = jnp.min(t, axis=0, keepdims=True)       # (1, N)
            jmin = jnp.argmin(t, axis=0, keepdims=True)
            better = tmin_c < tb_l[:]
            tb_l[:] = jnp.where(better, tmin_c, tb_l[:])
            ib_l[:] = jnp.where(better, start + jmin, ib_l[:])

        def pop_and_push(nsp, lsp, tbest_rb):
            have_node = nsp > 0
            node = jnp.where(have_node, nstack_ref[jnp.maximum(nsp - 1, 0)], 0)
            node = jnp.maximum(node, 0)
            nsp = nsp - have_node.astype(jnp.int32)
            blk = box_ref[pl.ds(pl.multiple_of(node * 8, 8), 8), :]
            tn, tf = _slab8(
                blk, ox, oy, oz, ix, iy, iz, tmn_v,
                jnp.minimum(tbest_rb, tmx_v),
            )
            hit2 = jnp.any(tn <= tf, axis=2)
            want = jnp.any(hit2, axis=1, keepdims=True)
            weights = 1 << jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            bits = jnp.sum(want.astype(jnp.int32) * weights)
            bits = jnp.where(have_node, bits, 0)
            axis = ax_ref[node]
            fwd = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
            nsp2, lsp2 = nsp, lsp
            for k in range(8):
                kk = jnp.where(fwd == 1, 7 - k, k)
                take = (bits >> kk) & 1
                cid = child_ref[node * 8 + kk]
                is_leaf_c = (cid < 0).astype(jnp.int32)
                nstack_ref[nsp2] = cid
                nsp2 = nsp2 + take * (1 - is_leaf_c)
                lstack_ref[lsp2] = -cid - 1
                lsp2 = lsp2 + take * is_leaf_c
            return nsp2, lsp2

        def drain_cond(s):
            return s > 0

        def drain_body(s):
            for j in range(DRAIN_N):
                mt_update(lstack_ref[jnp.maximum(s - 1 - j, 0)])
            return jnp.maximum(s - DRAIN_N, 0)

        def cond(c):
            nsp, lsp = c[0], c[1]
            return (nsp > 0) | (lsp > 0)

        def body(c):
            nsp, lsp = c[0], c[1]
            jax.lax.while_loop(drain_cond, drain_body, lsp)
            # one relayout per pop: the slab clamp tolerates staleness
            tbest_rb = tb_l[:].reshape(rb, LANES)
            nsp2, lsp2 = pop_and_push(nsp, jnp.int32(0), tbest_rb)
            return (nsp2, lsp2)

        jax.lax.while_loop(cond, body, (1, 0))
        tbest[:] = tb_l[:].reshape(rb, LANES)
        ibest[:] = ib_l[:].reshape(rb, LANES)

    return kernel


def _make_anyhit_kernel(tcl: int, stream: bool = False, stream_depth: int = 2,
                        instanced: bool = False, pop2: bool = False,
                        packed: bool = False):
    rpl = tcl // 4

    def kernel(*refs):
        if instanced:
            (child_ref, ax_ref, ls_ref, li_ref, w2o_ref,
             box_ref, tri_ref,
             rox, roy, roz, rdx, rdy, rdz, irx, iry, irz, tmn, tmx,
             occ, nstack_ref, lstack_ref, *dma) = refs
            n_leaf_tab = ls_ref.shape[0]
        else:
            (child_ref, ax_ref, box_ref, tri_ref,
             rox, roy, roz, rdx, rdy, rdz, irx, iry, irz, tmn, tmx,
             occ, nstack_ref, lstack_ref, *dma) = refs
        occ[:] = jnp.zeros_like(occ[:])
        t_rows = tri_ref.shape[0] * (4 if packed else 1)

        ox, oy, oz = rox[:], roy[:], roz[:]
        dx, dy, dz = rdx[:], rdy[:], rdz[:]
        ix, iy, iz = irx[:], iry[:], irz[:]
        tmn_v, tmx_v = tmn[:], tmx[:]

        nstack_ref[0] = 0

        def leaf_copy(start, j):
            # computed-slot ring (see the closest kernel); packed tables
            # fetch the rpl-row slice holding the leaf (4x fewer bytes)
            if packed:
                src = tri_ref.at[
                    pl.ds(pl.multiple_of(start // 4, rpl), rpl), :
                ]
                dst = dma[0].at[pl.ds(pl.multiple_of(j * rpl, rpl), rpl), :]
            else:
                src = tri_ref.at[pl.ds(start, tcl), :]
                dst = dma[0].at[pl.ds(pl.multiple_of(j * tcl, tcl), tcl), :]
            return pltpu.make_async_copy(src, dst, dma[1].at[j])

        def slot_rows(j):
            r = rpl if packed else tcl
            return dma[0][pl.ds(pl.multiple_of(j * r, r), r), :]

        def clamp_leaf(s):
            return pl.multiple_of(jnp.clip(s, 0, t_rows - tcl), tcl)

        def occ_update(rows):
            mt = _mt_packed if packed else _moller_trumbore
            t = mt(rows, ox, oy, oz, dx, dy, dz, tmn_v, tmx_v)
            hit_here = jnp.min(t, axis=0) < MAX_DISTANCE
            occ[:] = jnp.where(hit_here, 1, occ[:])

        def occ_update_inst(li, rows=None):
            li = jnp.clip(li, 0, n_leaf_tab - 1)
            start = clamp_leaf(ls_ref[li])
            inst = li_ref[li]

            def w(k):
                return w2o_ref[inst * 12 + k]

            oxo = w(0) * ox + w(1) * oy + w(2) * oz + w(3)
            oyo = w(4) * ox + w(5) * oy + w(6) * oz + w(7)
            ozo = w(8) * ox + w(9) * oy + w(10) * oz + w(11)
            dxo = w(0) * dx + w(1) * dy + w(2) * dz
            dyo = w(4) * dx + w(5) * dy + w(6) * dz
            dzo = w(8) * dx + w(9) * dy + w(10) * dz
            if rows is None:  # VMEM-resident table (never packed)
                rows = tri_ref[pl.ds(start, tcl), :]
                t = _moller_trumbore(
                    rows, oxo, oyo, ozo, dxo, dyo, dzo, tmn_v, tmx_v,
                )
            else:
                mt = _mt_packed if packed else _moller_trumbore
                t = mt(rows, oxo, oyo, ozo, dxo, dyo, dzo, tmn_v, tmx_v)
            hit_here = jnp.min(t, axis=0) < MAX_DISTANCE
            occ[:] = jnp.where(hit_here, 1, occ[:])

        def pop_and_push(nsp, lsp):
            # two-stack leaf/node overlap: see the closest kernel
            have_node = nsp > 0
            node = jnp.where(have_node, nstack_ref[jnp.maximum(nsp - 1, 0)], 0)
            node = jnp.maximum(node, 0)
            nsp = nsp - have_node.astype(jnp.int32)
            blk = box_ref[pl.ds(pl.multiple_of(node * 8, 8), 8), :]
            # occluded lanes never extend tf past tn -> they stop voting;
            # a fully occluded tile prunes the rest of the tree
            tfar = jnp.where(occ[:] != 0, -MAX_DISTANCE, tmx_v)
            tn, tf = _slab8(blk, ox, oy, oz, ix, iy, iz, tmn_v, tfar)
            hit2 = jnp.any(tn <= tf, axis=2)  # rank-2 only (Mosaic bug)
            want = jnp.any(hit2, axis=1, keepdims=True)
            weights = 1 << jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            bits = jnp.sum(want.astype(jnp.int32) * weights)
            bits = jnp.where(have_node, bits, 0)
            nsp2, lsp2 = nsp, lsp
            for k in range(8):  # fixed order: any hit terminates
                take = (bits >> k) & 1
                cid = child_ref[node * 8 + k]
                is_leaf_c = (cid < 0).astype(jnp.int32)
                nstack_ref[nsp2] = cid
                nsp2 = nsp2 + take * (1 - is_leaf_c)
                lstack_ref[lsp2] = -cid - 1
                lsp2 = lsp2 + take * is_leaf_c
            # a fully occluded tile is done: drop both stacks
            all_occ = jnp.min(occ[:]) > 0
            nsp2 = jnp.where(all_occ, 0, nsp2)
            lsp2 = jnp.where(all_occ, 0, lsp2)
            return nsp2, lsp2

        if stream:
            # pipelined ring variant: see the closest kernel
            nbuf = stream_depth

            def start_of(v):
                if instanced:
                    return clamp_leaf(ls_ref[jnp.clip(v, 0, n_leaf_tab - 1)])
                return clamp_leaf(v)

            def cond(c):
                live = (c[0] > 0) | (c[1] > 0)
                for s in c[3:3 + nbuf]:
                    live = live | (s >= 0)
                return live

            def body(c):
                # nested drain, mirroring the closest kernel: slab8 +
                # sync once per NODE, in-flight fetches persist across
                # pops, ring drained in-loop once the node stack empties
                nsp, lsp, phase = c[0], c[1], c[2]
                sq = c[3:]

                def drain_cond(ic):
                    ring_live = ic[2] >= 0
                    for s in ic[3:]:
                        ring_live = ring_live | (s >= 0)
                    return (ic[0] > 0) | ((nsp == 0) & ring_live)

                def drain_body(ic):
                    lspd, ph = ic[0], ic[1]
                    dq = ic[2:]
                    have_next = lspd > 0
                    nstart_raw = lstack_ref[jnp.maximum(lspd - 1, 0)]
                    nstart = jnp.where(have_next, nstart_raw, -1)
                    lspd2 = lspd - have_next.astype(jnp.int32)
                    s0 = dq[0]
                    leaf_copy(start_of(s0), ph).wait()
                    if instanced:
                        occ_update_inst(s0, slot_rows(ph))
                    else:
                        occ_update(slot_rows(ph))
                    leaf_copy(start_of(nstart), ph).start()
                    ph2 = jnp.where(ph + 1 >= nbuf, 0, ph + 1)
                    return (lspd2, ph2) + dq[1:] + (nstart,)

                ic = jax.lax.while_loop(
                    drain_cond, drain_body, (lsp, phase) + sq
                )
                lsp2, phase2, sq2 = ic[0], ic[1], ic[2:]
                nsp2, lsp3 = pop_and_push(nsp, lsp2)
                return (nsp2, lsp3, phase2) + sq2

            for j in range(nbuf):
                leaf_copy(start_of(jnp.int32(0)), jnp.int32(j)).start()
            jax.lax.while_loop(
                cond, body, (1, 0, 0) + (-1,) * nbuf
            )
            for j in range(nbuf):
                leaf_copy(start_of(jnp.int32(0)), jnp.int32(j)).wait()
        else:
            # inner leaf-drain while: no pl.when, no per-leaf sync (see
            # the closest kernel); the fully-occluded early exit stays
            # at node-pop granularity (a per-leaf check would cost the
            # vector->scalar sync this structure removes)
            def drain_cond(s):
                return s > 0

            def drain_body(s):
                for j in range(DRAIN_N):
                    lstart = lstack_ref[jnp.maximum(s - 1 - j, 0)]
                    if instanced:
                        occ_update_inst(lstart)
                    else:
                        occ_update(
                            tri_ref[pl.ds(clamp_leaf(lstart), tcl), :]
                        )
                return jnp.maximum(s - DRAIN_N, 0)

            def cond(c):
                nsp, lsp = c
                return (nsp > 0) | (lsp > 0)

            def body(c):
                nsp, lsp = c
                jax.lax.while_loop(drain_cond, drain_body, lsp)
                if pop2:
                    tfar = jnp.where(occ[:] != 0, -MAX_DISTANCE, tmx_v)
                    nsp2, lsp2 = _dual_pop(
                        nstack_ref, box_ref, ax_ref, child_ref,
                        ox, oy, oz, ix, iy, iz, tmn_v, tfar, 0, 0, 0,
                        nsp, jnp.int32(0), lstack_ref, ordered=False,
                        n_pop=POP_N,
                    )
                    all_occ = jnp.min(occ[:]) > 0
                    nsp2 = jnp.where(all_occ, 0, nsp2)
                    lsp2 = jnp.where(all_occ, 0, lsp2)
                    return nsp2, lsp2
                return pop_and_push(nsp, jnp.int32(0))

            jax.lax.while_loop(cond, body, (1, 0))

    return kernel


def _ray_specs(rb: int, count: int):
    def ray_map(r, *_):
        return (r, 0)

    return [
        pl.BlockSpec((rb, LANES), ray_map, memory_space=pltpu.VMEM)
        for _ in range(count)
    ]


def _call(kernel, tri, boxes, n, rb, outs, interpret, flops, leaf_count,
          tcl=16, stream=False, stream_depth=2, instanced=False,
          packed=False):
    rows = n // LANES
    scratch = [
        pltpu.SMEM((STACK_SIZE,), jnp.int32),
        # leaf stack: drained DRAIN_N/iteration; worst-case depth is
        # unchanged (every leaf pushed before any drain = the whole
        # leaf count)
        pltpu.SMEM((max(leaf_count + 8, 64),), jnp.int32),
    ]
    if stream:
        # streaming mode (tables too big for VMEM): leaf slices are
        # DMA'd from HBM into a ring of stream_depth scratch buffers,
        # overlapped with slab tests + the MTs of older leaves.
        # Mosaic only slices HBM memrefs on (1,128) tile boundaries, so
        # density comes from _pack_stream (4 tris/row, tcl/4 rows per
        # leaf); non-packable tcl falls back to the 128-padded rows.
        slot = tcl // 4 if packed else tcl
        scratch += [
            pltpu.VMEM((stream_depth * slot, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((stream_depth,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        # child ids + axes (+ instanced leaf payload tables + w2o mats)
        num_scalar_prefetch=5 if instanced else 2,
        grid=(rows // rb,),
        in_specs=[
            pl.BlockSpec(
                boxes.shape, lambda r, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                tri.shape, lambda r, *_: (0, 0),
                memory_space=pl.ANY if stream else pltpu.VMEM,
            ),
        ]
        + _ray_specs(rb, 11),
        out_specs=tuple(
            pl.BlockSpec((rb, LANES), lambda r, *_: (r, 0), memory_space=pltpu.VMEM)
            for _ in outs
        )
        if len(outs) > 1
        else pl.BlockSpec((rb, LANES), lambda r, *_: (r, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((rows, LANES), dt) for dt in outs
    )
    if len(outs) == 1:
        out_shape = out_shape[0]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=ray_grid_params(),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n * 52 + tri.shape[0] * 48 + boxes.size * 4,
            transcendentals=0,
        ),
    )


def _call_mxu(kernel, mt, boxes, n, rb, interpret, flops, leaf_count):
    rows = n // LANES
    scratch = [
        pltpu.SMEM((STACK_SIZE,), jnp.int32),
        pltpu.SMEM((max(leaf_count + 8, 64),), jnp.int32),
        pltpu.VMEM((10, rb * LANES), jnp.float32),   # ray features F
        pltpu.VMEM((1, rb * LANES), jnp.float32),    # tbest (lane layout)
        pltpu.VMEM((1, rb * LANES), jnp.int32),      # ibest (lane layout)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # center (f32), child ids, axes
        grid=(rows // rb,),
        in_specs=[
            pl.BlockSpec(
                boxes.shape, lambda r, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                mt.shape, lambda r, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + _ray_specs(rb, 11),
        out_specs=tuple(
            pl.BlockSpec((rb, LANES), lambda r, *_: (r, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=ray_grid_params(),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n * 52 + mt.size * 4 + boxes.size * 4,
            transcendentals=0,
        ),
    )


def _planes(n, rb, rox, roy, roz, rdx, rdy, rdz, tmin, tmax):
    rows = n // LANES

    def plane(x):
        return x.reshape(rows, LANES)

    def safe_inv(d):
        mag = jnp.maximum(jnp.abs(d), 1e-12)
        return jnp.where(d < 0, -1.0, 1.0) / mag

    return (
        plane(rox), plane(roy), plane(roz),
        plane(rdx), plane(rdy), plane(rdz),
        plane(safe_inv(rdx)), plane(safe_inv(rdy)), plane(safe_inv(rdz)),
        plane(tmin), plane(tmax),
    )


# Triangle tables above this many bytes stay in HBM and stream leaf
# slices by DMA (VMEM is ~16 MB/core and the rays/boxes/outputs need
# room too).
STREAM_TRI_BYTES = 8 * 1024 * 1024


def _streaming(tri, stream):
    if stream is None:
        return tri.shape[0] * tri.shape[1] * 4 > STREAM_TRI_BYTES
    return stream


@functools.partial(
    jax.jit,
    static_argnames=(
        "rb", "tcl", "interpret", "stream", "stream_depth", "count_iters",
        "instanced", "pop2", "mxu",
    ),
)
def bvh_closest(
    rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
    tri: jnp.ndarray,        # (T, 12) packed [p0, e1, e2, pad]
    bvh_child: jnp.ndarray,  # (M*8,) i32
    bvh_axis: jnp.ndarray,   # (M,) i32
    bvh_boxes: jnp.ndarray,  # (M*8, 8) f32
    rb: int = DEFAULT_RB,
    tcl: int = 16,
    interpret: bool = False,
    stream: bool | None = None,
    stream_depth: int = DEFAULT_STREAM_DEPTH,
    count_iters: bool = False,
    instanced: bool = False,
    leaf_start: jnp.ndarray | None = None,  # (L,) i32 (instanced)
    leaf_inst: jnp.ndarray | None = None,   # (L,) i32 (instanced)
    inst_w2o: jnp.ndarray | None = None,    # (I, 12) f32 (instanced)
    pop2: bool = True,
    mxu: bool = False,
):
    """Closest-hit traversal over ray planes; returns (t, idx) — or
    (t, idx, leaf) in instanced mode, with idx = UNIQUE tri row and leaf
    the winning world-leaf table index (leaf_inst[leaf] = instance).
    ``count_iters`` (debug): idx instead carries per-tile pops*65536 +
    leaf visits (streamed mode counts drain iterations, i.e. leaf DMAs
    incl. dead-ring waits). ``mxu`` (resident, tcl=32 only): run the
    leaf MT as an MXU contraction (_make_closest_kernel_mxu)."""
    n = rox.shape[0]
    assert n % (rb * LANES) == 0, n
    stream = _streaming(tri, stream)
    if mxu and not stream and not instanced and not count_iters and tcl == 32:
        # leaf MT on the MXU (see _make_closest_kernel_mxu); the table
        # is the linear-form (10, 4T) instead of the (T, 12) rows —
        # HALF the physical VMEM (12-col rows pad their minor dim to
        # 128 lanes)
        center = jnp.mean(tri[:, 0:3], axis=0)
        mt = _mt_cols_table(tri, center)
        call = _call_mxu(
            _make_closest_kernel_mxu(tcl),
            mt, bvh_boxes, n, rb, interpret,
            flops=int(2 * 10 * 128 * n * 0.1 * (tri.shape[0] // tcl)),
            leaf_count=tri.shape[0] // tcl,
        )
        planes = _planes(n, rb, rox, roy, roz, rdx, rdy, rdz, tmin, tmax)
        cpad = jnp.concatenate([center, jnp.zeros(1, jnp.float32)])
        tbest, ibest = call(cpad, bvh_child, bvh_axis, bvh_boxes, mt, *planes)
        return tbest.reshape(n), ibest.reshape(n)
    packed = (stream and tcl % 32 == 0 and tcl & (tcl - 1) == 0
              and tri.shape[0] % tcl == 0 and not NO_PACK)
    n_tris = tri.shape[0]
    if stream:
        tri = _pack_stream(tri) if packed else jnp.pad(
            tri, ((0, 0), (0, 128 - tri.shape[1]))
        )
    outs = (
        (jnp.float32, jnp.int32, jnp.int32)
        if instanced
        else (jnp.float32, jnp.int32)
    )
    call = _call(
        _make_closest_kernel(tcl, stream, stream_depth, count_iters,
                             instanced, pop2=pop2 and not stream,
                             packed=packed),
        tri, bvh_boxes, n, rb,
        outs, interpret,
        flops=int(55 * n * max(n_tris * 0.05, tcl)),
        leaf_count=(
            leaf_start.shape[0] if instanced else n_tris // tcl
        ),
        tcl=tcl, stream=stream, stream_depth=stream_depth,
        instanced=instanced, packed=packed,
    )
    planes = _planes(n, rb, rox, roy, roz, rdx, rdy, rdz, tmin, tmax)
    if instanced:
        tbest, ibest, lbest = call(
            bvh_child, bvh_axis, leaf_start, leaf_inst,
            inst_w2o.reshape(-1), bvh_boxes, tri, *planes,
        )
        return tbest.reshape(n), ibest.reshape(n), lbest.reshape(n)
    tbest, ibest = call(bvh_child, bvh_axis, bvh_boxes, tri, *planes)
    return tbest.reshape(n), ibest.reshape(n)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rb", "tcl", "interpret", "stream", "stream_depth", "instanced",
        "pop2",
    ),
)
def bvh_anyhit(
    rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
    tri: jnp.ndarray,
    bvh_child: jnp.ndarray,
    bvh_axis: jnp.ndarray,
    bvh_boxes: jnp.ndarray,
    rb: int = DEFAULT_RB,
    tcl: int = 16,
    interpret: bool = False,
    stream: bool | None = None,
    stream_depth: int = DEFAULT_STREAM_DEPTH,
    instanced: bool = False,
    leaf_start: jnp.ndarray | None = None,
    leaf_inst: jnp.ndarray | None = None,
    inst_w2o: jnp.ndarray | None = None,
    pop2: bool = True,
):
    """Occlusion-only traversal; returns (N,) bool (True = occluded)."""
    n = rox.shape[0]
    assert n % (rb * LANES) == 0, n
    stream = _streaming(tri, stream)
    packed = (stream and tcl % 32 == 0 and tcl & (tcl - 1) == 0
              and tri.shape[0] % tcl == 0 and not NO_PACK)
    n_tris = tri.shape[0]
    if stream:
        tri = _pack_stream(tri) if packed else jnp.pad(
            tri, ((0, 0), (0, 128 - tri.shape[1]))
        )
    call = _call(
        _make_anyhit_kernel(tcl, stream, stream_depth, instanced,
                            pop2=pop2 and not stream, packed=packed),
        tri, bvh_boxes, n, rb,
        (jnp.int32,), interpret,
        flops=int(55 * n * max(n_tris * 0.025, tcl)),
        leaf_count=(
            leaf_start.shape[0] if instanced else n_tris // tcl
        ),
        tcl=tcl, stream=stream, stream_depth=stream_depth,
        instanced=instanced, packed=packed,
    )
    if instanced:
        occ = call(
            bvh_child, bvh_axis, leaf_start, leaf_inst,
            inst_w2o.reshape(-1), bvh_boxes, tri,
            *_planes(n, rb, rox, roy, roz, rdx, rdy, rdz, tmin, tmax),
        )
        return occ.reshape(n) != 0
    occ = call(
        bvh_child, bvh_axis, bvh_boxes, tri,
        *_planes(n, rb, rox, roy, roz, rdx, rdy, rdz, tmin, tmax),
    )
    return occ.reshape(n) != 0
