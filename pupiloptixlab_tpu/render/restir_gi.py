"""ReSTIR GI: reservoir resampling of one-bounce indirect path samples.

Beyond the reference (which ships only ``restir_test.xml``): extends the
round-2 ReSTIR-DI estimator (render/restir.py) to INDIRECT light
following Ouyang et al. 2021, "ReSTIR GI: Path resampling for real-time
path tracing". Per pixel and frame:

1. one BSDF-sampled continuation from the primary hit x finds a sample
   point y; its outgoing radiance L(y->x) is estimated with emission +
   one NEE sample at y (exactly the PT bounce's direct term);
2. (y, n_y, L) streams into a reservoir with target p_hat =
   lum(f_x * L * cos_x) and source pdf converted to the AREA measure
   (pdf_bsdf * |cos_y| / d^2), so temporal/spatial merges follow the
   DI machinery — with the GI-specific solid-angle JACOBIAN
   |cos_y'| d^2 / (|cos_y| d'^2) applied when a neighbor's path sample
   is reused from a different receiver position (eq. 11);
3. the winner is shaded with ONE visibility ray x->y.

Temporal reuse is MOTION-WARPED: the previous frame's reservoir is
fetched at the camera-reprojected pixel (utils from denoise/atrous.py),
so history survives camera motion instead of resetting.

All state is (N,) planes; reservoirs pack into the same (N, 19) row
table as DI so every reuse tap is one gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pupiloptixlab_tpu.flatten.types import RenderConfig, SceneData
from pupiloptixlab_tpu.render import bsdf as bsdf_mod
from pupiloptixlab_tpu.render import emitter as emitter_mod
from pupiloptixlab_tpu.render.restir import (
    N_PACK,
    Reservoir,
    _GBuf,
    _eval_target,
    _pack,
    _unpack,
    merge,
    shade,
    similarity,
)
from pupiloptixlab_tpu.render.sampling import (
    MAX_DISTANCE,
    RAY_OFFSET,
    luminance,
    mis_weight,
    to_local,
    to_world,
)
from pupiloptixlab_tpu.render.vec import Vec3, where

_TINY = 1e-12


# In the AREA measure the GI estimator is formally IDENTICAL to DI:
# a path sample point y with outgoing radiance L(y->x) is just a "light
# sample" at y, the target p_hat = lum(f * L * cos_x * cos_y / d^2) and
# the true integrand both live in dA(y) — which is frame-independent,
# so temporal/spatial reuse needs NO reconnection Jacobian (the
# solid-angle parameterization of Ouyang eq. 11 does; the area
# parameterization is how render/restir.py already merges DI light
# samples). The DI machinery (_eval_target / merge / shade) is reused
# verbatim.


def gi_initial_sample(scene: SceneData, config: RenderConfig, gb, local,
                      state, hit, oprim):
    """One BSDF continuation + direct light at the secondary vertex.
    Returns (state', y_pos, y_nrm, y_rad (radiance toward x), pdf_area,
    valid, extra_rad) where extra_rad is the per-frame (un-resampled)
    radiance of continuations that can't ride a reservoir: env escapes
    (direction-parameterized) and delta-lobe bounces (see below)."""
    from pupiloptixlab_tpu.accel.intersect import (
        intersect_any, intersect_closest, origin_sort_prim,
    )
    from pupiloptixlab_tpu.render import rng
    from pupiloptixlab_tpu.render.geometry import get_local_geometry

    em, tex = scene.emitters, scene.textures
    n = gb.position.x.shape[0]
    tmin = jnp.full(n, RAY_OFFSET, jnp.float32)
    tmax = jnp.full(n, MAX_DISTANCE, jnp.float32)

    state, us = rng.next_floats(state, 3)
    wo_local = to_local(gb.wo_world, gb.normal)
    wi_s, f_s, pdf_s, lobe = bsdf_mod.sample(
        local, wo_local, *us, config.mat_types
    )
    rd = to_world(wi_s, gb.normal)
    live = hit.hit_mask & (pdf_s > _TINY)
    hit2 = intersect_closest(
        gb.position, rd, tmin, tmax, scene, config, coherent=False,
        origin_prim=oprim, mask=live,
    )
    geo2 = get_local_geometry(
        scene, hit2, gb.position, rd, config.sphere_count, config.instanced, config.curve_count
    )
    local2 = bsdf_mod.get_local_bsdf(
        scene.materials, tex, geo2.mat_id, geo2.uv, config.mat_types,
        config.mat_tex_kinds, config.mat_tex_filters,
    )
    valid = live & hit2.hit_mask

    # Escaped continuations carry indirect ENV light — direction-
    # parameterized, so it can't ride a position reservoir; returned as
    # a plain per-frame contribution instead.
    esc_rad = Vec3.zeros(n)
    if config.has_env:
        escaped = live & ~hit2.hit_mask
        env_rad, _ = emitter_mod.eval_env(em, tex, config, rd)
        wgt = f_s * (jnp.abs(wi_s.z) / jnp.maximum(pdf_s, _TINY))
        esc_rad = where(escaped, env_rad * wgt, esc_rad)

    # Outgoing radiance at y toward x: ONE NEE sample at y (the direct
    # term of a PT bounce). Emission AT y is deliberately excluded —
    # the frame's own direct estimator (NEE at x, weight 1) already
    # covers x -> emitter paths completely, and adding it here would
    # double count them.
    y_rad = Vec3.zeros(n)

    if config.emitter_count > 0 or config.has_env:
        state, (u_sel, u1, u2) = rng.next_floats(state, 3)
        idx, use_env = emitter_mod.select_emitter(em, config, u_sel)
        es = emitter_mod.sample_direct(
            em, tex, config, idx, use_env, geo2.position, geo2.normal,
            u1, u2,
        )
        wo2 = to_local(rd * -1.0, geo2.normal)
        wl2 = to_local(es.wi, geo2.normal)
        f2, pdf_b2 = bsdf_mod.evaluate(local2, wo2, wl2, config.mat_types)
        nol2 = geo2.normal.dot(es.wi)
        smask = valid & (nol2 > 0.0) & (es.pdf > 0.0)
        oprim2 = origin_sort_prim(hit2, scene, config)
        occ = intersect_any(
            geo2.position, es.wi, tmin, es.distance - RAY_OFFSET, scene,
            config, coherent=False, origin_prim=oprim2, mask=smask,
            const_tmin=RAY_OFFSET,
        )
        pdf_l = es.pdf * es.select_prob
        mis = jnp.where(es.is_delta, 1.0, mis_weight(pdf_l, pdf_b2))
        nee = es.radiance * f2 * (
            nol2 * mis / jnp.maximum(pdf_l, _TINY)
        )
        y_rad = y_rad + where(smask & ~occ, nee, Vec3.zeros(n))

    # source pdf in the AREA measure at y
    d = geo2.position - gb.position
    d2 = jnp.maximum(d.dot(d), _TINY)
    cos_y = jnp.abs(geo2.normal.dot(d.normalized()))
    pdf_area = pdf_s * cos_y / d2
    # Delta SECONDARY vertices: when the continuation LANDS on a mirror
    # or glass surface, its outgoing radiance can't be NEE-estimated
    # (f(delta) = 0), so the reservoir sample would be black and the
    # wall-seen-via-mirror light vanished. Continue ONE segment through
    # y's delta lobe and take the emission at z — exactly the transport
    # a depth-3 PT covers for such paths (its emitter-hit term with the
    # nee_blind weight-1 rule); deeper specular chains stay the PT
    # pass's job. Statically compiled out of delta-free scenes.
    y_blocked = jnp.zeros(n, bool)
    if any(t in config.mat_types
           for t in (bsdf_mod.DIELECTRIC, bsdf_mod.CONDUCTOR)):
        y_delta_rad = Vec3.zeros(n)
        y_is_delta = valid & (
            (geo2.mat_id >= 0)
            & ((local2.mtype == bsdf_mod.DIELECTRIC)
               | (local2.mtype == bsdf_mod.CONDUCTOR))
        )
        state, us2 = rng.next_floats(state, 3)
        wo2l = to_local(rd * -1.0, geo2.normal)
        wi2, f2s, pdf2s, _ = bsdf_mod.sample(
            local2, wo2l, *us2, config.mat_types
        )
        rd2 = to_world(wi2, geo2.normal)
        w2 = f2s * (jnp.abs(wi2.z) / jnp.maximum(pdf2s, _TINY))
        oprim2b = origin_sort_prim(hit2, scene, config)
        hit3 = intersect_closest(
            geo2.position, rd2, tmin, tmax, scene, config,
            coherent=False, origin_prim=oprim2b, mask=y_is_delta,
        )
        geo3 = get_local_geometry(
            scene, hit3, geo2.position, rd2, config.sphere_count,
            config.instanced, config.curve_count,
        )
        if config.emitter_count > 0:
            from pupiloptixlab_tpu.render.integrator import (
                _first_hit_emission,
            )

            is_em_z = (
                y_is_delta & hit3.hit_mask & (geo3.emitter_id >= 0)
                & geo3.front
            )
            y_delta_rad = y_delta_rad + where(
                is_em_z,
                w2 * _first_hit_emission(scene, config, geo3),
                Vec3.zeros(n),
            )
        if config.has_env:
            env2, _ = emitter_mod.eval_env(em, tex, config, rd2)
            y_delta_rad = y_delta_rad + where(
                y_is_delta & ~hit3.hit_mask, w2 * env2, Vec3.zeros(n)
            )
        y_rad = y_rad + y_delta_rad
        # reconnection through y's delta lobe is x-specific: the sample
        # must not be spatially/temporally reused (routed per-frame
        # below instead)
        y_blocked = y_is_delta

    # Delta lobes AT X can't ride reservoirs either (a reconnection
    # through a delta lobe evaluates to f = 0, and their pdf is a
    # discrete probability, not an area density). Instead of DROPPING
    # them (which lost all specular transport in this pass: the direct
    # NEE at x is also 0 for delta receivers, so mirrors showed neither
    # reflected emitters nor reflected indirect), their one-bounce
    # contribution is returned as a plain per-frame term: BSDF weight x
    # (emission AT y + the NEE estimate at y). Emission at y is NOT
    # double counted for these lanes — x's own direct estimator has
    # f(delta) = 0.
    is_delta = (lobe & bsdf_mod.LOBE_DELTA) != 0
    w_bsdf = f_s * (jnp.abs(wi_s.z) / jnp.maximum(pdf_s, _TINY))
    emis_y = Vec3.zeros(n)
    if config.emitter_count > 0:
        from pupiloptixlab_tpu.render.integrator import _first_hit_emission

        is_em_y = valid & (geo2.emitter_id >= 0) & geo2.front
        emis_y = where(
            is_em_y, _first_hit_emission(scene, config, geo2), emis_y
        )
    delta_rad = where(
        valid & is_delta, w_bsdf * (y_rad + emis_y), Vec3.zeros(n)
    )
    # diffuse x whose continuation landed on a delta y: the sample can't
    # be reused (its radiance rides a delta reconnection), so its
    # contribution flows per-frame like the delta-x term
    routed = where(
        valid & ~is_delta & y_blocked, w_bsdf * y_rad, Vec3.zeros(n)
    )
    valid = valid & ~is_delta & ~y_blocked & (pdf_area > _TINY)
    return (state, geo2.position, geo2.normal, y_rad, pdf_area, valid,
            esc_rad + delta_rad + routed)


def reproject_pixels(motion, width, height):
    """Nearest-pixel reprojection indices from (h, w, 2) motion vectors
    (dx, dy to the PREVIOUS frame's pixel); returns ((N,) index, valid).
    """
    import jax

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    sx = xs + motion[..., 0]
    sy = ys + motion[..., 1]
    valid = (sx >= 0) & (sx <= width - 1) & (sy >= 0) & (sy <= height - 1)
    xi = jnp.clip(jnp.round(sx), 0, width - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(sy), 0, height - 1).astype(jnp.int32)
    return (yi * width + xi).reshape(-1), valid.reshape(-1)


@partial(
    jax.jit,
    static_argnames=("config", "spatial_taps", "spatial_radius", "m_cap"),
    donate_argnames=("prev_packed", "accum"),
)
def restir_gi_frame(
    scene: SceneData,
    camera,
    seed: jnp.ndarray,
    prev_packed: jnp.ndarray,   # (N, 19) last frame's GI reservoirs
    accum: jnp.ndarray,
    sample_cnt: jnp.ndarray,
    config: RenderConfig,
    spatial_taps: int = 2,
    spatial_radius: int = 16,
    m_cap: float = 20.0,
    prev_camera=None,
):
    """One ReSTIR-GI frame: emission + direct (NEE, 1 sample) + GI
    reservoir indirect. ``prev_camera`` (optional): warp temporal reuse
    by camera motion (static scene) instead of identity reuse.

    Returns (accum', packed', frame_rgb)."""
    from pupiloptixlab_tpu.accel.intersect import (
        intersect_any, intersect_closest, origin_sort_prim,
    )
    from pupiloptixlab_tpu.render import rng
    from pupiloptixlab_tpu.render.camera import generate_rays
    from pupiloptixlab_tpu.render.geometry import get_local_geometry
    from pupiloptixlab_tpu.render.integrator import _first_hit_emission

    em, tex = scene.emitters, scene.textures
    w, h = config.width, config.height
    n = w * h
    state = rng.tea_init(jnp.arange(n, dtype=jnp.uint32), seed)
    state, (jx, jy) = rng.next_floats(state, 2)
    ro, rd = generate_rays(camera, w, h, jx, jy)
    tmin = jnp.full(n, RAY_OFFSET, jnp.float32)
    tmax = jnp.full(n, MAX_DISTANCE, jnp.float32)
    hit = intersect_closest(ro, rd, tmin, tmax, scene, config,
                            coherent=False)
    geo = get_local_geometry(scene, hit, ro, rd, config.sphere_count,
                             config.instanced, config.curve_count)
    local = bsdf_mod.get_local_bsdf(
        scene.materials, tex, geo.mat_id, geo.uv, config.mat_types,
        config.mat_tex_kinds, config.mat_tex_filters,
    )
    active = hit.hit_mask
    oprim = origin_sort_prim(hit, scene, config)
    gb = _GBuf(position=geo.position, normal=geo.normal, wo_world=-rd)
    radiance = Vec3.zeros(n)

    # emission + env on primary
    if config.has_env:
        env_rad0, _ = emitter_mod.eval_env(em, tex, config, rd)
        radiance = radiance + where(~active, env_rad0, Vec3.zeros(n))
    is_em = active & (geo.emitter_id >= 0) & geo.front
    radiance = radiance + where(
        is_em, _first_hit_emission(scene, config, geo), Vec3.zeros(n)
    )

    # direct light: one plain NEE sample (DI reservoirs are the separate
    # restir pass; this keeps the GI estimator self-contained)
    if config.emitter_count > 0 or config.has_env:
        state, (u_sel, u1, u2) = rng.next_floats(state, 3)
        idx, use_env = emitter_mod.select_emitter(em, config, u_sel)
        es = emitter_mod.sample_direct(
            em, tex, config, idx, use_env, geo.position, geo.normal, u1, u2
        )
        wo_l = to_local(-rd, geo.normal)
        wi_l = to_local(es.wi, geo.normal)
        f_d, _ = bsdf_mod.evaluate(local, wo_l, wi_l, config.mat_types)
        nol = geo.normal.dot(es.wi)
        smask = active & (nol > 0.0) & (es.pdf > 0.0)
        occ = intersect_any(
            geo.position, es.wi, tmin, es.distance - RAY_OFFSET, scene,
            config, coherent=False, origin_prim=oprim, mask=smask,
            const_tmin=RAY_OFFSET,
        )
        pdf_l = es.pdf * es.select_prob
        direct = es.radiance * f_d * (nol / jnp.maximum(pdf_l, _TINY))
        radiance = radiance + where(smask & ~occ, direct, Vec3.zeros(n))

    # --- GI reservoir -----------------------------------------------------
    state, y_pos, y_nrm, y_rad, pdf_area, valid, esc_rad = gi_initial_sample(
        scene, config, gb, local, state, hit, oprim
    )
    radiance = radiance + esc_rad
    r = Reservoir.zeros(n)
    phat0, _, _, _ = _eval_target(gb, local, config.mat_types, y_pos,
                                  y_nrm, y_rad)
    state, (u0,) = rng.next_floats(state, 1)
    w0 = jnp.where(valid, phat0 / jnp.maximum(pdf_area, _TINY), 0.0)
    r = r.update(u0, y_pos, y_nrm, y_rad, pdf_area, w0, phat0,
                 valid.astype(jnp.float32))

    # temporal merge (motion-warped when prev_camera given)
    state, (u_t,) = rng.next_floats(state, 1)
    if prev_camera is not None:
        from pupiloptixlab_tpu.denoise.atrous import camera_motion_vectors

        wp = geo.position.to_array().reshape(h, w, 3)
        motion = camera_motion_vectors(
            wp, hit.hit_mask.reshape(h, w), prev_camera, w, h
        )
        src_idx, in_frame = reproject_pixels(motion, w, h)
        rows_prev = prev_packed[src_idx]
    else:
        in_frame = jnp.ones(n, bool)
        rows_prev = prev_packed
    r_prev, p_pos, p_nrm = _unpack(rows_prev)
    ok_t = (similarity(gb, p_pos, p_nrm) & active & (r_prev.m > 0.0)
            & in_frame)
    r = merge(r, r_prev, gb, local, config.mat_types, u_t, ok_t, m_cap)

    # spatial merges with reconnection Jacobian. The tap radius shrinks
    # with receiver GLOSSINESS: a low-alpha receiver's target function
    # p_hat = lum(f_x L cos) is a narrow lobe around its own sample, so
    # far-neighbor reservoirs almost always resample to ~0 weight
    # (wasted taps) or import bias through the similarity gate. Diffuse
    # receivers keep the full radius.
    packed0 = _pack(r, gb)
    rough = (
        (local.mtype == bsdf_mod.ROUGH_DIELECTRIC)
        | (local.mtype == bsdf_mod.ROUGH_CONDUCTOR)
        | (local.mtype == bsdf_mod.ROUGH_PLASTIC)
    )
    radius = spatial_radius * jnp.where(
        rough, jnp.clip(local.alpha / 0.3, 0.1, 1.0), 1.0
    )
    px = jnp.arange(n, dtype=jnp.int32) % w
    py = jnp.arange(n, dtype=jnp.int32) // w
    for _ in range(spatial_taps):
        state, (u1s, u2s, u3s) = rng.next_floats(state, 3)
        dx = jnp.floor((u1s * 2.0 - 1.0) * radius).astype(jnp.int32)
        dy = jnp.floor((u2s * 2.0 - 1.0) * radius).astype(jnp.int32)
        nx = jnp.clip(px + dx, 0, w - 1)
        ny = jnp.clip(py + dy, 0, h - 1)
        rows = packed0[ny * w + nx]
        r_n, n_pos, n_nrm = _unpack(rows)
        ok_s = similarity(gb, n_pos, n_nrm) & active & (r_n.m > 0.0)
        r = merge(r, r_n, gb, local, config.mat_types, u3s, ok_s, m_cap)

    radiance = radiance + shade(scene, config, r, gb, local, active, oprim)
    out_packed = _pack(r, gb)

    rad = radiance.to_array()
    if config.accumulate:
        t = 1.0 / (sample_cnt.astype(jnp.float32) + 1.0)
        blended = accum + (rad - accum) * t
        new_accum = jnp.where(sample_cnt > 0, blended, rad)
    else:
        new_accum = rad
    return new_accum, out_packed, rad
