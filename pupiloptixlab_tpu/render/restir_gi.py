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
    valid)."""
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
    # delta lobes resample poorly (their pdf is a discrete prob);
    # exclude them — the PT pass handles specular transport
    is_delta = (lobe & bsdf_mod.LOBE_DELTA) != 0
    valid = valid & ~is_delta & (pdf_area > _TINY)
    return (state, geo2.position, geo2.normal, y_rad, pdf_area, valid,
            esc_rad)


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

    # spatial merges with reconnection Jacobian
    packed0 = _pack(r, gb)
    px = jnp.arange(n, dtype=jnp.int32) % w
    py = jnp.arange(n, dtype=jnp.int32) // w
    for _ in range(spatial_taps):
        state, (u1s, u2s, u3s) = rng.next_floats(state, 3)
        dx = jnp.floor((u1s * 2.0 - 1.0) * spatial_radius).astype(jnp.int32)
        dy = jnp.floor((u2s * 2.0 - 1.0) * spatial_radius).astype(jnp.int32)
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
