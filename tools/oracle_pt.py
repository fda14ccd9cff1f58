"""Independent numpy oracle renderer for end-to-end accuracy parity.

This is deliberately NOT the framework's integrator: a separate
brute-force path tracer (pure BSDF sampling, no NEE, no MIS, no shared
flatten/intersect/BSDF code) whose only commonality with the production
renderer is the XML scene loader. Both estimators converge to the same
integral, so a high-spp render from this file is an external oracle for
the production NEE+MIS estimator — the role BASELINE.md assigns to
"reference PT-with-MIS renders" (mitsuba3 is not installable in this
image; an independent in-repo implementation is the next-best oracle).

Scope: diffuse + rough-conductor (GGX-VNDF) materials, triangle and
sphere area lights — enough for the cornell box AND the veach MIS scene. Usage:

    python tools/oracle_pt.py [scene.xml] --size 64 --spp 8192 \
        --out tests/data/oracle_cornell_64.exr
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _mat_record(ins):
    """(mtype, albedo/spec rgb, alpha, eta rgb, k rgb):
    mtype 0 = diffuse, 1 = rough conductor (enough for cornell + veach)."""
    from pupiloptixlab_tpu.scene.materials import MatType

    mat = ins.material
    if mat.type in (MatType.ROUGH_CONDUCTOR, MatType.CONDUCTOR):
        alpha = float(np.asarray(mat.alpha.rgb).reshape(-1)[0]) \
            if mat.type == MatType.ROUGH_CONDUCTOR else 1e-3
        return (
            1,
            np.asarray(mat.specular_reflectance.rgb, np.float32),
            alpha,
            np.asarray(mat.eta.rgb, np.float32),
            np.asarray(mat.k.rgb, np.float32),
        )
    albedo = np.zeros(3, np.float32)
    if getattr(mat, "reflectance", None) is not None:
        albedo = np.asarray(mat.reflectance.rgb, np.float32)
    return (0, albedo, 0.0, np.zeros(3, np.float32), np.zeros(3, np.float32))


def flatten_numpy(scene):
    """Independent world-space flatten (no framework code). Returns
    triangle arrays + material records; spheres via flatten_spheres."""
    tris = []  # (p0, e1, e2, n, albedo, emission)
    mats = []  # parallel material records
    for ins in scene.shape_instances:
        from pupiloptixlab_tpu.scene.shapes import ShapeType

        if ins.shape.type == ShapeType.SPHERE:
            continue
        mesh = ins.shape.mesh
        m = ins.transform.matrix
        p = mesh.positions @ m[:3, :3].T + m[:3, 3]
        mat = ins.material
        rec = _mat_record(ins)
        albedo = rec[1]
        emission = np.zeros(3, np.float32)
        if ins.is_emitter:
            emission = np.asarray(ins.emitter.radiance.rgb, np.float32)
        sign = -1.0 if getattr(ins, "flip_normals", False) else 1.0
        # shading/emission orientation follows the VERTEX normals when the
        # mesh has them (builtin rect/cube windings oppose their stored
        # normals), falling back to the winding normal
        vn = None
        if mesh.normals is not None and len(mesh.normals):
            inv_t = np.linalg.inv(m[:3, :3]).T
            vn = mesh.normals @ inv_t.T
            vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-20)
        for f in mesh.indices:
            p0, p1, p2 = p[f[0]], p[f[1]], p[f[2]]
            n = np.cross(p1 - p0, p2 - p0)
            ln = np.linalg.norm(n)
            if ln < 1e-12:
                continue
            n = n / ln
            if vn is not None:
                n = vn[f[0]] + vn[f[1]] + vn[f[2]]
                n = n / max(np.linalg.norm(n), 1e-20)
            tris.append((p0, p1 - p0, p2 - p0, sign * n, albedo, emission))
            mats.append(rec)
    p0 = np.stack([t[0] for t in tris]).astype(np.float32)
    e1 = np.stack([t[1] for t in tris]).astype(np.float32)
    e2 = np.stack([t[2] for t in tris]).astype(np.float32)
    nrm = np.stack([t[3] for t in tris]).astype(np.float32)
    alb = np.stack([t[4] for t in tris]).astype(np.float32)
    emi = np.stack([t[5] for t in tris]).astype(np.float32)
    # parallel material arrays (type, alpha, eta, k)
    global _TRI_MATS
    _TRI_MATS = (
        np.asarray([m[0] for m in mats], np.int32),
        np.asarray([m[2] for m in mats], np.float32),
        np.stack([m[3] for m in mats]).astype(np.float32),
        np.stack([m[4] for m in mats]).astype(np.float32),
    )
    return p0, e1, e2, nrm, alb, emi


_TRI_MATS = None


def flatten_spheres(scene):
    """(center (S,3), radius (S,), albedo, emission, mat records)."""
    from pupiloptixlab_tpu.scene.shapes import ShapeType

    cs, rs, albs, emis, mats = [], [], [], [], []
    for ins in scene.shape_instances:
        if ins.shape.type != ShapeType.SPHERE:
            continue
        m = ins.transform.matrix
        c = m[:3, 3]
        p = (m @ np.array([1.0, 0, 0, 1.0], np.float32))[:3]
        rec = _mat_record(ins)
        cs.append(c)
        rs.append(float(np.linalg.norm(p - c)))
        albs.append(rec[1])
        emis.append(
            np.asarray(ins.emitter.radiance.rgb, np.float32)
            if ins.is_emitter
            else np.zeros(3, np.float32)
        )
        mats.append(rec)
    if not cs:
        return (np.zeros((0, 3), np.float32), np.zeros(0, np.float32),
                np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32), [])
    return (np.stack(cs).astype(np.float32), np.asarray(rs, np.float32),
            np.stack(albs).astype(np.float32), np.stack(emis).astype(np.float32),
            mats)


def intersect_spheres(ro, rd, centers, radii):
    """Closest sphere hit: returns (t, idx) with idx -1 on miss."""
    n = ro.shape[0]
    if len(radii) == 0:
        return np.full(n, 1e16, np.float32), np.full(n, -1, np.int32)
    oc = ro[:, None, :] - centers[None, :, :]
    b = np.einsum("nsj,nj->ns", oc, rd)
    c = np.einsum("nsj,nsj->ns", oc, oc) - radii[None, :] ** 2
    disc = b * b - c
    ok = disc >= 0
    sq = np.sqrt(np.maximum(disc, 0))
    t0 = -b - sq
    t1 = -b + sq
    t = np.where(t0 > 1e-3, t0, t1)
    t = np.where(ok & (t > 1e-3), t, 1e16)
    idx = t.argmin(axis=1).astype(np.int32)
    tb = t[np.arange(n), idx]
    return tb, np.where(tb < 1e16, idx, -1)


def ggx_sample_vndf_u(wo, alpha, u1, u2):
    """Heitz 2018 VNDF sampling of the half vector in the local frame.
    wo: (N,3) with z up; alpha (N,). Returns m (N,3)."""
    al = np.stack([alpha, alpha, np.ones_like(alpha)], 1)
    v = wo * al
    v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    lensq = v[:, 0] ** 2 + v[:, 1] ** 2
    inv = 1.0 / np.sqrt(np.maximum(lensq, 1e-20))
    t1 = np.where(
        (lensq > 1e-12)[:, None],
        np.stack([-v[:, 1] * inv, v[:, 0] * inv, np.zeros_like(inv)], 1),
        np.array([1.0, 0, 0]),
    )
    t2 = np.cross(v, t1)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    p1 = r * np.cos(phi)
    p2 = r * np.sin(phi)
    ss = 0.5 * (1 + v[:, 2])
    p2 = (1 - ss) * np.sqrt(np.maximum(1 - p1 * p1, 0)) + ss * p2
    p3 = np.sqrt(np.maximum(1 - p1 * p1 - p2 * p2, 0))
    nh = p1[:, None] * t1 + p2[:, None] * t2 + p3[:, None] * v
    m = nh * al
    m[:, 2] = np.maximum(m[:, 2], 1e-6)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return m


def ggx_g1(w, alpha):
    """Smith G1 for isotropic GGX, local frame (alpha per lane)."""
    cos2 = np.clip(w[:, 2] ** 2, 1e-12, 1.0)
    tan2 = (1.0 - cos2) / cos2
    return 2.0 / (1.0 + np.sqrt(1.0 + alpha * alpha * tan2))


def fresnel_conductor_rgb(cos_i, eta, k):
    """RGB conductor Fresnel (cos_i (N,), eta/k (N,3))."""
    c2 = (cos_i ** 2)[:, None]
    s2 = 1.0 - c2
    e2 = eta ** 2
    k2 = k ** 2
    t0 = e2 - k2 - s2
    a2b2 = np.sqrt(np.maximum(t0 ** 2 + 4 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = np.sqrt(np.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2 * a * np.sqrt(c2)
    rs = (t1 - t2) / np.maximum(t1 + t2, 1e-12)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / np.maximum(t3 + t4, 1e-12)
    return 0.5 * (np.clip(rs, 0.0, 1.0) + np.clip(rp, 0.0, 1.0))


def _onb(n):
    s = np.where(n[:, 2] >= 0, 1.0, -1.0)
    a = -1.0 / (s + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t0 = np.stack([1 + s * n[:, 0] ** 2 * a, s * b, -s * n[:, 0]], 1)
    t1 = np.stack([b, s + n[:, 1] ** 2 * a, -n[:, 1]], 1)
    return t0, t1


def intersect(ro, rd, p0, e1, e2):
    """Brute-force Moller-Trumbore; returns (t, tri_index)."""
    pv = np.cross(rd[:, None, :], e2[None, :, :])
    det = np.einsum("tj,ntj->nt", e1, pv)
    inv = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
    tv = ro[:, None, :] - p0[None, :, :]
    u = np.einsum("ntj,ntj->nt", tv, pv) * inv
    qv = np.cross(tv, e1[None, :, :])
    v = np.einsum("nj,ntj->nt", rd, qv) * inv
    t = np.einsum("tj,ntj->nt", e2, qv) * inv
    ok = (
        (np.abs(det) >= 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > 1e-3) & (t < 1e16)
    )
    t = np.where(ok, t, 1e16)
    idx = t.argmin(axis=1)
    tb = t[np.arange(t.shape[0]), idx]
    return tb, np.where(tb < 1e16, idx, -1)


def cosine_sample(n, rng):
    """Cosine-weighted hemisphere around each normal (N,3)."""
    u1 = rng.random(n.shape[0], dtype=np.float64)
    u2 = rng.random(n.shape[0], dtype=np.float64)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    z = np.sqrt(np.maximum(1 - u1, 0.0))
    # build an orthonormal basis per normal (Pixar ONB)
    s = np.where(n[:, 2] >= 0, 1.0, -1.0)
    a = -1.0 / (s + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t0 = np.stack([1 + s * n[:, 0] ** 2 * a, s * b, -s * n[:, 0]], 1)
    t1 = np.stack([b, s + n[:, 1] ** 2 * a, -n[:, 1]], 1)
    return (
        x[:, None] * t0 + y[:, None] * t1 + z[:, None] * n
    ).astype(np.float32)


def render_oracle(scene, size, spp, max_depth, seed=0, batch=16):
    p0, e1, e2, nrm, alb, emi = flatten_numpy(scene)
    mtype, malpha, meta, mk = _TRI_MATS
    s_c, s_r, s_alb, s_emi, s_mats = flatten_spheres(scene)
    if len(s_mats):
        s_type = np.asarray([m[0] for m in s_mats], np.int32)
        s_alpha = np.asarray([m[2] for m in s_mats], np.float32)
        s_eta = np.stack([m[3] for m in s_mats]).astype(np.float32)
        s_k = np.stack([m[4] for m in s_mats]).astype(np.float32)
    else:
        s_type = np.zeros(0, np.int32)
        s_alpha = np.zeros(0, np.float32)
        s_eta = s_k = np.zeros((0, 3), np.float32)
    w = h = size
    cam_to_world = scene.sensor.transform.matrix.astype(np.float64)

    # camera rays exactly like util/camera.cpp: sample->camera->world
    from pupiloptixlab_tpu.utils.camera import Camera, CameraDesc
    from pupiloptixlab_tpu.utils.math import Transform

    cam = Camera(
        CameraDesc(
            fov_y=scene.sensor.fov,
            aspect_ratio=1.0,
            near_clip=scene.sensor.near_clip,
            far_clip=scene.sensor.far_clip,
            to_world=Transform(cam_to_world.astype(np.float32)),
        )
    )
    s2c = cam.sample_to_camera.astype(np.float64)
    c2w = cam.to_world.astype(np.float64)

    rng = np.random.default_rng(seed)
    accum = np.zeros((h * w, 3), np.float64)
    done = 0
    while done < spp:
        cur = min(batch, spp - done)
        for _ in range(cur):
            px = np.arange(w * h) % w
            py = np.arange(w * h) // w
            jx = rng.random(w * h)
            jy = rng.random(w * h)
            sx = (px + jx) / w
            sy = (py + jy) / h
            ndc = np.stack([sx, sy, np.zeros_like(sx), np.ones_like(sx)], 1)
            pc = ndc @ s2c.T
            pc = pc[:, :3] / pc[:, 3:4]
            d = pc / np.linalg.norm(pc, axis=1, keepdims=True)
            rd = (np.concatenate([d, np.zeros((len(d), 1))], 1) @ c2w.T)[:, :3]
            rd = (rd / np.linalg.norm(rd, axis=1, keepdims=True)).astype(np.float32)
            ro = np.broadcast_to(
                c2w[:3, 3].astype(np.float32), rd.shape
            ).copy()

            radiance = np.zeros((h * w, 3), np.float64)
            throughput = np.ones((h * w, 3), np.float64)
            alive = np.ones(h * w, bool)
            for depth in range(max_depth):
                t, idx = intersect(ro, rd, p0, e1, e2)
                ts, isx = intersect_spheres(ro, rd, s_c, s_r)
                use_s = (isx >= 0) & (ts < t)
                hit = (idx >= 0) | use_s
                alive = alive & hit
                if not alive.any():
                    break
                i = np.maximum(idx, 0)
                si = np.maximum(isx, 0)
                t = np.where(use_s, ts, t)
                pos = ro + t[:, None] * rd
                if len(s_r):
                    n_s = (pos - s_c[si]) / np.maximum(s_r[si][:, None], 1e-12)
                    n = np.where(use_s[:, None], n_s, nrm[i])
                    cur_emi = np.where(use_s[:, None], s_emi[si], emi[i])
                    cur_alb = np.where(use_s[:, None], s_alb[si], alb[i])
                    cur_type = np.where(use_s, s_type[si], mtype[i])
                    cur_alpha = np.where(use_s, s_alpha[si], malpha[i])
                    cur_eta = np.where(use_s[:, None], s_eta[si], meta[i])
                    cur_k = np.where(use_s[:, None], s_k[si], mk[i])
                else:
                    n = nrm[i]
                    cur_emi, cur_alb = emi[i], alb[i]
                    cur_type, cur_alpha = mtype[i], malpha[i]
                    cur_eta, cur_k = meta[i], mk[i]
                # twosided: flip toward the incoming ray
                flip = np.einsum("nj,nj->n", n, rd) > 0
                n = np.where(flip[:, None], -n, n)
                # one-sided emission (render/emitter.h Eval: lnol > 0),
                # i.e. only when the geometric normal faces the ray
                front = ~flip
                radiance += np.where(
                    (alive & front)[:, None], throughput * cur_emi, 0.0
                )

                # pure BSDF sampling per material (2 shared uniforms/bounce
                # keeps the RNG stream identical to the diffuse-only oracle)
                u1 = rng.random(h * w, dtype=np.float64)
                u2 = rng.random(h * w, dtype=np.float64)
                t0, t1 = _onb(n)
                wo_world = -rd
                wo = np.stack([
                    np.einsum("nj,nj->n", wo_world, t0),
                    np.einsum("nj,nj->n", wo_world, t1),
                    np.einsum("nj,nj->n", wo_world, n),
                ], 1)
                # diffuse: cosine hemisphere; f*cos/pdf = albedo
                r_ = np.sqrt(u1)
                phi = 2 * np.pi * u2
                wi_d = np.stack([
                    r_ * np.cos(phi), r_ * np.sin(phi),
                    np.sqrt(np.maximum(1 - u1, 0.0)),
                ], 1)
                weight_d = cur_alb
                # rough conductor: VNDF half vector; weight = spec*F*G1(wi)
                m = ggx_sample_vndf_u(wo, cur_alpha, u1, u2)
                wom = np.einsum("nj,nj->n", wo, m)
                wi_c = 2.0 * wom[:, None] * m - wo
                f = fresnel_conductor_rgb(np.maximum(wom, 0.0), cur_eta, cur_k)
                g1w = ggx_g1(wi_c, cur_alpha)
                ok_c = (wi_c[:, 2] > 1e-6) & (wo[:, 2] > 1e-6) & (wom > 0)
                weight_c = np.where(
                    ok_c[:, None], cur_alb * f * g1w[:, None], 0.0
                )
                is_cond = cur_type == 1
                wi = np.where(is_cond[:, None], wi_c, wi_d)
                weight = np.where(is_cond[:, None], weight_c, weight_d)
                throughput = throughput * np.where(alive[:, None], weight, 1.0)
                rd = (
                    wi[:, 0:1] * t0 + wi[:, 1:2] * t1 + wi[:, 2:3] * n
                ).astype(np.float32)
                rd /= np.maximum(np.linalg.norm(rd, axis=1, keepdims=True), 1e-12)
                ro = pos + n * 1e-3
                # kill paths with zero throughput
                alive = alive & (throughput.max(axis=1) > 1e-6)
            accum += radiance
        done += cur
        print(f"  {done}/{spp} spp", flush=True)
    img = (accum / spp).reshape(h, w, 3).astype(np.float32)
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "scene", nargs="?",
        default="/root/reference/data/static/cornellbox.xml",
    )
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--spp", type=int, default=8192)
    ap.add_argument("--max-depth", type=int, default=4)
    ap.add_argument("--out", default="tests/data/oracle_cornell_64.exr")
    args = ap.parse_args()

    from pupiloptixlab_tpu.scene import load_scene
    from pupiloptixlab_tpu.utils.image import save_image

    scene = load_scene(args.scene)
    img = render_oracle(scene, args.size, args.spp, args.max_depth)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    save_image(args.out, img[::-1])
    print(f"saved {args.out} mean={img.mean():.5f}")


if __name__ == "__main__":
    main()
