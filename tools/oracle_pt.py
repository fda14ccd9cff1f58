"""Independent numpy oracle renderer for end-to-end accuracy parity.

This is deliberately NOT the framework's integrator: a separate
brute-force path tracer (pure BSDF sampling, no NEE, no MIS, no shared
flatten/intersect/BSDF code) whose only commonality with the production
renderer is the XML scene loader. Both estimators converge to the same
integral, so a high-spp render from this file is an external oracle for
the production NEE+MIS estimator — the role BASELINE.md assigns to
"reference PT-with-MIS renders" (mitsuba3 is not installable in this
image; an independent in-repo implementation is the next-best oracle).

Scope: diffuse (+ twosided) materials and triangle area lights — enough
for the cornell box. Usage:

    python tools/oracle_pt.py [scene.xml] --size 64 --spp 8192 \
        --out tests/data/oracle_cornell_64.exr
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def flatten_numpy(scene):
    """Independent world-space triangle flatten (no framework code)."""
    tris = []  # (p0, e1, e2, n, albedo, emission)
    for ins in scene.shape_instances:
        mesh = ins.shape.mesh
        m = ins.transform.matrix
        p = mesh.positions @ m[:3, :3].T + m[:3, 3]
        mat = ins.material
        albedo = np.zeros(3, np.float32)
        if hasattr(mat, "reflectance") and mat.reflectance is not None:
            albedo = np.asarray(mat.reflectance.rgb, np.float32)
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
    p0 = np.stack([t[0] for t in tris]).astype(np.float32)
    e1 = np.stack([t[1] for t in tris]).astype(np.float32)
    e2 = np.stack([t[2] for t in tris]).astype(np.float32)
    nrm = np.stack([t[3] for t in tris]).astype(np.float32)
    alb = np.stack([t[4] for t in tris]).astype(np.float32)
    emi = np.stack([t[5] for t in tris]).astype(np.float32)
    return p0, e1, e2, nrm, alb, emi


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
                hit = idx >= 0
                alive = alive & hit
                if not alive.any():
                    break
                i = np.maximum(idx, 0)
                n = nrm[i]
                # twosided: flip toward the incoming ray
                flip = np.einsum("nj,nj->n", n, rd) > 0
                n = np.where(flip[:, None], -n, n)
                pos = ro + t[:, None] * rd
                # one-sided emission (render/emitter.h Eval: lnol > 0),
                # i.e. only when the geometric normal faces the ray
                front = ~flip
                radiance += np.where(
                    (alive & front)[:, None], throughput * emi[i], 0.0
                )
                # pure BSDF sampling: cosine hemisphere, f*cos/pdf = albedo
                throughput = throughput * np.where(
                    alive[:, None], alb[i], 1.0
                )
                rd = cosine_sample(n, rng)
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
