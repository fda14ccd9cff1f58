"""End-to-end accuracy vs the independent brute-force oracle.

tests/data/oracle_cornell_64.exr is a 4096-spp render from
tools/oracle_pt.py — a standalone numpy path tracer (pure BSDF
sampling, no NEE/MIS, its own flatten + intersector) that shares only
the scene loader with the production renderer. Agreement here validates
the FULL estimator (NEE + MIS + RR + emission sidedness), which
self-goldens cannot (BASELINE.md accuracy row; mitsuba3 is not
installable in this image).

This caught two real energy bugs in round 2: the reference's own MIS
selection-probability asymmetry (main.cu:135-137 vs 180; +5% direct
with 2 emitters) and twosided backside emission through the flipped
shading normal (+60% on light-adjacent pixels).
"""

from pathlib import Path

import numpy as np
import pytest

ORACLE = Path(__file__).parent / "data" / "oracle_cornell_64.exr"


@pytest.mark.slow
def test_cornell_matches_brute_force_oracle(reference_scene_dir):
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render
    from pupiloptixlab_tpu.scene import load_scene
    from pupiloptixlab_tpu.utils.image import read_exr

    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    scene.sensor.film.w = scene.sensor.film.h = 64
    data, config = flatten_scene(scene)
    cam = camera_block_from_scene(scene)
    img = np.asarray(render(data, cam, config, spp=512))
    oracle = read_exr(ORACLE)[::-1][..., :3]

    rel_mse = float(np.mean((img - oracle) ** 2) / np.mean(oracle**2))
    mean_ratio = float(img.mean() / oracle.mean())

    # global energy must agree within a fraction of a percent
    assert abs(mean_ratio - 1.0) < 0.01, mean_ratio
    # pixelwise rel MSE at equal-ish variance budgets (oracle 4096 spp
    # pure-BSDF ~ ours 512 spp NEE+MIS); BASELINE target is 1e-3
    assert rel_mse < 2e-3, rel_mse
    # and with a 4x4 box filter (cuts both noise floors) much tighter
    def box(a):
        return a.reshape(16, 4, 16, 4, 3).mean((1, 3))

    box_rel = float(np.mean((box(img) - box(oracle)) ** 2) / np.mean(box(oracle) ** 2))
    assert box_rel < 3e-4, box_rel


ORACLE_VEACH = Path(__file__).parent / "data" / "oracle_veach_96.exr"


@pytest.mark.slow
def test_veach_matches_brute_force_oracle(reference_scene_dir):
    """mis.xml (veach): rough-conductor strips + sphere lights — the
    scene MIS exists for. The oracle is pure BSDF sampling at 8192 spp,
    so its noise floor is high on the small bright lights; gates are
    energy ratio + box-filtered MSE."""
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render
    from pupiloptixlab_tpu.scene import load_scene
    from pupiloptixlab_tpu.utils.image import read_exr
    import dataclasses

    scene = load_scene(reference_scene_dir / "mis.xml")
    scene.sensor.film.w = scene.sensor.film.h = 96  # oracle is square
    data, config = flatten_scene(scene)
    config = dataclasses.replace(config, max_depth=4)  # oracle default
    cam = camera_block_from_scene(scene)
    img = np.asarray(render(data, cam, config, spp=384))
    oracle = read_exr(ORACLE_VEACH)[::-1][..., :3]

    mean_ratio = float(img.mean() / oracle.mean())
    assert abs(mean_ratio - 1.0) < 0.02, mean_ratio

    def box(a):
        return a.reshape(12, 8, 12, 8, 3).mean((1, 3))

    box_rel = float(
        np.mean((box(img) - box(oracle)) ** 2) / np.mean(box(oracle) ** 2)
    )
    assert box_rel < 2e-3, box_rel


ORACLE_MESH_ENV = Path(__file__).parent / "data" / "oracle_mesh_env_64.exr"


@pytest.mark.slow
def test_mesh_env_matches_brute_force_oracle():
    """data/mesh_env.xml (BASELINE config 4's scene): 20k-triangle
    icosphere under an equirect environment map — the first oracle gate
    that exercises the BVH traversal kernels (Pallas sweep + gather) and
    the env joint-CDF NEE/MIS path end-to-end against brute force.
    Oracle: 4096 spp pure-BSDF sampling at 64x64, tools/oracle_pt.py.

    Calibration (r5, real TPU, 512 spp): rel_mse 8.9e-3, ratio 0.991,
    box_rel 2.9e-3. The residual is NOT a traversal bug: a
    PUPIL_NO_BVH=1 brute-force-sweep render at identical seeds is
    BIT-IDENTICAL to the BVH render (rel MSE 0.0, 1024 spp), so the
    whole production intersection stack agrees with exhaustive testing.
    The remaining regional +-10% (sphere darker / its env-shadow zone
    brighter) traces to the oracle's shading-normal treatment:
    oracle_pt.py shades with FACE-AVERAGED vertex normals (one normal
    per face) while production interpolates barycentrically (the
    reference's behavior, optix_util.h closesthit geometry) — on a
    smooth-shaded sphere the faceted GGX lobes redistribute env energy.
    Gates below bound today's agreement; tighten to the 1e-3 BASELINE
    row after regenerating the oracle with barycentric normals
    (ROADMAP)."""
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render
    from pupiloptixlab_tpu.scene import load_scene
    from pupiloptixlab_tpu.utils.image import read_exr

    scene = load_scene(Path(__file__).parent.parent / "data" / "mesh_env.xml")
    scene.sensor.film.w = scene.sensor.film.h = 64
    data, config = flatten_scene(scene)
    cam = camera_block_from_scene(scene)
    img = np.asarray(render(data, cam, config, spp=512))
    oracle = read_exr(ORACLE_MESH_ENV)[::-1][..., :3]

    mean_ratio = float(img.mean() / oracle.mean())
    assert abs(mean_ratio - 1.0) < 0.02, mean_ratio

    rel_mse = float(np.mean((img - oracle) ** 2) / np.mean(oracle**2))
    assert rel_mse < 1.5e-2, rel_mse

    def box(a):
        return a.reshape(16, 4, 16, 4, 3).mean((1, 3))

    box_rel = float(
        np.mean((box(img) - box(oracle)) ** 2) / np.mean(box(oracle) ** 2)
    )
    assert box_rel < 5e-3, box_rel


ORACLE_BIG_ENV = Path(__file__).parent / "data" / "oracle_big_env_48.exr"


@pytest.mark.slow
@pytest.mark.heavy
def test_big_env_matches_brute_force_oracle(tmp_path):
    """The 405k-triangle STREAMED scene (generated displaced grid under
    a 2.5x-scaled sky, tools/make_big_scene.py) against a 1168-spp
    pure-BSDF oracle at 48x48 — the first oracle coverage of the
    HBM-streamed DMA-ring traversal AND of a scaled envmap.

    This gate exists because its calibration run caught a real
    estimator bug: the env NEE/MIS pdf used the SCALED radiance
    luminance against a normalization built from unscaled pixels, so
    every surface lit by a scale!=1 envmap under-collected by exactly
    `scale` (production read 0.73x the oracle terrain-wide while the
    escape path matched 1.000). Fixed in flatten's env_norm; scale=1
    scenes were never affected. Gates reflect the oracle's noise floor
    (pure BSDF under an HDR sun at 1168 spp)."""
    import subprocess
    import sys

    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render
    from pupiloptixlab_tpu.scene import load_scene
    from pupiloptixlab_tpu.utils.image import read_exr

    xml = Path("/tmp/pupil_big_env/big_env.xml")
    if not xml.exists():
        subprocess.run(
            [sys.executable, "tools/make_big_scene.py", str(xml.parent), "450"],
            check=True, capture_output=True, timeout=300,
            cwd=Path(__file__).parent.parent,
        )
    scene = load_scene(xml)
    scene.sensor.film.w = scene.sensor.film.h = 48
    data, config = flatten_scene(scene)
    cam = camera_block_from_scene(scene)
    img = np.asarray(render(data, cam, config, spp=128))
    oracle = read_exr(ORACLE_BIG_ENV)[::-1][..., :3]

    mean_ratio = float(img.mean() / oracle.mean())
    assert abs(mean_ratio - 1.0) < 0.03, mean_ratio

    def box(a):
        return a.reshape(12, 4, 12, 4, 3).mean((1, 3))

    box_rel = float(
        np.mean((box(img) - box(oracle)) ** 2) / np.mean(box(oracle) ** 2)
    )
    assert box_rel < 2e-2, box_rel


ORACLE_MAT = Path(__file__).parent / "data" / "oracle_mat_64.exr"


@pytest.mark.slow
def test_all_bsdfs_match_brute_force_oracle():
    """data/oracle_mat.xml: all SEVEN BSDF types (diffuse, conductor,
    rough conductor, dielectric, rough dielectric, plastic, rough
    plastic) under an area light AND a constant environment — validates
    the full estimator including env NEE/MIS and the delta/horizon MIS
    overrides this oracle caught in round 3 (furnace mirror/glass
    spheres rendered 14-17% dark before the fix). Oracle: 16384 spp
    pure-BSDF sampling, tools/oracle_pt.py."""
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render
    from pupiloptixlab_tpu.scene import load_scene
    from pupiloptixlab_tpu.utils.image import read_exr

    scene = load_scene(Path(__file__).parent.parent / "data" / "oracle_mat.xml")
    scene.sensor.film.w = scene.sensor.film.h = 64
    data, config = flatten_scene(scene)
    cam = camera_block_from_scene(scene)
    img = np.asarray(render(data, cam, config, spp=512))
    oracle = read_exr(ORACLE_MAT)[::-1][..., :3]

    mean_ratio = float(img.mean() / oracle.mean())
    assert abs(mean_ratio - 1.0) < 0.01, mean_ratio

    rel_mse = float(np.mean((img - oracle) ** 2) / np.mean(oracle**2))
    assert rel_mse < 4e-3, rel_mse

    def box(a):
        return a.reshape(16, 4, 16, 4, 3).mean((1, 3))

    box_rel = float(
        np.mean((box(img) - box(oracle)) ** 2) / np.mean(box(oracle) ** 2)
    )
    assert box_rel < 1e-3, box_rel
