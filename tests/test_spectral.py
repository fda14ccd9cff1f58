"""Hero-wavelength spectral rendering (render/spectral.py) — beyond the
RGB-only reference: calibration exactness, estimator consistency with
the RGB integrator, white-furnace energy, and dielectric dispersion.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render import spectral as sp
from pupiloptixlab_tpu.render.integrator import render
from pupiloptixlab_tpu.render.vec import Vec3
from pupiloptixlab_tpu.scene import Scene
from pupiloptixlab_tpu.scene.emitters import Emitter, EmitterType
from pupiloptixlab_tpu.scene.materials import Material, MatType
from pupiloptixlab_tpu.scene.shapes import ShapeInstance
from pupiloptixlab_tpu.scene.textures import rgb_texture
from pupiloptixlab_tpu.utils.math import (
    Transform,
    look_at_matrix,
    mitsuba_handedness_fix,
)


def _quad_rgb(rgb):
    """Dense-quadrature rgb of lift(rgb) — the exact sensor integral."""
    lam = jnp.linspace(sp.LAM_MIN, sp.LAM_MAX, 4001)
    v = Vec3(*(jnp.full(4001, float(c)) for c in rgb))
    s = sp.lift(v, sp.Spec4(lam, lam, lam, lam)).s0
    x, y, z = sp.cie_x(lam), sp.cie_y(lam), sp.cie_z(lam)
    out = []
    for c in range(3):
        m = sp._XYZ_TO_SRGB[c]
        w = sp._D_SCALE[c] * (m[0] * x + m[1] * y + m[2] * z)
        out.append(float(np.trapezoid(np.asarray(s * w), np.asarray(lam))))
    return np.array(out)


def test_white_lifts_to_unit_spectrum():
    lam = jnp.linspace(sp.LAM_MIN, sp.LAM_MAX, 801)
    s = sp.lift(Vec3.ones(801), sp.Spec4(lam, lam, lam, lam))
    np.testing.assert_allclose(np.asarray(s.s0), 1.0, atol=1e-6)


def test_rgb_round_trip_exact_in_gamut():
    rs = np.random.RandomState(7)
    for rgb in rs.rand(6, 3):
        np.testing.assert_allclose(_quad_rgb(rgb), rgb, atol=2e-6)


def test_estimator_unbiased_over_wavelengths():
    """mean_j S_j w(lambda_j) over many hero draws converges to the
    quadrature integral (the sensor MC estimator is consistent)."""
    rgb = (0.7, 0.4, 0.2)
    n = 20000
    u = (np.arange(n) + 0.5) / n
    lams = sp.sample_wavelengths(jnp.asarray(u, jnp.float32))
    v = Vec3(*(jnp.full(n, float(c)) for c in rgb))
    est = np.asarray(sp.to_rgb(sp.lift(v, lams), lams).to_array())
    np.testing.assert_allclose(est.mean(0), _quad_rgb(rgb), atol=2e-3)


def test_wavelengths_stratified_and_importance():
    lams = sp.sample_wavelengths(jnp.asarray([0.1, 0.9], jnp.float32))
    a = np.sort(np.stack([np.asarray(x) for x in lams])[:, 0])
    assert a.min() >= sp.LAM_MIN - 1e-3 and a.max() <= sp.LAM_MAX + 1e-3
    # the 4 samples land in the 4 quarters of the importance CDF
    cdf = lambda l: (np.tanh(sp._VIS_A * (l - sp._VIS_MU)) - sp._VIS_T0) / (
        sp._VIS_T1 - sp._VIS_T0
    )
    q = np.sort(cdf(a))
    assert all(j / 4 <= q[j] <= (j + 1) / 4 for j in range(4)), q
    # pdf normalized over the visible range
    lam = np.linspace(sp.LAM_MIN, sp.LAM_MAX, 2001)
    p = np.asarray(sp.wavelength_pdf(jnp.asarray(lam)))
    assert np.trapezoid(p, lam) == pytest.approx(1.0, abs=1e-6)
    # importance sampling beats uniform on the white sensor estimator
    # (measured: r 0.29 -> 0.13, g 0.14 -> 0.046, b 0.59 -> 0.55)
    n = 20000
    u = (np.arange(n) + 0.5) / n
    ls = sp.sample_wavelengths(jnp.asarray(u, jnp.float32))
    est = np.asarray(sp.to_rgb(sp.Spec4.ones(n), ls).to_array())
    np.testing.assert_allclose(est.mean(0), 1.0, atol=2e-3)
    assert est.std(0)[0] < 0.2 and est.std(0)[1] < 0.08


def _furnace_scene(dispersive_glass=False):
    scene = Scene()
    scene.shape_instances = [
        ShapeInstance(
            shape=scene.shape_manager.load_rectangle(),
            material=Material(type=MatType.DIFFUSE, reflectance=rgb_texture(1.0)),
            transform=Transform().scale(100, 100, 1).rotate(1, 0, 0, -90),
        )
    ]
    if dispersive_glass:
        scene.shape_instances.append(
            ShapeInstance(
                shape=scene.shape_manager.load_sphere(),
                material=Material(
                    type=MatType.DIELECTRIC, int_ior=1.5, ext_ior=1.0,
                    dispersion=0.009,  # ~borosilicate Cauchy B (um^2)
                ),
                transform=Transform().translate(0, 1.5, 0),
            )
        )
    scene.emitters = [
        Emitter(type=EmitterType.CONST_ENV, color=np.ones(3, np.float32))
    ]
    scene.sensor.film.w = scene.sensor.film.h = 24
    scene.integrator.max_depth = 6
    m = mitsuba_handedness_fix(
        mitsuba_handedness_fix(look_at_matrix([0, 5, 0.01], [0, 0, 0], [0, 1, 0]))
    )
    scene.sensor.transform = Transform(m)
    scene.sensor.fov = 30.0
    return scene


def test_spectral_white_furnace():
    """The spectral estimator must conserve energy exactly like the RGB
    one: white lifts to the constant-1 spectrum, so only the sensor's
    wavelength MC adds variance around 1.0."""
    scene = _furnace_scene()
    data, config = flatten_scene(scene)
    config = dataclasses.replace(config, spectral=True)
    camera = camera_block_from_scene(scene)
    img = np.asarray(render(data, camera, config, spp=96))
    assert img.mean() == pytest.approx(1.0, rel=0.03)
    # per-channel too: the CMF weights integrate to 1 per channel
    np.testing.assert_allclose(img.reshape(-1, 3).mean(0), 1.0, rtol=0.04)


def test_spectral_matches_rgb_on_cornell(reference_scene_dir):
    """On an RGB-defined scene the spectral render must agree with the
    RGB render up to the (small, legitimate) colored-interreflection
    difference + MC noise."""
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    scene.sensor.film.w = scene.sensor.film.h = 32
    data, config = flatten_scene(scene)
    config = dataclasses.replace(config, max_depth=3)
    camera = camera_block_from_scene(scene)
    rgb = np.asarray(render(data, camera, config, spp=48))
    spec = np.asarray(
        render(data, camera, dataclasses.replace(config, spectral=True),
               spp=48)
    )
    assert spec.mean() == pytest.approx(rgb.mean(), rel=0.05)
    # structural agreement, not just global energy
    box = lambda im: im.reshape(8, 4, 8, 4, 3).mean((1, 3))
    rel = np.abs(box(spec) - box(rgb)).mean() / box(rgb).mean()
    assert rel < 0.08, rel


def test_dispersion_eta_and_rainbow():
    """eta(lambda) decreases with wavelength (normal dispersion), and a
    dispersive glass sphere produces chroma that the non-dispersive
    render lacks."""
    e = np.asarray(
        sp.eta_at(jnp.full(3, 1.5), jnp.full(3, 0.009),
                  jnp.asarray([420.0, 580.0, 700.0]))
    )
    assert e[0] > e[1] > e[2] > 1.0

    scene = _furnace_scene(dispersive_glass=True)
    data, config = flatten_scene(scene)
    config = dataclasses.replace(config, spectral=True)
    camera = camera_block_from_scene(scene)
    img = np.asarray(render(data, camera, config, spp=64))
    assert np.isfinite(img).all()

    # same scene, dispersion zeroed: chroma through the glass vanishes
    from pupiloptixlab_tpu.flatten.types import MAT_DISPERSION

    packed = np.asarray(data.materials.packed).copy()
    packed[:, MAT_DISPERSION] = 0.0
    data0 = dataclasses.replace(
        data,
        materials=dataclasses.replace(
            data.materials, packed=jnp.asarray(packed)
        ),
    )
    img0 = np.asarray(render(data0, camera, config, spp=64))
    chroma = lambda im: np.abs(np.diff(im, axis=-1)).max()
    assert chroma(img) > 2.0 * chroma(img0), (chroma(img), chroma(img0))
