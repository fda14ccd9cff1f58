"""Emitter sampling correctness: analytic direct lighting + furnace test."""

import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render import emitter as E
from pupiloptixlab_tpu.render import rng
from pupiloptixlab_tpu.scene import Scene, load_scene
from pupiloptixlab_tpu.scene.emitters import Emitter, EmitterType
from pupiloptixlab_tpu.scene.materials import Material, MatType
from pupiloptixlab_tpu.scene.shapes import ShapeInstance
from pupiloptixlab_tpu.scene.textures import rgb_texture
from pupiloptixlab_tpu.utils.math import Transform


def _light_scene(transform, radiance=(1.0, 1.0, 1.0)):
    scene = Scene()
    ins = ShapeInstance(
        shape=scene.shape_manager.load_rectangle(),
        material=Material(type=MatType.DIFFUSE),
        transform=transform,
        emitter=Emitter(type=EmitterType.AREA, radiance=rgb_texture(*radiance)),
        is_emitter=True,
    )
    scene.shape_instances = [ins]
    return flatten_scene(scene)


def test_direct_irradiance_matches_analytic():
    """Unit-radiance square light above a point: NEE estimator must
    reproduce the analytic form-factor integral."""
    # light: rectangle [-1,1]^2 at z=2 facing down (rotate 180 about x)
    t = Transform().rotate(1, 0, 0, 180).translate(0, 0, 2.0)
    data, config = _light_scene(t)

    n = 400_000
    r = np.random.RandomState(3)
    u_sel = jnp.asarray(r.rand(n).astype(np.float32))
    u1 = jnp.asarray(r.rand(n).astype(np.float32))
    u2 = jnp.asarray(r.rand(n).astype(np.float32))
    from pupiloptixlab_tpu.render.vec import Vec3
    pos = Vec3.zeros(n)
    nrm = Vec3.full(n, 0.0, 0.0, 1.0)

    idx, use_env = E.select_emitter(data.emitters, config, u_sel)
    es = E.sample_direct(
        data.emitters, data.textures, config, idx, use_env,
        pos, nrm, u1, u2,
    )
    nol = np.asarray(es.wi.z)
    pdf = np.asarray(es.pdf) * np.asarray(es.select_prob)
    rad = np.asarray(es.radiance.x)
    valid = pdf > 1e-9
    contrib = np.where(valid, rad * np.maximum(nol, 0.0) / np.maximum(pdf, 1e-9), 0.0)
    est = contrib.mean()
    # analytic: E = L * integral over square of cos1*cos2/d^2 dA
    # for unit square half-size a=1 at height h=2 over the origin:
    xs = np.linspace(-1, 1, 801)
    X, Y = np.meshgrid(xs, xs)
    d2 = X * X + Y * Y + 4.0
    integrand = (2.0 / np.sqrt(d2)) * (2.0 / np.sqrt(d2)) / d2
    analytic = integrand.mean() * 4.0  # area = 4
    assert est == pytest.approx(analytic, rel=0.02)


def test_selection_probabilities_weighted_by_power():
    """Two lights, one 3x the max-channel radiance -> 3x selection prob."""
    scene = Scene()
    mk = lambda rad, tx: ShapeInstance(
        shape=scene.shape_manager.load_rectangle(),
        material=Material(type=MatType.DIFFUSE),
        transform=Transform().translate(*tx),
        emitter=Emitter(type=EmitterType.AREA, radiance=rgb_texture(*rad)),
        is_emitter=True,
    )
    scene.shape_instances = [mk((1, 1, 1), (0, 0, 0)), mk((3, 3, 3), (5, 0, 0))]
    data, config = flatten_scene(scene)
    p = np.asarray(data.emitters.select_prob[:4])
    # per-tri probs: same area, weights 1 and 3 -> 0.125,0.125,0.375,0.375
    np.testing.assert_allclose(p, [0.125, 0.125, 0.375, 0.375], rtol=1e-5)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)


def test_const_env_furnace(reference_scene_dir):
    """White furnace: diffuse R=1 surface under constant env L=1 must
    reflect exactly L (energy conservation of the whole estimator)."""
    from pupiloptixlab_tpu.render import render

    scene = Scene()
    # big diffuse floor
    scene.shape_instances = [
        ShapeInstance(
            shape=scene.shape_manager.load_rectangle(),
            material=Material(type=MatType.DIFFUSE, reflectance=rgb_texture(1.0)),
            transform=Transform().scale(100, 100, 1).rotate(1, 0, 0, -90),
        )
    ]
    scene.emitters = [Emitter(type=EmitterType.CONST_ENV, color=np.ones(3, np.float32))]
    scene.sensor.film.w = scene.sensor.film.h = 24
    scene.integrator.max_depth = 6
    # camera above the floor looking down
    from pupiloptixlab_tpu.utils.math import look_at_matrix, mitsuba_handedness_fix

    m = mitsuba_handedness_fix(
        mitsuba_handedness_fix(look_at_matrix([0, 5, 0.01], [0, 0, 0], [0, 1, 0]))
    )
    scene.sensor.transform = Transform(m)
    scene.sensor.fov = 30.0

    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    img = np.asarray(render(data, camera, config, spp=64))
    # every pixel sees the floor; radiance must converge to 1
    assert img.mean() == pytest.approx(1.0, rel=0.03)
    assert img.std() < 0.2


def test_env_map_cdf_tables():
    """Env map flatten: CDF monotone, normalization positive."""
    import numpy as np

    from pupiloptixlab_tpu.scene.textures import Texture, TextureType

    scene = Scene()
    r = np.random.RandomState(0)
    img = np.abs(r.rand(16, 32, 4)).astype(np.float32)
    env = Emitter(type=EmitterType.ENV_MAP)
    env.radiance = Texture(type=TextureType.BITMAP, data=img)
    scene.emitters = [env]
    data, config = flatten_scene(scene)
    assert config.has_env and config.env_size == (32, 16)
    row_cdf = np.asarray(data.emitters.env_row_cdf)
    assert row_cdf[0] == 0.0 and row_cdf[-1] == 1.0
    assert np.all(np.diff(row_cdf) >= 0)
    col = np.asarray(data.emitters.env_col_cdf)
    assert col.shape == (16, 33)
    assert np.all(col[:, -1] == 1.0)
    assert float(data.emitters.env_normalization) > 0
