"""Round-curve primitives: rounded-cone intersection, normals, XML
loading, and render integration.

Parity: the reference exposes the four optix builtin curve intersection
modules (optix/module.h:20-29) but never loads curve geometry from any
scene; here curves parse from XML, tessellate to rounded-cone segments
at flatten time, and intersect analytically (beyond parity)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.scene import ShapeType, load_scene

CURVE_XML = """<scene version="3.0.0">
  <integrator type="path"><integer name="max_depth" value="2"/></integrator>
  <sensor type="perspective"><float name="fov" value="40"/>
    <transform name="to_world">
      <lookat origin="0, 0.5, 4" target="0, 0.5, 0" up="0, 1, 0"/>
    </transform>
    <film type="hdrfilm"><integer name="width" value="64"/>
      <integer name="height" value="64"/></film>
  </sensor>
  <emitter type="constant"><rgb name="radiance" value="0.8, 0.8, 0.8"/></emitter>
  <shape type="linearcurve">
    <string name="points" value="-1,0.5,0,0.15; 0,0.8,0,0.12; 1,0.5,0,0.15"/>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.7, 0.3, 0.2"/></bsdf>
  </shape>
  <shape type="bsplinecurve">
    <string name="points" value="-1,0,0,0.1; -0.3,0.2,0,0.1; 0.3,0.0,0,0.1; 1,0.2,0,0.1"/>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.2, 0.6, 0.3"/></bsdf>
  </shape>
</scene>"""


@pytest.fixture(scope="module")
def curve_scene(tmp_path_factory):
    p = tmp_path_factory.mktemp("curves") / "curves.xml"
    p.write_text(CURVE_XML)
    scene = load_scene(p)
    data, config = flatten_scene(scene)
    cam = camera_block_from_scene(scene)
    return scene, data, config, cam


def test_curve_xml_parses(curve_scene):
    scene, data, config, cam = curve_scene
    types = [i.shape.type for i in scene.shape_instances]
    assert types.count(ShapeType.CURVE) == 2
    lin = scene.shape_instances[0].shape
    assert lin.curve_degree == 1 and lin.curve_points.shape == (3, 4)
    # linear: 2 segments; cubic: tessellated to 8 per span (3 spans)
    assert config.curve_count == 2 + 3 * 8
    assert data.curves.packed.shape[0] == config.curve_count


def test_rounded_cone_intersection_analytic(curve_scene):
    """Axis-perpendicular ray at the midpoint of a constant-radius
    segment must hit at distance (z0 - r); a ray missing the tube by
    more than r must miss."""
    from pupiloptixlab_tpu.accel.intersect import intersect_closest
    from pupiloptixlab_tpu.render.vec import Vec3

    scene, data, config, cam = curve_scene
    n = 8
    # segment 0 of the linear curve: (-1,0.5,0,r=.15) -> (0,0.8,0,.12)
    # aim at its first endpoint sphere cap from +z
    ro = Vec3(jnp.full(n, -1.0), jnp.full(n, 0.5), jnp.full(n, 5.0))
    rd = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, -1.0))
    hit = intersect_closest(
        ro, rd, jnp.full(n, 1e-3), jnp.full(n, 1e16), data, config
    )
    assert bool(hit.hit_mask.all())
    assert bool((hit.kind == 2).all())
    np.testing.assert_allclose(np.asarray(hit.t), 5.0 - 0.15, atol=2e-3)

    # normal at that cap points back toward the ray
    from pupiloptixlab_tpu.render.geometry import get_local_geometry

    geo = get_local_geometry(
        data, hit, ro, rd, config.sphere_count, config.instanced,
        config.curve_count,
    )
    assert float(geo.normal.z.min()) > 0.95

    # miss: above the tube
    ro2 = Vec3(jnp.full(n, -1.0), jnp.full(n, 1.2), jnp.full(n, 5.0))
    hit2 = intersect_closest(
        ro2, rd, jnp.full(n, 1e-3), jnp.full(n, 1e16), data, config
    )
    assert not bool(hit2.hit_mask.any())


def test_curve_render_and_occlusion(curve_scene):
    """End-to-end: curves render (non-black over the tubes), occlude
    shadow rays, and hidden padding rows never hit."""
    from pupiloptixlab_tpu.render.integrator import render

    scene, data, config, cam = curve_scene
    img = np.asarray(render(data, cam, config, spp=4))
    assert np.isfinite(img).all()
    # the reddish linear curve crosses the upper-center region
    assert img[24:40, 16:48, 0].max() > 0.05
    # const-env pixels away from the curves are the env color
    assert abs(img[2, 2].mean() - 0.8) < 0.05


def test_curve_anyhit_occludes(curve_scene):
    from pupiloptixlab_tpu.accel.intersect import intersect_any
    from pupiloptixlab_tpu.render.vec import Vec3

    scene, data, config, cam = curve_scene
    n = 8
    ro = Vec3(jnp.full(n, -1.0), jnp.full(n, 0.5), jnp.full(n, 5.0))
    rd = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, -1.0))
    occ = intersect_any(
        ro, rd, jnp.full(n, 1e-3), jnp.full(n, 1e16), data, config
    )
    assert bool(occ.all())
    # limited tmax short of the tube -> unoccluded
    occ2 = intersect_any(
        ro, rd, jnp.full(n, 1e-3), jnp.full(n, 3.0), data, config
    )
    assert not bool(occ2.any())
