"""Point + directional emitter flattening and NEE (delta lights).

Closes the reference's own TODO (world/emitter.cpp:314-316): the
descriptor structs exist on both sides but only this build flattens
them. Tests: analytic 1/r^2 point-light irradiance, directional
E*cos/pi radiance, and an end-to-end scene render through the XML path.
"""

import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
from pupiloptixlab_tpu.render import emitter as E
from pupiloptixlab_tpu.render.integrator import render
from pupiloptixlab_tpu.scene import load_scene


def _scene_xml(tmp_path, emitter_xml):
    xml = textwrap.dedent(f"""\
        <scene version="3.0.0">
          <integrator type="path"><integer name="max_depth" value="2"/></integrator>
          <sensor type="perspective">
            <float name="fov" value="60"/>
            <transform name="to_world">
              <lookat origin="0, 1.0, 3" target="0, 0, 0" up="0, 1, 0"/>
            </transform>
            <film type="hdrfilm">
              <integer name="width" value="32"/>
              <integer name="height" value="32"/>
            </film>
          </sensor>
          {emitter_xml}
          <shape type="rectangle" id="floor">
            <transform name="to_world">
              <matrix value="4 0 0 0 0 0 -4 0 0 4 0 0 0 0 0 1"/>
            </transform>
            <bsdf type="twosided"><bsdf type="diffuse">
              <rgb name="reflectance" value="0.7, 0.7, 0.7"/>
            </bsdf></bsdf>
          </shape>
        </scene>
    """)
    p = tmp_path / "delta.xml"
    p.write_text(xml)
    return p


POINT_XML = """<emitter type="point">
    <point name="position" x="0" y="2" z="0"/>
    <rgb name="intensity" value="5, 5, 5"/>
  </emitter>"""

DIR_XML = """<emitter type="directional">
    <vector name="direction" x="0" y="-1" z="0"/>
    <rgb name="irradiance" value="3, 3, 3"/>
  </emitter>"""


def test_point_emitter_flattens(tmp_path):
    scene = load_scene(_scene_xml(tmp_path, POINT_XML))
    data, config = flatten_scene(scene)
    assert config.has_point_emitter and not config.has_directional_emitter
    assert config.emitter_count == 1
    et = np.asarray(data.emitters.etype)
    assert et[0] == 2
    np.testing.assert_allclose(np.asarray(data.emitters.v0p)[0], [0, 2, 0])


def test_point_nee_inverse_square(tmp_path):
    """sample_direct must return I/r^2 with pdf 1 and is_delta set."""
    scene = load_scene(_scene_xml(tmp_path, POINT_XML))
    data, config = flatten_scene(scene)
    from pupiloptixlab_tpu.render.vec import Vec3

    n = 8
    hit = Vec3(
        jnp.asarray(np.full(n, 1.0, np.float32)),
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
    )  # distance to light: sqrt(1 + 4) = sqrt(5)
    nrm = Vec3.full(n, 0.0, 1.0, 0.0)
    u = jnp.linspace(0.01, 0.99, n)
    idx, use_env = E.select_emitter(data.emitters, config, u)
    es = E.sample_direct(
        data.emitters, data.textures, config, idx, use_env, hit, nrm, u, u
    )
    assert bool(np.asarray(es.is_delta).all())
    np.testing.assert_allclose(np.asarray(es.pdf), 1.0)
    np.testing.assert_allclose(np.asarray(es.distance), np.sqrt(5.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(es.radiance.x), 5.0 / 5.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(es.select_prob), 1.0)
    # wi points from the hit toward the light
    want_wi = np.array([-1.0, 2.0, 0.0]) / np.sqrt(5.0)
    np.testing.assert_allclose(np.asarray(es.wi.x), want_wi[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(es.wi.y), want_wi[1], rtol=1e-5)


@pytest.mark.parametrize(
    "emitter_xml,expected_center",
    [
        # point: L = albedo/pi * I * cos/d^2 at the point under the light
        # (d=2, cos=1): 0.7/pi * 5/4
        (POINT_XML, 0.7 / np.pi * 5.0 / 4.0),
        # directional straight down: L = albedo/pi * E * cos(0) = 0.7/pi * 3
        (DIR_XML, 0.7 / np.pi * 3.0),
    ],
)
def test_delta_light_render(tmp_path, emitter_xml, expected_center):
    scene = load_scene(_scene_xml(tmp_path, emitter_xml))
    data, config = flatten_scene(scene)
    cam = camera_block_from_scene(scene)
    img = np.asarray(render(data, cam, config, spp=16))
    assert np.isfinite(img).all()
    # the floor point below the light projects near the image center
    # (camera looks at the origin)
    h, w = img.shape[:2]
    center = img[h // 2 - 1 : h // 2 + 1, w // 2 - 1 : w // 2 + 1].mean()
    np.testing.assert_allclose(center, expected_center, rtol=0.08)


def test_directional_light_shadowing(tmp_path):
    """A second rectangle floating above the floor must cast a shadow
    from the directional light (occlusion with tmax at infinity)."""
    blocker = """<shape type="rectangle" id="blocker">
        <transform name="to_world">
          <matrix value="0.5 0 0 0 0 0 -0.5 1.0 0 0.5 0 0 0 0 0 1"/>
        </transform>
        <bsdf type="twosided"><bsdf type="diffuse">
          <rgb name="reflectance" value="0.7, 0.7, 0.7"/>
        </bsdf></bsdf>
      </shape>"""
    scene = load_scene(_scene_xml(tmp_path, DIR_XML + blocker))
    data, config = flatten_scene(scene)
    cam = camera_block_from_scene(scene)
    img = np.asarray(render(data, cam, config, spp=8))
    h, w = img.shape[:2]
    # center (shadowed, directly under the blocker) vs off to the side
    shadow = img[h // 2, w // 2].mean()
    lit = img[h // 2, 2].mean()
    assert shadow < 0.35 * lit, (shadow, lit)
