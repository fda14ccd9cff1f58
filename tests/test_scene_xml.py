import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.scene import MatType, ShapeType, TextureType, load_scene
from pupiloptixlab_tpu.scene.emitters import EmitterType


def test_cornellbox(reference_scene_dir):
    scene = load_scene(reference_scene_dir / "cornellbox.xml")
    assert scene.integrator.max_depth == 4  # via <default max_depth=4>
    assert scene.sensor.film.w == 512 and scene.sensor.film.h == 512
    assert scene.sensor.sample_count == 64
    # fov 19.5 converted from x-axis with square aspect -> unchanged value
    assert abs(scene.sensor.fov - 19.5) < 1e-4
    assert len(scene.shape_instances) == 8
    # camera: matrix sensor, handedness-fixed -> position (0,1,6.8)
    np.testing.assert_allclose(
        scene.sensor.transform.matrix[:3, 3], [0, 1, 6.8], atol=1e-6
    )
    np.testing.assert_allclose(scene.sensor.transform.matrix[0, 0], 1.0, atol=1e-6)
    # all materials diffuse + twosided via <ref>
    for ins in scene.shape_instances:
        assert ins.material.type == MatType.DIFFUSE
        assert ins.material.twosided
    light = [i for i in scene.shape_instances if i.is_emitter]
    assert len(light) == 1
    np.testing.assert_allclose(light[0].emitter.radiance.rgb, [17, 12, 4])
    # left wall reflectance red-ish
    left = next(i for i in scene.shape_instances if i.name == "LeftWall")
    np.testing.assert_allclose(left.material.reflectance.rgb, [0.63, 0.065, 0.05])


def test_default_scene(reference_scene_dir):
    scene = load_scene(reference_scene_dir / "default.xml")
    assert scene.integrator.max_depth == 6
    assert scene.sensor.film.w == 720
    # fov_axis=x conversion with square film: unchanged
    assert abs(scene.sensor.fov - 45.0) < 1e-4
    # look-at sensor: double handedness fix cancels; position (2,2,2)
    np.testing.assert_allclose(
        scene.sensor.transform.matrix[:3, 3], [2, 2, 2], atol=1e-6
    )
    shapes = {i.shape.type for i in scene.shape_instances}
    assert ShapeType.SPHERE in shapes and ShapeType.RECTANGLE in shapes
    # checkerboard texture with uv scale 200
    floor = next(i for i in scene.shape_instances if i.name == "Floor")
    tex = floor.material.reflectance
    assert tex.type == TextureType.CHECKERBOARD
    assert tex.transform.matrix[0, 0] == 200.0
    np.testing.assert_allclose(tex.patch1, [0.8, 0.8, 0.8])  # color0 -> patch1


def test_mis_scene(reference_scene_dir):
    scene = load_scene(reference_scene_dir / "mis.xml")
    assert scene.sensor.film.w == 1280 and scene.sensor.film.h == 720
    # fov_axis=x with aspect 720/1280: fov_y < 35
    assert scene.sensor.fov < 35.0
    rough = [
        i
        for i in scene.shape_instances
        if i.material.type == MatType.ROUGH_CONDUCTOR
    ]
    assert len(rough) == 4
    alphas = sorted(float(i.material.alpha.rgb[0]) for i in rough)
    np.testing.assert_allclose(alphas, [0.01, 0.05, 0.1, 0.25], rtol=1e-6)
    # sphere emitters: radius folded into transform scale
    spheres = [i for i in scene.shape_instances if i.shape.type == ShapeType.SPHERE]
    assert len(spheres) == 3
    r_by_name = {i.name: float(i.transform.matrix[0, 0]) for i in spheres}
    assert abs(r_by_name["Null_0001"] - 1.0) < 1e-6
    assert abs(r_by_name["Null_0003"] - 0.05) < 1e-6
    # center in translation column
    c = next(i for i in spheres if i.name == "Null_0002").transform.matrix[:3, 3]
    np.testing.assert_allclose(c, [0, 6.5, 0], atol=1e-6)


def test_all_reference_scenes_parse(reference_scene_dir):
    for name in (
        "cornellbox.xml",
        "default.xml",
        "mis.xml",
        "material_test.xml",
    ):
        scene = load_scene(reference_scene_dir / name)
        assert scene.shape_instances


def test_material_test_has_many_types(reference_scene_dir):
    scene = load_scene(reference_scene_dir / "material_test.xml")
    types = {i.material.type for i in scene.shape_instances}
    assert MatType.DIFFUSE in types
    assert len(types) >= 3


def test_anisotropic_alpha_parse(tmp_path):
    """alpha_u/alpha_v load into the alpha texture's r/g and flag the
    material anisotropic (beyond the reference, which ships the
    float2-alpha GGX math unused — ggx.h:66-103)."""
    xml = """<scene version="3.0.0">
      <sensor type="perspective"><float name="fov" value="40"/>
        <film type="hdrfilm"><integer name="width" value="8"/>
          <integer name="height" value="8"/></film>
      </sensor>
      <shape type="rectangle">
        <bsdf type="roughconductor">
          <string name="material" value="Au"/>
          <float name="alpha_u" value="0.5"/>
          <float name="alpha_v" value="0.05"/>
        </bsdf>
      </shape>
      <shape type="rectangle">
        <bsdf type="roughconductor">
          <string name="material" value="Au"/>
          <float name="alpha" value="0.2"/>
        </bsdf>
      </shape>
    </scene>"""
    p = tmp_path / "aniso.xml"
    p.write_text(xml)
    scene = load_scene(p)
    aniso = scene.shape_instances[0].material
    iso = scene.shape_instances[1].material
    assert aniso.anisotropic and not iso.anisotropic
    np.testing.assert_allclose(aniso.alpha.rgb[:2], [0.5, 0.05], rtol=1e-6)
    np.testing.assert_allclose(iso.alpha.rgb[:3], [0.2, 0.2, 0.2], rtol=1e-6)

    # flattened: MAT_ANISO set, LocalBsdf resolves alpha_v per material
    from pupiloptixlab_tpu.flatten import flatten_scene
    from pupiloptixlab_tpu.flatten.types import MAT_ANISO
    from pupiloptixlab_tpu.render import bsdf as B
    from pupiloptixlab_tpu.render.vec import Vec2

    data, config = flatten_scene(scene)
    packed = np.asarray(data.materials.packed)
    assert set(packed[:, MAT_ANISO]) >= {0.0, 1.0}
    mat_ids = jnp.asarray(
        [np.argmax(packed[:, MAT_ANISO]), np.argmin(packed[:, MAT_ANISO])],
        jnp.int32,
    )
    uv = Vec2(jnp.zeros(2), jnp.zeros(2))
    local = B.get_local_bsdf(
        data.materials, data.textures, mat_ids, uv, config.mat_types,
        config.mat_tex_kinds, config.mat_tex_filters,
    )
    np.testing.assert_allclose(np.asarray(local.alpha), [0.5, 0.2], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(local.alpha_v), [0.05, 0.2], rtol=1e-5)
