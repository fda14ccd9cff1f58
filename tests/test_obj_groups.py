"""Multi-group OBJ + MTL import (beyond the reference's single-mesh
assimp import, resource/shape.cpp:219-278)."""

from __future__ import annotations

import textwrap

import numpy as np
import pytest

from pupiloptixlab_tpu.scene import load_scene
from pupiloptixlab_tpu.scene.materials import MatType
from pupiloptixlab_tpu.scene.shapes import load_obj_groups, parse_mtl

OBJ = textwrap.dedent("""\
    mtllib two.mtl
    v -1 0 -1
    v  1 0 -1
    v  1 0  1
    v -1 0  1
    v -1 1 -1
    v  1 1 -1
    v  1 1  1
    v -1 1  1
    g floor
    usemtl matte
    f 1 2 3
    f 1 3 4
    g lid
    usemtl shiny
    f 5 6 7
    f 5 7 8
""")

MTL = textwrap.dedent("""\
    newmtl matte
    Kd 0.7 0.2 0.1
    newmtl shiny
    Kd 0.1 0.2 0.7
    Ks 0.9 0.9 0.9
    Ns 120
""")

XML = textwrap.dedent("""\
    <scene version="3.0.0">
        <integrator type="path"><integer name="max_depth" value="2" /></integrator>
        <sensor type="perspective">
            <float name="fov" value="60" />
            <transform name="to_world">
                <lookat origin="0, 2, 4" target="0, 0.5, 0" up="0, 1, 0"/>
            </transform>
            <film type="hdrfilm">
                <integer name="width" value="32" />
                <integer name="height" value="32" />
            </film>
        </sensor>
        <shape type="obj">
            <string name="filename" value="two.obj" />
            <boolean name="split_groups" value="true" />
        </shape>
        <emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
    </scene>
""")


@pytest.fixture()
def scene_dir(tmp_path):
    (tmp_path / "two.obj").write_text(OBJ)
    (tmp_path / "two.mtl").write_text(MTL)
    (tmp_path / "scene.xml").write_text(XML)
    return tmp_path


def test_load_obj_groups_splits(scene_dir):
    groups, mtllib = load_obj_groups(scene_dir / "two.obj")
    assert mtllib == "two.mtl"
    names = {(g, m) for g, m, _ in groups}
    assert names == {("floor", "matte"), ("lid", "shiny")}
    for _, _, mesh in groups:
        assert mesh.positions.shape == (4, 3)
        assert mesh.indices.shape == (2, 3)


def test_parse_mtl(scene_dir):
    mats = parse_mtl(scene_dir / "two.mtl")
    assert mats["matte"]["Kd"] == (0.7, 0.2, 0.1)
    assert mats["shiny"]["Ns"] == 120.0


def test_scene_expands_groups_with_materials(scene_dir):
    scene = load_scene(scene_dir / "scene.xml")
    by_name = {i.name: i for i in scene.shape_instances}
    assert len(by_name) == 2
    floor = next(v for k, v in by_name.items() if k.endswith("/floor"))
    lid = next(v for k, v in by_name.items() if k.endswith("/lid"))
    assert floor.material.type == MatType.DIFFUSE
    assert np.allclose(floor.material.reflectance.rgb, [0.7, 0.2, 0.1])
    assert lid.material.type == MatType.ROUGH_PLASTIC
    assert np.allclose(lid.material.specular_reflectance.rgb, [0.9, 0.9, 0.9])


def test_group_scene_renders(scene_dir):
    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render

    scene = load_scene(scene_dir / "scene.xml")
    data, config = flatten_scene(scene)
    camera = camera_block_from_scene(scene)
    img = np.asarray(render(data, camera, config, spp=2))
    assert np.isfinite(img).all() and img.max() > 0.0