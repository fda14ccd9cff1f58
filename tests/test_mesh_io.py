"""PLY + glTF/GLB import (mesh breadth beyond the reference's assimp).

Fixtures are generated in-test: a quad written as ascii PLY, binary PLY,
glTF+bin, and GLB must all load to the same geometry, and a PLY shape
must render through the XML scene path.
"""

import base64
import json
import struct
import textwrap

import numpy as np
import pytest

from pupiloptixlab_tpu.scene.mesh_io import load_gltf, load_ply

QUAD_POS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
)
QUAD_NRM = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
QUAD_UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
QUAD_IDX = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)


def _write_ascii_ply(path):
    lines = [
        "ply", "format ascii 1.0",
        "comment made by tests",
        "element vertex 4",
        "property float x", "property float y", "property float z",
        "property float nx", "property float ny", "property float nz",
        "property float s", "property float t",
        "element face 2",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for i in range(4):
        row = list(QUAD_POS[i]) + list(QUAD_NRM[i]) + list(QUAD_UV[i])
        lines.append(" ".join(f"{v:g}" for v in row))
    lines.append("4 0 1 2 3")  # quad -> fan-triangulated
    lines.append("3 0 2 3")
    path.write_text("\n".join(lines) + "\n")


def _write_binary_ply(path):
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "property float u\nproperty float v\n"
        "element face 2\n"
        "property list uchar uint vertex_indices\n"
        "end_header\n"
    )
    body = b""
    for i in range(4):
        body += struct.pack(
            "<8f", *QUAD_POS[i], *QUAD_NRM[i], *QUAD_UV[i]
        )
    body += struct.pack("<B3I", 3, 0, 1, 2)
    body += struct.pack("<B3I", 3, 0, 2, 3)
    path.write_bytes(header.encode() + body)


def test_ascii_ply(tmp_path):
    p = tmp_path / "quad.ply"
    _write_ascii_ply(p)
    pos, nrm, uv, idx = load_ply(p)
    np.testing.assert_allclose(pos, QUAD_POS)
    np.testing.assert_allclose(nrm, QUAD_NRM)
    np.testing.assert_allclose(uv, QUAD_UV)
    # quad fan (0,1,2),(0,2,3) + the explicit triangle
    assert idx.shape == (3, 3)
    np.testing.assert_array_equal(idx[0], [0, 1, 2])
    np.testing.assert_array_equal(idx[1], [0, 2, 3])


def test_binary_ply(tmp_path):
    p = tmp_path / "quad_bin.ply"
    _write_binary_ply(p)
    pos, nrm, uv, idx = load_ply(p)
    np.testing.assert_allclose(pos, QUAD_POS)
    np.testing.assert_allclose(uv, QUAD_UV)
    np.testing.assert_array_equal(idx, QUAD_IDX)


def _gltf_doc(bin_len, uri):
    return {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [2.0, 0.0, 0.0]}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
            }]
        }],
        "buffers": [{"byteLength": bin_len, **({"uri": uri} if uri else {})}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 24},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5125, "count": 6, "type": "SCALAR"},
        ],
    }


def _gltf_bin():
    return (
        QUAD_POS.tobytes() + QUAD_NRM.tobytes() + QUAD_UV.tobytes()
        + QUAD_IDX.tobytes()
    )


def test_gltf_with_data_uri(tmp_path):
    raw = _gltf_bin()
    uri = "data:application/octet-stream;base64," + base64.b64encode(raw).decode()
    doc = _gltf_doc(len(raw), uri)
    p = tmp_path / "quad.gltf"
    p.write_text(json.dumps(doc))
    pos, nrm, uv, idx = load_gltf(p)
    # node translation [2,0,0] applied
    np.testing.assert_allclose(pos, QUAD_POS + [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(nrm, QUAD_NRM, atol=1e-6)
    np.testing.assert_array_equal(idx, QUAD_IDX)


def test_glb_container(tmp_path):
    raw = _gltf_bin()
    doc = json.dumps(_gltf_doc(len(raw), None)).encode()
    doc += b" " * ((4 - len(doc) % 4) % 4)
    raw += b"\0" * ((4 - len(raw) % 4) % 4)
    glb = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(doc) + 8 + len(raw))
    glb += struct.pack("<II", len(doc), 0x4E4F534A) + doc
    glb += struct.pack("<II", len(raw), 0x004E4942) + raw
    p = tmp_path / "quad.glb"
    p.write_bytes(glb)
    pos, nrm, uv, idx = load_gltf(p)
    np.testing.assert_allclose(pos, QUAD_POS + [2, 0, 0], atol=1e-6)
    np.testing.assert_array_equal(idx, QUAD_IDX)


def test_ply_shape_renders_through_xml(tmp_path):
    _write_ascii_ply(tmp_path / "quad.ply")
    xml = textwrap.dedent("""\
        <scene version="3.0.0">
          <integrator type="path"><integer name="max_depth" value="2"/></integrator>
          <sensor type="perspective">
            <float name="fov" value="60"/>
            <transform name="to_world">
              <lookat origin="0.5, 0.5, 2.5" target="0.5, 0.5, 0" up="0, 1, 0"/>
            </transform>
            <film type="hdrfilm">
              <integer name="width" value="16"/><integer name="height" value="16"/>
            </film>
          </sensor>
          <emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
          <shape type="ply" id="quad">
            <string name="filename" value="quad.ply"/>
            <bsdf type="diffuse"><rgb name="reflectance" value="0.5,0.5,0.5"/></bsdf>
          </shape>
        </scene>
    """)
    (tmp_path / "scene.xml").write_text(xml)

    from pupiloptixlab_tpu.flatten import camera_block_from_scene, flatten_scene
    from pupiloptixlab_tpu.render.integrator import render
    from pupiloptixlab_tpu.scene import load_scene

    scene = load_scene(tmp_path / "scene.xml")
    assert scene.shape_instances[0].shape.mesh.face_num == 3
    assert scene.shape_instances[0].flip_tex_coords is False  # ply default
    data, config = flatten_scene(scene)
    cam = camera_block_from_scene(scene)
    img = np.asarray(render(data, cam, config, spp=4))
    assert np.isfinite(img).all() and img.mean() > 0.1


def test_binary_stl(tmp_path):
    from pupiloptixlab_tpu.scene.mesh_io import load_stl

    tris = QUAD_POS[QUAD_IDX]  # (2, 3, 3)
    rec = b""
    for t in range(2):
        rec += struct.pack("<3f", 0, 0, 1)
        for v in range(3):
            rec += struct.pack("<3f", *tris[t, v])
        rec += struct.pack("<H", 0)
    # header deliberately starts with "solid": the size check must win
    data = b"solid binary-ambiguous".ljust(80, b"\0")
    data += struct.pack("<I", 2) + rec
    p = tmp_path / "quad.stl"
    p.write_bytes(data)
    pos, nrm, uv, idx = load_stl(p)
    assert pos.shape == (6, 3) and idx.shape == (2, 3)
    np.testing.assert_allclose(pos, tris.reshape(-1, 3))
    np.testing.assert_allclose(nrm, np.tile([[0, 0, 1]], (6, 1)))


def test_ascii_stl_zero_normals(tmp_path):
    from pupiloptixlab_tpu.scene.mesh_io import load_stl

    tris = QUAD_POS[QUAD_IDX]
    lines = ["solid quad"]
    for t in range(2):
        lines += ["facet normal 0 0 0", "outer loop"]
        lines += [f"vertex {v[0]:g} {v[1]:g} {v[2]:g}" for v in tris[t]]
        lines += ["endloop", "endfacet"]
    lines.append("endsolid quad")
    p = tmp_path / "quad_ascii.stl"
    p.write_text("\n".join(lines))
    pos, nrm, uv, idx = load_stl(p)
    np.testing.assert_allclose(pos, tris.reshape(-1, 3))
    # zero facet normals fall back to geometric normals
    np.testing.assert_allclose(nrm, np.tile([[0, 0, 1]], (6, 1)), atol=1e-6)


def test_collada_polylist_z_up(tmp_path):
    from pupiloptixlab_tpu.scene.mesh_io import load_dae

    # unit quad in the XY plane of a Z-up file, translated by +1 in Z
    # by its node: after Y-up conversion it lies in the XZ plane at y=1
    dae = """<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>Z_UP</up_axis></asset>
  <library_geometries>
    <geometry id="quad"><mesh>
      <source id="pos">
        <float_array id="pa" count="12">0 0 0 1 0 0 1 1 0 0 1 0</float_array>
        <technique_common><accessor source="#pa" count="4" stride="3">
          <param name="X" type="float"/><param name="Y" type="float"/>
          <param name="Z" type="float"/></accessor></technique_common>
      </source>
      <source id="nrm">
        <float_array id="na" count="3">0 0 1</float_array>
        <technique_common><accessor source="#na" count="1" stride="3"/>
        </technique_common>
      </source>
      <source id="uv">
        <float_array id="ua" count="8">0 0 1 0 1 1 0 1</float_array>
        <technique_common><accessor source="#ua" count="4" stride="2"/>
        </technique_common>
      </source>
      <vertices id="vv"><input semantic="POSITION" source="#pos"/></vertices>
      <polylist count="1">
        <input semantic="VERTEX" source="#vv" offset="0"/>
        <input semantic="NORMAL" source="#nrm" offset="1"/>
        <input semantic="TEXCOORD" source="#uv" offset="2"/>
        <vcount>4</vcount>
        <p>0 0 0  1 0 1  2 0 2  3 0 3</p>
      </polylist>
    </mesh></geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="scene">
      <node><translate>0 0 1</translate>
        <instance_geometry url="#quad"/></node>
    </visual_scene>
  </library_visual_scenes>
</COLLADA>"""
    p = tmp_path / "quad.dae"
    p.write_text(dae)
    pos, nrm, uv, idx = load_dae(p)
    assert idx.shape == (2, 3)  # fan-triangulated quad
    # Z_UP (x,y,z)+(0,0,1) -> Y-up (x, z+1, -y)
    expect = np.array(
        [[0, 1, 0], [1, 1, 0], [1, 1, -1], [0, 1, 0], [1, 1, -1], [0, 1, -1]],
        np.float32,
    )
    np.testing.assert_allclose(pos, expect, atol=1e-6)
    np.testing.assert_allclose(nrm, np.tile([[0, 1, 0]], (6, 1)), atol=1e-6)
    np.testing.assert_allclose(uv[0], [0, 0], atol=1e-6)
    np.testing.assert_allclose(uv[2], [1, 1], atol=1e-6)
