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
    assert lin.curve_basis == "linear"
    bsp = scene.shape_instances[1].shape
    assert bsp.curve_basis == "bspline3"
    # linear: 2 segments; cubic b-spline: 4 cvs = ONE span (OptiX window
    # semantics) tessellated to 8 rounded cones
    assert config.curve_count == 2 + 8
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


class TestCurveBases:
    """The four builtin curve flavors (reference optix/module.h:20-29):
    spline math properties + intersection convergence vs a DENSE
    rounded-cone tessellation of the same spline."""

    # a wiggly 6-cv strand with varying radius
    CVS = np.array([
        [-1.0, 0.0, 0.0, 0.20],
        [-0.6, 0.5, 0.2, 0.16],
        [-0.2, -0.1, -0.2, 0.12],
        [0.2, 0.4, 0.1, 0.15],
        [0.6, -0.2, -0.1, 0.10],
        [1.0, 0.3, 0.0, 0.18],
    ], np.float32)

    def test_span_counts(self):
        from pupiloptixlab_tpu.scene.curves import tessellate

        p = self.CVS
        assert tessellate(p, "linear").shape == (6, 4)
        # quadratic: P-2 = 4 spans x 4 subdiv + 1
        assert tessellate(p, "bspline2", 4).shape == (17, 4)
        # cubic / catmullrom: P-3 = 3 spans x 4 subdiv + 1
        assert tessellate(p, "bspline3", 4).shape == (13, 4)
        assert tessellate(p, "catmullrom", 4).shape == (13, 4)

    def test_partition_of_unity_and_hull(self):
        """B-spline bases sum to 1 and stay in the control hull; the
        affine-invariance every basis must satisfy."""
        from pupiloptixlab_tpu.scene.curves import (
            _catmullrom_coeffs,
            _cubic_bspline_coeffs,
            _quadratic_bspline_coeffs,
        )

        t = np.linspace(0, 1, 33)
        for fn in (_quadratic_bspline_coeffs, _cubic_bspline_coeffs,
                   _catmullrom_coeffs):
            np.testing.assert_allclose(fn(t).sum(0), 1.0, atol=1e-6)
        # b-splines (not CR) additionally have non-negative weights ->
        # convex hull property
        for fn in (_quadratic_bspline_coeffs, _cubic_bspline_coeffs):
            assert fn(t).min() >= -1e-7

    def test_catmullrom_interpolates_bspline_approximates(self):
        from pupiloptixlab_tpu.scene.curves import tessellate

        cr = tessellate(self.CVS, "catmullrom", 8)
        # CR span i starts exactly at cv i+1 and ends at cv i+2
        np.testing.assert_allclose(cr[0], self.CVS[1], atol=1e-6)
        np.testing.assert_allclose(cr[-1], self.CVS[-2], atol=1e-6)
        np.testing.assert_allclose(cr[8], self.CVS[2], atol=1e-6)
        # cubic b-spline does NOT pass through interior cvs
        bs = tessellate(self.CVS, "bspline3", 8)
        assert np.abs(bs[8] - self.CVS[2]).max() > 1e-3
        # ... but starts at the well-known (p0 + 4 p1 + p2)/6 point
        np.testing.assert_allclose(
            bs[0], (self.CVS[0] + 4 * self.CVS[1] + self.CVS[2]) / 6.0,
            atol=1e-6,
        )

    def test_quadratic_bspline_midpoints(self):
        from pupiloptixlab_tpu.scene.curves import tessellate

        q = tessellate(self.CVS, "bspline2", 2)
        # span endpoints of a uniform quadratic b-spline are the cv
        # midpoints
        np.testing.assert_allclose(
            q[0], 0.5 * (self.CVS[0] + self.CVS[1]), atol=1e-6
        )
        np.testing.assert_allclose(
            q[2], 0.5 * (self.CVS[1] + self.CVS[2]), atol=1e-6
        )

    @pytest.mark.parametrize("basis", ["bspline2", "bspline3", "catmullrom"])
    def test_intersection_converges_to_dense_tessellation(
        self, basis, tmp_path
    ):
        """Render-facing gate: hit distances of the production subdiv=8
        tessellation match a 64x dense rounded-cone tessellation of the
        SAME spline to within the max radius step per segment."""
        from pupiloptixlab_tpu.accel.intersect import intersect_closest
        from pupiloptixlab_tpu.flatten import flatten_scene
        from pupiloptixlab_tpu.render.vec import Vec3
        from pupiloptixlab_tpu.scene import load_scene
        from pupiloptixlab_tpu.scene.curves import tessellate

        stype = {"bspline2": "bsplinecurve", "bspline3": "bsplinecurve",
                 "catmullrom": "catmullromcurve"}[basis]
        deg = '<integer name="degree" value="2"/>' if basis == "bspline2" else ""
        pts = "; ".join(",".join(f"{v}" for v in row) for row in self.CVS)
        xml = f"""<scene version="3.0.0">
          <integrator type="path"><integer name="max_depth" value="2"/></integrator>
          <sensor type="perspective"><float name="fov" value="40"/>
            <transform name="to_world">
              <lookat origin="0, 0, 4" target="0, 0, 0" up="0, 1, 0"/>
            </transform>
            <film type="hdrfilm"><integer name="width" value="16"/>
              <integer name="height" value="16"/></film>
          </sensor>
          <shape type="{stype}">{deg}
            <string name="points" value="{pts}"/>
            <bsdf type="diffuse"><rgb name="reflectance" value="0.5, 0.5, 0.5"/></bsdf>
          </shape>
        </scene>"""
        p = tmp_path / "c.xml"
        p.write_text(xml)
        scene = load_scene(p)
        assert scene.shape_instances[0].shape.curve_basis == basis
        data, config = flatten_scene(scene)

        # dense reference: hand-build a linear curve from a 64-subdiv
        # tessellation of the same spline
        dense = tessellate(self.CVS, basis, 64)
        pts_d = "; ".join(
            ",".join(f"{v:.9g}" for v in row) for row in dense
        )
        xml_d = xml.replace(
            f'<shape type="{stype}">{deg}', '<shape type="linearcurve">'
        ).replace(pts, pts_d)
        pd = tmp_path / "d.xml"
        pd.write_text(xml_d)
        scene_d = load_scene(pd)
        data_d, config_d = flatten_scene(scene_d)

        # a fan of rays from above, crossing the strand
        n = 64
        xs = jnp.linspace(-1.0, 1.0, n)
        ro = Vec3(xs, jnp.full(n, 0.05), jnp.full(n, 3.0))
        rd = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, -1.0))
        tmn = jnp.full(n, 1e-3)
        tmx = jnp.full(n, 1e16)
        h8 = intersect_closest(ro, rd, tmn, tmx, data, config)
        hd = intersect_closest(ro, rd, tmn, tmx, data_d, config_d)
        m8 = np.asarray(h8.hit_mask)
        md = np.asarray(hd.hit_mask)
        # tessellation can flip grazing hits; interior hits must agree
        both = m8 & md
        assert both.sum() >= max(m8.sum(), md.sum()) - 6
        assert both.any()
        err = np.abs(np.asarray(h8.t)[both] - np.asarray(hd.t)[both])
        assert err.max() < 0.02, err.max()


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
