"""BSDF correctness: sample/eval consistency, pdf normalization, energy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.render import bsdf as B
from pupiloptixlab_tpu.render import fresnel, ggx
from pupiloptixlab_tpu.render.vec import Vec3


def _local(n, mtype, **kw):
    d = dict(
        mtype=jnp.full(n, mtype, jnp.int32),
        twosided=jnp.zeros(n, bool),
        reflectance=Vec3.full(n, 0.6, 0.6, 0.6),
        specular=Vec3.ones(n),
        transmittance=Vec3.ones(n),
        eta3=Vec3.full(n, 0.2, 0.2, 0.2),
        k3=Vec3.full(n, 3.0, 3.0, 3.0),
        alpha=jnp.full(n, 0.3),
        alpha_v=kw.get("alpha", jnp.full(n, 0.3)),
        eta=jnp.full(n, 1.5),
        int_fdr=jnp.full(n, 0.0),
        ssw=jnp.full(n, 0.5),
        nonlinear=jnp.zeros(n, bool),
        dispersion=jnp.zeros(n),
    )
    for k, v in kw.items():
        d[k] = v
    return B.LocalBsdf(**d)


def _vec_np(v: Vec3):
    return np.stack([np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)], -1)


def _rand_wo(n, seed=0, upper=True):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if upper:
        v[:, 2] = np.abs(v[:, 2]) + 0.05
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return Vec3(jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1]), jnp.asarray(v[:, 2]))


def _uniforms(n, seed=1):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.rand(n).astype(np.float32)) for _ in range(3)]


@pytest.mark.parametrize(
    "mtype",
    [B.DIFFUSE, B.ROUGH_CONDUCTOR, B.PLASTIC, B.ROUGH_PLASTIC, B.ROUGH_DIELECTRIC],
)
def test_sample_eval_consistency(mtype):
    """For non-delta lobes, evaluate(wo, sampled wi) must reproduce the
    sample's f and pdf (the reference's Sample calls GetPdf+GetBsdf)."""
    n = 4096
    b = _local(n, mtype)
    wo = _rand_wo(n)
    u0, u1, u2 = _uniforms(n)
    wi, f_s, pdf_s, lobe = B.sample(b, wo, u0, u1, u2, mat_types=(mtype,))
    f_e, pdf_e = B.evaluate(b, wo, wi, mat_types=(mtype,))
    nondelta = (np.asarray(lobe) & B.LOBE_DELTA) == 0
    valid = nondelta & (np.asarray(pdf_s) > 1e-5)
    assert valid.sum() > n // 4
    np.testing.assert_allclose(
        np.asarray(pdf_e)[valid], np.asarray(pdf_s)[valid], rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        _vec_np(f_e)[valid], _vec_np(f_s)[valid], rtol=2e-3, atol=1e-5
    )


@pytest.mark.parametrize("mtype", [B.DIFFUSE, B.ROUGH_CONDUCTOR, B.ROUGH_PLASTIC])
def test_pdf_normalizes(mtype):
    """MC integral of pdf over the hemisphere ~= lobe selection mass."""
    n = 200_000
    rng = np.random.RandomState(7)
    b = _local(n, mtype)
    wo_dir = np.array([0.3, 0.1, 0.8])
    wo_dir /= np.linalg.norm(wo_dir)
    wo = Vec3.full(n, *wo_dir)
    u = rng.rand(n, 2)
    z = u[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    phi = 2 * np.pi * u[:, 1]
    wi = Vec3(
        jnp.asarray((r * np.cos(phi)).astype(np.float32)),
        jnp.asarray((r * np.sin(phi)).astype(np.float32)),
        jnp.asarray(z.astype(np.float32)),
    )
    _, pdf = B.evaluate(b, wo, wi, mat_types=(mtype,))
    integral = float(jnp.mean(pdf) * 2 * np.pi)
    assert 0.8 < integral < 1.1


def test_diffuse_energy():
    n = 8
    b = _local(n, B.DIFFUSE)
    wo = _rand_wo(n)
    wi = _rand_wo(n, seed=3)
    f, pdf = B.evaluate(b, wo, wi, mat_types=(B.DIFFUSE,))
    np.testing.assert_allclose(_vec_np(f), 0.6 / np.pi, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(wi.z) / np.pi, rtol=1e-5)


def test_conductor_delta():
    n = 16
    b = _local(n, B.CONDUCTOR)
    wo = _rand_wo(n)
    u0, u1, u2 = _uniforms(n)
    wi, f, pdf, lobe = B.sample(b, wo, u0, u1, u2, mat_types=(B.CONDUCTOR,))
    np.testing.assert_allclose(np.asarray(wi.z), np.asarray(wo.z), atol=1e-6)
    np.testing.assert_allclose(np.asarray(wi.x), -np.asarray(wo.x), atol=1e-6)
    assert np.all(np.asarray(pdf) == 1.0)
    assert np.all((np.asarray(lobe) & B.LOBE_DELTA) != 0)
    f_e, pdf_e = B.evaluate(b, wo, wi, mat_types=(B.CONDUCTOR,))
    assert np.all(np.asarray(pdf_e) == 0.0)


def test_dielectric_snell_and_energy():
    n = 100_000
    b = _local(n, B.DIELECTRIC)
    wo_dir = np.array([0.5, 0.0, 0.6])
    wo_dir /= np.linalg.norm(wo_dir)
    wo = Vec3.full(n, *wo_dir)
    rng = np.random.RandomState(11)
    u0 = jnp.asarray(rng.rand(n).astype(np.float32))
    u1, u2 = _uniforms(n, seed=12)[:2]
    wi, f, pdf, lobe = B.sample(b, wo, u0, u1, u2, mat_types=(B.DIELECTRIC,))
    refr = (np.asarray(lobe) & B.LOBE_DELTA_TRANS) != 0
    assert refr.any() and (~refr).any()
    wi_np = _vec_np(wi)
    wo_np = _vec_np(wo)
    sin_i = np.linalg.norm(wo_np[refr, :2], axis=-1)
    sin_t = np.linalg.norm(wi_np[refr, :2], axis=-1)
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)
    w = _vec_np(f)[:, 0] * np.abs(wi_np[:, 2]) / np.asarray(pdf)
    assert np.all(w < 2.3)  # eta^2 radiance scaling bound for entering rays


def test_fresnel_dielectric_limits():
    f0, _ = fresnel.dielectric_reflectance(jnp.array(1.5), jnp.array(1.0))
    np.testing.assert_allclose(float(f0), ((1.5 - 1) / (1.5 + 1)) ** 2, rtol=1e-5)
    fg, ct = fresnel.dielectric_reflectance(jnp.array(1.5), jnp.array(0.01))
    assert float(fg) > 0.9  # grazing
    ftir, ct2 = fresnel.dielectric_reflectance(jnp.array(1.5), jnp.array(-0.3))
    assert float(ftir) == 1.0 and float(ct2) == 0.0


def test_ggx_vndf_normalization():
    """The visible-normal density D(wh) G1(wo) <wo,wh>+ / wo.z integrates
    to 1 over the hemisphere (Heitz VNDF property). Uniform-sampled MC."""
    n = 400_000
    alpha = jnp.full(n, 0.4)
    wo_dir = np.array([0.4, 0.0, 0.7])
    wo_dir /= np.linalg.norm(wo_dir)
    wo = Vec3.full(n, *wo_dir)
    rng = np.random.RandomState(5)
    u = rng.rand(n, 2)
    z = u[:, 0]
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    phi = 2 * np.pi * u[:, 1]
    wh = Vec3(
        jnp.asarray((r * np.cos(phi)).astype(np.float32)),
        jnp.asarray((r * np.sin(phi)).astype(np.float32)),
        jnp.asarray(z.astype(np.float32)),
    )
    density = jnp.maximum(ggx.pdf(wo, wh, alpha), 0.0)
    est = float(jnp.mean(density) * 2 * np.pi)
    assert est == pytest.approx(1.0, rel=0.05)


def test_ggx_aniso_vndf_normalization():
    """Anisotropic VNDF density also integrates to 1 (Heitz float2-alpha
    math — the reference ships it unused at ggx.h:66-103)."""
    n = 400_000
    au = jnp.full(n, 0.6)
    av = jnp.full(n, 0.1)
    wo_dir = np.array([0.4, 0.3, 0.6])
    wo_dir /= np.linalg.norm(wo_dir)
    wo = Vec3.full(n, *wo_dir)
    rng = np.random.RandomState(11)
    u = rng.rand(n, 2)
    z = u[:, 0]
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    phi = 2 * np.pi * u[:, 1]
    wh = Vec3(
        jnp.asarray((r * np.cos(phi)).astype(np.float32)),
        jnp.asarray((r * np.sin(phi)).astype(np.float32)),
        jnp.asarray(z.astype(np.float32)),
    )
    density = jnp.maximum(ggx.pdf(wo, wh, au, av), 0.0)
    est = float(jnp.mean(density) * 2 * np.pi)
    assert est == pytest.approx(1.0, rel=0.05)
    # D itself must satisfy the projected-area normalization too
    d_proj = jnp.maximum(ggx.d(wh, au, av) * wh.z, 0.0)
    est_d = float(jnp.mean(d_proj) * 2 * np.pi)
    assert est_d == pytest.approx(1.0, rel=0.05)


@pytest.mark.parametrize(
    "mtype", [B.ROUGH_CONDUCTOR, B.ROUGH_PLASTIC, B.ROUGH_DIELECTRIC]
)
def test_sample_eval_consistency_aniso(mtype):
    """Anisotropic alpha: evaluate(wo, sampled wi) reproduces the
    sample's f and pdf, and stretching is direction-dependent."""
    n = 4096
    b = _local(n, mtype, alpha=jnp.full(n, 0.5), alpha_v=jnp.full(n, 0.08))
    wo = _rand_wo(n)
    u0, u1, u2 = _uniforms(n)
    wi, f_s, pdf_s, lobe = B.sample(b, wo, u0, u1, u2, mat_types=(mtype,))
    f_e, pdf_e = B.evaluate(b, wo, wi, mat_types=(mtype,))
    nondelta = (np.asarray(lobe) & B.LOBE_DELTA) == 0
    valid = nondelta & (np.asarray(pdf_s) > 1e-5)
    assert valid.sum() > n // 4
    np.testing.assert_allclose(
        np.asarray(pdf_e)[valid], np.asarray(pdf_s)[valid], rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        _vec_np(f_e)[valid], _vec_np(f_s)[valid], rtol=2e-3, atol=1e-5
    )
    # the sampled half-vectors must spread more along x (alpha_u=0.5)
    # than along y (alpha_v=0.08) for a near-normal wo
    wo_n = Vec3.full(n, 0.0, 0.0, 1.0)
    wh = B.ggx.sample(wo_n, b.alpha, u0, u1, b.alpha_v)
    assert float(jnp.std(wh.x)) > 2.0 * float(jnp.std(wh.y))


def test_rough_dielectric_transmission_direction():
    n = 50_000
    b = _local(n, B.ROUGH_DIELECTRIC, alpha=jnp.full(n, 0.05))
    wo_dir = np.array([0.2, 0.0, 0.9])
    wo_dir /= np.linalg.norm(wo_dir)
    wo = Vec3.full(n, *wo_dir)
    rng = np.random.RandomState(13)
    u0 = jnp.asarray(rng.rand(n).astype(np.float32))
    u1, u2 = _uniforms(n, seed=14)[:2]
    wi, f, pdf, lobe = B.sample(b, wo, u0, u1, u2, mat_types=(B.ROUGH_DIELECTRIC,))
    trans = (np.asarray(lobe) & B.LOBE_GLOSSY_TRANS) != 0
    ok = trans & (np.asarray(pdf) > 1e-6)
    assert ok.any()
    assert np.all(np.asarray(wi.z)[ok] < 0)
