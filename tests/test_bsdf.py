"""BSDF correctness: sample/eval consistency, pdf normalization, energy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pupiloptixlab_tpu.render import bsdf as B
from pupiloptixlab_tpu.render import fresnel, ggx
from pupiloptixlab_tpu.render.sampling import normalize


def _local(n, mtype, **kw):
    d = dict(
        mtype=jnp.full(n, mtype, jnp.int32),
        twosided=jnp.zeros(n, bool),
        reflectance=jnp.full((n, 3), 0.6),
        specular=jnp.ones((n, 3)),
        transmittance=jnp.ones((n, 3)),
        eta3=jnp.full((n, 3), 0.2),
        k3=jnp.full((n, 3), 3.0),
        alpha=jnp.full(n, 0.3),
        eta=jnp.full(n, 1.5),
        int_fdr=jnp.full(n, 0.0),
        ssw=jnp.full(n, 0.5),
        nonlinear=jnp.zeros(n, bool),
    )
    for k, v in kw.items():
        d[k] = v
    return B.LocalBsdf(**d)


def _rand_wo(n, seed=0, upper=True):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if upper:
        v[:, 2] = np.abs(v[:, 2]) + 0.05
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.asarray(v)


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
    wi, f_s, pdf_s, lobe = B.sample(b, wo, u0, u1, u2)
    f_e, pdf_e = B.evaluate(b, wo, wi)
    nondelta = (np.asarray(lobe) & B.LOBE_DELTA) == 0
    valid = nondelta & (np.asarray(pdf_s) > 1e-5)
    assert valid.sum() > n // 4
    np.testing.assert_allclose(
        np.asarray(pdf_e)[valid], np.asarray(pdf_s)[valid], rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(f_e)[valid], np.asarray(f_s)[valid], rtol=2e-3, atol=1e-5
    )


@pytest.mark.parametrize("mtype", [B.DIFFUSE, B.ROUGH_CONDUCTOR, B.ROUGH_PLASTIC])
def test_pdf_normalizes(mtype):
    """MC integral of pdf over the hemisphere ~= lobe selection mass."""
    n = 200_000
    rng = np.random.RandomState(7)
    b = _local(n, mtype)
    wo = jnp.broadcast_to(normalize(jnp.array([0.3, 0.1, 0.8])), (n, 3))
    # uniform hemisphere directions
    u = rng.rand(n, 2)
    z = u[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    phi = 2 * np.pi * u[:, 1]
    wi = jnp.asarray(
        np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    )
    _, pdf = B.evaluate(b, wo, wi)
    integral = float(jnp.mean(pdf) * 2 * np.pi)  # 1/(uniform pdf) = 2pi
    # diffuse: 1; rough conductor: VNDF pdf integrates to <=1 over refl dirs;
    # rough plastic: spec_prob*ggx + (1-p)*cos, each normalized
    assert 0.8 < integral < 1.1


def test_diffuse_energy():
    n = 8
    b = _local(n, B.DIFFUSE)
    wo = _rand_wo(n)
    wi = _rand_wo(n, seed=3)
    f, pdf = B.evaluate(b, wo, wi)
    np.testing.assert_allclose(np.asarray(f), 0.6 / np.pi, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(wi[:, 2]) / np.pi, rtol=1e-5
    )


def test_conductor_delta():
    n = 16
    b = _local(n, B.CONDUCTOR)
    wo = _rand_wo(n)
    u0, u1, u2 = _uniforms(n)
    wi, f, pdf, lobe = B.sample(b, wo, u0, u1, u2)
    # mirror direction
    np.testing.assert_allclose(np.asarray(wi[:, 2]), np.asarray(wo[:, 2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(wi[:, 0]), -np.asarray(wo[:, 0]), atol=1e-6)
    assert np.all(np.asarray(pdf) == 1.0)
    assert np.all((np.asarray(lobe) & B.LOBE_DELTA) != 0)
    # eval is zero for delta
    f_e, pdf_e = B.evaluate(b, wo, wi)
    assert np.all(np.asarray(pdf_e) == 0.0)


def test_dielectric_snell_and_energy():
    n = 100_000
    b = _local(n, B.DIELECTRIC)
    wo = jnp.broadcast_to(normalize(jnp.array([0.5, 0.0, 0.6])), (n, 3))
    rng = np.random.RandomState(11)
    u0 = jnp.asarray(rng.rand(n).astype(np.float32))
    u1, u2 = _uniforms(n, seed=12)[:2]
    wi, f, pdf, lobe = B.sample(b, wo, u0, u1, u2)
    refr = (np.asarray(lobe) & B.LOBE_DELTA_TRANS) != 0
    assert refr.any() and (~refr).any()
    # Snell: sin_t = sin_i / eta for transmitted
    sin_i = np.linalg.norm(np.asarray(wo)[refr, :2], axis=-1)
    sin_t = np.linalg.norm(np.asarray(wi)[refr, :2], axis=-1)
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)
    # weight f*|wi.z|/pdf stays bounded (throughput scale)
    w = np.asarray(f)[:, 0] * np.abs(np.asarray(wi[:, 2])) / np.asarray(pdf)
    assert np.all(w < 2.3)  # eta^2 radiance scaling bound for entering rays


def test_fresnel_dielectric_limits():
    f0, _ = fresnel.dielectric_reflectance(jnp.array(1.5), jnp.array(1.0))
    np.testing.assert_allclose(float(f0), ((1.5 - 1) / (1.5 + 1)) ** 2, rtol=1e-5)
    fg, ct = fresnel.dielectric_reflectance(jnp.array(1.5), jnp.array(0.01))
    assert float(fg) > 0.9  # grazing
    # TIR from inside beyond critical angle
    ftir, ct2 = fresnel.dielectric_reflectance(jnp.array(1.5), jnp.array(-0.3))
    assert float(ftir) == 1.0 and float(ct2) == 0.0


def test_ggx_vndf_normalization():
    """The visible-normal density D(wh) G1(wo) <wo,wh>+ / wo.z integrates
    to 1 over the hemisphere (Heitz VNDF property). Uniform-sampled MC."""
    n = 400_000
    alpha = jnp.full(n, 0.4)
    wo = jnp.broadcast_to(normalize(jnp.array([0.4, 0.0, 0.7])), (n, 3))
    rng = np.random.RandomState(5)
    u = rng.rand(n, 2)
    z = u[:, 0]
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    phi = 2 * np.pi * u[:, 1]
    wh = jnp.asarray(
        np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    )
    density = ggx.pdf(wo, wh, alpha)  # D * G1 * <wo,wh> / wo.z
    density = jnp.maximum(density, 0.0)
    est = float(jnp.mean(density) * 2 * np.pi)
    assert est == pytest.approx(1.0, rel=0.05)


def test_rough_dielectric_transmission_direction():
    n = 50_000
    b = _local(n, B.ROUGH_DIELECTRIC, alpha=jnp.full(n, 0.05))
    wo = jnp.broadcast_to(normalize(jnp.array([0.2, 0.0, 0.9])), (n, 3))
    rng = np.random.RandomState(13)
    u0 = jnp.asarray(rng.rand(n).astype(np.float32))
    u1, u2 = _uniforms(n, seed=14)[:2]
    wi, f, pdf, lobe = B.sample(b, wo, u0, u1, u2)
    trans = (np.asarray(lobe) & B.LOBE_GLOSSY_TRANS) != 0
    ok = trans & (np.asarray(pdf) > 1e-6)
    assert ok.any()
    # transmitted rays go below the surface
    assert np.all(np.asarray(wi[:, 2])[ok] < 0)
