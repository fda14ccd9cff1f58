"""The seven BSDFs with branchless dense-table dispatch.

Parity: render/material/bsdf/*.h + optix_material.h in the reference, with
the OptiX SBT/direct-callable dispatch (``optixDirectCall`` per material)
replaced by masked evaluation over the material-type lanes — every BSDF is
evaluated on the VPU and the per-lane result selected by ``mtype``. The
convention matches bsdf/bsdf.h:7-43: local shading frame (z-up),
``wo`` = toward viewer, ``wi`` = sampled/incident, ``f`` excludes the
cosine (the integrator multiplies by |wi.z|).

Sampling draws a fixed budget of 3 uniforms per lane (u_lobe, u1, u2) so
all lanes advance their RNG streams in lockstep.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from pupiloptixlab_tpu.flatten.types import (
    SLOT_ALPHA,
    SLOT_ETA,
    SLOT_K,
    SLOT_REFLECTANCE,
    SLOT_SPECULAR,
    SLOT_TRANSMITTANCE,
    MaterialTable,
    TextureTable,
)
from pupiloptixlab_tpu.render import fresnel, ggx
from pupiloptixlab_tpu.render.sampling import (
    cosine_hemisphere_pdf,
    cosine_sample_hemisphere,
    dot,
    normalize,
    reflect,
    reflect_z,
    refract,
    refract_z,
)
from pupiloptixlab_tpu.render.texture import sample_texture

# Material type ids (must match scene.materials.MatType).
DIFFUSE, DIELECTRIC, ROUGH_DIELECTRIC = 1, 2, 3
CONDUCTOR, ROUGH_CONDUCTOR, PLASTIC, ROUGH_PLASTIC = 4, 5, 6, 7

# Lobe flags (bsdf/bsdf.h EBsdfLobeType).
LOBE_NONE = 0
LOBE_DIFFUSE_REFL = 1
LOBE_GLOSSY_REFL = 2
LOBE_DELTA_REFL = 4
LOBE_DIFFUSE_TRANS = 8
LOBE_GLOSSY_TRANS = 16
LOBE_DELTA_TRANS = 32
LOBE_DELTA = LOBE_DELTA_REFL | LOBE_DELTA_TRANS

_TINY = 1e-12


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass
class LocalBsdf:
    """Per-lane shading params, textures sampled once at the hit uv
    (optix_material.h:95-107 GetLocalBsdf analog)."""

    mtype: jnp.ndarray        # (N,) i32
    twosided: jnp.ndarray     # (N,) bool
    reflectance: jnp.ndarray  # (N,3) diffuse/plastic diffuse reflectance
    specular: jnp.ndarray     # (N,3)
    transmittance: jnp.ndarray  # (N,3)
    eta3: jnp.ndarray         # (N,3) conductor eta
    k3: jnp.ndarray           # (N,3) conductor k
    alpha: jnp.ndarray        # (N,)
    eta: jnp.ndarray          # (N,) scalar ior ratio
    int_fdr: jnp.ndarray      # (N,)
    ssw: jnp.ndarray          # (N,)
    nonlinear: jnp.ndarray    # (N,) bool


def get_local_bsdf(
    materials: MaterialTable, textures: TextureTable, mat_id: jnp.ndarray, uv: jnp.ndarray
) -> LocalBsdf:
    tex_ids = materials.tex[mat_id]  # (N, N_SLOTS)
    return LocalBsdf(
        mtype=materials.mtype[mat_id],
        twosided=materials.twosided[mat_id],
        reflectance=sample_texture(textures, tex_ids[:, SLOT_REFLECTANCE], uv),
        specular=sample_texture(textures, tex_ids[:, SLOT_SPECULAR], uv),
        transmittance=sample_texture(textures, tex_ids[:, SLOT_TRANSMITTANCE], uv),
        eta3=sample_texture(textures, tex_ids[:, SLOT_ETA], uv),
        k3=sample_texture(textures, tex_ids[:, SLOT_K], uv),
        alpha=sample_texture(textures, tex_ids[:, SLOT_ALPHA], uv)[:, 0],
        eta=materials.eta[mat_id],
        int_fdr=materials.int_fdr[mat_id],
        ssw=materials.ssw[mat_id],
        nonlinear=materials.nonlinear[mat_id],
    )


def albedo(b: LocalBsdf) -> jnp.ndarray:
    """AOV albedo (optix_material.h:69-87)."""
    use_spec = (
        (b.mtype == DIELECTRIC)
        | (b.mtype == ROUGH_DIELECTRIC)
        | (b.mtype == CONDUCTOR)
        | (b.mtype == ROUGH_CONDUCTOR)
    )
    return jnp.where(use_spec[:, None], b.specular, b.reflectance)


def _safe_div(a, d):
    return a / jnp.where(jnp.abs(d) < _TINY, jnp.where(d < 0, -_TINY, _TINY), d)


def _spec_prob(b: LocalBsdf, f_o):
    """Plastic lobe-selection probability (plastic.h:47-51)."""
    num = f_o * b.ssw
    den = num + (1.0 - f_o) * (1.0 - b.ssw)
    return _safe_div(num, jnp.maximum(den, _TINY))


def _plastic_diff(b: LocalBsdf, f_i, f_o, wi_z):
    """Plastic diffuse term with internal-scattering compensation
    (plastic.h:38-39); includes cosine-pdf/ wi.z = 1/pi factor."""
    denom = 1.0 - jnp.where(
        b.nonlinear[:, None], b.reflectance * b.int_fdr[:, None], b.int_fdr[:, None]
    )
    diff = b.reflectance / jnp.maximum(denom, _TINY)
    scale = (1.0 - f_i) * (1.0 - f_o) * cosine_hemisphere_pdf_safe(wi_z) / (
        jnp.maximum(b.eta, _TINY) ** 2 * jnp.maximum(wi_z, _TINY)
    )
    return diff * scale[:, None]


def cosine_hemisphere_pdf_safe(wi_z):
    return jnp.where(wi_z > 0.0, wi_z / jnp.pi, 0.0)


# ---------------------------------------------------------------------------
# eval: f(wo, wi) and pdf(wo, wi) for NEE (GetBsdf + GetPdf per material)
# ---------------------------------------------------------------------------

def evaluate(b: LocalBsdf, wo: jnp.ndarray, wi: jnp.ndarray):
    """Returns (f (N,3), pdf (N,)). Delta materials return zeros."""
    wiz, woz = wi[:, 2], wo[:, 2]
    upper = (wiz > 0.0) & (woz > 0.0)

    # diffuse (diffuse.h:14-27)
    f_diffuse = jnp.where(upper[:, None], b.reflectance / jnp.pi, 0.0)
    pdf_diffuse = jnp.where(upper, cosine_hemisphere_pdf_safe(wiz), 0.0)

    # rough conductor (rough_conductor.h:20-38)
    wh = normalize(wi + wo)
    fr_cond = fresnel.conductor_reflectance_rgb(b.eta3, b.k3, dot(wo, wh))
    d_val = ggx.d(wh, b.alpha)
    g_val = ggx.g(wi, wo, b.alpha)
    f_rc = b.specular * (d_val * g_val)[:, None] * fr_cond / jnp.maximum(
        4.0 * wiz * woz, _TINY
    )[:, None]
    pdf_rc = ggx.pdf(wo, wh, b.alpha) / jnp.maximum(4.0 * dot(wo, wh), _TINY)
    f_rc = jnp.where(upper[:, None], f_rc, 0.0)
    pdf_rc = jnp.where(upper, pdf_rc, 0.0)

    # rough dielectric (rough_dielectric.h:21-72)
    f_rd, pdf_rd = _rough_dielectric_eval(b, wo, wi)

    # plastic (plastic.h:32-54)
    f_o, _ = fresnel.dielectric_reflectance(b.eta, woz)
    f_i, _ = fresnel.dielectric_reflectance(b.eta, wiz)
    f_pl = jnp.where(upper[:, None], _plastic_diff(b, f_i, f_o, wiz), 0.0)
    sp = _spec_prob(b, f_o)
    pdf_pl = jnp.where(upper, cosine_hemisphere_pdf_safe(wiz) * (1.0 - sp), 0.0)

    # rough plastic (rough_plastic.h:30-61)
    fr_rp = fresnel.dielectric_reflectance(b.eta, dot(wh, wo))[0]
    spec_rp = b.specular * (fr_rp * d_val * g_val)[:, None] / jnp.maximum(
        4.0 * woz * wiz, _TINY
    )[:, None]
    diff_rp = (
        b.reflectance
        / jnp.maximum(
            1.0
            - jnp.where(
                b.nonlinear[:, None],
                b.reflectance * b.int_fdr[:, None],
                b.int_fdr[:, None],
            ),
            _TINY,
        )
        * ((1.0 - f_i) * (1.0 - f_o) / jnp.pi / jnp.maximum(b.eta**2, _TINY))[:, None]
    )
    f_rp = jnp.where(upper[:, None], spec_rp + diff_rp, 0.0)
    pdf_rp = sp * ggx.pdf(wo, wh, b.alpha) / jnp.maximum(4.0 * dot(wi, wh), _TINY)
    pdf_rp = pdf_rp + (1.0 - sp) * cosine_hemisphere_pdf_safe(wiz)
    pdf_rp = jnp.where(upper, pdf_rp, 0.0)

    zero3 = jnp.zeros_like(f_diffuse)
    zero = jnp.zeros_like(pdf_diffuse)
    t = b.mtype
    f = jnp.where((t == DIFFUSE)[:, None], f_diffuse, zero3)
    f = jnp.where((t == ROUGH_CONDUCTOR)[:, None], f_rc, f)
    f = jnp.where((t == ROUGH_DIELECTRIC)[:, None], f_rd, f)
    f = jnp.where((t == PLASTIC)[:, None], f_pl, f)
    f = jnp.where((t == ROUGH_PLASTIC)[:, None], f_rp, f)
    pdf = jnp.where(t == DIFFUSE, pdf_diffuse, zero)
    pdf = jnp.where(t == ROUGH_CONDUCTOR, pdf_rc, pdf)
    pdf = jnp.where(t == ROUGH_DIELECTRIC, pdf_rd, pdf)
    pdf = jnp.where(t == PLASTIC, pdf_pl, pdf)
    pdf = jnp.where(t == ROUGH_PLASTIC, pdf_rp, pdf)
    # conductor / dielectric: delta lobes -> f = 0, pdf = 0
    return f, pdf


def _rough_dielectric_wh(b, wo, wi):
    reflect_side = wo[:, 2] * wi[:, 2] > 0.0
    eta_w = jnp.where(wo[:, 2] > 0.0, b.eta, 1.0 / jnp.maximum(b.eta, _TINY))
    wh_r = wo + wi
    wh_t = wo + wi * eta_w[:, None]
    wh = normalize(jnp.where(reflect_side[:, None], wh_r, wh_t))
    wh = wh * jnp.where(wh[:, 2] > 0.0, 1.0, -1.0)[:, None]
    return wh, reflect_side, eta_w


def _rough_dielectric_eval(b, wo, wi):
    wiz, woz = wi[:, 2], wo[:, 2]
    wh, reflect_side, eta_w = _rough_dielectric_wh(b, wo, wi)

    f_term, _ = fresnel.dielectric_reflectance(b.eta, dot(wo, wh))
    g_val = ggx.g(wi, wo, b.alpha)
    d_val = ggx.d(wh, b.alpha)

    f_reflect = b.specular * (f_term * g_val * d_val)[:, None] / jnp.maximum(
        4.0 * jnp.abs(wiz) * jnp.abs(woz), _TINY
    )[:, None]

    idoth = dot(wi, wh)
    odoth = dot(wo, wh)
    sqrt_denom = odoth + eta_w * idoth
    f_transmit = b.transmittance * jnp.abs(
        (1.0 - f_term) * d_val * g_val * idoth * odoth
        / jnp.where(
            jnp.abs(sqrt_denom**2 * wiz * woz) < _TINY,
            _TINY,
            sqrt_denom**2 * wiz * woz,
        )
    )[:, None]

    f = jnp.where(reflect_side[:, None], f_reflect, f_transmit)
    f = jnp.where((jnp.abs(woz) < 1e-6)[:, None], 0.0, f)

    # pdf (rough_dielectric.h:51-72)
    dwh_dwo_r = 1.0 / jnp.where(jnp.abs(4.0 * idoth) < _TINY, _TINY, 4.0 * idoth)
    dwh_dwo_t = (eta_w**2 * idoth) / jnp.where(
        sqrt_denom**2 < _TINY, _TINY, sqrt_denom**2
    )
    dwh_dwo = jnp.where(reflect_side, dwh_dwo_r, dwh_dwo_t)
    wo_up = wo * jnp.where(woz > 0.0, 1.0, -1.0)[:, None]
    pdf = jnp.abs(
        ggx.pdf(wo_up, wh, b.alpha)
        * jnp.where(reflect_side, f_term, 1.0 - f_term)
        * dwh_dwo
    )
    return f, pdf


# ---------------------------------------------------------------------------
# sample: (wi, f, pdf, lobe) given 3 uniforms
# ---------------------------------------------------------------------------

def sample(b: LocalBsdf, wo: jnp.ndarray, u_lobe, u1, u2):
    """Returns (wi (N,3), f (N,3), pdf (N,), lobe (N,) i32)."""
    woz = wo[:, 2]
    n = wo.shape[0]
    t = b.mtype

    # --- diffuse -----------------------------------------------------------
    wi_dif = cosine_sample_hemisphere(u1, u2)
    f_dif, pdf_dif = _masked_eval_single(b, wo, wi_dif, DIFFUSE)
    lobe_dif = jnp.full(n, LOBE_DIFFUSE_REFL, jnp.int32)

    # --- conductor (conductor.h:27-35) --------------------------------------
    wi_con = reflect_z(wo)
    fr = fresnel.conductor_reflectance_rgb(b.eta3, b.k3, woz)
    f_con = b.specular * fr / jnp.maximum(jnp.abs(wi_con[:, 2]), _TINY)[:, None]
    pdf_con = jnp.ones(n, jnp.float32)
    lobe_con = jnp.full(n, LOBE_DELTA_REFL, jnp.int32)

    # --- dielectric (dielectric.h:28-44) -------------------------------------
    f_term, cos_t = fresnel.dielectric_reflectance(b.eta, woz)
    take_refl = u_lobe < f_term
    wi_refl = reflect_z(wo)
    wi_refr = refract_z(wo, cos_t, b.eta)
    wi_die = jnp.where(take_refl[:, None], wi_refl, wi_refr)
    factor = jnp.where(cos_t < 0.0, 1.0 / jnp.maximum(b.eta, _TINY), b.eta)
    f_die = jnp.where(
        take_refl[:, None],
        b.specular * f_term[:, None],
        b.transmittance * ((1.0 - f_term) * factor * factor)[:, None],
    ) / jnp.maximum(jnp.abs(wi_die[:, 2]), _TINY)[:, None]
    pdf_die = jnp.where(take_refl, f_term, 1.0 - f_term)
    lobe_die = jnp.where(take_refl, LOBE_DELTA_REFL, LOBE_DELTA_TRANS).astype(jnp.int32)

    # --- rough conductor -----------------------------------------------------
    wh_rc = ggx.sample(wo, b.alpha, u1, u2)
    wi_rc = reflect(wo, wh_rc)
    f_rc, pdf_rc = _masked_eval_single(b, wo, wi_rc, ROUGH_CONDUCTOR)
    lobe_rc = jnp.full(n, LOBE_GLOSSY_REFL, jnp.int32)

    # --- rough dielectric (rough_dielectric.h:74-97) -------------------------
    wo_up = wo * jnp.where(woz > 0.0, 1.0, -1.0)[:, None]
    wh_rd = ggx.sample(wo_up, b.alpha, u1, u2)
    f_rd_term, cos_t_rd = fresnel.dielectric_reflectance(b.eta, dot(wo, wh_rd))
    take_refl_rd = u_lobe < f_rd_term
    wi_rd_refl = reflect(wo, wh_rd)
    wi_rd_refr = refract(wo, wh_rd, cos_t_rd, b.eta)
    wi_rd = jnp.where(take_refl_rd[:, None], wi_rd_refl, wi_rd_refr)
    valid_rd = jnp.where(
        take_refl_rd,
        True,
        (jnp.abs(cos_t_rd) > 1e-6) & (wi_rd[:, 2] * woz < 0.0),
    )
    f_rd, pdf_rd = _rough_dielectric_eval(b, wo, wi_rd)
    f_rd = jnp.where(valid_rd[:, None], f_rd, 0.0)
    pdf_rd = jnp.where(valid_rd, pdf_rd, 0.0)
    lobe_rd = jnp.where(take_refl_rd, LOBE_GLOSSY_REFL, LOBE_GLOSSY_TRANS).astype(
        jnp.int32
    )

    # --- plastic (plastic.h:56-85) -------------------------------------------
    f_o, _ = fresnel.dielectric_reflectance(b.eta, woz)
    sp = _spec_prob(b, f_o)
    take_spec_pl = u_lobe < sp
    wi_pl = jnp.where(take_spec_pl[:, None], reflect_z(wo), wi_dif)
    f_i_pl, _ = fresnel.dielectric_reflectance(b.eta, wi_pl[:, 2])
    f_pl_spec = b.specular * f_o[:, None] / jnp.maximum(wi_pl[:, 2], _TINY)[:, None]
    f_pl_diff = _plastic_diff(b, f_i_pl, f_o, wi_pl[:, 2])
    f_pl = jnp.where(take_spec_pl[:, None], f_pl_spec, f_pl_diff)
    pdf_pl = jnp.where(
        take_spec_pl, sp, cosine_hemisphere_pdf_safe(wi_pl[:, 2]) * (1.0 - sp)
    )
    invalid_pl = woz <= 0.0
    f_pl = jnp.where(invalid_pl[:, None], 0.0, f_pl)
    pdf_pl = jnp.where(invalid_pl, 0.0, pdf_pl)
    lobe_pl = jnp.where(take_spec_pl, LOBE_DELTA_REFL, LOBE_DIFFUSE_REFL).astype(
        jnp.int32
    )

    # --- rough plastic (rough_plastic.h:63-86) --------------------------------
    take_spec_rp = u_lobe < sp
    wh_rp = ggx.sample(wo, b.alpha, u1, u2)
    wi_rp = jnp.where(take_spec_rp[:, None], reflect(wo, wh_rp), wi_dif)
    f_rp, pdf_rp = _masked_eval_single(b, wo, wi_rp, ROUGH_PLASTIC)
    invalid_rp = woz <= 0.0
    f_rp = jnp.where(invalid_rp[:, None], 0.0, f_rp)
    pdf_rp = jnp.where(invalid_rp, 0.0, pdf_rp)
    lobe_rp = jnp.where(take_spec_rp, LOBE_GLOSSY_REFL, LOBE_DIFFUSE_REFL).astype(
        jnp.int32
    )

    # --- select by material type ---------------------------------------------
    def sel(vals, default):
        out = default
        for mt, v in vals:
            cond = (t == mt)
            if out.ndim == 2:
                cond = cond[:, None]
            out = jnp.where(cond, v, out)
        return out

    wi = sel(
        [
            (DIFFUSE, wi_dif),
            (CONDUCTOR, wi_con),
            (DIELECTRIC, wi_die),
            (ROUGH_CONDUCTOR, wi_rc),
            (ROUGH_DIELECTRIC, wi_rd),
            (PLASTIC, wi_pl),
            (ROUGH_PLASTIC, wi_rp),
        ],
        jnp.zeros_like(wo),
    )
    f = sel(
        [
            (DIFFUSE, f_dif),
            (CONDUCTOR, f_con),
            (DIELECTRIC, f_die),
            (ROUGH_CONDUCTOR, f_rc),
            (ROUGH_DIELECTRIC, f_rd),
            (PLASTIC, f_pl),
            (ROUGH_PLASTIC, f_rp),
        ],
        jnp.zeros_like(wo),
    )
    pdf = sel(
        [
            (DIFFUSE, pdf_dif),
            (CONDUCTOR, pdf_con),
            (DIELECTRIC, pdf_die),
            (ROUGH_CONDUCTOR, pdf_rc),
            (ROUGH_DIELECTRIC, pdf_rd),
            (PLASTIC, pdf_pl),
            (ROUGH_PLASTIC, pdf_rp),
        ],
        jnp.zeros(n, jnp.float32),
    )
    lobe = sel(
        [
            (DIFFUSE, lobe_dif),
            (CONDUCTOR, lobe_con),
            (DIELECTRIC, lobe_die),
            (ROUGH_CONDUCTOR, lobe_rc),
            (ROUGH_DIELECTRIC, lobe_rd),
            (PLASTIC, lobe_pl),
            (ROUGH_PLASTIC, lobe_rp),
        ],
        jnp.zeros(n, jnp.int32),
    )
    return wi, f, pdf, lobe


def _masked_eval_single(b: LocalBsdf, wo, wi, mtype: int):
    """Evaluate one material's f/pdf formulas (used inside sample())."""
    wiz, woz = wi[:, 2], wo[:, 2]
    upper = (wiz > 0.0) & (woz > 0.0)
    if mtype == DIFFUSE:
        f = jnp.where(upper[:, None], b.reflectance / jnp.pi, 0.0)
        pdf = jnp.where(upper, cosine_hemisphere_pdf_safe(wiz), 0.0)
        return f, pdf
    if mtype == ROUGH_CONDUCTOR:
        wh = normalize(wi + wo)
        fr = fresnel.conductor_reflectance_rgb(b.eta3, b.k3, dot(wo, wh))
        f = b.specular * (ggx.d(wh, b.alpha) * ggx.g(wi, wo, b.alpha))[:, None] * fr
        f = f / jnp.maximum(4.0 * wiz * woz, _TINY)[:, None]
        pdf = ggx.pdf(wo, wh, b.alpha) / jnp.maximum(4.0 * dot(wo, wh), _TINY)
        return jnp.where(upper[:, None], f, 0.0), jnp.where(upper, pdf, 0.0)
    if mtype == ROUGH_PLASTIC:
        f_o, _ = fresnel.dielectric_reflectance(b.eta, woz)
        f_i, _ = fresnel.dielectric_reflectance(b.eta, wiz)
        wh = normalize(wi + wo)
        fr = fresnel.dielectric_reflectance(b.eta, dot(wh, wo))[0]
        spec = b.specular * (
            fr * ggx.d(wh, b.alpha) * ggx.g(wi, wo, b.alpha)
        )[:, None] / jnp.maximum(4.0 * woz * wiz, _TINY)[:, None]
        diff = (
            b.reflectance
            / jnp.maximum(
                1.0
                - jnp.where(
                    b.nonlinear[:, None],
                    b.reflectance * b.int_fdr[:, None],
                    b.int_fdr[:, None],
                ),
                _TINY,
            )
            * ((1.0 - f_i) * (1.0 - f_o) / jnp.pi / jnp.maximum(b.eta**2, _TINY))[
                :, None
            ]
        )
        f = jnp.where(upper[:, None], spec + diff, 0.0)
        sp = _spec_prob(b, f_o)
        pdf = sp * ggx.pdf(wo, wh, b.alpha) / jnp.maximum(4.0 * dot(wi, wh), _TINY)
        pdf = pdf + (1.0 - sp) * cosine_hemisphere_pdf_safe(wiz)
        return f, jnp.where(upper, pdf, 0.0)
    raise ValueError(mtype)
