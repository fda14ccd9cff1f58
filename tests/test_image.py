import numpy as np

from pupiloptixlab_tpu.utils.image import (
    load_image,
    read_exr,
    read_hdr,
    save_image,
    write_exr,
    write_hdr,
)


def _random_img(h=17, w=23, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, 3) * 4.0).astype(np.float32)


def test_exr_roundtrip_zips(tmp_path):
    img = _random_img()
    p = tmp_path / "x.exr"
    write_exr(p, img, compress=True)
    out = read_exr(p)
    np.testing.assert_allclose(out[..., :3], img, atol=1e-6)
    np.testing.assert_allclose(out[..., 3], 1.0)


def test_exr_roundtrip_uncompressed(tmp_path):
    img = _random_img(seed=1)
    p = tmp_path / "x.exr"
    write_exr(p, img, compress=False)
    np.testing.assert_allclose(read_exr(p)[..., :3], img, atol=1e-6)


def test_exr_rgba(tmp_path):
    rng = np.random.RandomState(2)
    img = rng.rand(9, 33, 4).astype(np.float32)
    p = tmp_path / "x.exr"
    write_exr(p, img)
    np.testing.assert_allclose(read_exr(p), img, atol=1e-6)


def test_hdr_roundtrip(tmp_path):
    img = _random_img(h=12, w=40, seed=3)
    p = tmp_path / "x.hdr"
    write_hdr(p, img)
    out = read_hdr(p)
    # RGBE shares one exponent across rgb: quantum = max_channel / 256
    atol = float(img.max(axis=-1).max()) / 256 * 1.5
    np.testing.assert_allclose(out[..., :3], img, rtol=0.01, atol=atol)


def test_hdr_narrow_image_flat_scanlines(tmp_path):
    img = _random_img(h=4, w=4, seed=4)
    p = tmp_path / "x.hdr"
    write_hdr(p, img)
    atol = float(img.max(axis=-1).max()) / 256 * 1.5
    np.testing.assert_allclose(read_hdr(p)[..., :3], img, rtol=0.01, atol=atol)


def test_ldr_gamma_roundtrip(tmp_path):
    img = np.full((8, 8, 3), 0.5, np.float32)
    p = tmp_path / "x.png"
    save_image(p, img)
    out = load_image(p)
    np.testing.assert_allclose(out[..., :3], img, atol=0.01)


def test_save_dispatches_exr(tmp_path):
    img = _random_img(seed=5)
    p = tmp_path / "shot.exr"
    save_image(p, img)
    np.testing.assert_allclose(load_image(p)[..., :3], img, atol=1e-6)
