import os

import numpy as np

from iris_tpu.utils.exr import read_exr, write_exr
from iris_tpu.utils.image import open_png, save_image
from iris_tpu.utils.metrics import psnr, ssim


def test_exr_roundtrip_float(tmp_path):
    img = np.random.default_rng(0).uniform(0, 10, (37, 53, 3)).astype(
        np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=False, compression="zip")
    back = read_exr(p)
    assert back.shape == img.shape
    assert np.allclose(back, img, atol=0)


def test_exr_roundtrip_half_and_none(tmp_path):
    img = np.random.default_rng(1).uniform(0, 4, (16, 16, 3)).astype(
        np.float32)
    for comp in ("none", "zips", "zip"):
        p = str(tmp_path / f"t_{comp}.exr")
        write_exr(p, img, half=True, compression=comp)
        back = read_exr(p)
        assert np.allclose(back, img, rtol=1e-3, atol=1e-3), comp


def test_exr_single_channel(tmp_path):
    img = np.random.default_rng(2).uniform(0, 1, (8, 9)).astype(np.float32)
    p = str(tmp_path / "y.exr")
    write_exr(p, img, half=False)
    back = read_exr(p)
    assert back.shape == (8, 9, 1)
    assert np.allclose(back[..., 0], img)


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(3).uniform(0, 1, (12, 14, 3))
    p = str(tmp_path / "t.png")
    save_image(img, p)
    back = open_png(p)
    assert back.shape == (12, 14, 3)
    assert np.allclose(back, img, atol=1 / 255 + 1e-6)


def test_psnr_basic():
    a = np.zeros((10, 10, 3))
    b = np.full((10, 10, 3), 0.1)
    assert abs(psnr(a, b) - 20.0) < 1e-6
    assert psnr(a, a) == float("inf")


def test_ssim_bounds_and_identity():
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 1, (32, 32, 3))
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = rng.uniform(0, 1, (32, 32, 3))
    v = ssim(a, b)
    assert -1.0 <= v < 0.5  # unrelated noise -> low ssim


def test_ssim_matches_known_case():
    """Smooth image + small noise: SSIM should be high but < 1."""
    x, y = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64))
    a = np.stack([x, y, x * y], -1)
    b = a + np.random.default_rng(5).normal(0, 0.01, a.shape)
    v = ssim(a, np.clip(b, 0, 1))
    assert 0.8 < v < 1.0


def test_exr_piz_roundtrip(tmp_path):
    """Native PIZ codec (csrc/exr_piz.cpp): bit-exact roundtrip for half and
    float channels, odd sizes, multi-block (>32 lines) images.

    Conformance caveat: no OpenEXR binary exists in this image to produce
    third-party PIZ files; the stream layout follows the public spec
    (bitmap range + huffman-coded wavelet planes) and is self-consistent.
    """
    import pytest

    from iris_tpu.utils.exr_native import get_lib
    if get_lib() is None:
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(0)
    for h, w, c, half in [(37, 53, 3, True), (64, 64, 3, False),
                          (100, 41, 1, True), (7, 9, 3, True)]:
        img = (rng.standard_normal((h, w, c)).astype(np.float32) * 2.5) ** 3
        img[::7, ::5] = 0.0
        p = str(tmp_path / "t.exr")
        write_exr(p, img, half=half, compression="piz")
        back = read_exr(p).reshape(h, w, -1)[..., :c]
        ref = img.astype(np.float16).astype(np.float32) if half else img
        assert np.array_equal(back, ref), (h, w, c, half)


def test_exr_piz_matches_zip_decode(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 10, (40, 30, 3)).astype(np.float32)
    pa, pb = str(tmp_path / "a.exr"), str(tmp_path / "b.exr")
    write_exr(pa, img, half=True, compression="piz")
    write_exr(pb, img, half=True, compression="zip")
    assert np.array_equal(read_exr(pa), read_exr(pb))


def test_exr_piz_truncated_raises(tmp_path):
    import pytest

    from iris_tpu.utils.exr_native import get_lib
    if get_lib() is None:
        pytest.skip("no native toolchain")
    img = np.random.default_rng(2).uniform(0, 1, (40, 40, 3)).astype(
        np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=True, compression="piz")
    blob = open(p, "rb").read()
    open(p, "wb").write(blob[:-200])  # corrupt the last block
    with pytest.raises(Exception):
        read_exr(p)
