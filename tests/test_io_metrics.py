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
