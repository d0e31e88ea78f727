"""Unit test for utils/metric_brdf.brdf_metrics (reference
utils/metric_brdf.py:31-92 conventions) including the --max_frames
eval-subset knob: scoring the first N frames must not touch frame files
beyond N (the scale record renders a 16-of-32 frame subset)."""

import os

import numpy as np
import pytest

from iris_tpu.utils.exr import write_exr
from iris_tpu.utils.image import save_image
from iris_tpu.utils.metric_brdf import brdf_metrics


def _write_frame(gt, method, i, h=4, w=4):
    rng = np.random.default_rng(i)
    emit = np.zeros((h, w, 3), np.float32)
    emit[0, 0] = 2.0  # one emissive pixel -> IoU branch exercised
    albedo = rng.uniform(0.2, 0.8, (h, w, 3)).astype(np.float32)
    rough = np.ones((h, w, 3), np.float32)  # fully diffuse -> kd scored
    for name, arr in [("Image", albedo), ("Emit", emit),
                      ("DiffCol", albedo), ("Roughness", rough)]:
        os.makedirs(os.path.join(gt, name), exist_ok=True)
        write_exr(os.path.join(gt, name, f"{i:03d}_0001.exr"), arr)
    os.makedirs(os.path.join(gt, "albedo"), exist_ok=True)
    write_exr(os.path.join(gt, "albedo", f"{i:03d}.exr"), albedo)

    for name in ["emission", "a_prime", "diffuse", "roughness"]:
        os.makedirs(os.path.join(method, name), exist_ok=True)
    write_exr(os.path.join(method, "emission", f"{i:05d}_emission.exr"),
              emit)
    save_image(albedo, os.path.join(method, "a_prime",
                                    f"{i:05d}_a_prime.png"))
    save_image(albedo, os.path.join(method, "diffuse",
                                    f"{i:05d}_diffuse.png"))
    write_exr(os.path.join(method, "roughness", f"{i:05d}_roughness.exr"),
              rough)


def test_brdf_metrics_max_frames_subset(tmp_path):
    gt, method = str(tmp_path / "gt"), str(tmp_path / "method")
    _write_frame(gt, method, 0)
    _write_frame(gt, method, 1)

    full = brdf_metrics(gt, method)
    sub = brdf_metrics(gt, method, max_frames=1)
    # perfect prediction on both frames: PSNRs high and finite either way
    for m in (full, sub):
        assert m["roughness_psnr"] > 40
        assert m["albedo_psnr"] > 40
        assert 0.99 <= m["emission_iou"] <= 1.0

    # frame 1's method files must be IGNORED under max_frames=1: remove
    # them and the subset score must still compute (the full score can't)
    os.remove(os.path.join(method, "emission", "00001_emission.exr"))
    sub2 = brdf_metrics(gt, method, max_frames=1)
    assert sub2["albedo_psnr"] == pytest.approx(sub["albedo_psnr"])
    with pytest.raises(FileNotFoundError):
        brdf_metrics(gt, method)
