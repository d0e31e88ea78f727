"""Maximal-fidelity adversarial real-data fixture (round-2 verdict #8).

Real FIPT/ScanNet++ data cannot enter this environment, so this builds the
nastiest layout the loaders claim to support and drives REAL pipeline
stage CLIs over it end-to-end:
  - 210 frames (forces the memmap pixel-bank path, not the RAM path)
  - every EXR PIZ-compressed (Image HDR, DiffCol/Roughness/Emit GT,
    IndexMA segmentation) — the compression real datasets actually ship
    (reference utils/dataset/synthetic_ldr.py:59-66 reads these)
  - segmentation with 180 distinct part ids: > the 128 default bound, so
    check_max_segments must HARD-FAIL and --max_segments 256 must recover
  - non-identity per-frame exposures + a non-gamma CRF in ldr/cam/
Stages driven: slf_bake CLI, extract_emitter CLI, initialize CLI (5
steps, memmap bank, exposure-aware batches).
"""

import json
import os

import numpy as np
import pytest

from iris_tpu.geometry.procedural import make_box_scene
from iris_tpu.utils.exr import write_exr
from iris_tpu.utils.image import save_image

H, W = 12, 16
N_TRAIN, N_VAL = 210, 2
N_SEG = 180


def _c2w(pos, target):
    f = np.asarray(target, np.float64) - pos
    f /= np.linalg.norm(f)
    right = np.cross(f, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, f)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up, -f, pos
    return m


def _write_split(root, split, n, rng):
    sd = os.path.join(root, split)
    for d in ("Image", "DiffCol", "Roughness", "Emit", "IndexMA",
              "ldr", "ldr/albedo", "ldr/cam"):
        os.makedirs(os.path.join(sd, d), exist_ok=True)
    frames = []
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.asarray([1.0 + 0.6 * np.cos(ang), 1.0 + 0.6 * np.sin(ang),
                          0.55])
        frames.append({"file_path": f"{i:03d}",
                       "transform_matrix": _c2w(pos, [1.0, 1.0, 0.4]
                                                ).tolist()})
        hdr = np.stack([(xx / W + 0.1 * (i % 7)), yy / H,
                        0.3 + 0.2 * np.sin(xx + i)], -1).astype(np.float32)
        write_exr(os.path.join(sd, "Image", f"{i:03d}_0001.exr"), hdr,
                  half=True, compression="piz")
        write_exr(os.path.join(sd, "DiffCol", f"{i:03d}_0001.exr"),
                  np.clip(hdr, 0, 1), half=True, compression="piz")
        write_exr(os.path.join(sd, "Roughness", f"{i:03d}_0001.exr"),
                  np.full((H, W), 0.5, np.float32), half=True,
                  compression="piz")
        write_exr(os.path.join(sd, "Emit", f"{i:03d}_0001.exr"),
                  np.zeros((H, W, 3), np.float32), half=True,
                  compression="piz")
        # >128 part ids spread across frames and pixels (half-exact ints)
        seg = ((xx.astype(np.int64) // 4 + (yy.astype(np.int64) // 4) * 4
                + i * 13) % N_SEG).astype(np.float32)
        write_exr(os.path.join(sd, "IndexMA", f"{i:03d}_0001.exr"), seg,
                  half=True, compression="piz")
        save_image(np.clip(hdr, 0, 1) ** (1 / 2.2),
                   os.path.join(sd, "ldr", f"{i:03d}_0001.png"))
        save_image(np.clip(hdr, 0, 1),
                   os.path.join(sd, "ldr", "albedo", f"{i:03d}_0001.png"))
    with open(os.path.join(sd, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames}, f)
    # non-identity exposures + non-gamma CRF
    np.save(os.path.join(sd, "ldr", "cam", "exposure.npy"),
            rng.uniform(0.5, 2.0, n).astype(np.float32))
    t = np.linspace(0, 1, 1024, dtype=np.float32)
    crf = np.stack([t ** 0.45, t ** 0.5, t ** 0.55])
    np.save(os.path.join(sd, "ldr", "cam", "crf.npy"), crf)


@pytest.fixture(scope="module")
def adversarial_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fipt_adversarial"))
    rng = np.random.default_rng(0)
    _write_split(root, "train", N_TRAIN, rng)
    _write_split(root, "val", N_VAL, rng)
    mesh, _ = make_box_scene(n_clutter=2)
    with open(os.path.join(root, "scene.obj"), "w") as f:
        for v in np.asarray(mesh.vertices):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in np.asarray(mesh.faces) + 1:
            f.write(f"f {a} {b} {c}\n")
    return root


@pytest.mark.slow
def test_loader_memmap_exposure_piz(adversarial_root, tmp_path):
    from iris_tpu.data.datasets import SyntheticDataset

    ds = SyntheticDataset(adversarial_root, img_dir="ldr",
                          load_inverse=True)
    assert len(ds) == N_TRAIN
    fr = ds.frame(10)                       # ids 130..141 in this frame
    assert fr["rays"].shape == (H * W, 12)
    assert fr["exposure"] != 1.0            # non-identity exposure applied
    assert fr["segmentation"].max() >= 128  # adversarial id range survives
    # 210 frames through the MEMMAP bank path with the exposure column
    bank = ds.pixel_bank(keys=("rays", "rgbs", "segmentation"),
                         memmap_dir=str(tmp_path / "bank"))
    assert bank["rays"].shape[0] == N_TRAIN * H * W
    assert "exposure" in bank
    assert len(np.unique(bank["exposure"])) > 100
    seg_ids = np.unique(bank["segmentation"])
    assert len(seg_ids) == N_SEG            # every id intact through PIZ
    # memmap contents must equal a directly-loaded frame
    f0 = ds.frame(0)
    assert np.allclose(bank["rgbs"][: H * W], np.asarray(f0["rgbs"]),
                       atol=1e-6)


@pytest.mark.slow
def test_stage_clis_on_adversarial_fixture(adversarial_root, tmp_path,
                                           monkeypatch):
    from iris_tpu.pipeline import extract_emitter, initialize, slf_bake

    out = str(tmp_path / "bake")
    common = ["--dataset", "synthetic", "--scene", adversarial_root,
              "--ldr_img_dir", "ldr"]
    slf_bake.main(common + ["--output", out, "--voxel_num", "16"])
    assert os.path.exists(os.path.join(out, "vslf.npz"))
    extract_emitter.main(common + ["--output", out, "--threshold", "0.99"])
    assert os.path.exists(os.path.join(out, "emitter.npz"))

    init_args = ["--dataset", "synthetic", adversarial_root,
                 "--ldr_img_dir", "ldr",
                 "--voxel_path", f"{out}/vslf.npz",
                 "--emitter_path", f"{out}/emitter.npz",
                 "--checkpoint_path", str(tmp_path / "ckpt"),
                 "--hash_levels", "2", "--log2_hashmap_size", "8",
                 "--batch_size", "256", "--SPP", "2", "--spp", "1",
                 "--experiment_name", "adv_init", "--max_steps", "5"]
    # force the disk-backed (memmap) bank inside the CLI too
    monkeypatch.setenv("IRIS_TPU_BANK_RAM_LIMIT", "4096")

    # default --max_segments 128 must HARD-FAIL on 180 part ids
    with pytest.raises(ValueError, match="max_segments"):
        initialize.main(init_args)
    # --max_segments 256 recovers
    initialize.main(init_args + ["--max_segments", "256"])
    assert os.path.exists(str(tmp_path / "ckpt" / "adv_init" / "last.pkl"))
