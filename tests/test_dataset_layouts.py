"""Loader tests for the Real (FIPT) and ScanNet++ dataset layouts using
minimal on-disk fixtures — exercises the pose conventions (OpenGL->OpenCV,
transforms_all flip), split logic, and pixel banks without real data."""

import json
import os

import numpy as np
import pytest

from iris_tpu.data.datasets import RealDataset, ScannetppDataset
from iris_tpu.geometry.mesh import save_ply
from iris_tpu.utils.exr import write_exr
from iris_tpu.utils.image import save_image

H, W = 12, 16


def _write_png(path, value=0.5):
    img = np.full((H, W, 3), value, np.float32)
    save_image(img, path)


@pytest.fixture(scope="module")
def real_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("real_ds")
    (root / "Image").mkdir()
    (root / "segmentation").mkdir()
    (root / "irisformer" / "albedo").mkdir(parents=True)
    n = 12
    # probe exr + pngs
    for i in range(n):
        write_exr(str(root / "Image" / f"{i:03d}_0001.exr"),
                  np.random.rand(H, W, 3).astype(np.float32))
        _write_png(str(root / "Image" / f"{i:03d}_0001.png"), 0.4)
        write_exr(str(root / "segmentation" / f"{i:03d}.exr"),
                  np.full((H, W, 3), i % 4, np.float32))
        _write_png(str(root / "irisformer" / "albedo" /
                       f"{i:03d}_0001.png"), 0.6)
    # cam.txt: n cameras as [origin; lookat; up] triples (OpenGL)
    with open(root / "cam.txt", "w") as f:
        f.write(f"{n}\n")
        for i in range(n):
            ox = 0.1 * i
            f.write(f"{ox} 0 1\n")          # origin
            f.write(f"{ox} 1 1\n")          # lookat (+y)
            f.write("0 0 1\n")              # up (+z), perpendicular to at
    with open(root / "K_list.txt", "w") as f:
        f.write(f"{n}\n")
        for _ in range(n):
            f.write(f"20 0 {W/2}\n0 20 {H/2}\n0 0 1\n")
    return str(root)


def test_real_dataset_split_and_frames(real_root):
    train = RealDataset(real_root, split="train")
    val = RealDataset(real_root, split="val")
    # every 10th frame is val (ids 0, 10 here)
    assert val.split_ids == [0, 10]
    assert len(train) == 10
    fr = train.frame(0)
    assert fr["rays"].shape == (H * W, 12)
    assert fr["rgbs"].shape == (H * W, 3)
    # OpenGL (origin,lookat,up) -> OpenCV: forward = +y, up row = -z
    c2w = fr["c2w"]
    assert np.allclose(c2w[:, 2], [0, 1, 0], atol=1e-6)   # at vector
    assert np.allclose(c2w[:, 1], [0, 0, -1], atol=1e-6)  # -up
    # central ray points roughly along +y
    d = fr["rays"][:, 3:6]
    mid = d[(H // 2) * W + W // 2]
    assert mid[1] > 0.9 * np.linalg.norm(mid)


def test_real_dataset_inverse_channels(real_root):
    ds = RealDataset(real_root, split="train", load_inverse=True)
    fr = ds.frame(1)
    assert fr["segmentation"].shape == (H * W,)
    assert fr["int_albedo"].shape == (H * W, 3)
    bank = ds.pixel_bank(keys=("rays", "rgbs", "segmentation"))
    assert bank["rays"].shape[0] == len(ds) * H * W


@pytest.fixture(scope="module")
def scannetpp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("snpp")
    scene = "abc123"
    psdf = root / "data" / scene / "psdf"
    (psdf / "images").mkdir(parents=True)
    (root / "data" / scene / "scans").mkdir(parents=True)
    names = [f"DSC{i:05d}.png" for i in range(5)]
    for nme in names:
        _write_png(str(psdf / "images" / nme), 0.3)
    with open(psdf / "train_test_lists.json", "w") as f:
        json.dump({"train": names[:4], "test": names[4:]}, f)
    frames = []
    for i, nme in enumerate(names):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.05 * i, 0, 0]
        frames.append({"file_path": f"images/{nme}",
                       "transform_matrix": c2w.tolist()})
    with open(psdf / "transforms_all.json", "w") as f:
        json.dump({"fl_x": 20.0, "fl_y": 20.0, "cx": W / 2, "cy": H / 2,
                   "h": H, "w": W, "frames": frames}, f)
    # minimal mesh for load_scene paths
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    save_ply(str(root / "data" / scene / "scans" / "scene.ply"), verts,
             np.asarray([[0, 1, 2]], np.int32))
    return str(root), scene


def test_scannetpp_dataset(scannetpp_root):
    root, scene = scannetpp_root
    train = ScannetppDataset(root, scene, split="train")
    test = ScannetppDataset(root, scene, split="test")
    assert len(train) == 4 and len(test) == 1
    fr = train.frame(0)
    assert fr["rays"].shape == (H * W, 12)
    assert float(fr["exposure"]) == 1.0
    # mean-EMoR GT CRF attached
    assert train.crfs.shape == (3, 1024)
    # OpenGL->OpenCV flip: identity transform -> forward becomes -z... the
    # flip negates columns 1:3, so c2w[:, 2] == [0, 0, -1]
    assert np.allclose(fr["c2w"][:3, 2], [0, 0, -1], atol=1e-6)
    # mesh path resolution works
    from iris_tpu.pipeline.common import load_scene
    mesh, tracer = load_scene("scannetpp", root, scene)
    assert mesh.n_faces == 1


def test_ply_roundtrip(tmp_path):
    """save_ply -> load_ply roundtrip (binary LE, tri faces)."""
    from iris_tpu.geometry.mesh import load_ply, save_ply

    rng = np.random.default_rng(0)
    verts = rng.normal(size=(9, 3)).astype(np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    p = str(tmp_path / "m.ply")
    save_ply(p, verts, faces)
    mesh = load_ply(p)
    assert np.allclose(mesh.vertices, verts, atol=1e-6)
    assert np.array_equal(mesh.faces, faces)


def test_obj_roundtrip(tmp_path):
    from iris_tpu.geometry.mesh import load_obj

    p = str(tmp_path / "m.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n")
        f.write("f 1 2 3\nf 2/1 4/2/3 3/1/1\n")   # with vt/vn refs
        f.write("f 1 2 4 3\n")                     # quad -> 2 tris
    mesh = load_obj(p)
    assert mesh.vertices.shape == (4, 3)
    assert mesh.faces.shape == (4, 3)


def test_ply_ascii(tmp_path):
    from iris_tpu.geometry.mesh import load_ply

    p = str(tmp_path / "a.ply")
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                "element vertex 3\n"
                "property float x\nproperty float y\nproperty float z\n"
                "element face 1\n"
                "property list uchar int vertex_indices\n"
                "end_header\n"
                "0 0 0\n1 0 0\n0 1 0\n"
                "3 0 1 2\n")
    mesh = load_ply(p)
    assert mesh.vertices.shape == (3, 3)
    assert np.array_equal(mesh.faces, [[0, 1, 2]])


def test_pixel_bank_memmap_matches_ram(tmp_path):
    """Disk-backed bank == in-RAM bank, and the fingerprinted bank is
    reused (no refill) on the second call."""
    import io
    from contextlib import redirect_stdout

    import numpy as np

    class Tiny:
        img_hw = (4, 5)
        n_frames = 3
        exposures = np.asarray([1.0, 2.0, 0.5], np.float32)
        crfs = None
        split_dir = "tiny-fake"

        def frame(self, i):
            rng = np.random.default_rng(i)
            hw = 20
            return {"rays": rng.uniform(size=(hw, 12)).astype(np.float32),
                    "rgbs": rng.uniform(size=(hw, 3)).astype(np.float32)}

    from iris_tpu.data.datasets import _BaseDataset
    Tiny.pixel_bank = _BaseDataset.pixel_bank
    ds = Tiny()
    ram = ds.pixel_bank(("rays", "rgbs"))
    mm = ds.pixel_bank(("rays", "rgbs"), memmap_dir=str(tmp_path / "bank"))
    assert set(ram) == {"rays", "rgbs", "exposure"}
    for k in ram:
        assert np.array_equal(ram[k], np.asarray(mm[k])), k
    assert ram["exposure"][0, 0] == 1.0 and ram["exposure"][25, 0] == 2.0

    buf = io.StringIO()
    with redirect_stdout(buf):
        mm2 = ds.pixel_bank(("rays", "rgbs"),
                            memmap_dir=str(tmp_path / "bank"))
    assert "reusing" in buf.getvalue()
    for k in ram:
        assert np.array_equal(ram[k], np.asarray(mm2[k])), k

    # RayBatcher consumes a memmap bank transparently
    from iris_tpu.data.datasets import RayBatcher
    b = RayBatcher(mm2, batch_size=16, seed=0)
    batch = b.batch(0)
    assert batch["rays"].shape == (16, 12)
