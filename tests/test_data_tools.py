import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_tpu.data.datasets import RayBatcher, SyntheticDataset
from iris_tpu.data.make_demo_dataset import make_dataset
from iris_tpu.utils.gen_path import generate_interpolated_path, viewmatrix


@pytest.fixture(scope="module")
def demo_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    make_dataset(root, img_hw=(24, 32), n_train=3, n_val=1, spp=8,
                 indir_depth=1)
    return root


def test_synthetic_dataset_frames(demo_root):
    ds = SyntheticDataset(demo_root, img_dir="ldr", split="train",
                          load_inverse=True)
    assert len(ds) == 3
    fr = ds.frame(0)
    hw = 24 * 32
    assert fr["rays"].shape == (hw, 12)
    assert fr["rgbs"].shape == (hw, 3)
    assert fr["albedo"].shape == (hw, 3)
    assert fr["segmentation"].shape == (hw,)
    assert fr["int_albedo"].shape == (hw, 3)
    # directions are unit-ish after normalize; differentials small
    d = fr["rays"][:, 3:6]
    assert np.all(np.abs(np.linalg.norm(d, axis=-1) - 1.0) < 0.5)
    assert np.abs(fr["rays"][:, 6:12]).max() < 0.2


def test_rays_hit_scene_and_match_gt(demo_root):
    """First-hit GT written by the generator must agree with re-traced rays
    through the loaded dataset (ray convention roundtrip)."""
    from iris_tpu.data.make_demo_dataset import gt_mat_fn
    from iris_tpu.geometry.bvh import build_bvh
    from iris_tpu.geometry.intersect import ray_intersect
    from iris_tpu.geometry.mesh import load_mesh

    ds = SyntheticDataset(demo_root, img_dir="ldr", split="train")
    mesh = load_mesh(os.path.join(demo_root, "scene.obj"))
    tracer = build_bvh(mesh.triangles())
    fr = ds.frame(1)
    rays = jnp.asarray(fr["rays"])
    pos, _, _, _, valid = ray_intersect(tracer, rays[:, :3], rays[:, 3:6])
    assert np.asarray(valid).mean() > 0.95
    alb = np.asarray(gt_mat_fn(pos)["albedo"])
    gt = np.asarray(fr["albedo"])
    v = np.asarray(valid)
    assert np.abs(alb[v] - gt[v]).mean() < 0.02


def test_pixel_bank_and_batcher(demo_root):
    ds = SyntheticDataset(demo_root, img_dir="ldr", split="train",
                          load_inverse=True)
    bank = ds.pixel_bank(keys=("rays", "rgbs", "segmentation"))
    n = 3 * 24 * 32
    assert bank["rays"].shape == (n, 12)
    assert bank["exposure"].shape == (n, 1)
    b = RayBatcher(bank, 256, seed=0)
    b0 = b.batch(0)
    assert b0["rays"].shape == (256, 12)
    first = b.batch(0)["rays"].copy()
    b.resample()
    second = b.batch(0)["rays"]
    assert not np.allclose(first, second)
    # multi-host striding covers disjoint halves
    h0 = RayBatcher(bank, 256, seed=1, process_index=0, process_count=2)
    h1 = RayBatcher(bank, 256, seed=1, process_index=1, process_count=2)
    a0 = h0.batch(0)["rays"]
    a1 = h1.batch(0)["rays"]
    assert a0.shape == (128, 12) and a1.shape == (128, 12)
    assert not np.allclose(a0, a1)


def test_interpolated_path():
    poses = []
    for i, th in enumerate(np.linspace(0, np.pi, 4)):
        pos = np.asarray([np.cos(th), np.sin(th), 0.5])
        poses.append(viewmatrix(-pos, np.asarray([0, 0, 1.0]), pos))
    path = generate_interpolated_path(np.stack(poses), n_interp=5)
    assert path.shape == (15, 3, 4)
    # rotations stay orthonormal
    rtr = np.einsum("bij,bik->bjk", path[:, :, :3], path[:, :, :3])
    assert np.allclose(rtr, np.eye(3)[None], atol=1e-5)


def test_export_textures(demo_root, tmp_path):
    from iris_tpu.geometry.mesh import load_mesh
    from iris_tpu.models.brdf import init_ngp_brdf
    from iris_tpu.models.hashgrid import HashGridConfig
    from iris_tpu.utils.export import export_textures, write_obj_with_uvs

    mesh = load_mesh(os.path.join(demo_root, "scene.obj"))
    mat = init_ngp_brdf(jax.random.PRNGKey(0), -0.1, 2.1,
                        HashGridConfig(n_levels=4, log2_table_size=8))
    albedo, rm, uvs = export_textures(mesh, mat, texels_per_face=4)
    assert albedo.ndim == 3 and albedo.shape[-1] == 3
    assert np.all((albedo >= 0) & (albedo <= 1))
    assert uvs.shape == (mesh.n_faces, 3, 2)
    p = str(tmp_path / "scene_uv.obj")
    write_obj_with_uvs(p, mesh, uvs)
    assert os.path.exists(p) and os.path.exists(str(tmp_path / "scene_uv.mtl"))


def test_fuse_segmentation(demo_root):
    from iris_tpu.geometry.bvh import build_bvh
    from iris_tpu.geometry.mesh import load_mesh
    from iris_tpu.utils.fuse_segmentation import fuse_segmentation

    ds = SyntheticDataset(demo_root, img_dir="ldr", split="train",
                          load_inverse=True)
    mesh = load_mesh(os.path.join(demo_root, "scene.obj"))
    tracer = build_bvh(mesh.triangles())
    labels = fuse_segmentation(tracer, mesh.n_faces, ds.frames(),
                               n_labels=32)
    assert labels.shape == (mesh.n_faces,)
    assert (labels >= 0).sum() > 0
    # observed faces must carry their own part id (seg = face//12 % 16)
    seen = np.flatnonzero(labels >= 0)
    expect = (seen // 12) % 16
    agree = (labels[seen] == expect).mean()
    assert agree > 0.9, agree


def test_hdr2ldr_roundtrip(tmp_path, demo_root):
    from iris_tpu.utils.hdr2ldr import convert, sample_crfs

    src = os.path.join(demo_root, "train", "Image")
    tgt = str(tmp_path / "ldr_out")
    convert(src, tgt, sample_crfs(0))
    assert os.path.exists(os.path.join(tgt, "cam", "exposure.npy"))
    assert os.path.exists(os.path.join(tgt, "cam", "crf.npy"))
    pngs = [f for f in os.listdir(tgt) if f.endswith(".png")]
    assert len(pngs) == 3


def test_center_poses_normalizes_average():
    from iris_tpu.utils.gen_path import average_poses, center_poses

    rng = np.random.default_rng(0)
    # random-ish camera rig around a point
    poses = []
    for i in range(12):
        th = i / 12 * 2 * np.pi
        pos = np.asarray([3 * np.cos(th), 3 * np.sin(th), 1.0 + 0.1 * i])
        z = -pos / np.linalg.norm(pos)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        poses.append(np.stack([x, y, z, pos], 1))
    poses = np.asarray(poses)
    pts = rng.normal(size=(50, 3))

    centered, pts_c = center_poses(poses, pts)
    # the construction is rigid-equivariant, so re-averaging the centered
    # rig (with the centered cloud) gives the identity pose
    avg = average_poses(centered, pts_c)
    assert np.allclose(avg[:, :3], np.eye(3), atol=1e-6), avg
    assert np.allclose(avg[:, 3], 0.0, atol=1e-6)
    # the pts transform is the same rigid transform (pairwise dists kept)
    d0 = np.linalg.norm(pts[:1] - pts, axis=-1)
    d1 = np.linalg.norm(pts_c[:1] - pts_c, axis=-1)
    assert np.allclose(d0, d1, atol=1e-6)


def test_process_images_cli(tmp_path):
    """Standalone resize tool (reference scannetpp/process.py parity)."""
    from PIL import Image

    from iris_tpu.utils import process_images

    src = tmp_path / "in"
    src.mkdir()
    big = (np.random.default_rng(0).uniform(0, 255, (60, 200, 3))
           .astype(np.uint8))
    small = (np.random.default_rng(1).uniform(0, 255, (30, 40, 3))
             .astype(np.uint8))
    Image.fromarray(big).save(src / "a.png")
    Image.fromarray(small).save(src / "b.png")
    out = tmp_path / "out"
    process_images.main(["--input", str(src), "--output", str(out),
                         "--max_width", "100"])
    a = np.asarray(Image.open(out / "a.png"))
    b = np.asarray(Image.open(out / "b.png"))
    assert a.shape == (30, 100, 3)       # aspect preserved, capped width
    assert np.array_equal(b, small)      # under-cap images untouched


def test_procedural_cameras_avoid_clutter(tmp_path):
    """>8 frames triggers the procedural orbit; with dense clutter every
    pose must be probe-ray validated — a camera inside a box produced
    all-black frames (round-2 scale run)."""
    import numpy as np
    from iris_tpu.data.make_demo_dataset import make_dataset
    from iris_tpu.utils.image import open_png

    root = str(tmp_path / "dense")
    make_dataset(root, img_hw=(12, 16), n_train=10, n_val=0, spp=4,
                 indir_depth=1, n_clutter=150, seed=5)
    for i in range(10):
        im = open_png(f"{root}/train/ldr/{i:03d}_0001.png")
        assert im.mean() > 0.01, (i, im.mean())


def test_gt_mat_metallic_blob():
    """metallic_amp=0 (default) keeps the legacy all-dielectric scene;
    amp>0 adds a bounded metallic/low-roughness blob (closed form used by
    the scale record to make roughness recovery scoreable)."""
    from iris_tpu.data.make_demo_dataset import gt_mat_fn

    pos = jnp.asarray(np.random.default_rng(0).uniform(
        0.0, 2.0, (256, 3)).astype(np.float32))
    base = gt_mat_fn(pos)
    assert float(jnp.abs(base["metallic"]).max()) == 0.0
    amp = gt_mat_fn(pos, metallic_amp=0.8)
    m = np.asarray(amp["metallic"])
    r = np.asarray(amp["roughness"])
    assert 0.7 < m.max() <= 0.8 and m.min() >= 0.0
    assert r.min() >= 0.08 - 1e-6 and r.max() <= 1.0
    # blob is local: far corner stays dielectric with the legacy roughness
    far = gt_mat_fn(jnp.asarray([[2.0, 2.0, 2.0]]), metallic_amp=0.8)
    assert float(far["metallic"][0, 0]) < 0.01
    assert abs(float(far["roughness"][0, 0]) - 0.9) < 0.01
    # albedo unchanged by the flag
    assert np.allclose(np.asarray(base["albedo"]), np.asarray(amp["albedo"]))
