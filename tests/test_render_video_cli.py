"""render_video CLI: render_traj.npy consumption + AOV videos
(reference render_video.py:170-280)."""

import os

import numpy as np
import pytest

from iris_tpu.data.make_demo_dataset import make_dataset


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rv_ds"))
    make_dataset(root, img_hw=(20, 24), n_train=3, n_val=1, spp=8,
                 indir_depth=1)
    out = str(tmp_path_factory.mktemp("rv_out"))

    from iris_tpu.pipeline import extract_emitter, slf_bake
    common = ["--dataset", "synthetic", "--scene", root, "--output", out,
              "--ldr_img_dir", "ldr"]
    slf_bake.main(common + ["--voxel_num", "16"])
    extract_emitter.main(common + ["--threshold", "0.99"])

    import jax

    from iris_tpu.models.brdf import init_ngp_brdf
    from iris_tpu.models.crf import init_emor_crf
    from iris_tpu.models.hashgrid import HashGridConfig
    from iris_tpu.train.checkpoint import save_pytree
    ngp = init_ngp_brdf(jax.random.PRNGKey(0), -0.1, 2.1,
                        HashGridConfig(n_levels=4, log2_table_size=8))
    ck = os.path.join(out, "ckpt", "exp")
    os.makedirs(ck, exist_ok=True)
    save_pytree(os.path.join(ck, "last.pkl"),
                {"material": ngp, "crf_weight": init_emor_crf(3).weight})
    return root, out


def test_render_video_traj_npy_and_aovs(setup):
    root, out = setup
    # drop a 3-pose render_traj.npy at the dataset root
    import json

    with open(os.path.join(root, "train", "transforms.json")) as f:
        meta = json.load(f)
    poses = np.stack([np.asarray(fr["transform_matrix"], np.float32)
                      for fr in meta["frames"]])[:3]
    np.save(os.path.join(root, "render_traj.npy"), poses)

    from iris_tpu.pipeline import render_video
    vout = os.path.join(out, "video")
    render_video.main([
        "--dataset", "synthetic", root, "--ldr_img_dir", "ldr",
        "--experiment_name", "exp",
        "--checkpoint_path", os.path.join(out, "ckpt"),
        "--emitter_path", out, "--output_path", vout,
        "--SPP", "2", "--spp", "2", "--indir_depth", "1",
    ])
    names = os.listdir(vout)

    def written(base):
        # mp4 when ffmpeg exists, else a <base>_frames/ PNG directory
        return any(n == f"{base}.mp4" or n == f"{base}_frames"
                   for n in names)

    for base in ("video", "kd", "a_prime", "roughness", "metallic",
                 "emission"):
        assert written(base), (base, names)
    # the 3-pose render_traj.npy was consumed (not the interpolated path):
    # boomerang loop doubles it to 6 frames
    fdir = os.path.join(vout, "video_frames")
    if os.path.isdir(fdir):
        pngs = [n for n in os.listdir(fdir)
                if n.endswith('.png')]
        assert len(pngs) == 6, pngs   # INDEX.txt excluded
