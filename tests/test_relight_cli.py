"""render_relight CLI smoke test on the demo dataset + a YAML scene."""

import os

import numpy as np
import pytest

from iris_tpu.data.make_demo_dataset import make_dataset


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("relight_ds"))
    make_dataset(root, img_hw=(24, 32), n_train=3, n_val=1, spp=8,
                 indir_depth=1)
    out = str(tmp_path_factory.mktemp("relight_out"))
    return root, out


def test_render_relight_cli(setup):
    root, out = setup
    # minimal artifacts: emitter.npz + a checkpoint with material+crf
    import jax

    from iris_tpu.geometry.mesh import load_mesh
    from iris_tpu.models.brdf import init_ngp_brdf
    from iris_tpu.models.crf import init_emor_crf
    from iris_tpu.models.hashgrid import HashGridConfig
    from iris_tpu.pipeline.common import save_emitter
    from iris_tpu.train.checkpoint import save_pytree

    mesh = load_mesh(os.path.join(root, "scene.obj"))
    n_face = mesh.n_faces
    is_em = np.zeros(n_face, bool)
    is_em[-2:] = True
    tri = mesh.triangles()[is_em]
    c = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = np.linalg.norm(c, axis=-1) / 2
    save_emitter(os.path.join(out, "emitter.npz"), is_em, tri, area,
                 c / np.maximum(np.linalg.norm(c, axis=-1, keepdims=True),
                                1e-9),
                 np.full((2, 3), 8.0, np.float32))

    ngp = init_ngp_brdf(jax.random.PRNGKey(0), -0.1, 2.1,
                        HashGridConfig(n_levels=4, log2_table_size=8))
    crf = init_emor_crf(3)
    ck = os.path.join(out, "ckpt", "exp")
    os.makedirs(ck, exist_ok=True)
    save_pytree(os.path.join(ck, "last.pkl"),
                {"material": ngp, "crf_weight": crf.weight})

    yaml_cfg = os.path.join(out, "relight.yaml")
    with open(yaml_cfg, "w") as f:
        f.write("""
type: 'scene'
Integrator:
  type: 'path'
  max_depth: 3
main_scene:
  type: 'obj'
  filename: ''
  bsdf:
    type: 'twosided'
    fipt_bsdf:
      type: 'fipt'
light_ball:
  type: 'sphere'
  to_world:
    - type: 'translate'
      value: [0.6, 0.6, 0.6]
    - type: 'scale'
      value: [0.1, 0.1, 0.1]
  bsdf:
    type: 'diffuse'
    reflectance:
      type: 'rgb'
      value: [0., 0., 0.]
  emitter:
    type: 'area'
    radiance:
      type: 'rgb'
      value: [20., 18., 15.]
sphere_2:
  type: 'sphere'
  to_world:
    - type: 'translate'
      value: [1.4, 1.4, 0.3]
    - type: 'scale'
      value: [0.15, 0.15, 0.15]
  bsdf:
    type: 'conductor'
    material: 'Au'
""")

    from iris_tpu.pipeline import render_relight
    render_relight.main([
        "--dataset", "synthetic", root, "--ldr_img_dir", "ldr",
        "--experiment_name", "exp",
        "--checkpoint_path", os.path.join(out, "ckpt"),
        "--emitter_path", out,
        "--output_path", os.path.join(out, "frames"),
        "--light_cfg", yaml_cfg,
        "--mode", "traj", "--n_frames", "2",
        "--SPP", "4", "--spp", "4", "--disco", "1",
    ])
    pngs = [f for f in os.listdir(os.path.join(out, "frames"))
            if f.endswith(".png")]
    assert len(pngs) >= 2
