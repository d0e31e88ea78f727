"""Per-scene relight/insert config surface (round-4 verdict item 6).

Covers the three YAML variants the reference ships per scene
(configs/{fipt,scannetpp}/*/{insert,relight_0,relight_1}.yaml, ported to
scripts/relight/): object insertion with per-object to_world + conductor /
roughconductor, emitter-swap meshes, and the YAML disco_ball block — all
driven through pipeline/render_relight.py on the hermetic demo dataset.
"""

import os

import numpy as np
import pytest

from iris_tpu.data.make_demo_dataset import make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------- schema translation unit

def test_bsdf_from_yaml_mapping():
    from iris_tpu.pipeline.render_relight import _bsdf_from_yaml

    # twosided-wrapped fipt (main_scene in every config)
    b = _bsdf_from_yaml({"type": "twosided",
                         "fipt_bsdf": {"type": "fipt", "emitter_path": "",
                                       "brdf_path": ""}})
    assert b == {"type": "fipt"}

    # conductor presets read at the bsdf level (kitchen insert sphere_2,
    # bathroom2 insert spot.obj 'Au', room2 bunny 'Cu')
    au = _bsdf_from_yaml({"type": "conductor", "material": "Au"})
    cu = _bsdf_from_yaml({"type": "conductor", "material": "Cu"})
    assert au["type"] == cu["type"] == "conductor"
    assert au["reflectance"] != cu["reflectance"]
    assert au["reflectance"][0] > au["reflectance"][2]  # gold: red > blue

    # roughconductor: eta/k -> normal-incidence F0, alpha -> roughness
    # (room2 insert andersen block)
    rc = _bsdf_from_yaml({
        "type": "roughconductor", "distribution": "ggx",
        "alpha_u": 0.05, "alpha_v": 0.3,
        "eta": {"type": "rgb", "value": [0.47, 0.35, 0.29]},
        "k": {"type": "rgb", "value": [0.332, 0.239, 0.235]},
    })
    assert rc["type"] == "conductor"
    assert rc["roughness"] == pytest.approx((0.05 * 0.3) ** 0.25)
    f0 = np.asarray(rc["reflectance"])
    assert (f0 > 0).all() and (f0 < 1).all()
    eta, k = 0.47, 0.332
    assert f0[0] == pytest.approx(
        ((eta - 1) ** 2 + k ** 2) / ((eta + 1) ** 2 + k ** 2))

    # diffuse rgb
    d = _bsdf_from_yaml({"type": "diffuse",
                         "reflectance": {"type": "rgb",
                                         "value": [0.2, 0.25, 0.7]}})
    assert d == {"type": "diffuse", "reflectance": [0.2, 0.25, 0.7]}


def test_ported_scene_configs_translate(monkeypatch, tmp_path):
    """All 21 ported per-scene configs (+ the demo) translate into native
    shapes; the 3 scannetpp/conferenceroom relight_1 files carry the
    disco_ball block; every insert config produces >= 1 conductor."""
    import yaml

    from iris_tpu.geometry.mesh import load_mesh
    from iris_tpu.pipeline import render_relight as rr

    demo_root = str(tmp_path / "ds")
    make_dataset(demo_root, img_hw=(16, 20), n_train=1, n_val=1, spp=4,
                 indir_depth=1)
    demo_mesh = load_mesh(os.path.join(demo_root, "scene.obj"))
    # asset meshes aren't shipped (placeholders) — resolve every filename
    # to the demo mesh for the parse sweep
    monkeypatch.setattr(rr, "load_mesh", lambda path: demo_mesh)

    cfg_files = []
    for dirpath, _, files in os.walk(os.path.join(REPO, "scripts",
                                                  "relight")):
        cfg_files += [os.path.join(dirpath, f) for f in files
                      if f.endswith(".yaml")]
    assert len(cfg_files) >= 22  # 7 scenes x 3 variants + demo_ball

    n_disco = n_insert_conductor = 0
    for p in cfg_files:
        with open(p) as f:
            cfg = yaml.safe_load(f)
        shapes, depth, fov, disco = rr.shapes_from_yaml(cfg, "unused")
        kinds = [s["bsdf"]["type"] for s in shapes]
        assert kinds.count("fipt") == 1, p  # exactly one main scene
        assert depth >= 1 and fov > 0
        if disco is not None:
            n_disco += 1
            assert {"position", "radius"} <= set(disco)
        if p.endswith("insert.yaml"):
            n_insert_conductor += ("conductor" in kinds)
            # per-object to_world survives into mesh geometry: inserted
            # meshes must differ from the raw demo mesh when transformed
            for name, item in cfg.items():
                if isinstance(item, dict) and item.get("type") == "obj" \
                        and item.get("filename") and item.get("to_world"):
                    idx = [i for i, s in enumerate(shapes)
                           if s["kind"] == "mesh"]
                    moved = any(
                        not np.allclose(shapes[i]["tris"],
                                        demo_mesh.triangles())
                        for i in idx[1:])
                    assert moved, p
    assert n_disco == 3          # {bathroom2, room2, conferenceroom}
    assert n_insert_conductor == 7  # every insert config inserts a metal


# ------------------------------------------------------- e2e on demo scene

@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("relight_cfg_ds"))
    make_dataset(root, img_hw=(24, 32), n_train=3, n_val=1, spp=8,
                 indir_depth=1)
    out = str(tmp_path_factory.mktemp("relight_cfg_out"))

    import jax

    from iris_tpu.geometry.mesh import load_mesh
    from iris_tpu.models.brdf import init_ngp_brdf
    from iris_tpu.models.crf import init_emor_crf
    from iris_tpu.models.hashgrid import HashGridConfig
    from iris_tpu.pipeline.common import save_emitter
    from iris_tpu.train.checkpoint import save_pytree

    mesh = load_mesh(os.path.join(root, "scene.obj"))
    is_em = np.zeros(mesh.n_faces, bool)
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

    # a small inserted asset: tetrahedron OBJ
    asset = os.path.join(out, "tetra.obj")
    with open(asset, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
                "f 1 2 3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n")
    return root, out, asset


def _run(root, out, yaml_body, tag, extra=()):
    yaml_cfg = os.path.join(out, f"{tag}.yaml")
    with open(yaml_cfg, "w") as f:
        f.write(yaml_body)
    from iris_tpu.pipeline import render_relight
    render_relight.main([
        "--dataset", "synthetic", root, "--ldr_img_dir", "ldr",
        "--experiment_name", "exp",
        "--checkpoint_path", os.path.join(out, "ckpt"),
        "--emitter_path", out,
        "--output_path", os.path.join(out, tag),
        "--light_cfg", yaml_cfg,
        "--mode", "traj", "--n_frames", "2",
        "--SPP", "4", "--spp", "4", *extra,
    ])
    pngs = [f for f in os.listdir(os.path.join(out, tag))
            if f.endswith(".png")]
    assert len(pngs) >= 2


def test_insert_obj_conductor_e2e(setup):
    """insert.yaml shape: obj insertion with per-object to_world +
    conductor AND roughconductor (reference configs/scannetpp/room2/
    insert.yaml:50-92, fipt/kitchen/insert.yaml:23-45)."""
    root, out, asset = setup
    _run(root, out, f"""
type: 'scene'
Integrator: {{type: 'path', max_depth: 3}}
main_scene:
  type: 'obj'
  filename: ''
  bsdf:
    type: 'twosided'
    fipt_bsdf: {{type: 'fipt'}}
light_ball:
  type: 'sphere'
  to_world:
    - {{type: 'translate', value: [0.6, 0.6, 1.2]}}
    - {{type: 'scale', value: [0.1, 0.1, 0.1]}}
  bsdf:
    type: 'diffuse'
    reflectance: {{type: 'rgb', value: [0., 0., 0.]}}
  emitter:
    type: 'area'
    radiance: {{type: 'rgb', value: [25., 25., 25.]}}
spot:
  type: 'obj'
  filename: '{asset}'
  to_world:
    - {{type: 'translate', value: [1.2, 1.2, 0.2]}}
    - {{type: 'scale', value: [0.3, 0.3, 0.3]}}
    - {{type: 'rotate', axis: [0, 0, 1], angle: -90}}
  bsdf: {{type: 'conductor', material: 'Au'}}
andersen:
  type: 'obj'
  filename: '{asset}'
  to_world:
    - {{type: 'translate', value: [0.4, 1.3, 0.2]}}
    - {{type: 'scale', value: [0.25, 0.25, 0.25]}}
  bsdf:
    type: 'roughconductor'
    distribution: 'ggx'
    alpha_u: 0.05
    alpha_v: 0.3
    eta: {{type: 'rgb', value: [0.47, 0.35, 0.29]}}
    k: {{type: 'rgb', value: [0.332, 0.239, 0.235]}}
""", "insert_frames")


def test_relight_emitter_swap_disco_e2e(setup):
    """relight_1.yaml shape: emitter-swap (emissive mesh replaces the
    scene light) + the YAML disco_ball block (reference configs/
    scannetpp/bathroom2/relight_1.yaml:22-41)."""
    root, out, asset = setup
    _run(root, out, f"""
type: 'scene'
Integrator: {{type: 'path', max_depth: 3}}
main_scene:
  type: 'obj'
  filename: ''
  bsdf:
    type: 'twosided'
    fipt_bsdf: {{type: 'fipt'}}
new_emitter:
  type: 'obj'
  filename: '{asset}'
  to_world:
    - {{type: 'translate', value: [1.0, 1.0, 1.5]}}
    - {{type: 'scale', value: [0.2, 0.2, 0.2]}}
  bsdf:
    type: 'diffuse'
    reflectance: {{type: 'rgb', value: [0., 0., 0.]}}
  emitter:
    type: 'area'
    radiance: {{type: 'rgb', value: [9.0, 9.7, 10.6]}}
disco_ball:
  T: 60
  position: [1.0, 1.0, 0.8]
  radius: 0.15
  light_intensity: 40
  light_num: 8
  light_radius_rate: 0.1
  spot_intensity: 0.5
  spot_cutoff_angle: 20.0
""", "relight_frames")
