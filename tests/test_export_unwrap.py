"""Chart-based UV unwrap (utils/uv_unwrap.py): geometric invariants +
round-trip texture bake through the export CLI."""

import os

import numpy as np

from iris_tpu.geometry.procedural import make_box_scene
from iris_tpu.utils.uv_unwrap import (
    dilate_texture, pack_charts, rasterize_atlas, unwrap,
)


def _mesh():
    mesh, _ = make_box_scene(n_clutter=3, seed=2)
    return mesh


def test_unwrap_uvs_in_bounds_and_area_preserving():
    mesh = _mesh()
    res = 256
    uv01, chart, res = unwrap(mesh, res=res)
    assert uv01.shape == (mesh.n_faces, 3, 2)
    assert (uv01 >= 0).all() and (uv01 <= 1).all()
    assert chart.min() >= 0

    # uniform texel density: per-face uv area / world area ratio is the
    # same for every (non-degenerate) face
    tri = np.asarray(mesh.triangles(), np.float64)
    w_area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1)
    e1 = uv01[:, 1] - uv01[:, 0]
    e2 = uv01[:, 2] - uv01[:, 0]
    uv_area = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    keep = w_area > 1e-9
    ratio = uv_area[keep] / w_area[keep]
    assert ratio.std() / ratio.mean() < 0.02, "non-uniform chart scaling"


def test_unwrap_no_interchart_overlap():
    """No two faces of DIFFERENT charts may claim the same texel (seam
    correctness — the whole point over the per-face grid)."""
    mesh = _mesh()
    res = 256
    uv01, chart, res = unwrap(mesh, res=res)
    tri = np.asarray(mesh.triangles(), np.float64)
    owner = np.full((res, res), -1, np.int64)
    clash = 0
    for fi in range(len(tri)):
        rows, cols, _, _ = rasterize_atlas(tri[fi:fi + 1],
                                           uv01[fi:fi + 1], res)
        prev = owner[rows, cols]
        clash += int(((prev != -1) & (prev != chart[fi])).sum())
        owner[rows, cols] = chart[fi]
    assert clash == 0, f"{clash} texels claimed by multiple charts"


def test_dilate_fills_gutters_only():
    tex = np.zeros((16, 16, 3), np.float32)
    mask = np.zeros((16, 16), bool)
    tex[4:8, 4:8] = 1.0
    mask[4:8, 4:8] = True
    out = dilate_texture(tex, mask, iters=2)
    assert np.array_equal(out[4:8, 4:8], tex[4:8, 4:8])  # valid untouched
    assert out[3, 5, 0] == 1.0 and out[2, 5, 0] == 1.0   # 2 rings filled
    assert out[0, 0, 0] == 0.0                            # far bg untouched


def test_export_cli_charts(tmp_path):
    import jax

    from iris_tpu.geometry.mesh import save_ply
    from iris_tpu.models.brdf import init_ngp_brdf
    from iris_tpu.models.hashgrid import HashGridConfig
    from iris_tpu.train.checkpoint import save_pytree
    from iris_tpu.utils import export as E

    mesh = _mesh()
    mp = str(tmp_path / "scene.ply")
    save_ply(mp, mesh.vertices, mesh.faces)
    ngp = init_ngp_brdf(jax.random.PRNGKey(0), -0.1, 2.1,
                        HashGridConfig(n_levels=4, log2_table_size=8))
    cp = str(tmp_path / "ckpt.pkl")
    save_pytree(cp, {"material": ngp})
    out = str(tmp_path / "tex")
    E.main(["--mesh", mp, "--ckpt", cp, "--output", out,
            "--unwrap", "charts", "--res", "256"])
    from iris_tpu.utils.image import open_png
    alb = open_png(os.path.join(out, "albedo.png"))
    assert alb.shape == (256, 256, 3)
    assert alb.mean() > 0.05   # atlas actually covered
    obj = open(os.path.join(out, "scene_uv.obj")).read()
    assert obj.count("vt ") == mesh.n_faces * 3
