"""Texture export: bake the learned BRDF field into albedo / roughness-
metallic textures + a UV-mapped OBJ.

Role parity with reference utils/export.py (xatlas unwrap + nvdiffrast
rasterize), implemented natively:
- default `charts` mode: seam-aware chart unwrap (utils/uv_unwrap.py —
  normal-gated region growing, planar projection with fold repair, shelf
  packing, barycentric atlas rasterization, gutter dilation);
- legacy `grid` mode: uniform per-face square charts.
The hash-grid BRDF is queried at every covered texel's surface point and
baked into albedo / roughness-metallic PNGs + a UV-mapped OBJ that drops
into any DCC tool.
"""

from __future__ import annotations

import math
import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.mesh import load_mesh
from iris_tpu.models.brdf import ngp_brdf_apply
from iris_tpu.train.checkpoint import load_pytree
from iris_tpu.utils.image import save_image


def export_textures_charts(mesh, material, res: int = 1024,
                           normal_cos: float = 0.8):
    """Chart-atlas texture bake. Returns (albedo, rm, uvs (F,3,2))."""
    from iris_tpu.utils.uv_unwrap import (
        dilate_texture, rasterize_atlas, unwrap,
    )

    uv01, _, res = unwrap(mesh, res=res, normal_cos=normal_cos)
    tri = np.asarray(mesh.triangles(), np.float64)
    rows, cols, pts, mask = rasterize_atlas(tri, uv01, res)

    albedo_tex = np.zeros((res, res, 3), np.float32)
    rm_tex = np.zeros((res, res, 3), np.float32)
    query = jax.jit(lambda p: ngp_brdf_apply(material, p))
    for c0 in range(0, len(pts), 262144):
        c1 = min(c0 + 262144, len(pts))
        mat = query(jnp.asarray(pts[c0:c1]))
        albedo_tex[rows[c0:c1], cols[c0:c1]] = np.asarray(mat["albedo"])
        rm_tex[rows[c0:c1], cols[c0:c1], 1] = np.asarray(
            mat["roughness"])[:, 0]
        rm_tex[rows[c0:c1], cols[c0:c1], 2] = np.asarray(
            mat["metallic"])[:, 0]
    albedo_tex = dilate_texture(albedo_tex, mask)
    rm_tex = dilate_texture(rm_tex, mask)
    # OBJ vt convention: v up, image row 0 at top
    uvs = np.stack([uv01[..., 0], 1.0 - uv01[..., 1]], -1).astype(
        np.float32)
    # array row r is sampled by a renderer at vt v' = 1 - r/res, which
    # maps back to PNG row r from the top — same convention as the grid
    # path, so no flip
    return albedo_tex, rm_tex, uvs


def export_textures(mesh, material, texels_per_face: int = 8,
                    max_res: int = 4096):
    """Returns (albedo_tex (R,R,3), rm_tex (R,R,3), uvs (F,3,2))."""
    f = mesh.n_faces
    charts_per_row = int(math.ceil(math.sqrt(f)))
    res = min(charts_per_row * texels_per_face, max_res)
    charts_per_row = res // texels_per_face
    tpf = texels_per_face

    tri = mesh.triangles()
    # barycentric lattice per chart (lower triangle of the square)
    ii, jj = np.meshgrid(np.arange(tpf), np.arange(tpf), indexing="ij")
    u = (ii + 0.33) / tpf
    v = (jj + 0.33) / tpf
    w = np.clip(1.0 - u - v, 0.0, 1.0)
    # positions: (F, tpf*tpf, 3)
    albedo_tex = np.zeros((res, res, 3), np.float32)
    rm_tex = np.zeros((res, res, 3), np.float32)

    query = jax.jit(lambda p: ngp_brdf_apply(material, p))
    chunk = 65536 // (tpf * tpf) or 1
    for c0 in range(0, f, chunk):
        c1 = min(c0 + chunk, f)
        t = tri[c0:c1]
        pts = (t[:, None, None, 0] * w[None, ..., None]
               + t[:, None, None, 1] * u[None, ..., None]
               + t[:, None, None, 2] * v[None, ..., None])
        mat = query(jnp.asarray(pts.reshape(-1, 3), jnp.float32))
        alb = np.asarray(mat["albedo"]).reshape(c1 - c0, tpf, tpf, 3)
        rough = np.asarray(mat["roughness"]).reshape(c1 - c0, tpf, tpf)
        metal = np.asarray(mat["metallic"]).reshape(c1 - c0, tpf, tpf)
        for k in range(c1 - c0):
            fi = c0 + k
            r0 = (fi // charts_per_row) * tpf
            c0_ = (fi % charts_per_row) * tpf
            albedo_tex[r0: r0 + tpf, c0_: c0_ + tpf] = alb[k]
            rm_tex[r0: r0 + tpf, c0_: c0_ + tpf, 1] = rough[k]
            rm_tex[r0: r0 + tpf, c0_: c0_ + tpf, 2] = metal[k]

    # per-face UVs: triangle corners of each chart
    uvs = np.zeros((f, 3, 2), np.float32)
    for fi in range(f):
        r0 = (fi // charts_per_row) * tpf
        c0_ = (fi % charts_per_row) * tpf
        # corners (w=1), (u=1), (v=1) in texel space -> uv space
        corners = np.asarray([[c0_, r0], [c0_ + tpf - 1, r0],
                              [c0_, r0 + tpf - 1]], np.float32)
        uvs[fi] = np.stack([
            (corners[:, 0] + 0.5) / res, 1.0 - (corners[:, 1] + 0.5) / res,
        ], -1)
    return albedo_tex, rm_tex, uvs


def write_obj_with_uvs(path, mesh, uvs, mtl_name="material0"):
    base = os.path.splitext(path)[0]
    with open(base + ".mtl", "w") as m:
        m.write(f"newmtl {mtl_name}\nmap_Kd albedo.png\n")
    with open(path, "w") as f:
        f.write(f"mtllib {os.path.basename(base)}.mtl\nusemtl {mtl_name}\n")
        for vtx in mesh.vertices:
            f.write(f"v {vtx[0]} {vtx[1]} {vtx[2]}\n")
        for face_uv in uvs.reshape(-1, 2):
            f.write(f"vt {face_uv[0]} {face_uv[1]}\n")
        for i, face in enumerate(mesh.faces):
            a, b, c = face + 1
            t = 3 * i + 1
            f.write(f"f {a}/{t} {b}/{t + 1} {c}/{t + 2}\n")


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--mesh", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--texels_per_face", type=int, default=8)
    parser.add_argument("--unwrap", type=str, default="charts",
                        choices=["charts", "grid"])
    parser.add_argument("--res", type=int, default=1024)
    args = parser.parse_args(argv)

    mesh = load_mesh(args.mesh)
    material = load_pytree(args.ckpt)["material"]
    os.makedirs(args.output, exist_ok=True)
    if args.unwrap == "charts":
        albedo, rm, uvs = export_textures_charts(mesh, material, args.res)
    else:
        albedo, rm, uvs = export_textures(mesh, material,
                                          args.texels_per_face)
    save_image(albedo, os.path.join(args.output, "albedo.png"))
    save_image(rm, os.path.join(args.output, "rm.png"))
    write_obj_with_uvs(os.path.join(args.output, "scene_uv.obj"), mesh, uvs)
    print("[export] wrote textures + UV obj to", args.output)


if __name__ == "__main__":
    main()
