"""Texture export: bake the learned BRDF field into albedo / roughness-
metallic textures + a UV-mapped OBJ.

Role parity with reference utils/export.py (xatlas unwrap + nvdiffrast
rasterize). Neither library exists here, so the unwrap is a uniform
per-face grid atlas: every triangle receives its own square chart of
`texels_per_face`^2 texels; chart texel centers are mapped to barycentric
surface points, the hash-grid BRDF is queried there, and the result is
splatted into the texture. Crude but complete: the OBJ + PNGs drop into any
DCC tool.
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
    args = parser.parse_args(argv)

    mesh = load_mesh(args.mesh)
    material = load_pytree(args.ckpt)["material"]
    os.makedirs(args.output, exist_ok=True)
    albedo, rm, uvs = export_textures(mesh, material, args.texels_per_face)
    save_image(albedo, os.path.join(args.output, "albedo.png"))
    save_image(rm, os.path.join(args.output, "rm.png"))
    write_obj_with_uvs(os.path.join(args.output, "scene_uv.obj"), mesh, uvs)
    print("[export] wrote textures + UV obj to", args.output)


if __name__ == "__main__":
    main()
