from iris_tpu.geometry.mesh import Mesh, load_mesh
from iris_tpu.geometry.bvh import build_bvh, Tracer
from iris_tpu.geometry.intersect import ray_intersect, ray_intersect_brute
