// Binned-SAH / spatial-split (SBVH) BVH builder (native component of
// iris_tpu).
//
// Role: the reference delegates acceleration-structure builds to Mitsuba's
// embedded native code (utils/path_tracing.py:17-48 loads the scene into
// Mitsuba which builds its OptiX-quality BVH in C++); here the equivalent is
// an in-tree builder emitting the flat preorder array layout consumed by the
// JAX/Pallas traversal (see iris_tpu/geometry/bvh.py for the layout
// contract):
//   nodes[n*8]  = {min.xyz, max.xyz, skip, desc}
//   tris [p*12] = {v0, e1, e2, face_id, pad, pad}
// desc >= 1 -> internal, 1-based first (left) child; desc <= 0 -> leaf whose
// padded triangle rows start at -desc (leaf_size consecutive rows).
//
// Build: top-down over a REFERENCE list (face id + clipped AABB). Each node
// considers
//   (a) binned object SAH over all 3 axes (16 centroid bins/axis), and
//   (b) when the best object split's children overlap more than
//       alpha * root surface area, chopped-binning SPATIAL splits over all
//       3 axes (Stich et al. 2009, "Spatial Splits in Bounding Volume
//       Hierarchies"): a straddling reference is clipped against the split
//       plane and a duplicate goes to each side, removing the child overlap
//       that makes object-only SAH trees slow on architectural scenes
//       (axis-aligned walls / long thin clutter spanning many cells).
// Reference duplication is capped at kDupBudget * n_faces; past the budget
// nodes fall back to object splits. A preorder flatten pass then threads
// skip pointers as continuations. Duplicated references emit the FULL
// original triangle rows — triangle tests are exact, so duplicate hits are
// idempotent under the traversal's min-reduction, and only the node bounds
// are clipped.

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline float vget(const Vec3 &v, int axis) {
  return axis == 0 ? v.x : axis == 1 ? v.y : v.z;
}

struct AABB {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const Vec3 &p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  void grow(const AABB &b) {
    lo = vmin(lo, b.lo);
    hi = vmax(hi, b.hi);
  }
  bool valid() const { return lo.x <= hi.x; }
  float area() const {
    if (!valid()) return 0.f;
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
  Vec3 centroid() const {
    return {0.5f * (lo.x + hi.x), 0.5f * (lo.y + hi.y),
            0.5f * (lo.z + hi.z)};
  }
  AABB intersect(const AABB &o) const {
    AABB r;
    r.lo = vmax(lo, o.lo);
    r.hi = vmin(hi, o.hi);
    return r;
  }
};

// One primitive reference: a face id plus the (possibly plane-clipped) box
// of the part of that face assigned to this subtree.
struct Ref {
  AABB box;
  int64_t id;
};

constexpr int kBins = 16;
constexpr float kDupBudget = 1.8f;  // max total refs / n_faces

// Clip the triangle (full original geometry) to the axis slab
// [slab_lo, slab_hi] and return the clipped polygon's AABB intersected
// with `within` (the reference's current box). Sutherland–Hodgman against
// the two parallel planes; a triangle clipped by two planes has <= 5
// vertices, but we keep room for the general bound.
static AABB clip_tri_to_slab(const Vec3 *v, int axis, float slab_lo,
                             float slab_hi, const AABB &within) {
  Vec3 poly[8];
  int n = 3;
  poly[0] = v[0];
  poly[1] = v[1];
  poly[2] = v[2];
  Vec3 tmp[8];
  // clip against x >= slab_lo, then x <= slab_hi
  for (int pass = 0; pass < 2; ++pass) {
    float plane = pass == 0 ? slab_lo : slab_hi;
    float sign = pass == 0 ? 1.f : -1.f;  // keep sign*(x - plane) >= 0
    int m = 0;
    for (int i = 0; i < n; ++i) {
      const Vec3 &a = poly[i];
      const Vec3 &b = poly[(i + 1) % n];
      float da = sign * (vget(a, axis) - plane);
      float db = sign * (vget(b, axis) - plane);
      if (da >= 0.f) {
        tmp[m++] = a;
        if (db < 0.f) {
          float t = da / (da - db);
          tmp[m++] = {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y),
                      a.z + t * (b.z - a.z)};
        }
      } else if (db >= 0.f) {
        float t = da / (da - db);
        tmp[m++] = {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y),
                    a.z + t * (b.z - a.z)};
      }
    }
    n = m;
    for (int i = 0; i < n; ++i) poly[i] = tmp[i];
    if (n == 0) break;
  }
  AABB out;
  for (int i = 0; i < n; ++i) out.grow(poly[i]);
  return out.intersect(within);
}

struct TreeNode {
  AABB box;
  int64_t left = -1, right = -1;     // indices into the tree vector
  std::vector<int64_t> faces;        // face ids when leaf
};

struct Builder {
  int leaf_size;
  float alpha;                 // spatial-split admission threshold (<0: off)
  const float *src_tris;       // (n_faces, 9) vertex data for clipping
  int64_t n_faces = 0;
  int64_t ref_budget = 0;      // remaining allowed duplicates
  float root_area = 1.f;
  std::vector<TreeNode> tree;

  const Vec3 *verts(int64_t face) const {
    return reinterpret_cast<const Vec3 *>(src_tris + face * 9);
  }

  int64_t make_leaf(const AABB &bounds, std::vector<Ref> &refs) {
    int64_t idx = (int64_t)tree.size();
    tree.push_back({});
    tree[idx].box = bounds;
    auto &f = tree[idx].faces;
    f.reserve(refs.size());
    for (const Ref &r : refs) f.push_back(r.id);
    // a spatial-split pipeline can route two clipped halves of one face
    // into the same leaf; dedup so the leaf rows stay tight
    std::sort(f.begin(), f.end());
    f.erase(std::unique(f.begin(), f.end()), f.end());
    return idx;
  }

  int64_t build(std::vector<Ref> refs) {
    AABB bounds, cbounds;
    for (const Ref &r : refs) {
      bounds.grow(r.box);
      cbounds.grow(r.box.centroid());
    }
    int64_t count = (int64_t)refs.size();
    if (count <= leaf_size) return make_leaf(bounds, refs);

    // ---- candidate 1: binned object SAH, all 3 axes -------------------
    float best_obj = FLT_MAX;
    int obj_axis = -1, obj_split = -1;
    AABB obj_l, obj_r;
    for (int axis = 0; axis < 3; ++axis) {
      float lo = vget(cbounds.lo, axis);
      float extent = vget(cbounds.hi, axis) - lo;
      if (extent < 1e-12f) continue;
      AABB bin_box[kBins];
      int64_t bin_cnt[kBins] = {0};
      float inv = kBins / extent;
      for (const Ref &r : refs) {
        int b = (int)((vget(r.box.centroid(), axis) - lo) * inv);
        b = std::min(std::max(b, 0), kBins - 1);
        bin_box[b].grow(r.box);
        bin_cnt[b]++;
      }
      AABB lacc[kBins];
      int64_t lcnt[kBins];
      {
        AABB acc;
        int64_t cnt = 0;
        for (int b = 0; b < kBins; ++b) {
          acc.grow(bin_box[b]);
          cnt += bin_cnt[b];
          lacc[b] = acc;
          lcnt[b] = cnt;
        }
      }
      AABB racc;
      int64_t rcnt = 0;
      for (int b = kBins - 1; b >= 1; --b) {
        racc.grow(bin_box[b]);
        rcnt += bin_cnt[b];
        if (lcnt[b - 1] == 0 || rcnt == 0) continue;
        float cost = lacc[b - 1].area() * lcnt[b - 1] + racc.area() * rcnt;
        if (cost < best_obj) {
          best_obj = cost;
          obj_axis = axis;
          obj_split = b;
          obj_l = lacc[b - 1];
          obj_r = racc;
        }
      }
    }

    // ---- candidate 2: chopped-binning spatial split -------------------
    // admitted only when the object children overlap enough to matter
    // (SBVH alpha criterion) and the duplication budget is not exhausted
    float best_sp = FLT_MAX;
    int sp_axis = -1, sp_split = -1;
    bool try_spatial = alpha >= 0.f && ref_budget > 0;
    if (try_spatial && obj_axis >= 0) {
      float lap = obj_l.intersect(obj_r).area();
      if (lap <= alpha * root_area) try_spatial = false;
    }
    if (try_spatial) {
      for (int axis = 0; axis < 3; ++axis) {
        float lo = vget(bounds.lo, axis);
        float extent = vget(bounds.hi, axis) - lo;
        if (extent < 1e-12f) continue;
        AABB bin_box[kBins];
        int64_t entry[kBins] = {0}, exit_[kBins] = {0};
        float inv = kBins / extent;
        float width = extent / kBins;
        for (const Ref &r : refs) {
          int b0 = (int)((vget(r.box.lo, axis) - lo) * inv);
          int b1 = (int)((vget(r.box.hi, axis) - lo) * inv);
          b0 = std::min(std::max(b0, 0), kBins - 1);
          b1 = std::min(std::max(b1, b0), kBins - 1);
          entry[b0]++;
          exit_[b1]++;
          if (b0 == b1) {
            bin_box[b0].grow(r.box);
          } else {
            const Vec3 *v = verts(r.id);
            for (int b = b0; b <= b1; ++b) {
              AABB c = clip_tri_to_slab(v, axis, lo + b * width,
                                        lo + (b + 1) * width, r.box);
              if (c.valid()) bin_box[b].grow(c);
            }
          }
        }
        AABB lacc[kBins];
        {
          AABB acc;
          for (int b = 0; b < kBins; ++b) {
            acc.grow(bin_box[b]);
            lacc[b] = acc;
          }
        }
        AABB racc;
        int64_t lcnt = 0, rcnt = count;
        // prefix counts: left of plane b = sum entry[<b]; right = exit[>=b]
        int64_t entry_pre = 0;
        int64_t exit_suf[kBins + 1];
        exit_suf[kBins] = 0;
        for (int b = kBins - 1; b >= 0; --b)
          exit_suf[b] = exit_suf[b + 1] + exit_[b];
        AABB racc_arr[kBins];
        {
          AABB acc;
          for (int b = kBins - 1; b >= 0; --b) {
            acc.grow(bin_box[b]);
            racc_arr[b] = acc;
          }
        }
        for (int b = 1; b < kBins; ++b) {
          entry_pre += entry[b - 1];
          lcnt = entry_pre;
          rcnt = exit_suf[b];
          if (lcnt == 0 || rcnt == 0) continue;
          float cost = lacc[b - 1].area() * lcnt + racc_arr[b].area() * rcnt;
          if (cost < best_sp) {
            best_sp = cost;
            sp_axis = axis;
            sp_split = b;
          }
        }
      }
    }

    std::vector<Ref> lrefs, rrefs;
    if (sp_axis >= 0 && best_sp < best_obj) {
      // spatial split at plane sp_split of sp_axis
      float lo = vget(bounds.lo, sp_axis);
      float extent = vget(bounds.hi, sp_axis) - lo;
      float plane = lo + extent * sp_split / kBins;
      lrefs.reserve(refs.size());
      rrefs.reserve(refs.size());
      int64_t dup = 0;
      for (const Ref &r : refs) {
        if (vget(r.box.hi, sp_axis) <= plane) {
          lrefs.push_back(r);
        } else if (vget(r.box.lo, sp_axis) >= plane) {
          rrefs.push_back(r);
        } else if (ref_budget - dup > 0) {
          const Vec3 *v = verts(r.id);
          AABB lb = clip_tri_to_slab(v, sp_axis, -FLT_MAX, plane, r.box);
          AABB rb = clip_tri_to_slab(v, sp_axis, plane, FLT_MAX, r.box);
          if (lb.valid() && rb.valid()) {
            lrefs.push_back({lb, r.id});
            rrefs.push_back({rb, r.id});
            dup++;
          } else if (lb.valid()) {
            lrefs.push_back({lb, r.id});
          } else if (rb.valid()) {
            rrefs.push_back({rb, r.id});
          } else {
            // degenerate clip (sliver triangle): keep on the wider side
            (vget(r.box.centroid(), sp_axis) < plane ? lrefs : rrefs)
                .push_back(r);
          }
        } else {
          (vget(r.box.centroid(), sp_axis) < plane ? lrefs : rrefs)
              .push_back(r);
        }
      }
      ref_budget -= dup;
      if (lrefs.empty() || rrefs.empty()) {
        lrefs.clear();
        rrefs.clear();
      }
    }
    if (lrefs.empty() && rrefs.empty()) {
      if (obj_axis >= 0) {
        // object split at the best binned plane
        float lo = vget(cbounds.lo, obj_axis);
        float extent = vget(cbounds.hi, obj_axis) - lo;
        float inv = kBins / extent;
        for (const Ref &r : refs) {
          int b = (int)((vget(r.box.centroid(), obj_axis) - lo) * inv);
          b = std::min(std::max(b, 0), kBins - 1);
          (b < obj_split ? lrefs : rrefs).push_back(r);
        }
      }
      if (lrefs.empty() || rrefs.empty()) {
        // degenerate (all centroids coincide): median split on any order
        lrefs.clear();
        rrefs.clear();
        int64_t mid = count / 2;
        std::nth_element(refs.begin(), refs.begin() + mid, refs.end(),
                         [](const Ref &a, const Ref &b) {
                           return vget(a.box.centroid(), 0) <
                                  vget(b.box.centroid(), 0);
                         });
        lrefs.assign(refs.begin(), refs.begin() + mid);
        rrefs.assign(refs.begin() + mid, refs.end());
      }
    }
    refs.clear();
    refs.shrink_to_fit();

    int64_t idx = (int64_t)tree.size();
    tree.push_back({});
    tree[idx].box = bounds;
    int64_t l = build(std::move(lrefs));
    int64_t r = build(std::move(rrefs));
    tree[idx].left = l;
    tree[idx].right = r;
    return idx;
  }
};

struct Flattener {
  const Builder *b;
  const float *src_tris;
  int leaf_size;
  std::vector<float> nodes;
  std::vector<float> out_tris;

  // Preorder write with skip-pointer continuations.
  void flatten(int64_t t, float skip) {
    const TreeNode &n = b->tree[t];
    int64_t idx = (int64_t)nodes.size() / 8;
    nodes.insert(nodes.end(), 8, 0.f);
    float *p = &nodes[idx * 8];
    p[0] = n.box.lo.x; p[1] = n.box.lo.y; p[2] = n.box.lo.z;
    p[3] = n.box.hi.x; p[4] = n.box.hi.y; p[5] = n.box.hi.z;
    p[6] = skip;
    if (n.left < 0) {  // leaf: pad face rows to a leaf_size multiple
      int64_t start = (int64_t)out_tris.size() / 12;
      for (int64_t id : n.faces) {
        const float *tv = src_tris + id * 9;
        float row[12] = {
            tv[0], tv[1], tv[2],
            tv[3] - tv[0], tv[4] - tv[1], tv[5] - tv[2],
            tv[6] - tv[0], tv[7] - tv[1], tv[8] - tv[2],
            (float)id, 0.f, 0.f};
        out_tris.insert(out_tris.end(), row, row + 12);
      }
      int64_t pad = (int64_t)n.faces.size() % leaf_size;
      if (pad || n.faces.empty())
        for (int64_t i = pad ? pad : 0; i < leaf_size; ++i) {
          float row[12] = {0, 0, 0, 0, 0, 0, 0, 0, 0, -1.f, 0, 0};
          out_tris.insert(out_tris.end(), row, row + 12);
        }
      nodes[idx * 8 + 7] = -(float)start;
      return;
    }
    nodes[idx * 8 + 7] = (float)(idx + 2);  // left child is next (1-based)
    flatten(n.left, 0.f);                    // placeholder skip, fixed below
    int64_t right_pos = (int64_t)nodes.size() / 8;
    fix_skip(idx + 1, (float)(right_pos + 1));
    flatten(n.right, skip);
  }

  // The left subtree was flattened with skip=0 at its root; every node on
  // its rightmost continuation chain inherited that 0. Rewrite them.
  void fix_skip(int64_t i, float skip) {
    for (;;) {
      float *p = &nodes[i * 8];
      p[6] = skip;
      float desc = p[7];
      if (desc <= 0.f) return;         // leaf
      int64_t left = (int64_t)desc - 1;
      float lskip = nodes[left * 8 + 6];
      i = (int64_t)lskip - 1;          // right child (1-based -> 0-based)
    }
  }
};

}  // namespace

extern "C" {

// spatial_alpha: SBVH admission threshold as a fraction of root surface
// area (Stich et al. use 1e-5); negative disables spatial splits (pure
// binned object SAH, the round-1..4 behavior).
int build_bvh_sah(const float *tris, int64_t n_faces, int leaf_size,
                  float spatial_alpha, float *nodes_out, int64_t nodes_cap,
                  float *tris_out, int64_t tris_cap, int64_t *n_nodes_out,
                  int64_t *n_rows_out) {
  Builder b;
  b.leaf_size = leaf_size;
  b.alpha = spatial_alpha;
  b.src_tris = tris;
  b.n_faces = n_faces;
  b.ref_budget = (int64_t)((kDupBudget - 1.f) * (float)n_faces);
  std::vector<Ref> refs(n_faces);
  AABB root;
  for (int64_t i = 0; i < n_faces; ++i) {
    const float *t = tris + i * 9;
    AABB box;
    box.grow(Vec3{t[0], t[1], t[2]});
    box.grow(Vec3{t[3], t[4], t[5]});
    box.grow(Vec3{t[6], t[7], t[8]});
    refs[i] = {box, i};
    root.grow(box);
  }
  b.root_area = std::max(root.area(), 1e-20f);
  b.tree.reserve(2 * (size_t)n_faces);
  b.build(std::move(refs));

  Flattener f;
  f.b = &b;
  f.src_tris = tris;
  f.leaf_size = leaf_size;
  f.nodes.reserve(b.tree.size() * 8);
  f.out_tris.reserve(((size_t)n_faces + leaf_size) * 12);
  f.flatten(0, 0.f);

  int64_t n_nodes = (int64_t)f.nodes.size() / 8;
  int64_t n_rows = (int64_t)f.out_tris.size() / 12;
  if (n_nodes > nodes_cap || n_rows > tris_cap) return -1;
  std::memcpy(nodes_out, f.nodes.data(), f.nodes.size() * sizeof(float));
  std::memcpy(tris_out, f.out_tris.data(),
              f.out_tris.size() * sizeof(float));
  *n_nodes_out = n_nodes;
  *n_rows_out = n_rows;
  return 0;
}

}  // extern "C"
