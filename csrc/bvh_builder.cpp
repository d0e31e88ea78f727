// Binned-SAH BVH builder (native component of iris_tpu).
//
// Role: the reference delegates acceleration-structure builds to Mitsuba's
// embedded native code (utils/path_tracing.py:17-48 loads the scene into
// Mitsuba which builds its BVH in C++); here the equivalent is an in-tree
// builder emitting the flat preorder array layout consumed by the JAX/Pallas
// traversal (see iris_tpu/geometry/bvh.py for the layout contract):
//   nodes[n*8]  = {min.xyz, max.xyz, skip, desc}
//   tris [p*12] = {v0, e1, e2, face_id, pad, pad}
// desc >= 1 -> internal, 1-based first (left) child; desc <= 0 -> leaf whose
// padded triangle rows start at -desc (leaf_size consecutive rows).
//
// Build: top-down binned SAH (16 bins on the largest centroid axis) into a
// pointer tree, then a preorder flatten pass that threads skip pointers as
// continuations.

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
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
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
};

struct Prim {
  AABB box;
  Vec3 centroid;
  int64_t id;
};

struct TreeNode {
  AABB box;
  int64_t left = -1, right = -1;   // indices into the tree vector
  int64_t begin = 0, end = 0;      // prim range when leaf
};

constexpr int kBins = 16;

struct Builder {
  int leaf_size;
  std::vector<Prim> prims;
  std::vector<TreeNode> tree;

  int64_t build(int64_t begin, int64_t end) {
    AABB bounds, cbounds;
    for (int64_t i = begin; i < end; ++i) {
      bounds.grow(prims[i].box);
      cbounds.grow(prims[i].centroid);
    }
    int64_t idx = (int64_t)tree.size();
    tree.push_back({});
    tree[idx].box = bounds;
    int64_t count = end - begin;
    if (count <= leaf_size) {
      tree[idx].begin = begin;
      tree[idx].end = end;
      return idx;
    }

    float ext[3] = {cbounds.hi.x - cbounds.lo.x, cbounds.hi.y - cbounds.lo.y,
                    cbounds.hi.z - cbounds.lo.z};
    int axis = ext[1] > ext[0] ? 1 : 0;
    if (ext[2] > ext[axis]) axis = 2;
    auto cval = [axis](const Prim &p) {
      return axis == 0 ? p.centroid.x : axis == 1 ? p.centroid.y
                                                  : p.centroid.z;
    };
    float lo = axis == 0 ? cbounds.lo.x : axis == 1 ? cbounds.lo.y
                                                    : cbounds.lo.z;
    float extent = ext[axis];

    int64_t mid = begin + count / 2;
    bool median = extent < 1e-12f;
    if (!median) {
      AABB bin_box[kBins];
      int64_t bin_cnt[kBins] = {0};
      auto bin_of = [&](const Prim &p) {
        int b = (int)((cval(p) - lo) / extent * kBins);
        return std::min(std::max(b, 0), kBins - 1);
      };
      for (int64_t i = begin; i < end; ++i) {
        int b = bin_of(prims[i]);
        bin_box[b].grow(prims[i].box);
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
      float best = FLT_MAX;
      int split = -1;
      AABB racc;
      int64_t rcnt = 0;
      for (int b = kBins - 1; b >= 1; --b) {
        racc.grow(bin_box[b]);
        rcnt += bin_cnt[b];
        if (lcnt[b - 1] == 0 || rcnt == 0) continue;
        float cost = lacc[b - 1].area() * lcnt[b - 1] + racc.area() * rcnt;
        if (cost < best) {
          best = cost;
          split = b;
        }
      }
      if (split < 0) {
        median = true;
      } else {
        auto it = std::partition(
            prims.begin() + begin, prims.begin() + end,
            [&](const Prim &p) { return bin_of(p) < split; });
        mid = it - prims.begin();
        if (mid == begin || mid == end) median = true;
      }
    }
    if (median) {
      mid = begin + count / 2;
      std::nth_element(prims.begin() + begin, prims.begin() + mid,
                       prims.begin() + end,
                       [&](const Prim &a, const Prim &b) {
                         return cval(a) < cval(b);
                       });
    }

    int64_t l = build(begin, mid);
    int64_t r = build(mid, end);
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

  // Assign preorder positions, then write with continuations.
  void flatten(int64_t t, float skip) {
    const TreeNode &n = b->tree[t];
    int64_t idx = (int64_t)nodes.size() / 8;
    nodes.insert(nodes.end(), 8, 0.f);
    float *p = &nodes[idx * 8];
    p[0] = n.box.lo.x; p[1] = n.box.lo.y; p[2] = n.box.lo.z;
    p[3] = n.box.hi.x; p[4] = n.box.hi.y; p[5] = n.box.hi.z;
    p[6] = skip;
    if (n.left < 0) {  // leaf
      int64_t start = (int64_t)out_tris.size() / 12;
      for (int64_t i = n.begin; i < n.end; ++i) {
        const float *tv = src_tris + b->prims[i].id * 9;
        float row[12] = {
            tv[0], tv[1], tv[2],
            tv[3] - tv[0], tv[4] - tv[1], tv[5] - tv[2],
            tv[6] - tv[0], tv[7] - tv[1], tv[8] - tv[2],
            (float)b->prims[i].id, 0.f, 0.f};
        out_tris.insert(out_tris.end(), row, row + 12);
      }
      for (int64_t i = n.end - n.begin; i < leaf_size; ++i) {
        float row[12] = {0, 0, 0, 0, 0, 0, 0, 0, 0, -1.f, 0, 0};
        out_tris.insert(out_tris.end(), row, row + 12);
      }
      nodes[idx * 8 + 7] = -(float)start;
      return;
    }
    nodes[idx * 8 + 7] = (float)(idx + 2);  // left child is next (1-based)
    flatten(n.left, 0.f);                    // placeholder skip, fixed below
    int64_t right_pos = (int64_t)nodes.size() / 8;
    // rewrite left child's skip now that the right position is known:
    fix_skip(idx + 1, (float)(right_pos + 1));
    flatten(n.right, skip);
  }

  // The left subtree was flattened with skip=0 at its root; every node on
  // its "rightmost continuation chain" inherited that 0. Rewrite them.
  void fix_skip(int64_t i, float skip) {
    for (;;) {
      float *p = &nodes[i * 8];
      p[6] = skip;
      float desc = p[7];
      if (desc <= 0.f) return;         // leaf
      // right child of i = the preorder successor of the left subtree,
      // which also carries skip 0; it is the last place skip==0 continues.
      // Walk: left child chain end -> its skip was set to right child when
      // that subtree was flattened; so the only remaining 0-skip chain is
      // via the right child. Find right child: it was flattened after the
      // left subtree; its index = the value we wrote into the left child's
      // skip during flatten of i (already final). Retrieve from left child:
      int64_t left = (int64_t)desc - 1;
      float lskip = nodes[left * 8 + 6];
      i = (int64_t)lskip - 1;          // right child (1-based -> 0-based)
    }
  }
};

}  // namespace

extern "C" {

int build_bvh_sah(const float *tris, int64_t n_faces, int leaf_size,
                  float *nodes_out, int64_t nodes_cap, float *tris_out,
                  int64_t tris_cap, int64_t *n_nodes_out,
                  int64_t *n_rows_out) {
  Builder b;
  b.leaf_size = leaf_size;
  b.prims.resize(n_faces);
  for (int64_t i = 0; i < n_faces; ++i) {
    const float *t = tris + i * 9;
    AABB box;
    box.grow(Vec3{t[0], t[1], t[2]});
    box.grow(Vec3{t[3], t[4], t[5]});
    box.grow(Vec3{t[6], t[7], t[8]});
    b.prims[i] = {box,
                  {(t[0] + t[3] + t[6]) / 3.f, (t[1] + t[4] + t[7]) / 3.f,
                   (t[2] + t[5] + t[8]) / 3.f},
                  i};
  }
  b.tree.reserve(2 * (size_t)n_faces);
  b.build(0, n_faces);

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
