"""Multi-resolution hash-grid encoding (instant-NGP style), pure JAX.

TPU-native replacement for tiny-cuda-nn's HashGrid used by the reference
BRDF field (model/brdf.py:222-229: 32 levels x 2 features, 2^19 table,
base resolution 16, per-level scale 1.3). Levels whose dense grid fits the
table are indexed densely; larger levels use the standard spatial hash
(pi1=1, pi2=2654435761, pi3=805459861).

TPU-critical layout rules baked in (measured on v5e, see PERF.md):
- NO narrow trailing dimensions in intermediates: XLA pads the last two
  dims to (8,128) tiles, so (B, L, 8, 3) corner tensors or (M, 2) gather
  results blow up 16-64x in memory traffic (or fuse into serial loops).
  Everything here is component-wise: coordinates, weights, and the eight
  corner index arrays are separate (B*L,)/(8, M) arrays.
- Gathers and scatters go through FLAT 1-D indices one feature column at a
  time: 1-D gather/scatter outputs get the unpadded T(1024) layout and run
  at memory bandwidth (the padded 2-D forms are ~4000x slower).
- The table cotangent is built by a custom VJP with explicit `.at[].add`
  (JAX's automatic gather-VJP emits the pathological padded scatter).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@jax.tree_util.register_dataclass
@dataclass
class HashGridConfig:
    n_levels: int = field(default=32, metadata=dict(static=True))
    n_features: int = field(default=2, metadata=dict(static=True))
    log2_table_size: int = field(default=19, metadata=dict(static=True))
    base_resolution: int = field(default=16, metadata=dict(static=True))
    per_level_scale: float = field(default=1.3, metadata=dict(static=True))
    # pack both bf16 features into one uint32 element so each corner costs
    # ONE latency-bound gather instead of two (requires n_features == 2;
    # forward runs in bf16, gradients stay f32 — mixed precision like
    # tcnn's fp16 tables). Measured 2.2x encode fwd, 1.34x train step.
    packed_gather: bool = field(default=True, metadata=dict(static=True))
    # Stochastic-corner estimators (active only when hashgrid_encode gets a
    # PRNG key). Corner selection is SEPARABLE: each axis bit is an
    # independent Bernoulli(frac_axis), so the chosen corner has exactly its
    # trilinear weight as probability and the importance weight is exactly 1
    # — no weight products, unbiased by construction.
    #   stochastic_bwd: backward scatters the cotangent to the ONE sampled
    #     corner instead of all 8 (8x fewer latency-bound scatter elements;
    #     E[grad] = exact grad). Forward stays exact.
    #   stochastic_fwd: forward gathers the ONE sampled corner too (8x fewer
    #     gathers; E[feature] = trilinear feature, extra MC variance).
    stochastic_bwd: bool = field(default=True, metadata=dict(static=True))
    stochastic_fwd: bool = field(default=False, metadata=dict(static=True))
    # Strided level-block subsampling of the stochastic BACKWARD: each
    # train step draws ONE shared phase s and scatters cotangents only for
    # levels {s, s+stride, 2*stride+s, ...} (bwd_level_sample of n_levels;
    # stride = n_levels // bwd_level_sample), scaled by stride. Unbiased
    # randomized block-coordinate gradient (E over s = full gradient); the
    # phase-strided pattern samples every frequency band each step. Cuts
    # the latency-bound gradient scatter — measured 63% of the 32-level
    # train step — by n_levels/bwd_level_sample with NO extra gathers (the
    # shared phase makes the selection a strided slice). 0 = all levels.
    bwd_level_sample: int = field(default=0, metadata=dict(static=True))
    # Strided level-block subsampling of the stochastic FORWARD: each train
    # step draws ONE shared phase and gathers only fwd_level_sample of
    # n_levels levels (same strided-slice selection as bwd_level_sample),
    # scaling kept features by stride and zeroing the rest — inverse-scaled
    # block dropout on the encode. E over phases of the ENCODE is exact;
    # like stochastic_fwd itself, the estimate is biased through the
    # nonlinear MLP, so it is opt-in and quality-gated (PERF.md round 2f).
    # Cuts the per-step gather count AND all corner index math by
    # n_levels/fwd_level_sample. Requires stochastic_fwd; 0 = all levels.
    fwd_level_sample: int = field(default=0, metadata=dict(static=True))
    # ROW-GATHER mode (wide-feature levels): the table is laid out
    # feature-MINOR — element (level, entry, feature) at flat index
    # (level*T + entry)*F + feature — and each corner costs ONE (1, F) row
    # gather instead of F scalar (or F/2 packed) gathers. Row width is
    # nearly free on this backend (row-8 gather 9.1 ns vs scalar 11 ns,
    # PERF.md round-2e), so an equal-capacity config trades levels for
    # features (e.g. 8 levels x 8 features x 2^19 = same params and same
    # 64-wide MLP input as the reference 32x2) at ~1/4 the table accesses.
    # NOT the reference parameterization — opt-in, quality-gated like
    # fwd_level_sample. packed_gather is ignored in row mode.
    row_gather: bool = field(default=False, metadata=dict(static=True))
    # Store the row-mode table NATIVELY as (L*T, F) instead of flat with
    # a trace-time reshape. Bit-equal to the flat layout (unit-tested)
    # and device-measured NEUTRAL: encode fwd+bwd 89.53 vs 89.69 ms,
    # full step 96.20 vs 96.22 ms (records/rownative_r4.log) — XLA
    # already keeps the reshape free, refuting the round-4 tiled-layout
    # hypothesis for the encode-backward residue. Kept as a documented
    # negative result; default OFF (changes the param pytree:
    # checkpoints are layout-compatible only within one setting).
    row_native_layout: bool = field(default=False, metadata=dict(static=True))
    # COMPACT per-level-block gradient scatter (row mode): scatter each
    # sampled level's cotangents into its own (T, F) buffer and place the
    # buffers into the full-table cotangent with dynamic_update_slice.
    # Round-5 device attribution: scatter cost is set by the TARGET
    # working-set size, not update layout — (524K, 8) rows into the full
    # 134 MB (L*T, F) run at ~90-100 ns/row vs ~21 ns/row into a <=8 MB
    # target (records/scatter_size_r5.log; all four layout formulations
    # of the full-size scatter measured equal, refuting the round-4g
    # transposed-tiling theory). With bwd_level_sample active the updates
    # touch exactly bwd_k level blocks, so per-block compact scatters ride
    # the fast tier. bwd_scatter_dtype="bfloat16" halves the buffer to
    # 8 MB (28 ns/row measured vs 54 for the 16 MB f32 block); collisions
    # are rare (<=0.5 updates/row) so accumulation precision is set by a
    # single bf16 round (~0.4% rel) — noise-dominated by the stochastic
    # corner estimator itself. Set "float32" for exact accumulation.
    bwd_compact_scatter: bool = field(default=True, metadata=dict(static=True))
    bwd_scatter_dtype: str = field(default="bfloat16", metadata=dict(static=True))
    # Row-mode FORWARD gathers can read a bfloat16 cast of the table
    # (master params stay f32; features cast back after the gather).
    # Microbenched 2.5x on UNIFORM-RANDOM indices (records/
    # gather_block_r5.log: 5.9 vs 14.9 ns/row) but measured NEUTRAL at
    # the full step (records/bench_final_r5.log 4.07M vs the f32
    # bench_clean_r5 4.06M rays/s; 102K regime 2.10 vs 2.13M):
    # production queries are spatially SORTED, so the f32 gathers
    # already ride the cache and the wall is latency, not row bytes —
    # the round-2e finding again. Default therefore stays EXACT f32;
    # "bfloat16" remains a dial for workloads with uncorrelated access
    # patterns. Stochastic-estimator (training) paths only; eval /
    # render reads are always exact f32.
    fwd_gather_dtype: str = field(default="float32",
                                  metadata=dict(static=True))
    # Flat/packed mode (e.g. the 32Lx2F reference parameterization):
    # issue the forward gather per LEVEL BLOCK with local indices instead
    # of one global gather — each op's random accesses then stay inside
    # one 2 MB block (the fast gather tier, records/gather_block_r5.log:
    # 16.8M gathers 148.9 -> 124.0 ms). BIT-EXACT (same packed values),
    # so default ON; capped at 32 unrolled blocks.
    fwd_block_gather: bool = field(default=True, metadata=dict(static=True))

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    def resolutions(self) -> np.ndarray:
        l = np.arange(self.n_levels)
        return np.floor(
            self.base_resolution * self.per_level_scale ** l
        ).astype(np.int64)


def auto_bwd_level_sample(n_levels: int, ratio: int = 4) -> int:
    """Largest divisor of n_levels that is <= n_levels/ratio (>=1): the
    default ~ratio-x gradient-scatter reduction that quality A/Bs showed
    indistinguishable from the full scatter (PERF.md round 2)."""
    target = max(n_levels // ratio, 1)
    for k in range(target, 0, -1):
        if n_levels % k == 0:
            return k
    return 1


def init_hashgrid(key: jax.Array, cfg: HashGridConfig) -> jnp.ndarray:
    """Table params, uniform(-1e-4, 1e-4).

    Default: FLAT (F * L * T,). 1-D on purpose: a (L*T, F=2) array gets
    the (8,128)-tiled TPU layout — the 2-wide minor dim pads to 128
    lanes, a 64x memory/traffic blowup on every read of the parameter.
    Feature j's level tables live at [j*L*T, (j+1)*L*T).

    With cfg.row_gather + cfg.row_native_layout: (L*T, F) feature-minor
    rows — the layout every row-mode access already uses, stored
    natively so no flat<->row reshapes appear in the program (see the
    config field's hypothesis note).
    """
    if cfg.row_gather and cfg.row_native_layout:
        return jax.random.uniform(
            key, (cfg.n_levels * cfg.table_size, cfg.n_features),
            jnp.float32, -1e-4, 1e-4)
    n = cfg.n_features * cfg.n_levels * cfg.table_size
    return jax.random.uniform(key, (n,), jnp.float32, -1e-4, 1e-4)


def _lookup_impl(table, idxs, weights, n_features, block):
    m = idxs.shape[1]
    out = []
    for j in range(n_features):
        acc = jnp.zeros((m,), table.dtype)
        for k in range(idxs.shape[0]):
            acc = acc + table[idxs[k] + j * block] * weights[k]
        out.append(acc)
    return jnp.stack(out, 0)


def _lookup_packed_impl(table, idxs, weights, block):
    """Both bf16 features packed per uint32 element: one gather per corner."""
    m = idxs.shape[1]
    f0 = jax.lax.bitcast_convert_type(
        table[:block].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    f1 = jax.lax.bitcast_convert_type(
        table[block:].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    packed = f0 | (f1 << 16)
    packed = jax.lax.optimization_barrier(packed)
    acc0 = jnp.zeros((m,), jnp.float32)
    acc1 = jnp.zeros((m,), jnp.float32)
    for k in range(idxs.shape[0]):
        w = packed[idxs[k]]
        g0 = jax.lax.bitcast_convert_type(
            (w & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
        g1 = jax.lax.bitcast_convert_type(
            (w >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
        acc0 = acc0 + g0 * weights[k]
        acc1 = acc1 + g1 * weights[k]
    return jnp.stack([acc0, acc1], 0)


def weighted_lookup(table, idxs, weights, n_features: int, block: int):
    """Custom-VJP weighted lookup (see module docstring for layout rules).

    The backward builds the flat table cotangent with explicit 1-D
    `.at[].add` scatters — JAX's automatic gather-VJP emits a pathological
    padded scatter on TPU.
    """
    return _weighted_lookup_p(table, idxs, weights, n_features, block)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _weighted_lookup_p(table, idxs, weights, n_features, block):
    return _lookup_impl(table, idxs, weights, n_features, block)


def _weighted_lookup_fwd(table, idxs, weights, n_features, block):
    return (_lookup_impl(table, idxs, weights, n_features, block),
            (idxs, weights, table.shape[0]))


def _weighted_lookup_bwd(n_features, block, res, g):
    idxs, weights, tsize = res
    # NOTE: a complex64 single-scatter variant (folding both features into
    # one scatter) measured 6x SLOWER on TPU — complex scatters take a slow
    # path. Plain per-feature f32 1-D scatters are the fast formulation.
    acc = jnp.zeros((tsize,), g.dtype)
    for j in range(n_features):
        for k in range(idxs.shape[0]):
            acc = acc.at[idxs[k] + j * block].add(g[j] * weights[k])
    d_table = acc
    return (d_table,
            jnp.zeros(idxs.shape, jax.dtypes.float0),
            jnp.zeros(weights.shape, weights.dtype))


_weighted_lookup_p.defvjp(_weighted_lookup_fwd, _weighted_lookup_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _weighted_lookup_packed_p(table, idxs, weights, block):
    return _lookup_packed_impl(table, idxs, weights, block)


def _weighted_lookup_packed_fwd(table, idxs, weights, block):
    return (_lookup_packed_impl(table, idxs, weights, block),
            (idxs, weights, table.shape[0]))


def _weighted_lookup_packed_bwd(block, res, g):
    return _weighted_lookup_bwd(2, block, res, g)


_weighted_lookup_packed_p.defvjp(_weighted_lookup_packed_fwd,
                                 _weighted_lookup_packed_bwd)


# ------------------------------------------------- stochastic-corner lookups

def _scatter_chosen(g, chosen_idx, phase, n_features, block, tsize,
                    levels=0, bwd_k=0, tbl=0, compact=False):
    """Cotangent via ONE f32 1-D scatter per feature at the sampled corner.

    Unbiased: the corner was sampled with its trilinear weight as
    probability and importance weight exactly 1 (separable Bernoulli
    selection), so E[scatter] equals the exact 8-corner cotangent.

    With bwd_k in (0, levels): strided level-block subsampling — keep only
    levels {j*stride + phase} (a strided SLICE of the level-minor (B, L)
    layout, no gathers), scale by stride. E over phase = full cotangent.

    With `compact` (bwd_compact_scatter): per-(feature, level-block)
    scatters into (T,) buffers — 2 MB each, the fast scatter tier (see
    _row_scatter_chosen / PERF.md round 5) — placed into the flat
    cotangent with dynamic_update_slice. f32 buffers (already fast at
    2 MB; no precision trade needed, unlike the 16 MB row-mode blocks)."""
    cols = [g[j] for j in range(g.shape[0])]
    k_slots = levels or 1
    if bwd_k and levels and bwd_k < levels:
        stride = levels // bwd_k
        b = chosen_idx.shape[0] // levels
        scale = jnp.asarray(stride, g.dtype)

        def sel(a):
            # flat m = q*levels + lvl, lvl = j*stride + r  ->  slice r=phase
            a3 = a.reshape(b, bwd_k, stride)
            return jax.lax.squeeze(
                jax.lax.dynamic_slice_in_dim(a3, phase, 1, axis=2),
                (2,)).reshape(b * bwd_k)

        chosen_idx = sel(chosen_idx)
        cols = [sel(c) * scale for c in cols]
        k_slots = bwd_k
    # cap the unroll: past ~32 slot-scatters the per-slot row counts are
    # small and compile size dominates any residency win
    if not (compact and 0 < tbl < block and k_slots * len(cols) <= 32):
        acc = jnp.zeros((tsize,), cols[0].dtype)
        for j, c in enumerate(cols):
            acc = acc.at[chosen_idx + j * block].add(c)
        return acc
    b = chosen_idx.shape[0] // k_slots
    idx2 = chosen_idx.reshape(b, k_slots)
    acc = jnp.zeros((tsize,), cols[0].dtype)
    for s in range(k_slots):
        local = idx2[:, s] & (tbl - 1)
        base = (idx2[0, s] // tbl) * tbl   # uniform level block per slot
        for j, c in enumerate(cols):
            buf = jnp.zeros((tbl,), c.dtype).at[local].add(
                c.reshape(b, k_slots)[:, s])
            acc = jax.lax.dynamic_update_slice(acc, buf,
                                               (base + j * block,))
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _lookup_stoch_bwd_p(table, idxs, weights, chosen_idx, phase,
                        n_features, block, packed, levels, bwd_k,
                        tbl=0, compact=False):
    if packed:
        return _lookup_packed_impl(table, idxs, weights, block)
    return _lookup_impl(table, idxs, weights, n_features, block)


def _lookup_stoch_bwd_fwd(table, idxs, weights, chosen_idx, phase,
                          n_features, block, packed, levels, bwd_k,
                          tbl=0, compact=False):
    out = _lookup_stoch_bwd_p(table, idxs, weights, chosen_idx, phase,
                              n_features, block, packed, levels, bwd_k,
                              tbl, compact)
    return out, (chosen_idx, phase, table.shape[0], idxs.shape,
                 weights.shape)


def _lookup_stoch_bwd_bwd(n_features, block, packed, levels, bwd_k, tbl,
                          compact, res, g):
    chosen_idx, phase, tsize, ishape, wshape = res
    d_table = _scatter_chosen(g, chosen_idx, phase, n_features, block,
                              tsize, levels, bwd_k, tbl, compact)
    return (d_table,
            jnp.zeros(ishape, jax.dtypes.float0),
            jnp.zeros(wshape, jnp.float32),
            jnp.zeros(chosen_idx.shape, jax.dtypes.float0),
            jnp.zeros(phase.shape, jax.dtypes.float0))


_lookup_stoch_bwd_p.defvjp(_lookup_stoch_bwd_fwd, _lookup_stoch_bwd_bwd)


def _stoch_gather_impl(table, chosen_idx, n_features, block, packed,
                       levels=0, tbl=0, fwd_block=False):
    m = chosen_idx.shape[0]
    if packed:
        f0 = jax.lax.bitcast_convert_type(
            table[:block].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        f1 = jax.lax.bitcast_convert_type(
            table[block:].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        packed_t = jax.lax.optimization_barrier(f0 | (f1 << 16))
        if (fwd_block and levels and 0 < tbl < block and levels <= 32
                and m % levels == 0):
            # per-level-block gathers with local indices: confines each
            # gather op's random accesses to one 2 MB level block (the
            # fast tier) — BIT-EXACT vs the global gather (cfg.
            # fwd_block_gather; flat m = q*levels + lvl, every column of
            # the (B, L) view shares a level block by construction)
            b = m // levels
            idx2 = chosen_idx.reshape(b, levels)
            outs = []
            for s in range(levels):
                base = (idx2[0, s] // tbl) * tbl
                blk_t = jax.lax.dynamic_slice_in_dim(packed_t, base, tbl)
                outs.append(blk_t[idx2[:, s] - base])
            w = jnp.stack(outs, 1).reshape(-1)
        else:
            w = packed_t[chosen_idx]
        g0 = jax.lax.bitcast_convert_type(
            (w & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
        g1 = jax.lax.bitcast_convert_type(
            (w >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
        return jnp.stack([g0, g1], 0)
    return jnp.stack(
        [table[chosen_idx + j * block] for j in range(n_features)], 0)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _stoch_lookup_p(table, chosen_idx, phase, n_features, block, packed,
                    levels, bwd_k, tbl=0, compact=False, fwd_block=False):
    return _stoch_gather_impl(table, chosen_idx, n_features, block, packed,
                              levels, tbl, fwd_block)


def _stoch_lookup_fwd(table, chosen_idx, phase, n_features, block, packed,
                      levels, bwd_k, tbl=0, compact=False, fwd_block=False):
    return (_stoch_gather_impl(table, chosen_idx, n_features, block, packed,
                               levels, tbl, fwd_block),
            (chosen_idx, phase, table.shape[0]))


def _stoch_lookup_bwd(n_features, block, packed, levels, bwd_k, tbl,
                      compact, fwd_block, res, g):
    chosen_idx, phase, tsize = res
    d_table = _scatter_chosen(g, chosen_idx, phase, n_features, block,
                              tsize, levels, bwd_k, tbl, compact)
    return (d_table, jnp.zeros(chosen_idx.shape, jax.dtypes.float0),
            jnp.zeros(phase.shape, jax.dtypes.float0))


_stoch_lookup_p.defvjp(_stoch_lookup_fwd, _stoch_lookup_bwd)


# ---------------------------------------------------------- row-mode lookups
# (HashGridConfig.row_gather: feature-minor (L*T, F) rows, one gather/corner)

def _row_scatter_chosen(g_rows, chosen_idx, phase, lt, levels, bwd_k,
                        tsize=0, compact=None):
    """(M, F) cotangent -> (L*T, F) table cotangent via ONE row scatter per
    query at the sampled corner row. Same strided level-block subsampling
    as _scatter_chosen: flat m = q*levels + lvl, lvl = j*stride + phase.

    With `compact` (HashGridConfig.bwd_compact_scatter): scatter each
    sampled level's rows into a per-level (T, F) buffer — every index in
    one slot column shares a level block by construction — then place the
    buffers with dynamic_update_slice. Target-size cliffs make the small
    buffers ~3-5x faster per row than the full-table scatter
    (records/scatter_size_r5.log, round-5)."""
    f = g_rows.shape[1]
    k_slots = levels or 1
    if bwd_k and levels and bwd_k < levels:
        stride = levels // bwd_k
        b = chosen_idx.shape[0] // levels
        scale = jnp.asarray(stride, g_rows.dtype)
        idx3 = chosen_idx.reshape(b, bwd_k, stride)
        chosen_idx = jax.lax.squeeze(
            jax.lax.dynamic_slice_in_dim(idx3, phase, 1, axis=2),
            (2,)).reshape(b * bwd_k)
        g4 = g_rows.reshape(b, bwd_k, stride, f)
        g_rows = jax.lax.squeeze(
            jax.lax.dynamic_slice_in_dim(g4, phase, 1, axis=2),
            (2,)).reshape(b * bwd_k, f) * scale
        k_slots = bwd_k
    # unroll cap mirrors the flat path's (:287): each slot unrolls one
    # scatter + dynamic_update_slice, and a 32L config with
    # bwd_level_sample=0 would otherwise emit 32 pairs — a compile-time
    # blowup on a backend where fresh compiles already take 10-20 min.
    # Past the cap, fall back to the single full-table scatter.
    if not (compact and 0 < tsize < lt and k_slots <= 16):
        return jnp.zeros((lt, f), g_rows.dtype).at[chosen_idx].add(g_rows)
    out_dtype = g_rows.dtype
    acc_dtype = jnp.bfloat16 if compact == "bfloat16" else out_dtype
    b = chosen_idx.shape[0] // k_slots
    idx2 = chosen_idx.reshape(b, k_slots)
    g3 = g_rows.astype(acc_dtype).reshape(b, k_slots, f)
    full = jnp.zeros((lt, f), out_dtype)
    for j in range(k_slots):
        local = idx2[:, j] & (tsize - 1)
        base = (idx2[0, j] // tsize) * tsize   # uniform block per slot
        buf = jnp.zeros((tsize, f), acc_dtype).at[local].add(g3[:, j])
        full = jax.lax.dynamic_update_slice_in_dim(
            full, buf.astype(out_dtype), base, axis=0)
    return full


def _row_lookup_impl(rows, idxs, weights):
    acc = jnp.zeros((idxs.shape[1], rows.shape[1]), rows.dtype)
    for k in range(idxs.shape[0]):
        acc = acc + rows[idxs[k]] * weights[k][:, None]
    return acc


@jax.custom_vjp
def _row_weighted_p(rows, idxs, weights):
    return _row_lookup_impl(rows, idxs, weights)


def _row_weighted_fwd(rows, idxs, weights):
    return _row_lookup_impl(rows, idxs, weights), (idxs, weights,
                                                   rows.shape[0])


def _row_weighted_bwd(res, g):
    idxs, weights, lt = res
    acc = jnp.zeros((lt, g.shape[1]), g.dtype)
    for k in range(idxs.shape[0]):
        acc = acc.at[idxs[k]].add(g * weights[k][:, None])
    return (acc, jnp.zeros(idxs.shape, jax.dtypes.float0),
            jnp.zeros(weights.shape, weights.dtype))


_row_weighted_p.defvjp(_row_weighted_fwd, _row_weighted_bwd)


def _row_cast(rows, gdtype):
    """Mixed-precision forward reads (cfg.fwd_gather_dtype): gather from
    a bf16 cast of the (L*T, F) rows — 16 B rows fetch at 5.9 vs 14.9
    ns/row (records/gather_block_r5.log) — master params stay f32 and
    the cast is a single streaming pass (~0.3 ms on the 134 MB table)."""
    if gdtype == "bfloat16" and rows.dtype != jnp.bfloat16:
        return rows.astype(jnp.bfloat16)
    return rows


def _row_lookup_gd(rows, idxs, weights, gdtype):
    rcast = _row_cast(rows, gdtype)
    acc = jnp.zeros((idxs.shape[1], rows.shape[1]), rows.dtype)
    for k in range(idxs.shape[0]):
        acc = acc + rcast[idxs[k]].astype(rows.dtype) * weights[k][:, None]
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _row_stoch_bwd_p(rows, idxs, weights, chosen_idx, phase, levels, bwd_k,
                     tsize=0, compact=None, gdtype=None):
    return _row_lookup_gd(rows, idxs, weights, gdtype)


def _row_stoch_bwd_fwd(rows, idxs, weights, chosen_idx, phase, levels,
                       bwd_k, tsize=0, compact=None, gdtype=None):
    out = _row_lookup_gd(rows, idxs, weights, gdtype)
    return out, (chosen_idx, phase, rows.shape[0], idxs.shape,
                 weights.shape)


def _row_stoch_bwd_bwd(levels, bwd_k, tsize, compact, gdtype, res, g):
    chosen_idx, phase, lt, ishape, wshape = res
    return (_row_scatter_chosen(g, chosen_idx, phase, lt, levels, bwd_k,
                                tsize, compact),
            jnp.zeros(ishape, jax.dtypes.float0),
            jnp.zeros(wshape, jnp.float32),
            jnp.zeros(chosen_idx.shape, jax.dtypes.float0),
            jnp.zeros(phase.shape, jax.dtypes.float0))


_row_stoch_bwd_p.defvjp(_row_stoch_bwd_fwd, _row_stoch_bwd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _row_stoch_p(rows, chosen_idx, phase, levels, bwd_k, tsize=0,
                 compact=None, gdtype=None):
    return _row_cast(rows, gdtype)[chosen_idx].astype(rows.dtype)


def _row_stoch_fwd(rows, chosen_idx, phase, levels, bwd_k, tsize=0,
                   compact=None, gdtype=None):
    return (_row_cast(rows, gdtype)[chosen_idx].astype(rows.dtype),
            (chosen_idx, phase, rows.shape[0]))


def _row_stoch_bwd2(levels, bwd_k, tsize, compact, gdtype, res, g):
    chosen_idx, phase, lt = res
    return (_row_scatter_chosen(g, chosen_idx, phase, lt, levels, bwd_k,
                                tsize, compact),
            jnp.zeros(chosen_idx.shape, jax.dtypes.float0),
            jnp.zeros(phase.shape, jax.dtypes.float0))


_row_stoch_p.defvjp(_row_stoch_fwd, _row_stoch_bwd2)


def hashgrid_encode(
    table: jnp.ndarray, cfg: HashGridConfig, x: jnp.ndarray,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Encode positions x (B, 3) in [0,1]^3 -> features (B, L*F).

    With `key` and cfg.stochastic_{bwd,fwd}, runs the unbiased
    stochastic-corner estimators (see HashGridConfig docstring)."""
    if cfg.bwd_scatter_dtype not in ("bfloat16", "float32"):
        # a typo ("bf16", "fp32") would otherwise silently fall back to
        # float32 buffers and lose the 8 MB fast-tier optimization
        raise ValueError(
            f"bwd_scatter_dtype must be 'bfloat16' or 'float32', got "
            f"{cfg.bwd_scatter_dtype!r}")
    if cfg.fwd_gather_dtype not in ("bfloat16", "float32"):
        raise ValueError(
            f"fwd_gather_dtype must be 'bfloat16' or 'float32', got "
            f"{cfg.fwd_gather_dtype!r}")
    b = x.shape[0]
    l = cfg.n_levels
    res_np = cfg.resolutions()
    res = jnp.asarray(res_np, jnp.float32)              # (L,)
    res_i = jnp.asarray(res_np + 1, jnp.uint32)         # vertices per axis
    dense_ok = jnp.asarray(
        ((res_np + 1).astype(np.int64) ** 3) <= cfg.table_size)
    level_off = jnp.asarray(
        np.arange(cfg.n_levels, dtype=np.int64) * cfg.table_size,
        jnp.uint32)
    mask = jnp.uint32(cfg.table_size - 1)

    x = jnp.clip(x, 0.0, 1.0)

    stoch = key is not None and (cfg.stochastic_bwd or cfg.stochastic_fwd)

    # strided level-block subsampling of the forward gather (see
    # HashGridConfig.fwd_level_sample): slice every per-level array to the
    # fwd_k sampled levels BEFORE any per-query math, so index computation,
    # corner sampling and the gather all shrink by the stride.
    if (cfg.fwd_level_sample and key is not None
            and not cfg.stochastic_fwd):
        raise ValueError("fwd_level_sample requires stochastic_fwd")
    fwd_k = (cfg.fwd_level_sample
             if (stoch and cfg.stochastic_fwd) else 0)
    fphase = None
    if fwd_k and 0 < fwd_k < l:
        if l % fwd_k:
            raise ValueError(
                f"fwd_level_sample={fwd_k} must divide n_levels={l}")
        key, k_fphase = jax.random.split(key)
        fstride = l // fwd_k
        fphase = jax.random.randint(k_fphase, (), 0, fstride)

        def lsel(a):
            a2 = jnp.asarray(a).reshape(fwd_k, fstride)
            return jax.lax.squeeze(
                jax.lax.dynamic_slice_in_dim(a2, fphase, 1, axis=1), (1,))

        res, res_i = lsel(res), lsel(res_i)
        dense_ok, level_off = lsel(dense_ok), lsel(level_off)
        l_eff = fwd_k
    else:
        fwd_k = 0
        l_eff = l

    # everything below lives in FLAT (M,) = (B*L,) 1-D arrays: 1-D layouts
    # are unpadded T(1024); any (B, L) or (..., 3) shape gets (8,128)-tiled
    # with large sublane padding.
    res_u = jnp.broadcast_to(res_i[None, :], (b, l_eff)).reshape(-1)
    dense_f = jnp.broadcast_to(dense_ok[None, :], (b, l_eff)).reshape(-1)
    off_f = jnp.broadcast_to(level_off[None, :], (b, l_eff)).reshape(-1)

    def corner_index(cx, cy, cz):
        dense = cx + res_u * (cy + res_u * cz)
        hashed = (cx * jnp.uint32(_PRIMES[0])
                  ^ cy * jnp.uint32(_PRIMES[1])
                  ^ cz * jnp.uint32(_PRIMES[2])) & mask
        return (jnp.where(dense_f, dense, hashed) + off_f).astype(jnp.int32)

    cell = []
    frac = []
    for c in range(3):
        p = (x[:, c:c + 1] * res[None, :]).reshape(-1)   # (M,)
        c0 = jnp.floor(p)
        cell.append(c0.astype(jnp.uint32))
        frac.append(p - c0)

    blk = cfg.n_levels * cfg.table_size
    packed = cfg.packed_gather and cfg.n_features == 2

    # strided level-block subsampling of the backward scatter (see
    # HashGridConfig.bwd_level_sample): one shared phase per step. With
    # fwd_level_sample active it nests inside the fwd-sampled levels.
    bwd_k = cfg.bwd_level_sample if stoch else 0
    phase = jnp.zeros((), jnp.int32)
    if bwd_k and 0 < bwd_k < l_eff:
        if l_eff % bwd_k:
            raise ValueError(
                f"bwd_level_sample={bwd_k} must divide the "
                f"{'fwd-sampled ' if fwd_k else ''}level count {l_eff}")
        key, k_phase = jax.random.split(key)
        phase = jax.random.randint(k_phase, (), 0, l_eff // bwd_k)
    else:
        bwd_k = 0

    chosen_idx = None
    if stoch:
        # Separable corner sampling: per-axis Bernoulli(frac) — the chosen
        # corner's probability IS its trilinear weight, importance weight 1.
        u3 = jax.random.uniform(key, (3, b * l_eff))
        bits = [u3[c] < jax.lax.stop_gradient(frac[c]) for c in range(3)]
        chosen_idx = corner_index(
            cell[0] + bits[0].astype(jnp.uint32),
            cell[1] + bits[1].astype(jnp.uint32),
            cell[2] + bits[2].astype(jnp.uint32),
        )

    rows = None
    if cfg.row_gather:
        rows = (table if table.ndim == 2
                else table.reshape(cfg.n_levels * cfg.table_size,
                                   cfg.n_features))

    if stoch and cfg.stochastic_fwd:
        # 1 gather + (in bwd) 1 scatter per feature, both at the sampled
        # corner — the full 8-corner index/weight arrays are never built.
        chosen_idx = jax.lax.optimization_barrier(chosen_idx)
        if cfg.row_gather:
            compact = (cfg.bwd_scatter_dtype
                       if cfg.bwd_compact_scatter else None)
            fr = _row_stoch_p(rows, chosen_idx, phase, l_eff, bwd_k,
                              cfg.table_size, compact,
                              cfg.fwd_gather_dtype)
        else:
            feats = _stoch_lookup_p(table, chosen_idx, phase,
                                    cfg.n_features, blk, packed, l_eff,
                                    bwd_k, cfg.table_size,
                                    cfg.bwd_compact_scatter,
                                    cfg.fwd_block_gather)
    else:
        idxs = []
        weights = []
        for k in range(8):
            kx, ky, kz = (k >> 2) & 1, (k >> 1) & 1, k & 1
            idxs.append(corner_index(cell[0] + jnp.uint32(kx),
                                     cell[1] + jnp.uint32(ky),
                                     cell[2] + jnp.uint32(kz)))
            wx = frac[0] if kx else 1.0 - frac[0]
            wy = frac[1] if ky else 1.0 - frac[1]
            wz = frac[2] if kz else 1.0 - frac[2]
            weights.append(wx * wy * wz)

        idxs = jnp.stack(idxs, 0)                        # (8, M)
        weights = jax.lax.stop_gradient(jnp.stack(weights, 0))
        # Fusion barrier: letting XLA fuse the index computation into the
        # gathers turns them into a serial fused loop (~5000x slower on TPU,
        # see PERF.md). Materialize indices/weights first.
        idxs, weights = jax.lax.optimization_barrier((idxs, weights))
        if cfg.row_gather:
            if stoch and cfg.stochastic_bwd:
                chosen_idx = jax.lax.optimization_barrier(chosen_idx)
                compact = (cfg.bwd_scatter_dtype
                           if cfg.bwd_compact_scatter else None)
                fr = _row_stoch_bwd_p(rows, idxs, weights, chosen_idx,
                                      phase, l_eff, bwd_k,
                                      cfg.table_size, compact,
                                      cfg.fwd_gather_dtype)
            else:
                fr = _row_weighted_p(rows, idxs, weights)
        elif stoch and cfg.stochastic_bwd:
            chosen_idx = jax.lax.optimization_barrier(chosen_idx)
            feats = _lookup_stoch_bwd_p(table, idxs, weights, chosen_idx,
                                        phase, cfg.n_features, blk, packed,
                                        l_eff, bwd_k, cfg.table_size,
                                        cfg.bwd_compact_scatter)
        elif packed:
            feats = _weighted_lookup_packed_p(table, idxs, weights, blk)
        else:
            feats = weighted_lookup(table, idxs, weights, cfg.n_features,
                                    blk)
    if cfg.row_gather:
        # (M, F) row-major IS (B, L*F) after a free reshape (level-major,
        # feature-minor per level — a fixed permutation of the non-row
        # output, absorbed by the learned first MLP layer).
        fdim = cfg.n_features
        if fwd_k:
            fscale = jnp.asarray(l // fwd_k, fr.dtype)
            z = jnp.zeros((b, fwd_k, l // fwd_k, fdim), fr.dtype)
            z = jax.lax.dynamic_update_slice_in_dim(
                z, (fr * fscale).reshape(b, fwd_k, 1, fdim), fphase, axis=2)
            return z.reshape(b, l * fdim)
        return fr.reshape(b, l_eff * fdim)
    # (F, B*L) -> (B, F*L); feature order is a fixed permutation absorbed
    # by the learned first MLP layer, so no 3-D transpose is needed.
    if fwd_k:
        # place the fwd-sampled levels back into the full (B, L) feature
        # layout: kept levels scaled by the stride (inverse-dropout), the
        # rest zero. The strided positions are a dynamic_update_slice on
        # the (B, K, stride) view — no scatters.
        fscale = jnp.asarray(l // fwd_k, feats.dtype)

        def place(col):
            z = jnp.zeros((b, fwd_k, l // fwd_k), col.dtype)
            z = jax.lax.dynamic_update_slice_in_dim(
                z, (col * fscale).reshape(b, fwd_k, 1), fphase, axis=2)
            return z.reshape(b, l)

        return jnp.concatenate(
            [place(feats[j]) for j in range(cfg.n_features)], axis=-1)
    return jnp.concatenate(
        [feats[j].reshape(b, l) for j in range(cfg.n_features)], axis=-1)
