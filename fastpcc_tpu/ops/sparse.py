"""Sparse voxel-grid core: Morton-code-based multiscale point-cloud structure.

TPU-native replacement for MinkowskiEngine / torchsparse coordinate managers
(reference backends, SURVEY §1 L1). Design:

  * A scale level is (codes, count): ``codes`` is a **sorted** int64 array of
    packed (batch | inverse-Morton) keys padded to a static size with
    INVALID_CODE; ``count`` is the number of valid entries. Features ride in a
    separate [N, C] array aligned with codes.
  * Batch index is packed above the Morton bits: code = b << 3*bits | morton.
    Sorting by code groups points by sample then by Z-order, which makes
    stride-2 downsampling a parent-key compaction (the reference monkey-patches
    torchsparse's spdownsample to exploit exactly this property —
    reference: lossl_coord/model.py:280-302).
  * All shapes are static; compaction scatters into same-capacity arrays.
  * 2x2x2 "fold" occupancy (the reference's identity sparse conv ``get_bin``,
    reference: lossl_coord/model.py:355-374) is pure code arithmetic here:
    parent = morton >> 3, octant = code & 7.
  * 3^3 stride-1 sparse convolution uses a neighbor table built once per scale
    by vectorized binary search over the sorted codes (Minuet-style sorted
    lookup instead of GPU hash maps), then gather -> MXU GEMM accumulation.
"""
import contextlib
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .morton import morton_decode, morton_encode

# Padding sentinel: sorts after every valid code (codes use at most 60+2
# bits: 3*bits Morton + batch). A plain Python int and a single-bit value on
# purpose — embedding int64 scalars like 2^63-1 or ~((1<<48)-1) as program
# constants trips a pathological slow mode in this TPU runtime (every
# subsequent dispatch in the process degrades to ~2s; bisected empirically),
# while single-bit literals and in-trace-computed masks are safe.
INVALID_CODE = 1 << 62


class VoxelGrid(struct.PyTreeNode):
    """One scale level of a (batched) sparse voxel set."""
    codes: jax.Array                  # [N] int64 sorted; INVALID_CODE padding
    count: jax.Array                  # [] int32 number of valid entries
    bits: int = struct.field(pytree_node=False)        # Morton bits per axis
    stride_log2: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.codes.shape[0]

    @property
    def morton_mask(self) -> jax.Array:
        return (jnp.int64(1) << (3 * self.bits)) - 1

    def valid_mask(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.count

    def batch_index(self) -> jax.Array:
        return (self.codes >> (3 * self.bits)).astype(jnp.int32)

    def coords(self) -> jax.Array:
        """[N, 3] int32 voxel coords at this scale (garbage in padding)."""
        return morton_decode(self.codes & self.morton_mask)


def pack_codes(xyz: jax.Array, batch: Optional[jax.Array], bits: int) -> jax.Array:
    code = morton_encode(xyz)
    if batch is not None:
        code = code | (batch.astype(jnp.int64) << (3 * bits))
    return code


def pad_to(arr: jax.Array, n: int, fill) -> jax.Array:
    """Pad/trim leading axis to length n with a fill value."""
    if arr.shape[0] == n:
        return arr
    if arr.shape[0] > n:
        return arr[:n]
    pad_widths = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad_widths, constant_values=fill)


def grid_from_sorted_codes(codes: jax.Array, count, bits: int,
                           stride_log2: int = 0) -> VoxelGrid:
    return VoxelGrid(codes=codes, count=jnp.asarray(count, jnp.int32), bits=bits,
                     stride_log2=stride_log2)


def _parent_codes(codes: jax.Array, bits: int) -> jax.Array:
    morton_mask = (jnp.int64(1) << (3 * bits)) - 1
    parent = (codes & ~morton_mask) | ((codes & morton_mask) >> 3)
    return jnp.where(codes == INVALID_CODE, INVALID_CODE, parent)


@functools.partial(jax.jit, static_argnames=('bits', 'stride_log2'))
def downsample_with_bins(codes: jax.Array, count: jax.Array, bits: int,
                         stride_log2: int = 0):
    """One stride-2 downsample step.

    Returns (parent_grid, bins, child_to_parent):
      parent_grid: VoxelGrid at stride_log2+1 (same capacity, sorted)
      bins:        [N, 8] float32 child-occupancy of each parent row
      child_to_parent: [N] int32 parent row of each child (capacity in padding)
    """
    n = codes.shape[0]
    valid = jnp.arange(n) < count
    parent = _parent_codes(codes, bits)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int64), parent[:-1]])
    first = valid & (parent != prev)
    pos = jnp.cumsum(first.astype(jnp.int32)) - 1          # parent row per child
    m = jnp.sum(first.astype(jnp.int32))
    # parent compaction by sort (parents are ascending over first-flagged
    # children); int64 scatters cost ~16 ms/scale on TPU vs ~1 ms for the
    # sort (see expand_children)
    parent_codes_out = jax.lax.sort(
        jnp.where(first, parent, INVALID_CODE), is_stable=False)
    octant = (codes & 7).astype(jnp.int32)
    bin_scatter = jnp.where(valid, pos * 8 + octant, n * 8)
    bins = jnp.zeros((n * 8,), jnp.float32).at[bin_scatter].set(
        1.0, mode='drop').reshape(n, 8)
    parent_grid = VoxelGrid(codes=parent_codes_out, count=m, bits=bits,
                            stride_log2=stride_log2 + 1)
    return parent_grid, bins, pos


def octant_symbols(bins: jax.Array) -> jax.Array:
    """[N, 8] occupancy -> [N] int32 symbols in 0..254.

    Bit layout matches the reference: symbol = sum_i bins[i] << (7-i) - 1
    (reference: lossl_coord/model.py:59,337)."""
    weights = (jnp.int32(1) << jnp.arange(7, -1, -1)).astype(jnp.int32)
    return (bins.astype(jnp.int32) * weights).sum(-1) - 1


def symbols_to_bins(symbols: jax.Array) -> jax.Array:
    """[N] int symbols (0..254) -> [N, 8] bool occupancy (inverse of above)."""
    shifts = jnp.arange(7, -1, -1)
    return ((symbols[:, None] + 1) >> shifts) & 1


@functools.partial(jax.jit, static_argnames=('bits', 'capacity', 'stride_log2'))
def expand_children(parent_codes: jax.Array, parent_count: jax.Array,
                    bins_bool: jax.Array, bits: int, capacity: int,
                    stride_log2: int = 0):
    """Decode-side inverse of downsample: emit sorted child codes for occupied
    octants. Returns (child_grid, parent_of_child [capacity], octant [capacity])."""
    n = parent_codes.shape[0]
    morton_mask = (jnp.int64(1) << (3 * bits)) - 1
    base = (parent_codes & ~morton_mask) | ((parent_codes & morton_mask) << 3)
    child = base[:, None] | jnp.arange(8, dtype=jnp.int64)[None]      # [N, 8]
    keep = bins_bool & (jnp.arange(n) < parent_count)[:, None]
    flat_keep = keep.reshape(-1)
    cnt = jnp.sum(flat_keep.astype(jnp.int32))
    # compaction by SORT, not scatter: valid child codes are already globally
    # ascending in flat (parent-major, octant-minor) order, so sorting with
    # dropped entries keyed to INVALID_CODE reproduces the compaction exactly.
    # TPU scatters serialize per update (72 ms at 1M updates vs 1 ms for the
    # sort on v5e; see PERFNOTES.md round 2).
    keys = jnp.where(flat_keep, child.reshape(-1), INVALID_CODE)
    parent_flat = jnp.where(flat_keep,
                            jnp.repeat(jnp.arange(n, dtype=jnp.int32), 8), n)
    oct_flat = jnp.where(flat_keep,
                         jnp.tile(jnp.arange(8, dtype=jnp.int32), n), 0)
    sk, sparent, soct = jax.lax.sort((keys, parent_flat, oct_flat),
                                     num_keys=1, is_stable=False)
    child_codes = pad_to(sk, capacity, INVALID_CODE)
    parent_of_child = pad_to(sparent, capacity, n)
    octant_of_child = pad_to(soct, capacity, 0)
    grid = VoxelGrid(codes=child_codes, count=cnt, bits=bits,
                     stride_log2=stride_log2)
    return grid, parent_of_child, octant_of_child


def children_codes(parent_codes: jax.Array, bits: int) -> jax.Array:
    """All 8 child codes of each parent: [N, 8] int64."""
    morton_mask = (jnp.int64(1) << (3 * bits)) - 1
    base = (parent_codes & ~morton_mask) | ((parent_codes & morton_mask) << 3)
    return base[:, None] | jnp.arange(8, dtype=jnp.int64)[None]


_OFFSETS_3X3 = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                for dz in (-1, 0, 1)]


@functools.partial(jax.jit, static_argnames=('bits', 'scale_bits'))
def build_neighbor_table(codes: jax.Array, count: jax.Array, bits: int,
                         scale_bits: int) -> jax.Array:
    """[N, 27] row indices of the 3^3 neighborhood in the sorted code array.

    Missing neighbors and padding rows point at index N (a zero-feature row).
    scale_bits: remaining Morton bits per axis at this scale (coords < 2^scale_bits).
    Built once per scale and shared by every conv at that scale (the analog of
    the reference's cached torchsparse kmaps, reference: lossl_coord/model.py:79).
    """
    n = codes.shape[0]
    valid = jnp.arange(n) < count
    morton_mask = (jnp.int64(1) << (3 * bits)) - 1
    batch_part = codes & ~morton_mask
    xyz = morton_decode(codes & morton_mask)                  # [N, 3] int32
    limit = jnp.int32(1 << scale_bits)

    offs = jnp.array(_OFFSETS_3X3, jnp.int32)                 # [27, 3]
    nxyz = xyz[:, None, :] + offs[None, :, :]                 # [N, 27, 3]
    in_range = ((nxyz >= 0) & (nxyz < limit)).all(-1) & valid[:, None]
    ncodes = batch_part[:, None] | morton_encode(nxyz)        # [N, 27]
    idx = jnp.searchsorted(codes, ncodes.reshape(-1)).astype(jnp.int32)
    idx = jnp.minimum(idx, n - 1).reshape(n, 27)
    hit = in_range & (codes[idx] == ncodes)
    table = jnp.where(hit, idx, n)
    # center tap is exact by construction
    center = _OFFSETS_3X3.index((0, 0, 0))
    table = table.at[:, center].set(
        jnp.where(valid, jnp.arange(n, dtype=jnp.int32), n))
    return table


@functools.lru_cache(maxsize=None)
def _octant_offset_luts():
    """Static LUTs for parent-propagated neighbor tables.

    For a child at octant o of its parent, its 3^3 neighbor at offset d lives
    at octant OSUB[o, j] of the parent's neighbor POFF[o, j] (j indexes
    _OFFSETS_3X3): with per-axis child coord c = 2P + o,  c + d = 2(P + Δ) + o'
    where Δ = floor((o + d) / 2) ∈ {-1,0,1} and o' = (o + d) mod 2."""
    import numpy as np
    from .morton import np_morton_encode
    # discover the morton bit-axis convention from the encoder itself
    axis_bit = [int(np_morton_encode(np.eye(3, dtype=np.int64)[i:i + 1])[0])
                for i in range(3)]   # bit value of x, y, z at level 0
    off_index = {d: j for j, d in enumerate(_OFFSETS_3X3)}
    poff = np.zeros((8, 27), np.int32)
    osub = np.zeros((8, 27), np.int32)
    for o in range(8):
        oxyz = [int(bool(o & axis_bit[i])) for i in range(3)]
        for j, d in enumerate(_OFFSETS_3X3):
            t = [oxyz[i] + d[i] for i in range(3)]
            delta = tuple(ti // 2 if ti >= 0 else -1 for ti in t)
            sub = [ti % 2 for ti in t]
            poff[o, j] = off_index[delta]
            osub[o, j] = sum(axis_bit[i] * sub[i] for i in range(3))
    return poff, osub


@functools.lru_cache(maxsize=None)
def _octant_block_luts():
    """LUTs for the 8-member parent-block formulation of child tables.

    For a child at octant o, its 27 neighbors live in the 2x2x2 block of
    parents toward the octant: per axis, Δ ∈ {-1, 0} if o_axis == 0 else
    {0, 1}. block_off[o, b] is the parent-offset index (into _OFFSETS_3X3)
    of block member b (axis bits encoded with the Morton convention), and
    idx64[o, j] = member(o, j) * 8 + sub_octant(o, j) locates tap j inside
    the gathered [8 members x 8 octants] child-row block."""
    import numpy as np
    from .morton import np_morton_encode
    axis_bit = [int(np_morton_encode(np.eye(3, dtype=np.int64)[i:i + 1])[0])
                for i in range(3)]
    off_index = {d: j for j, d in enumerate(_OFFSETS_3X3)}
    block_off = np.zeros((8, 8), np.int32)
    idx64 = np.zeros((8, 27), np.int32)
    for o in range(8):
        oxyz = [int(bool(o & axis_bit[i])) for i in range(3)]
        memb = {}
        for b in range(8):
            t = [int(bool(b & axis_bit[i])) for i in range(3)]
            delta = tuple(t[i] - 1 + oxyz[i] for i in range(3))
            block_off[o, b] = off_index[delta]
            memb[off_index[delta]] = b
        for j, d in enumerate(_OFFSETS_3X3):
            tt = [oxyz[i] + d[i] for i in range(3)]
            delta = tuple(ti // 2 if ti >= 0 else -1 for ti in tt)
            sub = [ti % 2 for ti in tt]
            idx64[o, j] = memb[off_index[delta]] * 8 + \
                sum(axis_bit[i] * sub[i] for i in range(3))
    return block_off, idx64


@functools.partial(jax.jit, static_argnames=('static_trivial',))
def child_table_from_parent(parent_table: jax.Array, child_to_parent: jax.Array,
                            octant: jax.Array, child_count: jax.Array,
                            parent_count: Optional[jax.Array] = None,
                            static_trivial: Optional[bool] = None):
    """Neighbor table at a child scale from the parent scale's table.

    parent_table:    [M, 27] (misses = M)
    child_to_parent: [N] parent row of each child (garbage past child_count)
    octant:          [N] child octant (code & 7)
    -> [N, 27] child neighbor rows (misses/invalid = N)

    Replaces the 27-way binary search whose 17 x [N*27] gather iterations
    dominated whole-frame time (1.9 s vs ~5 ms at 131k rows on v5e). TPU
    gathers are ROW-RATE bound for narrow rows, so the lookup is phrased to
    touch as few gathered rows as possible: a child's 27 neighbors live in
    the 2x2x2 block of parents toward its octant, so we gather 8 parent
    rows' child-row maps per child ([N*8] 8-wide rows — the round-2 version
    gathered [N*27] such rows, 9 ms/scale at 131k on v5e) and select the 27
    taps from the resulting 64 values with per-octant one-hot matmuls.
    Index values stay < 2^24 so the f32 HIGHEST matmuls are exact (the bf16
    default would corrupt them — PERFNOTES.md).

    With ``parent_count`` given, a run-time triviality shortcut applies: if
    every parent has exactly one child (counts equal) and the parent table
    has no non-center hits, no child can have a sibling or cousin neighbor,
    so the table is the center-only identity — the common case for every
    fine scale of sparse LiDAR (measured ~0 hit-rate below stride 64).

    ``static_trivial`` makes that choice at TRACE time instead (True ->
    center-only identity, False -> full build): on this rig a lax.cond
    staging a [131k, 27] table operand costs milliseconds even when the
    trivial branch is taken (round-5 attribution), so the flagship's fast
    mode plans triviality host-side per scale (exact per-scale counts + a
    sampled zero-hit probe, transmitted in the header so encoder and
    decoder agree; a sampling miss only drops a handful of neighbor taps
    from the prediction — deterministic approximation, losslessness
    untouched)."""
    import numpy as np
    m = parent_table.shape[0]
    n = child_to_parent.shape[0]
    center = _OFFSETS_3X3.index((0, 0, 0))
    block_np, idx64_np = _octant_block_luts()
    valid = jnp.arange(n) < child_count

    def full():
        # child row of (parent row, octant); miss -> n; row m is all-miss
        scatter_idx = jnp.where(valid, child_to_parent * 8 + octant,
                                (m + 1) * 8)
        row_map2d = jnp.full(((m + 1) * 8,), n, jnp.int32).at[scatter_idx].set(
            jnp.arange(n, dtype=jnp.int32), mode='drop').reshape(m + 1, 8)
        p = jnp.minimum(child_to_parent, m)
        oct_c = jnp.clip(octant, 0, 7)
        pt_ext = jnp.concatenate(
            [parent_table, jnp.full((1, 27), m, jnp.int32)], axis=0)
        rowg = pt_ext[p]                                  # [N, 27] row gather
        # Two per-octant static lane selections around the row-map gather.
        # On the STATICALLY routed fast program (static_trivial False —
        # never inside the runtime lax.cond below: Mosaic x cond SIGABRTs
        # this libtpu) they run as VMEM pallas kernels; the XLA fallback
        # materializes f32 operand copies + 8 where-passes per stage in HBM
        # (round-5 fusion attribution).
        use_kernel = (static_trivial is False and current_fast()
                      and n % 256 == 0)
        if use_kernel:
            from .pallas_select import lut_select_pallas
            interp = _pallas_interpret()
            pb = lut_select_pallas(rowg, oct_c, block_np, interpret=interp)
            rm = row_map2d[pb.reshape(-1)].reshape(n, 64)
            rows = lut_select_pallas(rm, oct_c, idx64_np, interpret=interp)
        else:
            rowg_f = rowg.astype(jnp.float32)
            # pb[i, b] = rowg[i, block_off[oct_i, b]]: the 8 block-parent
            # rows
            pb_f = jnp.zeros((n, 8), jnp.float32)
            for o in range(8):
                perm = jnp.asarray((block_np[o][None, :] ==
                                    np.arange(27)[:, None]).astype(np.float32))
                pb_f = pb_f + jnp.where(
                    (oct_c == o)[:, None],
                    jax.lax.dot(rowg_f, perm,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32),
                    0.0)
            pb = pb_f.astype(jnp.int32)                    # values in [0, m]
            # rm[i] = concat of the 8 block parents' child-row maps
            rm_f = row_map2d[pb.reshape(-1)].reshape(n, 64).astype(jnp.float32)
            # rows[i, j] = rm[i, idx64[oct_i, j]]
            rows_f = jnp.zeros((n, 27), jnp.float32)
            for o in range(8):
                sel = jnp.asarray((idx64_np[o][:, None] ==
                                   np.arange(64)[None, :]).astype(np.float32).T)
                rows_f = rows_f + jnp.where(
                    (oct_c == o)[:, None],
                    jax.lax.dot(rm_f, sel,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32),
                    0.0)
            rows = rows_f.astype(jnp.int32)
        return jnp.where(valid[:, None], rows, n).astype(jnp.int32)

    def trivial():
        r = jnp.full((n, 27), n, jnp.int32)
        return r.at[:, center].set(
            jnp.where(valid, jnp.arange(n, dtype=jnp.int32), n))

    if static_trivial is not None:
        return trivial() if static_trivial else full()
    if parent_count is None:
        return full()

    lane = jax.lax.broadcasted_iota(jnp.int32, parent_table.shape, 1)
    parent_has_nbrs = jnp.any((parent_table < m) & (lane != center))
    nontrivial = parent_has_nbrs | (child_count != parent_count)
    return jax.lax.cond(nontrivial, full, trivial)


@jax.jit
def compact_table(table: jax.Array, gather_idx: jax.Array,
                  new_count: jax.Array) -> jax.Array:
    """Neighbor table for a mask_compact-ed subset of rows.

    table:      [N_old, 27] with misses = N_old
    gather_idx: [N_new_cap] old row of each new row (mask_compact output)
    -> [N_new_cap, 27] with misses = N_new_cap. Pruned neighbors become
    misses; no search needed."""
    n_old = table.shape[0]
    n_new = gather_idx.shape[0]
    valid = jnp.arange(n_new) < new_count
    scatter_idx = jnp.where(valid, gather_idx, n_old + 1)
    remap = jnp.full((n_old + 2,), n_new, jnp.int32).at[scatter_idx].set(
        jnp.arange(n_new, dtype=jnp.int32), mode='drop')
    old_rows = table[jnp.minimum(gather_idx, n_old)]        # [N_new, 27]
    rows = remap[jnp.minimum(old_rows, n_old)]
    rows = jnp.where(old_rows >= n_old, n_new, rows)
    return jnp.where(valid[:, None], rows, n_new).astype(jnp.int32)


def gather_padded(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows with idx == feats.shape[0] mapping to zeros."""
    padded = jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)
    return padded[idx]


# Trace-time switch for the Pallas windowed-conv fast path (see
# sparse_conv_apply). Read when a conv is TRACED, so set it (set_fast_conv)
# before the first jit of any program that should use it — already-compiled
# programs are NOT invalidated by flipping it. Production entry points
# (bench.py, test.py eval jits) enable it once at startup on TPU backends;
# tests pass the explicit ``fast`` argument instead.
FAST_CONV = False

# Scoped per-scale override of FAST_CONV (None -> fall back to the global).
# The flagship's scale loop wraps each scale's block in fast_conv_scope so
# that the fast/exact choice is STATIC PER SCALE: dense scales (hit-rate
# high, measured host-side at encode time and transmitted in the header)
# take the cond-free windowed kernel, sparse full-resolution scales keep
# the nhit cond tree whose pointwise branch is ~200x cheaper there (round-4
# verdict: the unconditional windowed+correction path at hit-rate <= 0.002
# scales replaced a 0.05 ms branch with a ~6 ms one).
_FAST_SCOPE = None   # None | False | True | 'windowed' | 'corr'


def set_fast_conv(enabled: bool) -> None:
    global FAST_CONV
    FAST_CONV = bool(enabled)


def current_fast() -> bool:
    """Resolved fast-conv flag at trace time (scope overrides the global).

    Callers that re-dispatch into their own jitted step functions (the
    flagship's _osp_* / _ms_* wrappers) must read this and pass it as a
    STATIC argument — a nested jit's trace cache is keyed only by its
    static args and shapes, so a scope change would otherwise silently
    reuse a stale trace."""
    return FAST_CONV if _FAST_SCOPE is None else _FAST_SCOPE


@contextlib.contextmanager
def fast_conv_scope(enabled):
    """Trace-time scope: convs traced inside use ``enabled`` instead of the
    FAST_CONV global. Values: None = no override; False = exact cond tree;
    True/'windowed' = Pallas windowed kernel; 'corr' = cond-free
    center+correction. Nest-safe. (The value is stored VERBATIM — an early
    bool() coercion here turned 'corr' into True and silently routed every
    sparse scale to the windowed kernel.)"""
    global _FAST_SCOPE
    prev = _FAST_SCOPE
    _FAST_SCOPE = enabled
    try:
        yield
    finally:
        _FAST_SCOPE = prev


def _pallas_interpret() -> bool:
    # Pallas compiles natively on TPU backends (this rig's plugin registers
    # as 'axon'); anywhere else (CPU test mesh) use interpret mode.
    return jax.default_backend() not in ('tpu', 'axon')


def sparse_conv_apply(feats: jax.Array, table: jax.Array, weights: jax.Array,
                      bias: Optional[jax.Array] = None,
                      row_chunk: int = 0,
                      fast: Optional[bool] = None) -> jax.Array:
    """Apply a 3^3 sparse conv given a neighbor table.

    feats:   [N, Cin]
    table:   [N, 27] indices (N == miss)
    weights: [27, Cin, Cout]

    Per-tap gather + GEMM with float32 accumulation: device traces show this
    ~1.5x faster than the fused [N, 27*Cin] x [27*Cin, Cout] formulation on
    v5e (7.7 ms vs 11.5 ms at 131k x 128, both gather-bound), and it avoids
    materializing the 27x-amplified gather tensor.

    At LiDAR-like sparsity almost no row has a 3^3 neighbor (measured on the
    bench cloud at 65536 resolution: hit-rate <= 0.002 for every >=100k-row
    scale, <= 0.05 up to 64k rows), yet ONE hit anywhere makes the conv
    non-pointwise — an all-or-nothing cond on "any neighbor" routes ~every
    full-res conv to the 10.6 ms 27-tap path to serve a handful of rows
    (round-3 trace: 28 such conds ~= 300 ms/frame). So the conv is a
    three-way lax.cond tree on nhit = count(rows with any non-center hit),
    a pure function of the coded occupancy (encoder and decoder agree):

      nhit == 0        -> pointwise GEMM (0.05 ms at 131k x 128)
      nhit <= N//8     -> center GEMM over all rows + a COMPACTED 26-tap
                          correction: sort hit rows first (stable argsort of
                          the miss flag — compaction = sort, PERFNOTES.md),
                          gather their sub-table, accumulate the neighbor
                          GEMMs at K = N//8 rows, scatter-add back (~1.5 ms)
      else             -> full 27-tap path (dense occupancy, small caps)

    All three branches are exact (all-miss taps contribute zero; compaction
    covers every hit row when nhit <= K) for forward AND gradients. Per-tap
    conds were tried and blew XLA compile time past 15 min at ~1000
    conds/program; one cond tree per conv compiles fine. The center tap
    reads feats directly (its table column is the identity on valid rows;
    junk rows propagate junk, which downstream count-masking already
    discards). row_chunk is kept for API compatibility and ignored.

    fast=True (or an enclosing fast_conv_scope, or the FAST_CONV module
    default) replaces the ENTIRE cond tree with a cond-free path: the
    Pallas windowed kernel (ops/pallas_conv.py — one in-VMEM one-hot-gather
    pass over a +-128-row Morton window) plus an UNCONDITIONAL compacted
    per-tap correction covering the first N//4 rows (ascending row order)
    that have out-of-window neighbors; far taps beyond that cap are
    DROPPED. Cond-free by necessity: this rig's libtpu SIGABRTs whenever
    the Mosaic custom call's value meets lax.cond (round-4 bisect). The
    fast conv is therefore a deterministic APPROXIMATION of the exact
    conv, not a bit-exact equal — sound for the lossless codec because
    encoder and decoder trace the identical function of the shared table
    (streams agree bit-for-bit; truncation costs only bpp at scales where
    nfar > N//4). EVAL-ONLY: the Pallas kernel has no VJP; training always
    takes the exact XLA path. Requires bf16 feats and N % 256 == 0 —
    anything else silently uses the XLA cond tree. Channel counts off the
    128-lane grid (ch32/ch64 trained configs) are zero-padded to it.

    Because fast is all-or-nothing per conv, callers should enable it ONLY
    where the cond tree would take the dense ``full`` branch: the flagship
    wraps each scale in fast_conv_scope driven by a host-measured per-scale
    density mask (model._scale_plan) so sparse full-resolution scales keep
    the ~0.05 ms pointwise branch.
    """
    del row_chunk
    if fast is None:
        fast = current_fast()
    n, cin = feats.shape
    assert table.shape[0] == n, \
        f'table rows {table.shape[0]} != feats rows {n} (miss sentinel is n)'
    k = table.shape[1]
    center = k // 2 if k == 27 else None    # _OFFSETS_3X3.index((0,0,0)) == 13

    def center_gemm():
        return jax.lax.dot(feats, weights[center],
                           preferred_element_type=jnp.float32)

    def full():
        padded = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)],
                                 axis=0)
        acc = None
        for t in range(k):
            g = feats if t == center else padded[table[:, t]]
            o = jax.lax.dot(g, weights[t],
                            preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
        return acc

    if center is None:
        acc = full()
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, table.shape, 1)
        hit = jnp.any((table < n) & (lane != center), axis=1)       # [N]
        nhit = jnp.sum(hit.astype(jnp.int32))
        kcap = max(min(n // 8, n), 1)
        # Round-5 device attribution (scripts/scale_profile.py): a lax.cond
        # whose operands include [131k, 128] feats + [131k, 27] table costs
        # ~11 ms on this rig EVEN WHEN the selected branch is the 0.05 ms
        # pointwise GEMM — the conditional's operand staging into alternate
        # memory dominates, the same pathology as the round-2 while-loop
        # finding (~40 such conds = ~430 ms of a 433 ms frame). Fast mode
        # therefore avoids lax.cond entirely:
        #   fast == 'corr'     -> center GEMM + compacted <= N//8 hit
        #                         correction, unconditionally (sparse
        #                         scales; truncation beyond N//8 is the
        #                         same deterministic-approximation story
        #                         as the windowed far cap)
        #   fast/'windowed'    -> Pallas windowed kernel + far correction
        #                         (dense scales); shapes the kernel cannot
        #                         take fall through to the cond-free exact
        #                         27-tap 'full' (cheap at the tiny caps
        #                         where that happens)
        #   fast False/None    -> the exact 3-way cond tree (training, and
        #                         the --fast-conv 0 A/B path)

        def sparse_correction():
            # stable sort: hit rows first, original order preserved
            order = jnp.argsort(jnp.logical_not(hit).astype(jnp.int32),
                                stable=True).astype(jnp.int32)
            idx = order[:kcap]                                      # [K]
            valid_k = jnp.arange(kcap) < jnp.minimum(nhit, kcap)
            tbl_k = jnp.where(valid_k[:, None], table[idx], n)      # [K, 27]
            padded = jnp.concatenate(
                [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
            corr = None
            for t in range(k):
                if t == center:
                    continue
                g = padded[tbl_k[:, t]]                             # [K, Cin]
                o = jax.lax.dot(g, weights[t],
                                preferred_element_type=jnp.float32)
                corr = o if corr is None else corr + o
            out = center_gemm()
            # scatter-free application: compacted rows are the hit rows in
            # ascending row order, so row i's correction (if covered) lives
            # at corr[rank_i] with rank = prefix count of hit — a row GATHER
            # + masked add instead of .at[idx].add (TPU scatters serialize
            # per update: ~0.66 ms/conv at 15k rows, round-5 attribution)
            rank = jnp.cumsum(hit.astype(jnp.int32)) - 1
            take = hit & (rank < kcap)
            corr_full = corr[jnp.clip(rank, 0, kcap - 1)]
            return out + jnp.where(take[:, None], corr_full, 0.0)

        cin_, cout_ = weights.shape[1], weights.shape[2]
        use_fast = (fast and fast != 'corr' and k == 27
                    and feats.dtype == jnp.bfloat16 and n % 256 == 0)
        if fast == 'corr':
            acc = sparse_correction()
        elif fast and not use_fast:
            # cond-free requested but the windowed kernel cannot take this
            # shape (k != 27, non-bf16, or N % 256): run the exact 27-tap
            # path unconditionally — at the tiny caps where this happens
            # (cap 128 'rec' scales) it costs microseconds, and it keeps
            # the program free of lax.cond.
            acc = full()
        elif use_fast:
            from .pallas_conv import far_mask, windowed_conv
            fm = far_mask(table, n)                     # [N, 27] bool
            rowfar = jnp.any(fm, axis=1)
            nfar = jnp.sum(rowfar.astype(jnp.int32))
            # Correction capacity: n/8 at the ~full-resolution caps (far
            # rate measured <= 0.11 there even with the small window —
            # see window_plan), n/4 elsewhere. A pure function of the
            # static n, so encoder and decoder agree; overflow beyond the
            # cap only drops far taps (bpp cost, losslessness untouched).
            fcap = max(n // 8 if n >= 98304 else n // 4, 1)
            interp = _pallas_interpret()

            def _wconv():
                # pad channels up to the next 128-lane multiple: the MXU
                # is 128 lanes wide regardless, so ch32/ch64 (the trained
                # operating points) ride the kernel at zero extra silicon.
                # out_dtype = feats.dtype (bf16): the f32->bf16 convert of
                # a [131k, 128] output costs ~0.2 ms/conv on v5e and every
                # caller casts to the activation dtype anyway.
                pi, po = (-cin_) % 128, (-cout_) % 128
                f = jnp.pad(feats, ((0, 0), (0, pi))) if pi else feats
                w = (jnp.pad(weights, ((0, 0), (0, pi), (0, po)))
                     if (pi or po) else weights)
                out = windowed_conv(f, table, w, interpret=interp,
                                    out_dtype=feats.dtype)
                return out[:, :cout_] if po else out

            # COND-FREE BY NECESSITY: this rig's Aug-2026 libtpu
            # manufactures a leaf-shaped while and CHECK-fails in
            # LayoutAssignment/TuplePointsToAnalysis whenever the Mosaic
            # custom call's value meets lax.cond — inside a branch OR as a
            # hoisted operand (bisected with scripts/
            # fastconv_compile_probe.py: every cond-adjacent variant
            # SIGABRTs; only the fully cond-free form compiles). So the
            # fast path runs windowed + far-correction UNCONDITIONALLY.
            #
            # Semantics: the correction covers the first fcap (= n/4)
            # far rows in ascending row order; beyond that, far taps are
            # dropped. That makes the fast conv a DETERMINISTIC
            # approximation of the exact conv, not a bit-exact equal —
            # which is sound for the lossless codec because the conv only
            # shapes the predicted symbol distributions: encoder and
            # decoder trace the identical function of the (shared) table,
            # so their streams agree bit-for-bit and losslessness is
            # untouched (the device loopback asserts it); the only cost of
            # a truncated correction is a slightly worse bpp at scales
            # where nfar > n/4 (2-25% far rows measured at the dense
            # scales, so truncation rarely bites). Training always uses
            # the exact XLA path (the kernel has no VJP).
            wout = _wconv()

            def windowed_full():
                # Far-compaction formulation knob (bisect instrument for
                # scripts/fastconv_compile_probe.py): 'argsort' (default)
                # and 'cumsum' are equivalent compactions; 'none' ELIDES
                # the far correction entirely (windowed kernel only —
                # probe-only, drops every out-of-window tap).
                mode = os.environ.get('FASTPCC_FAR_COMPACT', 'argsort')
                if mode not in ('argsort', 'cumsum', 'none'):
                    raise ValueError(
                        f'unknown FASTPCC_FAR_COMPACT mode {mode!r}')
                if mode == 'none':
                    return wout

                def with_far_correction():
                    # Compaction of the <=fcap far rows. Two equivalent
                    # formulations (both list far rows in ascending row
                    # order): 'argsort' = stable argsort on the far flag;
                    # 'cumsum' = prefix-sum slot assignment + one scatter.
                    if mode == 'cumsum':
                        pos = jnp.cumsum(rowfar.astype(jnp.int32)) - 1
                        slot = jnp.where(rowfar & (pos < fcap), pos, fcap)
                        idx = jnp.full((fcap + 1,), 0, jnp.int32).at[slot].set(
                            jnp.arange(n, dtype=jnp.int32),
                            mode='drop')[:fcap]
                    else:
                        order = jnp.argsort(
                            jnp.logical_not(rowfar).astype(jnp.int32),
                            stable=True).astype(jnp.int32)
                        idx = order[:fcap]
                    valid_f = jnp.arange(fcap) < jnp.minimum(nfar, fcap)
                    fm_k = fm[idx] & valid_f[:, None]
                    tbl_k = jnp.where(fm_k, table[idx], n)      # [F, 27]
                    padded = jnp.concatenate(
                        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
                    corr = None
                    for t in range(k):
                        if t == center:
                            continue        # the center tap is never far
                        g = padded[tbl_k[:, t]]
                        o = jax.lax.dot(g, weights[t],
                                        preferred_element_type=jnp.float32)
                        corr = o if corr is None else corr + o
                    # scatter-free (see sparse_correction): far rows are
                    # compacted in ascending row order, so a rank gather +
                    # masked add replaces the serializing .at[idx].add
                    rank = jnp.cumsum(rowfar.astype(jnp.int32)) - 1
                    take = rowfar & (rank < fcap)
                    corr_full = corr[jnp.clip(rank, 0, fcap - 1)]
                    return wout + jnp.where(take[:, None], corr_full,
                                            0.0).astype(wout.dtype)

                return with_far_correction()

            acc = windowed_full()
        else:
            acc = jax.lax.cond(
                nhit == 0, center_gemm,
                lambda: jax.lax.cond(nhit <= kcap, sparse_correction,
                                     full))
    out = acc.astype(feats.dtype)
    if bias is not None:
        out = out + bias
    return out


@functools.partial(jax.jit, static_argnames=('capacity',))
def mask_compact(codes: jax.Array, mask: jax.Array, capacity: int):
    """Compact a sorted padded code array by a boolean mask.

    Returns (codes_out [capacity], count, gather_idx [capacity]) where
    gather_idx maps each output row to its source row (len(codes) for
    padding -> pairs with gather_padded zero rows). The pruning primitive of
    generative upsampling (reference: MinkowskiPruning in
    lossy_coord/generative_upsample.py:50,68)."""
    n = codes.shape[0]
    mask = mask & (codes != INVALID_CODE)
    cnt = jnp.sum(mask.astype(jnp.int32))
    # sort-based compaction (codes are sorted and unique, so keying dropped
    # rows to INVALID_CODE preserves order); TPU scatters serialize per
    # update (see expand_children).
    keys = jnp.where(mask, codes, INVALID_CODE)
    src = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), n)
    sk, sg = jax.lax.sort((keys, src), num_keys=1, is_stable=False)
    codes_out = pad_to(sk, capacity, INVALID_CODE)
    gather_idx = pad_to(sg, capacity, n)
    return codes_out, cnt, gather_idx


@functools.partial(jax.jit, static_argnames=('bits',))
def membership_mask(query_codes: jax.Array, ref_codes: jax.Array,
                    ref_count: jax.Array, bits: int = 0) -> jax.Array:
    """True where query code exists in the sorted ref array (both padded)."""
    del bits
    n = ref_codes.shape[0]
    idx = jnp.minimum(jnp.searchsorted(ref_codes, query_codes), n - 1)
    return (ref_codes[idx] == query_codes) & (query_codes != INVALID_CODE) & \
        (idx < ref_count)


def ancestor_rows_dense(child_codes: jax.Array, child_count: jax.Array,
                        child_feats: jax.Array, anc_rows: jax.Array,
                        anc_cap: int, levels: int) -> jax.Array:
    """ancestor_gather_dense with PRECOMPUTED ancestor rows (composed
    child->parent maps) instead of a binary search — searchsorted costs
    ~17 gather passes on TPU (PERFNOTES.md round 2).

    Built as a row scatter-add of one-hot-positioned rows — the earlier
    element scatter into an [M*k3, C] tensor forced a transposed layout and
    materialized the (mostly zero) dense tensor twice (10.5 ms/call at
    131k/k3=64 on v5e, round-3 trace). Colliding children of one ancestor
    write disjoint lane blocks (offsets are unique per child), so the adds
    are exact in any order.

    For k3 > 8 the offset is split into (hi = offset >> 3, lo = offset & 7)
    and the scatter targets [M*8, (k3//8)*C] rows at row anc*8 + hi with a
    lo-block one-hot — 8x narrower rows than the flat [N, k3*C] form (a
    scatter's serialization is per UPDATE, but its HBM traffic is per
    lane: the wide form moved 3.05 ms/call at 123k x 512 on v5e, round-5
    attribution). Row-major reshape restores [M, k3, C] exactly:
    anc*(k3*C) + hi*(k3//8*C) + lo*C + c == anc*(k3*C) + offset*C + c."""
    n = child_codes.shape[0]
    k3 = 1 << (3 * levels)
    c = child_feats.shape[-1]
    offset = (child_codes & (k3 - 1)).astype(jnp.int32)
    valid = (jnp.arange(n) < child_count) & (anc_rows < anc_cap)
    if k3 > 8:
        klo = k3 // 8
        # layout identity: (anc*8 + hi) * (klo*c) + lo*c + ch ==
        # anc*(k3*c) + offset*c + ch  iff  offset == hi*klo + lo
        hi = offset // klo
        lo = offset % klo
        oh = lo[:, None] == jnp.arange(klo, dtype=jnp.int32)[None, :]
        z = jnp.where(oh[:, :, None] & valid[:, None, None],
                      child_feats[:, None, :], 0).reshape(n, klo * c)
        rows = jnp.where(valid, anc_rows * 8 + hi, anc_cap * 8)
        dense = jnp.zeros((anc_cap * 8, klo * c), child_feats.dtype)
        dense = dense.at[rows].add(z, mode='drop')
        return dense.reshape(anc_cap, k3, c)
    oh = offset[:, None] == jnp.arange(k3, dtype=jnp.int32)[None, :]
    z = jnp.where(oh[:, :, None] & valid[:, None, None],
                  child_feats[:, None, :], 0).reshape(n, k3 * c)
    rows = jnp.where(valid, anc_rows, anc_cap)
    dense = jnp.zeros((anc_cap, k3 * c), child_feats.dtype)
    dense = dense.at[rows].add(z, mode='drop')
    return dense.reshape(anc_cap, k3, c)


def compose_maps(maps, cap: int) -> jax.Array:
    """Compose a chain of child->parent row maps [m0, m1, ...] into a single
    rows array (misses/out-of-range propagate to >= cap)."""
    rows = maps[0]
    for m in maps[1:]:
        ext = jnp.concatenate([m, jnp.full((1,), cap, m.dtype)])
        rows = ext[jnp.minimum(rows, m.shape[0])]
    return rows


def ancestor_gather_dense(child_codes: jax.Array, child_count: jax.Array,
                          child_feats: jax.Array, ancestor_codes: jax.Array,
                          bits: int, levels: int) -> jax.Array:
    """Strided (2^levels) ancestor conv support: scatter child features into a
    dense [M, 8^levels, C] tensor indexed by (ancestor row, within-offset).

    Used for kernel-2^k stride-2^k convolutions (the reference's multi-step
    embed convs, reference: lossl_coord/model.py:136-153): the conv is then a
    single [M, 8^k * C] x [8^k * C, Cout] GEMM.
    """
    n = child_codes.shape[0]
    m = ancestor_codes.shape[0]
    k3 = 1 << (3 * levels)
    morton_mask = (jnp.int64(1) << (3 * bits)) - 1
    anc = (child_codes & ~morton_mask) | ((child_codes & morton_mask) >> (3 * levels))
    offset = (child_codes & (k3 - 1)).astype(jnp.int32)
    row = jnp.searchsorted(ancestor_codes, anc).astype(jnp.int32)
    row = jnp.minimum(row, m - 1)
    valid = (jnp.arange(n) < child_count) & (ancestor_codes[row] == anc)
    scatter_idx = jnp.where(valid, row * k3 + offset, m * k3)
    dense = jnp.zeros((m * k3, child_feats.shape[-1]), child_feats.dtype)
    dense = dense.at[scatter_idx].set(child_feats, mode='drop')
    return dense.reshape(m, k3, child_feats.shape[-1])
