"""lossl_coord — real-time lossless LiDAR geometry compression (flagship).

TPU-native rebuild of the reference's multiscale occupancy model
(reference: models/convolutional/lossl_coord/model.py:306-642, arXiv
2603.25260). Encoder and decoder drive the SAME jitted per-scale step
functions, so the device-computed CDFs are bit-identical on both sides —
the property the reference gets from running one network twice on one GPU.

Bitstream layout (little-endian), mirroring the reference with additions:
  1B      format (1 = device interleaved-word coder, 0 = host coder)
  3 x 2B  per-axis coordinate offset   (reference: lossl_coord/model.py:558-560)
  4B      bottom-scale point count
  4B      original point count         (added: decode-side capacity planning,
                                        replaces dynamic shapes)
  4B      bottom-coord alphabet size k (added: replaces the reference's
                                        128-bounded side CDF — the reference
                                        asserts k-2 <= 128 at model.py:486;
                                        here any k is legal)
  fmt 1:  1B caps count + 3B per-scale capacities (decoder compiles the
          same shapes) + 4B conv-routing plan mask (see Model._scale_plan:
          fast-program flag + per-scale density + per-scale table
          triviality; the decoder must route identically) + 4B blob length
          + interleaved-word rANS blob (all scales' octants)
  host rANS stream: bottom-coord CDF rows + values (+ fmt 0: all octants)
"""
import io
import math
import functools
import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops import sparse as sp
from ...ops import ilv_rans as ir
from ...ops.morton import masked_decode, np_morton_decode, np_morton_encode
from ...runtime import RansEncoder, RansDecoder
from .network import (OneScalePredictor, OneScaleMultiStepPredictor,
                      make_blocks)
from .model_config import Config

LOG2_E = math.log2(math.e)
NUM_CLASSES = 255

_NBR_OFFSETS_26 = [np.array(d, np.int64)
                   for d in ((dx, dy, dz) for dx in (-1, 0, 1)
                             for dy in (-1, 0, 1) for dz in (-1, 0, 1))
                   if d != (0, 0, 0)]


def _bucket(n: int, minimum: int = 1024) -> int:
    return max(1 << math.ceil(math.log2(max(n, 1))), minimum)


_CHUNK_BYTES = 4 << 20


def fetch_chunked(arr: jax.Array, n_rows: int) -> np.ndarray:
    """Device->host fetch in ~4MB chunks: the axon tunnel degrades badly on
    large single transfers (measured ~2MB/s at 64MB vs ~30MB/s at 2-8MB)."""
    row_bytes = max(int(np.prod(arr.shape[1:])) * arr.dtype.itemsize, 1)
    rows_per_chunk = max(_CHUNK_BYTES // row_bytes, 1)
    if n_rows <= rows_per_chunk:
        return np.asarray(arr[:n_rows])
    parts = [np.asarray(arr[i:min(i + rows_per_chunk, n_rows)])
             for i in range(0, n_rows, rows_per_chunk)]
    return np.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# jitted step functions (module hyperparams static -> traces shared across
# blocks with the same structure)
# ---------------------------------------------------------------------------

# Each wrapper takes the resolved fast-conv flag as a STATIC arg (read via
# sp.current_fast() at call time): nested-jit trace caches are keyed only by
# static args + shapes, so the per-scale fast_conv_scope must be re-entered
# INSIDE the wrapper to reach the convs it traces.

@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _osp_logits(channels, if_upsample, allow_single_ch, fast, params, feats,
                table):
    mod = OneScalePredictor(channels, if_upsample, allow_single_ch)
    with sp.fast_conv_scope(fast):
        return mod.apply({'params': params}, feats, table,
                         method=OneScalePredictor.logits)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _osp_upsample(channels, if_upsample, allow_single_ch, fast, params,
                  dec_feats, bins, table, p_of_c, oct_of_c):
    mod = OneScalePredictor(channels, if_upsample, allow_single_ch)
    with sp.fast_conv_scope(fast):
        return mod.apply({'params': params}, dec_feats, bins, table, p_of_c,
                         oct_of_c, method=OneScalePredictor.upsample)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _ms_root(channels, pred_steps, fea_prop, fast, params, feats, root_table,
             bins_root, embed_dense):
    mod = OneScaleMultiStepPredictor(channels, pred_steps, fea_prop)
    with sp.fast_conv_scope(fast):
        return mod.apply({'params': params}, feats, root_table, bins_root,
                         embed_dense,
                         method=OneScaleMultiStepPredictor.root_feats)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _ms_chain(channels, pred_steps, fea_prop, fast, params, root_out, tables,
              select_maps, cat_bins):
    mod = OneScaleMultiStepPredictor(channels, pred_steps, fea_prop)
    with sp.fast_conv_scope(fast):
        return mod.apply({'params': params}, root_out, tables, select_maps,
                         cat_bins,
                         method=OneScaleMultiStepPredictor.chain_logits)


@jax.jit
def _cdf_rows(logits: jax.Array) -> jax.Array:
    """Device CDF quantization, format of the reference's
    batch_quantize_pmf_torch (reference: lossl_coord/model.py:461-468):
    row[s] = cumulative count through symbol s, row[-1] = 65535 (uint16)."""
    pmf = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    q = jnp.floor(pmf * (65536 - logits.shape[-1])) + 1.0
    cdf = jnp.cumsum(q, axis=-1)
    cdf = cdf.at[:, -1].set(65535.0)
    return cdf.astype(jnp.uint16)


@jax.jit
def _enc_pairs(cdf_rows: jax.Array, symbols: jax.Array):
    """Per-symbol (start, freq) uint16 pairs for the word coder.

    In-row selection as a one-hot masked reduce (VPU, exact single-term
    sums) — the [N] 2-D scalar gather costs ~2.8 ms at 131k x 255 on v5e
    vs ~1 ms for the fused elementwise pass."""
    ncls = cdf_rows.shape[-1]
    s = jnp.clip(symbols, 0, ncls - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, cdf_rows.shape, 1)
    rows_i32 = cdf_rows.astype(jnp.int32)
    end = jnp.where(s == ncls - 1, 65536,
                    jnp.where(lane == s[:, None], rows_i32, 0).sum(-1))
    start = jnp.where(s == 0, 0,
                      jnp.where(lane == (s - 1)[:, None], rows_i32, 0).sum(-1))
    return start.astype(jnp.uint16), (end - start).astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=('bits', 'max_down', 'caps'))
def _build_pyramid(codes, count, bits: int, max_down: int, caps=None):
    """Full bin pyramid in one program: per scale s in 1..max_down returns
    (codes, count, bins, child_to_parent, child_octant, symbols).

    caps: optional static per-scale row capacities (caps[s] for scale s,
    non-increasing). LiDAR counts stay ~flat for the first ~6 scales then
    collapse 8x/scale; slicing each scale to its bucketed capacity removes
    the full-resolution padded cost from every coarse scale (the arrays are
    sorted valid-first, so a prefix slice is exact)."""
    out = []
    g = sp.VoxelGrid(codes=codes, count=jnp.asarray(count, jnp.int32),
                     bits=bits, stride_log2=0)
    for s in range(1, max_down + 1):
        octant = (g.codes & 7).astype(jnp.int32)
        parent, bins, c2p = sp.downsample_with_bins(g.codes, g.count, bits,
                                                    g.stride_log2)
        pc = parent.codes
        if caps is not None and caps[s] < pc.shape[0]:
            pc = pc[:caps[s]]
            bins = bins[:caps[s]]
        syms = sp.octant_symbols(bins)
        out.append((pc, parent.count, bins, c2p, octant, syms))
        g = sp.VoxelGrid(codes=pc, count=parent.count, bits=bits,
                         stride_log2=parent.stride_log2)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=('bits', 'capacity'))
def _expand_from_symbols(codes, count, symbols, bits: int, capacity: int):
    """Decoded symbols -> bins + child grid + (parent, octant) maps."""
    bins_bool = sp.symbols_to_bins(symbols).astype(bool)
    bins_bool = bins_bool & (jnp.arange(codes.shape[0]) < count)[:, None]
    child, p_of_c, oct_of_c = sp.expand_children(
        codes, count, bins_bool, bits, capacity)
    return bins_bool.astype(jnp.float32), child.codes, child.count, p_of_c, oct_of_c


# ---------------------------------------------------------------------------


class _ScaleState:
    """Per-scale bookkeeping shared by the encode and decode drivers."""
    __slots__ = ('codes', 'count', 'bins', 'c2p', 'octant', 'table', 'n')

    def __init__(self, codes, count, n, bins=None, c2p=None, octant=None):
        self.codes, self.count, self.n = codes, count, n
        self.bins, self.c2p, self.octant = bins, c2p, octant
        self.table = None


class Model:
    """Public API mirroring the reference Model (reference:
    lossl_coord/model.py:306): ``train_loss`` (pure, jit-compiled),
    ``compress(params, xyz) -> bytes``, ``decompress(params, bytes) -> xyz``."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.bits = cfg.coord_bits
        (self.max_down, self.max_down_wo, self.specs,
         self.blocks) = make_blocks(cfg.channels, cfg.max_stride,
                                    cfg.max_stride_wo_recurrent, cfg.fea_stride,
                                    cfg.feature_propagation)
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' \
            else jnp.float32
        self._enc = None
        self._dec = None
        self.profile = False
        self.last_profile: Dict[str, float] = {}
        # Whole-frame single-program paths: this environment's runtime
        # degrades to ~2s per *executed program* after the first host
        # transfer, so encode and decode each trace into ONE program.
        self._mega_encode = jax.jit(self._traced_encode,
                                    static_argnums=(3, 4))
        self._mega_decode = jax.jit(self._traced_decode,
                                    static_argnums=(4, 5))
        self._dec_caps = None
        self._sticky_caps = None
        self._sticky_mask = 0
        # Batched-frame throughput mode: number of frames packed into one
        # program via the code high bits (bench.py --batch). Read at TRACE
        # time (sizes the coarsest-scale table search bound), so set it
        # before the first jit. The single-frame CLI paths leave it at 1.
        self.batch_hint = 1
        # uniform side CDF for bottom-coordinate CDF-row transmission
        # (reference: lossl_coord/model.py:348-351)
        cdf1 = np.arange(2, 65537, dtype=np.int64).astype(np.uint16)
        cdf1[-1] = 65535
        self._side_cdf1 = cdf1[None]

    # ------------------------------------------------------------- params

    def init_params(self, rng: jax.Array, example_n: int = 512) -> Dict:
        cap = _bucket(example_n)
        ch = self.cfg.channels
        feats1 = jnp.ones((cap, 1), self.compute_dtype)
        feats = jnp.ones((cap, ch), self.compute_dtype)
        table = jnp.full((cap, 27), cap, jnp.int32)
        bins = jnp.zeros((cap, 8), jnp.float32)
        idx_map = jnp.zeros((cap,), jnp.int32)
        params = {}
        rngs = jax.random.split(rng, len(self.blocks))
        for r, (name, mod) in zip(rngs, self.blocks.items()):
            if isinstance(mod, OneScalePredictor):
                f = feats1 if mod.allow_single_ch else feats
                v = mod.init(r, f, table, method=OneScalePredictor.logits)
                p = v['params']
                if mod.if_upsample:
                    v2 = mod.init(r, feats, bins, table, idx_map, idx_map,
                                  method=OneScalePredictor.upsample)
                    p = {**p, **v2['params']}
                params[name] = p
            else:
                k = mod.pred_steps
                embed_dense = None if k == 2 else jnp.zeros(
                    (cap, 1 << (3 * (k - 2)), 8), self.compute_dtype)
                v = mod.init(r, feats, table, bins, embed_dense,
                             method=OneScaleMultiStepPredictor.root_feats)
                p = v['params']
                tables = tuple(table for _ in range(k))
                maps = tuple((idx_map, idx_map) for _ in range(k - 1))
                cat_bins = tuple([bins] * (k - 2) + [None]) if k > 1 else ()
                v2 = mod.init(r, feats, tables, maps, cat_bins,
                              method=OneScaleMultiStepPredictor.chain_logits)
                params[name] = {**p, **v2['params']}
        return params

    # ------------------------------------------------------------- training

    def _block_info(self, idx: int, top: int):
        """Block for scale idx (stride 2^idx) given the effective top scale."""
        shift = self.max_down - top  # skip_top_scales_num at test time
        if idx > self.max_down_wo - shift:
            return 'rec', self.blocks['rec']
        name = f'b{idx - 1 + shift}'
        return name, self.blocks[name]

    def train_loss(self, params: Dict, codes: jax.Array, count: jax.Array,
                   points_num: jax.Array, step=0) -> Tuple[jax.Array, Dict]:
        """Pure loss function (jit/grad-able). codes: [cap] sorted packed
        codes; points_num: [B] per-sample point counts; step unused (kept for
        the shared harness signature)."""
        del step
        cap = codes.shape[0]
        bits = self.bits
        batch_size = points_num.shape[0]
        pyramid = _build_pyramid(codes, count, bits, self.max_down)
        # pyramid[s-1] = (codes, count, bins, c2p, octant, syms) for scale s
        # tables propagate top-down from one cheap search at the coarsest
        # scale (searchsorted is ~30x slower on TPU, see PERFNOTES.md)
        top_pc, top_cnt = pyramid[self.max_down - 1][:2]
        tables = {self.max_down: self._top_table(
            top_pc, top_cnt, self.max_down, batch_size)}
        for s in range(self.max_down - 1, 0, -1):
            c2p_s, oct_s = pyramid[s][3], pyramid[s][4]
            cnt_s = pyramid[s - 1][1]
            tables[s] = sp.child_table_from_parent(tables[s + 1], c2p_s,
                                                   oct_s, cnt_s,
                                                   pyramid[s][1])

        def table(s):
            return tables[s]

        def scale(s):
            return pyramid[s - 1]

        def ce_loss(logits, s):
            pcodes, pcount, bins, _, _, syms = scale(s)
            valid = jnp.arange(cap) < pcount
            lg = logits.astype(jnp.float32)
            lse = jax.nn.logsumexp(lg, axis=-1)
            tgt = jnp.take_along_axis(lg, jnp.clip(syms, 0, NUM_CLASSES - 1)
                                      [:, None], axis=-1)[:, 0]
            ce = lse - tgt
            bidx = jnp.clip((pcodes >> (3 * bits)).astype(jnp.int32), 0,
                            batch_size - 1)
            w = 1.0 / points_num.astype(jnp.float32)[bidx]
            return (ce * w * valid).sum() * (LOG2_E / batch_size)

        feats = jnp.ones((cap, 1), self.compute_dtype)
        loss_dict = {}
        for idx in range(self.max_down, 0, -1):
            if not self.cfg.feature_propagation:
                feats = jnp.ones((scale(idx)[0].shape[0], 1),
                                 self.compute_dtype)
            name, mod = self._block_info(idx, self.max_down)
            p = params[name]
            _, _, bins_i, c2p_i, oct_i, _ = scale(idx)
            if isinstance(mod, OneScalePredictor):
                def osp_step(p, feats, mod=mod, idx=idx, bins_i=bins_i,
                             c2p_i=c2p_i, oct_i=oct_i):
                    dec_feats, logits = mod.apply(
                        {'params': p}, feats, table(idx),
                        method=OneScalePredictor.logits)
                    loss = ce_loss(logits, idx)
                    if mod.if_upsample and idx != 1:
                        out = mod.apply(
                            {'params': p}, dec_feats, bins_i, table(idx),
                            c2p_i, oct_i, method=OneScalePredictor.upsample)
                    else:
                        out = dec_feats
                    return loss, out
                if self.cfg.train_remat:
                    # rematerialize each scale block in the backward pass:
                    # without this, every conv keeps its 27 gathered
                    # [cap, ch] tap activations alive for the VJP and the
                    # ch128 step needs ~91GB HBM (round-4 OOM); with it,
                    # only each scale's (feats in, feats out) survive.
                    osp_step = jax.checkpoint(osp_step)
                loss, feats = osp_step(p, feats)
            else:
                k = mod.pred_steps
                r = idx + k - 1
                if k == 2:
                    embed_dense = None
                else:
                    src_codes, src_count, src_bins = (scale(idx + 1)[0],
                                                      scale(idx + 1)[1],
                                                      scale(idx + 1)[2])
                    # pyramid[t][3] maps scale t rows -> t+1
                    anc_rows = sp.compose_maps(
                        [pyramid[t][3] for t in range(idx + 1, r)],
                        scale(r)[0].shape[0])
                    embed_dense = sp.ancestor_rows_dense(
                        src_codes, src_count,
                        src_bins.astype(self.compute_dtype), anc_rows,
                        scale(r)[0].shape[0], k - 2)

                def ms_step(p, feats, embed_dense, mod=mod, idx=idx, r=r,
                            k=k):
                    root_out = mod.apply(
                        {'params': p}, feats, table(r),
                        scale(r)[2], embed_dense,
                        method=OneScaleMultiStepPredictor.root_feats)
                    chain_tables = tuple(table(r - i) for i in range(k))
                    select_maps = tuple((scale(r - i)[3], scale(r - i)[4])
                                        for i in range(k - 1))
                    cat_bins = tuple([scale(r - i)[2]
                                      for i in range(1, k - 1)] + [None])
                    logits = mod.apply(
                        {'params': p}, root_out, chain_tables, select_maps,
                        cat_bins,
                        method=OneScaleMultiStepPredictor.chain_logits)
                    return ce_loss(logits, idx), root_out
                if self.cfg.train_remat:
                    ms_step = jax.checkpoint(ms_step)
                loss, feats = ms_step(p, feats, embed_dense)
            loss_dict[f'stride{2 ** idx}_geo_loss'] = loss
        total = sum(loss_dict.values())
        loss_dict['loss'] = total
        return total, loss_dict

    # ------------------------------------------------------------- coding

    def _coders(self):
        if self._enc is None:
            self._enc = RansEncoder(32 * 1024 * 1024)
            self._dec = RansDecoder()
        return self._enc, self._dec

    def _encode_bottom_coords(self, enc: RansEncoder, coords: np.ndarray) -> int:
        """Raw bottom-scale coords via bincount CDF + transmitted CDF rows
        (reference: lossl_coord/model.py:482-508,519-525). Returns the
        alphabet size k, which the caller writes into the byte header (the
        reference instead codes k against a 128-entry side CDF and asserts
        k-2 <= 128, reference: lossl_coord/model.py:486)."""
        values = coords.reshape(-1).astype(np.int64)
        k = max(int(values.max(initial=0)) + 1, 2)
        pmf = np.bincount(values, minlength=k).astype(np.float64) / len(values)
        q = np.floor(pmf * (65536 - k)) + 1.0
        cdf = np.cumsum(q)
        cdf[-1] = 65535
        cdf = cdf.astype(np.uint16)
        enc.encode(cdf[None], values.astype(np.uint16))
        enc.encode(self._side_cdf1, cdf[:-1].astype(np.int64).astype(np.uint16) - 1)
        return k

    def _decode_bottom_coords(self, dec: RansDecoder, n_values: int,
                              k: int) -> np.ndarray:
        row = np.empty((k - 1,), np.uint16)
        dec.decode(self._side_cdf1, row)
        cdf = np.zeros((k,), np.uint16)
        cdf[:-1] = row + 1
        cdf[-1] = 65535
        values = np.empty((n_values,), np.uint16)
        dec.decode(cdf[None], values)
        return values.astype(np.int32)

    def _prep_xyz(self, xyz: np.ndarray):
        offset = xyz.min(0)
        shifted = (xyz - offset).astype(np.int64)
        codes = np.unique(np_morton_encode(shifted))
        return offset.astype(np.int32), codes

    # ------------------------------------------------ single-program paths

    def _word_capacity(self, cap: int) -> int:
        """Worst-case interleaved-stream words for a frame: one word per
        symbol, summed over the scale pyramid (sum count_s < 1.15 * cap),
        plus coder overhead."""
        return ir.word_capacity_for(2 * cap, self.cfg.coder_lanes)

    def _traced_encode(self, params, codes, count, caps=None, fast_mask=0):
        """Whole encode as one traceable function: pyramid, all per-scale
        NNs + CDFs + pair gathers, and the full interleaved rANS encode.
        caps: optional static per-scale capacities; fast_mask: static
        per-scale density bits routing convs to the windowed kernel (see
        _scale_plan)."""
        prof, self.profile = self.profile, False
        try:
            top = self.max_down - self.cfg.skip_top_scales_num
            cap = codes.shape[0]
            pyramid = _build_pyramid(codes, count, self.bits, top, caps)
            states: Dict[int, _ScaleState] = {
                0: _ScaleState(codes, count, None)}
            for s in range(1, top + 1):
                pc, pcnt, bins, c2p, octant, _ = pyramid[s - 1]
                states[s] = _ScaleState(pc, pcnt, None, bins)
                states[s - 1].c2p = c2p
                states[s - 1].octant = octant
            self._thread_tables(states, top, self.batch_hint, fast_mask)

            def symbols_of(s):
                return pyramid[s - 1][5]

            collected = self._run_scales(params, states, top, symbols_of,
                                         fast_mask=fast_mask)
            rs, bptr, buf = ir.init_encoder(self.cfg.coder_lanes,
                                            self._word_capacity(cap))
            for starts, freqs, cnt in collected:
                rs, bptr, buf = ir.encode_segment(rs, bptr, buf, starts,
                                                  freqs, cnt)
            bptr, buf = ir.encode_flush(rs, bptr, buf)
            bottom_coords = masked_decode(states[top].codes, self.bits)
            # bottom CODES keep the packed batch bits that coords drop —
            # the loopback roundtrip needs them in batched-frame mode
            return bptr, buf, bottom_coords, states[top].codes, \
                states[top].count
        finally:
            self.profile = prof

    def _scale_caps(self, codes_np: np.ndarray, cap: int):
        """Static per-scale row capacities (see _scale_plan)."""
        return self._scale_plan(codes_np, cap)[0]

    _DENSE_SAMPLE = 2048      # rows sampled per scale for the density probe
    _DENSE_THRESHOLD = 0.3    # hit-rate above which a scale counts as dense

    def _scale_plan(self, codes_np: np.ndarray, cap: int):
        """(caps, plan_mask): static per-scale capacities + conv routing.

        caps: buckets of the per-scale counts (pow-2 up to 8192, 8192-
        multiples above — see the inline note), non-increasing, floor 128 —
        transmitted in the device-coder header so the decoder
        compiles the same shapes. With a flat capacity every coarse scale
        paid full-resolution cost although LiDAR counts collapse 8x/scale
        above ~scale 7.

        plan_mask packing (one static int, transmitted in the header —
        encoder and decoder MUST route identically because the fast paths
        are deterministic approximations, not bit-exact equals):
          bit 0       fast program (0 = wholly exact legacy program)
          bit s       (1 <= s <= 14) scale s is DENSE: sampled 3^3 neighbor
                      hit-rate >= _DENSE_THRESHOLD -> its convs take the
                      Pallas windowed kernel; sparse scales take the
                      cond-free center+correction path (bench cloud at
                      65536 resolution: scales 0-4 hit-rate <= 0.001,
                      scale 5 0.72, 6+ ~1.0)
          bit 16+s    the neighbor table at scale s is TRIVIAL
                      (center-only): exact count equality with scale s+1
                      plus a zero-hit sample at s+1 -> built as the
                      identity instead of the gather/one-hot build, with
                      no lax.cond (a cond staging a [131k, 27] operand
                      costs ~ms on this rig even taking the cheap branch).
        Multi-step chain blocks use the finest scale's density bit for all
        their levels (on LiDAR those scales are uniformly sparse)."""
        top = self.max_down - self.cfg.skip_top_scales_num
        caps = [cap]
        bits = self.bits
        probe = sp.FAST_CONV   # the mask is only consumed then
        counts = []
        dense = []
        hit0 = []
        c = codes_np
        for s in range(0, top + 1):
            if s > 0:
                # parent codes: the batch part (high bits) shifts down with
                # the morton part, preserving distinctness (counts only)
                c = np.unique(c >> 3)
                # bucket: pow-2 up to 8192, then 8192-multiples — LiDAR
                # counts sit just above pow-2 boundaries at the dominant
                # scales (bench cloud scale 6: 103k -> pow-2 cap 131072 vs
                # 8k cap 106496, 19% of every op at that scale), and all
                # kernel shape constraints only need multiples of 256
                nc = len(c)
                bucket = (max(1 << int(math.ceil(math.log2(max(nc, 1)))), 128)
                          if nc <= 8192 else ((nc + 8191) // 8192) * 8192)
                caps.append(min(caps[-1], bucket))
            counts.append(len(c))
            if len(c) == 0 or not probe:
                dense.append(False)
                hit0.append(len(c) == 0)
                continue
            side = bits - s
            mmask = (np.int64(1) << (3 * side)) - 1
            k = min(len(c), self._DENSE_SAMPLE)
            sel = c[:: max(len(c) // k, 1)][:k]
            xyz = np_morton_decode(sel & mmask)
            bpart = sel & ~mmask
            hit = np.zeros(len(sel), bool)
            for d in _NBR_OFFSETS_26:
                nb = xyz + d
                ok = ((nb >= 0) & (nb < (1 << side))).all(-1)
                ncode = bpart | np_morton_encode(nb)
                pos = np.searchsorted(c, ncode)
                pos = np.minimum(pos, len(c) - 1)
                hit |= ok & (c[pos] == ncode)
                if hit.mean() >= self._DENSE_THRESHOLD:
                    break
            dense.append(bool(hit.mean() >= self._DENSE_THRESHOLD))
            hit0.append(bool(~hit.any()))
        mask = 0
        if probe and top <= 14:   # mask packing bound; top > 14 -> exact
            mask |= 1
            for s in range(1, top + 1):
                if dense[s]:
                    mask |= 1 << s
            # table at scale s (1..top-1) is derived from scale s+1's
            for s in range(1, top):
                if counts[s] == counts[s + 1] and hit0[s + 1]:
                    mask |= 1 << (16 + s)
        return tuple(caps), mask

    def _effective_caps(self, codes_np: np.ndarray, n: int):
        return self._effective_plan(codes_np, n)[0]

    def _effective_plan(self, codes_np: np.ndarray, n: int):
        """Dataset-stable static shapes: the caps used for a cloud are the
        running elementwise max over every cloud this Model instance has
        compressed (elementwise max of non-increasing bucket sequences stays
        non-increasing). A multi-sample test pass therefore compiles the
        mega encode/decode programs for sample 1 and reuses them for every
        later cloud that fits — per-cloud caps recompiled per sample
        (round-2 finding). Capacities only pad rows (symbols are count-
        masked), so the bitstream is unchanged.

        The per-scale density mask is sticky the same way (OR of bits:
        dense-if-ever-dense), so a homogeneous pass compiles once. The
        effective mask is 0 unless FAST_CONV is enabled — the mask written
        to each header records what the encoder actually did."""
        cloud, mask = self._scale_plan(codes_np, _bucket(n))
        if (self._sticky_caps is None
                or len(self._sticky_caps) != len(cloud)):
            self._sticky_caps = cloud
            self._sticky_mask = mask
        else:
            self._sticky_caps = tuple(
                max(a, b) for a, b in zip(self._sticky_caps, cloud))
            self._sticky_mask |= mask
        eff_mask = self._sticky_mask if sp.FAST_CONV else 0
        return self._sticky_caps, eff_mask

    def _traced_decode(self, params, bottom_codes, bottom_count, stream,
                       caps=None, fast_mask=0):
        """Whole decode as one traceable function: all scales' NNs, rANS
        symbol decoding, child expansion, and the final coordinate decode.
        fast_mask comes from the bitstream header: the decoder must route
        each scale's convs exactly as the encoder did (the fast conv is a
        deterministic approximation, not a bit-exact equal)."""
        prof, self.profile = self.profile, False
        try:
            top = self.max_down - self.cfg.skip_top_scales_num
            rs, ptr = ir.init_decoder(stream, jnp.int32(0),
                                      self.cfg.coder_lanes)
            self._rans = (rs, ptr, stream)
            self._use_device_decode = True
            self._dec_caps = caps
            states = {top: _ScaleState(bottom_codes, bottom_count, None)}
            states[top].table = self._top_table(bottom_codes, bottom_count,
                                                top, self.batch_hint)
            self._run_scales(params, states, top, symbols_of=None,
                             decode_scale=True, fast_mask=fast_mask)
            return masked_decode(states[0].codes, self.bits)
        finally:
            self.profile = prof
            self._dec_caps = None

    def _traced_roundtrip(self, params, codes, count, caps=None, fast_mask=0):
        """Encode then decode entirely on device: the decoder reads the
        encoder's word buffer forward from its final back-pointer — zero
        host involvement. Returns (decoded coords, lossless flag, total
        stream bytes). Used for loopback verification and for artifact-free
        throughput measurement (see PERFNOTES.md).

        NOTE: on this rig's Aug-2026 libtpu the encode+decode MONOLITH
        trips a compiler bug (leaf-shaped while manufactured inside the
        jellyfish pipeline crashes LayoutAssignment; each half compiles
        clean — bisected round 4). TPU callers must use the split pair
        (_traced_encode + _traced_decode_verify, see roundtrip_fns);
        this single-program form remains for CPU tests."""
        bptr, buf, _coords, enc_bottom_codes, bcount = \
            self._traced_encode(params, codes, count, caps, fast_mask)
        return self._traced_decode_verify(params, enc_bottom_codes, bcount,
                                          bptr, buf, codes, count, caps,
                                          fast_mask)

    def _traced_decode_verify(self, params, enc_bottom_codes, bcount, bptr,
                              buf, codes, count, caps=None, fast_mask=0):
        """Decode half of the device loopback: reads the encoder's word
        buffer forward from bptr, reconstructs all scales, and verifies
        losslessness against the original codes on device. codes/count are
        only used for the verification flag."""
        bottom_codes = jnp.where(
            jnp.arange(enc_bottom_codes.shape[0]) < bcount,
            enc_bottom_codes, jnp.int64(1) << 62)
        prof, self.profile = self.profile, False
        try:
            top = self.max_down - self.cfg.skip_top_scales_num
            rs, ptr = ir.init_decoder(buf, bptr, self.cfg.coder_lanes)
            self._rans = (rs, ptr, buf)
            self._use_device_decode = True
            self._dec_caps = caps
            states = {top: _ScaleState(bottom_codes, bcount, None)}
            states[top].table = self._top_table(bottom_codes, bcount, top,
                                                self.batch_hint)
            self._run_scales(params, states, top, symbols_of=None,
                             decode_scale=True, fast_mask=fast_mask)
        finally:
            self.profile = prof
            self._use_device_decode = self.cfg.device_coder
            self._dec_caps = None
        final = states[0]
        coords = masked_decode(final.codes, self.bits)
        valid = jnp.arange(codes.shape[0]) < count
        ok = jnp.all(jnp.where(valid, final.codes == codes, True))
        stream_bytes = 2 * (buf.shape[0] - self.cfg.coder_lanes - bptr)
        return coords, ok, stream_bytes

    def roundtrip_fns(self):
        """Jitted (encode, decode_verify) pair for the device loopback.

        Two separate programs BY DESIGN: besides matching the production
        compress/decompress split, the fused monolith trips this rig's
        libtpu (see _traced_roundtrip). The buffer/bptr/bottom-codes hand-
        off stays on device (jit output -> jit input, no host transfer)."""
        if not hasattr(self, '_rt_fns'):
            self._rt_fns = (jax.jit(self._traced_encode,
                                    static_argnums=(3, 4)),
                            jax.jit(self._traced_decode_verify,
                                    static_argnums=(7, 8)))
        return self._rt_fns

    def split_roundtrip(self):
        """Fresh (un-cached) roundtrip callable over the split program pair
        — drop-in for jax.jit(_traced_roundtrip, static_argnums=(3,)) at
        call sites that must run on the TPU backend (see roundtrip_fns).
        Fresh jits so trace-time flags (FAST_CONV etc.) take effect."""
        enc = jax.jit(self._traced_encode, static_argnums=(3, 4))
        dec = jax.jit(self._traced_decode_verify, static_argnums=(7, 8))

        def rt(params, codes, count, caps=None, fast_mask=0):
            bptr, buf, _c, eb, bc = enc(params, codes, count, caps, fast_mask)
            return dec(params, eb, bc, bptr, buf, codes, count, caps,
                       fast_mask)
        return rt

    def device_roundtrip(self, params: Dict, xyz: np.ndarray):
        """Host wrapper for the loopback path -> (recon xyz, lossless, bytes)."""
        enc, dec = self.roundtrip_fns()
        offset, codes_np = self._prep_xyz(xyz)
        caps, fast_mask = self._effective_plan(codes_np, len(codes_np))
        codes = jnp.asarray(sp_pad_codes(codes_np, caps[0]))
        count = jnp.int32(len(codes_np))
        bptr, buf, _c, eb, bc = enc(params, codes, count, caps, fast_mask)
        coords, ok, nbytes = dec(params, eb, bc, bptr, buf, codes, count,
                                 caps, fast_mask)
        return (np.asarray(coords)[:len(codes_np)] + offset[None],
                bool(ok), int(nbytes))

    def pre_test_hook(self):
        """With cfg.quantize_param, a test pass doubles as PTQ calibration:
        every compressed cloud is recorded and post_test_hook converts +
        saves the integer checkpoint (the reference's observer-insertion /
        int-impl-replacement flow, reference: lossl_coord/model.py:633-642)."""
        if self.cfg.quantize_param:
            self._calib_clouds = []
            self._calib_params = None

    def post_test_hook(self):
        clouds = getattr(self, '_calib_clouds', None)
        if not (self.cfg.quantize_param and clouds):
            return
        import pickle
        from ..lossl_coord_int.quantize import convert
        iparams = convert(self, self._calib_params, clouds)
        path = self.cfg.int_param_save_path
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        # plain pickle (not save_checkpoint): keeps python-int leaves
        # (e_f, shifts) as ints for the integer model
        with open(path, 'wb') as f:
            pickle.dump({'state_dict': iparams}, f, protocol=4)
        self._calib_clouds = None

    def compress(self, params: Dict, xyz: np.ndarray) -> bytes:
        """xyz: [N, 3] non-negative ints (unique rows)."""
        if getattr(self, '_calib_clouds', None) is not None:
            self._calib_clouds.append(np.array(xyz))
            self._calib_params = params
        enc, _ = self._coders()
        offset, codes_np = self._prep_xyz(xyz)
        n = len(codes_np)
        cap = _bucket(n)
        top = self.max_down - self.cfg.skip_top_scales_num
        if self.cfg.device_coder:
            caps, fast_mask = self._effective_plan(codes_np, n)
            cap = caps[0]
            codes = jnp.asarray(sp_pad_codes(codes_np, cap))
            t0 = time.perf_counter()
            bptr, buf, bottom_coords_dev, _bcodes, bcount = self._mega_encode(
                params, codes, jnp.int32(n), caps, fast_mask)
            if self.profile:
                jax.block_until_ready(buf)
            self._prof('mega_encode', t0)
            t0 = time.perf_counter()
            blob = ir.stream_to_bytes(bptr, buf, self.cfg.coder_lanes)
            bottom_n = int(bcount)
            bottom_coords = np.asarray(bottom_coords_dev)[:bottom_n]
            self._prof('enc_fetch', t0)
            t0 = time.perf_counter()
            k = self._encode_bottom_coords(enc, bottom_coords)
            with io.BytesIO() as bs:
                bs.write(bytes([1]))
                for v in offset.tolist():
                    bs.write(int(v).to_bytes(2, 'little'))
                bs.write(bottom_n.to_bytes(4, 'little'))
                bs.write(n.to_bytes(4, 'little'))
                bs.write(k.to_bytes(4, 'little'))
                # per-scale capacities: decoder must compile identical shapes
                bs.write(bytes([len(caps)]))
                for c in caps:
                    bs.write(int(c).to_bytes(3, 'little'))
                # per-scale conv-routing plan: the decoder must route each
                # scale's convs exactly as the encoder did (fast paths are
                # deterministic approximations) — see _scale_plan packing
                bs.write(int(fast_mask).to_bytes(4, 'little'))
                bs.write(len(blob).to_bytes(4, 'little'))
                bs.write(blob)
                bs.write(enc.flush())
                self._prof('enc_host_coder', t0)
                return bs.getvalue()
        t0 = time.perf_counter()
        codes = jnp.asarray(sp_pad_codes(codes_np, cap))
        pyramid = _build_pyramid(codes, jnp.int32(n), self.bits, top)
        counts = jax.device_get([pyramid[s - 1][1] for s in range(1, top + 1)])
        self._prof('pyramid', t0)

        states: Dict[int, _ScaleState] = {
            0: _ScaleState(codes, jnp.int32(n), n)}
        for s in range(1, top + 1):
            pc, pcnt, bins, c2p, octant, _ = pyramid[s - 1]
            states[s] = _ScaleState(pc, pcnt, int(counts[s - 1]), bins)
            # c2p/octant describe how scale s-1 rows map into scale s:
            # stored on the child state (same convention as the decode path)
            states[s - 1].c2p = c2p
            states[s - 1].octant = octant
        self._thread_tables(states, top)

        def symbols_of(s):
            return pyramid[s - 1][5]

        collected = self._run_scales(params, states, top, symbols_of)
        for starts, freqs in collected:
            enc.encode_raw(starts, freqs)
        bottom_coords = np.asarray(
            masked_decode(states[top].codes, self.bits)[:states[top].n])
        k = self._encode_bottom_coords(enc, bottom_coords)

        with io.BytesIO() as bs:
            bs.write(bytes([0]))
            for v in offset.tolist():
                bs.write(int(v).to_bytes(2, 'little'))
            bs.write(states[top].n.to_bytes(4, 'little'))
            bs.write(n.to_bytes(4, 'little'))
            bs.write(k.to_bytes(4, 'little'))
            bs.write(enc.flush())
            return bs.getvalue()

    # NN step hooks — overridden by the integer model
    # (fastpcc_tpu/models/lossl_coord_int) for integer-only decode.
    def _init_feats(self, cap: int):
        return jnp.ones((cap, 1), self.compute_dtype)

    def _nn_logits(self, mod, p, feats, table):
        return _osp_logits(self.cfg.channels, mod.if_upsample,
                           mod.allow_single_ch, sp.current_fast(), p, feats,
                           table)

    def _nn_upsample(self, mod, p, dec_feats, bins, table, c2p, octant):
        return _osp_upsample(self.cfg.channels, mod.if_upsample,
                             mod.allow_single_ch, sp.current_fast(), p,
                             dec_feats, bins, table, c2p, octant)

    def _nn_ms_root(self, mod, p, feats, root_table, bins_root, embed_dense):
        return _ms_root(self.cfg.channels, mod.pred_steps,
                        self.cfg.feature_propagation, sp.current_fast(), p,
                        feats, root_table, bins_root, embed_dense)

    def _nn_ms_chain(self, mod, p, root_out, chain_tables, select_maps,
                     cat_bins):
        return _ms_chain(self.cfg.channels, mod.pred_steps,
                         self.cfg.feature_propagation, sp.current_fast(), p,
                         root_out, chain_tables, select_maps, cat_bins)

    def _nn_cdf(self, logits):
        # pallas kernel on TPU (2.7x: one VMEM pass, no [N, 255] f32 HBM
        # intermediates); jnp elsewhere. Encoder and decoder both run this
        # hook on the same backend, so the quantized tables agree bit-exactly
        # (cross-BACKEND decode needs the integer model, as in the reference).
        from ...ops.sparse import _pallas_interpret
        if not _pallas_interpret():
            from ...ops.pallas_cdf import cdf_rows_pallas
            return cdf_rows_pallas(logits)
        return _cdf_rows(logits)

    def _nn_pairs(self, logits, syms):
        # encode-side (start, freq) pairs. Fused pallas kernel on TPU
        # (skips the [N, 255] u16 CDF HBM write + the per-symbol iota-
        # compare fusion of _enc_pairs); the composition elsewhere.
        # FASTPCC_FUSED_PAIRS=0 restores the two-step path for A/B runs.
        from ...ops.sparse import _pallas_interpret
        if (not _pallas_interpret()
                and os.environ.get('FASTPCC_FUSED_PAIRS', '1') != '0'):
            from ...ops.pallas_cdf import enc_pairs_pallas
            return enc_pairs_pallas(logits, syms)
        return _enc_pairs(self._nn_cdf(logits), syms)

    def _top_table_cap(self, cap: int, top: int, batch_hint: int = 1) -> int:
        """Static row bound for the coarsest-scale table: a sample has at
        most 8^(bits-top) distinct top-scale codes. Searching over the full
        padded capacity instead made the two top-table builds cost ~4.7 s of
        an 8.1 s whole-frame roundtrip (HLO device profile, round 2)."""
        side = self.bits - top
        if 3 * side >= 60:
            return cap
        return min(cap, max(int(batch_hint) << (3 * side), 8))

    def _top_table(self, codes, count, top, batch_hint: int = 1):
        """Coarsest-scale table: search only the first `tc` rows (all valid
        codes live there), then restore the full [cap, 27] miss=cap
        convention with a constant-pad concat."""
        cap = codes.shape[0]
        tc = self._top_table_cap(cap, top, batch_hint)
        small = sp.build_neighbor_table(codes[:tc], count, self.bits,
                                        self.bits - top)
        if tc == cap:
            return small
        rows = jnp.where(small == tc, cap, small)
        return jnp.concatenate(
            [rows, jnp.full((cap - tc, 27), cap, jnp.int32)], axis=0)

    @staticmethod
    def _static_trivial(fast_mask: int, s: int):
        """Planned triviality of the table at scale s (None = runtime cond,
        the exact legacy behavior when the fast program is off)."""
        if not (fast_mask & 1):
            return None
        return bool((fast_mask >> (16 + s)) & 1)

    def _thread_tables(self, states, top, batch_hint: int = 1, fast_mask=0):
        """Propagate neighbor tables top-down through the scale states
        (one small searchsorted at the coarsest scale, pure gathers below)."""
        states[top].table = self._top_table(
            states[top].codes, states[top].count, top, batch_hint)
        for s in range(top - 1, 0, -1):
            states[s].table = sp.child_table_from_parent(
                states[s + 1].table, states[s].c2p, states[s].octant,
                states[s].count, states[s + 1].count,
                static_trivial=self._static_trivial(fast_mask, s))

    def _table(self, state: _ScaleState, s: int):
        if state.table is None:
            t0 = time.perf_counter()
            state.table = sp.build_neighbor_table(
                state.codes, state.count, self.bits, self.bits - s)
            if self.profile:
                jax.block_until_ready(state.table)
            self._prof('table_build', t0)
        return state.table

    def _run_scales(self, params, states, top, symbols_of,
                    decode_scale=None, fast_mask=0):
        """Shared encode/decode scale loop. With ``symbols_of`` (encode), the
        true symbols are looked up and (start, freq) pairs are collected in
        scale order 1..top (finest first). With ``decode_scale`` (decode),
        symbols come from the rANS stream and child scales are expanded.

        fast_mask is the _scale_plan packed routing (bit 0 = fast program;
        bit idx = scale idx dense -> windowed kernel, else the cond-free
        center+correction path; bits 16+ = table triviality). The mask is
        authoritative — mask 0 means the exact legacy program regardless of
        the FAST_CONV global, so a stream decodes with the exact routing
        its encoder used."""
        ch = self.cfg.channels
        cap = states[top].codes.shape[0]
        feats = self._init_feats(cap)
        collected = []
        fast_on = bool(fast_mask & 1)
        for idx in range(top, 0, -1):
            if fast_on:
                scope = 'windowed' if (fast_mask >> idx) & 1 else 'corr'
            else:
                scope = False
            # named scope -> XLA op metadata -> per-scale attribution in
            # device traces (scripts/scale_profile.py)
            with jax.named_scope(f'scale{idx}'), sp.fast_conv_scope(scope):
                feats = self._one_scale(params, states, top, symbols_of,
                                        decode_scale, collected, idx, feats,
                                        fast_mask)
        return collected

    def _one_scale(self, params, states, top, symbols_of, decode_scale,
                   collected, idx, feats, fast_mask=0):
        if not self.cfg.feature_propagation:
            # fresh ones sized to THIS scale's capacity (caps grow toward
            # fine scales at decode time)
            feats = jnp.ones((states[idx].codes.shape[0], 1),
                             self.compute_dtype)
        name, mod = self._block_info(idx, top)
        p = params[name]
        if isinstance(mod, OneScalePredictor):
            t0 = time.perf_counter()
            dec_feats, logits = self._nn_logits(
                mod, p, feats, self._table(states[idx], idx))
            if self.profile:
                jax.block_until_ready(logits)
            self._prof('nn_logits', t0)
            bins = self._code_scale(idx, logits, states, symbols_of,
                                    decode_scale, collected, fast_mask)
            t0 = time.perf_counter()
            if mod.if_upsample and idx != 1:
                feats = self._nn_upsample(
                    mod, p, dec_feats, bins,
                    self._table(states[idx], idx),
                    states[idx - 1].c2p, states[idx - 1].octant)
            else:
                feats = dec_feats
            if self.profile:
                jax.block_until_ready(feats)
            self._prof('nn_upsample', t0)
        else:
            k = mod.pred_steps
            r = idx + k - 1
            if k == 2:
                embed_dense = None
            else:
                src = states[idx + 1]
                anc_rows = sp.compose_maps(
                    [states[t].c2p for t in range(idx + 1, r)],
                    states[r].codes.shape[0])
                embed_dense = sp.ancestor_rows_dense(
                    src.codes, src.count,
                    src.bins.astype(self.compute_dtype), anc_rows,
                    states[r].codes.shape[0], k - 2)
            root_out = self._nn_ms_root(mod, p, feats,
                                        self._table(states[r], r),
                                        states[r].bins, embed_dense)
            chain_tables = tuple(self._table(states[r - i], r - i)
                                 for i in range(k))
            select_maps = tuple(
                (states[r - i - 1].c2p, states[r - i - 1].octant)
                for i in range(k - 1))
            cat_bins = tuple([states[r - i].bins for i in range(1, k - 1)]
                             + [None])
            logits = self._nn_ms_chain(mod, p, root_out, chain_tables,
                                       select_maps, cat_bins)
            self._code_scale(idx, logits, states, symbols_of,
                             decode_scale, collected, fast_mask)
            feats = root_out
        return feats

    def _prof(self, key, t0):
        if self.profile:
            self.last_profile[key] = (self.last_profile.get(key, 0.0)
                                      + time.perf_counter() - t0)

    def _code_scale(self, idx, logits, states, symbols_of, decode_scale,
                    collected, fast_mask=0):
        """Turn one scale's logits into coded symbols (encode) or decoded
        bins + expanded child scale (decode). Returns the bins at scale idx."""
        st = states[idx]
        if symbols_of is not None:   # encode path
            syms = symbols_of(idx)
            t0 = time.perf_counter()
            # pairs straight from logits: on the encode side the CDF
            # table's only consumer is the per-symbol (start, freq)
            # selection, so the fused kernel skips the [N, 255] u16 HBM
            # round-trip entirely (bit-identical pairs; decode still
            # builds the full table below)
            starts, freqs = self._nn_pairs(logits, syms)
            if self.profile:
                jax.block_until_ready(freqs)
            self._prof('enc_pairs', t0)
            if self.cfg.device_coder:
                collected.insert(0, (starts, freqs, st.count))
            else:
                t0 = time.perf_counter()
                collected.insert(0, (np.asarray(starts[:st.n]),
                                     np.asarray(freqs[:st.n]) - 1))
                self._prof('enc_pair_fetch', t0)
            if st.bins is None:
                st.bins = sp.symbols_to_bins(syms).astype(jnp.float32)
            return st.bins
        # decode path
        cap = st.codes.shape[0]
        t0 = time.perf_counter()
        cdfs = self._nn_cdf(logits)
        if self.profile:
            jax.block_until_ready(cdfs)
        self._prof('cdf_rows', t0)
        if getattr(self, '_use_device_decode', self.cfg.device_coder):
            t0 = time.perf_counter()
            rs, ptr, stream = self._rans
            rs, ptr, syms = ir.decode_segment(rs, ptr, stream, cdfs, st.count)
            self._rans = (rs, ptr, stream)
            if self.profile:
                jax.block_until_ready(syms)
            self._prof('rans_decode', t0)
            child_n = cap  # host never needs the exact count mid-decode
        else:
            _, dec = self._coders()
            t0 = time.perf_counter()
            cdf_host = fetch_chunked(cdfs, st.n)
            self._prof('dec_cdf_fetch', t0)
            t0 = time.perf_counter()
            syms_host = np.empty((st.n,), np.uint16)
            dec.decode(cdf_host, syms_host)
            self._prof('dec_rans', t0)
            syms = jnp.asarray(sp_pad_codes(
                syms_host.astype(np.int64), cap, fill=0)).astype(jnp.int32)
            child_n = int(np.unpackbits(
                (syms_host.astype(np.uint16) + 1).view(np.uint8)).sum())
        child_cap = self._dec_caps[idx - 1] \
            if getattr(self, '_dec_caps', None) is not None else cap
        bins_f, child_codes, child_count, p_of_c, oct_of_c = \
            _expand_from_symbols(st.codes, st.count, syms, self.bits,
                                 child_cap)
        st.bins = bins_f
        child = _ScaleState(child_codes, child_count, child_n)
        child.c2p, child.octant = p_of_c, oct_of_c
        if idx > 1:   # scale-0 tables are never used
            child.table = sp.child_table_from_parent(
                self._table(st, idx), p_of_c, oct_of_c, child_count,
                st.count,
                static_trivial=self._static_trivial(fast_mask, idx - 1))
        states[idx - 1] = child
        return bins_f

    def decompress(self, params: Dict, data: bytes) -> np.ndarray:
        _, dec = self._coders()
        with io.BytesIO(data) as bs:
            fmt = bs.read(1)[0]
            offset = np.array([int.from_bytes(bs.read(2), 'little')
                               for _ in range(3)], np.int32)
            bottom_n = int.from_bytes(bs.read(4), 'little')
            org_n = int.from_bytes(bs.read(4), 'little')
            k = int.from_bytes(bs.read(4), 'little')
            caps = None
            fast_mask = 0
            if fmt == 1:
                n_caps = bs.read(1)[0]
                caps = tuple(int.from_bytes(bs.read(3), 'little')
                             for _ in range(n_caps))
                fast_mask = int.from_bytes(bs.read(4), 'little')
                blob_len = int.from_bytes(bs.read(4), 'little')
                blob = bs.read(blob_len)
            else:
                blob = b''
            stream = bs.read()
        dec.flush(stream)

        top = self.max_down - self.cfg.skip_top_scales_num
        cap = _bucket(org_n)
        self._use_device_decode = fmt == 1
        t0 = time.perf_counter()
        coords = self._decode_bottom_coords(dec, bottom_n * 3, k).reshape(-1, 3)
        codes_np = np.sort(np_morton_encode(coords.astype(np.int64)))
        self._prof('dec_host_coder', t0)
        if fmt == 1:
            words, _, _ = ir.bytes_to_stream(blob, self._word_capacity(cap),
                                             self.cfg.coder_lanes)
            t0 = time.perf_counter()
            coords_dev = self._mega_decode(
                params, jnp.asarray(sp_pad_codes(codes_np, caps[top])),
                jnp.int32(bottom_n), words, caps, fast_mask)
            xyz = np.asarray(coords_dev)[:org_n]
            self._prof('mega_decode', t0)
            return xyz + offset[None]
        states = {top: _ScaleState(jnp.asarray(sp_pad_codes(codes_np, cap)),
                                   jnp.int32(bottom_n), bottom_n)}
        states[top].table = self._top_table(states[top].codes,
                                            states[top].count, top)
        self._run_scales(params, states, top, symbols_of=None,
                         decode_scale=True)
        final = states[0]
        xyz = np.asarray(masked_decode(final.codes, self.bits)[:org_n])
        return xyz + offset[None]


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _ancestor_dense(codes, count, bins, anc_codes, bits, levels, dtype):
    return sp.ancestor_gather_dense(codes, count, bins.astype(dtype),
                                    anc_codes, bits, levels)


def sp_pad_codes(arr: np.ndarray, cap: int, fill=None) -> np.ndarray:
    out = np.full((cap,), (1 << 62) if fill is None else fill,
                  dtype=np.int64)
    out[:len(arr)] = arr
    return out
