"""lossy_coord_v3 — per-scale-latent lossy geometry compression (newest
reference lossy model; AVS configs).

TPU-native rebuild of the reference
(reference: models/convolutional/lossy_coord_v3/model.py:43-753): a
lossless-style occupancy pyramid in which each scale may (a) refine its
features with coded LATENTS (analysis/synthesis transforms with a factorized
EM at train time, empirical bincount CDFs at eval), and (b) reconstruct its
child occupancy either LOSSLESSLY (255-way octant coding, as the lossl_coord
flagship) or LOSSILY (8-way occupancy logits; decode keeps the top-k
candidates per the transmitted point budget — no occupancy bits at all).
Rate points come from `lossl_geo_upsample` / `num_latents` /
`coord_recon_loss_factor` configs.

TPU-first: sorted Morton codes, parent-propagated neighbor tables, and the
interleaved word coder; eval decode is device-resident (octants + latents),
with only the bottom coordinates host-coded.
"""
import functools
import io
import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from ...ops import ilv_rans as ir
from ...ops.morton import masked_decode, np_morton_encode
from ...runtime import RansEncoder, RansDecoder
from ...entropy_models.indexed import pmf_to_quantized_cdf_rows
from ..lossy_coord.model import _bucket, _bce, sp_pad
from ..lossl_coord.model import (_cdf_rows, _enc_pairs, _build_pyramid,
                                 _expand_from_symbols)
from .network import V3OneScalePredictor, V3EncStage
from .model_config import Config

LOG2_E = math.log2(math.e)


class V3Net(nn.Module):
    cfg: Config

    def setup(self):
        c = self.cfg
        d = int(math.log2(c.max_stride))
        nl = c.num_latents
        # encoder feature stages exist up to the last scale with latents
        last_latent = max((i + 1 for i, v in enumerate(nl) if v > 0),
                          default=0)
        self.enc_stages = [V3EncStage(c.channels, first=(s == 2))
                           for s in range(2, last_latent + 1)]
        self.rec = V3OneScalePredictor(
            c.channels, 0, True, True, True, c.compressed_channels,
            c.em_tail_range)
        self.fine = [V3OneScalePredictor(
            c.channels, nl[i], bool(c.lossl_geo_upsample[i]),
            if_upsample=(i != 0), allow_single_ch=False,
            compressed_channels=c.compressed_channels,
            em_tail=c.em_tail_range) for i in range(len(nl))]

    def block(self, s: int):
        return self.fine[s - 1] if s <= len(self.fine) else self.rec


def _scale_plan(cfg):
    d = int(math.log2(cfg.max_stride))
    nl = list(cfg.num_latents) + [0] * (d - len(cfg.num_latents))
    lossl = [bool(v) for v in cfg.lossl_geo_upsample] + \
        [True] * (d - len(cfg.lossl_geo_upsample))
    last_latent = max((i + 1 for i, v in enumerate(cfg.num_latents) if v > 0),
                      default=0)
    first_lossl = next((i + 1 for i, v in enumerate(lossl) if v), d + 1)
    return d, nl, lossl, last_latent, first_lossl


def _topk_bins(logits8, valid, target):
    """Lossy occupancy selection (reference: model.py:140-153, 229-236):
    keep per-row argmax plus everything above the (N*8 - target)-th value."""
    n = logits8.shape[0]
    lg = jnp.where(valid[:, None], logits8, -jnp.inf)
    row_max = lg == lg.max(axis=1, keepdims=True)
    flat = jnp.where(valid[:, None], logits8, jnp.inf).reshape(-1)
    order = jnp.sort(flat)
    k = jnp.clip(valid.sum() * 8 - target, 1, n * 8) - 1
    kth = order[k]
    keep = (lg > kth) | (row_max & valid[:, None])
    return keep & valid[:, None]


def _true_child_bins(recon_codes, recon_count, true_codes, true_count, bits):
    """Occupancy of TRUE child points within RECON parent cells (the training
    target once coordinates drift; reference: custom_spdownsample +
    get_bin, model.py:283-300, 446-449)."""
    children = sp.children_codes(recon_codes, bits)            # [N, 8]
    member = sp.membership_mask(children.reshape(-1), true_codes, true_count)
    member = member.reshape(children.shape)
    return member & (jnp.arange(recon_codes.shape[0]) < recon_count)[:, None]


class Model:
    """Public API: train_loss / compress / decompress (reference Model,
    lossy_coord_v3/model.py:317)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.bits = cfg.coord_bits
        self.net = V3Net(cfg)
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' \
            else jnp.float32
        self._enc = None
        self._dec = None
        self._mega_encode = jax.jit(functools.partial(_encode_impl, self.net))
        self._mega_decode = jax.jit(functools.partial(_decode_impl, self.net),
                                    static_argnums=(4,))
        cdf1 = np.arange(2, 65537, dtype=np.int64).astype(np.uint16)
        cdf1[-1] = 65535
        self._side_cdf1 = cdf1[None]

    def init_params(self, rng: jax.Array, example_n: int = 512) -> Dict:
        cap = _bucket(example_n)
        r = np.random.default_rng(0)
        codes_np = np.sort(r.choice(1 << 12, size=min(cap // 4, 1 << 11),
                                    replace=False)).astype(np.int64)
        codes = jnp.asarray(sp_pad(codes_np, cap))
        count = jnp.int32(len(codes_np))
        pn = jnp.asarray([float(len(codes_np))], jnp.float32)
        v = self.net.init(rng, codes, count, pn, jax.random.PRNGKey(1),
                          jnp.int32(0), method=_train_apply)
        return v['params']

    def train_loss(self, params, codes, count, points_num, step=0,
                   rng: Optional[jax.Array] = None):
        if rng is None:
            rng = jax.random.fold_in(jax.random.PRNGKey(7), jnp.asarray(step))
        return self.net.apply({'params': params}, codes, count, points_num,
                              rng, step, method=_train_apply)

    # -------------------------------------------------------------- coding

    def _coders(self):
        if self._enc is None:
            self._enc = RansEncoder(32 * 1024 * 1024)
            self._dec = RansDecoder()
        return self._enc, self._dec

    def compress(self, params, xyz: np.ndarray) -> bytes:
        from ..lossy_coord.model import Model as V1Model
        enc, _ = self._coders()
        cfg = self.cfg
        offset = xyz.min(0)
        codes_np = np.unique(np_morton_encode((xyz - offset).astype(np.int64)))
        n = len(codes_np)
        cap = _bucket(n)
        out = self._mega_encode({'params': params},
                                jnp.asarray(sp_pad(codes_np, cap)),
                                jnp.int32(n))
        (bptr, buf, latent_rows, bottom_coords_d, bcount, fine_counts) = out
        blob = ir.stream_to_bytes(bptr, buf, cfg.coder_lanes)
        bn = int(bcount)
        bcoords = np.asarray(bottom_coords_d)[:bn]
        coord_stream = V1Model._encode_bottom_coords(self, enc, bcoords)
        d, nl, lossl, last_latent, first_lossl = _scale_plan(cfg)
        counts_np = np.asarray(fine_counts).tolist()
        alpha = 2 * cfg.latent_bound + 1
        with io.BytesIO() as bs:
            for v in offset.tolist():
                bs.write(int(v).to_bytes(2, 'little'))
            bs.write(n.to_bytes(4, 'little'))
            bs.write(bn.to_bytes(4, 'little'))
            # point budgets of the lossy scales (scale 0 .. first_lossl-2)
            for c in counts_np[:max(first_lossl - 1, 0)]:
                bs.write(int(c).to_bytes(4, 'little'))
            # per-(scale, latent) empirical CDF rows
            bs.write(np.asarray(latent_rows).astype('<u2').tobytes())
            bs.write(len(blob).to_bytes(4, 'little'))
            bs.write(blob)
            bs.write(len(coord_stream).to_bytes(4, 'little'))
            bs.write(coord_stream)
            return bs.getvalue()

    def decompress(self, params, data: bytes) -> np.ndarray:
        from ..lossy_coord.model import Model as V1Model
        _, dec = self._coders()
        cfg = self.cfg
        d, nl, lossl, last_latent, first_lossl = _scale_plan(cfg)
        n_lat = sum(nl)
        alpha = 2 * cfg.latent_bound + 1
        with io.BytesIO(data) as bs:
            offset = np.array([int.from_bytes(bs.read(2), 'little')
                               for _ in range(3)], np.int64)
            n = int.from_bytes(bs.read(4), 'little')
            bn = int.from_bytes(bs.read(4), 'little')
            budgets = [int.from_bytes(bs.read(4), 'little')
                       for _ in range(max(first_lossl - 1, 0))]
            latent_rows = np.frombuffer(bs.read(2 * alpha * max(n_lat, 1)),
                                        '<u2').reshape(max(n_lat, 1), alpha)
            blob = bs.read(int.from_bytes(bs.read(4), 'little'))
            coord_stream = bs.read(int.from_bytes(bs.read(4), 'little'))
        cap = _bucket(n)
        bcoords = V1Model._decode_bottom_coords(self, dec, coord_stream,
                                                bn * 3).reshape(-1, 3)
        bcodes = np.sort(np_morton_encode(bcoords.astype(np.int64)))
        capw = ir.word_capacity_for(2 * cap + cap * max(n_lat, 1),
                                    cfg.coder_lanes)
        words, _, _ = ir.bytes_to_stream(blob, capw, cfg.coder_lanes)
        budgets_j = jnp.asarray(
            (budgets + [0])[:max(first_lossl - 1, 0) + 1], jnp.int32)
        coords = self._mega_decode(
            {'params': params}, words,
            jnp.asarray(latent_rows), jnp.asarray(sp_pad(bcodes, cap)),
            cap, jnp.int32(bn), budgets_j)
        # count of the final scale = budget of scale 0 (lossy) or exact
        return np.asarray(coords[0])[:int(coords[1])] + offset[None]


# ---------------------------------------------------------------- drivers


def _features_chain(net, pyramid, tables, codes, count, cfg, dtype, top):
    """Encoder-side strided features for the latent scales.

    Returns {scale: feats}: scale 1 features are the scale-0 bins (the Fold),
    deeper scales conv+downsample (reference: model.py:336-350, 426-431)."""
    d, nl, lossl, last_latent, first_lossl = _scale_plan(cfg)
    feats = {}
    if last_latent == 0:
        return feats
    f = pyramid[0][2].astype(dtype)         # scale-1 bins [cap, 8]
    feats[1] = f
    for s in range(2, min(last_latent, top) + 1):
        stage = net.enc_stages[s - 2]
        f = stage.pre_conv(f, tables[s - 1])
        child_codes, child_count = (codes, count) if s - 1 == 0 \
            else pyramid[s - 2][:2]
        anc_rows = pyramid[s - 1][3]        # maps scale s-1 rows -> s
        dense = sp.ancestor_rows_dense(child_codes, child_count, f, anc_rows,
                                       pyramid[s - 1][0].shape[0], 1)
        f = stage.post_down(dense, tables[s])
        feats[s] = f
    return feats


def _thread_tables_pyr(pyramid, codes, count, bits, top):
    tables = {top: sp.build_neighbor_table(
        pyramid[top - 1][0], pyramid[top - 1][1], bits, bits - top)}
    for s in range(top - 1, 0, -1):
        c2p_s, oct_s = pyramid[s][3], pyramid[s][4]
        cnt_s = pyramid[s - 1][1]
        tables[s] = sp.child_table_from_parent(tables[s + 1], c2p_s, oct_s,
                                               cnt_s)
    return tables


def _train_apply(net: V3Net, codes, count, points_num, rng, step):
    cfg = net.cfg
    bits = cfg.coord_bits
    cap = codes.shape[0]
    dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' else jnp.float32
    d, nl, lossl, last_latent, first_lossl = _scale_plan(cfg)
    top = d
    total_points = points_num.sum()
    batch = points_num.shape[0]

    pyramid = _build_pyramid(codes, count, bits, top)
    tables = _thread_tables_pyr(pyramid, codes, count, bits, top)
    feats_by_scale = _features_chain(net, pyramid, tables, codes, count, cfg,
                                     dtype, top)
    warm = jnp.asarray(step) < cfg.warmup_steps

    def pcount(s):
        return count if s == 0 else pyramid[s - 1][1]

    def pcodes(s):
        return codes if s == 0 else pyramid[s - 1][0]

    loss = {}
    cur = jnp.ones((cap, 1), dtype)
    cur_codes, cur_count = pcodes(top), pcount(top)
    cur_true = True
    cur_table = tables[top]
    for s in range(top, 0, -1):
        blk = net.block(s)
        table_s = tables[s] if cur_true else cur_table
        cur = blk.features(cur, table_s)
        valid = (jnp.arange(cap) < cur_count).astype(jnp.float32)
        for li in range(blk.num_latents):
            y = blk.latent_analysis(li, feats_by_scale[s].astype(dtype), cur,
                                    table_s, cfg.latent_bound)
            y_tilde, bits_l = blk.latent_train_bits(
                li, y, jax.random.fold_in(rng, s * 8 + li), valid)
            w = jnp.where(warm, 0.01, 1.0)
            loss[f'stride{2 ** s}_fea{li}_loss'] = bits_l / total_points * w
            cur = blk.latent_synthesis(li, y_tilde, cur, table_s)
        logits = blk.predict(cur, table_s)
        if blk.if_pred_oct_lossl:
            syms = pyramid[s - 1][5]
            lg = logits.astype(jnp.float32)
            lse = jax.nn.logsumexp(lg, axis=-1)
            tgt = jnp.take_along_axis(lg, jnp.clip(syms, 0, 254)[:, None],
                                      axis=-1)[:, 0]
            loss[f'stride{2 ** s}_geo_loss'] = \
                ((lse - tgt) * valid).sum() * (LOG2_E / batch) / total_points
            bins = pyramid[s - 1][2]
            keep = bins.astype(bool)
            c2p_s, oct_s = pyramid[s - 1][3], pyramid[s - 1][4]
            next_codes, next_count = pcodes(s - 1), pcount(s - 1)
            next_true = cur_true
        else:
            tbins = _true_child_bins(cur_codes, cur_count, pcodes(s - 1),
                                     pcount(s - 1), bits)
            bce = _bce(logits, tbins.astype(jnp.float32))
            up_n = pcount(s - 1).astype(jnp.float32)
            loss[f'stride{2 ** s}_geo_loss'] = \
                (bce * valid[:, None]).sum() / jnp.maximum(up_n, 1.0) \
                * cfg.coord_recon_loss_factor * LOG2_E / batch
            keep = _topk_bins(logits, jnp.arange(cap) < cur_count,
                              pcount(s - 1)) | tbins
            bins = keep.astype(jnp.float32)
            next_true = False
        if s != 1:
            if blk.if_pred_oct_lossl and cur_true:
                child, p_of_c, oct_of_c = (None, c2p_s, oct_s)
                next_codes2, next_count2 = next_codes, next_count
            else:
                child, p_of_c, oct_of_c = sp.expand_children(
                    cur_codes, cur_count, keep, bits, cap)
                next_codes2, next_count2 = child.codes, child.count
            x = blk.upsample(cur, bins, p_of_c, oct_of_c)
            cur = blk.upsample_tail(x, table_s, p_of_c, oct_of_c)
            if next_true:
                cur_table = tables[s - 1]
            else:
                cur_table = sp.child_table_from_parent(
                    table_s, p_of_c, oct_of_c, next_count2)
            cur_codes, cur_count = next_codes2, next_count2
            cur_true = next_true
    total = sum(loss.values())
    loss['loss'] = total
    return total, loss


def _encode_impl(net: V3Net, variables, codes, count):
    return net.apply(variables, codes, count,
                     method=lambda m, c, n: _encode_core(m, c, n))


def _encode_core(net: V3Net, codes, count):
    """Eval encode (traceable) -> (bptr, buf, latent CDF rows, bottom coords,
    bottom count, per-scale true counts)."""
    cfg = net.cfg
    bits = cfg.coord_bits
    cap = codes.shape[0]
    dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' else jnp.float32
    d, nl, lossl, last_latent, first_lossl = _scale_plan(cfg)
    top = d - cfg.skip_top_scales_num
    bound = cfg.latent_bound
    alpha = 2 * bound + 1

    pyramid = _build_pyramid(codes, count, bits, top)
    tables = _thread_tables_pyr(pyramid, codes, count, bits, top)
    feats_by_scale = _features_chain(net, pyramid, tables, codes, count, cfg,
                                     dtype, top)

    def pcount(s):
        return count if s == 0 else pyramid[s - 1][1]

    segments = []          # decode order
    latent_rows = []
    cur = jnp.ones((cap, 1), dtype)
    # coded scales: everything down to the last lossless-or-latent scale
    stop = 1
    for s in range(1, top + 1):
        if lossl[s - 1] or nl[s - 1] > 0:
            stop = s
            break
    else:
        stop = top + 1
    for s in range(top, stop - 1, -1):
        blk = net.block(s)
        table_s = tables[s]
        cur = blk.features(cur, table_s)
        for li in range(blk.num_latents):
            y = blk.latent_analysis(li, feats_by_scale[s].astype(dtype), cur,
                                    table_s, bound)
            syms = jnp.clip(jnp.round(y), -bound, bound).astype(jnp.int32)
            flat = (syms + bound).reshape(-1)
            vmask = (jnp.arange(cap) < pcount(s))
            vflat = jnp.repeat(vmask, syms.shape[-1])
            onehot = (flat[:, None] == jnp.arange(alpha)[None, :]) \
                & vflat[:, None]
            pmf = onehot.sum(0).astype(jnp.float32)
            pmf = pmf / jnp.maximum(pmf.sum(), 1.0)
            row = pmf_to_quantized_cdf_rows(pmf[None])[0]
            latent_rows.append(row)
            rows = jnp.broadcast_to(row[None], (flat.shape[0], alpha))
            segments.append((rows, flat, pcount(s) * syms.shape[-1]))
            cur = blk.latent_synthesis(li, syms.astype(jnp.float32), cur,
                                       table_s)
        if lossl[s - 1]:
            logits = blk.predict(cur, table_s)
            cdfs = _cdf_rows(logits)
            syms = pyramid[s - 1][5]
            segments.append((cdfs, jnp.clip(syms, 0, 254), pcount(s)))
        if s != stop:
            bins = pyramid[s - 1][2]
            c2p_s, oct_s = pyramid[s - 1][3], pyramid[s - 1][4]
            x = blk.upsample(cur, bins, c2p_s, oct_s)
            cur = blk.upsample_tail(x, table_s, c2p_s, oct_s)

    lanes = cfg.coder_lanes
    total_syms = sum(int(r[1].shape[0]) for r in segments)
    capw = ir.word_capacity_for(total_syms, lanes)
    rs, bptr, buf = ir.init_encoder(lanes, capw)
    for rows, syms, cnt in reversed(segments):
        starts, freqs = ir.enc_pairs(rows, syms)
        rs, bptr, buf = ir.encode_segment(rs, bptr, buf, starts, freqs, cnt)
    bptr, buf = ir.encode_flush(rs, bptr, buf)

    bottom_coords = masked_decode(pyramid[top - 1][0], bits)
    fine_counts = jnp.stack([pcount(s) for s in range(0, top)])
    rows_out = jnp.stack(latent_rows) if latent_rows \
        else jnp.zeros((1, alpha), jnp.uint16)
    return bptr, buf, rows_out, bottom_coords, pcount(top), fine_counts


def _decode_impl(net: V3Net, variables, stream, latent_rows, bottom_codes,
                 cap: int, bottom_count, budgets):
    return net.apply(variables, stream, latent_rows, bottom_codes,
                     bottom_count, budgets,
                     method=lambda m, st, lr, bc, bn, bu: _decode_core(
                         m, st, lr, bc, cap, bn, bu))


def _decode_core(net: V3Net, stream, latent_rows, bottom_codes, cap: int,
                 bottom_count, budgets):
    """Eval decode (traceable) -> (coords [cap, 3], final count)."""
    cfg = net.cfg
    bits = cfg.coord_bits
    dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' else jnp.float32
    d, nl, lossl, last_latent, first_lossl = _scale_plan(cfg)
    top = d - cfg.skip_top_scales_num
    bound = cfg.latent_bound
    alpha = 2 * bound + 1
    lanes = cfg.coder_lanes
    cc = cfg.compressed_channels

    rs, ptr = ir.init_decoder(stream, jnp.int32(0), lanes)
    cur = jnp.ones((cap, 1), dtype)
    cur_codes = bottom_codes
    cur_count = bottom_count
    cur_table = sp.build_neighbor_table(cur_codes, cur_count, bits,
                                        bits - top)
    lat_i = sum(nl)            # consumed back-to-front per scale order
    lat_cursor = 0
    # latent rows are stored in ENCODE collection order: scales top..stop
    for s in range(top, 0, -1):
        blk = net.block(s)
        cur = blk.features(cur, cur_table)
        for li in range(blk.num_latents):
            row = latent_rows[lat_cursor]
            lat_cursor += 1
            rows = jnp.broadcast_to(row[None], (cap * cc, alpha))
            rs, ptr, syms = ir.decode_segment(rs, ptr, stream, rows,
                                              cur_count * cc)
            y = syms.reshape(cap, cc).astype(jnp.float32) - bound
            cur = blk.latent_synthesis(li, y, cur, cur_table)
        logits = blk.predict(cur, cur_table)
        valid = jnp.arange(cap) < cur_count
        if blk.if_pred_oct_lossl:
            cdfs = _cdf_rows(logits)
            rs, ptr, syms = ir.decode_segment(rs, ptr, stream, cdfs,
                                              cur_count)
            bins_f, child_codes, child_count, p_of_c, oct_of_c = \
                _expand_from_symbols(cur_codes, cur_count, syms, bits, cap)
            keep_bins = bins_f
        else:
            keep = _topk_bins(logits, valid, budgets[s - 1])
            child, p_of_c, oct_of_c = sp.expand_children(
                cur_codes, cur_count, keep, bits, cap)
            child_codes, child_count = child.codes, child.count
            keep_bins = keep.astype(jnp.float32)
        if s != 1:
            x = blk.upsample(cur, keep_bins, p_of_c, oct_of_c)
            cur = blk.upsample_tail(x, cur_table, p_of_c, oct_of_c)
            cur_table = sp.child_table_from_parent(cur_table, p_of_c,
                                                   oct_of_c, child_count)
        cur_codes, cur_count = child_codes, child_count
    return masked_decode(cur_codes, bits), cur_count
