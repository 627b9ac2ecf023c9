"""lossy_coord — PCGCv2-style lossy geometry compression (baseline).

TPU-native rebuild of the reference model
(reference: models/convolutional/lossy_coord/model.py:34-526 with
baseline.yaml): a 3-stage sparse encoder to an 8-channel bottleneck coded by
a factorized (DeepFactorized) entropy model, and a 3-stage generative-
upsample decoder that classifies candidate children and prunes adaptively to
transmitted per-scale point budgets (reference:
generative_upsample.py:29-171). Bottom-scale coordinates are coded raw with
a bincount CDF (the reference shells out to G-PCC tmc3 here,
model.py:386-397; tmc3 is not shipped, so the self-contained raw coder is
the default).

Bitstream: [4B n_points][4B bottom_n][3x4B offset]
           [NUM_SCALES x 4B target counts]
           [len-prefixed streams: EM bytes, bottom-coord bytes]
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
from ...entropy_models.batched import (ContinuousBatchedEntropyModel,
                                       build_coder, compress_with_coder,
                                       decompress_with_coder)
from ...entropy_models.hyperprior import ScaleHyperprior, HyperpriorCoder
from ...entropy_models.utils import concat_byte_streams, split_byte_streams
from .network import EncoderStage, DecoderStage, ConvBlock3
from .recurrent import RecurrentEM
from .model_config import Config

NUM_SCALES = 3  # encoder/decoder stages (PCGCv2 topology)


def _bucket(n: int, minimum: int = 1024) -> int:
    return max(1 << math.ceil(math.log2(max(n, 1))), minimum)


def _bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _rec_cap(cap: int, cfg) -> int:
    """Static row capacity of the recurrent part (scales >= 3); point counts
    shrink ~8x per scale, so a fraction of the full capacity suffices."""
    return max(cap // cfg.rec_capacity_div, 64)


def _sep_coords(codes, bits):
    """[N] packed codes -> [N, 3] float coords with the batch index folded
    into x as a huge offset, so nearest-neighbor searches never cross
    samples (distances beyond dist_upper_bound are clamped anyway)."""
    from ...ops.morton import morton_decode
    mask = (jnp.int64(1) << (3 * bits)) - 1
    xyz = morton_decode(codes & mask).astype(jnp.float32)
    batch = (codes >> (3 * bits)).astype(jnp.float32)
    return xyz.at[:, 0].add(batch * float(2 << bits))


def _dist_loss_target(cand_codes, cand_count, logits, true_codes, true_count,
                      bits, upper_bound):
    """Squared-distance regression target for the Dist reconstruction loss
    (reference: lossy_coord/generative_upsample.py:144-166): knn(1) distance
    to the true coords at this scale, clamped to upper_bound; where both the
    prediction and the target exceed the bound the target follows the
    prediction (no gradient)."""
    from ...ops.knn import nn_distance
    q = _sep_coords(cand_codes, bits)
    r = _sep_coords(jnp.where(jnp.arange(true_codes.shape[0]) < true_count,
                              true_codes, jnp.int64(0)), bits)
    d = nn_distance(q, r, true_count)
    pred_over = logits > upper_bound
    tgt_over = d > upper_bound
    d = jnp.where(~pred_over & tgt_over, upper_bound, d)
    d = jnp.where(pred_over & tgt_over, jax.lax.stop_gradient(logits), d)
    return d


def _huber(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * ax * ax, ax - 0.5)


def sp_pad(arr: np.ndarray, cap: int, fill=None) -> np.ndarray:
    out = np.full((cap,), (1 << 62) if fill is None else fill,
                  np.int64)
    out[:len(arr)] = arr
    return out


class HyperConvEncoder(nn.Module):
    """Sparse-conv hyper encoder y -> z (reference HyperEncoder: stride-1
    conv stacks at the bottleneck scale, lossy_coord/layers.py:250-283)."""
    channels: Tuple[int, ...]
    out: int

    @nn.compact
    def __call__(self, y, table):
        x = jnp.abs(y)
        for ch in self.channels:
            x = ConvBlock3(ch, 'relu')(x, table)
        from ...nn.blocks import SparseConv3x3
        return SparseConv3x3(self.out)(x, table).astype(jnp.float32)


class HyperConvDecoder(nn.Module):
    """Sparse-conv hyper decoder z -> positive scale indexes."""
    channels: Tuple[int, ...]
    out: int

    @nn.compact
    def __call__(self, z, table):
        x = z
        for ch in self.channels:
            x = ConvBlock3(ch, 'relu')(x, table)
        from ...nn.blocks import SparseConv3x3
        x = SparseConv3x3(self.out)(x, table).astype(jnp.float32)
        return nn.softplus(x) * 8.0


class HyperMLP(nn.Module):
    """Pointwise hyper-encoder y -> z."""
    out: int

    @nn.compact
    def __call__(self, y, table=None):
        del table                         # pointwise net; table is conv-only
        h = nn.relu(nn.Dense(32, param_dtype=jnp.float32)(jnp.abs(y)))
        return nn.Dense(self.out, param_dtype=jnp.float32)(h)


class HyperScaleMLP(nn.Module):
    """Pointwise hyper-decoder z -> per-element scale indexes (>0)."""
    out: int

    @nn.compact
    def __call__(self, z, table=None):
        del table                         # pointwise net; table is conv-only
        h = nn.relu(nn.Dense(32, param_dtype=jnp.float32)(z))
        return nn.softplus(nn.Dense(self.out, param_dtype=jnp.float32)(h)) * 8.0


class LossyNet(nn.Module):
    """All learnable pieces; params live in one tree."""
    cfg: Config

    def setup(self):
        c = self.cfg
        rec = c.em_mode == 'lossless_based'
        enc_ch = c.encoder_channels          # (4, 16, 64, 64)
        bottleneck_ch = c.recurrent_part_channels if rec \
            else c.compressed_channels
        self.first = ConvBlock3(enc_ch[0], 'relu')
        self.enc_stages = [
            EncoderStage(enc_ch[i + 1],
                         enc_ch[i + 1] if i < NUM_SCALES - 1 else bottleneck_ch,
                         c.basic_block_type, c.basic_block_num,
                         last_act='relu' if (i < NUM_SCALES - 1 or rec)
                         else None)
            for i in range(NUM_SCALES)]
        if rec:
            # recurrent lossless-based EM (reference: geo_lossl_em.py:20-400)
            self.em = RecurrentEM(
                hidden=c.recurrent_part_channels,
                channels=c.compressed_channels,
                block_type=c.basic_block_type,
                block_num=c.basic_block_num,
                act='relu',
                coord_index_ranges=c.lossless_coord_indexes_range,
                fea_index_ranges=c.prior_indexes_range,
                fea_num_filters=c.lossless_fea_num_filters,
                hybrid_hyper_decoder_fea=c.hybrid_hyper_decoder_fea,
                fea_tail_range=c.em_tail_range,
                bottleneck_process=c.bottleneck_process)
        elif c.em_mode == 'hyperprior':
            if c.hyper_net == 'conv':
                he = HyperConvEncoder(c.hyper_encoder_channels,
                                      c.hyper_channels)
                hd = HyperConvDecoder(c.hyper_decoder_channels,
                                      c.compressed_channels)
            else:
                he = HyperMLP(c.hyper_channels)
                hd = HyperScaleMLP(c.compressed_channels)
            self.em = ScaleHyperprior(
                hyper_encoder=he, hyper_decoder=hd,
                hyper_channels=c.hyper_channels,
                z_tail_range=c.em_tail_range, y_tail_range=c.em_tail_range)
        else:
            self.em = ContinuousBatchedEntropyModel(
                c.compressed_channels, tail_range=c.em_tail_range)
        dec_ch = c.decoder_channels          # (64, 16, 4)
        self.dec_stages = [
            DecoderStage(dec_ch[i], c.basic_block_type, c.basic_block_num)
            for i in range(NUM_SCALES)]

    def encode_bottom(self, feats0, tables, pyramids):
        """pyramids[s] = (child codes, child count, parent codes)."""
        x = self.first(feats0, tables[0])
        for i, stage in enumerate(self.enc_stages):
            child_codes, child_count, parent_codes = pyramids[i]
            dense = sp.ancestor_gather_dense(
                child_codes, child_count, x, parent_codes,
                self.cfg.coord_bits, 1)
            x = stage(dense, tables[i + 1])
        return x

    def em_train(self, y, rng, mask, table=None):
        if self.cfg.em_mode == 'hyperprior':
            if self.cfg.hyper_net == 'conv':
                return self.em(y, rng, mask, table)
            return self.em(y, rng, mask)
        y_tilde = self.em.perturb(y, rng)
        return y_tilde, self.em.bits(y_tilde, mask)

    def em_encode_path(self, y):
        return self.em.encode_path(y)

    def em_decode_path(self, z_int):
        return self.em.decode_path(z_int)

    def em_z_pmf(self, lower, upper):
        return self.em.z_pmf(lower, upper)

    def em_y_pmf(self):
        return self.em.y_pmf()

    def em_pmf(self, lower, upper):
        return self.em.pmf_table(lower, upper)

    def dec_child_feats(self, i: int, parent_feats):
        return self.dec_stages[i].child_feats(parent_feats)

    def dec_classify(self, i: int, cand_feats, cand_table):
        return self.dec_stages[i].refine_and_classify(cand_feats, cand_table)


def _train_apply(net: LossyNet, codes, count, points_num, rng, step):
    """Full training pass -> (loss, aux)."""
    cfg = net.cfg
    bits = cfg.coord_bits
    cap = codes.shape[0]
    dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' else jnp.float32

    grids = [(codes, count)]
    dmaps = []
    g = sp.VoxelGrid(codes=codes, count=count, bits=bits)
    for s in range(NUM_SCALES):
        octant = (g.codes & 7).astype(jnp.int32)
        parent, _, c2p = sp.downsample_with_bins(g.codes, g.count, bits,
                                                 g.stride_log2)
        dmaps.append((c2p, octant))
        grids.append((parent.codes, parent.count))
        g = parent

    # tables propagate top-down from one cheap coarse-scale search
    tables = [None] * (NUM_SCALES + 1)
    tables[NUM_SCALES] = sp.build_neighbor_table(
        grids[NUM_SCALES][0], grids[NUM_SCALES][1], bits, bits - NUM_SCALES)
    for s in range(NUM_SCALES - 1, -1, -1):
        tables[s] = sp.child_table_from_parent(tables[s + 1], *dmaps[s],
                                               grids[s][1])

    feats0 = jnp.ones((cap, 1), dtype)
    pyramids = [(grids[s][0], grids[s][1], grids[s + 1][0])
                for s in range(NUM_SCALES)]
    y = net.encode_bottom(feats0, tables, pyramids).astype(jnp.float32)

    valid_bottom = (jnp.arange(cap) < grids[NUM_SCALES][1]).astype(jnp.float32)
    if cfg.em_mode == 'lossless_based':
        y_tilde, em_bits, _ = _rec_em_train(
            net, y, grids[NUM_SCALES][0], grids[NUM_SCALES][1], bits, rng,
            _rec_cap(cap, cfg), dtype)
    else:
        y_tilde, em_bits = net.em_train(y, rng, valid_bottom,
                                        tables[NUM_SCALES])
    total_points = points_num.sum()

    feats = (y_tilde * valid_bottom[:, None]).astype(dtype)
    parent_codes, parent_count = grids[NUM_SCALES]
    parent_table = tables[NUM_SCALES]
    cand_cap = cap * 2
    bce_total = 0.0
    for i in range(NUM_SCALES):
        scale_child = NUM_SCALES - 1 - i
        child_dense = net.dec_child_feats(i, feats)        # [P, 8, C]
        pcap = parent_codes.shape[0]
        all8 = jnp.broadcast_to(
            (jnp.arange(pcap) < parent_count)[:, None], (pcap, 8))
        cand, p_of_c, oct_of_c = sp.expand_children(
            parent_codes, parent_count, all8, bits, cand_cap)
        flat = child_dense.reshape(pcap * 8, -1)
        flat = jnp.concatenate([flat, jnp.zeros_like(flat[:1])], 0)
        cand_feats = flat[jnp.minimum(p_of_c * 8 + oct_of_c, pcap * 8)]
        cand_table = sp.child_table_from_parent(parent_table, p_of_c,
                                                oct_of_c, cand.count)
        refined, logits = net.dec_classify(i, cand_feats, cand_table)
        logits = logits.astype(jnp.float32)
        target = sp.membership_mask(cand.codes, grids[scale_child][0],
                                    grids[scale_child][1])
        cand_valid = jnp.arange(cand_cap) < cand.count
        if cfg.coord_recon_loss_type == 'Dist':
            d_tgt = _dist_loss_target(cand.codes, cand.count, logits,
                                      grids[scale_child][0],
                                      grids[scale_child][1], bits,
                                      cfg.dist_upper_bound)
            per_cand = _huber(logits - d_tgt)
            keep_now = target | (logits <= 0.5)
        else:
            per_cand = _bce(logits, target.astype(jnp.float32))
            keep_now = target | (logits > 0)
        # reference normalizes per-candidate mean per scale
        # (reference: lossy_coord/model.py:501-526)
        bce_total = bce_total + (per_cand * cand_valid).sum() \
            / jnp.maximum(cand.count, 1) / NUM_SCALES

        if i < NUM_SCALES - 1:
            keep = keep_now & cand_valid
            new_codes, new_count, gather_idx = sp.mask_compact(
                cand.codes, keep, cand_cap)
            feats = sp.gather_padded(refined, gather_idx)
            parent_codes, parent_count = new_codes, new_count
            parent_table = sp.compact_table(cand_table, gather_idx, new_count)

    bpp = em_bits / total_points
    warmup = jnp.where(jnp.asarray(step) < cfg.warmup_steps,
                       cfg.warmup_bpp_loss_factor, cfg.bpp_loss_factor)
    loss = bce_total * cfg.coord_recon_loss_factor + bpp * warmup
    aux = {'loss': loss, 'bce_loss': bce_total, 'bpp_loss': bpp}
    return loss, aux


# --------------------------------------------------------------------------
# recurrent lossless-based EM drivers (reference: geo_lossl_em.py:94-329)
# --------------------------------------------------------------------------

_BCAP = 8  # static row capacity for the 1-voxel-per-sample bottom scale


def _octant_gather(dense: jax.Array, p_of_c: jax.Array,
                   octant: jax.Array) -> jax.Array:
    """[M, 8, C] per-octant parent outputs -> child rows via (parent, octant)
    maps (misses -> zeros)."""
    m = dense.shape[0]
    flat = dense.reshape(m * 8, -1)
    flat = jnp.concatenate([flat, jnp.zeros_like(flat[:1])], 0)
    return flat[jnp.minimum(p_of_c * 8 + octant, m * 8)]


def _rec_pyramid(net, codes3, count3, bits):
    """Scales 3..coord_bits of the recurrent part (row capacity = rec_cap).
    Returns (scales, maps, tables): scales[s] = (codes, count);
    maps[s] = (child_to_parent, octant) mapping scale-s rows into s+1."""
    top = net.cfg.coord_bits
    scales = {NUM_SCALES: (codes3, count3)}
    maps, tables = {}, {}
    g = (codes3, count3)
    for s in range(NUM_SCALES, top):
        octant = (g[0] & 7).astype(jnp.int32)
        parent, _, c2p = sp.downsample_with_bins(g[0], g[1], bits, 0)
        maps[s] = (c2p, octant)
        scales[s + 1] = (parent.codes, parent.count)
        g = (parent.codes, parent.count)
    # tables propagate top-down from one cheap coarse-scale search
    tables[top] = sp.build_neighbor_table(*scales[top], bits, bits - top)
    for s in range(top - 1, NUM_SCALES - 1, -1):
        tables[s] = sp.child_table_from_parent(tables[s + 1], *maps[s],
                                               scales[s][1])
    return scales, maps, tables


def _rec_encoder_pass(net, y_r, scales, tables, bits, dtype):
    """Gated recurrent downsampling (reference: layers.py:450-476):
    y_r [rec_cap, H] at scale 3 -> list of hx per scale 3..top (float32)."""
    top = net.cfg.coord_bits
    cx = y_r.astype(dtype)
    hx = net.em.first_hx(cx)
    hx_list = [hx]
    for i, s in enumerate(range(NUM_SCALES, top)):
        cxg = net.em.enc_forget(i, cx, hx.astype(cx.dtype))
        dense = sp.ancestor_gather_dense(
            scales[s][0], scales[s][1], cxg, scales[s + 1][0], bits, 1)
        cx, hx = net.em.enc_step_parent(i, dense, tables[s + 1])
        hx_list.append(hx)
    return hx_list


def _rec_coord_nn(net, i, lower, codes_sp1, count_sp1, parent_table,
                  cand_cap, bits, s, dtype):
    # cand_cap = rec_cap * cfg.rec_cand_factor
    """Hyper-decode candidate-occupancy indexes at all 8 children of scale
    s+1 (reference: geo_lossl_em.py:117-122)."""
    dense8 = net.em.hd_coord_up(i, lower.astype(dtype))
    pcap = codes_sp1.shape[0]
    all8 = jnp.broadcast_to((jnp.arange(pcap) < count_sp1)[:, None], (pcap, 8))
    cand, p_of_c, oct_of_c = sp.expand_children(
        codes_sp1, count_sp1, all8, bits, cand_cap)
    cand_feats = _octant_gather(dense8, p_of_c, oct_of_c)
    cand_table = sp.child_table_from_parent(parent_table, p_of_c, oct_of_c,
                                            cand.count)
    idx_coord = net.em.hd_coord_refine(i, cand_feats, cand_table)
    return cand, p_of_c, oct_of_c, idx_coord, cand_table


def _rec_fea_nn(net, i, lower, c2p_s, oct_s, table_s, dtype):
    """Hyper-decode fea indexes (and hybrid prediction) onto the scale-s
    coords (reference: geo_lossl_em.py:131-156)."""
    dense8f = net.em.hd_fea_up(i, lower.astype(dtype))
    feats = _octant_gather(dense8f, c2p_s, oct_s)
    info = net.em.hd_fea_refine(i, feats, table_s)
    return net.em.split_fea_pred(info)


def _rec_em_train(net, y, codes3, count3, bits, rng, rec_cap, dtype):
    """Training bits of the lossless-based EM -> (y_tilde at scale 3 [cap],
    total bits, per-scale dict)."""
    cfg = net.cfg
    top = cfg.coord_bits
    steps = top - NUM_SCALES
    cap = codes3.shape[0]
    codes3_r = codes3[:rec_cap]
    count3_r = jnp.minimum(count3, rec_cap)
    y_r = y[:rec_cap].astype(jnp.float32)
    scales, maps, tables = _rec_pyramid(net, codes3_r, count3_r, bits)
    hx_list = _rec_encoder_pass(net, y_r, scales, tables, bits, dtype)

    valid_b = (jnp.arange(rec_cap) < scales[top][1]).astype(jnp.float32)
    y_tilde_b, bits_bottom = net.em.bottom_train(
        hx_list[-1], jax.random.fold_in(rng, 0), valid_b)
    lower = y_tilde_b * valid_b[:, None]
    loss = {'fea_bottom_bits': bits_bottom}
    for i in range(steps - 1, -1, -1):
        s = NUM_SCALES + i
        codes_s, count_s = scales[s]
        codes_sp1, count_sp1 = scales[s + 1]
        cand, _, _, idx_coord, _ = _rec_coord_nn(
            net, i, lower, codes_sp1, count_sp1, tables[s + 1],
            rec_cap * net.cfg.rec_cand_factor, bits, s, dtype)
        target = sp.membership_mask(cand.codes, codes_s, count_s)
        cand_valid = (jnp.arange(cand.codes.shape[0]) < cand.count) \
            .astype(jnp.float32)
        loss[f'coord_{i}_bits'] = net.em.coord_bits(
            target.astype(jnp.float32), idx_coord, cand_valid)
        pred, idx_f = _rec_fea_nn(net, i, lower, *maps[s], tables[s], dtype)
        y_s = hx_list[i]
        res = y_s - pred if pred is not None else y_s
        valid_s = (jnp.arange(rec_cap) < count_s).astype(jnp.float32)
        y_res_tilde, fbits = net.em.fea_train(
            res, idx_f, jax.random.fold_in(rng, i + 1), valid_s[:, None])
        loss[f'fea_{i}_bits'] = fbits
        lower = (y_res_tilde + pred if pred is not None else y_res_tilde)
        lower = lower * valid_s[:, None]
    total = sum(loss.values())
    y_tilde = jnp.pad(lower, ((0, cap - rec_cap), (0, 0)))
    return y_tilde, total, loss


def _rec_encode_em(net, y, codes3, count3, bits, rec_cap, dtype):
    """Eval encode of the lossless-based EM on device -> (bptr, buf, ok).

    Segments are collected in DECODE order (bottom, then coarse->fine
    coord/fea pairs) and fed to the LIFO word encoder in reverse."""
    cfg = net.cfg
    top = cfg.coord_bits
    steps = top - NUM_SCALES
    tail = cfg.em_tail_range
    c = cfg.compressed_channels
    ok = count3 <= rec_cap
    codes3_r = codes3[:rec_cap]
    count3_r = jnp.minimum(count3, rec_cap)
    y_r = y[:rec_cap].astype(jnp.float32)
    scales, maps, tables = _rec_pyramid(net, codes3_r, count3_r, bits)
    hx_list = _rec_encoder_pass(net, y_r, scales, tables, bits, dtype)
    coord_table = net.em.coord_cdf_table()
    fea_table = net.em.fea_cdf_table()
    bottom_table = net.em.bottom_cdf_table()

    segments = []   # decode order
    count_b = scales[top][1]
    ok = ok & (count_b <= _BCAP)
    yb = hx_list[-1][:_BCAP]
    syms_b = jnp.clip(jnp.round(yb), -tail, tail).astype(jnp.int32) + tail
    rows_b = jnp.tile(bottom_table, (_BCAP, 1))
    segments.append((rows_b, syms_b.reshape(-1), count_b * c))
    valid_b = (jnp.arange(rec_cap) < count_b).astype(jnp.float32)
    lower = jnp.pad((syms_b - tail).astype(jnp.float32),
                    ((0, rec_cap - _BCAP), (0, 0))) * valid_b[:, None]

    for i in range(steps - 1, -1, -1):
        s = NUM_SCALES + i
        codes_s, count_s = scales[s]
        codes_sp1, count_sp1 = scales[s + 1]
        cand_cap = rec_cap * cfg.rec_cand_factor
        cand, _, _, idx_coord, _ = _rec_coord_nn(
            net, i, lower, codes_sp1, count_sp1, tables[s + 1], cand_cap,
            bits, s, dtype)
        ok = ok & (count_sp1 * 8 <= cand_cap)
        mask = sp.membership_mask(cand.codes, codes_s, count_s)
        rows_c = coord_table[net.em.coord_flat(idx_coord)]
        segments.append((rows_c, mask.astype(jnp.int32), cand.count))
        pred, idx_f = _rec_fea_nn(net, i, lower, *maps[s], tables[s], dtype)
        y_s = hx_list[i]
        res = y_s - pred if pred is not None else y_s
        syms = jnp.clip(jnp.round(res), -tail, tail).astype(jnp.int32)
        rows_f = fea_table[net.em.fea_flat(idx_f).reshape(-1)]
        segments.append((rows_f, (syms + tail).reshape(-1), count_s * c))
        valid_s = (jnp.arange(rec_cap) < count_s).astype(jnp.float32)
        y_rec = syms.astype(jnp.float32)
        lower = (y_rec + pred if pred is not None else y_rec) * valid_s[:, None]

    lanes = cfg.coder_lanes
    capw = ir.word_capacity_for(
        steps * rec_cap * (cfg.rec_cand_factor + c) + _BCAP * c, lanes)
    rs, bptr, buf = ir.init_encoder(lanes, capw)
    for rows, syms, cnt in reversed(segments):
        starts, freqs = ir.enc_pairs(rows, syms)
        rs, bptr, buf = ir.encode_segment(rs, bptr, buf, starts, freqs, cnt)
    bptr, buf = ir.encode_flush(rs, bptr, buf)
    return bptr, buf, ok


def _rec_decode_em(net, stream, bits, rec_cap, dtype):
    """Eval decode (device): stream words -> (codes3, count3, y3)."""
    cfg = net.cfg
    top = cfg.coord_bits
    steps = top - NUM_SCALES
    tail = cfg.em_tail_range
    c = cfg.compressed_channels
    lanes = cfg.coder_lanes
    coord_table = net.em.coord_cdf_table()
    fea_table = net.em.fea_cdf_table()
    bottom_table = net.em.bottom_cdf_table()

    rs, ptr = ir.init_decoder(stream, jnp.int32(0), lanes)
    count_b = jnp.int32(1)        # one voxel per sample (batch 1 at eval)
    rows_b = jnp.tile(bottom_table, (_BCAP, 1))
    rs, ptr, syms_b = ir.decode_segment(rs, ptr, stream, rows_b, count_b * c)
    valid_b = (jnp.arange(rec_cap) < count_b).astype(jnp.float32)
    lower = jnp.pad(syms_b.reshape(_BCAP, c).astype(jnp.float32) - tail,
                    ((0, rec_cap - _BCAP), (0, 0))) * valid_b[:, None]
    codes_sp1 = jnp.where(jnp.arange(rec_cap) < 1, jnp.int64(0),
                          jnp.int64(1) << 62)
    count_sp1 = count_b
    cur_table = sp.build_neighbor_table(codes_sp1, count_sp1, bits, bits - top)

    codes_s = codes_sp1
    count_s = count_sp1
    for i in range(steps - 1, -1, -1):
        s = NUM_SCALES + i
        cand_cap = rec_cap * cfg.rec_cand_factor
        cand, p_of_c, oct_of_c, idx_coord, cand_table = _rec_coord_nn(
            net, i, lower, codes_sp1, count_sp1, cur_table, cand_cap, bits,
            s, dtype)
        rows_c = coord_table[net.em.coord_flat(idx_coord)]
        rs, ptr, msyms = ir.decode_segment(rs, ptr, stream, rows_c, cand.count)
        keep = msyms.astype(bool) & (jnp.arange(cand_cap) < cand.count)
        codes_s, count_s, gidx = sp.mask_compact(cand.codes, keep, rec_cap)
        pad = jnp.full((1,), codes_sp1.shape[0], jnp.int32)
        p_pad = jnp.concatenate([p_of_c, pad])
        o_pad = jnp.concatenate([oct_of_c, jnp.zeros((1,), jnp.int32)])
        c2p_s = p_pad[jnp.minimum(gidx, cand_cap)]
        oct_s = o_pad[jnp.minimum(gidx, cand_cap)]
        table_s = sp.compact_table(cand_table, gidx, count_s)
        pred, idx_f = _rec_fea_nn(net, i, lower, c2p_s, oct_s, table_s, dtype)
        rows_f = fea_table[net.em.fea_flat(idx_f).reshape(-1)]
        rs, ptr, syms = ir.decode_segment(rs, ptr, stream, rows_f,
                                          count_s * c)
        y = syms.reshape(rec_cap, c).astype(jnp.float32) - tail
        valid_s = (jnp.arange(rec_cap) < count_s).astype(jnp.float32)
        lower = (y + pred if pred is not None else y) * valid_s[:, None]
        codes_sp1, count_sp1 = codes_s, count_s
        cur_table = table_s
    return codes_s, count_s, lower


# --------------------------------------------------------------------------
# adaptive pruning (eval)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('levels',))
def _local_max_mask(cand_codes, cand_count, logits, levels: int):
    """True where a candidate holds the max logit within its 2^levels cell
    (reference max-pool/unpool local-max, generative_upsample.py:75-84).
    Sorted codes make cells contiguous -> segment max."""
    n = cand_codes.shape[0]
    anc = cand_codes >> (3 * levels)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int64), anc[:-1]])
    seg_id = jnp.cumsum((anc != prev).astype(jnp.int32)) - 1
    valid = jnp.arange(n) < cand_count
    vals = jnp.where(valid, logits, -jnp.inf)
    seg_max = jax.ops.segment_max(vals, seg_id, num_segments=n)
    return (vals == seg_max[seg_id]) & valid


@functools.partial(jax.jit, static_argnames=('levels', 'keep_local_max'))
def adaptive_keep_mask(cand_codes, cand_count, logits, target_num,
                       levels: int, keep_local_max: bool = False):
    """keep = logit > threshold, threshold = k-th smallest non-local-max
    logit, k = n_valid - target (reference: generative_upsample.py:73-100,
    BCE branch, batch size 1 — local maxima are only excluded from the
    threshold computation, NOT force-kept). keep_local_max=True additionally
    unions local maxima in (the lossy_coord_v2 variant,
    reference: lossy_coord_v2/layers.py:176-180)."""
    n = cand_codes.shape[0]
    is_lmax = _local_max_mask(cand_codes, cand_count, logits, levels)
    valid = jnp.arange(n) < cand_count
    masked = valid & ~is_lmax
    vals = jnp.where(masked, logits, jnp.inf)
    order = jnp.sort(vals)
    k = jnp.clip(cand_count - target_num, 1, n) - 1
    threshold = order[k]
    keep = (logits > threshold) & valid
    if keep_local_max:
        keep = keep | is_lmax
    return keep


@functools.partial(jax.jit, static_argnames=('levels',))
def simple_keep_mask(cand_codes, cand_count, logits, levels: int):
    is_lmax = _local_max_mask(cand_codes, cand_count, logits, levels)
    valid = jnp.arange(cand_codes.shape[0]) < cand_count
    return ((logits > 0) & valid) | is_lmax


@functools.partial(jax.jit, static_argnames=('levels',))
def adaptive_keep_mask_dist(cand_codes, cand_count, logits, target_num,
                            levels: int):
    """Dist branch (reference: generative_upsample.py:100-119): SMALLER
    predicted distance = keep; threshold = k-th smallest over all candidates
    with k = target - n_local_max; cell maxima unioned in (the reference
    keeps the pooled representative of every cell)."""
    n = cand_codes.shape[0]
    is_lmax = _local_max_mask(cand_codes, cand_count, logits, levels)
    valid = jnp.arange(n) < cand_count
    n_lmax = (is_lmax & valid).sum()
    vals = jnp.where(valid, logits, jnp.inf)
    order = jnp.sort(vals)
    k = jnp.clip(target_num - n_lmax, 1, n) - 1
    threshold = order[k]
    return ((logits <= threshold) & valid) | is_lmax


@functools.partial(jax.jit, static_argnames=('levels',))
def simple_keep_mask_dist(cand_codes, cand_count, logits, levels: int):
    is_lmax = _local_max_mask(cand_codes, cand_count, logits, levels)
    valid = jnp.arange(cand_codes.shape[0]) < cand_count
    return ((logits <= 0.5) & valid) | is_lmax


# --------------------------------------------------------------------------


class Model:
    """Public API: train_loss / compress / decompress (mirrors the reference
    Model class, lossy_coord/model.py:34)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.bits = cfg.coord_bits
        self.net = LossyNet(cfg)
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' \
            else jnp.float32
        self._em_coder = None
        self._rans_enc = None
        self._rans_dec = None
        # bottom coords always use the self-contained raw coder here (the
        # reference shells out to tmc3, model.py:386-397) — recorded per
        # sample so RD artifacts state which coder produced them
        self.extra_metric_info = {'bottom_coord_coder': 'bincount_raw'}
        # jitted encode/decode closures over the (static) module
        self._jit_encode = jax.jit(
            functools.partial(_encode_impl, self.net),
            static_argnums=(3, 4))
        self._jit_decode_stage = jax.jit(
            functools.partial(_decode_stage_impl, self.net),
            static_argnums=(1, 6, 7, 8, 10))
        self._jit_rec_encode = jax.jit(
            functools.partial(_rec_encode_full, self.net),
            static_argnums=(3, 4, 5))
        self._jit_rec_decode = jax.jit(
            functools.partial(_rec_decode_full, self.net),
            static_argnums=(2, 3, 4))

    def _rec_word_capacity(self, rec_cap: int) -> int:
        steps = self.cfg.coord_bits - NUM_SCALES
        return ir.word_capacity_for(
            steps * rec_cap * (self.cfg.rec_cand_factor
                               + self.cfg.compressed_channels)
            + _BCAP * self.cfg.compressed_channels, self.cfg.coder_lanes)

    def init_params(self, rng: jax.Array, example_n: int = 512) -> Dict:
        cap = _bucket(example_n)
        codes_np = np.sort(np.random.default_rng(0).choice(
            1 << 15, size=cap // 4, replace=False)).astype(np.int64)
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

    # --------------------------------------------------------- coding

    def _coders(self, params):
        if self._em_coder is None:
            if self.cfg.em_mode == 'hyperprior':
                if self.cfg.hyper_net == 'conv':
                    he = HyperConvEncoder(self.cfg.hyper_encoder_channels,
                                          self.cfg.hyper_channels)
                    hd = HyperConvDecoder(self.cfg.hyper_decoder_channels,
                                          self.cfg.compressed_channels)
                else:
                    he = HyperMLP(self.cfg.hyper_channels)
                    hd = HyperScaleMLP(self.cfg.compressed_channels)
                hp = ScaleHyperprior(
                    hyper_encoder=he, hyper_decoder=hd,
                    hyper_channels=self.cfg.hyper_channels,
                    z_tail_range=self.cfg.em_tail_range,
                    y_tail_range=self.cfg.em_tail_range)
                self._em_coder = HyperpriorCoder(hp, {'params': params['em']})
            else:
                def pmf_fn(lower, upper):
                    return self.net.apply({'params': params}, lower, upper,
                                          method=LossyNet.em_pmf)
                self._em_coder = build_coder(
                    pmf_fn, self.cfg.compressed_channels,
                    self.cfg.em_tail_range)
            self._rans_enc = RansEncoder(1 << 22)
            self._rans_dec = RansDecoder()
        return self._em_coder, self._rans_enc, self._rans_dec

    def _encode_bottom_coords(self, enc: RansEncoder,
                              coords: np.ndarray) -> bytes:
        """Bincount-CDF coded raw coords; the alphabet size k travels as an
        explicit 4B prefix (the reference codes k against a 128-entry side
        CDF and asserts k-2 <= 128, reference: lossl_coord/model.py:486 —
        unbounded here)."""
        values = coords.reshape(-1).astype(np.int64)
        k = max(int(values.max(initial=0)) + 1, 2)
        pmf = np.bincount(values, minlength=k).astype(np.float64) / len(values)
        q = np.floor(pmf * (65536 - k)) + 1.0
        cdf = np.cumsum(q)
        cdf[-1] = 65535
        cdf = cdf.astype(np.uint16)
        enc.encode(cdf[None], values.astype(np.uint16))
        side1 = np.arange(2, 65537, dtype=np.int64).astype(np.uint16)
        side1[-1] = 65535
        enc.encode(side1[None], cdf[:-1].astype(np.int64).astype(np.uint16) - 1)
        return k.to_bytes(4, 'little') + enc.flush()

    def _decode_bottom_coords(self, dec: RansDecoder, blob: bytes,
                              n_values: int) -> np.ndarray:
        k = int.from_bytes(blob[:4], 'little')
        dec.flush(blob[4:])
        side1 = np.arange(2, 65537, dtype=np.int64).astype(np.uint16)
        side1[-1] = 65535
        row = np.empty((k - 1,), np.uint16)
        dec.decode(side1[None], row)
        cdf = np.zeros((k,), np.uint16)
        cdf[:-1] = row + 1
        cdf[-1] = 65535
        values = np.empty((n_values,), np.uint16)
        dec.decode(cdf[None], values)
        return values.astype(np.int32)

    def compress(self, params, xyz: np.ndarray) -> bytes:
        offset = xyz.min(0)
        codes_np = np.unique(np_morton_encode((xyz - offset).astype(np.int64)))
        n = len(codes_np)
        cap = _bucket(n)
        codes = jnp.asarray(sp_pad(codes_np, cap))
        count = jnp.int32(n)

        if self.cfg.em_mode == 'lossless_based':
            rec_cap = _rec_cap(cap, self.cfg)
            bptr, buf, ok, targets = self._jit_rec_encode(
                {'params': params}, codes, count, self.bits,
                self.compute_dtype, rec_cap)
            assert bool(ok), ('recurrent-EM capacity overflow: raise '
                              'rec_capacity_div headroom or input size')
            blob = ir.stream_to_bytes(bptr, buf, self.cfg.coder_lanes)
            scaler = self.cfg.adaptive_pruning_num_scaler
            tgt = [int(t * scaler) for t in np.asarray(targets)]
            with io.BytesIO() as bs:
                bs.write(n.to_bytes(4, 'little'))
                for v in offset.tolist():
                    bs.write(int(v).to_bytes(4, 'little', signed=True))
                for t in tgt:
                    bs.write(int(t).to_bytes(4, 'little'))
                bs.write(blob)
                return bs.getvalue()

        em_coder, enc, _ = self._coders(params)
        y_float, bottom_codes_np, bcount, targets = self._jit_encode(
            {'params': params}, codes, count, self.bits, self.compute_dtype)
        bottom_n = int(bcount)
        y_host = np.asarray(y_float)[:bottom_n]
        if self.cfg.em_mode == 'hyperprior':
            if self.cfg.hyper_net == 'conv':
                table = sp.build_neighbor_table(
                    bottom_codes_np, bcount, self.bits,
                    self.bits - NUM_SCALES)
                em_stream, _ = em_coder.compress(y_float, table=table,
                                                 n=bottom_n)
            else:
                em_stream, _ = em_coder.compress(jnp.asarray(y_host))
            em_streams = [em_stream]
        else:
            em_streams = compress_with_coder(
                em_coder, np.round(y_host).astype(np.int32)[None])
        bottom_coords = np.asarray(
            masked_decode(bottom_codes_np, self.bits)[:bottom_n])
        coord_stream = self._encode_bottom_coords(enc, bottom_coords)

        scaler = self.cfg.adaptive_pruning_num_scaler
        tgt = [int(t * scaler) for t in np.asarray(targets)]

        with io.BytesIO() as bs:
            bs.write(n.to_bytes(4, 'little'))
            bs.write(bottom_n.to_bytes(4, 'little'))
            for v in offset.tolist():
                bs.write(int(v).to_bytes(4, 'little', signed=True))
            for t in tgt:
                bs.write(int(t).to_bytes(4, 'little'))
            bs.write(concat_byte_streams([em_streams[0], coord_stream]))
            return bs.getvalue()

    def decompress(self, params, data: bytes) -> np.ndarray:
        if self.cfg.em_mode == 'lossless_based':
            with io.BytesIO(data) as bs:
                n = int.from_bytes(bs.read(4), 'little')
                offset = np.array(
                    [int.from_bytes(bs.read(4), 'little', signed=True)
                     for _ in range(3)], np.int64)
                targets = [int.from_bytes(bs.read(4), 'little')
                           for _ in range(NUM_SCALES)]
                blob = bs.read()
            cap = _bucket(n)
            rec_cap = _rec_cap(cap, self.cfg)
            words, _, _ = ir.bytes_to_stream(
                blob, self._rec_word_capacity(rec_cap), self.cfg.coder_lanes)
            parent_codes, parent_count, y3 = self._jit_rec_decode(
                {'params': params}, words, self.bits, self.compute_dtype,
                rec_cap)
            feats = y3.astype(self.compute_dtype)
            parent_table = sp.build_neighbor_table(
                parent_codes, parent_count, self.bits,
                self.bits - NUM_SCALES)
            for i in range(NUM_SCALES):
                scale_child = NUM_SCALES - 1 - i
                cand_cap = _bucket(min(int(parent_count) * 8, 8 * cap))
                out = self._jit_decode_stage(
                    {'params': params}, i, feats, parent_codes,
                    parent_count, parent_table, self.bits, scale_child,
                    cand_cap, jnp.int32(targets[scale_child]),
                    self.cfg.adaptive_pruning)
                parent_codes, parent_count, feats, parent_table = out
            final_count = int(parent_count)
            xyz = np.asarray(masked_decode(parent_codes, self.bits)
                             [:final_count])
            return xyz + offset[None]

        em_coder, _, dec = self._coders(params)
        with io.BytesIO(data) as bs:
            n = int.from_bytes(bs.read(4), 'little')
            bottom_n = int.from_bytes(bs.read(4), 'little')
            offset = np.array([int.from_bytes(bs.read(4), 'little', signed=True)
                               for _ in range(3)], np.int64)
            targets = [int.from_bytes(bs.read(4), 'little')
                       for _ in range(NUM_SCALES)]
            em_stream, coord_stream = split_byte_streams(bs.read(), 2)

        if self.cfg.em_mode == 'hyperprior' and self.cfg.hyper_net == 'conv':
            cap0 = _bucket(n)
            coords0 = self._decode_bottom_coords(
                dec, coord_stream, bottom_n * 3).reshape(-1, 3)
            bottom_codes0 = np.sort(np_morton_encode(coords0.astype(np.int64)))
            bc_j = jnp.asarray(sp_pad(bottom_codes0, cap0))
            table = sp.build_neighbor_table(bc_j, jnp.int32(bottom_n),
                                            self.bits, self.bits - NUM_SCALES)
            y_int = em_coder.decompress(
                em_stream, (bottom_n, self.cfg.hyper_channels),
                (bottom_n, self.cfg.compressed_channels),
                table=table, cap=cap0)
            coords, bottom_codes_cached = coords0, bottom_codes0
        elif self.cfg.em_mode == 'hyperprior':
            y_int = em_coder.decompress(
                em_stream, (bottom_n, self.cfg.hyper_channels),
                (bottom_n, self.cfg.compressed_channels))
        else:
            y_int = decompress_with_coder(
                em_coder, [em_stream],
                (bottom_n, self.cfg.compressed_channels))[0]
        if self.cfg.em_mode == 'hyperprior' and self.cfg.hyper_net == 'conv':
            bottom_codes = bottom_codes_cached
        else:
            coords = self._decode_bottom_coords(
                dec, coord_stream, bottom_n * 3).reshape(-1, 3)
            bottom_codes = np.sort(np_morton_encode(coords.astype(np.int64)))

        cap = _bucket(n)
        parent_codes = jnp.asarray(sp_pad(bottom_codes, cap))
        parent_count = jnp.int32(bottom_n)
        feats = jnp.asarray(
            sp_pad2(y_int.astype(np.float32), cap)).astype(self.compute_dtype)

        parent_table = sp.build_neighbor_table(
            parent_codes, parent_count, self.bits, self.bits - NUM_SCALES)
        for i in range(NUM_SCALES):
            scale_child = NUM_SCALES - 1 - i
            cand_cap = _bucket(min(int(parent_count) * 8, 8 * cap))
            out = self._jit_decode_stage(
                {'params': params}, i, feats, parent_codes,
                parent_count, parent_table, self.bits, scale_child,
                cand_cap, jnp.int32(targets[scale_child]),
                self.cfg.adaptive_pruning)
            parent_codes, parent_count, feats, parent_table = out
        final_count = int(parent_count)
        xyz = np.asarray(masked_decode(parent_codes, self.bits)[:final_count])
        return xyz + offset[None]


def sp_pad2(arr: np.ndarray, cap: int) -> np.ndarray:
    out = np.zeros((cap,) + arr.shape[1:], arr.dtype)
    out[:len(arr)] = arr
    return out


def _encoder_core(net, codes, count, bits, dtype):
    """Bound-module encoder pass -> (bottleneck y, bottom codes, bottom
    count, per-scale target counts)."""
    cap = codes.shape[0]
    grids = [(codes, count)]
    dmaps = []
    g = sp.VoxelGrid(codes=codes, count=count, bits=bits)
    for s in range(NUM_SCALES):
        octant = (g.codes & 7).astype(jnp.int32)
        parent, _, c2p = sp.downsample_with_bins(g.codes, g.count, bits,
                                                 g.stride_log2)
        dmaps.append((c2p, octant))
        grids.append((parent.codes, parent.count))
        g = parent
    tables = [None] * (NUM_SCALES + 1)
    tables[NUM_SCALES] = sp.build_neighbor_table(
        grids[NUM_SCALES][0], grids[NUM_SCALES][1], bits, bits - NUM_SCALES)
    for s in range(NUM_SCALES - 1, -1, -1):
        tables[s] = sp.child_table_from_parent(tables[s + 1], *dmaps[s],
                                               grids[s][1])
    feats0 = jnp.ones((cap, 1), dtype)
    pyramids = [(grids[s][0], grids[s][1], grids[s + 1][0])
                for s in range(NUM_SCALES)]
    y = net.encode_bottom(feats0, tables, pyramids).astype(jnp.float32)
    targets = jnp.stack([grids[s][1] for s in range(NUM_SCALES)])
    return y, grids[NUM_SCALES][0], grids[NUM_SCALES][1], targets


def _encode_impl(net, variables, codes, count, bits, dtype):
    """Encoder pass -> (rounded bottleneck, bottom codes/count, targets)."""
    return net.apply(variables, codes, count,
                     method=lambda m, c, n: _encoder_core(m, c, n, bits, dtype))


def _rec_encode_full(net, variables, codes, count, bits, dtype, rec_cap):
    """lossless_based eval encode: encoder + recurrent EM + word coder."""
    def fn(m, c, n):
        y, codes3, count3, targets = _encoder_core(m, c, n, bits, dtype)
        bptr, buf, ok = _rec_encode_em(m, y, codes3, count3, bits, rec_cap,
                                       dtype)
        return bptr, buf, ok, targets
    return net.apply(variables, codes, count, method=fn)


def _rec_decode_full(net, variables, stream, bits, dtype, rec_cap):
    """lossless_based eval decode: stream -> (codes3, count3, y3)."""
    def fn(m, s):
        return _rec_decode_em(m, s, bits, rec_cap, dtype)
    return net.apply(variables, stream, method=fn)


def _decode_stage_impl(net, variables, stage_i, feats, parent_codes,
                       parent_count, parent_table, bits, scale_child,
                       cand_cap, target_num, adaptive):
    child_dense = net.apply(variables, stage_i, feats,
                            method=LossyNet.dec_child_feats)
    pcap = parent_codes.shape[0]
    all8 = jnp.broadcast_to((jnp.arange(pcap) < parent_count)[:, None],
                            (pcap, 8))
    cand, p_of_c, oct_of_c = sp.expand_children(
        parent_codes, parent_count, all8, bits, cand_cap)
    flat = child_dense.reshape(pcap * 8, -1)
    flat = jnp.concatenate([flat, jnp.zeros_like(flat[:1])], 0)
    cand_feats = flat[jnp.minimum(p_of_c * 8 + oct_of_c, pcap * 8)]
    cand_table = sp.child_table_from_parent(parent_table, p_of_c, oct_of_c,
                                            cand.count)
    refined, logits = net.apply(variables, stage_i, cand_feats, cand_table,
                                method=LossyNet.dec_classify)
    logits = logits.astype(jnp.float32)
    levels = NUM_SCALES - scale_child
    dist = net.cfg.coord_recon_loss_type == 'Dist'
    if adaptive:
        km = adaptive_keep_mask_dist if dist else adaptive_keep_mask
        keep = km(cand.codes, cand.count, logits, target_num, levels)
    else:
        km = simple_keep_mask_dist if dist else simple_keep_mask
        keep = km(cand.codes, cand.count, logits, levels)
    new_codes, new_count, gather_idx = sp.mask_compact(cand.codes, keep,
                                                       cand_cap)
    new_feats = sp.gather_padded(refined, gather_idx)
    new_table = sp.compact_table(cand_table, gather_idx, new_count)
    return new_codes, new_count, new_feats, new_table
