"""Networks for lossy_coord_v3 (reference:
models/convolutional/lossy_coord_v3/model.py:43-753)."""
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import PReLU, SparseConv3x3, StridedOctantConv
from ...entropy_models.batched import ContinuousBatchedEntropyModel
from ..lossy_coord_v2.network import bound_value


class V3Block(nn.Module):
    """conv3 -> PReLU -> conv3 -> +res -> PReLU (reference: model.py:692-710)."""
    channels: int

    @nn.compact
    def __call__(self, feats, table):
        x = SparseConv3x3(self.channels)(feats, table)
        x = PReLU()(x)
        x = SparseConv3x3(self.channels)(x, table)
        return PReLU()(x + feats)


class V3EncStage(nn.Module):
    """Encoder feature stage (reference: model.py:336-350): idx 1 maps the
    8-bit bins to channels then downsamples; idx >= 2 downsamples features."""
    channels: int
    first: bool            # True for the bins->channels stage

    def setup(self):
        if self.first:
            self.pre = SparseConv3x3(self.channels)
            self.pre_act = PReLU()
        self.down = StridedOctantConv(self.channels, 1)
        self.blk = V3Block(self.channels)

    def pre_conv(self, feats, table):
        if not self.first:
            return feats
        return self.pre_act(self.pre(feats, table))

    def post_down(self, dense, parent_table):
        x = self.down(dense)
        return self.blk(x, parent_table)


class LatentTransform(nn.Module):
    """One latent analysis/synthesis pair (reference: model.py:54-67)."""
    channels: int
    compressed_channels: int
    em_tail: int

    def setup(self):
        ch, cc = self.channels, self.compressed_channels
        self.t0 = nn.Dense(ch, param_dtype=jnp.float32)
        self.t0_act = PReLU()
        self.t1a = nn.Dense(ch, param_dtype=jnp.float32)
        self.t1a_act = PReLU()
        self.t1b = SparseConv3x3(ch)
        self.t1b_act = PReLU()
        self.t1c = SparseConv3x3(cc)
        self.t2 = nn.Dense(ch, param_dtype=jnp.float32)
        self.t2_act = PReLU()
        self.deca = nn.Dense(ch, param_dtype=jnp.float32)
        self.deca_act = PReLU()
        self.decb = V3Block(ch)
        self.em = ContinuousBatchedEntropyModel(cc, tail_range=self.em_tail)

    def analysis(self, cur_ref, cur_rec, table, bound):
        """-> bounded latent [N, cc] (float; caller rounds/noises)."""
        x = self.t0_act(self.t0(cur_ref))
        x = jnp.concatenate([x, cur_rec], axis=-1)
        x = self.t1a_act(self.t1a(x))
        x = self.t1b_act(self.t1b(x, table))
        y = self.t1c(x, table).astype(jnp.float32)
        return bound_value(y, jnp.float32(bound))

    def synthesis(self, latent, cur_rec, table):
        """latent [N, cc] -> refreshed cur_rec [N, ch]."""
        z = self.t2_act(self.t2(latent.astype(cur_rec.dtype)))
        x = jnp.concatenate([cur_rec, z], axis=-1)
        x = self.deca_act(self.deca(x))
        return self.decb(x, table)

    def train_bits(self, y, rng, mask):
        y_tilde = self.em.perturb(y, rng)
        return y_tilde, self.em.bits(y_tilde, mask)


class V3OneScalePredictor(nn.Module):
    """Per-scale predictor (reference: model.py:43-251)."""
    channels: int
    num_latents: int
    if_pred_oct_lossl: bool
    if_upsample: bool
    allow_single_ch: bool
    compressed_channels: int = 1
    em_tail: int = 32

    def setup(self):
        ch = self.channels
        if self.allow_single_ch:
            self.dec_init = SparseConv3x3(ch)
        self.dec = V3Block(ch)
        self.latents = [LatentTransform(ch, self.compressed_channels,
                                        self.em_tail)
                        for _ in range(self.num_latents)]
        self.pred_conv = SparseConv3x3(ch)
        self.pred_act = PReLU()
        if self.if_pred_oct_lossl:
            self.pred_out = nn.Dense(255, param_dtype=jnp.float32)
        else:
            self.pred_out = SparseConv3x3(8)
        if self.if_upsample:
            self.up_in = nn.Dense(ch, param_dtype=jnp.float32)
            self.up_act = PReLU()
            self.up_blk = V3Block(ch)
            self.up_out = nn.Dense(ch * 8, param_dtype=jnp.float32)

    def features(self, feats, table):
        """dec_init (1ch) + dec block."""
        if feats.shape[-1] == 1:
            feats = self.dec_init(feats, table)
        return self.dec(feats, table)

    def latent_analysis(self, i: int, cur_ref, cur_rec, table, bound):
        return self.latents[i].analysis(cur_ref, cur_rec, table, bound)

    def latent_synthesis(self, i: int, latent, cur_rec, table):
        return self.latents[i].synthesis(latent, cur_rec, table)

    def latent_train_bits(self, i: int, y, rng, mask):
        return self.latents[i].train_bits(y, rng, mask)

    def predict(self, cur_rec, table):
        """-> logits: [N, 255] (lossless) or [N, 8] (lossy occupancy)."""
        x = self.pred_act(self.pred_conv(cur_rec, table))
        if self.if_pred_oct_lossl:
            return self.pred_out(x.astype(jnp.float32))
        return self.pred_out(x, table).astype(jnp.float32)

    def upsample(self, cur_rec, bins, p_of_c, oct_of_c):
        """-> child feats gathered onto kept children."""
        x = jnp.concatenate([cur_rec, bins.astype(cur_rec.dtype)], axis=-1)
        x = self.up_act(self.up_in(x))
        # NOTE: reference applies a 3^3 Block here too; the block needs the
        # parent table — passed via functools closure at the call site.
        return x

    def upsample_tail(self, x, table, p_of_c, oct_of_c):
        x = self.up_blk(x, table)
        x = self.up_out(x)
        n, ch8 = x.shape
        flat = x.reshape(n * 8, ch8 // 8)
        flat = jnp.concatenate([flat, jnp.zeros_like(flat[:1])], axis=0)
        return flat[jnp.minimum(p_of_c * 8 + oct_of_c, n * 8)]
