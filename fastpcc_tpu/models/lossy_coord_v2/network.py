"""Networks for lossy_coord_v2 (reference:
models/convolutional/lossy_coord_v2/layers.py:28-415), on the Morton-code
sparse grid: stride-2 convs are octant-dense GEMMs, transpose convs scatter
per-octant outputs through (parent, octant) maps, 1x1 convs are Dense."""
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.blocks import SparseConv3x3, StridedOctantConv, OctantTransposeConv, PReLU


def _act(x, name: Optional[str]):
    if name is None or name == '':
        return x
    if name == 'relu':
        return jax.nn.relu(x)
    raise NotImplementedError(name)


class ActM(nn.Module):
    """Configurable activation as a module (PReLU needs params)."""
    kind: Optional[str]

    @nn.compact
    def __call__(self, x):
        if self.kind == 'prelu':
            return PReLU()(x)
        return _act(x, self.kind)


@jax.custom_vjp
def bound_value(x, bound):
    return jnp.clip(x, -bound, bound)


def _bound_fwd(x, bound):
    return jnp.clip(x, -bound, bound), (x, bound)


def _bound_bwd(res, g):
    # reference BoundFunction: outside the bound the gradient is the constant
    # +-1 pushing back inside (reference: lossy_coord_v2/layers.py:14-25)
    x, bound = res
    g = jnp.where(x > bound, jnp.ones_like(g),
                  jnp.where(x < -bound, -jnp.ones_like(g), g))
    return g, None


bound_value.defvjp(_bound_fwd, _bound_bwd)


class ConvA(nn.Module):
    """3^3 conv + configurable act."""
    features: int
    act: Optional[str] = 'prelu'

    @nn.compact
    def __call__(self, feats, table):
        return ActM(self.act)(SparseConv3x3(self.features)(feats, table))


class DownA(nn.Module):
    """Kernel-2 stride-2 conv (+act) on octant-dense input [M, 8, Cin]."""
    features: int
    act: Optional[str] = 'prelu'

    @nn.compact
    def __call__(self, dense):
        return ActM(self.act)(StridedOctantConv(self.features, 1)(dense))


class MLPA(nn.Module):
    features: int
    act: Optional[str] = 'prelu'

    @nn.compact
    def __call__(self, x):
        return ActM(self.act)(nn.Dense(self.features,
                                       param_dtype=jnp.float32)(x))


class V2EncStage(nn.Module):
    """Normal-part downsample stage: stride-2 conv + 3^3 conv
    (reference: layers.py:44-56)."""
    features: int
    act: str

    @nn.compact
    def __call__(self, dense, parent_table):
        x = DownA(self.features, self.act)(dense)
        return ConvA(self.features, self.act)(x, parent_table)


class V2DecStage(nn.Module):
    """Normal-part upsample stage + classifier (reference: layers.py:84-110).
    last=True prepends a 3^3 conv and skips the post-upsample conv."""
    features: int
    act: str
    last: bool

    def setup(self):
        self.pre = ConvA(self.features, self.act) if self.last else None
        self.up = OctantTransposeConv(self.features)
        self.up_act = ActM(self.act)
        self.post = None if self.last else ConvA(self.features, self.act)
        self.cls1 = MLPA(max(self.features // 2, 1), self.act)
        self.cls2 = nn.Dense(1, param_dtype=jnp.float32)

    def child_dense(self, feats, table):
        """parent feats -> [M, 8, C] candidate-child features."""
        x = self.pre(feats, table) if self.pre is not None else feats
        return self.up_act(self.up(x))

    def refine(self, cand_feats, cand_table):
        x = cand_feats
        if self.post is not None:
            x = self.post(x, cand_table)
        logits = self.cls2(self.cls1(x).astype(jnp.float32))[:, 0]
        return x, logits


class GeoEncStep(nn.Module):
    """One geo-lossless encoder step (reference: layers.py:358-415
    make_block): conv (stride-2 if sampling) + 3^3 conv, plus an out MLP when
    this scale's feature is coded."""
    in_ch: int
    out_ch: int
    down: bool
    has_out: bool
    act: str

    def setup(self):
        self.conv1d = DownA(self.in_ch, self.act) if self.down else None
        self.conv1s = None if self.down else ConvA(self.in_ch, self.act)
        self.intra = max(self.in_ch, self.out_ch)
        self.conv2 = ConvA(self.intra, self.act)
        self.out_mlp = MLPA(self.out_ch, self.act) if self.has_out else None

    def step(self, x_or_dense, table):
        """x_or_dense: [M, 8, Cin] when down else [N, Cin]."""
        x = self.conv1d(x_or_dense) if self.down \
            else self.conv1s(x_or_dense, table)
        x = self.conv2(x, table)
        out = self.out_mlp(x) if self.out_mlp is not None else None
        return x, out


class HyperDecFeaV2(nn.Module):
    """Per-step fea predictor: transpose-conv 2x (if sampled) or 3^3 conv,
    then a 3^3 conv (reference: layers.py:202-228)."""
    in_ch: int
    out_ch: int
    up: bool
    act: str

    def setup(self):
        if self.up:
            self.up_conv = OctantTransposeConv(self.out_ch)
            self.up_act = ActM(self.act)
        else:
            self.same_conv = ConvA(self.out_ch, self.act)
        self.post = ConvA(self.out_ch, self.act)

    def up_dense(self, lower):
        """[M, Cin] -> [M, 8, out] (up variant only)."""
        m = lower.shape[0]
        return self.up_act(self.up_conv(lower)).reshape(m, 8, self.out_ch)

    def same(self, lower, table):
        return self.same_conv(lower, table)

    def refine(self, feats, table):
        return self.post(feats, table)


class HyperDecCoordV2(nn.Module):
    """Occupancy-logit generator at all 8 children (reference:
    layers.py:231-248)."""
    in_ch: int
    act: str

    def setup(self):
        mid = max(self.in_ch // 4, 1)
        self.up = OctantTransposeConv(mid)
        self.up_act = ActM(self.act)
        self.head = SparseConv3x3(1)
        self.mid = mid

    def up_dense(self, lower):
        m = lower.shape[0]
        return self.up_act(self.up(lower)).reshape(m, 8, self.mid)

    def refine(self, cand_feats, cand_table):
        return self.head(cand_feats, cand_table).astype(jnp.float32)[:, 0]


class SubResidualV2(nn.Module):
    """cat(fea, pred) -> convs -> bounded residual (reference:
    layers.py:253-271)."""
    in_ch: int
    out_ch: int
    bound: int
    act: str

    @nn.compact
    def __call__(self, fea, pred, table):
        x = jnp.concatenate([fea, pred], axis=-1)
        x = ConvA(self.in_ch, self.act)(x, table)
        x = SparseConv3x3(self.out_ch)(x, table).astype(jnp.float32)
        return bound_value(x, jnp.float32(self.bound))


class SubDecoderV2(nn.Module):
    """res (+ pred) -> fea (reference: layers.py:294-332). with_res=False is
    the skip_encoding_fea variant running on pred alone."""
    res_ch: int
    pred_ch: int
    out_ch: int
    with_res: bool
    act: str

    def setup(self):
        if self.with_res:
            self.rd1 = MLPA(max(self.out_ch // 2, 1), self.act)
            self.rd2 = MLPA(self.out_ch, self.act)
        self.d1 = MLPA(self.out_ch, self.act)
        self.d2 = MLPA(self.out_ch, self.act)

    def __call__(self, res, pred):
        if self.with_res:
            x = self.rd2(self.rd1(res))
            x = jnp.concatenate([x, pred], axis=-1)
        else:
            x = pred
        return self.d2(self.d1(x))
