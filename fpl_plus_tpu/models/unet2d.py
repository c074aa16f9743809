"""2D U-Net family.

The reference registry (PyMIC/pymic/net/net_dict_seg.py:33-47) exposes
UNet2D, UNet2D_DualBranch, UNet2D_URPC, UNet2D_CCT, COPLENet,
AttentionUNet2D, NestedUNet2D and UNet2D_ScSE (the ``net2d`` package is
missing from the reference snapshot; these follow the PyMIC v0.3.0 designs
the registry documents). All nets accept ``[N, H, W, C]`` or 2.5D
``[N, D, H, W, C]`` input; in the latter case depth is folded into the batch
axis (slice-wise 2D segmentation, PyMIC convention) and the prediction is
unfolded back to ``[N, D, H, W, class]``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fpl_plus_tpu.models.common import (fold_depth_to_batch, max_pool,
                                        resize_linear, unfold_depth_from_batch,
                                        upsample_align_corners)
from fpl_plus_tpu.models.dsbn import BatchNorm
from fpl_plus_tpu.models.unet3d import ChannelSpatialSELayer


class ConvBlock2D(nn.Module):
    out_channels: int
    dropout_p: float = 0.0
    scse: bool = False

    @nn.compact
    def __call__(self, x, train: bool, use_dropout: bool):
        x = nn.Conv(self.out_channels, (3, 3), padding='SAME')(x)
        x = BatchNorm(self.out_channels)(x, not train)
        x = nn.leaky_relu(x, 0.01)
        if self.dropout_p > 0:
            x = nn.Dropout(self.dropout_p, deterministic=not use_dropout)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding='SAME')(x)
        x = BatchNorm(self.out_channels)(x, not train)
        x = nn.leaky_relu(x, 0.01)
        if self.scse:
            x = ChannelSpatialSELayer()(x)
        return x


class UpBlock2D(nn.Module):
    skip_channels: int
    out_channels: int
    dropout_p: float = 0.0
    bilinear: bool = True
    scse: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool, use_dropout: bool):
        if self.bilinear:
            x1 = nn.Conv(self.skip_channels, (1, 1))(x1)
            x1 = upsample_align_corners(x1, 2)
        else:
            x1 = nn.ConvTranspose(self.skip_channels, (2, 2), strides=(2, 2),
                                  padding='VALID')(x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvBlock2D(self.out_channels, self.dropout_p,
                           self.scse)(x, train, use_dropout)


class Encoder2D(nn.Module):
    feature_chns: Sequence[int]
    dropout: Sequence[float]
    scse: bool = False

    @nn.compact
    def __call__(self, x, train: bool, use_dropout: bool):
        ft, dp = self.feature_chns, self.dropout
        feats = [ConvBlock2D(ft[0], dp[0], self.scse, name='in_conv')(
            x, train, use_dropout)]
        for i in range(1, len(ft)):
            feats.append(ConvBlock2D(ft[i], dp[i], self.scse,
                                     name='down{0}'.format(i))(
                max_pool(feats[-1]), train, use_dropout))
        return feats


class Decoder2D(nn.Module):
    feature_chns: Sequence[int]
    dropout: Sequence[float]
    class_num: int
    bilinear: bool = True
    scse: bool = False
    multiscale_heads: bool = False   # URPC-style heads on every decoder level

    @nn.compact
    def __call__(self, feats, train: bool, use_dropout: bool):
        ft, dp = self.feature_chns, self.dropout
        n = len(ft)
        d = feats[-1]
        decoder_feats = []
        for i in range(n - 1):
            lvl = n - 2 - i
            d = UpBlock2D(ft[lvl], ft[lvl], dp[lvl], self.bilinear, self.scse,
                          name='up{0}'.format(i + 1))(d, feats[lvl], train,
                                                      use_dropout)
            decoder_feats.append(d)
        output = nn.Conv(self.class_num, (3, 3), padding='SAME',
                         name='out_conv')(d)
        if not self.multiscale_heads:
            return output
        outputs = [output]
        # aux heads on the coarser decoder features (closest-to-output first)
        for j, feat in enumerate(decoder_feats[-2::-1]):
            aux = nn.Conv(self.class_num, (3, 3), padding='SAME',
                          name='out_conv{0}'.format(j + 1))(feat)
            outputs.append(aux)
        return outputs


def _fold_apply(x, fn):
    """Fold optional depth axis into batch, apply fn, unfold outputs."""
    if x.ndim == 5:
        x2d, nd = fold_depth_to_batch(x)
        out = fn(x2d)
        unfold = lambda o: unfold_depth_from_batch(o, nd)
        if isinstance(out, (list, tuple)):
            return [unfold(o) for o in out]
        return unfold(out)
    return fn(x)


class UNet2D(nn.Module):
    in_chns: int
    feature_chns: Sequence[int]
    dropout: Sequence[float]
    class_num: int
    bilinear: bool = True
    deep_supervise: bool = False
    scse: bool = False

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout: Optional[bool] = None):
        if use_dropout is None:
            use_dropout = train

        def run(x2d):
            feats = Encoder2D(self.feature_chns, self.dropout, self.scse,
                              name='encoder')(x2d, train, use_dropout)
            return Decoder2D(self.feature_chns, self.dropout, self.class_num,
                             self.bilinear, self.scse,
                             multiscale_heads=self.deep_supervise,
                             name='decoder')(feats, train, use_dropout)

        out = _fold_apply(x, run)
        if self.deep_supervise and isinstance(out, list):
            # deep supervision returns full-res aux maps
            spatial = out[0].shape[1:-1]
            out = [out[0]] + [resize_linear(o, spatial) for o in out[1:]]
        return out


class UNet2DScSE(UNet2D):
    scse: bool = True


class UNet2DDualBranch(nn.Module):
    """Shared encoder + two decoders (used by DMPLS / CPS-style methods)."""
    in_chns: int
    feature_chns: Sequence[int]
    dropout: Sequence[float]
    class_num: int
    bilinear: bool = True

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout: Optional[bool] = None):
        if use_dropout is None:
            use_dropout = train

        def run(x2d):
            feats = Encoder2D(self.feature_chns, self.dropout,
                              name='encoder')(x2d, train, use_dropout)
            out1 = Decoder2D(self.feature_chns, self.dropout, self.class_num,
                             self.bilinear, name='decoder1')(feats, train,
                                                             use_dropout)
            out2 = Decoder2D(self.feature_chns, self.dropout, self.class_num,
                             self.bilinear, name='decoder2')(feats, train,
                                                             use_dropout)
            if train:
                return [out1, out2]
            return (out1 + out2) / 2

        return _fold_apply(x, run)


class UNet2DURPC(nn.Module):
    """UNet2D with pyramid prediction heads at four scales (URPC, SSL).

    Returns [p0 (full res), p1, p2, p3] where pi has spatial scale 1/2^i —
    the multi-scale-output contract the sliding-window inferer supports.
    """
    in_chns: int
    feature_chns: Sequence[int]
    dropout: Sequence[float]
    class_num: int
    bilinear: bool = True

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout: Optional[bool] = None):
        if use_dropout is None:
            use_dropout = train

        def run(x2d):
            ft, dp = self.feature_chns, self.dropout
            feats = Encoder2D(ft, dp, name='encoder')(x2d, train, use_dropout)
            n = len(ft)
            d = feats[-1]
            outs = []
            if n - 1 < 4:
                # shallow nets: the deepest pyramid head sits on the bottleneck
                outs.append((n - 1, nn.Conv(self.class_num, (3, 3),
                                            padding='SAME',
                                            name='head{0}'.format(n - 1))(d)))
            for i in range(n - 1):
                lvl = n - 2 - i
                d = UpBlock2D(ft[lvl], ft[lvl], dp[lvl], self.bilinear,
                              name='up{0}'.format(i + 1))(d, feats[lvl],
                                                          train, use_dropout)
                if lvl <= 3:
                    head = nn.Conv(self.class_num, (3, 3), padding='SAME',
                                   name='head{0}'.format(lvl))(
                        nn.Dropout(0.1 * lvl, deterministic=not use_dropout)(d)
                        if lvl > 0 else d)
                    outs.append((lvl, head))
            outs.sort(key=lambda t: t[0])
            return [o for _, o in outs]

        return _fold_apply(x, run)


def _feature_dropout(x, rng):
    """Drop the most-attended spatial positions (CCT FeatureDrop; the
    keep-quantile is drawn uniformly in [0.7, 0.9] like the CCT code)."""
    attention = jnp.mean(jnp.abs(x), axis=-1, keepdims=True)
    flat = attention.reshape(x.shape[0], -1)
    q = jax.random.uniform(rng, (), minval=0.7, maxval=0.9)
    thresh = jnp.quantile(flat, q, axis=1)
    thresh = thresh.reshape((-1,) + (1,) * (x.ndim - 1))
    return x * (attention < thresh)


def _feature_noise(x, rng, uniform_range=0.3):
    noise = jax.random.uniform(rng, x.shape, x.dtype,
                               -uniform_range, uniform_range)
    return x * (1.0 + noise)


class UNet2DCCT(nn.Module):
    """UNet2D with one main and three perturbed auxiliary decoders (CCT, SSL).

    Aux decoders see feature-level perturbations of the bottleneck:
    dropout / feature-drop / feature-noise.
    """
    in_chns: int
    feature_chns: Sequence[int]
    dropout: Sequence[float]
    class_num: int
    bilinear: bool = True

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout: Optional[bool] = None):
        if use_dropout is None:
            use_dropout = train

        def run(x2d):
            feats = Encoder2D(self.feature_chns, self.dropout,
                              name='encoder')(x2d, train, use_dropout)
            main = Decoder2D(self.feature_chns, self.dropout, self.class_num,
                             self.bilinear, name='main_decoder')(
                feats, train, use_dropout)
            if not train:
                return main
            rng = self.make_rng('dropout')
            r1, r2 = jax.random.split(rng)
            bott = feats[-1]
            aux_feats = [
                feats[:-1] + [nn.Dropout(0.5, deterministic=False)(bott)],
                feats[:-1] + [_feature_dropout(bott, r1)],
                feats[:-1] + [_feature_noise(bott, r2)],
            ]
            outs = [main]
            for i, af in enumerate(aux_feats):
                outs.append(Decoder2D(self.feature_chns, self.dropout,
                                      self.class_num, self.bilinear,
                                      name='aux_decoder{0}'.format(i + 1))(
                    af, train, use_dropout))
            return outs

        return _fold_apply(x, run)


class AttentionGate(nn.Module):
    inter_channels: int

    @nn.compact
    def __call__(self, gate, skip):
        g = nn.Conv(self.inter_channels, (1, 1))(gate)
        s = nn.Conv(self.inter_channels, (1, 1))(skip)
        att = nn.relu(g + s)
        att = nn.sigmoid(nn.Conv(1, (1, 1))(att))
        return skip * att


class AttentionUNet2D(nn.Module):
    """UNet2D with attention gates on the skip connections."""
    in_chns: int
    feature_chns: Sequence[int]
    dropout: Sequence[float]
    class_num: int
    bilinear: bool = True

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout: Optional[bool] = None):
        if use_dropout is None:
            use_dropout = train

        def run(x2d):
            ft, dp = self.feature_chns, self.dropout
            feats = Encoder2D(ft, dp, name='encoder')(x2d, train, use_dropout)
            n = len(ft)
            d = feats[-1]
            for i in range(n - 1):
                lvl = n - 2 - i
                if self.bilinear:
                    up = nn.Conv(ft[lvl], (1, 1),
                                 name='proj{0}'.format(i + 1))(d)
                    up = upsample_align_corners(up, 2)
                else:
                    up = nn.ConvTranspose(ft[lvl], (2, 2), strides=(2, 2),
                                          padding='VALID',
                                          name='upconv{0}'.format(i + 1))(d)
                skip = AttentionGate(max(ft[lvl] // 2, 1),
                                     name='att{0}'.format(i + 1))(up, feats[lvl])
                d = ConvBlock2D(ft[lvl], dp[lvl],
                                name='dec{0}'.format(i + 1))(
                    jnp.concatenate([skip, up], axis=-1), train, use_dropout)
            return nn.Conv(self.class_num, (3, 3), padding='SAME',
                           name='out_conv')(d)

        return _fold_apply(x, run)


class NestedUNet2D(nn.Module):
    """UNet++ (nested dense skip pathways)."""
    in_chns: int
    feature_chns: Sequence[int]
    dropout: Sequence[float]
    class_num: int
    bilinear: bool = True

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout: Optional[bool] = None):
        if use_dropout is None:
            use_dropout = train

        def run(x2d):
            ft, dp = self.feature_chns, self.dropout
            depth = len(ft)
            # grid[i][j]: node at level i, column j
            grid = {}
            for i in range(depth):
                inp = x2d if i == 0 else max_pool(grid[(i - 1, 0)])
                grid[(i, 0)] = ConvBlock2D(ft[i], dp[i],
                                           name='x{0}0'.format(i))(
                    inp, train, use_dropout)
            for j in range(1, depth):
                for i in range(depth - j):
                    up = upsample_align_corners(
                        nn.Conv(ft[i], (1, 1),
                                name='proj{0}{1}'.format(i, j))(grid[(i + 1, j - 1)]), 2)
                    cat = jnp.concatenate(
                        [grid[(i, k)] for k in range(j)] + [up], axis=-1)
                    grid[(i, j)] = ConvBlock2D(ft[i], dp[i],
                                               name='x{0}{1}'.format(i, j))(
                        cat, train, use_dropout)
            return nn.Conv(self.class_num, (3, 3), padding='SAME',
                           name='out_conv')(grid[(0, depth - 1)])

        return _fold_apply(x, run)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling bottleneck (COPLENet)."""
    out_channels: int
    dilations: Sequence[int] = (1, 2, 3, 4)

    @nn.compact
    def __call__(self, x):
        branches = []
        c = self.out_channels // len(self.dilations)
        for d in self.dilations:
            branches.append(nn.Conv(c, (3, 3), kernel_dilation=(d, d),
                                    padding='SAME')(x))
        y = jnp.concatenate(branches, axis=-1)
        return nn.Conv(self.out_channels, (1, 1))(y)


class COPLENet(nn.Module):
    """COPLE-Net (Wang et al., IEEE TMI 2020): UNet2D with bridge 1x1 convs
    on skips, an ASPP bottleneck, and max-out skip aggregation."""
    in_chns: int
    feature_chns: Sequence[int]
    dropout: Sequence[float]
    class_num: int
    bilinear: bool = True

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout: Optional[bool] = None):
        if use_dropout is None:
            use_dropout = train

        def run(x2d):
            ft, dp = self.feature_chns, self.dropout
            n = len(ft)
            feats = []
            h = x2d
            for i in range(n):
                if i > 0:
                    h = max_pool(h)
                h = ConvBlock2D(ft[i], dp[i], scse=True,
                                name='enc{0}'.format(i))(h, train, use_dropout)
                feats.append(h)
            h = ASPP(ft[-1], name='aspp')(feats[-1])
            for i in range(n - 1):
                lvl = n - 2 - i
                # bridge: 1x1 conv on skip, then max-out fusion
                skip = nn.Conv(ft[lvl], (1, 1),
                               name='bridge{0}'.format(lvl))(feats[lvl])
                if self.bilinear:
                    h = nn.Conv(ft[lvl], (1, 1), name='proj{0}'.format(lvl))(h)
                    h = upsample_align_corners(h, 2)
                else:
                    h = nn.ConvTranspose(ft[lvl], (2, 2), strides=(2, 2),
                                         padding='VALID',
                                         name='upconv{0}'.format(lvl))(h)
                h = jnp.maximum(skip, h)
                h = ConvBlock2D(ft[lvl], dp[lvl], scse=True,
                                name='dec{0}'.format(lvl))(h, train, use_dropout)
            return nn.Conv(self.class_num, (3, 3), padding='SAME',
                           name='out_conv')(h)

        return _fold_apply(x, run)
