"""UNet2D5 with Domain-Specific Batch Norm — the FPL+ flagship network.

Architecture parity with the reference net
(PyMIC/pymic/net/net3d/unet2d5_dsbn.py:48-309): a 2.5D U-Net with 5
resolution levels whose per-level conv dimension is configurable
(``conv_dims``, e.g. [2,2,3,3,3]); 2D levels run slice-wise by folding depth
into the batch axis and downsample only H/W (MaxPool2d), 3D levels
downsample D/H/W; every conv is followed by DSBN + PReLU (+ dropout between
the two convs of a block); decoder upsampling is 1x1-conv + align-corners
linear upsample (``bilinear=True``) or transposed conv; the head is a
Conv3d with kernel (1,3,3).

TPU-first notes: channels-last layout makes the 2.5D depth-fold a pure
reshape (no transpose); DSBN selects domain banks on-device (models/dsbn.py);
all control flow is static so the whole network jit-compiles to one XLA
program. Unlike the reference, a block only instantiates the conv/norm
parameters for its own dimensionality (the reference allocates unused 2D+3D
copies in every block).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from fpl_plus_tpu.models.common import (DepthSliceConv,
                                        DepthSliceConvTranspose, PReLU,
                                        fold_depth_to_batch, max_pool,
                                        unfold_depth_from_batch,
                                        upsample_align_corners)
from fpl_plus_tpu.models.dsbn import DomainBatchNorm, InstanceNorm


class ConvBlockND(nn.Module):
    """Two (conv -> DSBN -> PReLU) stages with dropout between them.

    ``fused_eval`` routes the eval-mode DSBN+PReLU pair through the Pallas
    fusion (ops/pallas_fused.py) — identical numerics and parameter layout,
    one VMEM pass instead of two elementwise ops."""
    out_channels: int
    num_domains: int
    dim: int
    dropout_p: float = 0.0
    fused_eval: bool = False

    def _norm_act(self, x, domain, train, bn_name, act_name):
        bn = DomainBatchNorm(self.out_channels, self.num_domains,
                             name=bn_name)
        act = PReLU(name=act_name)
        if self.fused_eval and not train:
            alpha = act(x, return_param=True)
            return bn(x, domain, True, prelu_alpha=alpha)
        return act(bn(x, domain, not train))

    @nn.compact
    def __call__(self, x, domain, train: bool, use_dropout: bool):
        if self.dim == 2 and x.ndim == 5:
            # flat-2.5D: slice-wise 2D convs on the rank-5 tensor (depth-1
            # kernels, parameter-identical to the folded nn.Conv layout)
            def conv(name):
                return DepthSliceConv(self.out_channels, (3, 3), name=name)
        else:
            def conv(name):
                return nn.Conv(self.out_channels, (3,) * self.dim,
                               padding='SAME', name=name)
        x = conv('conv1')(x)
        x = self._norm_act(x, domain, train, 'bn1', 'act1')
        if self.dropout_p > 0:
            x = nn.Dropout(self.dropout_p, deterministic=not use_dropout,
                           name='drop')(x)
        x = conv('conv2')(x)
        x = self._norm_act(x, domain, train, 'bn2', 'act2')
        return x


class DownBlock(nn.Module):
    out_channels: int
    num_domains: int
    dim: int
    dropout_p: float = 0.0
    downsample: bool = True
    fused_eval: bool = False
    flat25d: bool = False

    @nn.compact
    def __call__(self, x, domain, train: bool, use_dropout: bool):
        fold = self.dim == 2 and x.ndim == 5 and not self.flat25d
        if fold:
            x, nd = fold_depth_to_batch(x)
        out = ConvBlockND(self.out_channels, self.num_domains, self.dim,
                          self.dropout_p, self.fused_eval,
                          name='conv')(x, domain, train, use_dropout)
        if not self.downsample:
            out_d = None
        elif self.dim == 2 and out.ndim == 5:
            # flat-2.5D: pool H/W only on the rank-5 tensor
            out_d = nn.max_pool(out, window_shape=(1, 2, 2),
                                strides=(1, 2, 2))
        else:
            out_d = max_pool(out, 2)
        if fold:
            out = unfold_depth_from_batch(out, nd)
            if out_d is not None:
                out_d = unfold_depth_from_batch(out_d, nd)
        return out, out_d


class UpBlock(nn.Module):
    skip_channels: int      # channel count of the high-res skip feature
    out_channels: int
    num_domains: int
    dim: int
    dropout_p: float = 0.0
    bilinear: bool = True
    fused_eval: bool = False
    flat25d: bool = False

    @nn.compact
    def __call__(self, x1, x2, domain, train: bool, use_dropout: bool):
        # x1: low-res decoder feature; x2: high-res encoder skip
        flat = self.dim == 2 and x1.ndim == 5 and self.flat25d
        fold = self.dim == 2 and x1.ndim == 5 and not self.flat25d
        if fold:
            x1, nd1 = fold_depth_to_batch(x1)
            x2, nd2 = fold_depth_to_batch(x2)
        if self.bilinear:
            if flat:
                x1 = DepthSliceConv(self.skip_channels, (1, 1),
                                    name='proj')(x1)
                x1 = upsample_align_corners(x1, 2, axes=(2, 3))
            else:
                x1 = nn.Conv(self.skip_channels, (1,) * self.dim,
                             name='proj')(x1)
                x1 = upsample_align_corners(x1, 2)
        elif flat:
            x1 = DepthSliceConvTranspose(self.skip_channels, (2, 2), (2, 2),
                                         name='up')(x1)
        else:
            x1 = nn.ConvTranspose(self.skip_channels, (2,) * self.dim,
                                  strides=(2,) * self.dim, padding='VALID',
                                  name='up')(x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        out = ConvBlockND(self.out_channels, self.num_domains, self.dim,
                          self.dropout_p, self.fused_eval,
                          name='conv')(x, domain, train, use_dropout)
        if fold:
            out = unfold_depth_from_batch(out, nd1)
        return out


class UNet2D5DSBN(nn.Module):
    """forward(x [N,D,H,W,C], domain scalar) -> logits [N,D,H,W,class_num]."""
    in_chns: int
    feature_chns: Sequence[int]
    conv_dims: Sequence[int]
    dropout: Sequence[float]
    class_num: int
    bilinear: bool = False
    num_domains: int = 2
    # [network] pallas_fused: route eval DSBN+PReLU through the Pallas
    # kernel (numerics and checkpoints identical; perf-only switch)
    fused_eval: bool = False
    # [network] flat25d: 2D levels run slice-wise via depth-1 3D kernels
    # on the rank-5 tensor instead of folding depth into batch — same
    # math, same parameter tree. MEASURED SLOWER on v5e (0.156 vs 0.109
    # s/step train, 3.15 vs 3.71 vol/s serving, BASELINE.md round 4):
    # XLA's kernel-depth-1 3D conv lowering loses more than the
    # fold/unfold layout copies (~16% of the step) cost. Kept as a
    # documented lever with a parity test; default stays folded.
    flat25d: bool = False

    @nn.compact
    def __call__(self, x, domain_label=0, train: bool = False,
                 use_dropout: Optional[bool] = None):
        if use_dropout is None:
            use_dropout = train
        ft = self.feature_chns
        dims = self.conv_dims
        dp = self.dropout
        assert len(ft) == 5
        args = (domain_label, train, use_dropout)
        nd = self.num_domains
        fe = self.fused_eval
        fl = self.flat25d

        x0, x0_d = DownBlock(ft[0], nd, dims[0], dp[0], True, fe, fl, name='block0')(x, *args)
        x1, x1_d = DownBlock(ft[1], nd, dims[1], dp[1], True, fe, fl, name='block1')(x0_d, *args)
        x2, x2_d = DownBlock(ft[2], nd, dims[2], dp[2], True, fe, fl, name='block2')(x1_d, *args)
        x3, x3_d = DownBlock(ft[3], nd, dims[3], dp[3], True, fe, fl, name='block3')(x2_d, *args)
        x4, _ = DownBlock(ft[4], nd, dims[4], dp[4], False, fe, fl, name='block4')(x3_d, *args)

        y = UpBlock(ft[3], ft[3], nd, dims[3], dp[3], self.bilinear, fe, fl, name='up1')(x4, x3, *args)
        y = UpBlock(ft[2], ft[2], nd, dims[2], dp[2], self.bilinear, fe, fl, name='up2')(y, x2, *args)
        y = UpBlock(ft[1], ft[1], nd, dims[1], dp[1], self.bilinear, fe, fl, name='up3')(y, x1, *args)
        y = UpBlock(ft[0], ft[0], nd, dims[0], dp[0], self.bilinear, fe, fl, name='up4')(y, x0, *args)

        logits = nn.Conv(self.class_num, (1, 3, 3), padding='SAME',
                         name='out_conv')(y)
        return logits


class UNet2D5(UNet2D5DSBN):
    """Plain-BN UNet2D5 (reference net3d/unet2d5.py) = DSBN with one bank."""
    num_domains: int = 1

    @nn.compact
    def __call__(self, x, domain_label=0, train: bool = False,
                 use_dropout: Optional[bool] = None):
        return super().__call__(x, 0, train, use_dropout)


class Dis(nn.Module):
    """LSGAN-style 3D patch discriminator on softmax maps
    (reference unet2d5_dsbn.py:190-215). Input [N,D,H,W,C]."""
    @nn.compact
    def __call__(self, x):
        pad1 = ((1, 1),) * 3
        x = nn.Conv(64, (4, 4, 4), strides=2, padding=pad1)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(128, (4, 4, 4), strides=2, padding=pad1)(x)
        x = InstanceNorm()(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(256, (4, 4, 4), strides=2, padding=pad1)(x)
        x = InstanceNorm()(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(512, (4, 4, 4), padding=pad1)(x)
        x = InstanceNorm()(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4, 4), padding=pad1)(x)
        return x


class AEs(nn.Module):
    """1x1-conv autoencoder stack (reference unet2d5_dsbn.py:216-236)."""
    out_channels: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (1, 1, 1))(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(128, (1, 1, 1))(x)
        x = InstanceNorm()(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(64, (1, 1, 1))(x)
        x = InstanceNorm()(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.out_channels, (1, 1, 1))(x)
        return x
