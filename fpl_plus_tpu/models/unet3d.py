"""3D U-Net (+ ScSE variant).

Architecture parity: reference PyMIC/pymic/net/net3d/unet3d.py:9-160 and
unet3d_scse.py — conv blocks are (Conv3d -> BN -> LeakyReLU) x2 with dropout
between, 4 or 5 resolution levels, trilinear (align-corners) or deconv
upsampling, optional deep supervision (3 aux heads resized to full
resolution). The ScSE variant appends a concurrent spatial+channel
squeeze-excitation layer to every conv block
(reference scse3d.py:17-116).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from fpl_plus_tpu.models.common import (max_pool, resize_linear,
                                        upsample_align_corners)
from fpl_plus_tpu.models.dsbn import BatchNorm


class ChannelSELayer(nn.Module):
    """Squeeze-and-Excitation over channels (any spatial rank)."""
    reduction_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        squeeze = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        h = nn.relu(nn.Dense(c // self.reduction_ratio)(squeeze))
        h = nn.sigmoid(nn.Dense(c)(h))
        return x * h.reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (c,))


class SpatialSELayer(nn.Module):
    """Spatial squeeze-excitation: 1x1 conv -> sigmoid gate."""
    @nn.compact
    def __call__(self, x):
        gate = nn.sigmoid(nn.Conv(1, (1,) * (x.ndim - 2))(x))
        return x * gate


class ChannelSpatialSELayer(nn.Module):
    reduction_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        return jnp.maximum(ChannelSELayer(self.reduction_ratio)(x),
                           SpatialSELayer()(x))


class ConvBlock3D(nn.Module):
    out_channels: int
    dropout_p: float = 0.0
    scse: bool = False

    @nn.compact
    def __call__(self, x, train: bool, use_dropout: bool):
        x = nn.Conv(self.out_channels, (3, 3, 3), padding='SAME')(x)
        x = BatchNorm(self.out_channels)(x, not train)
        x = nn.leaky_relu(x, 0.01)
        if self.dropout_p > 0:
            x = nn.Dropout(self.dropout_p, deterministic=not use_dropout)(x)
        x = nn.Conv(self.out_channels, (3, 3, 3), padding='SAME')(x)
        x = BatchNorm(self.out_channels)(x, not train)
        x = nn.leaky_relu(x, 0.01)
        if self.scse:
            x = ChannelSpatialSELayer()(x)
        return x


class UpBlock3D(nn.Module):
    skip_channels: int
    out_channels: int
    dropout_p: float = 0.0
    trilinear: bool = True
    scse: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool, use_dropout: bool):
        if self.trilinear:
            x1 = nn.Conv(self.skip_channels, (1, 1, 1))(x1)
            x1 = upsample_align_corners(x1, 2)
        else:
            x1 = nn.ConvTranspose(self.skip_channels, (2, 2, 2),
                                  strides=(2, 2, 2), padding='VALID')(x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvBlock3D(self.out_channels, self.dropout_p,
                           self.scse)(x, train, use_dropout)


class UNet3D(nn.Module):
    in_chns: int
    feature_chns: Sequence[int]
    dropout: Sequence[float]
    class_num: int
    trilinear: bool = True
    deep_supervise: bool = False
    scse: bool = False

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout: Optional[bool] = None):
        if use_dropout is None:
            use_dropout = train
        ft, dp = self.feature_chns, self.dropout
        assert len(ft) in (4, 5)
        args = (train, use_dropout)
        x0 = ConvBlock3D(ft[0], dp[0], self.scse, name='in_conv')(x, *args)
        x1 = ConvBlock3D(ft[1], dp[1], self.scse, name='down1')(max_pool(x0), *args)
        x2 = ConvBlock3D(ft[2], dp[2], self.scse, name='down2')(max_pool(x1), *args)
        x3 = ConvBlock3D(ft[3], dp[3], self.scse, name='down3')(max_pool(x2), *args)
        if len(ft) == 5:
            x4 = ConvBlock3D(ft[4], dp[4], self.scse, name='down4')(max_pool(x3), *args)
            d3 = UpBlock3D(ft[3], ft[3], dp[3], self.trilinear, self.scse,
                           name='up1')(x4, x3, *args)
        else:
            d3 = x3
        d2 = UpBlock3D(ft[2], ft[2], dp[2], self.trilinear, self.scse,
                       name='up2')(d3, x2, *args)
        d1 = UpBlock3D(ft[1], ft[1], dp[1], self.trilinear, self.scse,
                       name='up3')(d2, x1, *args)
        d0 = UpBlock3D(ft[0], ft[0], dp[0], self.trilinear, self.scse,
                       name='up4')(d1, x0, *args)
        output = nn.Conv(self.class_num, (1, 1, 1), name='out_conv')(d0)
        if self.deep_supervise:
            spatial = output.shape[1:-1]
            o1 = resize_linear(nn.Conv(self.class_num, (1, 1, 1),
                                       name='out_conv1')(d1), spatial)
            o2 = resize_linear(nn.Conv(self.class_num, (1, 1, 1),
                                       name='out_conv2')(d2), spatial)
            o3 = resize_linear(nn.Conv(self.class_num, (1, 1, 1),
                                       name='out_conv3')(d3), spatial)
            return [output, o1, o2, o3]
        return output


class UNet3DScSE(UNet3D):
    """UNet3D with concurrent spatial+channel squeeze-excitation blocks."""
    scse: bool = True
