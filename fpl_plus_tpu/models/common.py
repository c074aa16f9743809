"""Shared model building blocks (channels-last, jit-friendly).

All models in this package take channels-LAST tensors: ``[N, D, H, W, C]``
for 3D, ``[N, H, W, C]`` for 2D. The engine transposes once at the device
boundary from the host-side ``[C, D, H, W]`` sample layout. Channels-last is
the layout XLA:TPU tiles best (lane dimension = channels).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope (torch nn.PReLU default).

    ``return_param=True`` registers and returns the slope without applying
    it — used by the fused DSBN+PReLU eval path (models/dsbn.py), which
    consumes the alpha inside the Pallas kernel while keeping this module
    the parameter's owner (checkpoint layout is identical either way)."""
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x, return_param: bool = False):
        alpha = self.param('alpha', lambda k: jnp.asarray(self.init_value,
                                                          jnp.float32))
        if return_param:
            return alpha
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def max_pool(x, window: int = 2):
    """Max pooling with equal window/stride over all spatial dims."""
    spatial = x.ndim - 2
    win = (window,) * spatial
    return nn.max_pool(x, window_shape=win, strides=win)


def upsample_align_corners(x, factor: int = 2):
    """Linear (bi/tri) upsampling with ``align_corners=True`` semantics.

    torch's ``nn.Upsample(mode='bilinear/trilinear', align_corners=True)``
    samples source coordinates ``i * (n_in - 1) / (n_out - 1)``; jax.image
    only offers half-pixel-center sampling, so interpolation is done here
    axis-by-axis with gathers + lerp (cheap; it's all VPU work).
    """
    spatial_axes = range(1, x.ndim - 1)
    for axis in spatial_axes:
        n_in = x.shape[axis]
        n_out = n_in * factor
        if n_in == 1:
            x = jnp.repeat(x, factor, axis=axis)
            continue
        src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (src - lo.astype(jnp.float32)).astype(x.dtype)
        shape = [1] * x.ndim
        shape[axis] = n_out
        w = w.reshape(shape)
        x = (jnp.take(x, lo, axis=axis) * (1 - w)
             + jnp.take(x, hi, axis=axis) * w)
    return x


def resize_linear(x, out_spatial: Sequence[int]):
    """Half-pixel linear resize of [N, *spatial, C] to given spatial shape
    (torch ``interpolate(mode='trilinear', align_corners=False)`` analog,
    used by deep supervision heads)."""
    out_shape = (x.shape[0],) + tuple(out_spatial) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method='linear')


def fold_depth_to_batch(x):
    """[N, D, H, W, C] -> [N*D, H, W, C] (pure reshape in channels-last)."""
    n, d = x.shape[0], x.shape[1]
    return x.reshape((n * d,) + x.shape[2:]), (n, d)


def unfold_depth_from_batch(x, nd):
    n, d = nd
    return x.reshape((n, d) + x.shape[1:])


# torch-style initializers used across the model zoo: conv kernels follow
# kaiming-uniform (torch Conv default); the reference additionally offers
# normal/xavier/kaiming/orthogonal init (unet2d5_dsbn.py:10-41)
def kaiming_normal_conv():
    return nn.initializers.variance_scaling(2.0, 'fan_in', 'truncated_normal')


def normal_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)
