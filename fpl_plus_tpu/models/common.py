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


def upsample_align_corners(x, factor: int = 2, axes=None):
    """Linear (bi/tri) upsampling with ``align_corners=True`` semantics.

    torch's ``nn.Upsample(mode='bilinear/trilinear', align_corners=True)``
    samples source coordinates ``i * (n_in - 1) / (n_out - 1)``; jax.image
    only offers half-pixel-center sampling, so interpolation is done here
    axis-by-axis with gathers + lerp (cheap; it's all VPU work).
    ``axes`` restricts which spatial axes upsample (default: all) — the
    flat-2.5D path upsamples H/W of a rank-5 tensor, leaving D alone.
    """
    spatial_axes = axes if axes is not None else range(1, x.ndim - 1)
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


class DepthSliceConv(nn.Module):
    """2D convolution applied slice-wise to ``[N, D, H, W, C]`` WITHOUT
    folding depth into batch: the stored kernel keeps the 2D shape
    ``[kh, kw, Cin, K]`` (parameter-tree-identical to ``nn.Conv`` on the
    folded layout, so checkpoints/conversion are unchanged) and is expanded
    to a depth-1 3D kernel at call time. Motivation: the fold/unfold
    reshapes at every 2.5D level boundary cost ~16% of the train step in
    pure layout copies on v5e (BASELINE.md round 4)."""
    features: int
    kernel_size: Sequence[int] = (3, 3)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        bias = (self.param('bias', nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        # nn.Conv's dtype promotion (params cast to the promoted compute
        # dtype), so bf16/f32 mixing behaves exactly like the folded path
        from flax.linen import dtypes
        x, kernel, bias = dtypes.promote_dtype(x, kernel, bias, dtype=None)
        y = jax.lax.conv_general_dilated(
            x, kernel[None], window_strides=(1, 1, 1), padding='SAME',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        if bias is not None:
            y = y + bias
        return y


class DepthSliceConvTranspose(nn.Module):
    """2D transposed convolution applied slice-wise to [N, D, H, W, C]
    (depth-1 kernel, stride 1 along D) with the ``nn.ConvTranspose``
    parameter layout ``[kh, kw, Cin, K]``."""
    features: int
    kernel_size: Sequence[int] = (2, 2)
    strides: Sequence[int] = (2, 2)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        bias = (self.param('bias', nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        from flax.linen import dtypes
        x, kernel, bias = dtypes.promote_dtype(x, kernel, bias, dtype=None)
        y = jax.lax.conv_transpose(
            x, kernel[None], strides=(1,) + tuple(self.strides),
            padding='VALID',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        if bias is not None:
            y = y + bias
        return y


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
