"""Pallas TPU kernel: fused DSBN (eval) + PReLU.

The FPL+ flagship applies (conv -> DSBN -> PReLU) ~36 times per forward; at
inference the DSBN is an affine transform with per-domain running stats.
This kernel fuses bank-select + normalize + PReLU into one VMEM pass:

    y = prelu((x - mean[d]) * rsqrt(var[d] + eps) * scale[d] + bias[d])

* the domain index ``d`` is a scalar-prefetch argument (SMEM) so bank
  selection costs one dynamic row read, not a gather over the feature map;
* x is processed as ``[rows, C]`` tiles (rows = flattened batch*spatial),
  lane dimension = channels — the model's channels-last layout maps straight
  onto VPU lanes;
* accumulation dtype follows the input (bf16 in, bf16 out; the rsqrt is
  computed in f32 for parity with the unfused path).

XLA usually fuses these elementwise ops into the convolution epilogue
already — the kernel exists for the cases where it does not (e.g. when the
conv output is consumed twice) and as the template for further fusions.
``dsbn_prelu`` falls back to the pure-jnp reference implementation on
non-TPU backends; both paths are numerically identical (tested).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def dsbn_prelu_reference(x, scale, bias, mean, var, domain, alpha,
                         eps: float = 1e-5):
    """Unfused reference: x [..., C]; scale/bias/mean/var [n_domains, C];
    domain scalar int; alpha scalar (shared PReLU slope)."""
    g = jnp.take(scale, domain, axis=0).astype(x.dtype)
    b = jnp.take(bias, domain, axis=0).astype(x.dtype)
    m = jnp.take(mean, domain, axis=0)
    v = jnp.take(var, domain, axis=0)
    inv = jax.lax.rsqrt(v.astype(jnp.float32) + eps).astype(x.dtype)
    y = (x - m.astype(x.dtype)) * inv * g + b
    return jnp.where(y >= 0, y, alpha.astype(x.dtype) * y)


def _rows_tile_for(dtype) -> int:
    return {jnp.bfloat16.dtype: 256}.get(jnp.dtype(dtype), 128)


@partial(jax.jit, static_argnames=('eps', 'interpret'))
def _dsbn_prelu_pallas(x2d, scale, bias, mean, var, domain, alpha,
                       eps: float = 1e-5, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, c = x2d.shape
    tile = _rows_tile_for(x2d.dtype)
    pad_rows = (-rows) % tile
    if pad_rows:
        x2d = jnp.pad(x2d, ((0, pad_rows), (0, 0)))
    n_tiles = x2d.shape[0] // tile

    params = jnp.stack([
        scale.astype(jnp.float32), bias.astype(jnp.float32),
        mean.astype(jnp.float32), var.astype(jnp.float32)], axis=1)
    # params: [n_domains, 4, C]; the kernel reads params[domain]
    dom = jnp.reshape(domain.astype(jnp.int32), (1,))
    alpha_arr = jnp.reshape(alpha.astype(jnp.float32), (1,))

    def kernel(dom_ref, alpha_ref, params_ref, x_ref, y_ref):
        d = dom_ref[0]
        p = params_ref[d]                     # [4, C] f32
        g, b = p[0], p[1]
        inv = jax.lax.rsqrt(p[3] + eps)
        xv = x_ref[:].astype(jnp.float32)
        y = (xv - p[2]) * inv * g + b
        a = alpha_ref[0]
        y_ref[:] = jnp.where(y >= 0, y, a * y).astype(y_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            # params [n_domains, 4, C]: tiny, whole array resident in VMEM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i, *_: (i, 0)),
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
    )(dom, alpha_arr, params, x2d)
    return y[:rows] if pad_rows else y


def dsbn_prelu(x, scale, bias, mean, var, domain, alpha, eps: float = 1e-5,
               interpret: bool = False):
    """Fused eval-mode DSBN + PReLU. x [..., C] channels-last; falls back to
    the jnp reference off-TPU unless ``interpret`` is set."""
    platform = jax.devices()[0].platform
    if platform not in ('tpu',) and not interpret:
        return dsbn_prelu_reference(x, scale, bias, mean, var, domain,
                                    alpha, eps)
    shape = x.shape
    y = _dsbn_prelu_pallas(x.reshape(-1, shape[-1]), scale, bias, mean, var,
                           jnp.asarray(domain), jnp.asarray(alpha), eps,
                           interpret)
    return y.reshape(shape)
