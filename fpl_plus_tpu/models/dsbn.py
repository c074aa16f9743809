"""Domain-Specific Batch Normalization (DSBN) — the key UDA primitive.

Reference semantics (PyMIC/pymic/net_run_dsbn/dsbn.py:4-64): a bank of
independent BatchNorm layers, one per domain; the whole batch belongs to one
domain and ``bns[domain_label[0]]`` is selected. Here the bank is stored as
stacked ``[num_domains, C]`` parameters/stats and the (traced) scalar domain
index selects a row on-device with ``jnp.take`` — no Python branching, fully
jit/pjit compatible, and the update of the selected domain's running stats is
a masked (one-hot) vectorized assignment.

Matches torch BatchNorm numerics: eps 1e-5, momentum 0.1
(new = 0.9*old + 0.1*batch), biased variance for normalization, unbiased
variance for the running-stat update.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class DomainBatchNorm(nn.Module):
    features: int
    num_domains: int = 2
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, domain, use_running_average: bool,
                 prelu_alpha=None):
        nd, c = self.num_domains, self.features
        scale = self.param('scale', nn.initializers.ones, (nd, c))
        bias = self.param('bias', nn.initializers.zeros, (nd, c))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((nd, c), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((nd, c), jnp.float32))
        domain = jnp.asarray(domain, jnp.int32)

        # fused eval path: normalize + PReLU in one Pallas VMEM pass
        # (ops/pallas_fused.py; identical numerics to the two-op fallback).
        # Only valid with running stats — training always uses the
        # unfused path so batch-stat updates stay in one place.
        if prelu_alpha is not None and use_running_average:
            from fpl_plus_tpu.ops.pallas_fused import dsbn_prelu
            return dsbn_prelu(x, scale, bias, ra_mean.value, ra_var.value,
                              domain, prelu_alpha, self.eps)

        if use_running_average:
            mean = jnp.take(ra_mean.value, domain, axis=0)
            var = jnp.take(ra_var.value, domain, axis=0)
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                unbiased = var * (n / max(n - 1, 1))
                onehot = jax.nn.one_hot(domain, nd, dtype=jnp.float32)[:, None]
                m = self.momentum
                ra_mean.value = (ra_mean.value * (1.0 - m * onehot)
                                 + m * onehot * mean[None, :])
                ra_var.value = (ra_var.value * (1.0 - m * onehot)
                                + m * onehot * unbiased[None, :])

        g = jnp.take(scale, domain, axis=0).astype(x.dtype)
        b = jnp.take(bias, domain, axis=0).astype(x.dtype)
        inv = jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return (x - mean.astype(x.dtype)) * inv * g + b


class BatchNorm(DomainBatchNorm):
    """Plain BatchNorm = DSBN with a single domain bank."""
    num_domains: int = 1

    def __call__(self, x, use_running_average: bool):  # type: ignore[override]
        return super().__call__(x, jnp.int32(0), use_running_average)


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm3d analog (no affine, per-sample spatial stats)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        reduce_axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=reduce_axes, keepdims=True)
        var = jnp.var(x, axis=reduce_axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)
