"""Mixed-precision policy: bf16 compute with f32 state.

The reference runs f32 end to end (PyTorch defaults; no AMP anywhere in
PyMIC). On TPU the MXU's bf16 peak is 2x the f32 path and bf16 halves HBM
traffic for weights and activations, so this framework adds an opt-in
mixed-precision mode — the real one, not a naive activation cast:

* **master parameters stay f32** (optimizer state, checkpoints, updates);
* forward/backward run in bf16: parameters are cast once inside the jitted
  step, inputs are cast at the device boundary;
* **DSBN running statistics stay f32** and batch statistics are computed in
  f32 (models/dsbn.py already accumulates ``mean``/``E[x^2]`` in f32
  regardless of the activation dtype);
* losses, metrics and sliding-window accumulators are f32 — the cast
  wrapper returns f32 logits, and engine/infer.py accumulates in f32.

Config surface: ``[training] precision = bfloat16`` for the train step,
``[testing] precision = bfloat16`` for inference (the agent casts the
checkpoint's params; the Inferer casts the volume). ``matmul_precision``
(default/high/highest) additionally controls how XLA decomposes f32
matmuls/convs on the MXU.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

_ALIASES = {
    'float32': None, 'f32': None, 'fp32': None, None: None, '': None,
    'bfloat16': jnp.bfloat16, 'bf16': jnp.bfloat16,
    'float16': jnp.float16, 'fp16': jnp.float16,
}


def resolve_dtype(name) -> Optional[jnp.dtype]:
    """Config string -> compute dtype (None = keep f32, no casting)."""
    key = name.lower() if isinstance(name, str) else name
    if key not in _ALIASES:
        raise ValueError('Undefined precision {0!r} (use float32/bfloat16/'
                         'float16)'.format(name))
    return _ALIASES[key]


def cast_float_tree(tree, dtype):
    """Cast f32 leaves to ``dtype`` (non-float and non-f32 leaves pass
    through — integer domain labels, f64 host scalars, already-cast
    params)."""
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, 'dtype') and a.dtype == jnp.float32 else a, tree)


def _cast_back_f32(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, 'dtype') and a.dtype == dtype else a, tree)


def cast_apply_fn(apply_fn: Callable, compute_dtype) -> Callable:
    """Wrap ``module.apply`` with the mixed-precision policy: params and the
    input batch are cast to ``compute_dtype`` (f32 master copies untouched —
    the cast happens inside the traced step, so gradients come out f32),
    outputs are cast back to f32. Mutable-collection returns ``(out, vars)``
    keep their updated variables as produced (DSBN stats are f32 by
    construction)."""
    if compute_dtype is None:
        return apply_fn

    def wrapped(variables, x, *args, **kwargs):
        variables = dict(variables)
        if 'params' in variables:
            variables['params'] = cast_float_tree(variables['params'],
                                                  compute_dtype)
        out = apply_fn(variables, x.astype(compute_dtype), *args, **kwargs)
        if kwargs.get('mutable'):
            y, updated = out
            return _cast_back_f32(y, compute_dtype), updated
        return _cast_back_f32(out, compute_dtype)

    return wrapped


def cast_infer_variables(variables: dict, precision) -> dict:
    """Inference-time variables under ``[testing] precision``: params cast to
    the compute dtype, batch_stats kept f32 (DSBN normalizes with
    f32-rounded-to-bf16 statistics; accumulation stays f32 downstream)."""
    dtype = resolve_dtype(precision)
    if dtype is None:
        return variables
    out = dict(variables)
    out['params'] = cast_float_tree(variables['params'], dtype)
    return out


def apply_matmul_precision(config: dict, stage: str = 'train') -> None:
    """Honor ``matmul_precision``: 'default' (fastest — bf16 MXU passes
    for f32 operands), 'high' (3-pass bf16) or 'highest' (f32). Applied
    process-wide before compilation; the section matching the running
    stage wins ([testing] for test/inference, [training] otherwise)."""
    order = (('testing', 'training') if stage in ('test', 'inference')
             else ('training', 'testing'))
    for section in order:
        val = config.get(section, {}).get('matmul_precision', None)
        if val:
            jax.config.update('jax_default_matmul_precision', str(val))
            return
