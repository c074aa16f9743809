"""TPU-native sliding-window inference engine.

Replaces the reference Inferer (PyMIC/pymic/net_run_dsbn/infer_func.py):
identical window-grid rule (clamped starts, :75-85), overlap averaging via a
counter tensor (:96-111), flip-TTA over H/W (:195-222) and MC-dropout passes
for the FPL uncertainty filter (agent_seg.py:897-931).

TPU-first design — the reference's pure-Python patch loop issuing one
``model()`` call per patch becomes ONE jit-compiled XLA program per volume
shape:

* the window grid is computed on host (static, data not control flow) and
  shipped as a ``[P, 3]`` start-index array;
* flip-TTA variants are folded into a leading ``V`` axis of the volume
  tensor (un-flip = gather at the end), so every patch forward carries a
  ``V x chunk`` batch through the MXU instead of batch-1 calls;
* patches are extracted on-device with ``vmap(dynamic_slice)`` (one H2D
  transfer of the volume per case, zero per-patch transfers);
* overlap accumulation is a ``lax.scan`` over start chunks with
  read-add-write ``dynamic_update_slice`` — deterministic ordering;
* the model parameters / domain label / dropout rng travel as the TRACED
  ``ctx`` pytree, so checkpoint swaps, domain switches and MC-dropout rng
  changes never trigger recompilation — only a new volume shape does.

Channels-last layout throughout: volumes are ``[D, H, W, C]`` on device,
flip axes H=1, W=2 (mirroring the reference's [-2], [-1] on NCDHW).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_grid(img_shape: Sequence[int], window: Sequence[int],
                stride: Sequence[int]) -> np.ndarray:
    """Clamped crop-start grid, identical ordering to the reference
    (infer_func.py:75-85: W outermost, then H, then D)."""
    dim = len(img_shape)
    starts = []
    if dim == 3:
        ds, hs, ws = img_shape
        for w in range(0, ws, stride[2]):
            w_min = min(w, ws - window[2])
            for h in range(0, hs, stride[1]):
                h_min = min(h, hs - window[1])
                for d in range(0, ds, stride[0]):
                    d_min = min(d, ds - window[0])
                    starts.append([d_min, h_min, w_min])
    elif dim == 2:
        hs, ws = img_shape
        for w in range(0, ws, stride[1]):
            w_min = min(w, ws - window[1])
            for h in range(0, hs, stride[0]):
                h_min = min(h, hs - window[0])
                starts.append([h_min, w_min])
    else:
        raise ValueError('sliding window supports 2D/3D only')
    return np.asarray(starts, np.int32)


_FLIPS_3D = ((), (1,), (2,), (1, 2))   # identity, flip-H, flip-W, flip-HW
_FLIPS_2D = ((), (0,), (1,), (0, 1))


def _make_variants(volume: jnp.ndarray, tta: bool) -> jnp.ndarray:
    """[D,H,W,C] -> [V,D,H,W,C] of flip variants (V=4 with TTA else 1)."""
    if not tta:
        return volume[None]
    flips = _FLIPS_3D if volume.ndim == 4 else _FLIPS_2D
    return jnp.stack([jnp.flip(volume, ax) if ax else volume for ax in flips])


def _unflip_mean(outputs: jnp.ndarray, tta: bool) -> jnp.ndarray:
    """[V,...,C] -> TTA-averaged [...,C] (un-flip each variant first)."""
    if not tta:
        return outputs[0]
    flips = _FLIPS_3D if outputs.ndim == 5 else _FLIPS_2D
    un = [jnp.flip(outputs[i], ax) if ax else outputs[i]
          for i, ax in enumerate(flips)]
    return sum(un) / len(un)


@partial(jax.jit, static_argnames=('predictor', 'window', 'chunk'))
def _sliding_window_jit(predictor, ctx, volume_v: jnp.ndarray,
                        starts: jnp.ndarray, window: Tuple[int, ...],
                        chunk: int):
    """Core program: volume_v [V, *img, C], starts [P, dim] (P % chunk == 0),
    ``ctx`` an arbitrary traced pytree handed to ``predictor(ctx, patches)``.

    Returns (output [V, *img, K], counter [*img, 1])."""
    v_num = volume_v.shape[0]
    img_shape = volume_v.shape[1:-1]
    dim = len(img_shape)
    in_c = volume_v.shape[-1]

    def extract(vol, s0):
        return jax.lax.dynamic_slice(vol, tuple(s0) + (0,), window + (in_c,))

    # probe class count statically via eval_shape (no FLOPs)
    probe = jax.eval_shape(predictor, ctx,
                           jnp.zeros((v_num * chunk,) + window + (in_c,),
                                     volume_v.dtype))
    k = probe.shape[-1]

    # the zero-valued dependency on `starts` keeps the accumulators "varying"
    # when this program runs inside shard_map with a device-sharded grid
    # (otherwise the scan carry mixes unvarying init with varying updates)
    zero = (starts[0, 0] * 0).astype(jnp.float32)
    out0 = jnp.zeros((v_num,) + tuple(img_shape) + (k,), jnp.float32) + zero
    cnt0 = jnp.zeros(tuple(img_shape) + (1,), jnp.float32) + zero
    ones_win = jnp.ones(window + (1,), jnp.float32)

    starts_chunks = starts.reshape(-1, chunk, dim)

    def add_at(acc, s0, patch):
        cur = jax.lax.dynamic_slice(acc, tuple(s0) + (0,),
                                    window + (acc.shape[-1],))
        return jax.lax.dynamic_update_slice(acc, cur + patch,
                                            tuple(s0) + (0,))

    def body(carry, starts_c):
        out, cnt = carry
        # [V, chunk, *win, C]
        patches = jax.vmap(lambda vol: jax.vmap(lambda s: extract(vol, s))(
            starts_c))(volume_v)
        flat = patches.reshape((v_num * chunk,) + window + (in_c,))
        preds = predictor(ctx, flat).astype(jnp.float32)
        preds = preds.reshape((v_num, chunk) + window + (k,))

        def acc_variant(out_v, preds_v):
            def acc_one(i, o):
                return add_at(o, starts_c[i], preds_v[i])
            return jax.lax.fori_loop(0, chunk, acc_one, out_v)

        out = jax.vmap(acc_variant)(out, preds)

        def cnt_one(i, c):
            return add_at(c, starts_c[i], ones_win)
        cnt = jax.lax.fori_loop(0, chunk, cnt_one, cnt)
        return (out, cnt), None

    (out, cnt), _ = jax.lax.scan(body, (out0, cnt0), starts_chunks)
    return out, cnt


@partial(jax.jit, static_argnames=('predictor', 'tta'))
def _whole_volume_jit(predictor, ctx, variants: jnp.ndarray, tta: bool):
    preds = predictor(ctx, variants)
    if isinstance(preds, (tuple, list)):
        preds = preds[0]
    return _unflip_mean(preds.astype(jnp.float32), tta)


class Inferer:
    """``Inferer(testing_cfg).run(predictor, ctx, image)``.

    ``predictor(ctx, x)`` maps a channels-last patch batch ``[B, *win, C]``
    (or the whole volume batch when sliding window is off) to logits
    ``[B, *win, K]``. It must be a stable hashable callable (module-level
    function or bound method) — it is a static jit argument, while ``ctx``
    (model variables, domain label, dropout rng, ...) is traced, so swapping
    checkpoints/domains/rngs reuses the compiled program. Multi-output
    networks contribute their primary full-resolution head (the reference
    agent also consumes ``outputs[0]``, net_run/agent_seg.py:375-380).

    ``image``: numpy/jnp ``[N=1, C, *img]`` channels-first host layout (the
    dataset contract) — transposed once at the device boundary.
    """

    def __init__(self, config: dict, patch_chunk: int = 2):
        self.config = config
        self.patch_chunk = patch_chunk

    def run(self, predictor: Callable, ctx, image,
            tta_override: Optional[bool] = None) -> np.ndarray:
        tta_mode = self.config.get('tta_mode', 0)
        if tta_mode not in (0, 1):
            raise ValueError('Undefined tta_mode {0}'.format(tta_mode))
        tta = bool(tta_mode) if tta_override is None else tta_override

        image = np.asarray(image)
        assert image.shape[0] == 1, 'inference processes one volume at a time'
        vol = jnp.asarray(np.moveaxis(image[0], 0, -1))   # [*img, C]
        img_shape = vol.shape[:-1]
        dim = len(img_shape)

        use_sw = self.config.get('sliding_window_enable', False)
        window = list(self.config.get('sliding_window_size') or [None] * dim)
        stride = list(self.config.get('sliding_window_stride') or [None] * dim)
        for d in range(dim):
            if window[d] is None or window[d] > img_shape[d]:
                window[d] = img_shape[d]
            if stride[d] is None or stride[d] > window[d]:
                stride[d] = window[d]

        if not use_sw or all(window[d] >= img_shape[d] for d in range(dim)):
            # whole-volume path: pad spatial dims to a multiple of the
            # network's total downsampling factor so odd sizes survive the
            # encoder/decoder (the reference torch nets crash on such
            # inputs; configurable via ``infer_autopad_multiple``).
            # Padding happens BEFORE the flip variants so un-flipping stays
            # aligned on the padded grid.
            mult = self.config.get('infer_autopad_multiple', 16)
            pads = [(-s) % mult for s in img_shape]
            if any(pads):
                vol = jnp.pad(vol, [(0, p) for p in pads] + [(0, 0)],
                              mode='reflect')
            out = _whole_volume_jit(predictor, ctx, _make_variants(vol, tta),
                                    tta)
            if any(pads):
                out = out[tuple(slice(0, s) for s in img_shape)]
        else:
            starts = window_grid(img_shape, window, stride)
            chunk = min(self.patch_chunk, len(starts))
            pad = (-len(starts)) % chunk
            if pad:   # duplicate starts round out the last chunk; the counter
                starts = np.concatenate([starts, starts[:pad]], 0)  # absorbs it
            out_v, cnt = _sliding_window_jit(predictor, ctx,
                                             _make_variants(vol, tta),
                                             jnp.asarray(starts),
                                             tuple(window), chunk)
            out = _unflip_mean(out_v / cnt[None], tta)
        # back to the host contract [1, K, *img]
        return np.moveaxis(np.asarray(out), -1, 0)[None]

    def run_mc(self, predictor: Callable, ctx_factory: Callable, image,
               rngs: List, tta_override: Optional[bool] = None
               ) -> List[np.ndarray]:
        """MC-dropout passes for FPL filtering: one full (TTA x sliding
        window) inference per rng key, dropout active
        (reference agent_seg.py:897-931 — 6 stochastic passes). The compiled
        program is shared across passes (only ctx changes)."""
        return [self.run(predictor, ctx_factory(rng), image, tta_override)
                for rng in rngs]
