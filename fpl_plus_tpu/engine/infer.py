"""TPU-native sliding-window inference engine.

Replaces the reference Inferer (PyMIC/pymic/net_run_dsbn/infer_func.py):
identical window-grid rule (clamped starts, :75-85), overlap averaging via a
counter tensor (:96-111), flip-TTA over H/W (:195-222), multi-scale output
accumulation (:113-140) and MC-dropout passes for the FPL uncertainty filter
(agent_seg.py:897-931).

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
* overlap accumulation: small grids unroll into straight-line
  traced-start updates (XLA emits these in place, ~73 us/window on v5e);
  large grids run a ``lax.scan`` over start chunks with read-add-write
  carry updates (measured ~2% of device time — the program is conv-bound;
  ``[testing] placement = matmul`` swaps in one-hot MXU contractions,
  ``_matmul_place``, bit-identical but a measured NEGATIVE result on
  v5e) — deterministic ordering; nets with multi-scale output lists
  accumulate every head at its own scaled grid. Each scale keeps its own
  exact counter by default;
  ``[testing] multiscale_counter = reference`` restores the reference's
  n_heads-scaled, nearest-interpolated full-res counter division
  (``_overlap_divide``) — the two agree up to a global logit scale when
  stride >= window and differ near scaled-box edges otherwise;
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


def dim_start_lists(img_shape: Sequence[int], window: Sequence[int],
                    stride: Sequence[int]) -> Tuple[Tuple[int, ...], ...]:
    """Per-dim clamped start lists whose Cartesian product is
    ``window_grid`` (duplicates from aggressive clamping kept — the
    reference counts them). Because the grid is this product, the overlap
    COUNTER is separable: an outer product of per-dim 1-D coverage
    vectors (see _analytic_counters) — no accumulation ops needed."""
    return tuple(
        tuple(min(p, img_shape[d] - window[d])
              for p in range(0, img_shape[d], stride[d]))
        for d in range(len(img_shape)))


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


def _as_list(out):
    return list(out) if isinstance(out, (tuple, list)) else [out]


def _matmul_place(patch: jnp.ndarray, s0, out_shape) -> jnp.ndarray:
    """Embed ``patch`` ``[*win, K]`` at TRACED start ``s0`` inside a zero
    ``[*out_shape, K]`` tensor via per-dim one-hot contractions: for each
    spatial dim a ``[X_d, W_d]`` one-hot matrix ``M[x, i] = (x == s0 + i)``
    contracted against the patch — placement as matmul on the MXU
    (~1.7 GFLOP/window at the flagship shapes).

    BIT-EXACT by construction: every output element is ``1.0 * v`` (the
    one-hot row has at most one nonzero) or ``0.0``; ``Precision.HIGHEST``
    keeps the f32 operand unrounded on the MXU (the default bf16x3 pass
    would round ``v`` to 16 mantissa bits when the other operand's low
    split is zero). The caller adds the placed tensor into the
    accumulator — the same f32 add, in the same order, as the
    read-add-write update it replaces.

    Status: a measured NEGATIVE result on v5e (r4_tpu_measure stage F,
    100-window overlap grid in the scan path: -0.8% device time, 30x the
    compile wall) — current XLA:TPU already lowers scan-carry traced
    updates to ~2% of the conv-bound program. Off by default
    (``[testing] placement = update``); kept behind the lever for future
    XLA versions and as the template for contraction-based scatter."""
    dim = len(out_shape)
    out = patch
    for d in range(dim):
        x_d, w_d = out_shape[d], patch.shape[d]
        one_hot = (jax.lax.broadcasted_iota(jnp.int32, (x_d, w_d), 0)
                   == s0[d] + jax.lax.broadcasted_iota(
                       jnp.int32, (x_d, w_d), 1)).astype(patch.dtype)
        out = jnp.moveaxis(
            jnp.tensordot(one_hot, out, axes=(1, d),
                          precision=jax.lax.Precision.HIGHEST), 0, d)
    return out


def _probe_heads(predictor, ctx, variants, window, chunk):
    """Static head-shape probe (no FLOPs): per-head window shapes and
    full-volume output shapes — the same scale rule as the accumulation
    core (reference infer_func.py:31-48)."""
    v_num = variants.shape[0]
    in_c = variants.shape[-1]
    img_shape = variants.shape[1:-1]
    dim = len(img_shape)
    probe = jax.eval_shape(predictor, ctx,
                           jnp.zeros((v_num * chunk,) + tuple(window)
                                     + (in_c,), variants.dtype))
    probes = _as_list(probe)
    head_windows = [tuple(p.shape[1:-1]) for p in probes]
    out_shapes = [tuple(int(img_shape[d] * head_windows[i][d] / window[d])
                        for d in range(dim))
                  for i in range(len(probes))]
    return head_windows, out_shapes


def _counters_for(predictor, ctx, variants, window, chunk, dim_starts,
                  pads, tta_n=None):
    """Analytic counters matching ``_sliding_window_jit``'s (dropped)
    accumulated ones: no variant axis when ``pads`` is None; else one
    counter per flip variant, tiled across batched volume groups."""
    head_windows, out_shapes = _probe_heads(predictor, ctx, variants,
                                            window, chunk)
    v_num = variants.shape[0]
    tta_n = tta_n if tta_n is not None else v_num
    if pads is None:
        return _analytic_counters(dim_starts, window, head_windows,
                                  out_shapes)
    dim = variants.ndim - 2
    flips = (_FLIPS_3D if dim == 3 else _FLIPS_2D)[:tta_n]
    cnts = _analytic_counters(dim_starts, window, head_windows, out_shapes,
                              pads, flips)
    if v_num != tta_n:
        cnts = [jnp.concatenate([c] * (v_num // tta_n), 0) for c in cnts]
    return cnts


def _analytic_counters(dim_starts, window, head_windows, out_shapes,
                       pads=None, flips=()):
    """Closed-form overlap counters (one per prediction head).

    The window grid is the Cartesian product of the per-dim start lists
    ``dim_starts``, so each head's coverage counter factorizes into an
    outer product of per-dim 1-D coverage vectors — replacing the O(P)
    read-add-write counter updates of the accumulation path (measured the
    dominant machinery cost of the inference program, BASELINE.md round 2)
    with three tiny vector ops. Exactly equal to the accumulated counter,
    including clamp-duplicate starts (each weight-1 start counts once) and
    the per-head scaled grids (same floor rule as ``scaled()``).

    ``pads`` None -> constants folded at trace time; one ``[*out_i, 1]``
    array per head. ``pads`` a traced [dim] i32 array (shape bucketing) ->
    per-VARIANT counters [len(flips), *out_i, 1]: variant grids shift by
    the pad along their flipped dims (``flips`` = static flip-axis tuples).
    """
    dim = len(dim_starts)
    cnts = []
    for win_i, oshape in zip(head_windows, out_shapes):
        if pads is None:
            vecs = []
            for d in range(dim):
                cov = np.zeros(oshape[d], np.float32)
                for s in dim_starts[d]:
                    s0 = s * win_i[d] // window[d]
                    cov[s0:s0 + win_i[d]] += 1.0
                vecs.append(jnp.asarray(cov))
            c = vecs[0]
            for d in range(1, dim):
                c = c[..., None] * vecs[d]
            cnts.append(c[..., None])
        else:
            variant_cnts = []
            for ax in flips:
                vecs = []
                for d in range(dim):
                    idx = jnp.arange(oshape[d], dtype=jnp.int32)
                    s_full = jnp.asarray(dim_starts[d], jnp.int32)
                    if d in ax:
                        s_full = s_full + pads[d]
                    s0 = (s_full * win_i[d] // window[d])[:, None]
                    cov = jnp.sum(
                        (idx[None, :] >= s0) & (idx[None, :] < s0 + win_i[d]),
                        axis=0).astype(jnp.float32)
                    vecs.append(cov)
                c = vecs[0]
                for d in range(1, dim):
                    c = c[..., None] * vecs[d]
                variant_cnts.append(c[..., None])
            cnts.append(jnp.stack(variant_cnts))
    return cnts


@partial(jax.jit, static_argnames=('predictor', 'window', 'chunk',
                                   'unroll_accum', 'tta_v',
                                   'static_starts', 'static_weights',
                                   'accumulate_counters', 'placement'))
def _sliding_window_jit(predictor, ctx, volume_v: jnp.ndarray,
                        starts: jnp.ndarray, weights: jnp.ndarray,
                        window: Tuple[int, ...], chunk: int,
                        pads: Optional[jnp.ndarray] = None,
                        unroll_accum: bool = False,
                        tta_v: Optional[int] = None,
                        static_starts=None, static_weights=None,
                        accumulate_counters: bool = True,
                        placement: str = 'update'):
    """Core program: volume_v [V, *img, C], starts [P, dim] (P % chunk == 0),
    ``weights`` [P] scaling each window's contribution to output AND counter
    (0 for the duplicate starts that round out the last chunk — a nonzero
    weight would bias overlap averaging toward duplicated windows),
    ``ctx`` an arbitrary traced pytree handed to ``predictor(ctx, patches)``.

    ``pads``: TRACED [dim] i32 array of trailing per-dim padding applied to
    the volume before flipping, for shape bucketing (traced, not static, so
    every pad amount within a bucket reuses one compiled program). The
    start grid is computed on the TRUE (unpadded) shape, so windows of the
    identity variant never read padded voxels; for a flipped variant the
    real data sits at [pad, padded) along the flipped dims, so its starts
    are shifted by the pad there — making the bucketed program voxel-exact
    vs the unbucketed one (see Inferer.run_async).

    Returns (outputs, counters): lists with one [V, *img_i, K_i] output and
    one [V, *img_i, 1] counter per prediction head (multi-scale nets produce
    several; single-output nets produce singleton lists). Counters carry the
    variant axis because shifted grids overlap differently per variant.
    ``accumulate_counters=False`` (the Inferer paths) skips all counter
    accumulation and returns (outputs, None) — the caller computes the
    SAME counters in closed form (``_analytic_counters``: the grid is a
    Cartesian product, so coverage is an outer product of per-dim
    vectors), roughly halving the accumulation machinery that dominated
    the profiled device program (BASELINE.md round-2 finding 3)."""
    v_num = volume_v.shape[0]
    img_shape = volume_v.shape[1:-1]
    dim = len(img_shape)
    in_c = volume_v.shape[-1]

    # per-variant start offsets: pad shift along each flipped dim (the flip
    # mask is static; the pad amounts stay traced). Without bucketing
    # (pads=None, a STATIC distinction) the offsets vanish and the counter
    # drops its variant axis — the original cheaper accumulation.
    # ``tta_v``: flip variants per volume group — batched serving stacks
    # N same-shape volumes as v_num = N * tta_v leading entries (the flip
    # offset pattern tiles per group); None = single volume (v_num <= 4)
    tta_n = tta_v if tta_v is not None else v_num
    per_variant = pads is not None
    if per_variant:
        flips = (_FLIPS_3D if dim == 3 else _FLIPS_2D)[:tta_n]
        mask = jnp.asarray([[1 if d in ax else 0 for d in range(dim)]
                            for ax in flips] * (v_num // tta_n), jnp.int32)
        offs = mask * pads[None, :].astype(jnp.int32)
    else:
        offs = jnp.zeros((v_num, dim), jnp.int32)

    def extract(vol, s0):
        return jax.lax.dynamic_slice(vol, tuple(s0) + (0,), window + (in_c,))

    # probe output count/shapes statically via eval_shape (no FLOPs)
    probe = jax.eval_shape(predictor, ctx,
                           jnp.zeros((v_num * chunk,) + window + (in_c,),
                                     volume_v.dtype))
    probes = _as_list(probe)
    windows = [tuple(p.shape[1:-1]) for p in probes]
    ks = [p.shape[-1] for p in probes]
    # per-head output grids scale with the head's window (reference
    # infer_func.py:31-48: scale = head_shape / primary_shape)
    out_shapes = [tuple(int(img_shape[d] * windows[i][d] / window[d])
                        for d in range(dim)) for i in range(len(probes))]

    # the zero-valued dependency on `starts` keeps the accumulators "varying"
    # when this program runs inside shard_map with a device-sharded grid
    # (otherwise the scan carry mixes unvarying init with varying updates).
    # Accumulators are LISTS of per-variant arrays (not stacked [V, ...]
    # tensors): every dynamic_slice / dynamic_update_slice below then keeps
    # SCALAR traced start indices — vmapping the updates over variants
    # lowers them to gather/scatter HLOs instead (measured slower on v5e).
    zero = (starts[0, 0] * 0).astype(jnp.float32)
    outs0 = [[jnp.zeros(out_shapes[i] + (ks[i],), jnp.float32) + zero
              for _ in range(v_num)] for i in range(len(probes))]
    if not accumulate_counters:
        cnts0 = None
    elif per_variant:
        # counters depend only on the flip pattern: tta_n distinct grids,
        # shared by every volume group in batched serving (tiled to v_num
        # on return) — not recomputed per group
        cnts0 = [[jnp.zeros(out_shapes[i] + (1,), jnp.float32) + zero
                  for _ in range(tta_n)] for i in range(len(probes))]
    else:
        cnts0 = [jnp.zeros(out_shapes[i] + (1,), jnp.float32) + zero
                 for i in range(len(probes))]
    ones_wins = [jnp.ones(windows[i] + (1,), jnp.float32)
                 for i in range(len(probes))]

    starts_chunks = starts.reshape(-1, chunk, dim)
    weights_chunks = weights.reshape(-1, chunk)

    def scaled(s0, i):
        return tuple(s0[d] * windows[i][d] // window[d] for d in range(dim))

    def add_at(acc, s0, patch, win):
        cur = jax.lax.dynamic_slice(acc, tuple(s0) + (0,),
                                    win + (acc.shape[-1],))
        return jax.lax.dynamic_update_slice(acc, cur + patch,
                                            tuple(s0) + (0,))

    def add_at_scan(acc, s0, patch, win):
        # SCAN-carry accumulation. 'matmul' places the window by one-hot
        # MXU contractions (``_matmul_place``) instead of the
        # read-add-write carry update — bit-identical, but a measured
        # NEGATIVE result on v5e (stage F: -0.8% device time, 30x
        # compile; current XLA:TPU lowers the carry updates to ~2% of
        # the conv-bound program). Kept as an A/B lever for future XLA
        # versions. Straight-line (unrolled) updates are always direct —
        # XLA emits those in place (73 us/window, stage E trace).
        if placement == 'matmul':
            return acc + _matmul_place(patch, s0, acc.shape[:-1])
        return add_at(acc, s0, patch, win)

    def extract_chunk(starts_c):
        """Static unroll over (variant, chunk) — scalar-start dynamic
        slices; [V*chunk, *win, C] ordered V-major like the pred reshape."""
        patch_list = []
        for v in range(v_num):
            for j in range(chunk):
                patch_list.append(extract(volume_v[v],
                                          starts_c[j] + offs[v]))
        return jnp.stack(patch_list)

    if unroll_accum:
        # Decoupled accumulation (profiled on v5e): inside a lax.scan
        # body, XLA lowers the read-add-write dynamic updates on the
        # carry with select fusions + double-buffer copies (~130 ms per
        # volume — 3x the conv compute). Here the scan only runs the
        # forwards and stacks predictions; the overlap-add is emitted as
        # a STRAIGHT-LINE chain of scalar-start dynamic updates. Chosen
        # by the caller when the total update count is small.
        #
        # ``static_starts``/``static_weights`` (bucketing OFF only, where
        # the program is specialized per volume shape anyway): the update
        # positions become Python constants, so XLA emits true in-place
        # aligned updates — profiling showed TRACED-start updates still
        # lowering to full-array select fusions costing ~2x the convs.
        def body_fwd(_, chunk_in):
            starts_c, _w = chunk_in
            preds = _as_list(predictor(ctx, extract_chunk(starts_c)))
            return 0, [p.astype(jnp.float32).reshape(
                (v_num, chunk) + windows[i] + (ks[i],))
                for i, p in enumerate(preds)]

        _, pred_seq = jax.lax.scan(body_fwd, 0,
                                   (starts_chunks, weights_chunks))
        n_chunks = starts_chunks.shape[0]
        static_ok = (static_starts is not None and not per_variant)

        def pos_of(p, v, i):
            if static_ok:
                return scaled(static_starts[p], i)
            return scaled(starts[p] + offs[v], i)

        def w_of(p):
            if static_ok:
                return static_weights[p]   # python float
            return weights[p]

        outs, cnts = [], []
        for i in range(len(probes)):
            outs_v, cnts_v = [], []
            for v in range(v_num):
                o_v = outs0[i][v]
                for c in range(n_chunks):
                    for j in range(chunk):
                        p = c * chunk + j
                        w_p = w_of(p)
                        if static_ok and w_p == 0.0:
                            continue   # weight-0 duplicate: no-op
                        contrib = pred_seq[i][c, v, j]
                        if not (static_ok and w_p == 1.0):
                            contrib = contrib * w_p
                        o_v = add_at(o_v, pos_of(p, v, i), contrib,
                                     windows[i])
                outs_v.append(o_v)
            if accumulate_counters and per_variant:
                for v in range(tta_n):
                    c_v = cnts0[i][v]
                    for p in range(n_chunks * chunk):
                        c_v = add_at(c_v, scaled(starts[p] + offs[v], i),
                                     ones_wins[i] * weights[p], windows[i])
                    cnts_v.append(c_v)
            outs.append(jnp.stack(outs_v))
            if not accumulate_counters:
                continue
            if per_variant:
                cnts.append(jnp.concatenate(
                    [jnp.stack(cnts_v)] * (v_num // tta_n), 0))
            else:
                c_a = cnts0[i]
                for p in range(n_chunks * chunk):
                    w_p = w_of(p)
                    if static_ok and w_p == 0.0:
                        continue
                    inc = ones_wins[i]
                    if not (static_ok and w_p == 1.0):
                        inc = inc * w_p
                    c_a = add_at(c_a, pos_of(p, 0, i), inc, windows[i])
                cnts.append(c_a)
        return outs, (cnts if accumulate_counters else None)

    def body(carry, chunk_in):
        starts_c, weights_c = chunk_in
        outs, cnts = carry
        flat = extract_chunk(starts_c)
        preds = _as_list(predictor(ctx, flat))
        new_outs, new_cnts = [], []
        for i, pred in enumerate(preds):
            pred = pred.astype(jnp.float32).reshape(
                (v_num, chunk) + windows[i] + (ks[i],))
            outs_v = []
            for v in range(v_num):
                o_v = outs[i][v]
                for j in range(chunk):
                    o_v = add_at_scan(o_v, scaled(starts_c[j] + offs[v], i),
                                      pred[v, j] * weights_c[j], windows[i])
                outs_v.append(o_v)
            new_outs.append(outs_v)

            if not accumulate_counters:
                continue
            if per_variant:
                cnts_v = []
                for v in range(tta_n):
                    c_v = cnts[i][v]
                    for j in range(chunk):
                        c_v = add_at_scan(
                            c_v, scaled(starts_c[j] + offs[v], i),
                            ones_wins[i] * weights_c[j], windows[i])
                    cnts_v.append(c_v)
                new_cnts.append(cnts_v)
            else:
                c = cnts[i]
                for j in range(chunk):
                    c = add_at_scan(c, scaled(starts_c[j], i),
                                    ones_wins[i] * weights_c[j], windows[i])
                new_cnts.append(c)
        return (new_outs, new_cnts if accumulate_counters else None), None

    (outs, cnts), _ = jax.lax.scan(body, (outs0, cnts0),
                                   (starts_chunks, weights_chunks))
    # restore the stacked [V, ...] / [*img, 1] return contract (tiling
    # the tta_n shared counters across volume groups)
    outs = [jnp.stack(o) for o in outs]
    if not accumulate_counters:
        return outs, None
    if per_variant:
        cnts = [jnp.concatenate([jnp.stack(c)] * (v_num // tta_n), 0)
                for c in cnts]
    return outs, cnts


@jax.jit
def _packbits_jit(label):
    """uint8 binary label volume -> bit-packed uint8 vector (device op)."""
    return jnp.packbits(label.reshape(-1))


@jax.jit
def _fpl_uncertainty_reduce(out, lo, up):
    """Reduce folded-pass main-head logits ``[N, *img, K]`` to the FPL
    image-level uncertainty scalars on device (reference agent_seg.py:
    921-929: prob variance sum + entropy-threshold boundary count).

    ``lo``/``up`` are per-spatial-axis selection margins (the composed
    inverse-transform crop); masking the per-voxel maps is exactly
    crop-then-reduce because variance over passes and mean-prob entropy
    are computed voxel-wise before any spatial reduction."""
    out = out.astype(jnp.float32)
    probs = jax.nn.softmax(out, axis=-1)              # [N, *img, K]
    dim = out.ndim - 2
    mask = None
    for d in range(dim):
        idx = jax.lax.broadcasted_iota(jnp.int32, out.shape[1:-1], d)
        m = (idx >= lo[d]) & (idx < out.shape[1 + d] - up[d])
        mask = m if mask is None else (mask & m)
    maskf = mask.astype(jnp.float32)
    vars_sum = jnp.sum(probs.var(axis=0).sum(axis=-1) * maskf)
    if out.shape[-1] == 2:
        # binary reference formula: entropy term of the class-1 mean only
        means = probs[..., 1].mean(axis=0)            # [*img]
        unc = -(means * jnp.log(means + 1e-6))
    else:
        # multi-class generalization: full entropy of the mean softmax
        means = probs.mean(axis=0)                    # [*img, K]
        unc = -jnp.sum(means * jnp.log(means + 1e-6), axis=-1)
    boundary = jnp.sum(((unc > 0.01) & mask).astype(jnp.int32))
    return vars_sum, boundary


def _nearest_spatial_resize(x: jnp.ndarray, target: Tuple[int, ...]):
    """Nearest-neighbour resize of the spatial dims of ``x``
    [lead, *spatial, 1] to ``target`` — torch ``F.interpolate`` nearest
    semantics (src index = floor(dst * in / out)), used to reproduce the
    reference's interpolated-counter division (infer_func.py:137-139)."""
    spatial = x.shape[1:-1]
    for d, (s_in, s_out) in enumerate(zip(spatial, target)):
        if s_in == s_out:
            continue
        idx = (jnp.arange(s_out) * s_in) // s_out
        x = jnp.take(x, idx, axis=1 + d)
    return x


def _overlap_divide(o, c, c0, n_heads: int, counter_mode: str):
    """Overlap-average one head: divide its accumulated sum ``o`` by a
    counter. ``counter_mode='exact'`` (default) uses the head's OWN
    per-scale coverage counter ``c`` — every voxel is the true mean of the
    windows covering it. ``'reference'`` reproduces the reference stack's
    multi-head semantics (infer_func.py:113-140): every head divides by the
    FULL-resolution counter ``c0`` nearest-interpolated to the head's grid,
    and — because the reference increments that counter once per head per
    patch — scaled by ``n_heads``. The two agree (up to the global 1/n_heads
    logit scale) when stride >= window; with overlapping windows they
    differ near scaled-box boundaries. Single-head programs are identical
    in both modes (the reference single-output path uses the exact
    counter)."""
    if counter_mode == 'reference' and n_heads > 1:
        cc = c0 if c0.ndim == o.ndim else c0[None]
        cc = _nearest_spatial_resize(cc, o.shape[1:-1])
        return o / jnp.maximum(float(n_heads) * cc, 1e-6)
    cc = c if c.ndim == o.ndim else c[None]
    return o / jnp.maximum(cc, 1e-6)


def _finalize(out, output_mode: str):
    """Device-side head: 'logits' (parity default), 'prob' (softmax) or
    'label' (argmax uint8 — 8-16x less device->host traffic, the production
    serving mode)."""
    if output_mode == 'prob':
        return jax.nn.softmax(out, -1)
    if output_mode == 'label':
        return jnp.argmax(out, -1).astype(jnp.uint8)
    return out


@partial(jax.jit, static_argnames=('predictor', 'window', 'chunk', 'tta',
                                   'output_mode', 'unroll_accum',
                                   'static_starts', 'static_weights',
                                   'counter_mode', 'dim_starts',
                                   'placement'))
def _sliding_window_full(predictor, ctx, vol: jnp.ndarray,
                         starts: jnp.ndarray, weights: jnp.ndarray,
                         window: Tuple[int, ...],
                         chunk: int, tta: bool, output_mode: str = 'logits',
                         pads: Optional[jnp.ndarray] = None,
                         unroll_accum: bool = False,
                         static_starts=None, static_weights=None,
                         counter_mode: str = 'exact',
                         dim_starts=None, placement: str = 'update'):
    """One-dispatch program per volume: flip variants, sliding-window
    accumulation, overlap division, TTA un-flip averaging and the output
    head all fused — a single host round-trip matters on high-latency
    device links. With ``pads`` (shape bucketing) the counter is zero in
    the padded margin (no window ever writes there); the epsilon keeps the
    division clean and the caller crops the margin away.

    ``dim_starts`` (static per-dim start tuples): counters come in closed
    form (``_analytic_counters``) and the core skips all counter
    accumulation; None falls back to accumulated counters (direct callers
    such as tools/mfu.py)."""
    variants = _make_variants(vol, tta)
    outs, cnts = _sliding_window_jit(predictor, ctx, variants, starts,
                                     weights, window, chunk, pads,
                                     unroll_accum, None,
                                     static_starts, static_weights,
                                     accumulate_counters=dim_starts is None,
                                     placement=placement)
    if dim_starts is not None:
        cnts = _counters_for(predictor, ctx, variants, window, chunk,
                             dim_starts, pads)
    return [_finalize(_unflip_mean(
        _overlap_divide(o, c, cnts[0], len(outs), counter_mode), tta),
        output_mode) for o, c in zip(outs, cnts)]


@partial(jax.jit, static_argnames=('predictor', 'window', 'chunk', 'tta',
                                   'output_mode', 'unroll_accum',
                                   'counter_mode', 'dim_starts',
                                   'placement'))
def _sliding_window_full_batch(predictor, ctx, vols: jnp.ndarray,
                               starts: jnp.ndarray, weights: jnp.ndarray,
                               window: Tuple[int, ...], chunk: int,
                               tta: bool, output_mode: str,
                               pads: Optional[jnp.ndarray] = None,
                               unroll_accum: bool = False,
                               counter_mode: str = 'exact',
                               dim_starts=None, placement: str = 'update'):
    """Batched serving: N same-shape volumes [N, *img, C] in ONE program
    dispatch — the TTA variants of every volume stack into a single
    leading axis (v_num = N x V), so the per-dispatch/link latency that
    dominates serving on high-latency device links amortizes over the
    batch. Outputs match per-volume ``_sliding_window_full`` exactly."""
    n = vols.shape[0]
    v = 4 if tta else 1
    variants = jnp.concatenate(
        [_make_variants(vols[i], tta) for i in range(n)], axis=0)
    outs, cnts = _sliding_window_jit(predictor, ctx, variants, starts,
                                     weights, window, chunk, pads,
                                     unroll_accum, tta_v=v,
                                     accumulate_counters=dim_starts is None,
                                     placement=placement)
    if dim_starts is not None:
        cnts = _counters_for(predictor, ctx, variants, window, chunk,
                             dim_starts, pads, tta_n=v)
    results = []
    for o, c in zip(outs, cnts):
        o = _overlap_divide(o, c, cnts[0], len(outs), counter_mode)
        grouped = o.reshape((n, v) + o.shape[1:])
        merged = jnp.stack([_unflip_mean(grouped[i], tta)
                            for i in range(n)])
        results.append(_finalize(merged, output_mode))
    return results


@partial(jax.jit, static_argnames=('predictor', 'window', 'chunk', 'tta',
                                   'output_mode', 'mesh', 'unroll_accum',
                                   'counter_mode', 'dim_starts',
                                   'placement'))
def _sliding_window_full_sharded(predictor, ctx, vol: jnp.ndarray,
                                 starts: jnp.ndarray, weights: jnp.ndarray,
                                 window: Tuple[int, ...], chunk: int,
                                 tta: bool, output_mode: str, mesh,
                                 pads: Optional[jnp.ndarray] = None,
                                 unroll_accum: bool = False,
                                 counter_mode: str = 'exact',
                                 dim_starts=None, placement: str = 'update'):
    """Multi-device variant of ``_sliding_window_full``: the patch-start
    grid is sharded across the mesh with ``shard_map`` (spatial parallelism,
    SURVEY.md section 5.7) — every device accumulates its windows into a
    local copy of the output volume and one ``psum`` per head over ICI
    merges overlap sums and counters. ``starts``/``weights`` length must be
    a multiple of n_devices * chunk (weight-0 duplicates pad the grid)."""
    try:
        from jax import shard_map
    except ImportError:   # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    axis = mesh.axis_names[0]
    variants = _make_variants(vol, tta)
    if pads is None:
        pads = jnp.zeros((variants.ndim - 2,), jnp.int32)

    analytic = dim_starts is not None

    def local(ctx_l, volume_v, starts_l, weights_l, pads_l):
        outs, cnts = _sliding_window_jit(predictor, ctx_l, volume_v,
                                         starts_l, weights_l, window, chunk,
                                         pads_l, unroll_accum,
                                         accumulate_counters=not analytic,
                                         placement=placement)
        outs = [jax.lax.psum(o, axis) for o in outs]
        if analytic:
            return outs
        cnts = [jax.lax.psum(c, axis) for c in cnts]
        return outs, cnts

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(axis), P(axis), P()),
                   out_specs=(P() if analytic else (P(), P())))
    if analytic:
        outs = fn(ctx, variants, starts, weights, pads)
        # counters are grid-global (the full Cartesian product), computed
        # once in closed form on replicated values — NOT psummed
        cnts = _counters_for(predictor, ctx, variants, window, chunk,
                             dim_starts, pads)
    else:
        outs, cnts = fn(ctx, variants, starts, weights, pads)
    return [_finalize(_unflip_mean(
        _overlap_divide(o, c, cnts[0], len(outs), counter_mode), tta),
        output_mode) for o, c in zip(outs, cnts)]


def _pad_pass_axis(ctx, n_passes: int, pad: int):
    """Pad every ctx leaf carrying the pass axis (leading dim ==
    ``n_passes``) by repeating its last row ``pad`` times — mesh
    divisibility padding; the padded passes' outputs are dropped by the
    caller."""
    def f(l):
        if hasattr(l, 'ndim') and l.ndim >= 1 and l.shape[0] == n_passes:
            arr = jnp.asarray(l)
            return jnp.concatenate(
                [arr, jnp.repeat(arr[-1:], pad, axis=0)], axis=0)
        return l

    return jax.tree_util.tree_map(f, ctx)


def _shard_pass_inputs(mesh, vols, ctx, n_eff: int):
    """Commit the pass-partitioned layout: the volume batch and every ctx
    leaf whose leading dim is ``n_eff`` (the stacked rng keys / stacked
    checkpoint variables) are sharded along the mesh axis; everything else
    is replicated. The passes are independent, so the partitioned batched
    program is collective-free by construction. A ctx leaf that only
    COINCIDENTALLY has leading dim ``n_eff`` still computes correctly —
    committed shardings change layout, never semantics — at a resharding
    cost."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = mesh.axis_names[0]
    passed = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def f(l):
        arr = jnp.asarray(l)
        if arr.ndim >= 1 and arr.shape[0] == n_eff:
            return jax.device_put(arr, passed)
        return jax.device_put(arr, repl)

    return (jax.device_put(vols, passed),
            jax.tree_util.tree_map(f, ctx))


@partial(jax.jit, static_argnames=('predictor', 'tta'))
def _whole_volume_jit(predictor, ctx, vol: jnp.ndarray, tta: bool):
    preds = _as_list(predictor(ctx, _make_variants(vol, tta)))
    return [_unflip_mean(p.astype(jnp.float32), tta) for p in preds]


@partial(jax.jit, static_argnames=('predictor', 'tta', 'output_mode'))
def _whole_volume_batch_jit(predictor, ctx, vols: jnp.ndarray, tta: bool,
                            output_mode: str):
    """N same-shape volumes, whole-volume forward in one dispatch: the TTA
    variants of every volume share one leading axis (group i = rows
    [i*V, (i+1)*V)), mirroring ``_sliding_window_full_batch``."""
    n = vols.shape[0]
    v = 4 if tta else 1
    variants = jnp.concatenate(
        [_make_variants(vols[i], tta) for i in range(n)], axis=0)
    preds = _as_list(predictor(ctx, variants))
    outs = []
    for p in preds:
        g = p.astype(jnp.float32).reshape((n, v) + p.shape[1:])
        merged = jnp.stack([_unflip_mean(g[i], tta) for i in range(n)])
        outs.append(_finalize(merged, output_mode))
    return outs


class Inferer:
    """``Inferer(testing_cfg).run(predictor, ctx, image)``.

    ``predictor(ctx, x)`` maps a channels-last patch batch ``[B, *win, C]``
    (or the whole volume batch when sliding window is off) to logits
    ``[B, *win, K]`` or a list of multi-scale heads. It must be a stable
    hashable callable (module-level function or bound method) — it is a
    static jit argument, while ``ctx`` (model variables, domain label,
    dropout rng, ...) is traced, so swapping checkpoints/domains/rngs reuses
    the compiled program. List-output nets return a list of predictions
    (like the reference Inferer); single-output nets return one array.

    ``image``: numpy/jnp ``[N=1, C, *img]`` channels-first host layout (the
    dataset contract) — transposed once at the device boundary.
    """

    def __init__(self, config: dict, patch_chunk: int = 2, mesh=None):
        self.config = config
        # windows dispatched per scan step ([testing] patch_chunk): larger
        # chunks feed the MXU bigger batches at the cost of accumulator
        # latency hiding; 2 measured best on v5e for the VS recipe
        self.patch_chunk = int(config.get('patch_chunk', patch_chunk))
        # a jax.sharding.Mesh spreads the sliding-window patch grid across
        # its devices (spatial parallelism); None = single-device
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        # 'logits' (reference parity), 'prob', 'label' (device-side argmax,
        # 8-16x less device->host traffic) or 'packed_label' (binary tasks:
        # labels additionally bit-packed on device, another 8x less D2H —
        # on a transfer-bound serving link the label transfer IS the
        # per-volume cost, measured round 2). fetch() unpacks, so
        # 'packed_label' returns byte-identical results to 'label'.
        self.output_mode = config.get('output_mode', 'logits')
        if self.output_mode not in ('logits', 'prob', 'label',
                                    'packed_label'):
            raise ValueError('Undefined output_mode {0}'.format(
                self.output_mode))
        self.packed = self.output_mode == 'packed_label'
        if self.packed and config.get('class_num', 2) > 2:
            # bit-packing needs binary labels; fall back transparently
            self.output_mode = 'label'
            self.packed = False
        # mixed precision: 'bfloat16' casts the volume (and hence all patch
        # activations) to bf16 — callers cast the params via
        # utils/precision.cast_infer_variables; accumulation/TTA averaging
        # stay f32 (see _sliding_window_jit)
        from fpl_plus_tpu.utils.precision import resolve_dtype
        self.compute_dtype = resolve_dtype(config.get('precision', 'float32'))
        # multi-head overlap averaging: 'exact' (per-scale coverage
        # counters, this framework's default) or 'reference' (the reference
        # stack's n_heads-scaled full-res counter, nearest-interpolated per
        # head — infer_func.py:113-140). See _overlap_divide; identical for
        # single-head nets and when stride >= window.
        self.counter_mode = config.get('multiscale_counter', 'exact')
        if self.counter_mode not in ('exact', 'reference'):
            raise ValueError('Undefined multiscale_counter {0}'.format(
                self.counter_mode))
        # closed-form counters (default; see _analytic_counters) vs the
        # legacy accumulated-counter program — an A/B lever for perf
        # attribution on real hardware
        self.analytic_counters = config.get('analytic_counters', True)
        # SCAN-path window placement: 'update' (default — read-add-write
        # carry updates) or 'matmul' (one-hot contractions on the MXU,
        # see _matmul_place). Bit-identical outputs. Measured on v5e
        # (r4_tpu_measure stage F, 100-window overlap grid): current
        # XLA:TPU lowers the carry updates efficiently (~2% of device
        # time), so matmul placement is a NEGATIVE result there (-0.8%
        # device time, 30x the compile) — kept as an A/B lever for
        # future XLA versions / other topologies.
        self.placement = config.get('placement', 'update')
        if self.placement not in ('matmul', 'update'):
            raise ValueError('Undefined placement {0}'.format(
                self.placement))

    def _host_cast(self, arr: np.ndarray) -> np.ndarray:
        """Cast the volume to the serving compute dtype ON HOST, before
        the H2D transfer: bf16 inputs then cross the wire at half the f32
        bytes — the serving wall on a transfer-bound link (BASELINE.md
        round-5 probes: ~7 MB/volume H2D vs ~170 ms device). Numerically
        identical to the on-device convert this replaces: ml_dtypes'
        float32->bfloat16 cast is round-to-nearest-even, same as XLA's."""
        if self.compute_dtype is not None:
            return np.asarray(arr).astype(self.compute_dtype, order='C')
        return arr

    def _resolve_sw(self, img_shape):
        """(use_sw, window, stride) with the reference clamps: window caps
        at the image, stride caps at the window."""
        dim = len(img_shape)
        use_sw = self.config.get('sliding_window_enable', False)
        window = list(self.config.get('sliding_window_size')
                      or [None] * dim)
        stride = list(self.config.get('sliding_window_stride')
                      or [None] * dim)
        for d in range(dim):
            if window[d] is None or window[d] > img_shape[d]:
                window[d] = img_shape[d]
            if stride[d] is None or stride[d] > window[d]:
                stride[d] = window[d]
        return use_sw, window, stride

    @staticmethod
    def _crop_margins(outs, padded_shape, true_shape, lead: int):
        """Crop the zero-counter bucket margin off every head (per-head
        output grids scale with the head's window); ``lead`` = number of
        leading non-spatial axes (0 per-volume, 1 batched)."""
        dim = len(true_shape)
        cropped = []
        for o in outs:
            ratios = [o.shape[lead + d] / padded_shape[d]
                      for d in range(dim)]
            cropped.append(o[(slice(None),) * lead + tuple(
                slice(0, int(true_shape[d] * ratios[d]))
                for d in range(dim))])
        return cropped

    def _finish_outputs(self, outs, batched: bool):
        """Common serving tail: device-side bit-packing (packed mode),
        eager D2H enqueue, and the host-format fetch closure. Per-volume
        results carry a leading [1] axis (the dataset contract); batched
        results keep their [N] axis."""
        pack_shapes = None
        if self.packed:
            pack_shapes = [tuple(o.shape) for o in outs]
            outs = [_packbits_jit(o) for o in outs]
        for o in outs:   # start D2H now so fetch() overlaps later work
            try:
                o.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass

        def _host(o, shp):
            if self.packed:
                return np.unpackbits(np.asarray(o),
                                     count=int(np.prod(shp))).astype(
                    np.uint8).reshape(shp)
            return np.asarray(o)

        def fetch():
            results = []
            for i, o in enumerate(outs):
                arr = _host(o, pack_shapes[i] if self.packed else None)
                if self.output_mode not in ('label', 'packed_label'):
                    arr = np.moveaxis(arr, -1, 1 if batched else 0)
                results.append(arr if batched else arr[None])
            return results[0] if len(results) == 1 else results

        return fetch

    def _bucket_plan(self, true_shape, window, stride):
        """Shape-bucketed window-grid plan for one volume shape: returns
        (pads, starts, weights, chunk, target). ``pads`` is a per-dim
        trailing-pad tuple (None when bucketing is off); ``starts`` is the
        TRUE-shape clamped grid padded with weight-0 duplicates to a
        bucket-constant count that divides chunk * n_devices."""
        dim = len(true_shape)
        bucket = self.config.get('infer_shape_bucket', 16)
        pads = None
        padded_shape = list(true_shape)
        if bucket:
            if bucket in ('auto', True):
                padded_shape = [window[d] + stride[d] * max(
                    -(-(true_shape[d] - window[d]) // stride[d]), 0)
                    for d in range(dim)]
            else:
                b = int(bucket)
                padded_shape = [max(-(-true_shape[d] // b) * b, window[d])
                                for d in range(dim)]
            # pads stays an array signature (zeros included) whenever
            # bucketing is on, so exact-fit and padded volumes of one
            # bucket share the same program
            pads = tuple(padded_shape[d] - true_shape[d]
                         for d in range(dim))
        starts = window_grid(true_shape, window, stride)
        n_true = len(starts)
        chunk = min(self.patch_chunk, n_true)
        n_dev = self.mesh.size if self.mesh is not None else 1
        # the start COUNT is part of the compiled signature too: pad it to
        # the padded-shape grid size (constant per bucket), then to a
        # multiple of chunk * n_devices, with weight-0 duplicates
        target = n_true if pads is None else len(
            window_grid(tuple(padded_shape), window, stride))
        target = max(target, n_true)
        target += (-target) % (chunk * n_dev)
        pad_n = target - n_true
        weights = np.ones(target, np.float32)
        if pad_n:
            reps = -(-pad_n // n_true)
            starts = np.concatenate(
                [starts, np.tile(starts, (reps, 1))[:pad_n]], 0)
            weights[n_true:] = 0.0
        return pads, starts, weights, chunk, target

    def run(self, predictor: Callable, ctx, image,
            tta_override: Optional[bool] = None):
        return self.run_async(predictor, ctx, image, tta_override)()

    def run_async(self, predictor: Callable, ctx, image,
                  tta_override: Optional[bool] = None) -> Callable:
        """Dispatch the full inference program and return a zero-argument
        ``fetch`` closure that blocks for (and formats) the results.

        JAX execution is asynchronous: the returned arrays' device->host
        copies are enqueued immediately (``copy_to_host_async``), so a
        caller can overlap volume i's transfer with volume i+1's compute —
        the production pattern on a transfer-bound serving link, where it
        hides most of the D2H cost. ``run`` is simply
        ``run_async(...)()``."""
        tta_mode = self.config.get('tta_mode', 0)
        if tta_mode not in (0, 1):
            raise ValueError('Undefined tta_mode {0}'.format(tta_mode))
        tta = bool(tta_mode) if tta_override is None else tta_override

        image = np.asarray(image)
        assert image.shape[0] == 1, 'inference processes one volume at a time'
        vol = jnp.asarray(self._host_cast(np.moveaxis(image[0], 0, -1)))
        # packed mode computes plain labels on device and bit-packs after
        # the margin crop (packing must see the final voxel set)
        device_mode = 'label' if self.packed else self.output_mode
        img_shape = vol.shape[:-1]
        dim = len(img_shape)
        use_sw, window, stride = self._resolve_sw(img_shape)

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
            outs = _whole_volume_jit(predictor, ctx, vol, tta)
            outs = [_finalize(o, device_mode) for o in outs]
            if any(pads):
                scale_crops = []
                for o in outs:
                    ratios = [o.shape[d] / vol.shape[d] for d in range(dim)]
                    scale_crops.append(tuple(
                        slice(0, int(img_shape[d] * ratios[d]))
                        for d in range(dim)))
                outs = [o[sc] for o, sc in zip(outs, scale_crops)]
        else:
            # shape bucketing (SURVEY.md section 7.4 hard part 3), ON by
            # default: pad spatial dims so volumes of nearby shape share ONE
            # compiled program (one retrace per bucket instead of per
            # volume shape). EXACT by construction: the window grid stays
            # the TRUE-shape clamped grid (the reference rule,
            # infer_func.py:75-85), so windows never read padded voxels
            # (flip-TTA variants run a pad-shifted copy of the grid), and
            # the padded margin — counter zero — is cropped off.
            # An integer bucket (default 16) pads each dim to its next
            # multiple — bounded accumulator bloat (< bucket voxels/dim),
            # merging typical post-preprocessing shape jitter; 'auto' pads
            # to window + k*stride (zero extra windows, perfect clamp
            # dedup, but up to stride-1 voxels of accumulator padding);
            # 0 disables.
            pads, starts, weights, chunk, target = self._bucket_plan(
                tuple(img_shape), window, stride)
            dims = (dim_start_lists(tuple(img_shape), window, stride)
                    if self.analytic_counters else None)
            if pads is not None and any(pads):
                vol = jnp.pad(vol, [(0, p) for p in pads] + [(0, 0)],
                              mode='edge')   # values are never read
                img_shape = vol.shape[:-1]
            true_shape = tuple(vol.shape[:-1] if pads is None else
                               tuple(vol.shape[d] - pads[d]
                                     for d in range(dim)))
            n_dev = self.mesh.size if self.mesh is not None else 1
            if self.mesh is not None:
                # place inputs on the mesh: variables/volume replicated,
                # the start grid sharded (checkpoint-loaded variables may
                # be committed to one device; device_put is a no-op when
                # placement already matches)
                from jax.sharding import NamedSharding, PartitionSpec as P
                repl = NamedSharding(self.mesh, P())
                grid = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
                pads_arr = None if pads is None else jax.device_put(
                    jnp.asarray(pads, jnp.int32), repl)
                # straight-line accumulation when each device's local
                # update count is small (same rule as single-device)
                unroll = ((target // n_dev) * (4 if tta else 1)
                          <= self.config.get('infer_unroll_max', 256))
                outs = _sliding_window_full_sharded(
                    predictor, jax.device_put(ctx, repl),
                    jax.device_put(vol, repl),
                    jax.device_put(jnp.asarray(starts), grid),
                    jax.device_put(jnp.asarray(weights), grid),
                    tuple(window), chunk, tta, device_mode, self.mesh,
                    pads_arr, unroll, self.counter_mode, dims,
                    self.placement)
            else:
                pads_arr = None if pads is None else jnp.asarray(
                    pads, jnp.int32)
                # straight-line (in-place) accumulation when the total
                # update count is small; large grids keep the scan-carried
                # accumulators (bounded program size)
                unroll = (target * (4 if tta else 1)
                          <= self.config.get('infer_unroll_max', 256))
                # bucketing off -> the program is per-shape anyway, so the
                # window grid can be STATIC: true in-place aligned updates
                # instead of select-lowered traced-offset ones
                st_s = st_w = None
                if pads is None and unroll:
                    st_s = tuple(map(tuple, np.asarray(starts).tolist()))
                    st_w = tuple(float(w) for w in weights)
                outs = _sliding_window_full(predictor, ctx, vol,
                                            jnp.asarray(starts),
                                            jnp.asarray(weights),
                                            tuple(window), chunk, tta,
                                            device_mode, pads_arr,
                                            unroll, st_s, st_w,
                                            self.counter_mode, dims,
                                            self.placement)
            if pads is not None and any(pads):
                outs = self._crop_margins(outs, img_shape, true_shape, 0)
        return self._finish_outputs(outs, batched=False)

    def run_batch(self, predictor: Callable, ctx, images,
                  tta_override: Optional[bool] = None):
        return self.run_batch_async(predictor, ctx, images, tta_override)()

    def run_batch_async(self, predictor: Callable, ctx, images,
                        tta_override: Optional[bool] = None) -> Callable:
        """Batched serving: N SAME-shape volumes ``[N, C, *img]`` through
        ONE sliding-window program dispatch — the TTA variants of every
        volume share a single leading axis, so per-dispatch/link latency
        (the dominant serving cost on high-latency device links, measured
        round 2) amortizes over the batch. Shape bucketing makes
        same-shape batches the common case. Outputs are voxel-identical
        to N ``run_async`` calls; ``fetch()`` returns one ``[N, K, *img]``
        array per head (``[N, *img]`` uint8 in label modes).

        On a device mesh the VOLUME axis partitions across the devices
        (same mechanism as the pass-axis fold: the batch pads to a
        device-count multiple by repeating the last volume, padded outputs
        are dropped, and XLA partitions the one-dispatch program —
        collective-free, each device serving its share of the batch).

        Falls back to pipelined per-volume ``run_async`` when the batch
        has one volume, sliding window is off, or the volume is
        whole-window."""
        images = np.asarray(images)
        n = images.shape[0]
        if n == 0:
            raise ValueError('run_batch needs at least one volume')
        tta_mode = self.config.get('tta_mode', 0)
        if tta_mode not in (0, 1):
            raise ValueError('Undefined tta_mode {0}'.format(tta_mode))
        tta = bool(tta_mode) if tta_override is None else tta_override

        img_shape = images.shape[2:]
        dim = len(img_shape)
        use_sw, window, stride = self._resolve_sw(img_shape)
        whole = all(window[d] >= img_shape[d] for d in range(dim))
        if n == 1 or not use_sw or whole:
            fetches = [self.run_async(predictor, ctx, images[i:i + 1],
                                      tta_override) for i in range(n)]

            def fetch_fallback():
                outs = [f() for f in fetches]
                if isinstance(outs[0], list):
                    return [np.concatenate([o[h] for o in outs], 0)
                            for h in range(len(outs[0]))]
                return np.concatenate(outs, 0)

            return fetch_fallback

        return self._batch_core(predictor, ctx, images, tta, window, stride)

    def _batch_core(self, predictor: Callable, ctx, images, tta: bool,
                    window, stride) -> Callable:
        """Shared batched sliding-window dispatch: ``images [N, C, *img]``
        (host layout) through ONE program; returns the fetch closure with
        batched=True host formatting. On a mesh the volume axis partitions
        across the devices (padded to a device multiple; padded outputs
        dropped)."""
        n = images.shape[0]
        pad_n = 0
        if self.mesh is not None:
            pad_n = (-n) % self.mesh.size
            if pad_n:
                images = np.concatenate(
                    [images, np.repeat(images[-1:], pad_n, axis=0)], axis=0)
        outs = self._batch_core_dev(predictor, ctx, images, tta, window,
                                    stride,
                                    pass_sharded=self.mesh is not None)
        if pad_n:
            outs = [o[:n] for o in outs]
        return self._finish_outputs(outs, batched=True)

    def _batch_core_dev(self, predictor: Callable, ctx, images, tta: bool,
                        window, stride, pass_sharded: bool = False):
        """Device half of ``_batch_core``: dispatch the batched program and
        return the margin-cropped per-head DEVICE arrays ``[N, *img, K]``
        (channels last; still on device so callers can fuse a reduction
        before any transfer). ``pass_sharded`` commits the leading (pass)
        axis of the volume batch and of matching ctx leaves across
        ``self.mesh`` so XLA partitions the program over the passes."""
        n = images.shape[0]
        img_shape = images.shape[2:]
        vols = jnp.asarray(self._host_cast(np.moveaxis(images, 1, -1)))
        device_mode = 'label' if self.packed else self.output_mode
        pads, starts, weights, chunk, target = self._bucket_plan(
            tuple(img_shape), window, stride)
        dims = (dim_start_lists(tuple(img_shape), window, stride)
                if self.analytic_counters else None)
        if pads is not None and any(pads):
            vols = jnp.pad(vols, [(0, 0)] + [(0, p) for p in pads]
                           + [(0, 0)], mode='edge')
        pads_arr = None if pads is None else jnp.asarray(pads, jnp.int32)
        # straight-line accumulation policy for batched programs, set by
        # steady-state A/B on the real chip (tools/r3_tpu_measure.py
        # stage C, equal pipelining depth for every config): unrolled
        # in-place accumulation wins up to ~512 total updates (B=2: 3.90
        # vs 2.40 vol/s scan; B=4: 3.81 ~ 3.82 tie), beyond that XLA's
        # straight-line scheduling degrades and compile time balloons
        # (B=8: 1.68 unrolled / 33-833 s compiles vs 4.28 scan / 50 s),
        # so large batches take the compact scan-carried loop.
        v = 4 if tta else 1
        n_sched = n   # per-device row count drives the unroll budget
        if pass_sharded and self.mesh is not None:
            n_sched = max(1, n // self.mesh.size)
            vols, ctx = _shard_pass_inputs(self.mesh, vols, ctx, n)
        unroll = n_sched * target * v <= 2 * self.config.get(
            'infer_unroll_max', 256)
        outs = _sliding_window_full_batch(
            predictor, ctx, vols, jnp.asarray(starts),
            jnp.asarray(weights), tuple(window), chunk, tta, device_mode,
            pads_arr, unroll, self.counter_mode, dims, self.placement)
        if pads is not None and any(pads):
            outs = self._crop_margins(outs, vols.shape[1:-1],
                                      tuple(img_shape), 1)
        return outs

    def run_passes_async(self, group_predictor: Callable, ctx, image,
                         n_passes: int,
                         tta_override: Optional[bool] = None) -> Callable:
        """Fold N stochastic/ensemble passes over ONE volume into ONE
        program dispatch (SURVEY section 5.7: "6x FPL passes folded into a
        vmapped rng axis") — on a latency-bound serving link the per-volume
        cost IS the dispatch, so this is worth up to N x on the FPL
        uncertainty pass and on ckpt_mode-3 ensembles.

        ``group_predictor(ctx, x)`` must treat its patch batch ``x`` as
        ``n_passes`` equal row-major groups (group i = rows
        ``[i*B/N, (i+1)*B/N)``) and apply pass i's randomness/parameters to
        group i — typically ``jax.vmap`` over a stacked rng-key/params leaf
        in ``ctx`` (see SegmentationAgent._patch_forward_mc/_ens).
        ``fetch()`` returns one ``[N, K, *img]`` array per head, pass i's
        full inference (TTA + sliding window + overlap averaging) at row i
        — voxel-identical to N sequential ``run_async`` calls with the
        per-pass ctx.

        On a device mesh the PASS axis is partitioned across the devices
        (passes are independent, so the SPMD program is collective-free by
        construction): the fold is padded to a device-count multiple by
        repeating the last pass's ctx row — padded outputs are dropped —
        and the volume/ctx leaves are committed with pass-axis shardings,
        letting XLA partition the one-dispatch batched program. A 6-pass
        FPL fold on an 8-device mesh thus runs all passes concurrently."""
        outs = self._passes_dev(group_predictor, ctx, image, n_passes,
                                tta_override)
        return self._finish_outputs(outs, batched=True)

    def _passes_dev(self, group_predictor: Callable, ctx, image,
                    n_passes: int, tta_override: Optional[bool] = None):
        """Device half of ``run_passes_async``: the folded N-pass program's
        per-head DEVICE arrays ``[N, *img, K]`` before any transfer."""
        image = np.asarray(image)
        assert image.shape[0] == 1, 'run_passes folds passes over ONE volume'
        pad_n = 0
        if self.mesh is not None:
            # pass-axis mesh partitioning: pad the fold to a multiple of
            # the device count (XLA partitions only divisible axes); the
            # padded rows repeat the last pass's ctx and are dropped below
            pad_n = (-n_passes) % self.mesh.size
            if pad_n:
                ctx = _pad_pass_axis(ctx, n_passes, pad_n)
        n_eff = n_passes + pad_n
        images = np.repeat(image, n_eff, axis=0)   # [N, C, *img]
        tta_mode = self.config.get('tta_mode', 0)
        tta = bool(tta_mode) if tta_override is None else tta_override
        img_shape = images.shape[2:]
        dim = len(img_shape)
        use_sw, window, stride = self._resolve_sw(img_shape)
        whole = all(window[d] >= img_shape[d] for d in range(dim))
        if use_sw and not whole:
            outs = self._batch_core_dev(group_predictor, ctx, images, tta,
                                        window, stride,
                                        pass_sharded=self.mesh is not None)
            return [o[:n_passes] for o in outs] if pad_n else outs
        # whole-volume fold: autopad like run_async, batched program
        device_mode = 'label' if self.packed else self.output_mode
        vols = jnp.asarray(self._host_cast(np.moveaxis(images, 1, -1)))
        mult = self.config.get('infer_autopad_multiple', 16)
        pads = [(-s) % mult for s in img_shape]
        if any(pads):
            vols = jnp.pad(vols, [(0, 0)] + [(0, p) for p in pads]
                           + [(0, 0)], mode='reflect')
        if self.mesh is not None:
            vols, ctx = _shard_pass_inputs(self.mesh, vols, ctx, n_eff)
        outs = _whole_volume_batch_jit(group_predictor, ctx, vols, tta,
                                       device_mode)
        if any(pads):
            outs = self._crop_margins(outs, vols.shape[1:-1],
                                      tuple(img_shape), 1)
        return [o[:n_passes] for o in outs] if pad_n else outs

    def run_fpl_uncertainty(self, group_predictor: Callable, ctx, image,
                            n_passes: int, margins=None,
                            tta_override: Optional[bool] = None) -> Callable:
        """FPL image-level uncertainty with the whole reduction ON DEVICE:
        the folded N-pass program's main-head logits reduce to TWO scalars
        — ``(vars_sum, boundary_count)`` — so the fetch ships 8 bytes
        instead of N full probability volumes. On the measured
        transfer-bound serving link the map fetch dominates the pass
        (stage B, tools/r3_tpu_measure.py: 6 prob volumes ~ 385 MB ~ 4.5 s
        at link bandwidth vs ~1.2 s of compute), so this is the production
        FPL path; reference formula at agent_seg.py:921-929.

        ``margins`` — optional ``(margin_lower, margin_upper)`` per spatial
        axis: the composed voxel-selection of the host-side inverse
        transform chain (e.g. Pad's inverse crop). The reduction masks to
        the selected region, exactly matching crop-then-reduce because
        variance/entropy are per-voxel. Scalars returned by ``fetch()``:

        - ``vars_sum``  = softmax-prob variance over passes, summed over
          every selected voxel and class (reference ``var.sum()``),
        - ``boundary``  = count of selected voxels whose mean-prob entropy
          term exceeds 0.01 (binary: class-1 term only; multi-class: full
          entropy — agents apply the ``1 if boundary < 50`` fallback)."""
        if self.output_mode not in ('logits',):
            raise ValueError('run_fpl_uncertainty needs output_mode=logits '
                             '(got {0})'.format(self.output_mode))
        outs = self._passes_dev(group_predictor, ctx, image, n_passes,
                                tta_override)
        out = outs[0] if isinstance(outs, (tuple, list)) else outs
        dim = out.ndim - 2
        if margins is None:
            lo = np.zeros(dim, np.int32)
            up = np.zeros(dim, np.int32)
        else:
            lo = np.asarray(margins[0], np.int32)
            up = np.asarray(margins[1], np.int32)
        vars_sum, boundary = _fpl_uncertainty_reduce(
            out, jnp.asarray(lo), jnp.asarray(up))
        for o in (vars_sum, boundary):
            try:
                o.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass

        def fetch():
            return float(vars_sum), int(boundary)

        return fetch

    def run_mc(self, predictor: Callable, ctx_factory: Callable, image,
               rngs: List, tta_override: Optional[bool] = None
               ) -> List[np.ndarray]:
        """MC-dropout passes for FPL filtering: one full (TTA x sliding
        window) inference per rng key, dropout active
        (reference agent_seg.py:897-931 — 6 stochastic passes). The compiled
        program is shared across passes (only ctx changes); all passes are
        dispatched before any result is fetched so the device runs them
        back-to-back while finished outputs stream to the host.

        This is the unfused fallback (and the parity oracle in tests) —
        the production FPL pass folds all passes into one dispatch via
        ``run_passes_async``."""
        fetches = [self.run_async(predictor, ctx_factory(rng), image,
                                  tta_override) for rng in rngs]
        return [fetch() for fetch in fetches]


class GroupedMCPredictor:
    """Group-folded MC-dropout predictor for ``Inferer.run_passes_async`` /
    ``run_fpl_uncertainty``: ``ctx = (variables, domain, rngs[M])`` and the
    patch batch is M row-major groups; group m is forwarded with dropout
    active under rng m (``jax.vmap`` over the key axis — identical masks to
    M separate applies, because each lane draws from its own key at
    unchanged activation shapes). The ONE definition is shared by the
    agent's FPL test stage and by ``bench.py``, so the benchmark measures
    exactly the production computation. Hash/eq key on the wrapped module
    identity so jit program caches reuse compilations across instances."""

    def __init__(self, module):
        self.module = module

    def __hash__(self):
        return id(self.module)

    def __eq__(self, other):
        return (isinstance(other, GroupedMCPredictor)
                and other.module is self.module)

    def __call__(self, ctx, x):
        variables, domain, rngs = ctx
        m = rngs.shape[0]
        xg = x.reshape((m, x.shape[0] // m) + x.shape[1:])

        def one(r, xb):
            out = self.module.apply(variables, xb, domain, False,
                                    use_dropout=True, rngs={'dropout': r})
            return out[0] if isinstance(out, (tuple, list)) else out

        out = jax.vmap(one)(rngs, xg)
        return out.reshape((-1,) + out.shape[2:])
