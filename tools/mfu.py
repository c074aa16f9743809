"""MFU accounting for the two hot loops (VERDICT round-1 item 3).

Counts the XLA-reported FLOPs of (a) the full sliding-window + flip-TTA
inference program and (b) the dual-domain train step via
``jit.lower(...).compile().cost_analysis()``, measures steady-state wall
time for each, and reports achieved TFLOP/s and model FLOP utilisation
against the chip's MXU peak.

Peak reference: TPU v5e (v5 lite) = 197 TFLOP/s bf16; f32 operands run
through the same bf16 MXU passes under the default matmul precision, so the
same peak applies to the f32 programs. Override with --peak-tflops.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/mfu.py [--precision bf16]
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

PEAKS_TFLOPS = {
    'TPU v5 lite': 197.0,      # v5e bf16
    'TPU v5': 459.0,           # v5p bf16
    'TPU v4': 275.0,
}


def detect_peak(default=197.0):
    import jax
    kind = jax.devices()[0].device_kind
    for k, v in PEAKS_TFLOPS.items():
        if kind.startswith(k):
            return v, kind
    return default, kind


def flops_of(lowered):
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get('flops', float('nan')))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--precision', default='float32',
                    choices=['float32', 'bfloat16'])
    ap.add_argument('--peak-tflops', type=float, default=None)
    ap.add_argument('--patch-chunk', type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:
        from fpl_plus_tpu.utils.jaxcache import harden_compilation_cache
        harden_compilation_cache()
        jax.config.update('jax_compilation_cache_dir',
                          os.environ['JAX_COMPILATION_CACHE_DIR'])
    except Exception:
        pass

    import bench
    from fpl_plus_tpu.engine.infer import Inferer
    from fpl_plus_tpu.models.registry import create_network, init_network
    from fpl_plus_tpu.utils.precision import cast_infer_variables

    peak, kind = (args.peak_tflops, 'override') if args.peak_tflops \
        else detect_peak()
    peak_flops = peak * 1e12

    module = create_network(bench.NET_CFG)
    params, batch_stats = init_network(module, bench.NET_CFG)
    variables = {'params': params, 'batch_stats': batch_stats}
    img = bench.load_volume_raw()
    img = ((img - img.mean()) / (img.std() + 1e-6))[None].astype(np.float32)

    # ---- inference program ------------------------------------------------
    test_cfg = {'sliding_window_enable': True,
                'sliding_window_size': [28, 128, 128],
                'sliding_window_stride': [28, 128, 128],
                'tta_mode': 1, 'class_num': 2, 'output_mode': 'label',
                'precision': args.precision}
    infer_vars = cast_infer_variables(variables, args.precision)

    def predictor(ctx, x):
        out = module.apply(ctx[0], x, ctx[1], False)
        return out[0] if isinstance(out, (tuple, list)) else out

    inferer = Inferer(test_cfg, patch_chunk=args.patch_chunk)
    ctx = (infer_vars, jnp.int32(1))
    inferer.run(predictor, ctx, img)   # compile + warm

    # lower the identical program for its FLOP count
    from fpl_plus_tpu.engine import infer as infer_mod
    vol = jnp.asarray(np.moveaxis(img[0], 0, -1))
    if inferer.compute_dtype is not None:
        vol = vol.astype(inferer.compute_dtype)
    window = tuple(test_cfg['sliding_window_size'])
    bucket = 16
    padded = [max(-(-s // bucket) * bucket, window[d])
              for d, s in enumerate(vol.shape[:-1])]
    pads = tuple(p - s for p, s in zip(padded, vol.shape[:-1]))
    if any(pads):
        vol_p = jnp.pad(vol, [(0, p) for p in pads] + [(0, 0)], mode='edge')
    else:
        vol_p = vol
    starts = infer_mod.window_grid(vol.shape[:-1], window, window)
    n_true = len(starts)
    target = len(infer_mod.window_grid(vol_p.shape[:-1], window, window))
    target = max(target, n_true)
    target += (-target) % args.patch_chunk
    weights = np.ones(target, np.float32)
    if target > n_true:
        reps = -(-(target - n_true) // n_true)
        starts = np.concatenate(
            [starts, np.tile(starts, (reps, 1))[:target - n_true]], 0)
        weights[n_true:] = 0.0
    lowered = infer_mod._sliding_window_full.lower(
        predictor, ctx, vol_p, jnp.asarray(starts), jnp.asarray(weights),
        window, args.patch_chunk, True, 'label',
        jnp.asarray(pads, jnp.int32))
    infer_flops = flops_of(lowered)

    n_rep = 8
    t0 = time.time()
    fetches = [inferer.run_async(predictor, ctx, img) for _ in range(n_rep)]
    for f in fetches:
        f()
    infer_sec = (time.time() - t0) / n_rep

    # ---- train step --------------------------------------------------------
    import jax.tree_util as jtu
    from fpl_plus_tpu.engine.optim import create_optimizer
    from fpl_plus_tpu.engine.train import create_train_state, make_train_step
    from fpl_plus_tpu.losses import SegLossDict
    from fpl_plus_tpu.utils.precision import resolve_dtype

    optimizer = create_optimizer(
        {'optimizer': 'Adam', 'learning_rate': 1e-4, 'momentum': 0.9,
         'weight_decay': 0.0}, {'lr_scheduler': None})
    state = create_train_state(
        jtu.tree_map(jnp.copy, variables['params']),
        jtu.tree_map(jnp.copy, variables['batch_stats']), optimizer)
    loss_calc = SegLossDict['DiceLoss']({})
    step = make_train_step(module.apply, loss_calc, optimizer,
                           num_domains=2, joint=True, fpl_uda=True,
                           compute_dtype=resolve_dtype(args.precision))
    rs = np.random.RandomState(0)

    def batch():
        x = rs.normal(size=(4, 28, 128, 128, 1)).astype(np.float32)
        y = (x[..., 0] > 0.5).astype(np.int32)
        return {'image': jnp.asarray(x),
                'label_prob': jnp.asarray(np.eye(2, dtype=np.float32)[y]),
                'pixel_weight': jnp.asarray(
                    rs.uniform(0, 1, x.shape).astype(np.float32)),
                'image_weight': jnp.asarray(
                    rs.uniform(0.5, 1, (4,)).astype(np.float32))}

    batches = (batch(), batch())
    rng = jax.random.PRNGKey(0)
    train_flops = flops_of(step.lower(state, batches, rng))
    state, metrics = step(state, batches, rng)
    float(metrics['loss'])   # value fetch: block_until_ready can lie on
    n_rep = 10               # the tunneled backend; a host read cannot
    t0 = time.time()
    for i in range(n_rep):
        state, metrics = step(state, batches, jax.random.fold_in(rng, i))
    float(metrics['loss'])
    train_sec = (time.time() - t0) / n_rep

    report = {
        'device': kind, 'peak_tflops': peak, 'precision': args.precision,
        'inference': {
            'flops_per_volume': infer_flops, 'sec_per_volume': infer_sec,
            'achieved_tflops': infer_flops / infer_sec / 1e12,
            'mfu': infer_flops / infer_sec / peak_flops},
        'train_step': {
            'flops_per_step': train_flops, 'sec_per_step': train_sec,
            'achieved_tflops': train_flops / train_sec / 1e12,
            'mfu': train_flops / train_sec / peak_flops},
    }
    print(json.dumps(report))


if __name__ == '__main__':
    main()
