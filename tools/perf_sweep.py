"""Real-chip perf sweep over the headline inference/train configurations.

Emits one JSON line per configuration (flushed immediately, so a partial
run still yields data):

* inference: {shape bucket 16, bucket 0} x {f32, bf16} x {pallas_fused
  off/on} — volumes/sec of the sliding-window + 4-flip-TTA program on the
  real VS volume, all passes dispatched before fetching (device-bound
  number, no host pipeline effects);
* train: {f32, bf16} dual-domain joint step, batch 4+4 — sec/step.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_sweep.py \
        [--only infer|train] [--reps 8]
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


def emit(rec):
    print(json.dumps(rec), flush=True)


def bench_infer_cfg(module, variables, img, bucket, precision, reps):
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import Inferer
    from fpl_plus_tpu.utils.precision import cast_infer_variables

    cfg = {'sliding_window_enable': True,
           'sliding_window_size': [28, 128, 128],
           'sliding_window_stride': [28, 128, 128],
           'tta_mode': 1, 'class_num': 2, 'output_mode': 'label',
           'infer_shape_bucket': bucket, 'precision': precision}

    def predictor(ctx, x):
        out = module.apply(ctx[0], x, ctx[1], False)
        return out[0] if isinstance(out, (tuple, list)) else out

    inferer = Inferer(cfg, patch_chunk=2)
    ctx = (cast_infer_variables(variables, precision), jnp.int32(1))
    t0 = time.time()
    inferer.run(predictor, ctx, img)      # compile + warm
    compile_s = time.time() - t0
    t0 = time.time()
    fetches = [inferer.run_async(predictor, ctx, img) for _ in range(reps)]
    for f in fetches:
        f()
    sec = (time.time() - t0) / reps
    return 1.0 / sec, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', default=None, choices=[None, 'infer', 'train'])
    ap.add_argument('--reps', type=int, default=8)
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
    from fpl_plus_tpu.models.registry import create_network, init_network

    img = bench.load_volume_raw()
    img = ((img - img.mean()) / (img.std() + 1e-6))[None].astype(np.float32)

    base_module = create_network(bench.NET_CFG)
    params, batch_stats = init_network(base_module, bench.NET_CFG)
    variables = {'params': params, 'batch_stats': batch_stats}
    fused_module = create_network(dict(bench.NET_CFG, pallas_fused=True))

    if args.only in (None, 'infer'):
        for module, fused in ((base_module, False), (fused_module, True)):
            for bucket in (16, 0):
                for precision in ('float32', 'bfloat16'):
                    if fused and bucket == 0:
                        continue   # fused x bucketing interaction: bucket 16
                    try:
                        vps, comp = bench_infer_cfg(module, variables, img,
                                                    bucket, precision,
                                                    args.reps)
                        emit({'kind': 'infer', 'bucket': bucket,
                              'precision': precision, 'pallas_fused': fused,
                              'volumes_per_sec': round(vps, 4),
                              'compile_s': round(comp, 1)})
                    except Exception as exc:   # keep sweeping
                        emit({'kind': 'infer', 'bucket': bucket,
                              'precision': precision, 'pallas_fused': fused,
                              'error': repr(exc)})

    if args.only in (None, 'infer'):
        # accumulation-overhead probe: same sliding-window program with a
        # near-zero-FLOP predictor — measures the scan/extract/scatter-add
        # machinery alone. If this is a tiny fraction of the full program,
        # the fori_loop accumulator is NOT the bottleneck (VERDICT item 6).
        class _TinyPredictor:
            def __call__(self, ctx, x):
                return jnp.concatenate([x, -x], axis=-1)

            def __hash__(self):
                return hash('tiny-predictor')

            def __eq__(self, other):
                return isinstance(other, _TinyPredictor)

        from fpl_plus_tpu.engine.infer import Inferer
        for bucket in (16, 0):
            try:
                cfg = {'sliding_window_enable': True,
                       'sliding_window_size': [28, 128, 128],
                       'sliding_window_stride': [28, 128, 128],
                       'tta_mode': 1, 'class_num': 2,
                       'output_mode': 'label',
                       'infer_shape_bucket': bucket}
                inferer = Inferer(cfg, patch_chunk=2)
                tiny = _TinyPredictor()
                inferer.run(tiny, (), img)
                t0 = time.time()
                fetches = [inferer.run_async(tiny, (), img)
                           for _ in range(args.reps)]
                for f in fetches:
                    f()
                emit({'kind': 'overhead', 'bucket': bucket,
                      'sec_per_volume': round(
                          (time.time() - t0) / args.reps, 4)})
            except Exception as exc:
                emit({'kind': 'overhead', 'bucket': bucket,
                      'error': repr(exc)})

    if args.only in (None, 'train'):
        import jax.tree_util as jtu
        from fpl_plus_tpu.engine.optim import create_optimizer
        from fpl_plus_tpu.engine.train import (create_train_state,
                                               make_train_step)
        from fpl_plus_tpu.losses import SegLossDict
        from fpl_plus_tpu.utils.precision import resolve_dtype

        for precision in ('float32', 'bfloat16'):
            try:
                optimizer = create_optimizer(
                    {'optimizer': 'Adam', 'learning_rate': 1e-4,
                     'momentum': 0.9, 'weight_decay': 0.0},
                    {'lr_scheduler': None})
                state = create_train_state(
                    jtu.tree_map(jnp.copy, variables['params']),
                    jtu.tree_map(jnp.copy, variables['batch_stats']),
                    optimizer)
                loss_calc = SegLossDict['DiceLoss']({})
                step = make_train_step(
                    base_module.apply, loss_calc, optimizer, num_domains=2,
                    joint=True, fpl_uda=True,
                    compute_dtype=resolve_dtype(precision))
                rs = np.random.RandomState(0)

                def batch():
                    x = rs.normal(size=(4, 28, 128, 128, 1)).astype(
                        np.float32)
                    y = (x[..., 0] > 0.5).astype(np.int32)
                    return {'image': jnp.asarray(x),
                            'label_prob': jnp.asarray(
                                np.eye(2, dtype=np.float32)[y]),
                            'pixel_weight': jnp.asarray(
                                rs.uniform(0, 1, x.shape).astype(
                                    np.float32)),
                            'image_weight': jnp.asarray(
                                rs.uniform(0.5, 1, (4,)).astype(
                                    np.float32))}

                batches = (batch(), batch())
                rng = jax.random.PRNGKey(0)
                t0 = time.time()
                state, metrics = step(state, batches, rng)
                float(metrics['loss'])   # true sync (value fetch)
                comp = time.time() - t0
                t0 = time.time()
                for i in range(10):
                    state, metrics = step(state, batches,
                                          jax.random.fold_in(rng, i))
                float(metrics['loss'])
                emit({'kind': 'train', 'precision': precision,
                      'sec_per_step': round((time.time() - t0) / 10, 4),
                      'compile_s': round(comp, 1)})
            except Exception as exc:
                emit({'kind': 'train', 'precision': precision,
                      'error': repr(exc)})


if __name__ == '__main__':
    main()
