"""Round-3 TPU measurement session (single v5e chip over the axon tunnel).

Measures, printing one JSON line per result (flushed immediately so a
long compile never hides earlier numbers):

  stage A  dual-domain train step: sequential vs FUSED domain forward
           (engine/train.py fused_domains), f32 and bf16 — the VERDICT #8
           MFU lever.
  stage B  FPL uncertainty pass: 6 sequential MC-dropout dispatches
           (run_mc) vs the folded single dispatch (run_passes_async) —
           VERDICT #2.
  stage C  batched serving run_batch at B in {2, 4, 8} vs the pipelined
           per-volume path — VERDICT #7.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/r3_tpu_measure.py [A|B|C ...]
"""
import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')

import numpy as np

sys.path.insert(0, '/root/repo')

NET_CFG = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
           'in_chns': 1, 'feature_chns': [32, 64, 128, 256, 512],
           'conv_dims': [2, 2, 3, 3, 3],
           'dropout': [0.0, 0.0, 0.3, 0.4, 0.5], 'bilinear': False}

REFERENCE_VOLUME = '/root/reference/dataset/hrT2_test/vs_gk_9_t2.nii.gz'


def emit(**kw):
    print(json.dumps(kw), flush=True)


def build():
    import jax
    from fpl_plus_tpu.utils.jaxcache import harden_compilation_cache
    harden_compilation_cache()
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    from fpl_plus_tpu.models.registry import create_network, init_network
    module = create_network(NET_CFG)
    params, batch_stats = init_network(module, NET_CFG)
    return module, {'params': params, 'batch_stats': batch_stats}


def load_volume():
    from fpl_plus_tpu.io.image_io import load_image_as_nd_array
    img = load_image_as_nd_array(REFERENCE_VOLUME)['data_array']
    return ((img - img.mean()) / (img.std() + 1e-6))[None].astype(np.float32)


def stage_a(module, variables):
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.optim import create_optimizer
    from fpl_plus_tpu.engine.train import create_train_state, make_train_step
    from fpl_plus_tpu.losses import SegLossDict
    from fpl_plus_tpu.utils.precision import resolve_dtype

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
    for fused in (False, True):
        for precision in ('float32', 'bfloat16'):
            optimizer = create_optimizer(
                {'optimizer': 'Adam', 'learning_rate': 1e-4,
                 'momentum': 0.9, 'weight_decay': 0.0},
                {'lr_scheduler': None})
            state = create_train_state(
                jax.tree_util.tree_map(jnp.copy, variables['params']),
                jax.tree_util.tree_map(jnp.copy, variables['batch_stats']),
                optimizer)
            step = make_train_step(
                module.apply, SegLossDict['DiceLoss']({}), optimizer,
                num_domains=2, joint=True, fpl_uda=True,
                compute_dtype=resolve_dtype(precision), fused_domains=fused)
            rng = jax.random.PRNGKey(0)
            t0 = time.time()
            state, metrics = step(state, batches, rng)
            float(metrics['loss'])
            compile_s = time.time() - t0
            times = []
            for _ in range(3):
                n_rep = 10
                t0 = time.time()
                for _ in range(n_rep):
                    rng, sub = jax.random.split(rng)
                    state, metrics = step(state, batches, sub)
                float(metrics['loss'])
                times.append((time.time() - t0) / n_rep)
            emit(stage='A', fused=fused, precision=precision,
                 sec_per_step=round(float(np.median(times)), 4),
                 samples=[round(t, 4) for t in times],
                 compile_s=round(compile_s, 1))
            del state, step


def _plain_pred(module):
    def predictor(ctx, x):
        variables, domain, rng = ctx
        if rng is not None:
            out = module.apply(variables, x, domain, False,
                               use_dropout=True, rngs={'dropout': rng})
        else:
            out = module.apply(variables, x, domain, False)
        return out[0] if isinstance(out, (tuple, list)) else out
    return predictor


def stage_b(module, variables, img):
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import GroupedMCPredictor
    from fpl_plus_tpu.engine.infer import Inferer

    cfg = {'sliding_window_enable': True,
           'sliding_window_size': [28, 128, 128],
           'sliding_window_stride': [28, 128, 128],
           'tta_mode': 1, 'class_num': 2, 'output_mode': 'prob'}
    inferer = Inferer(cfg, patch_chunk=2)
    dom = jnp.int32(1)
    keys = list(jax.random.split(jax.random.PRNGKey(7), 6))

    plain = _plain_pred(module)
    t0 = time.time()
    inferer.run_mc(plain, lambda r: (variables, dom, r), img, keys)
    emit(stage='B', path='run_mc_6x', first_s=round(time.time() - t0, 2))
    times = []
    for _ in range(3):
        t0 = time.time()
        inferer.run_mc(plain, lambda r: (variables, dom, r), img, keys)
        times.append(time.time() - t0)
    emit(stage='B', path='run_mc_6x',
         sec_per_volume=round(float(np.median(times)), 3),
         samples=[round(t, 3) for t in times])

    mc = GroupedMCPredictor(module)
    ctx = (variables, dom, jnp.stack(keys))
    t0 = time.time()
    inferer.run_passes_async(mc, ctx, img, 6)()
    emit(stage='B', path='fused_1x', compile_s=round(time.time() - t0, 1))
    times = []
    for _ in range(3):
        t0 = time.time()
        inferer.run_passes_async(mc, ctx, img, 6)()
        times.append(time.time() - t0)
    emit(stage='B', path='fused_1x',
         sec_per_volume=round(float(np.median(times)), 3),
         samples=[round(t, 3) for t in times])


def stage_b2(module, variables, img):
    """Production FPL pass: folded 6-pass program + ON-DEVICE uncertainty
    reduction (8-byte fetch) — pipelined one-deep like the agent."""
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import GroupedMCPredictor
    from fpl_plus_tpu.engine.infer import Inferer

    cfg = {'sliding_window_enable': True,
           'sliding_window_size': [28, 128, 128],
           'sliding_window_stride': [28, 128, 128],
           'tta_mode': 1, 'class_num': 2, 'output_mode': 'logits'}
    inferer = Inferer(cfg, patch_chunk=2)
    dom = jnp.int32(1)
    keys = jnp.stack(jax.random.split(jax.random.PRNGKey(7), 6))
    mc = GroupedMCPredictor(module)
    ctx = (variables, dom, keys)
    margins = ([0, 0, 0], [0, 0, 0])
    t0 = time.time()
    inferer.run_fpl_uncertainty(mc, ctx, img, 6, margins)()
    emit(stage='B2', path='device_reduced',
         compile_s=round(time.time() - t0, 1))
    times = []
    for _ in range(3):
        n_rep = 4
        t0 = time.time()
        pending = None
        for _ in range(n_rep):
            fetch = inferer.run_fpl_uncertainty(mc, ctx, img, 6, margins)
            if pending is not None:
                pending()
            pending = fetch
        pending()
        times.append((time.time() - t0) / n_rep)
    emit(stage='B2', path='device_reduced',
         sec_per_volume=round(float(np.median(times)), 3),
         samples=[round(t, 3) for t in times])


def stage_c(module, variables, img):
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import Inferer

    cfg = {'sliding_window_enable': True,
           'sliding_window_size': [28, 128, 128],
           'sliding_window_stride': [28, 128, 128],
           'tta_mode': 1, 'class_num': 2, 'output_mode': 'label'}
    inferer = Inferer(cfg, patch_chunk=2)

    def predictor(ctx, x):
        out = module.apply(ctx[0], x, ctx[1], False)
        return out[0] if isinstance(out, (tuple, list)) else out

    ctx = (variables, jnp.int32(1))
    # per-volume pipelined baseline
    inferer.run(predictor, ctx, img)
    times = []
    for _ in range(3):
        n_rep = 8
        t0 = time.time()
        pending = None
        for _ in range(n_rep):
            fetch = inferer.run_async(predictor, ctx, img)
            if pending is not None:
                pending()
            pending = fetch
        pending()
        times.append(n_rep / (time.time() - t0))
    emit(stage='C', path='per_volume_pipelined',
         vols_per_sec=round(float(np.median(times)), 3))

    for policy, unroll_max in (('unroll', 256), ('scan', 0)):
      for b in (2, 4, 8):
        bcfg = dict(cfg, infer_unroll_max=unroll_max)
        binf = Inferer(bcfg, patch_chunk=2)
        imgs = np.concatenate([img] * b, axis=0)
        t0 = time.time()
        binf.run_batch(predictor, ctx, imgs)
        emit(stage='C', path='batch', policy=policy, b=b,
             compile_s=round(time.time() - t0, 1))
        times = []
        for _ in range(3):
            # steady-state: fixed pipelining depth (reps) for every b so
            # large batches get the same dispatch/transfer overlap the
            # per-volume baseline enjoys
            reps = 4
            t0 = time.time()
            pending = None
            for _ in range(reps):
                fetch = binf.run_batch_async(predictor, ctx, imgs)
                if pending is not None:
                    pending()
                pending = fetch
            pending()
            times.append(reps * b / (time.time() - t0))
        emit(stage='C', path='batch', policy=policy, b=b,
             vols_per_sec=round(float(np.median(times)), 3))


def main():
    stages = [s.upper() for s in sys.argv[1:]] or ['A', 'B', 'C']
    module, variables = build()
    emit(event='built', stages=stages)
    img = load_volume() if set(stages) & {'B', 'B2', 'C'} else None
    if 'A' in stages:
        stage_a(module, variables)
    if 'B' in stages:
        stage_b(module, variables, img)
    if 'B2' in stages:
        stage_b2(module, variables, img)
    if 'C' in stages:
        stage_c(module, variables, img)
    emit(event='done')


if __name__ == '__main__':
    main()
