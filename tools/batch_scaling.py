"""Train-step batch-scaling probe (single v5e over the axon tunnel).

The flagship recipe trains at the reference's batch 4+4 (vs_t1s_g.cfg
[training], reference net_run_dsbn/agent_seg.py:336-372 hot loop). A TPU
chip with 16 GB HBM can hold much larger steps, and small-channel convs
gain MXU efficiency from a larger batch dimension — this probe measures
the fused bf16 dual-domain step at per-domain batch {4, 8, 16} and
reports sec/step, samples/s, and MFU from XLA-counted FLOPs, so
production recipes know what batch scaling buys on real hardware
(sub-linear step time = free MFU; OOM/linear = stop).

One JSON line per measurement (flushed immediately — a long tunnel
compile never hides earlier numbers).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/batch_scaling.py [B|BxA ...]

``BxA`` runs batch B/domain with grad_accum_steps=A (one scan-accumulated
optimizer update over A microbatches) — measures whether accumulation
reaches effective batch B*A at the per-sample throughput of batch B,
dodging XLA's recompute-for-memory penalty on one huge batch.
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

PEAK_TFLOPS = 197.0   # v5e bf16


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    def parse_spec(tok):
        if 'x' in tok:
            b, a = tok.split('x')
            return int(b), int(a)
        return int(tok), 1

    batch_sizes = [parse_spec(t) for t in sys.argv[1:]] or \
        [(4, 1), (8, 1), (16, 1)]
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.utils.jaxcache import harden_compilation_cache
    harden_compilation_cache()
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    from fpl_plus_tpu.engine.optim import create_optimizer
    from fpl_plus_tpu.engine.train import create_train_state, make_train_step
    from fpl_plus_tpu.losses import SegLossDict
    from fpl_plus_tpu.models.registry import create_network, init_network
    from fpl_plus_tpu.utils.precision import resolve_dtype

    module = create_network(NET_CFG)
    params, batch_stats = init_network(module, NET_CFG)
    emit(event='built', batch_sizes=batch_sizes,
         backend=jax.default_backend())
    rs = np.random.RandomState(0)

    for b, accum in batch_sizes:
        def batch(b=b):
            x = rs.normal(size=(b, 28, 128, 128, 1)).astype(np.float32)
            y = (x[..., 0] > 0.5).astype(np.int32)
            return {'image': jnp.asarray(x),
                    'label_prob': jnp.asarray(np.eye(2, dtype=np.float32)[y]),
                    'pixel_weight': jnp.asarray(
                        rs.uniform(0, 1, x.shape).astype(np.float32)),
                    'image_weight': jnp.asarray(
                        rs.uniform(0.5, 1, (b,)).astype(np.float32))}

        optimizer = create_optimizer(
            {'optimizer': 'Adam', 'learning_rate': 1e-4,
             'momentum': 0.9, 'weight_decay': 0.0},
            {'lr_scheduler': None})
        state = create_train_state(
            jax.tree_util.tree_map(jnp.copy, params),
            jax.tree_util.tree_map(jnp.copy, batch_stats), optimizer)
        step = make_train_step(
            module.apply, SegLossDict['DiceLoss']({}), optimizer,
            num_domains=2, joint=True, fpl_uda=True,
            compute_dtype=resolve_dtype('bfloat16'), fused_domains=True,
            accum_steps=accum)
        if accum > 1:
            micros = [(batch(), batch()) for _ in range(accum)]
            batches = tuple(
                {k: jnp.stack([m[d][k] for m in micros])
                 for k in micros[0][d]} for d in range(2))
        else:
            batches = (batch(), batch())
        rng = jax.random.PRNGKey(0)
        try:
            flops = float('nan')
            try:
                cost = step.lower(state, batches, rng).compile(
                    ).cost_analysis()
                if isinstance(cost, list):
                    cost = cost[0]
                flops = float(cost.get('flops', float('nan')))
                # XLA's cost analysis counts a lax.scan body ONCE; the
                # accum program executes it `accum` times — scale so the
                # tflops/achieved/mfu columns stay comparable across rows
                flops *= max(accum, 1)
            except Exception as exc:   # cost analysis is best-effort
                emit(batch_per_domain=b, note='cost_analysis failed',
                     error=str(exc)[:120])
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
                float(metrics['loss'])   # fetch-true sync
                times.append((time.time() - t0) / n_rep)
            sec = float(np.median(times))
            mfu = (flops / sec) / (PEAK_TFLOPS * 1e12)
            emit(batch_per_domain=b, accum_steps=accum,
                 sec_per_step=round(sec, 4),
                 samples_per_s=round(2 * b * accum / sec, 2),
                 tflops=round(flops / 1e12, 2),
                 achieved_tflops=round(flops / sec / 1e12, 1),
                 mfu_pct=round(100 * mfu, 1),
                 samples=[round(t, 4) for t in times],
                 compile_s=round(compile_s, 1))
        except Exception as exc:
            emit(batch_per_domain=b, event='failed', error=str(exc)[:300])
        del state, step, batches


if __name__ == '__main__':
    main()
