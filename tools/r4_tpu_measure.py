"""Round-4 real-chip measurement session.

Stages (each prints JSON lines; run with
``PYTHONPATH=/root/repo:/root/.axon_site python tools/r4_tpu_measure.py [stages]``):

* A — serving A/B, interleaved in ONE session: analytic-counter program vs
  the round-3 accumulated-counter program, flagship config (window = stride
  = [28,128,128], 4-flip TTA, label mode, bucket 16), depth-1 pipelined.
  Answers VERDICT r4 #2 (machinery cut) with the r3 configuration as the
  in-session control, immune to tunnel-phase drift.
* P — the bench.py probe block (link rtt, d2h bandwidth, machinery vps,
  packed-label vps): attributes the serving wall to link vs program
  (VERDICT r4 #1).
* C — train-step MFU data (VERDICT r4 #8): fused bf16 dual-domain step
  wall + XLA-counted flops, then a profiler trace whose top-k ops by
  self-time are summarized, then a stem micro-benchmark (1 vs 8 input
  channels on the first conv level).
* D — DEVICE-side counter A/B (VERDICT r4 #2's literal criterion):
  profiler-trace the analytic vs accumulated flagship serving programs
  and report the median on-device module execution time per dispatch
  (the "XLA Modules" lane of the chrome trace) — unlike wall vol/s this
  is immune to tunnel phase and host load, so it measures the
  program-side machinery cut directly.
"""
import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NET_CFG = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
           'in_chns': 1, 'feature_chns': [32, 64, 128, 256, 512],
           'conv_dims': [2, 2, 3, 3, 3],
           'dropout': [0.0, 0.0, 0.3, 0.4, 0.5], 'bilinear': False}
REFERENCE_VOLUME = '/root/reference/dataset/hrT2_test/vs_gk_9_t2.nii.gz'


def emit(**kw):
    print(json.dumps(kw), flush=True)


def load_img():
    if os.path.exists(REFERENCE_VOLUME):
        from fpl_plus_tpu.io.image_io import load_image_as_nd_array
        img = load_image_as_nd_array(REFERENCE_VOLUME)['data_array']
    else:
        img = np.random.RandomState(0).normal(
            size=(1, 40, 160, 272)).astype(np.float32)
    return ((img - img.mean()) / (img.std() + 1e-6))[None].astype(np.float32)


def build_net():
    from fpl_plus_tpu.models.registry import create_network, init_network
    module = create_network(NET_CFG)
    params, batch_stats = init_network(module, NET_CFG)
    return module, {'params': params, 'batch_stats': batch_stats}


def pipeline_vps(inferer, predictor, ctx, img, n_rep=8):
    t0 = time.time()
    pending = None
    for _ in range(n_rep):
        fetch = inferer.run_async(predictor, ctx, img)
        if pending is not None:
            pending()
        pending = fetch
    pending()
    return n_rep / (time.time() - t0)


def stage_a(module, variables, img):
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import Inferer

    def predictor(ctx, x):
        out = module.apply(ctx[0], x, ctx[1], False)
        return out[0] if isinstance(out, (tuple, list)) else out

    base = {'sliding_window_enable': True,
            'sliding_window_size': [28, 128, 128],
            'sliding_window_stride': [28, 128, 128],
            'tta_mode': 1, 'class_num': 2, 'output_mode': 'label'}
    ctx = (variables, jnp.int32(1))
    inf_new = Inferer(dict(base), patch_chunk=2)
    inf_old = Inferer(dict(base, analytic_counters=False), patch_chunk=2)
    # warm both programs before any timing
    t0 = time.time()
    inf_new.run(predictor, ctx, img)
    emit(stage='A', event='compiled_analytic', sec=round(time.time() - t0, 1))
    t0 = time.time()
    inf_old.run(predictor, ctx, img)
    emit(stage='A', event='compiled_accum', sec=round(time.time() - t0, 1))
    # interleaved rounds: new, old, new, old ... median of 3 each
    news, olds = [], []
    for _ in range(3):
        news.append(pipeline_vps(inf_new, predictor, ctx, img))
        olds.append(pipeline_vps(inf_old, predictor, ctx, img))
    emit(stage='A', config='flagship label-mode serving',
         analytic_vps=round(float(np.median(news)), 3),
         accum_vps=round(float(np.median(olds)), 3),
         analytic_samples=[round(v, 3) for v in news],
         accum_samples=[round(v, 3) for v in olds])


def stage_p(module, variables, img):
    from bench import bench_probes
    emit(stage='P', probes=bench_probes(module, variables, img))


def stage_c(module, variables):
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.optim import create_optimizer
    from fpl_plus_tpu.engine.train import create_train_state, make_train_step
    from fpl_plus_tpu.losses import SegLossDict
    from fpl_plus_tpu.utils.precision import resolve_dtype

    optimizer = create_optimizer(
        {'optimizer': 'Adam', 'learning_rate': 1e-4, 'momentum': 0.9,
         'weight_decay': 0.0}, {'lr_scheduler': None})
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, variables['params']),
        jax.tree_util.tree_map(jnp.copy, variables['batch_stats']),
        optimizer)
    loss_calc = SegLossDict['DiceLoss']({})
    step = make_train_step(module.apply, loss_calc, optimizer,
                           num_domains=2, joint=True, fpl_uda=True,
                           compute_dtype=resolve_dtype('bfloat16'))
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
    flops = float('nan')
    try:
        cost = step.lower(state, batches, rng).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get('flops', float('nan')))
    except Exception as exc:
        emit(stage='C', note='cost_analysis failed', error=str(exc)[:150])
    state, metrics = step(state, batches, rng)
    float(metrics['loss'])
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(10):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batches, sub)
        float(metrics['loss'])
        times.append((time.time() - t0) / 10)
    sec = float(np.median(times))
    emit(stage='C', step='fused bf16 dual-domain batch 4+4',
         sec_per_step=round(sec, 4), xla_tflop=round(flops / 1e12, 2),
         achieved_tflops=round(flops / sec / 1e12, 1),
         mfu_pct_v5e=round(100 * flops / sec / 197e12, 1),
         samples=[round(t, 4) for t in times])

    # profiler trace: top self-time ops
    trace_dir = '/tmp/r4trace'
    try:
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batches, sub)
        float(metrics['loss'])
        jax.profiler.stop_trace()
        emit(stage='C', event='trace_written', dir=trace_dir)
    except Exception as exc:
        emit(stage='C', note='profiler trace failed', error=str(exc)[:150])

    # stem micro-benchmark: conv FLOP efficiency at 1 vs 8 input channels
    # (the 2.5D stem runs 2D convs on [N*D, H, W, C]; in_c=1 may leave the
    # MXU contracting a size-9 dim after im2col: 3x3x1)
    import flax.linen as nn

    for in_c in (1, 8):
        class Stem(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(32, (3, 3), use_bias=False)(x)
                x = nn.Conv(32, (3, 3), use_bias=False)(x)
                return x

        stem = Stem()
        x = jnp.asarray(rs.normal(
            size=(4 * 28, 128, 128, in_c)).astype(jnp.bfloat16))
        vs = stem.init(jax.random.PRNGKey(0), x)
        fwd = jax.jit(lambda v, x: stem.apply(v, x).sum())
        float(fwd(vs, x))
        t0 = time.time()
        for _ in range(20):
            float(fwd(vs, x))
        sec = (time.time() - t0) / 20
        emit(stage='C', micro='stem2d', in_c=in_c, sec=round(sec, 5))


def _module_durations_us(trace_root):
    """Median on-device duration (us) per XLA module execution, from the
    chrome trace: events on 'XLA Modules' threads of a TPU device process
    (one event per program dispatch; children on 'XLA Ops' are NOT summed,
    so nesting cannot double-count)."""
    import glob
    import gzip

    paths = glob.glob(os.path.join(
        trace_root, 'plugins', 'profile', '*', '*.trace.json.gz'))
    if not paths:
        return {}
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        data = json.load(f)
    events = data['traceEvents']
    proc_name = {}
    thread_name = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            proc_name[e['pid']] = e['args']['name']
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            thread_name[(e['pid'], e['tid'])] = e['args']['name']
    per_module = {}
    for e in events:
        if e.get('ph') != 'X':
            continue
        pid, tid = e.get('pid'), e.get('tid')
        if 'XLA Modules' not in thread_name.get((pid, tid), ''):
            continue
        if 'TPU' not in proc_name.get(pid, '') \
                and 'device' not in proc_name.get(pid, '').lower():
            continue
        per_module.setdefault(e['name'].split('(')[0], []).append(
            float(e['dur']))
    return {name: {'median_us': round(float(np.median(durs)), 1),
                   'n': len(durs)}
            for name, durs in per_module.items()}


def _op_totals_us(trace_root, top_k=18):
    """Aggregate on-device op self-time from the chrome trace's 'XLA Ops'
    lane (TPU device process): events grouped by digit-stripped op name,
    summed over the whole trace. The lane is flat (one event per op
    execution), so sums equal device-busy time. Returns
    (total_us, [(name, us, count)] top_k by time)."""
    import glob
    import gzip
    import re

    paths = glob.glob(os.path.join(
        trace_root, 'plugins', 'profile', '*', '*.trace.json.gz'))
    if not paths:
        return 0.0, []
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        data = json.load(f)
    events = data['traceEvents']
    proc_name, thread_name = {}, {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            proc_name[e['pid']] = e['args']['name']
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            thread_name[(e['pid'], e['tid'])] = e['args']['name']
    agg = {}
    total = 0.0
    for e in events:
        if e.get('ph') != 'X':
            continue
        pid, tid = e.get('pid'), e.get('tid')
        if 'XLA Ops' not in thread_name.get((pid, tid), ''):
            continue
        if 'TPU' not in proc_name.get(pid, '') \
                and 'device' not in proc_name.get(pid, '').lower():
            continue
        name = re.sub(r'[.\d]+$', '', e['name'])
        dur = float(e['dur'])
        total += dur
        us, n = agg.get(name, (0.0, 0))
        agg[name] = (us + dur, n + 1)
    top = sorted(((k, v[0], v[1]) for k, v in agg.items()),
                 key=lambda t: -t[1])[:top_k]
    return total, [(k, round(us, 0), n) for k, us, n in top]


def stage_e(module, variables, img):
    """Per-op device-time breakdown of the flagship serving program,
    f32 vs bf16 arms — decides whether the 171 ms device program (stage D)
    is conv-bound (bf16 is the lever) or placement/machinery-bound."""
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import Inferer
    from fpl_plus_tpu.utils.precision import cast_infer_variables

    def predictor(ctx, x):
        out = module.apply(ctx[0], x, ctx[1], False)
        return out[0] if isinstance(out, (tuple, list)) else out

    base = {'sliding_window_enable': True,
            'sliding_window_size': [28, 128, 128],
            'sliding_window_stride': [28, 128, 128],
            'tta_mode': 1, 'class_num': 2, 'output_mode': 'label'}
    arms = {
        'f32': (Inferer(dict(base), patch_chunk=2),
                (variables, jnp.int32(1))),
        'bf16': (Inferer(dict(base, precision='bfloat16'), patch_chunk=2),
                 (cast_infer_variables(variables, 'bfloat16'),
                  jnp.int32(1))),
    }
    n_rep = 5
    for name, (inf, ctx) in arms.items():
        t0 = time.time()
        np.asarray(inf.run(predictor, ctx, img))   # warm/compile
        emit(stage='E', arm=name, event='compiled',
             sec=round(time.time() - t0, 1))
        trace_dir = '/tmp/r4trace_e_' + name
        jax.profiler.start_trace(trace_dir)
        for _ in range(n_rep):
            np.asarray(inf.run(predictor, ctx, img))
        jax.profiler.stop_trace()
        mods = _module_durations_us(trace_dir)
        total, top = _op_totals_us(trace_dir)
        emit(stage='E', arm=name, modules=mods,
             device_busy_us_per_volume=round(total / n_rep, 0),
             top_ops_us_total=[{'op': k, 'us': us, 'n': n}
                               for k, us, n in top])


def stage_f(module, variables):
    """Scan-path placement A/B (round-4 `placement` lever): a LARGE
    overlapping window grid (stride = window/2, 100 windows x 4 TTA = 400
    updates > unroll cap) runs the lax.scan accumulation path, where
    traced-start carry updates lower to select fusions + carry copies —
    vs one-hot matmul placement (_matmul_place). Reports wall vol/s and
    the traced device time per volume for both arms."""
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import Inferer

    def predictor(ctx, x):
        out = module.apply(ctx[0], x, ctx[1], False)
        return out[0] if isinstance(out, (tuple, list)) else out

    img = np.random.RandomState(1).normal(
        size=(1, 1, 64, 224, 320)).astype(np.float32)
    base = {'sliding_window_enable': True,
            'sliding_window_size': [28, 128, 128],
            'sliding_window_stride': [14, 64, 64],
            'tta_mode': 1, 'class_num': 2, 'output_mode': 'label'}
    ctx = (variables, jnp.int32(1))
    arms = {'matmul': Inferer(dict(base), patch_chunk=2),
            'update': Inferer(dict(base, placement='update'),
                              patch_chunk=2)}
    for name, inf in arms.items():
        t0 = time.time()
        np.asarray(inf.run(predictor, ctx, img))
        emit(stage='F', arm=name, event='compiled',
             sec=round(time.time() - t0, 1))
    out = {}
    for name, inf in arms.items():
        vps = pipeline_vps(inf, predictor, ctx, img, n_rep=4)
        trace_dir = '/tmp/r4trace_f_' + name
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            np.asarray(inf.run(predictor, ctx, img))
        jax.profiler.stop_trace()
        mods = _module_durations_us(trace_dir)
        total, top = _op_totals_us(trace_dir, top_k=8)
        sw = sum(v['median_us'] for k, v in mods.items()
                 if 'sliding_window' in k)
        out[name] = sw
        emit(stage='F', arm=name, wall_vps=round(vps, 3),
             device_us_per_volume=round(sw, 1),
             top_ops_us_total=[{'op': k, 'us': us, 'n': n}
                               for k, us, n in top])
    if len(out) == 2 and out['update']:
        emit(stage='F', config='overlap grid 100 windows, scan path',
             matmul_us=round(out['matmul'], 1),
             update_us=round(out['update'], 1),
             device_program_cut_pct=round(
                 100 * (1 - out['matmul'] / out['update']), 1))


def stage_d(module, variables, img):
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import Inferer

    def predictor(ctx, x):
        out = module.apply(ctx[0], x, ctx[1], False)
        return out[0] if isinstance(out, (tuple, list)) else out

    base = {'sliding_window_enable': True,
            'sliding_window_size': [28, 128, 128],
            'sliding_window_stride': [28, 128, 128],
            'tta_mode': 1, 'class_num': 2, 'output_mode': 'label'}
    ctx = (variables, jnp.int32(1))
    arms = {'analytic': Inferer(dict(base), patch_chunk=2),
            'accum': Inferer(dict(base, analytic_counters=False),
                             patch_chunk=2)}
    out = {}
    for name, inf in arms.items():
        np.asarray(inf.run(predictor, ctx, img))   # warm/compile
        trace_dir = '/tmp/r4trace_d_' + name
        jax.profiler.start_trace(trace_dir)
        for _ in range(5):
            np.asarray(inf.run(predictor, ctx, img))
        jax.profiler.stop_trace()
        mods = _module_durations_us(trace_dir)
        emit(stage='D', arm=name, modules=mods)
        swmods = {k: v for k, v in mods.items() if 'sliding_window' in k}
        if swmods:
            out[name] = sum(v['median_us'] for v in swmods.values())
    if len(out) == 2:
        emit(stage='D', config='flagship label-mode serving, device time',
             analytic_us_per_volume=round(out['analytic'], 1),
             accum_us_per_volume=round(out['accum'], 1),
             device_program_cut_pct=round(
                 100 * (1 - out['analytic'] / out['accum']), 1))


def main():
    stages = set((sys.argv[1] if len(sys.argv) > 1 else 'APC').upper())
    import jax
    emit(event='backend', devices=str(jax.devices()))
    module, variables = build_net()
    img = load_img()
    if 'A' in stages:
        stage_a(module, variables, img)
    if 'P' in stages:
        stage_p(module, variables, img)
    if 'C' in stages:
        stage_c(module, variables)
    if 'D' in stages:
        stage_d(module, variables, img)
    if 'E' in stages:
        stage_e(module, variables, img)
    if 'F' in stages:
        stage_f(module, variables)


if __name__ == '__main__':
    main()
