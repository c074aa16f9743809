"""Round-5 FPL-pass precision A/B: f32 vs bf16, interleaved, on-chip.

The FPL uncertainty pass (6 MC-dropout x sliding-window+TTA forwards
folded into one dispatch, two-scalar fetch — `Inferer.run_fpl_uncertainty`)
is the 4th pipeline stage and the last serving-family program still
benchmarked f32-only. The agent already honors `[testing] precision`
for it (agent_seg.py casts the checkpoint; the Inferer casts the volume
host-side), and the uncertainty reduction is f32 by construction
(`_fpl_uncertainty_reduce` casts the folded logits before softmax) — so
bf16 here changes conv compute only.

Protocol: bench.py rules — both arms warmed, wall samples interleaved
round-robin, per-arm device_ms from the profiler trace. Both arms run
the SAME dropout rng keys, so the scalar outputs (vars_sum, boundary)
differ only by numerics; the tool reports their relative deltas. (No
selection-parity claim: that would need trained weights — this is the
numerics + perf measurement.)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/r5_fpl_bf16.py
"""
import json
import os
import statistics
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def prepare(module, variables, img, precision):
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import GroupedMCPredictor, Inferer
    from fpl_plus_tpu.utils.precision import cast_infer_variables
    import bench

    inferer = Inferer(dict(bench.SW_CFG, output_mode='logits',
                           precision=precision), patch_chunk=2)
    pred = GroupedMCPredictor(module)
    keys = jnp.stack(jax.random.split(jax.random.PRNGKey(7), 6))
    ctx = (cast_infer_variables(variables, precision), jnp.int32(1), keys)
    margins = ([0, 0, 0], [0, 0, 0])
    scalars = inferer.run_fpl_uncertainty(pred, ctx, img, 6, margins)()

    def measure():
        n_rep = 4
        t0 = time.time()
        pending = None
        for _ in range(n_rep):
            fetch = inferer.run_fpl_uncertainty(pred, ctx, img, 6, margins)
            if pending is not None:
                pending()
            pending = fetch
        pending()
        return n_rep / (time.time() - t0)

    def traced():
        inferer.run_fpl_uncertainty(pred, ctx, img, 6, margins)()

    return {'measure': measure, 'traced': traced, 'traced_reps': 2,
            'volumes_per_rep': 1, 'scalars': scalars}


def main():
    import bench
    from fpl_plus_tpu.models.registry import create_network, init_network
    from fpl_plus_tpu.utils.trace_metrics import traced_device_ms

    module = create_network(bench.NET_CFG)
    params, batch_stats = init_network(module, bench.NET_CFG)
    variables = {'params': params, 'batch_stats': batch_stats}
    img = bench.load_volume_raw()
    img = ((img - img.mean()) / (img.std() + 1e-6))[None].astype(np.float32)

    print('building + warming arms (bf16 compiles fresh)...', flush=True)
    arms = {p: prepare(module, variables, img, p)
            for p in ('float32', 'bfloat16')}
    samples = {p: [] for p in arms}
    for i in range(3):
        for p, arm in arms.items():
            vps = arm['measure']()
            samples[p].append(vps)
            print('round {0} {1}: {2:.3f} vol/s'.format(i, p, vps),
                  flush=True)
    device_ms = {p: traced_device_ms(a['traced'], a['traced_reps'],
                                     'fpl_' + p)
                 for p, a in arms.items()}
    v32, b32 = arms['float32']['scalars']
    v16, b16 = arms['bfloat16']['scalars']
    out = {p: {'wall_vps': round(statistics.median(samples[p]), 3),
               'wall_samples': [round(v, 3) for v in samples[p]],
               'device_ms': round(device_ms[p], 1) if device_ms[p] else None,
               'vars_sum': arms[p]['scalars'][0],
               'boundary': arms[p]['scalars'][1]}
           for p in arms}
    out['deltas'] = {
        'vars_sum_rel': abs(v16 - v32) / max(abs(v32), 1e-12),
        'boundary_rel': abs(b16 - b32) / max(abs(b32), 1)}
    print(json.dumps(out, indent=2))
    with open('/tmp/r5_fpl_bf16.json', 'w') as f:
        json.dump(out, f, indent=2)


if __name__ == '__main__':
    main()
