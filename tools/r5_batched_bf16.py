"""Round-5 serving A/B: does batched serving stack with bf16?

Round-5 state (BASELINE.md): per-volume bf16 is the best recorded serving
number (5.15 vol/s wall, 161.0 ms device) and batched-f32 B=8 has the best
device time (134.6 ms/volume) — but the two levers have never been
COMBINED. If bf16 cuts the batched program's conv time the way it cuts the
per-volume program's, batched-bf16 should set a new device floor AND ride
half the H2D bytes (Inferer._host_cast ships bf16 wire bytes).

Protocol: same rules as bench.py (VERDICT r4 #1) — all arms built+warmed
first, wall samples interleaved round-robin so every arm sees every link
phase, then per-arm device_ms from the profiler trace (link-immune).

Arms:
  * per-volume bf16  (the current headline-best, as the anchor)
  * batched f32 B=8  (the current device-floor holder)
  * batched bf16 B=8 (the combination under test)

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
  python tools/r5_batched_bf16.py [--samples 3]

Reference counterpart: none (the reference serves one volume per loop,
f32, CPU — infer_func.py:96-111); this tunes the TPU-only serving policy.
"""
import argparse
import json
import os
import statistics
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--samples', type=int, default=3)
    ap.add_argument('--out', default='/tmp/r5_batched_bf16.json')
    args = ap.parse_args()

    import bench
    from fpl_plus_tpu.models.registry import create_network, init_network
    from fpl_plus_tpu.utils.trace_metrics import traced_device_ms

    module = create_network(bench.NET_CFG)
    params, batch_stats = init_network(module, bench.NET_CFG)
    variables = {'params': params, 'batch_stats': batch_stats}

    img = bench.load_volume_raw()
    img = ((img - img.mean()) / (img.std() + 1e-6))[None].astype(np.float32)

    print('building + warming arms (compiles)...', flush=True)
    arms = {
        'per_volume_bf16': bench.prepare_inference(
            module, variables, img, 'bfloat16'),
        'batched_f32_b8': bench.prepare_batched_serving(
            module, variables, img, b=8, precision='float32'),
        'batched_bf16_b8': bench.prepare_batched_serving(
            module, variables, img, b=8, precision='bfloat16'),
    }

    samples = {name: [] for name in arms}
    for i in range(args.samples):
        for name, arm in arms.items():
            vps = arm['measure']()
            samples[name].append(vps)
            print('round {0} {1}: {2:.3f} vol/s'.format(i, name, vps),
                  flush=True)

    device_ms = {}
    for name, arm in arms.items():
        ms = traced_device_ms(arm['traced'], arm['traced_reps'], name)
        device_ms[name] = (round(ms / arm['volumes_per_rep'], 1)
                           if ms is not None else None)

    result = {
        name: {'wall_vps': round(statistics.median(samples[name]), 3),
               'wall_samples': [round(v, 3) for v in samples[name]],
               'device_ms_per_volume': device_ms[name]}
        for name in arms}
    print(json.dumps(result, indent=2))
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=2)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
