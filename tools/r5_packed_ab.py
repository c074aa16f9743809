"""Round-5 packed-vs-label serving A/B (pipelined, interleaved).

The agent serves binary tasks with ``output_mode = packed_label`` by
default (device-side bit-packing: 218 KB/volume D2H instead of 1.74 MB —
agents/agent_seg.py:210). Round 4's sequential probes measured packed
FASTER (4.50 vs 4.23 vol/s); the round-5 bench's sequential probes
measured it SLOWER (3.04 vs 4.08) in the same sitting where the
interleaved arms were self-consistent — suspicion: in the depth-1
pipelined loop the label D2H already overlaps the next volume's compute,
so packing saves hidden bytes while its extra ``_packbits_jit`` dispatch
(one more ~27 ms link RTT) sits on the critical path.

This tool interleaves the two arms (bench.py protocol) so the question
gets a link-phase-fair answer, plus device_ms per arm.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/r5_packed_ab.py
"""
import json
import os
import statistics
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def prepare(module, variables, img, output_mode):
    import jax.numpy as jnp
    import time
    from fpl_plus_tpu.engine.infer import Inferer
    import bench

    predictor = bench._predictor_for(module)
    inferer = Inferer(dict(bench.SW_CFG, output_mode=output_mode),
                      patch_chunk=2)
    ctx = (variables, jnp.int32(1))
    inferer.run(predictor, ctx, img)

    def measure():
        n_rep = 8
        t0 = time.time()
        pending = None
        for _ in range(n_rep):
            fetch = inferer.run_async(predictor, ctx, img)
            if pending is not None:
                pending()
            pending = fetch
        pending()
        return n_rep / (time.time() - t0)

    def traced():
        inferer.run(predictor, ctx, img)

    return {'measure': measure, 'traced': traced, 'traced_reps': 4,
            'volumes_per_rep': 1}


def main():
    import bench
    from fpl_plus_tpu.models.registry import create_network, init_network
    from fpl_plus_tpu.utils.trace_metrics import traced_device_ms

    module = create_network(bench.NET_CFG)
    params, batch_stats = init_network(module, bench.NET_CFG)
    variables = {'params': params, 'batch_stats': batch_stats}
    img = bench.load_volume_raw()
    img = ((img - img.mean()) / (img.std() + 1e-6))[None].astype(np.float32)

    arms = {m: prepare(module, variables, img, m)
            for m in ('label', 'packed_label')}
    samples = {m: [] for m in arms}
    for i in range(4):
        for m, arm in arms.items():
            vps = arm['measure']()
            samples[m].append(vps)
            print('round {0} {1}: {2:.3f} vol/s'.format(i, m, vps),
                  flush=True)
    device_ms = {m: traced_device_ms(a['traced'], a['traced_reps'], m)
                 for m, a in arms.items()}
    out = {m: {'wall_vps': round(statistics.median(samples[m]), 3),
               'wall_samples': [round(v, 3) for v in samples[m]],
               'device_ms': round(device_ms[m], 1) if device_ms[m] else None}
           for m in arms}
    print(json.dumps(out, indent=2))
    with open('/tmp/r5_packed_ab.json', 'w') as f:
        json.dump(out, f, indent=2)


if __name__ == '__main__':
    main()
