"""Headline benchmark: sliding-window + flip-TTA inference volumes/sec.

Runs the flagship UNet2D5_dsbn (the exact `[network]` of the reference's
config_dual/data_vs/vs_t1s_g.cfg: 22.1M used params) over a real-size VS
hrT2 volume (40 x 160 x 272) with the recipe's [testing] settings (window
[28,128,128], stride [28,128,128], 4-flip TTA) and prints ONE JSON line.

Baseline: the reference implementation's own Inferer + UNet2D5_dsbn on
PyTorch CPU (8 threads) measured on this machine at 154.9 s/volume
(0.006455 volumes/sec) for the identical volume/config — see
BASELINE.md / SURVEY.md section 6 (the repo publishes no numbers of its own).
"""
import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')

import numpy as np

REFERENCE_VOLUME = '/root/reference/dataset/hrT2_test/vs_gk_9_t2.nii.gz'
BASELINE_VOL_PER_SEC = 0.006455   # reference torch CPU, same volume+config


def load_volume() -> np.ndarray:
    if os.path.exists(REFERENCE_VOLUME):
        from fpl_plus_tpu.io.image_io import load_image_as_nd_array
        img = load_image_as_nd_array(REFERENCE_VOLUME)['data_array']
    else:
        img = np.random.RandomState(0).normal(
            size=(1, 40, 160, 272)).astype(np.float32)
    img = (img - img.mean()) / (img.std() + 1e-6)
    return img[None].astype(np.float32)   # [1, C, D, H, W]


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.environ['JAX_COMPILATION_CACHE_DIR'])
    except Exception:
        pass
    from functools import partial
    from fpl_plus_tpu.models.registry import create_network, init_network
    from fpl_plus_tpu.engine.infer import Inferer

    net_cfg = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
               'in_chns': 1, 'feature_chns': [32, 64, 128, 256, 512],
               'conv_dims': [2, 2, 3, 3, 3],
               'dropout': [0.0, 0.0, 0.3, 0.4, 0.5], 'bilinear': False}
    module = create_network(net_cfg)
    params, batch_stats = init_network(module, net_cfg)
    variables = {'params': params, 'batch_stats': batch_stats}

    # output_mode='label': the serving path — device-side argmax, the
    # final uint8 label volume is what crosses to the host (the reference
    # equivalently argmaxes on CPU in save_outputs after its Inferer.run)
    test_cfg = {'sliding_window_enable': True,
                'sliding_window_size': [28, 128, 128],
                'sliding_window_stride': [28, 128, 128],
                'tta_mode': 1, 'class_num': 2, 'output_mode': 'label'}

    def predictor(ctx, x):
        out = module.apply(ctx[0], x, ctx[1], False)
        return out[0] if isinstance(out, (tuple, list)) else out

    inferer = Inferer(test_cfg, patch_chunk=2)
    img = load_volume()
    ctx = (variables, jnp.int32(1))

    inferer.run(predictor, ctx, img)          # warmup / compile
    # depth-1 pipeline (the serving pattern): volume i's device->host
    # transfer overlaps volume i+1's compute; end-to-end time over n_rep
    # volumes, so the number stays an honest steady-state throughput
    n_rep = 8
    t0 = time.time()
    pending = None
    for _ in range(n_rep):
        fetch = inferer.run_async(predictor, ctx, img)
        if pending is not None:
            pending()
        pending = fetch
    pending()
    dt = (time.time() - t0) / n_rep
    vps = 1.0 / dt
    print(json.dumps({'metric': 'sliding_window_inference',
                      'value': round(vps, 4), 'unit': 'volumes/sec',
                      'vs_baseline': round(vps / BASELINE_VOL_PER_SEC, 1)}))


if __name__ == '__main__':
    main()
