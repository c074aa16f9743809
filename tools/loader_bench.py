"""Host data-pipeline throughput at recipe scale (VERDICT round-1 item 8).

The reference dedicates 16-32 DataLoader workers per domain to keep a GPU
fed (net_run_dsbn/agent_abstract.py:265,301). This tool measures OUR
pipeline the same way the training loop consumes it: the dual-domain VS
generator recipe's exact train transform chain (NormalizeWithMeanStd ->
Pad -> RandomCrop(fg-focus) -> RandomFlip -> LabelToProbability,
vs_t1s_g.cfg [dataset]) over real NIfTI volumes, batch 4 per domain,
``DataLoader.stream()`` (the endless sampler the agent uses), sweeping
worker counts.

The shipped fixture set has 2 train volumes per domain; the manifest is
tiled to 40 entries per domain so worker scheduling, shuffling and the
prefetch window behave as at recipe scale (each item still decodes its
NIfTI from disk — the OS page cache is shared by both frameworks' loaders,
as it would be in a real run).

Prints one JSON line per (workers, domain-pair) config:
batches/sec for the PAIR of loaders consumed in lockstep (one batch from
each domain per train step, like train_valid) and the implied max train
steps/sec the host can sustain.

Usage: python tools/loader_bench.py [--reps 50]
"""
import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

REF = '/root/reference'

DOMAIN_ROWS = {
    1: [('dataset/ceT1_train/img/vs_gk_99_t1.nii.gz',
         'dataset/ceT1_train/lab/vs_gk_99_t1.nii.gz'),
        ('dataset/fake_data/ceT1-hrT2-ceT1_cc/vs_gk_99_t1.nii.gz',
         'dataset/ceT1_train/lab/vs_gk_99_t1.nii.gz')],
    2: [('dataset/fake_data/ceT1-hrT2_cyc/vs_gk_99_t1.nii.gz',
         'dataset/ceT1_train/lab/vs_gk_99_t1.nii.gz'),
        ('dataset/hrT2_train/img/vs_gk_98_t2.nii.gz',
         'dataset/hrT2_train/lab/vs_gk_98_t2.nii.gz')],
}

DATA_CFG = {
    'task': 'segmentation', 'class_num': 2, 'modal_num': 1,
    'train_transform': ['NormalizeWithMeanStd', 'Pad', 'RandomCrop',
                        'RandomFlip', 'LabelToProbability'],
    'normalizewithmeanstd_channels': [0],
    'pad_output_size': [28, 128, 128], 'pad_ceil_mode': False,
    'randomcrop_output_size': [28, 128, 128],
    'randomcrop_foreground_focus': True,
    'randomcrop_foreground_ratio': 0.5,
    'randomcrop_mask_label': [1, 2],
    'randomflip_flip_depth': False, 'randomflip_flip_height': True,
    'randomflip_flip_width': True,
    'labeltoprobability_class_num': 2,
}


def build_loader(domain: int, tile: int, batch_size: int, workers: int,
                 tmpdir: str, seed: int, cache_bytes: int = 0,
                 transform_cache: bool = True):
    from fpl_plus_tpu.agents.agent_abstract import Compose
    from fpl_plus_tpu.io.dataset import NiftyDataset
    from fpl_plus_tpu.io.loader import DataLoader
    from fpl_plus_tpu.transforms.trans_dict import TransformDict

    rows = DOMAIN_ROWS[domain]
    csv_path = os.path.join(tmpdir, 'train_{0}.csv'.format(domain))
    with open(csv_path, 'w') as f:
        f.write('image,label\n')
        for i in range(tile):
            img, lab = rows[i % len(rows)]
            f.write('{0},{1}\n'.format(img, lab))
    transform = Compose([TransformDict[name](dict(DATA_CFG))
                         for name in DATA_CFG['train_transform']])
    ds = NiftyDataset(root_dir=REF, csv_file=csv_path, modal_num=1,
                      with_label=True, transform=transform,
                      cache_bytes=cache_bytes,
                      transform_cache=transform_cache)
    return DataLoader(ds, batch_size=batch_size, shuffle=True,
                      num_workers=workers, seed=seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=50)
    ap.add_argument('--batch-size', type=int, default=4)
    ap.add_argument('--tile', type=int, default=40)
    ap.add_argument('--workers', type=int, nargs='*',
                    default=[0, 4, 8, 16, 32])
    ap.add_argument('--cache-gb', type=float, nargs='*', default=[0, 2.0])
    ap.add_argument('--no-transform-cache', action='store_true',
                    help='decoded-volume cache only (round-2 behavior); '
                         'default measures the deterministic-prefix cache')
    args = ap.parse_args()

    tmpdir = tempfile.mkdtemp(prefix='fplx_loader_bench_')
    for cache_gb in args.cache_gb:
      for workers in args.workers:
        loaders = [build_loader(d, args.tile, args.batch_size, workers,
                                tmpdir, seed=11 + d,
                                cache_bytes=int(cache_gb * (1 << 30)),
                                transform_cache=not args.no_transform_cache)
                   for d in (1, 2)]
        streams = [ld.stream() for ld in loaders]
        # warmup: one full epoch per stream, so the measurement is the
        # steady state the 40k-iteration recipe actually runs in (the
        # cache-miss epoch is 0.025% of a real run; mixing it in buried
        # the hit-path number)
        for st in streams:
            for _ in range(max(1, args.tile // args.batch_size)):
                next(st)
        t0 = time.time()
        for _ in range(args.reps):
            for st in streams:   # one batch per domain per train step
                batch = next(st)
                assert batch['image'].shape[0] == args.batch_size
        dt = time.time() - t0
        pair_per_sec = args.reps / dt
        print(json.dumps({
            'workers_per_domain': workers, 'cache_gb': cache_gb,
            'transform_cache': not args.no_transform_cache,
            'batch_pairs_per_sec': round(pair_per_sec, 3),
            'ms_per_step_host': round(1000.0 / pair_per_sec, 1)}),
            flush=True)
        for ld in loaders:
            ld.shutdown()


if __name__ == '__main__':
    main()
