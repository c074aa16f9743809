"""eva_main-compatible evaluation reports.

Replicates the reference's evaluation driver
(PyMIC/pymic/util/evaluation_seg_train.py:263-582): for each of
``metric_1``/``metric_2``, score every (ground-truth, segmentation) pair
listed in the test/valid pair CSVs and write
``{seg_root}/{split}_{organ}_{metric}_all.csv`` with per-case rows plus
mean/std rows. The segmentation root is
``output_dir/(basename(ckpt_save_dir) + '_' + stem(test_csv))`` exactly as
in the reference (:295-300).
"""
from __future__ import annotations

import csv
import logging
import os

import numpy as np
import pandas as pd

from fpl_plus_tpu.io.image_io import load_image_as_nd_array
from fpl_plus_tpu.metrics.seg_metrics import get_multi_class_evaluation_score
from fpl_plus_tpu.utils.image_process import convert_label


def _seg_root(config) -> str:
    output_dir = config['testing']['output_dir']
    ckpt_dir = config['training']['ckpt_save_dir'].split('/')[-1]
    subset = config['dataset']['test_csv'].split('/')[-1][:-4]
    return os.path.join(output_dir, ckpt_dir + '_' + subset)


def _evaluate_pairs(config, metric, pair_csv, split_name, seg_root):
    eval_cfg = config['evaluation']
    label_list = eval_cfg['label_list']
    if not isinstance(label_list, (list, tuple)):
        label_list = [label_list]
    label_fuse = eval_cfg.get('label_fuse', False)
    organ_name = eval_cfg['organ_name']
    gt_root = eval_cfg['ground_truth_folder_root']
    g_convert_s = eval_cfg.get('ground_truth_label_convert_source', None)
    g_convert_t = eval_cfg.get('ground_truth_label_convert_target', None)
    s_convert_s = eval_cfg.get('segmentation_label_convert_source', None)
    s_convert_t = eval_cfg.get('segmentation_label_convert_target', None)

    items = pd.read_csv(pair_csv)
    score_all, rows = [], []
    for i in range(len(items)):
        gt_name = items.iloc[i, 0]
        seg_name = items.iloc[i, 1]
        g_dict = load_image_as_nd_array(os.path.join(gt_root, gt_name))
        s_dict = load_image_as_nd_array(os.path.join(seg_root, seg_name))
        g_volume, s_volume = g_dict['data_array'], s_dict['data_array']
        spacing = s_dict['spacing']
        if g_convert_s is not None and g_convert_t is not None:
            g_volume = convert_label(g_volume, g_convert_s, g_convert_t)
        if s_convert_s is not None and s_convert_t is not None:
            s_volume = convert_label(s_volume, s_convert_s, s_convert_t)
        scores = get_multi_class_evaluation_score(
            s_volume, g_volume, label_list, label_fuse, spacing, metric)
        if len(label_list) > 1:
            scores.append(float(np.mean(scores)))
        score_all.append(scores)
        rows.append([seg_name] + scores)

    score_all = np.asarray(score_all)
    mean, std = score_all.mean(axis=0), score_all.std(axis=0)
    rows.append(['mean'] + list(mean))
    rows.append(['std'] + list(std))

    out_csv = '{0}/{1}_{2}_{3}_all.csv'.format(seg_root, split_name,
                                               organ_name, metric)
    with open(out_csv, 'w') as f:
        writer = csv.writer(f, delimiter=',', quotechar='"',
                            quoting=csv.QUOTE_MINIMAL)
        head = ['image'] + ['class_{0}'.format(i) for i in label_list]
        if len(label_list) > 1:
            head += ['average']
        writer.writerow(head)
        for row in rows:
            writer.writerow(row)
    logging.info('%s data: %s mean %s', split_name, metric, mean)
    logging.info('%s data: %s std  %s', split_name, metric, std)
    return mean, std


def eva_main(config):
    """Evaluate metric_1 and metric_2 over the test and valid pair CSVs
    (reference evaluation_seg_train.py:577-582). Root resolution follows
    both reference contracts: a full training config (with a [testing]
    section) derives the root from output_dir/ckpt/test_csv exactly like
    the auto-eval after training — the reference's evaluation_seg_train
    deliberately ignores segmentation_folder_root there (:295-300, the key
    is commented out). A standalone evaluation config (no [testing])
    uses segmentation_folder_root directly (pymic_eval_seg contract,
    evaluation_seg.py:288-297)."""
    explicit = config['evaluation'].get('segmentation_folder_root', None)
    if explicit is not None and 'testing' not in config:
        seg_root = explicit
    else:
        seg_root = _seg_root(config)
    eval_cfg = config['evaluation']
    results = {}
    for key in ('metric_1', 'metric_2'):
        metric = eval_cfg.get(key, None)
        if metric is None:
            continue
        for split, csv_key in (('test', 'test_evaluation_image_pair'),
                               ('valid', 'valid_evaluation_image_pair')):
            pair_csv = eval_cfg.get(csv_key, None)
            if pair_csv is None:
                continue
            mean, std = _evaluate_pairs(config, metric, pair_csv, split,
                                        seg_root)
            results[(split, metric)] = (mean, std)
    return results
