"""Classification metrics + evaluation CLI
(reference PyMIC/pymic/util/evaluation_cls.py:21-192).

Binary and non-exclusive evaluation over ground-truth/prediction CSVs with
accuracy / recall (sensitivity) / specificity / precision / AUC, without the
sklearn dependency (tiny closed-form implementations).
"""
from __future__ import annotations

import logging
import numpy as np
import pandas as pd


def accuracy(gt_label, pred_label) -> float:
    return float((np.asarray(gt_label) == np.asarray(pred_label)).mean())


def recall(gt_label, pred_label) -> float:
    gt = np.asarray(gt_label)
    return float((gt * np.asarray(pred_label)).sum() / (gt.sum() + 0.0))


sensitivity = recall


def specificity(gt_label, pred_label) -> float:
    return recall(1 - np.asarray(gt_label), 1 - np.asarray(pred_label))


def precision(gt_label, pred_label) -> float:
    pred = np.asarray(pred_label)
    tp = (np.asarray(gt_label) * pred).sum()
    return float(tp / (pred.sum() + 1e-12))


def roc_auc(gt_label, pred_score) -> float:
    """Rank-based AUC (Mann-Whitney U)."""
    gt = np.asarray(gt_label)
    score = np.asarray(pred_score, np.float64)
    order = np.argsort(score, kind='mergesort')
    ranks = np.empty_like(order, np.float64)
    ranks[order] = np.arange(1, len(score) + 1)
    # average ranks for ties
    for v in np.unique(score):
        sel = score == v
        ranks[sel] = ranks[sel].mean()
    n_pos = gt.sum()
    n_neg = len(gt) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float((ranks[gt == 1].sum() - n_pos * (n_pos + 1) / 2)
                 / (n_pos * n_neg))


def get_evaluation_score(gt_label, pred_prob, metric: str) -> float:
    gt = np.asarray(gt_label)
    prob = np.asarray(pred_prob)
    pred = np.argmax(prob, axis=1)
    if metric == 'accuracy':
        return accuracy(gt, pred)
    if metric in ('recall', 'sensitivity'):
        return recall(gt, pred)
    if metric == 'specificity':
        return specificity(gt, pred)
    if metric == 'precision':
        return precision(gt, pred)
    if metric == 'auc':
        return roc_auc(gt, prob[:, 1])
    raise ValueError('undefined metric: {0}'.format(metric))


def binary_evaluation(config: dict) -> dict:
    """reference evaluation_cls.py:72-106: metric list over gt/pred CSVs."""
    metric_list = config['metric_list']
    if not isinstance(metric_list, (list, tuple)):
        metric_list = [metric_list]
    gt_csv = config['ground_truth_csv']
    prob_csv = config['predict_prob_csv']
    gt_items = pd.read_csv(gt_csv)
    prob_items = pd.read_csv(prob_csv)
    assert len(gt_items) == len(prob_items)
    gt = np.asarray(gt_items.iloc[:, -1], np.int64)
    prob = np.asarray(prob_items.iloc[:, 1:], np.float64)
    scores = {}
    for metric in metric_list:
        scores[metric] = get_evaluation_score(gt, prob, metric)
        logging.info('%s: %.4f', metric, scores[metric])
    return scores


def nexcl_evaluation(config: dict) -> dict:
    """Non-exclusive (multi-label) evaluation: per-class binary metrics
    (reference evaluation_cls.py:108-157)."""
    metric_list = config['metric_list']
    if not isinstance(metric_list, (list, tuple)):
        metric_list = [metric_list]
    gt_items = pd.read_csv(config['ground_truth_csv'])
    prob_items = pd.read_csv(config['predict_prob_csv'])
    gt = np.asarray(gt_items.iloc[:, 1:], np.int64)
    prob = np.asarray(prob_items.iloc[:, 1:], np.float64)
    class_num = gt.shape[1]
    scores = {}
    for metric in metric_list:
        per_class = []
        for c in range(class_num):
            two_col = np.stack([1 - prob[:, c], prob[:, c]], axis=1)
            per_class.append(get_evaluation_score(gt[:, c], two_col, metric))
        scores[metric] = per_class
        logging.info('%s: %s', metric, per_class)
    return scores
