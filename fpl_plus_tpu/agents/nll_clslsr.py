"""CLSLSR confidence-map driver for noisy-label learning.

Parity with the reference NLLCLSLSR script
(PyMIC/pymic/net_run_nll/nll_clslsr.py:19-205): run inference with the
trained network over the TRAINING manifest, estimate a per-voxel
confidence mask with confident learning (Zhang et al., MICCAI 2020 /
Northcutt et al., "Confident Learning", JAIR 2021), write the masks as
``slsr_conf/`` weight maps next to the dataset, and emit a
``<train_csv>_clslsr.csv`` retrain manifest whose ``pixel_weight`` column
points at them — consumed by ``SLSRLoss`` (losses/seg.py) which smooths
the labels of voxels flagged unconfident.

The confident-learning kernel is a first-party re-implementation of the
cleanlab-1.x semantics the reference calls
(``cleanlab.pruning.get_noise_indices``, nll_clslsr.py:33-45):

* **confident joint**: per-class thresholds t_j = mean p(j) over examples
  labeled j; an example is confidently class k if p(k) >= t_k; among its
  confident classes the argmax-probability one is its guessed true label;
  count (given label, guessed label) pairs.
* **calibration**: rows rescaled so row sums match the observed label
  counts (cleanlab's ``calibrate_confident_joint``).
* **prune_by_class**: for class j, flag the ``count_j - cj[j, j]``
  examples labeled j with the LOWEST self-confidence p(j).
* **prune_by_noise_rate**: for each off-diagonal (j, k), flag the
  ``cj[j, k]`` examples labeled j with the HIGHEST p(k).
* **'both'** (the reference default): the intersection of the two masks.

Differences vs the reference script, by design:

* the reference compares INVERSE-transformed predictions against the
  still-transformed ``label_prob`` and hard-codes 256x256 PNG slices
  (nll_clslsr.py:124-147) — workable only because its 2D recipes use
  shape-preserving valid transforms. Here the prediction is
  inverse-transformed to the ORIGINAL geometry and compared against the
  original on-disk label volume, and the confidence maps are written in
  that geometry (NIfTI, metadata copied from the label file, values
  {0, 255} like the reference's PNGs) — so any transform chain and any
  volume shape works, and the emitted manifest is immediately consumable
  by the retrain dataset (shape asserts in io/dataset.py).
* the previous CE-quantile approximation is kept as
  ``get_confident_map_quantile`` (documented fallback; it needs no class
  statistics, useful for single-volume smoke tests).
"""
from __future__ import annotations

import logging
import os
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
from fpl_plus_tpu.engine import ckpt as ckpt_lib
from fpl_plus_tpu.io.image_io import (load_image_as_nd_array,
                                      save_nd_array_as_image)
from fpl_plus_tpu.io.loader import prefetch_iter


# -- confident-learning kernel (host numpy) ---------------------------------

def compute_confident_joint(labels: np.ndarray,
                            probs: np.ndarray) -> np.ndarray:
    """[C, C] count of (given label, confidently-guessed label) pairs.

    ``labels`` int [N]; ``probs`` float [N, C]. Classes absent from
    ``labels`` get a +inf threshold (nothing is confidently that class).

    The kernel stays in the caller's float dtype (float32 from the
    inference path) — only the per-class threshold means accumulate in
    float64 — so the full-dataset voxel arrays are never upcast (advisor
    round-4: float64 copies of 3D training sets cost tens of GB host RAM
    for nothing)."""
    labels = np.asarray(labels).reshape(-1)
    probs = np.asarray(probs)
    n, k = probs.shape
    thresholds = np.full(k, np.inf)
    for j in range(k):
        sel = labels == j
        if np.any(sel):
            thresholds[j] = probs[sel, j].mean(dtype=np.float64)
    thresholds = thresholds.astype(probs.dtype, copy=False)
    # the 1e-6 slack is deliberate: cleanlab 1.x's compute_confident_joint
    # uses exactly `psx >= thresholds - 1e-6` (floating-point tolerance);
    # matching it keeps the claimed cleanlab-1.x comparison rule
    above = probs >= thresholds[None, :] - 1e-6
    masked = np.where(above, probs, -np.inf)
    guess = masked.argmax(axis=1)
    valid = above.any(axis=1)
    cj = np.zeros((k, k), np.int64)
    np.add.at(cj, (labels[valid], guess[valid]), 1)
    return cj


def calibrate_confident_joint(cj: np.ndarray,
                              labels: np.ndarray) -> np.ndarray:
    """Rescale rows so row sums equal the observed per-class label counts
    (cleanlab's calibrate_confident_joint)."""
    labels = np.asarray(labels).reshape(-1)
    k = cj.shape[0]
    counts = np.bincount(labels, minlength=k).astype(np.float64)
    row_sums = np.clip(cj.sum(axis=1).astype(np.float64), 1.0, None)
    cal = cj * (counts / row_sums)[:, None]
    return np.round(cal).astype(np.int64)


def _prune_by_class_mask(labels, probs, cj) -> np.ndarray:
    mask = np.zeros(labels.shape[0], bool)
    k = cj.shape[0]
    counts = np.bincount(labels, minlength=k)
    for j in range(k):
        num_noisy = int(counts[j] - cj[j, j])
        if num_noisy <= 0:
            continue
        idx = np.flatnonzero(labels == j)
        order = np.argsort(probs[idx, j])          # lowest self-confidence
        mask[idx[order[:num_noisy]]] = True
    return mask


def _prune_by_noise_rate_mask(labels, probs, cj) -> np.ndarray:
    mask = np.zeros(labels.shape[0], bool)
    k = cj.shape[0]
    for j in range(k):
        idx = np.flatnonzero(labels == j)
        if idx.size == 0:
            continue
        for kk in range(k):
            if kk == j:
                continue
            num = int(cj[j, kk])
            if num <= 0:
                continue
            order = np.argsort(probs[idx, kk])     # highest p(true class)
            mask[idx[order[-num:]]] = True
    return mask


def get_noise_mask(labels: np.ndarray, probs: np.ndarray,
                   prune_method: str = 'both') -> np.ndarray:
    """Boolean [N] noise mask (True = the given label looks wrong)."""
    labels = np.asarray(labels).reshape(-1).astype(np.int64)
    probs = np.asarray(probs)    # keep the caller's dtype (float32 path)
    cj = calibrate_confident_joint(
        compute_confident_joint(labels, probs), labels)
    if prune_method == 'prune_by_class':
        return _prune_by_class_mask(labels, probs, cj)
    if prune_method == 'prune_by_noise_rate':
        return _prune_by_noise_rate_mask(labels, probs, cj)
    if prune_method == 'both':
        return (_prune_by_class_mask(labels, probs, cj)
                & _prune_by_noise_rate_mask(labels, probs, cj))
    raise ValueError('Undefined prune_method {0}'.format(prune_method))


def get_confident_map(gt: np.ndarray, pred: np.ndarray,
                      cl_type: str = 'both') -> np.ndarray:
    """Reference-signature entry (nll_clslsr.py:19-46): ``gt`` int [N],
    ``pred`` network logits [N, C], ``cl_type`` in {'both', 'Qij', 'Cij',
    'intersection', 'union', 'prune_by_class', 'prune_by_noise_rate'}.
    Returns a boolean noisiness mask. 'Cij' feeds the RAW logits to the
    pruner (the reference does exactly that with cleanlab)."""
    pred = np.asarray(pred, np.float32)
    prob = scipy.special.softmax(pred, axis=1)
    if cl_type in ('both', 'Qij'):
        return get_noise_mask(gt, prob, 'both')
    if cl_type == 'Cij':
        return get_noise_mask(gt, pred, 'both')
    if cl_type == 'intersection':
        return (get_noise_mask(gt, prob, 'both')
                & get_noise_mask(gt, pred, 'both'))
    if cl_type == 'union':
        return (get_noise_mask(gt, prob, 'both')
                | get_noise_mask(gt, pred, 'both'))
    if cl_type in ('prune_by_class', 'prune_by_noise_rate'):
        return get_noise_mask(gt, prob, cl_type)
    raise ValueError('Undefined CL_type {0}'.format(cl_type))


def get_confident_map_quantile(labels_prob, pred_logits,
                               ratio: float = 0.3):
    """CE-quantile fallback (no class statistics needed): voxels whose CE
    loss is in the top ``ratio`` quantile are flagged. Kept for
    single-volume smoke use; the confident-learning path above is the
    reference-parity estimator."""
    prob = jax.nn.softmax(jnp.asarray(pred_logits), -1) * 0.999 + 5e-4
    k = prob.shape[-1]
    ce = jnp.sum(-jnp.asarray(labels_prob).reshape(-1, k)
                 * jnp.log(prob.reshape(-1, k)), -1)
    threshold = jnp.quantile(ce, 1.0 - ratio)
    return (ce >= threshold).astype(jnp.float32)


# -- the driver agent --------------------------------------------------------

class NLLCLSLSR(SegmentationAgent):
    """Confidence-map inference agent (reference NLLCLSLSR,
    nll_clslsr.py:48-147): dropout-TTA-capable inference over the TRAIN
    manifest, confident-learning noise mask, ``slsr_conf/`` weight maps.

    Config contract (all in the standard sections):

    * ``[dataset] train_csv`` — the noisy-label manifest to audit
      (image,label columns; ``root_dir``-relative).
    * ``[dataset] valid_transform`` — the inference transform chain (the
      reference uses the valid chain, nll_clslsr.py:162-176).
    * ``[testing]`` — checkpoint/window/TTA settings as for a test stage;
      ``test_time_dropout = True`` enables MC dropout;
      ``cl_type`` picks the pruning rule (default ``both``).
    """

    def __init__(self, config, stage='test'):
        super().__init__(config, 'test')

    def create_dataset(self):
        """The 'test' loader iterates the TRAIN csv WITH labels through the
        valid transform chain (reference get_confidence_map,
        nll_clslsr.py:162-188)."""
        from fpl_plus_tpu.io.dataset import NiftyDataset
        from fpl_plus_tpu.io.loader import DataLoader
        data_cfg = self.config['dataset']
        transform = self.build_transform('valid')
        # the valid chain's invertible transforms drive the prediction's
        # inverse mapping at collection time
        self.transform_list = (transform.transforms
                               if transform is not None else [])
        self.test_set = NiftyDataset(
            root_dir=data_cfg['root_dir'],
            csv_file=data_cfg['train_csv'],
            modal_num=data_cfg.get('modal_num', 1),
            with_label=True, transform=transform, cache_bytes=0)
        self.test_loader = DataLoader(self.test_set, batch_size=1,
                                      shuffle=False, num_workers=0,
                                      seed=self.random_seed)

    def infer(self):
        self.infer_with_cl()

    def _label_paths(self) -> List[str]:
        import csv
        data_cfg = self.config['dataset']
        with open(data_cfg['train_csv']) as f:
            rows = list(csv.DictReader(f))
        paths = [r['label'] for r in rows]
        # confidence maps are written keyed by label basename; two rows
        # sharing a basename in different directories would silently
        # overwrite each other's map (advisor round-4; flaw inherited from
        # the reference script) — fail loudly instead
        seen = {}
        for p in paths:
            base = os.path.basename(p)
            if base in seen and seen[base] != p:
                raise ValueError(
                    'CLSLSR: label basename collision: %r and %r both map '
                    'to slsr_conf/%s; rename one or split the manifest'
                    % (seen[base], p, base))
            seen[base] = p
        return paths

    def _convert_label_for_cl(self, lab: np.ndarray) -> np.ndarray:
        """Apply the chain's deterministic label-remapping transforms
        (LabelConvert / LabelConvertNonzero) to the raw on-disk label so
        the confident joint compares in the label space the network was
        trained on — the reference gets this for free by using the
        transformed label_prob (nll_clslsr.py:124-147); without it a
        255-valued mask indexes out of the [K, K] joint (advisor
        round-4 medium)."""
        sample = {'label': lab}
        for transform in self.transform_list:
            if type(transform).__name__ in ('LabelConvert',
                                            'LabelConvertNonzero'):
                sample = transform(sample)
        return np.asarray(sample['label'])

    def infer_with_cl(self):
        cfg_test = self.config['testing']
        domain_label = cfg_test.get('domian_label', 0)
        tt_dropout = cfg_test.get('test_time_dropout', False)
        root_dir = self.config['dataset']['root_dir']

        ckpt_name = ckpt_lib.get_checkpoint_name(self.config)
        if isinstance(ckpt_name, (tuple, list)):
            raise ValueError('CLSLSR inference uses a single checkpoint '
                             '(ckpt_mode 0/1/2)')
        template = {'params': self.variables['params'],
                    'batch_stats': self.variables['batch_stats']}
        loaded = ckpt_lib.load_checkpoint(ckpt_name, template)
        from fpl_plus_tpu.utils.precision import cast_infer_variables
        variables = cast_infer_variables(
            {'params': loaded['state']['params'],
             'batch_stats': loaded['state']['batch_stats']},
            self.infer_precision)
        logging.info('loaded checkpoint %s (iteration %d)', ckpt_name,
                     loaded['iteration'])
        if self.inferer is None:
            self.inferer = self._make_inferer()

        label_paths = self._label_paths()
        rng = jax.random.PRNGKey(self.random_seed)
        pred_list, gt_list, shapes = [], [], []
        t0 = time.time()
        vol_idx = 0
        for data in prefetch_iter(self.test_loader):
            images = np.asarray(data['image'], np.float32)
            rng_td = None
            if tt_dropout:
                rng, rng_td = jax.random.split(rng)
            pred_out = self.inferer.run(
                self._patch_forward,
                (variables, jnp.int32(domain_label), rng_td), images)
            if isinstance(pred_out, list):   # multi-head nets: primary head
                pred_out = pred_out[0]
            data['predict'] = pred_out
            for transform in self.transform_list[::-1]:
                if transform.inverse:
                    data = transform.inverse_transform_for_prediction(data)
            pred = np.asarray(data['predict'])          # [1, K, *orig]
            k = pred.shape[1]
            # original on-disk label: the confident joint compares in the
            # ORIGINAL geometry (see module docstring)
            lab = load_image_as_nd_array(
                os.path.join(root_dir, label_paths[vol_idx]))['data_array']
            lab = self._convert_label_for_cl(lab)
            lab = np.asarray(lab).reshape(-1).astype(np.int64)
            if int(lab.max(initial=0)) >= k:
                raise ValueError(
                    'CLSLSR: label %s has values >= class_num %d after the '
                    'configured label conversions; add LabelConvert/'
                    'LabelConvertNonzero to valid_transform so the label '
                    'space matches the network heads'
                    % (label_paths[vol_idx], k))
            pred_2d = np.moveaxis(pred, 1, -1).reshape(-1, k)
            assert pred_2d.shape[0] == lab.shape[0], \
                ('prediction/label voxel mismatch for %s'
                 % label_paths[vol_idx])
            pred_list.append(pred_2d.astype(np.float32))
            gt_list.append(lab)
            shapes.append(pred.shape[2:])
            vol_idx += 1
        logging.info('CL inference over %d volumes in %.1fs', vol_idx,
                     time.time() - t0)

        pred_cat = np.concatenate(pred_list)
        gt_cat = np.concatenate(gt_list)
        conf = get_confident_map(gt_cat, pred_cat,
                                 cfg_test.get('cl_type', 'both'))
        logging.info('confident learning flagged %d / %d voxels (%.2f%%)',
                     int(conf.sum()), conf.size,
                     100.0 * conf.sum() / max(conf.size, 1))

        from fpl_plus_tpu.parallel.multihost import is_primary_host
        save_dir = os.path.join(root_dir, 'slsr_conf')
        if is_primary_host():
            os.makedirs(save_dir, exist_ok=True)
            offset = 0
            for shape, lab_path in zip(shapes, label_paths):
                n_vox = int(np.prod(shape))
                conf_map = (conf[offset:offset + n_vox]
                            .reshape(shape).astype(np.uint8) * 255)
                offset += n_vox
                dst = os.path.join(save_dir, os.path.basename(lab_path))
                save_nd_array_as_image(
                    conf_map, dst,
                    reference_name=os.path.join(root_dir, lab_path))
            logging.info('wrote %d confidence maps to %s', len(shapes),
                         save_dir)


def run_get_confidence_map(config: dict) -> str:
    """The reference ``get_confidence_map`` main (nll_clslsr.py:149-204):
    run the CLSLSR agent over the train manifest, then write the
    ``_clslsr.csv`` retrain manifest (image, pixel_weight -> slsr_conf/,
    label). Returns the manifest path."""
    import pandas as pd
    agent = NLLCLSLSR(config, 'test')
    agent.run()

    csv_file = config['dataset']['train_csv']
    df_train = pd.read_csv(csv_file)
    pixel_weight = ['slsr_conf/' + str(lab).split('/')[-1]
                    for lab in df_train['label']]
    df_cl = pd.DataFrame.from_dict(
        {'image': df_train['image'], 'pixel_weight': pixel_weight,
         'label': df_train['label']})
    train_cl_csv = csv_file.replace('.csv', '_clslsr.csv')
    from fpl_plus_tpu.parallel.multihost import is_primary_host
    if is_primary_host():
        df_cl.to_csv(train_cl_csv, index=False)
        logging.info('wrote CLSLSR retrain manifest %s', train_cl_csv)
    return train_cl_csv
