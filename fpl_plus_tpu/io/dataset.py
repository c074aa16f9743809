"""CSV-manifest datasets on the sample-dict contract.

Behavioural parity with the reference datasets
(PyMIC/pymic/io/nifty_dataset.py):

* ``NiftyDataset`` (:106-218): columns ``image[xN],label,pixel_weight,
  image_weight,image1``; FPL+ weight composition ``set_weight_`` —
  ``pixel_weight[pixel_weight < 1] = 0`` then ``pixel_weight *=
  image_weight`` (:165-168); image_weight-only rows synthesize an all-ones
  pixel map (:191-196); unreadable pixel-weight files fall back to constant
  0.5 maps (:197-203) — reproduced deliberately but logged loudly.
* ``NiftyDatasetNpy`` (:220-324): ``.npy`` pseudo-label bundles carrying
  ``predict`` / ``pixel_wise_weight`` / ``sample_wise_weight`` when
  ``train_fpl_uda`` is set.
* ``NiftyDatasetDual`` (:14-104): ``pixel_weight_nonl`` column loaded into
  the ``image1`` slot.
* ``ClassificationDataset`` (:327-379): scalar labels from a ``label``
  column.
* ``H5Dataset`` (h5_dataset.py:12-45).

Datasets are plain indexable objects; batching/prefetch live in
:mod:`fpl_plus_tpu.io.loader`.
"""
from __future__ import annotations

import logging
import os
import numpy as np
import pandas as pd

from fpl_plus_tpu.io.image_io import load_image_as_nd_array


class _VolumeCache:
    """Byte-bounded LRU of decoded volumes keyed by path.

    Training recipes revisit the same manifest rows every epoch; the
    reference re-decodes the NIfTI each time and hides the cost behind
    16-32 DataLoader workers (net_run_dsbn/agent_abstract.py:265,301). A
    TPU host feeding chips from a shared CPU budget is better served by
    decoding each volume once: items become a memcpy + the random
    transform chain. Arrays are returned as copies so in-place transforms
    can never corrupt the cache."""

    def __init__(self, max_bytes: int):
        from collections import OrderedDict
        self.max_bytes = max_bytes
        self.used = 0
        self.store = OrderedDict()

    def load(self, path: str):
        entry = self.store.get(path)
        if entry is not None:
            self.store.move_to_end(path)
        else:
            entry = load_image_as_nd_array(path)
            if not (isinstance(entry, dict) and 'data_array' in entry):
                return entry      # exotic payloads (.npy bundles): no cache
            nbytes = int(entry['data_array'].nbytes)
            if nbytes > self.max_bytes:
                return entry
            while self.used + nbytes > self.max_bytes and self.store:
                _, old = self.store.popitem(last=False)
                self.used -= int(old['data_array'].nbytes)
            self.store[path] = entry
            self.used += nbytes
        out = dict(entry)
        out['data_array'] = entry['data_array'].copy()
        return out


def _copy_sample(sample: dict) -> dict:
    """Shallow dict copy with ndarray values deep-copied: transforms mutate
    arrays in place, so cached samples are exchanged by copy only."""
    return {k: (v.copy() if isinstance(v, np.ndarray) else v)
            for k, v in sample.items()}


class _SampleCache:
    """Byte-bounded LRU of POST-DETERMINISTIC-PREFIX samples keyed by item
    index (deterministic-prefix transform caching).

    Training recipes run the transform chain's deterministic head —
    typically [Normalize, Pad] over the FULL volume — on every step, only
    for the random tail to crop a small patch from the result: at the VS
    recipe scale that is ~16x the voxel traffic the step actually consumes,
    and with the device step at 0.110 s the 153 ms host pipeline had become
    the training bottleneck (BASELINE.md "Host pipeline"). Caching each
    item after the longest ``cache_safe()`` transform prefix leaves only
    crop/flip/one-hot per step. Exactness: cache-safe transforms draw no
    RNG, so the random tail sees bit-identical inputs AND an unchanged RNG
    stream — the sample sequence is identical to the uncached loader's
    (tested in tests/test_io.py)."""

    def __init__(self, max_bytes: int):
        from collections import OrderedDict
        self.max_bytes = max_bytes
        self.used = 0
        self.store = OrderedDict()

    @staticmethod
    def _nbytes(sample: dict) -> int:
        return sum(int(v.nbytes) for v in sample.values()
                   if isinstance(v, np.ndarray))

    def get(self, key):
        entry = self.store.get(key)
        if entry is None:
            return None
        self.store.move_to_end(key)
        return _copy_sample(entry)

    def put(self, key, sample: dict) -> None:
        if key in self.store:
            return
        nbytes = self._nbytes(sample)
        if nbytes > self.max_bytes:
            return
        while self.used + nbytes > self.max_bytes and self.store:
            _, old = self.store.popitem(last=False)
            self.used -= self._nbytes(old)
        self.store[key] = _copy_sample(sample)
        self.used += nbytes


class NiftyDataset:
    def __init__(self, root_dir: str, csv_file: str, modal_num: int = 1,
                 with_label: bool = False, transform=None,
                 cache_bytes: int = 0, host_shard=None,
                 transform_cache: bool = True):
        self.root_dir = root_dir
        self.csv_items = pd.read_csv(csv_file)
        if host_shard is not None:
            # multi-host training: this process reads its row-strided
            # manifest shard (parallel/multihost.shard_manifest_rows)
            from fpl_plus_tpu.parallel.multihost import shard_manifest_rows
            idx = shard_manifest_rows(len(self.csv_items), host_shard[0],
                                      host_shard[1])
            if not idx:
                raise ValueError(
                    'manifest {0} has fewer rows than the {1} hosts — '
                    'process {2} would starve (and the endless sampler '
                    'would spin forever)'.format(csv_file, host_shard[1],
                                                 host_shard[0]))
            self.csv_items = self.csv_items.iloc[idx].reset_index(drop=True)
        self.modal_num = modal_num
        self.with_label = with_label
        self.transform = transform
        self._cache = _VolumeCache(cache_bytes) if cache_bytes else None
        # deterministic-prefix transform caching (see _SampleCache): split
        # the chain at the first non-cache-safe transform. Activated only
        # when the decoded-volume cache is (budget shared rationale: both
        # exist to feed repeated-epoch training; one-pass stages pass 0).
        self._prefix = self._suffix = None
        self._sample_cache = None
        tlist = getattr(transform, 'transforms', None) or []
        if cache_bytes and transform_cache and tlist:
            n_det = 0
            for t in tlist:
                try:
                    if not t.cache_safe():
                        break
                except Exception:
                    break
                n_det += 1
            if n_det:
                self._prefix = tlist[:n_det]
                self._suffix = tlist[n_det:]
                self._sample_cache = _SampleCache(cache_bytes)
        keys = list(self.csv_items.keys())
        self.image_weight_idx = (keys.index('image_weight')
                                 if 'image_weight' in keys else None)
        self.pixel_weight_idx = (keys.index('pixel_weight')
                                 if 'pixel_weight' in keys else None)
        self.image1_idx = keys.index('image1') if 'image1' in keys else None

    def __len__(self):
        return len(self.csv_items)

    def _full_path(self, name: str) -> str:
        return '{0}/{1}'.format(self.root_dir, name)

    def _load_image(self, path: str):
        """Decoded-image load through the optional LRU volume cache."""
        if self._cache is not None:
            return self._cache.load(path)
        return load_image_as_nd_array(path)

    def _load_array(self, idx: int, col: int, dtype) -> np.ndarray:
        name = self._full_path(self.csv_items.iloc[idx, col])
        return np.asarray(self._load_image(name)['data_array'], dtype)

    def _get_label(self, idx: int) -> np.ndarray:
        col = list(self.csv_items.keys()).index('label')
        return self._load_array(idx, col, np.int32)

    @staticmethod
    def compose_weight(image_weight, pixel_weight):
        """FPL+ weight composition (reference set_weight_,
        nifty_dataset.py:165-168)."""
        pixel_weight = np.where(pixel_weight < 1, 0.0, pixel_weight)
        return (pixel_weight * image_weight).astype(np.float32)

    def _raw_sample(self, idx) -> dict:
        """The untransformed sample dict (decode + weight composition);
        subclasses override this, not ``__getitem__``, so all variants share
        the deterministic-prefix transform caching."""
        names_list, image_list = [], []
        image_dict = None
        for i in range(self.modal_num):
            image_name = self.csv_items.iloc[idx, i]
            image_dict = self._load_image(self._full_path(image_name))
            names_list.append(image_name)
            image_list.append(image_dict['data_array'])
        image = np.asarray(np.concatenate(image_list, axis=0), np.float32)
        sample = {'image': image, 'names': names_list[0],
                  'origin': image_dict['origin'],
                  'spacing': image_dict['spacing'],
                  'direction': image_dict['direction']}
        if self.with_label:
            sample['label'] = self._get_label(idx)
            assert image.shape[1:] == sample['label'].shape[1:]
        if self.image_weight_idx is not None:
            sample['image_weight'] = np.float32(
                self.csv_items.iloc[idx, self.image_weight_idx])
            if self.pixel_weight_idx is None:
                sample['pixel_weight'] = self.compose_weight(
                    sample['image_weight'], np.ones_like(image))
        if self.pixel_weight_idx is not None:
            try:
                pw = self._load_array(idx, self.pixel_weight_idx, np.float32)
                sample['pixel_weight'] = self.compose_weight(
                    sample.get('image_weight', np.float32(1.0)), pw)
            except Exception:
                logging.warning(
                    'pixel weight unreadable for item %d (%s); falling back '
                    'to constant 0.5 map (reference nifty_dataset.py:197-203)',
                    idx, self.csv_items.iloc[idx, self.pixel_weight_idx])
                sample['pixel_weight'] = np.ones_like(image) * 0.5
            assert image.shape[1:] == sample['pixel_weight'].shape[1:]
        if self.image1_idx is not None:
            try:
                sample['image1'] = self._load_array(idx, self.image1_idx,
                                                    np.float32)
            except Exception:
                sample['image1'] = image
        return sample

    def __getitem__(self, idx):
        if self._sample_cache is not None:
            sample = self._sample_cache.get(idx)
            if sample is None:
                sample = self._raw_sample(idx)
                for t in self._prefix:
                    sample = t(sample)
                if self._suffix:
                    # ONLY the first suffix transform sees the post-prefix
                    # sample unchanged at call time, so only its stash is
                    # guaranteed valid (e.g. a RandomFlip BEFORE RandomCrop
                    # would move the stashed fg bounding box); precompute
                    # draws no RNG
                    sample = self._suffix[0].precompute(sample)
                self._sample_cache.put(idx, sample)
            for t in self._suffix:
                sample = t(sample)
            return sample
        sample = self._raw_sample(idx)
        if self.transform:
            sample = self.transform(sample)
        return sample


class NiftyDatasetDual(NiftyDataset):
    """Variant whose ``pixel_weight_nonl`` column feeds the image1 slot
    (reference nifty_dataset.py:14-104)."""

    def __init__(self, root_dir, csv_file, modal_num=1, with_label=False,
                 transform=None, cache_bytes=0, host_shard=None,
                 transform_cache=True):
        super().__init__(root_dir, csv_file, modal_num, with_label,
                         transform, cache_bytes, host_shard, transform_cache)
        keys = list(self.csv_items.keys())
        self.image1_idx = (keys.index('pixel_weight_nonl')
                           if 'pixel_weight_nonl' in keys else None)


class NiftyDatasetNpy(NiftyDataset):
    """Pseudo-label bundle dataset: the ``label`` column points at ``.npy``
    dict files with ``predict``/``pixel_wise_weight``/``sample_wise_weight``
    when ``train_fpl_uda`` (reference nifty_dataset.py:220-324)."""

    def __init__(self, root_dir, csv_file, modal_num=1, train_fpl_uda=False,
                 with_label=False, transform=None, cache_bytes=0,
                 host_shard=None, transform_cache=True):
        super().__init__(root_dir, csv_file, modal_num, with_label,
                         transform, cache_bytes, host_shard, transform_cache)
        self.train_fpl_uda = train_fpl_uda
        self.image_weight_idx = None
        self.pixel_weight_idx = None
        self.image1_idx = None

    def _raw_sample(self, idx):
        names_list, image_list = [], []
        image_dict = None
        for i in range(self.modal_num):
            image_name = self.csv_items.iloc[idx, i]
            image_dict = load_image_as_nd_array(self._full_path(image_name))
            names_list.append(image_name)
            image_list.append(image_dict['data_array'])
        image = np.asarray(np.concatenate(image_list, axis=0), np.float32)
        sample = {'image': image, 'names': names_list[0],
                  'origin': image_dict['origin'],
                  'spacing': image_dict['spacing'],
                  'direction': image_dict['direction']}
        if self.with_label:
            col = list(self.csv_items.keys()).index('label')
            name = self._full_path(self.csv_items.iloc[idx, col])
            if self.train_fpl_uda:
                bundle = load_image_as_nd_array(name).item()
                sample['label'] = np.asarray(bundle['predict'], np.int32)
                sample['pixel_weight'] = np.expand_dims(
                    np.asarray(bundle['pixel_wise_weight'], np.float32), 0)
                sample['image_weight'] = np.float32(
                    bundle['sample_wise_weight'])
            else:
                sample['label'] = np.asarray(
                    load_image_as_nd_array(name)['data_array'], np.int32)
            assert image.shape[1:] == sample['label'].shape[1:]
        return sample


class ClassificationDataset(NiftyDataset):
    """Images with scalar class labels (reference nifty_dataset.py:327-379)."""

    def __init__(self, root_dir, csv_file, modal_num=1, class_num=2,
                 with_label=False, transform=None, cache_bytes=0,
                 host_shard=None, transform_cache=True):
        super().__init__(root_dir, csv_file, modal_num, with_label,
                         transform, cache_bytes, host_shard, transform_cache)
        self.class_num = class_num

    def _raw_sample(self, idx):
        names_list, image_list = [], []
        for i in range(self.modal_num):
            image_name = self.csv_items.iloc[idx, i]
            image_dict = self._load_image(self._full_path(image_name))
            names_list.append(image_name)
            image_list.append(image_dict['data_array'])
        image = np.asarray(np.concatenate(image_list, axis=0), np.float32)
        sample = {'image': image, 'names': names_list[0]}
        if self.with_label:
            col = list(self.csv_items.keys()).index('label')
            sample['label'] = np.int64(self.csv_items.iloc[idx, col])
        return sample


class H5Dataset:
    """HDF5 image/label pairs (reference h5_dataset.py:12-45)."""

    def __init__(self, root_dir: str, sample_list_name: str, transform=None):
        self.root_dir = root_dir
        with open(sample_list_name) as f:
            self.sample_list = [line.strip() for line in f if line.strip()]
        self.transform = transform

    def __len__(self):
        return len(self.sample_list)

    def __getitem__(self, idx):
        import h5py
        name = self.sample_list[idx]
        with h5py.File(os.path.join(self.root_dir, name), 'r') as h5f:
            sample = {'image': np.asarray(h5f['image'], np.float32),
                      'label': np.asarray(h5f['label'], np.int32),
                      'names': name}
        if self.transform:
            sample = self.transform(sample)
        return sample
