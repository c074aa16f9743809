"""Abstract agent: lifecycle, datasets, seeding, checkpoint resolution.

Parity with the reference abstract agents
(PyMIC/pymic/net_run_dsbn/agent_abstract.py:13-357 and
net_run/agent_abstract.py:28-316): ``run()`` drives create_dataset ->
create_network -> train_valid/infer; dual-domain stages use the
``1_train/2_train/1_valid/2_valid`` CSV keys (:241-318); checkpoint names
resolve through the ``_latest.txt``/``_best.txt`` pointer files
(:136-153, in engine/ckpt.py); determinism = seeded python/numpy RNG +
per-item loader seeding (stronger than the reference's per-worker
``worker_init_fn``, :253-268) and explicit jax PRNG-key threading.
"""
from __future__ import annotations

import random
from abc import ABC, abstractmethod
import numpy as np

from fpl_plus_tpu.io.dataset import NiftyDataset
from fpl_plus_tpu.io.loader import DataLoader
from fpl_plus_tpu.transforms.trans_dict import TransformDict


def seed_everything(seed: int) -> None:
    """Reference seed_torch analog (agent_abstract.py:13-26) for the host
    RNGs; device randomness is explicit jax.random key threading."""
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


class NetRunAgent(ABC):
    def __init__(self, config: dict, stage: str = 'train'):
        assert stage in ('train', 'inference', 'evaluation', 'test')
        if stage == 'inference':
            stage = 'test'
        self.config = config
        self.stage = stage
        self.transform_dict = TransformDict
        self.net_dict = None
        self.loss_dict = None
        self.inferer = None
        self.test_set = None
        self.transform_list = []
        self.deterministic = config.get('training', {}).get(
            'deterministic', True)
        self.random_seed = config.get('training', {}).get('random_seed', 1)
        if self.deterministic:
            seed_everything(self.random_seed)

        self.num_domains = config.get('network', {}).get('num_domains', 1)
        self.train_loaders = []
        self.valid_loaders = []
        self.test_loader = None
        self.mesh = None   # populated lazily by mesh() below

    def get_mesh(self):
        """Device mesh for this stage, or None when the cfg requests a
        single device (the default). Resolution: [training]/[testing]
        ``mesh_devices`` (−1 = all visible) or a multi-entry ``gpus`` list —
        the TPU-native surface for the reference's nn.DataParallel
        (net_run_dsbn/agent_seg.py:693-698). Built lazily so importing the
        agent never initializes a JAX backend."""
        if self.mesh is None:
            from fpl_plus_tpu.parallel import (make_mesh,
                                               mesh_size_from_config)
            n = mesh_size_from_config(self.config, self.stage)
            self.mesh = make_mesh(n) if n > 1 else False
            if self.mesh:
                from fpl_plus_tpu.parallel.multihost import warm_collectives
                warm_collectives(self.mesh)
        return self.mesh or None

    # -- injection points (reference agent_abstract.py:67-134) -------------
    def set_network_dict(self, net_dict):
        self.net_dict = net_dict

    def set_loss_dict(self, loss_dict):
        self.loss_dict = loss_dict

    def set_transform_dict(self, transform_dict):
        self.transform_dict = transform_dict

    def set_inferer(self, inferer):
        self.inferer = inferer

    def set_datasets(self, train_set=None, valid_set=None, test_set=None):
        self.test_set = test_set
        self._injected_train = train_set
        self._injected_valid = valid_set

    # -- datasets -----------------------------------------------------------
    def build_transform(self, stage_key: str):
        """Compose the transform chain for a stage ('train'/'valid'/'test')
        and remember it for inverse transforms at inference
        (reference agent_seg.py:42-80)."""
        transform_key = stage_key + '_transform'
        data_cfg = self.config['dataset']
        if stage_key == 'valid' and transform_key not in data_cfg:
            transform_key = 'train_transform'
        names = data_cfg.get(transform_key, None)
        if not names:
            return None
        params = dict(data_cfg)
        params['task'] = self.task_type()
        transform_list = []
        for name in names:
            if name not in self.transform_dict:
                raise ValueError('Undefined transform {0}'.format(name))
            transform_list.append(self.transform_dict[name](params))
        if stage_key == 'test':
            self.transform_list = transform_list
        return Compose(transform_list)

    def _effective_workers(self, data_cfg) -> int:
        import os as _os
        n = data_cfg.get('num_workder', data_cfg.get('num_worker', 8))
        return min(n, max((_os.cpu_count() or 1) - 1, 0))

    def get_stage_dataset_from_config(self, stage: str):
        assert stage in ('1_train', '1_valid', '1_test',
                         '2_train', '2_valid', '2_test', 'test')
        data_cfg = self.config['dataset']
        root_dir = data_cfg['root_dir']
        modal_num = data_cfg.get('modal_num', 1)
        real_stage = stage.split('_')[-1]
        transform = self.build_transform(real_stage)
        csv_file = data_cfg.get(stage + '_csv', None)
        if csv_file is None:
            # standard (non-dual) configs use train_csv/valid_csv/test_csv
            csv_file = data_cfg.get(real_stage + '_csv', None)
        # decoded-volume LRU cache ([dataset] cache_gb, 0 disables): train
        # and valid revisit the same manifest rows every epoch — decode each
        # NIfTI once instead of per item. The one-pass test stage gains
        # nothing, so it skips the cache.
        cache_gb = data_cfg.get('cache_gb', 2.0)
        cache_bytes = (int(cache_gb * (1 << 30))
                       if real_stage != 'test' else 0)
        # worker processes each carry their own cache copy — split the
        # budget so aggregate host RSS stays ~cache_gb per dataset
        if real_stage == 'train':
            cache_bytes //= max(self._effective_workers(data_cfg), 1)
        # multi-host: each process trains on its manifest shard and feeds
        # its local slice of the global batch; valid/test read everything
        # (all processes execute identical eval programs)
        host_shard = None
        if real_stage == 'train':
            from fpl_plus_tpu.parallel.multihost import process_info
            pidx, pcnt = process_info()
            if pcnt > 1:
                host_shard = (pidx, pcnt)
        return NiftyDataset(root_dir=root_dir, csv_file=csv_file,
                            modal_num=modal_num,
                            with_label=(real_stage != 'test'),
                            transform=transform, cache_bytes=cache_bytes,
                            host_shard=host_shard,
                            transform_cache=data_cfg.get('transform_cache',
                                                         True))

    def create_dataset(self):
        data_cfg = self.config['dataset']
        if self.stage == 'train':
            bn_train = data_cfg['train_batch_size']
            bn_valid = data_cfg.get('valid_batch_size', 1)
            # more workers than spare cores is a measured slowdown (IPC
            # overhead with zero parallelism) — recipes written for beefy
            # hosts (reference uses 16-32) run unchanged on small ones
            num_worker = self._effective_workers(data_cfg)
            # multi-host: train_batch_size is the GLOBAL batch; each
            # process loads its 1/P slice and the agent assembles the
            # global array (make_array_from_process_local_data)
            from fpl_plus_tpu.parallel.multihost import process_info
            _pidx, _pcnt = process_info()
            if _pcnt > 1:
                if bn_train % _pcnt:
                    raise ValueError(
                        'train_batch_size {0} must divide across {1} '
                        'hosts'.format(bn_train, _pcnt))
                bn_train //= _pcnt
            domains = range(1, self.num_domains + 1)
            for d in domains:
                train_set = self.get_stage_dataset_from_config(
                    '{0}_train'.format(d))
                valid_set = self.get_stage_dataset_from_config(
                    '{0}_valid'.format(d))
                self.train_loaders.append(DataLoader(
                    train_set, batch_size=bn_train, shuffle=True,
                    num_workers=num_worker, seed=self.random_seed + d))
                self.valid_loaders.append(DataLoader(
                    valid_set, batch_size=bn_valid, shuffle=False,
                    num_workers=0, seed=self.random_seed))
        else:
            bn_test = data_cfg.get('test_batch_size', 1)
            if self.test_set is None:
                self.test_set = self.get_stage_dataset_from_config('test')
            self.test_loader = DataLoader(self.test_set, batch_size=bn_test,
                                          shuffle=False, num_workers=0,
                                          seed=self.random_seed)

    def shutdown(self):
        for ld in self.train_loaders + self.valid_loaders:
            ld.shutdown()

    # -- lifecycle ----------------------------------------------------------
    def task_type(self) -> str:
        return 'segmentation'

    @abstractmethod
    def create_network(self):
        ...

    @abstractmethod
    def train_valid(self):
        ...

    @abstractmethod
    def infer(self):
        ...

    def run(self):
        """Reference run() (agent_abstract.py:348-357)."""
        self.create_dataset()
        self.create_network()
        try:
            if self.stage == 'train':
                self.train_valid()
            else:
                self.infer()
        finally:
            self.shutdown()
