"""Multi-host surface (parallel/multihost.py): manifest sharding, local
batch split, and init gating. True multi-process runs need a cluster; the
helpers are tested directly and through monkeypatched process info."""
import numpy as np
import pytest

from fpl_plus_tpu.parallel.multihost import (maybe_initialize_distributed,
                                             process_info,
                                             shard_manifest_rows)


def test_shard_manifest_rows_partition():
    n, p = 23, 4
    shards = [shard_manifest_rows(n, i, p) for i in range(p)]
    # strided, disjoint, complete
    allrows = sorted(r for s in shards for r in s)
    assert allrows == list(range(n))
    assert shards[1][0] == 1 and shards[1][1] == 5
    # balanced within 1
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    # single host: identity
    assert shard_manifest_rows(n, 0, 1) == list(range(n))


def test_dataset_host_shard(fixture_dir, tmp_path):
    from fpl_plus_tpu.io.dataset import NiftyDataset
    csv = tmp_path / 'm.csv'
    rows = ['img.nii.gz,lab.nii.gz'] * 5
    csv.write_text('image,label\n' + '\n'.join(rows) + '\n')
    full = NiftyDataset(str(fixture_dir), str(csv), with_label=True)
    shard0 = NiftyDataset(str(fixture_dir), str(csv), with_label=True,
                          host_shard=(0, 2))
    shard1 = NiftyDataset(str(fixture_dir), str(csv), with_label=True,
                          host_shard=(1, 2))
    assert len(full) == 5
    assert len(shard0) == 3 and len(shard1) == 2
    np.testing.assert_array_equal(shard0[0]['image'], full[0]['image'])


def test_create_dataset_splits_global_batch(monkeypatch, fixture_dir,
                                            tmp_path):
    """Under 2 simulated hosts the train loader yields the LOCAL half of
    the global batch; an indivisible batch fails loudly."""
    import fpl_plus_tpu.agents.agent_abstract as aa
    from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
    import fpl_plus_tpu.parallel.multihost as mh

    csv = tmp_path / 'm.csv'
    csv.write_text('image,label\n' + 'img.nii.gz,lab.nii.gz\n' * 4)
    cfg = {'dataset': {'task_type': 'seg', 'root_dir': str(fixture_dir),
                       '1_train_csv': str(csv), '1_valid_csv': str(csv),
                       'train_batch_size': 4, 'num_workder': 0,
                       'train_transform': None, 'valid_transform': None},
           'network': {'num_domains': 1, 'class_num': 2},
           'training': {'ckpt_save_dir': str(tmp_path)},
           'testing': {'ckpt_mode': 0}}
    monkeypatch.setattr(mh, 'process_info', lambda: (0, 2))
    agent = SegmentationAgent(dict(cfg), 'train')
    agent.create_dataset()
    batch = next(iter(agent.train_loaders[0]))
    assert batch['image'].shape[0] == 2          # local half of global 4
    assert len(agent.train_loaders[0].dataset) == 2   # manifest shard

    cfg['dataset']['train_batch_size'] = 3
    agent2 = SegmentationAgent(dict(cfg), 'train')
    with pytest.raises(ValueError, match='must divide'):
        agent2.create_dataset()


def test_maybe_initialize_gating(monkeypatch):
    # no multihost key, no env -> no-op
    assert maybe_initialize_distributed({'training': {}}) is False
    # single-process info works without distributed init
    idx, cnt = process_info()
    assert idx == 0 and cnt >= 1
