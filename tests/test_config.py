import os

import pytest

from fpl_plus_tpu.config.parser import (parse_config, parse_value_from_string,
                                        synchronize_config)

pytestmark = pytest.mark.smoke

REF_CFG = '/root/reference/config_dual/data_vs/vs_t1s_g.cfg'


def test_value_typing():
    assert parse_value_from_string('42') == 42
    assert parse_value_from_string('-3') == -3
    assert parse_value_from_string('1e-4') == 1e-4
    assert parse_value_from_string('0.5') == 0.5
    assert parse_value_from_string('True') is True
    assert parse_value_from_string('false') is False
    assert parse_value_from_string('None') is None
    assert parse_value_from_string('[28, 128, 128]') == [28, 128, 128]
    assert parse_value_from_string('[1, 0.5, None, True, abc]') == [1, 0.5, None, True, 'abc']
    assert parse_value_from_string('./results/x') == './results/x'
    assert parse_value_from_string('DiceLoss') == 'DiceLoss'


def test_parse_ini(tmp_path):
    cfg = tmp_path / 'a.cfg'
    cfg.write_text('[dataset]\n'
                   'train_transform = [Pad, RandomCrop]\n'
                   'Pad_output_size = [28, 128, 128]\n'
                   '[network]\nclass_num = 2\n')
    out = parse_config(str(cfg))
    assert out['dataset']['train_transform'] == ['Pad', 'RandomCrop']
    # configparser lower-cases keys
    assert out['dataset']['pad_output_size'] == [28, 128, 128]
    out = synchronize_config(out)
    assert out['dataset']['labeltoprobability_class_num'] == 2


@pytest.mark.skipif(not os.path.isfile(REF_CFG), reason='reference configs absent')
def test_parses_shipped_reference_config():
    cfg = synchronize_config(parse_config(REF_CFG))
    d, n, t, s = cfg['dataset'], cfg['network'], cfg['training'], cfg['testing']
    assert d['dsbn'] is True
    assert d['task_type'] == 'seg'
    assert d['train_batch_size'] == 4
    assert d['train_transform'] == ['NormalizeWithMeanStd', 'Pad', 'RandomCrop',
                                    'RandomFlip', 'LabelToProbability']
    assert d['pad_output_size'] == [28, 128, 128]
    assert d['randomcrop_mask_label'] == [1, 2]
    assert n['net_type'] == 'UNet2D5_dsbn'
    assert n['feature_chns'] == [32, 64, 128, 256, 512]
    assert n['conv_dims'] == [2, 2, 3, 3, 3]
    assert n['dropout'] == [0.0, 0.0, 0.3, 0.4, 0.5]
    assert n['bilinear'] is False
    assert t['learning_rate'] == 1e-4
    assert t['lr_milestones'] == [10000, 20000, 30000, 40000]
    assert t['dual'] is False and t['val_t2'] is True
    assert s['sliding_window_size'] == [28, 128, 128]
    assert s['tta_mode'] == 1 and s['ckpt_mode'] == 1
    assert s['domian_label'] == 1  # sic — key name kept for config parity
