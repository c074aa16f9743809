"""Classification agent end-to-end: train a small ResNet18 on synthetic 2D
images (bright vs dark), infer to the output CSV."""
import os

import numpy as np
import pytest



@pytest.fixture(scope='module')
def cls_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp('cls')
    from PIL import Image
    rs = np.random.RandomState(3)
    os.makedirs(root / 'img')
    rows_train, rows_valid, rows_test = [], [], []
    for i in range(12):
        label = i % 2
        img = np.clip(rs.normal(64 + label * 128, 20, size=(32, 32)), 0,
                      255).astype(np.uint8)
        name = 'img/c{0}.png'.format(i)
        Image.fromarray(img).save(str(root / name))
        row = '{0},{1}'.format(name, label)
        (rows_train if i < 8 else rows_valid if i < 10 else rows_test).append(row)
    (root / 'train.csv').write_text('image,label\n' + '\n'.join(rows_train) + '\n')
    (root / 'valid.csv').write_text('image,label\n' + '\n'.join(rows_valid) + '\n')
    (root / 'test.csv').write_text('image\n' + '\n'.join(
        r.split(',')[0] for r in rows_test) + '\n')
    return root


def test_cls_agent_train_and_infer(cls_workspace):
    from fpl_plus_tpu.agents.agent_cls import ClassificationAgent
    root = cls_workspace
    config = {
        'dataset': {'task_type': 'cls', 'root_dir': str(root),
                    'modal_num': 1,
                    'train_csv': str(root / 'train.csv'),
                    'valid_csv': str(root / 'valid.csv'),
                    'test_csv': str(root / 'test.csv'),
                    'train_batch_size': 4, 'num_workder': 0,
                    'train_transform': None, 'valid_transform': None,
                    'test_transform': None},
        'network': {'net_type': 'resnet18', 'class_num': 2,
                    'input_chns': 1, 'pretrain': False},
        'training': {'loss_type': 'CrossEntropyLoss', 'optimizer': 'Adam',
                     'learning_rate': 1e-3, 'momentum': 0.9,
                     'weight_decay': 0.0, 'lr_scheduler': None,
                     'iter_start': 0, 'iter_max': 6, 'iter_valid': 3,
                     'ckpt_save_dir': str(root / 'model' / 'cls')},
        'testing': {'ckpt_mode': 1, 'output_csv': str(root / 'pred.csv'),
                    'save_probability': True},
    }
    agent = ClassificationAgent(config, 'train')
    agent.run()
    assert (root / 'model' / 'cls' / 'cls_best.txt').exists()

    agent2 = ClassificationAgent(config, 'test')
    agent2.create_network()
    agent2.run()
    lines = (root / 'pred.csv').read_text().strip().split('\n')
    assert lines[0] == 'image,label'
    assert len(lines) == 3
    prob_lines = (root / 'pred_prob.csv').read_text().strip().split('\n')
    assert prob_lines[0] == 'image,prob0,prob1'
