"""Classification agent (reference PyMIC/pymic/net_run/agent_cls.py:22-349,
byte-identical copy in net_run_dsbn/).

Tasks ``cls`` (softmax/argmax) and ``cls_nexcl`` (sigmoid/threshold 0.5);
accuracy metric; inference writes an ``image,label`` CSV plus an optional
probability CSV. The per-iteration work is a jitted train step.
"""
from __future__ import annotations

import csv
import logging
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax

from fpl_plus_tpu.agents.agent_abstract import NetRunAgent
from fpl_plus_tpu.engine import ckpt as ckpt_lib
from fpl_plus_tpu.engine.optim import PlateauScheduler, create_optimizer
from fpl_plus_tpu.engine.train import create_train_state
from fpl_plus_tpu.io.dataset import ClassificationDataset
from fpl_plus_tpu.io.loader import repeat_loader
from fpl_plus_tpu.losses.cls import ClsLossDict
from fpl_plus_tpu.models.cls_nets import TorchClsNetDict
from fpl_plus_tpu.utils.scalar_writer import ScalarWriter


def to_channels_last(x):
    return jnp.asarray(np.moveaxis(np.asarray(x, np.float32), 1, -1))


class ClassificationAgent(NetRunAgent):
    def __init__(self, config: dict, stage: str = 'train'):
        super().__init__(config, stage)
        self.loss_dict = ClsLossDict
        self.net_dict = TorchClsNetDict
        self.module = None
        self.variables = None
        self.task = config['dataset'].get('task_type', 'cls')

    def task_type(self) -> str:
        return 'classification'

    def get_stage_dataset_from_config(self, stage):
        data_cfg = self.config['dataset']
        real_stage = stage.split('_')[-1]
        transform = self.build_transform(real_stage)
        csv_file = data_cfg.get(stage + '_csv', None) or data_cfg.get(
            real_stage + '_csv', None)
        return ClassificationDataset(
            root_dir=data_cfg['root_dir'], csv_file=csv_file,
            modal_num=data_cfg.get('modal_num', 1),
            class_num=self.config['network']['class_num'],
            with_label=(real_stage != 'test'), transform=transform)

    def create_network(self):
        net_cfg = self.config['network']
        net_name = net_cfg['net_type']
        if net_name not in self.net_dict:
            raise ValueError('Undefined network {0}'.format(net_name))
        self.module = self.net_dict[net_name](net_cfg)
        chns = net_cfg.get('input_chns', 3)
        x = jnp.zeros((1, 64, 64, chns), jnp.float32)
        rngs = {'params': jax.random.PRNGKey(self.random_seed),
                'dropout': jax.random.PRNGKey(self.random_seed + 1)}
        import flax.core
        variables = flax.core.unfreeze(self.module.init(rngs, x, None, False))
        self.variables = {'params': variables.get('params', {}),
                          'batch_stats': variables.get('batch_stats', {})}
        if net_cfg.get('pretrain', False):
            # the reference downloads torchvision ImageNet weights
            # (torch_pretrained_net.py:30-40); zero-egress here, so
            # [network] pretrained_path supplies the .pth to convert —
            # backbone transplanted, head (and first conv when
            # input_chns != 3) fresh, mirroring the reference replacement
            path = net_cfg.get('pretrained_path', None)
            if path:
                from fpl_plus_tpu.utils.torch_convert import (
                    load_torchvision_pretrained, transplant_params)
                p, s = load_torchvision_pretrained(net_name, path, net_cfg)
                n = transplant_params(self.variables['params'], p)
                n += transplant_params(self.variables['batch_stats'], s)
                logging.info('transplanted %d pretrained tensors from %s',
                             n, path)
            else:
                logging.warning(
                    'pretrain=True but no [network] pretrained_path set; '
                    'random init (zero-egress: cannot download torchvision '
                    'weights)')

    def _loss_calculator(self):
        loss_name = self.config['training'].get('loss_type',
                                                'CrossEntropyLoss')
        if loss_name not in self.loss_dict:
            raise ValueError('Undefined loss function {0}'.format(loss_name))
        return self.loss_dict[loss_name](self.config['training'])

    def _score(self, logits: np.ndarray, labels: np.ndarray) -> float:
        if self.task == 'cls':
            preds = np.argmax(logits, axis=1)
            return float(np.mean(preds == labels))
        preds = (1 / (1 + np.exp(-logits))) > 0.5
        return float(np.mean(preds == labels))

    def train_valid(self):
        cfg_t = self.config['training']
        ckpt_dir = cfg_t['ckpt_save_dir']
        ckpt_prefix = ckpt_lib.ckpt_prefix_of(self.config)
        iter_start = cfg_t.get('iter_start', 0)
        iter_max = cfg_t['iter_max']
        iter_valid = cfg_t['iter_valid']
        sched = dict(cfg_t)
        sched['last_iter'] = -1   # restored optax state carries the count
        optimizer = create_optimizer(cfg_t, sched)
        plateau = PlateauScheduler(dict(sched, iter_valid=iter_valid))
        state = create_train_state(self.variables['params'],
                                   self.variables['batch_stats'], optimizer)
        if iter_start > 0:
            # resume: restore weights/stats/optimizer and the best score
            # (reference agent_cls.py:228-236)
            path = '{0}/{1}_{2}.ckpt'.format(ckpt_dir, ckpt_prefix,
                                             iter_start)
            loaded = ckpt_lib.load_checkpoint(path, {
                'params': state.params, 'batch_stats': state.batch_stats,
                'opt_state': state.opt_state})
            state = state.replace(params=loaded['state']['params'],
                                  batch_stats=loaded['state']['batch_stats'],
                                  opt_state=loaded['state']['opt_state'])
            logging.info('resumed from %s', path)
        loss_calc = self._loss_calculator()
        # [training] precision = bfloat16: bf16 compute, f32 master state
        # (utils/precision.py) — same policy as the segmentation agents
        from fpl_plus_tpu.utils.precision import cast_apply_fn, resolve_dtype
        apply_fn = cast_apply_fn(
            self.module.apply,
            resolve_dtype(self.config['training'].get('precision',
                                                      'float32')))

        @jax.jit
        def train_step(state, batch, rng):
            def loss_fn(params):
                out, upd = apply_fn(
                    {'params': params, 'batch_stats': state.batch_stats},
                    batch['image'], None, True,
                    rngs={'dropout': rng}, mutable=['batch_stats'])
                loss = loss_calc({'prediction': out,
                                  'ground_truth': batch['label']})
                return loss, (out, upd['batch_stats'])
            (loss, (out, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            return state.replace(step=state.step + 1,
                                 params=optax.apply_updates(state.params,
                                                            updates),
                                 batch_stats=bs, opt_state=opt_state), \
                loss, out

        @jax.jit
        def eval_fwd(params, batch_stats, x):
            return apply_fn({'params': params, 'batch_stats': batch_stats},
                            x, None, False)

        writer = ScalarWriter(ckpt_dir)
        ckpt_writer = ckpt_lib.CheckpointWriter()   # async atomic saves
        train_iter = repeat_loader(self.train_loaders[0])
        rng = jax.random.PRNGKey(self.random_seed)
        metrics_name = cfg_t.get('evaluation_metric', 'accuracy')
        try:
            self._cls_train_loop(
                state, train_iter, rng, iter_start, iter_max, iter_valid,
                train_step, eval_fwd, loss_calc, plateau, cfg_t, writer,
                ckpt_writer, ckpt_dir, ckpt_prefix, metrics_name)
        finally:
            try:
                # aborted runs keep every SUBMITTED checkpoint durable
                ckpt_writer.close()   # no-op on the success path
            except BaseException:
                logging.exception(
                    'checkpoint writer close failed during unwind')

    def _cls_train_loop(self, state, train_iter, rng, iter_start, iter_max,
                        iter_valid, train_step, eval_fwd, loss_calc,
                        plateau, cfg_t, writer, ckpt_writer, ckpt_dir,
                        ckpt_prefix, metrics_name):
        max_score, max_it = -1.0, iter_start
        best_host = None
        for block in range(iter_start, iter_max, iter_valid):
            run_loss, run_score, n = 0.0, 0.0, 0
            for _ in range(iter_valid):
                data = next(train_iter)
                batch = {'image': to_channels_last(data['image']),
                         'label': jnp.asarray(np.asarray(data['label']))}
                rng, sub = jax.random.split(rng)
                state, loss, out = train_step(state, batch, sub)
                bn = batch['label'].shape[0]
                n += bn
                run_loss += float(loss) * bn
                run_score += self._score(np.asarray(out),
                                         np.asarray(data['label'])) * bn
            train_scalars = {'loss': run_loss / n, metrics_name: run_score / n}
            # validation
            v_loss, v_score, vn = 0.0, 0.0, 0
            for data in self.valid_loaders[0]:
                x = to_channels_last(data['image'])
                labels = np.asarray(data['label'])
                out = eval_fwd(state.params, state.batch_stats, x)
                loss = loss_calc({'prediction': out,
                                  'ground_truth': jnp.asarray(labels)})
                bn = labels.shape[0]
                vn += bn
                v_loss += float(loss) * bn
                v_score += self._score(np.asarray(out), labels) * bn
            valid_scalars = {'loss': v_loss / vn, metrics_name: v_score / vn}
            glob_it = block + iter_valid
            writer.add_scalars('loss', {'train': train_scalars['loss'],
                                        'valid': valid_scalars['loss']},
                               glob_it)
            writer.add_scalars(metrics_name,
                               {'train': train_scalars[metrics_name],
                                'valid': valid_scalars[metrics_name]},
                               glob_it)
            logging.info('it %d train loss %.4f %s %.4f | valid loss %.4f '
                         '%s %.4f', glob_it, train_scalars['loss'],
                         metrics_name, train_scalars[metrics_name],
                         valid_scalars['loss'], metrics_name,
                         valid_scalars[metrics_name])
            if plateau.enabled:
                scale = plateau.step(valid_scalars[metrics_name])
                try:
                    state.opt_state.hyperparams['learning_rate'] = \
                        jnp.asarray(cfg_t['learning_rate'] * scale,
                                    jnp.float32)
                except Exception:
                    pass
            if valid_scalars[metrics_name] > max_score:
                max_score = valid_scalars[metrics_name]
                max_it = glob_it
                best_host = jax.tree_util.tree_map(
                    np.asarray, {'params': state.params,
                                 'batch_stats': state.batch_stats})
            ckpt_writer.submit(
                ckpt_dir, ckpt_prefix, glob_it,
                {'params': state.params, 'batch_stats': state.batch_stats,
                 'opt_state': state.opt_state},
                valid_scalars[metrics_name])
        if best_host is not None:
            ckpt_writer.submit(
                ckpt_dir, ckpt_prefix, max_it,
                {'params': best_host['params'],
                 'batch_stats': best_host['batch_stats'],
                 'opt_state': state.opt_state}, max_score,
                update_latest=False)
        ckpt_writer.close()   # artifacts durable before the pointer write
        ckpt_lib.write_best_pointer(ckpt_dir, ckpt_prefix, max_it)
        writer.close()
        self.variables = {'params': state.params,
                          'batch_stats': state.batch_stats}

    def infer(self):
        cfg_test = self.config['testing']
        ckpt_name = ckpt_lib.get_checkpoint_name(self.config)
        template = {'params': self.variables['params'],
                    'batch_stats': self.variables['batch_stats']}
        loaded = ckpt_lib.load_checkpoint(ckpt_name, template)
        params = loaded['state']['params']
        batch_stats = loaded['state']['batch_stats']
        # [testing] precision = bfloat16: params/input cast inside the
        # jitted forward, f32 logits out (utils/precision.py)
        from fpl_plus_tpu.utils.precision import cast_apply_fn, resolve_dtype
        apply_fn = cast_apply_fn(
            self.module.apply,
            resolve_dtype(self.config.get('testing', {}).get(
                'precision', 'float32')))

        @jax.jit
        def fwd(x):
            return apply_fn({'params': params, 'batch_stats': batch_stats},
                            x, None, False)

        output_csv = cfg_test['output_csv']
        class_num = self.config['network']['class_num']
        save_prob = cfg_test.get('save_probability', False)
        out_lab_list, out_prob_list, times = [], [], []
        for data in self.test_loader:
            names = data['names']
            x = to_channels_last(data['image'])
            t0 = time.time()
            logits = np.asarray(fwd(x))
            times.append(time.time() - t0)
            if self.task == 'cls':
                e = np.exp(logits - logits.max(axis=1, keepdims=True))
                prob = e / e.sum(axis=1, keepdims=True)
                lab = np.argmax(prob, axis=1)
            else:
                prob = 1 / (1 + np.exp(-logits))
                lab = np.asarray(prob > 0.5, np.uint8)
            for i, name in enumerate(names):
                row = [name] + ([lab[i]] if self.task == 'cls'
                                else lab[i].tolist())
                out_lab_list.append(row)
                out_prob_list.append([name] + prob[i].tolist())
        with open(output_csv, 'w') as f:
            w = csv.writer(f, delimiter=',', quotechar='"',
                           quoting=csv.QUOTE_MINIMAL)
            head = ['image', 'label'] if len(out_lab_list[0]) == 2 else \
                ['image'] + ['label{0}'.format(i) for i in range(class_num)]
            w.writerow(head)
            w.writerows(out_lab_list)
        if save_prob:
            with open(output_csv.replace('.csv', '_prob.csv'), 'w') as f:
                w = csv.writer(f, delimiter=',', quotechar='"',
                               quoting=csv.QUOTE_MINIMAL)
                w.writerow(['image'] + ['prob{0}'.format(i)
                                        for i in range(class_num)])
                w.writerows(out_prob_list)
        arr = np.asarray(times)
        logging.info('testing time %s +/- %s', arr.mean(), arr.std())
