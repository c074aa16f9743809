"""Command-line entry points.

Parity with the reference runners:

* ``python -m fpl_plus_tpu.cli {train,test} cfg`` mirrors the FPL+ runner
  (PyMIC/pymic/net_run_dsbn/net_run.py:11-43): parse + synchronize config,
  set up file+stdout logging in ``ckpt_save_dir``, run the stage agent, and
  after training auto-run a test stage plus ``eva_main`` evaluation.
* Console-script style helpers ``main_run`` (pymic_run), ``main_eval_seg``
  (pymic_eval_seg) for the standard runner/evaluator CLIs
  (PyMIC/setup.py:30-39).

Task dispatch follows ``config['dataset']['task_type']``: ``seg`` ->
SegmentationAgent, ``cls``/``cls_nexcl`` -> ClassificationAgent.
"""
from __future__ import annotations

import logging
import os
import sys

from fpl_plus_tpu.config.parser import (logging_config, parse_config,
                                        synchronize_config)


def _respect_platform_env() -> None:
    """Re-assert an explicit ``JAX_PLATFORMS`` env request at the config
    level. Ambient tooling (e.g. a device-tunnel sitecustomize on
    PYTHONPATH) can set ``jax.config jax_platforms`` at interpreter
    start, and the config value BEATS the env var — which silently moves
    a 'cpu'-pinned run (multihost tests, virtual-mesh dryruns) onto the
    ambient device backend."""
    plat = os.environ.get('JAX_PLATFORMS')
    if plat:
        import jax
        if str(jax.config.jax_platforms or '') != plat:
            jax.config.update('jax_platforms', plat)


def _enable_compilation_cache() -> None:
    """Persist XLA executables across processes (the remote TPU compile of
    the sliding-window program is minutes-long; with the cache a fresh
    ``test`` stage reuses the binary from a previous run).

    Two hardenings, both against reproduced in-process segfaults (nothing
    checksums the payload XLA (de)serializes):

    * the persistent cache is NOT enabled on the cpu backend: jaxlib
      0.9's XLA:CPU cannot round-trip MULTI-DEVICE (SPMD mesh)
      executables — serialization segfaults in
      ``put_executable_and_time``, and when it does succeed the written
      bytes segfault the next run's ``get_executable_and_time``
      (reproduced both ways on the 8-device mesh CLI train step;
      single-device entries were fine). CPU compiles are seconds — the
      cache exists for the minutes-long TPU tunnel compiles. An
      explicitly exported ``JAX_COMPILATION_CACHE_DIR`` is still
      honoured on any backend — made safe by the SPMD-on-CPU guard
      harden_compilation_cache installs (multi-device cpu executables
      skip the cache entirely; single-device entries cache normally).
    * entry writes are made ATOMIC (``utils/jaxcache.py`` — jax's stock
      put writes straight to the final path, so a killed writer or a
      concurrent reader in another process sees a truncated executable).
    """
    try:
        from fpl_plus_tpu.utils.jaxcache import harden_compilation_cache
        harden_compilation_cache()
        import jax
        if 'JAX_COMPILATION_CACHE_DIR' in os.environ:
            cache_dir = os.environ['JAX_COMPILATION_CACHE_DIR']
        elif jax.default_backend() == 'cpu':
            return
        else:
            cache_dir = '/tmp/jaxcache'
        os.environ['JAX_COMPILATION_CACHE_DIR'] = cache_dir
        jax.config.update('jax_compilation_cache_dir', cache_dir)
    except Exception:   # pragma: no cover - cache is best-effort
        pass


def _setup_logging(log_path: str) -> None:
    os.makedirs(os.path.dirname(log_path) or '.', exist_ok=True)
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)
    root.addHandler(logging.FileHandler(log_path, mode='a'))
    root.addHandler(logging.StreamHandler(sys.stdout))


def _make_agent(config: dict, stage: str):
    task = config['dataset'].get('task_type', 'seg')
    if task == 'seg':
        from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
        return SegmentationAgent(config, stage)
    if task in ('cls', 'cls_nexcl'):
        from fpl_plus_tpu.agents.agent_cls import ClassificationAgent
        return ClassificationAgent(config, stage)
    raise ValueError('Undefined task type {0}'.format(task))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print('Number of arguments should be 2. e.g.\n'
              '   python -m fpl_plus_tpu.cli train config.cfg')
        return 1
    stage, cfg_file = argv[0], argv[1]
    assert stage in ('train', 'inference', 'test')
    if not os.path.isfile(cfg_file):
        raise ValueError('The config file does not exist: {0}'.format(
            cfg_file))
    config = parse_config(cfg_file)
    config = synchronize_config(config)
    # multi-host first: jax.distributed must initialize before any
    # backend use ([training] multihost / FPLX_COORDINATOR env)
    from fpl_plus_tpu.parallel.multihost import maybe_initialize_distributed
    _respect_platform_env()
    maybe_initialize_distributed(config)
    _enable_compilation_cache()
    from fpl_plus_tpu.utils.precision import apply_matmul_precision
    apply_matmul_precision(config, stage)
    log_dir = config['training']['ckpt_save_dir']
    os.makedirs(log_dir, exist_ok=True)
    _setup_logging('{0}/log_{1}.txt'.format(log_dir, stage))
    logging_config(config)

    agent = _make_agent(config, stage)
    try:
        agent.run()
    except Exception:
        # surface the failure through the flushed logging handlers: on a
        # remote-device backend, teardown after an uncaught exception can
        # hang with the buffered stderr traceback never reaching the user
        logging.exception('%s stage failed', stage)
        raise

    # after training, auto-run the test stage + evaluation
    # (reference net_run_dsbn/net_run.py:37-40)
    if stage != 'test' and config['dataset'].get('task_type', 'seg') == 'seg':
        agent2 = _make_agent(config, 'test')
        agent2.variables = agent.variables
        agent2.run()
        if 'evaluation' in config:
            from fpl_plus_tpu.parallel.multihost import is_primary_host
            if is_primary_host():   # shared-storage CSVs: one writer
                from fpl_plus_tpu.metrics.evaluate import eva_main
                eva_main(config)
    # absorb cross-process wall-clock skew and close the coordination
    # service while still aligned (see multihost.finalize_distributed)
    from fpl_plus_tpu.parallel.multihost import finalize_distributed
    finalize_distributed()
    return 0


def _paradigm_main(argv, section, method_key, registry_getter, usage):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print('Number of arguments should be 3. e.g.\n   ' + usage)
        return 1
    stage, cfg_file = argv[0], argv[1]
    config = parse_config(cfg_file)
    config = synchronize_config(config)
    from fpl_plus_tpu.parallel.multihost import maybe_initialize_distributed
    _respect_platform_env()
    maybe_initialize_distributed(config)
    _enable_compilation_cache()
    from fpl_plus_tpu.utils.precision import apply_matmul_precision
    apply_matmul_precision(config, stage)
    log_dir = config['training']['ckpt_save_dir']
    os.makedirs(log_dir, exist_ok=True)
    _setup_logging('{0}/log_{1}.txt'.format(log_dir, stage))
    logging_config(config)
    method = config[section][method_key]
    registry = registry_getter()
    if method not in registry:
        raise ValueError('Undefined {0} method {1}'.format(section, method))
    agent = registry[method](config, stage)
    agent.run()
    # same skew absorption as main()
    from fpl_plus_tpu.parallel.multihost import finalize_distributed
    finalize_distributed()
    return 0


def main_ssl(argv=None):
    """pymic_ssl equivalent (reference net_run_ssl/ssl_main.py:23-48)."""
    def reg():
        from fpl_plus_tpu.agents.ssl import SSLMethodDict
        return SSLMethodDict
    return _paradigm_main(argv, 'semi_supervised_learning', 'ssl_method',
                          reg, 'fpl-ssl train config.cfg')


def main_wsl(argv=None):
    """pymic_wsl equivalent (reference net_run_wsl/wsl_main.py)."""
    def reg():
        from fpl_plus_tpu.agents.wsl import WSLMethodDict
        return WSLMethodDict
    return _paradigm_main(argv, 'weakly_supervised_learning', 'wsl_method',
                          reg, 'fpl-wsl train config.cfg')


def main_nll(argv=None):
    """pymic_nll equivalent (reference net_run_nll/nll_main.py)."""
    def reg():
        from fpl_plus_tpu.agents.nll import NLLMethodDict
        return NLLMethodDict
    return _paradigm_main(argv, 'noisy_label_learning', 'nll_method',
                          reg, 'fpl-nll train config.cfg')


def main_nll_clslsr(argv=None):
    """The CLSLSR confidence-map driver (reference
    net_run_nll/nll_clslsr.py:149-205, ``python nll_clslsr.py cfg``):
    inference over the train manifest with the checkpointed model,
    confident-learning noise masks written as ``<root_dir>/slsr_conf/``
    weight maps, and the ``<train_csv>_clslsr.csv`` retrain manifest for
    SLSRLoss. Usage: ``fpl_nll_clslsr config.cfg``."""
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print('Number of arguments should be 2. e.g.\n'
              '   fpl_nll_clslsr config.cfg')
        return 1
    cfg_file = argv[-1]   # accept an optional leading stage token
    if not os.path.isfile(cfg_file):
        raise ValueError('The config file does not exist: {0}'.format(
            cfg_file))
    config = parse_config(cfg_file)
    config = synchronize_config(config)
    from fpl_plus_tpu.parallel.multihost import maybe_initialize_distributed
    _respect_platform_env()
    maybe_initialize_distributed(config)
    _enable_compilation_cache()
    from fpl_plus_tpu.utils.precision import apply_matmul_precision
    apply_matmul_precision(config, 'test')
    log_dir = config['training']['ckpt_save_dir']
    os.makedirs(log_dir, exist_ok=True)
    _setup_logging('{0}/log_clslsr.txt'.format(log_dir))
    logging_config(config)
    from fpl_plus_tpu.agents.nll_clslsr import run_get_confidence_map
    run_get_confidence_map(config)
    from fpl_plus_tpu.parallel.multihost import finalize_distributed
    finalize_distributed()
    return 0


def main_eval_seg(argv=None):
    """pymic_eval_seg-compatible CLI (evaluation only)."""
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print('Usage: fpl_eval_seg config.cfg')
        return 1
    config = parse_config(argv[0])
    from fpl_plus_tpu.metrics.evaluate import eva_main
    eva_main(config)
    return 0


def main_convert(argv=None):
    """Convert a reference PyTorch checkpoint into this framework's format:

        fpl_convert reference.pt experiment.cfg out_dir/prefix_40000.ckpt

    The [network] section of the cfg describes the architecture; the output
    follows the pointer-file checkpoint contract (usable for iter_start
    resume and ckpt_mode inference).
    """
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print('Usage: fpl_convert reference.pt config.cfg out/prefix_IT.ckpt')
        return 1
    config = parse_config(argv[1])
    from fpl_plus_tpu.utils.torch_convert import convert_reference_checkpoint
    convert_reference_checkpoint(argv[0], config['network'], argv[2])
    logging.info('converted %s -> %s', argv[0], argv[2])
    return 0


def main_eval_cls(argv=None):
    """pymic_eval_cls-compatible CLI (reference util/evaluation_cls.py:
    159-192): binary or non-exclusive classification metrics from the
    [evaluation] section."""
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print('Usage: fpl_eval_cls config.cfg')
        return 1
    config = parse_config(argv[0])['evaluation']
    from fpl_plus_tpu.metrics.cls_metrics import (binary_evaluation,
                                                  nexcl_evaluation)
    task = config.get('task_type', 'cls')
    if task == 'cls':
        binary_evaluation(config)
    else:
        nexcl_evaluation(config)
    return 0


if __name__ == '__main__':
    sys.exit(main())
