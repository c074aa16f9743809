"""Training-DYNAMICS parity study (VERDICT r4 #3).

Where tools/dice_parity.py proves that identical WEIGHTS produce identical
predictions/metrics through the two stacks, this study trains FROM SCRATCH
in BOTH stacks — same fixture recipe, same config file, N seeds each — and
compares (a) the valid-Dice trajectories and (b) the final test-stage Dice
on two cases: the held-out test volume and the overfit TRAINING volume
(the non-degenerate operating point; manifests from dice_parity).

Exact RNG-stream parity across frameworks is impossible (torch vs jax
samplers; SURVEY 7.4 hard part 5) — the claim is STATISTICAL: the two
stacks' final-Dice distributions over seeds overlap (gap between means
within ~1 pooled std, and within the 0.5-pt north star at the high-Dice
operating point when the spread allows).

Run each side in a subprocess (the reference run monkeypatches torch and
installs import shims — isolation keeps ours clean):

    python tools/train_dynamics_parity.py WORK            # full study
    python tools/train_dynamics_parity.py WORK --report   # re-print only

Child modes (internal): ``--one {ref,ours} SEED WORK ITERS``.
"""
import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SEEDS = (1, 2, 3, 4, 5, 6, 7)
ITERS = 300
ITER_VALID = 50
# bootstrap acceptance (VERDICT r4 #6): the 95% CI on mean(ours) - mean(ref)
# final Dice must exclude values below -0.05 on every case
CI_FLOOR = -0.05
N_BOOT = 10000


def run_one(kind: str, seed: int, work: str, iters: int) -> None:
    import dice_parity
    dice_parity.write_workspace(work)
    side = '{0}_s{1}'.format(kind, seed)
    if kind == 'ref':
        dice_parity.run_reference(work, side=side, seed=seed,
                                  iter_max=iters, iter_valid=ITER_VALID)
    else:
        cfg = dice_parity.write_cfg(work, side, iter_max=iters,
                                    iter_valid=ITER_VALID, seed=seed)
        from fpl_plus_tpu.cli import main
        rc = main(['train', cfg])
        assert rc == 0


def launch(kind: str, seed: int, work: str, iters: int):
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO
    env['JAX_PLATFORMS'] = 'cpu'
    env.setdefault('XLA_FLAGS', '--xla_cpu_parallel_codegen_split_count=1')
    log = open(os.path.join(work, '{0}_s{1}.log'.format(kind, seed)), 'w')
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), '--one', kind,
         str(seed), work, str(iters)],
        env=env, stdout=log, stderr=subprocess.STDOUT)


def valid_trajectory(work: str, kind: str, seed: int):
    """[(iter, valid_dice)] — ours from scalars.jsonl, reference from its
    train log ('valid loss X, avg dice Y' per iter_valid block)."""
    side = '{0}_s{1}'.format(kind, seed)
    model_dir = os.path.join(work, side, 'model', 'parity')
    traj = []
    if kind == 'ours':
        path = os.path.join(model_dir, 'scalars.jsonl')
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec['tag'] == 'dice':
                        traj.append((rec['step'], rec['valid']))
    else:
        path = os.path.join(model_dir, 'log_train.txt')
        if os.path.exists(path):
            it = 0
            with open(path) as f:
                for line in f:
                    m = re.match(r'.*\bit (\d+)$', line.strip())
                    if m:
                        it = int(m.group(1))
                    m = re.match(r'valid loss [\d.eE+-]+, avg dice '
                                 r'([\d.eE+-]+)', line.strip())
                    if m:
                        traj.append((it, float(m.group(1))))
    return traj


def final_scores(work: str, kind: str, seed: int):
    side = '{0}_s{1}'.format(kind, seed)
    csv = os.path.join(work, side, 'results', 'parity_test_hrT2',
                       'test_tumor_dice_all.csv')
    rows = {}
    with open(csv) as f:
        next(f)
        for line in f:
            parts = line.strip().split(',')
            if parts[0] and parts[0] not in ('mean', 'std'):
                rows[parts[0]] = float(parts[1])
    return rows


def _bootstrap_ci(ours, ref, n_boot=N_BOOT, alpha=0.05, seed=0):
    """Percentile bootstrap CI on mean(ours) - mean(ref), resampling seeds
    with replacement independently per stack."""
    rs = np.random.RandomState(seed)
    o = np.asarray(ours, dtype=np.float64)
    r = np.asarray(ref, dtype=np.float64)
    diffs = (o[rs.randint(0, len(o), (n_boot, len(o)))].mean(1)
             - r[rs.randint(0, len(r), (n_boot, len(r)))].mean(1))
    return (float(np.percentile(diffs, 100 * alpha / 2)),
            float(np.percentile(diffs, 100 * (1 - alpha / 2))))


def report(work: str) -> int:
    cases = {}
    for kind in ('ref', 'ours'):
        for seed in SEEDS:
            try:
                for name, val in final_scores(work, kind, seed).items():
                    cases.setdefault(name, {}).setdefault(kind, []).append(val)
            except FileNotFoundError:
                print('MISSING: {0} seed {1}'.format(kind, seed))
    print('\n========== training-dynamics parity (final test-stage Dice, '
          '{0} seeds) =========='.format(len(SEEDS)))
    print('{0:<28}{1:>22}{2:>22}{3:>10}{4:>22}'.format(
        'case', 'reference mean+-std', 'ours mean+-std', 'gap',
        '95% CI (ours-ref)'))
    ok = True
    for name, sides in sorted(cases.items()):
        r = np.asarray(sides.get('ref', [np.nan]))
        o = np.asarray(sides.get('ours', [np.nan]))
        gap = abs(r.mean() - o.mean())
        lo, hi = _bootstrap_ci(o, r)
        # acceptance: the CI on (ours - ref) excludes values below CI_FLOOR
        # — i.e. we are statistically confident ours is not >5 Dice points
        # behind the reference on this case (VERDICT r4 #6)
        line_ok = lo >= CI_FLOOR
        ok &= line_ok
        print('{0:<28}{1:>14.4f}+-{2:.4f}{3:>14.4f}+-{4:.4f}{5:>9.4f}'
              '{6:>11.4f},{7:>8.4f} {8}'
              .format(name, r.mean(), r.std(), o.mean(), o.std(), gap,
                      lo, hi, 'OK' if line_ok
                      else 'CI floor %.3f violated' % CI_FLOOR))

    # trajectory-LEVEL statistic: mean valid-Dice over the whole run per
    # seed (not just the endpoint), same bootstrap acceptance
    print('\ntrajectory-mean valid Dice over the run:')
    tmeans = {}
    for k in ('ref', 'ours'):
        vals = []
        for s in SEEDS:
            traj = [v for _, v in valid_trajectory(work, k, s)]
            if traj:
                vals.append(float(np.mean(traj)))
        tmeans[k] = vals
    r = np.asarray(tmeans['ref'])
    o = np.asarray(tmeans['ours'])
    if len(r) >= 2 and len(o) >= 2:
        print('  (n: ref {0}, ours {1})'.format(len(r), len(o)))
        lo, hi = _bootstrap_ci(o, r)
        line_ok = lo >= CI_FLOOR
        ok &= line_ok
        print('  ref {0:.4f}+-{1:.4f}  ours {2:.4f}+-{3:.4f}  '
              '95% CI(ours-ref) [{4:.4f}, {5:.4f}] {6}'.format(
                  r.mean(), r.std(), o.mean(), o.std(), lo, hi,
                  'OK' if line_ok else 'CI floor violated'))
    else:
        print('  (incomplete trajectories)')

    print('\nvalid-dice trajectories (iter: ref seeds | ours seeds):')
    trajs = {k: {s: dict(valid_trajectory(work, k, s)) for s in SEEDS}
             for k in ('ref', 'ours')}
    its = sorted({it for k in trajs for s in trajs[k]
                  for it in trajs[k][s]})
    for it in its:
        rvals = ['%.3f' % trajs['ref'][s][it]
                 for s in SEEDS if it in trajs['ref'][s]]
        ovals = ['%.3f' % trajs['ours'][s][it]
                 for s in SEEDS if it in trajs['ours'][s]]
        print('  it {0:>5}:  {1}  |  {2}'.format(
            it, ' '.join(rvals) or '-', ' '.join(ovals) or '-'))
    print('\nverdict:', 'PASS' if ok else 'FAIL')
    return 0 if ok else 1


def main():
    if len(sys.argv) > 1 and sys.argv[1] == '--one':
        run_one(sys.argv[2], int(sys.argv[3]), sys.argv[4],
                int(sys.argv[5]))
        return
    work = sys.argv[1] if len(sys.argv) > 1 else '/tmp/fplx_dynamics'
    os.makedirs(work, exist_ok=True)
    if '--report' not in sys.argv:
        import dice_parity
        dice_parity.write_workspace(work)
        # strictly sequential: this host has ONE core — parallel runs only
        # add contention (BASELINE.md host-pipeline note). Completed sides
        # (results CSV present) are skipped, so the study resumes cheaply
        # after an interruption.
        # seed-major order so an interrupted study still yields a BALANCED
        # sample (n complete seeds in both stacks) for the bootstrap CI
        for s in SEEDS:
            for kind in ('ref', 'ours'):
                done = os.path.join(
                    work, '{0}_s{1}'.format(kind, s), 'results',
                    'parity_test_hrT2', 'test_tumor_dice_all.csv')
                if os.path.exists(done):
                    print('skip {0} s{1}: already complete'.format(kind, s))
                    continue
                p = launch(kind, s, work, ITERS)
                assert p.wait() == 0, \
                    '{0} s{1} failed — see logs in {2}'.format(kind, s, work)
    sys.exit(report(work))


if __name__ == '__main__':
    main()
