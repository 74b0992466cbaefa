"""Hyperparameter sweeps: run a grid of ExperimentBuilder configs, rank them,
and produce the comparison artifacts.

``python -m morgana_tpu.sweep --model file.py:Class --experiment_name base
--sweep "{'learning_rate': [0.01, 0.003], 'batch_size': [16, 32]}" <builder
flags…>`` trains every combination sequentially (one full ExperimentBuilder
lifecycle each — config.json, checkpoints, metrics.json all land per run
exactly as a hand-launched experiment would), then writes under
``<experiments_base>/<base>-sweep/``:

* ``sweep_summary.json`` — per-run config + final train loss + best valid
  loss/epoch, ranked best-first;
* ``sweep_summary.txt`` — the same as a table;
* ``comparison.pdf`` — every run overlaid on shared metric axes
  (:func:`morgana_tpu.viz.plotting.plot_experiment_set`, the reference's
  multi-experiment comparison tool, ``morgana/viz/plotting.py:90-119`` —
  which the reference made you drive by hand for each comparison).

Runs are plain experiments named ``<base>-k=v,k=v``: resumable, servable and
plottable individually. A run that fails (diverged, OOM) is recorded with
its error and the sweep continues — one bad corner never costs the grid.
"""
import argparse
import itertools
import json
import os
import sys

__all__ = ['expand_grid', 'run_sweep', 'main']


def expand_grid(sweep, mode='grid'):
    """Expands ``{flag: [values…]}`` into a list of config dicts.

    ``mode='grid'``: cartesian product. ``mode='zip'``: position-paired
    (all lists must share one length) — for sweeping coupled settings like
    (learning_rate, batch_size) pairs.
    """
    if not sweep:
        raise ValueError('empty --sweep: give {flag: [values, ...], ...}')
    keys = list(sweep)
    lists = []
    for key in keys:
        values = sweep[key]
        if not isinstance(values, (list, tuple)) or not values:
            raise ValueError(f'--sweep[{key!r}] must be a non-empty list, '
                             f'got {values!r}')
        lists.append(list(values))
    if mode == 'grid':
        combos = itertools.product(*lists)
    elif mode == 'zip':
        lengths = {len(v) for v in lists}
        if len(lengths) != 1:
            raise ValueError(f'zip sweep needs equal-length lists, got '
                             f'lengths {sorted(len(v) for v in lists)}')
        combos = zip(*lists)
    else:
        raise ValueError(f"sweep mode must be 'grid' or 'zip', got {mode!r}")
    return [dict(zip(keys, combo)) for combo in combos]


def _run_name(base, config):
    parts = ','.join(f'{k}={v}' for k, v in sorted(config.items()))
    return f'{base}-{parts}'


def _collect(experiments_base, name):
    """Final train loss + best valid loss/epoch from a run's metrics.json
    files (the on-disk contract both frameworks share)."""
    from morgana_tpu.viz.plotting import load_experiment_results
    out = {}
    train = load_experiment_results(name, 'loss', 'train', experiments_base)
    if train['loss']:
        final_epoch = max(train['loss'])
        out['final_train_loss'] = float(train['loss'][final_epoch])
        out['epochs_trained'] = int(final_epoch)
    valid = load_experiment_results(name, 'loss', 'valid', experiments_base)
    if valid['loss']:
        best_epoch = min(valid['loss'], key=lambda e: valid['loss'][e])
        out['best_valid_loss'] = float(valid['loss'][best_epoch])
        out['best_valid_epoch'] = int(best_epoch)
    return out


def _rank_key(entry):
    # Best valid loss when available, else final train loss; failures last.
    if 'error' in entry:
        return (2, 0.0)
    if 'best_valid_loss' in entry:
        return (0, entry['best_valid_loss'])
    return (1, entry.get('final_train_loss', float('inf')))


def run_sweep(model_class, base_args, sweep, mode='grid', max_runs=32,
              plot=True):
    """Trains every sweep combination and returns the ranked summary list.

    ``base_args`` is a full ExperimentBuilder kwarg dict (as
    ``get_experiment_args`` produces); its ``experiment_name`` becomes the
    sweep's base name. Swept keys override base values per run.
    """
    from morgana_tpu import nn
    from morgana_tpu.experiment_builder import ExperimentBuilder

    unknown = [k for k in sweep if k not in base_args]
    if unknown:
        raise ValueError(f'--sweep keys not in the flag surface: {unknown} '
                         '(a typo here would silently sweep nothing)')
    configs = expand_grid(sweep, mode)
    if len(configs) > max_runs:
        raise ValueError(f'sweep expands to {len(configs)} runs > max_runs='
                         f'{max_runs}; raise --max_runs if intended')

    base_name = base_args['experiment_name']
    experiments_base = base_args.get('experiments_base', 'experiments')
    results = []
    for i, config in enumerate(configs):
        name = _run_name(base_name, config)
        args = dict(base_args, **config, experiment_name=name)
        entry = {'experiment_name': name, 'config': config}
        print(f'[sweep {i + 1}/{len(configs)}] {name}', flush=True)
        try:
            nn.manual_seed(args.get('seed', 1234567890))
            exp = ExperimentBuilder(model_class, **args)
            exp.run_experiment()
            entry.update(_collect(experiments_base, name))
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            entry['error'] = f'{type(exc).__name__}: {exc}'
        results.append(entry)

    results.sort(key=_rank_key)
    sweep_dir = os.path.join(experiments_base, f'{base_name}-sweep')
    os.makedirs(sweep_dir, exist_ok=True)
    summary = {'base_name': base_name, 'mode': mode, 'sweep': sweep,
               'runs': results}
    with open(os.path.join(sweep_dir, 'sweep_summary.json'), 'w') as f:
        json.dump(summary, f, indent=2)
    with open(os.path.join(sweep_dir, 'sweep_summary.txt'), 'w') as f:
        f.write(format_summary(summary) + '\n')

    if plot:
        ok = [r['experiment_name'] for r in results if 'error' not in r]
        if ok:
            try:
                from morgana_tpu.viz.plotting import plot_experiment_set
                axs = plot_experiment_set(ok, 'loss', experiments_base)
                fig = axs[0].get_figure()
                fig.savefig(os.path.join(sweep_dir, 'comparison.pdf'),
                            bbox_inches='tight')
                import matplotlib.pyplot as plt
                plt.close(fig)
            except Exception as exc:  # noqa: BLE001 - plots are best-effort
                print(f'[sweep] comparison plot failed: {exc}',
                      file=sys.stderr)
    return summary


def format_summary(summary):
    rows = [('rank', 'experiment', 'final_train_loss', 'best_valid_loss',
             'best_epoch', 'error')]
    for rank, r in enumerate(summary['runs'], 1):
        rows.append((
            str(rank), r['experiment_name'],
            f"{r['final_train_loss']:.6g}" if 'final_train_loss' in r else '-',
            f"{r['best_valid_loss']:.6g}" if 'best_valid_loss' in r else '-',
            str(r.get('best_valid_epoch', '-')), r.get('error', '')))
    widths = [max(len(row[c]) for row in rows) for c in range(len(rows[0]))]
    return '\n'.join('  '.join(cell.ljust(w) for cell, w in zip(row, widths)).rstrip()
                     for row in rows)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Run a hyperparameter sweep of ExperimentBuilder configs '
                    'and rank the results.',
        epilog='All ExperimentBuilder flags are accepted and form the base '
               'config; swept flags override it per run.')
    parser.add_argument('--model', required=True,
                        help="'module:Class' or 'path/to/file.py:Class'")
    parser.add_argument('--sweep', required=True,
                        help="Python dict of lists, e.g. \"{'learning_rate': "
                             "[0.01, 0.003], 'batch_size': [16, 32]}\"")
    parser.add_argument('--sweep_mode', default='grid',
                        choices=('grid', 'zip'))
    parser.add_argument('--max_runs', type=int, default=32)
    parser.add_argument('--no_plot', action='store_true', default=False)

    from morgana_tpu.experiment_builder import ExperimentBuilder
    ExperimentBuilder.add_args(parser)
    args = vars(parser.parse_args(argv))

    import ast
    from morgana_tpu.serve import load_model_class
    model_class = load_model_class(args.pop('model'))
    sweep = ast.literal_eval(args.pop('sweep'))
    mode = args.pop('sweep_mode')
    max_runs = args.pop('max_runs')
    plot = not args.pop('no_plot')

    summary = run_sweep(model_class, args, sweep, mode=mode,
                        max_runs=max_runs, plot=plot)
    print(format_summary(summary))
    failed = sum(1 for r in summary['runs'] if 'error' in r)
    return 1 if failed == len(summary['runs']) else 0


if __name__ == '__main__':
    sys.exit(main())
