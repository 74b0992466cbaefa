"""Metric plotting across experiments (reference-parity surface of
``morgana/viz/plotting.py``): loads per-epoch ``metrics.json`` files from the
``experiments/<name>/<mode>/epoch_*`` layout and plots train (solid) vs valid
(dashed) curves.
"""
from collections import OrderedDict
import logging
import os

import matplotlib
matplotlib.use('Agg')
from matplotlib.patches import Rectangle  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402

from morgana_tpu.data import file_io  # noqa: E402
from morgana_tpu import utils  # noqa: E402

__all__ = ['load_experiment_results', 'plot_experiment', 'plot_experiment_set']

logger = logging.getLogger('morgana_tpu')


def load_experiment_results(experiment_name, metric_names='loss', mode='train',
                            experiments_base='experiments'):
    r"""Loads ``{metric_name: OrderedDict(epoch: value)}`` from an experiment."""
    metric_names = utils.listify(metric_names)
    results = {metric_name: {} for metric_name in metric_names}

    model_path = os.path.join(experiments_base, experiment_name, mode)
    if os.path.isdir(model_path):
        for epoch_str in os.listdir(model_path):
            metric_path = os.path.join(model_path, epoch_str, 'metrics.json')
            if os.path.isfile(metric_path):
                metrics = file_io.load_json(metric_path)
                epoch = int(epoch_str.split('_')[-1])
                for metric_name in metric_names:
                    if metric_name in metrics:
                        results[metric_name][epoch] = metrics[metric_name]

    return {metric_name: OrderedDict(sorted(result.items()))
            for metric_name, result in results.items()}


def plot_experiment(experiment_name, metric_names='loss', experiments_base='experiments',
                    axs=None, colour=None, add_labels=True, save=False):
    metric_names = utils.listify(metric_names)
    results_train = load_experiment_results(experiment_name, metric_names, 'train', experiments_base)
    results_valid = load_experiment_results(experiment_name, metric_names, 'valid', experiments_base)

    if axs is None:
        n_axes = len(metric_names)
        fig, axs = plt.subplots(1, n_axes, figsize=(1 + n_axes * (4 + 1), 4))
        if len(metric_names) == 1:
            axs = [axs]

    for ax, metric_name in zip(axs, metric_names):
        mt = results_train[metric_name]
        numeric_t = {e: v for e, v in mt.items() if isinstance(v, (int, float))}
        ax.plot(list(numeric_t.keys()), list(numeric_t.values()), label=experiment_name, c=colour)

        mv = results_valid[metric_name]
        numeric_v = {e: v for e, v in mv.items() if isinstance(v, (int, float))}
        ax.plot(list(numeric_v.keys()), list(numeric_v.values()), '--', c=colour)

        if add_labels:
            ax.set_xlabel('Epoch number')
            ax.set_ylabel(metric_name)

    if save:
        save_path = os.path.join(experiments_base, experiment_name, 'metrics.pdf')
        logger.info('Saving plot of metrics to %s', save_path)
        plt.savefig(save_path, bbox_inches='tight')
        plt.close('all')

    return axs


def plot_experiment_set(experiment_names, metric_names='loss',
                        experiments_base='experiments', file_name=None):
    experiment_names = utils.listify(experiment_names)
    metric_names = utils.listify(metric_names)

    n_axes = len(metric_names)
    fig, axs = plt.subplots(1, n_axes, figsize=(1 + n_axes * (4 + 1), 4))
    if len(metric_names) == 1:
        axs = [axs]
    cmap = plt.get_cmap('Set1')

    for i, experiment_name in enumerate(experiment_names):
        colour = cmap(float(i) / len(experiment_names))
        plot_experiment(experiment_name, metric_names, experiments_base,
                        axs=axs, colour=colour, add_labels=i == 0)

    handles, labels = axs[0].get_legend_handles_labels()
    extra = Rectangle((0, 0), 1, 1, fc='w', fill=False, edgecolor='none', linewidth=0)
    lgd_pos = ((0.5 + 0.1) * n_axes - 0.1, -0.1)
    lgd = axs[0].legend([extra] + handles, ['solid = train, dotted = valid'] + labels,
                        loc='upper center', bbox_to_anchor=lgd_pos, fancybox=True,
                        shadow=True, ncol=min(3, len(experiment_names) + 1))
    plt.setp(lgd.get_lines(), linewidth=4.)

    if file_name:
        os.makedirs(os.path.join('plots', os.path.dirname(file_name)), exist_ok=True)
        save_path = os.path.join('plots', file_name)
        logger.info('Saving plot of metrics for multiple experiments to %s', save_path)
        plt.savefig(save_path, bbox_extra_artists=(lgd,), bbox_inches='tight')
        plt.close(fig)

    return axs
