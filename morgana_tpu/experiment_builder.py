"""Experiment orchestration: CLI flags + train/valid/test lifecycle.

Reference-parity surface of ``morgana/experiment_builder.py`` with a TPU-first
execution model: instead of the reference's eager per-batch loop, each batch
runs one fused jitted step (forward + masked loss + grad + Adam + EMA, see
:mod:`morgana_tpu.training`) over fixed-shape, length-bucketed batches fed by
a prefetching host pipeline. Metrics come back as staged device partials; the
learning rate is a traced scalar driven by the schedule registry; checkpoints
keep the ``experiments/<name>/{checkpoints,log,train,valid,test}`` on-disk
contract.

Flag surface matches the reference (``morgana/experiment_builder.py:92-195``)
— models call ``ExperimentBuilder.get_experiment_args()`` unchanged — with
``--model_kwargs``-style dict flags parsed via ``ast.literal_eval`` instead of
``eval``, plus TPU-specific additions (``--seed``, ``--data_parallel``,
``--log_interval``, ``--profile_dir``).
"""
import argparse
import ast
import json
import os
import pickle
import shutil
import sys
import time

import jax
import numpy as np

from morgana_tpu import _logging
from morgana_tpu import checkpointing
from morgana_tpu import data
from morgana_tpu import lr_schedules
from morgana_tpu import memory
from morgana_tpu import nn
from morgana_tpu import utils
from morgana_tpu import viz
from morgana_tpu.data import file_io
from morgana_tpu.training import TrainLoop, build_optimizer

__all__ = ['ExperimentBuilder', 'add_boolean_arg', 'DictAction']


def add_boolean_arg(parser, name, help):
    r"""Adds paired ``--x`` / ``--no-x`` boolean flags."""
    parser.add_argument(f'--{name}', dest=name, action='store_true', default=True, help=help)
    parser.add_argument(f'--no-{name}', dest=name, action='store_false', help=argparse.SUPPRESS)


class DictAction(argparse.Action):
    r"""Parses a Python-dict string safely with ``ast.literal_eval`` (the
    reference used ``eval``, ``morgana/experiment_builder.py:27-35``)."""

    def __init__(self, option_strings, dest, nargs=None, **kwargs):
        if nargs is not None:
            raise ValueError('nargs not allowed')
        super().__init__(option_strings, dest, **kwargs)

    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest, ast.literal_eval(values))


class Callback:
    r"""Training-routine extension hooks (the lightweight answer to the
    reference TODO's Ignite wish): pass instances via
    ``ExperimentBuilder(..., callbacks=[...])``. Override any subset; every
    hook receives the builder (full access to model/loop/loaders/logger).
    ``on_epoch_end`` / ``on_valid_end`` may return True to stop training
    cleanly after the current epoch (checkpoints already saved)."""

    def on_train_begin(self, builder):
        pass

    def on_epoch_begin(self, builder, epoch):
        pass

    def on_epoch_end(self, builder, epoch, train_loss):
        pass

    def on_valid_end(self, builder, epoch, valid_loss):
        pass

    def on_train_end(self, builder):
        pass


class EarlyStopping(Callback):
    r"""Stops training when validation loss hasn't improved for ``patience``
    epochs (by more than ``min_delta``) — functionality the reference lacked
    entirely. Requires ``valid=True``."""

    def __init__(self, patience=5, min_delta=0.0):
        self.patience = int(patience)
        self.min_delta = float(min_delta)
        self.best = float('inf')
        self.stale = 0

    def on_valid_end(self, builder, epoch, valid_loss):
        if valid_loss < self.best - self.min_delta:
            self.best = float(valid_loss)
            self.stale = 0
            return False
        self.stale += 1
        if self.stale >= self.patience:
            builder.logger.info(
                'epoch %2d: early stopping — valid loss has not improved '
                'for %d epochs (best %.4f)', epoch, self.stale, self.best)
            return True
        return False


class ExperimentBuilder(object):
    r"""Interface for running training, validation, and generation.

    Parameters
    ----------
    model_class : morgana_tpu.base_models.BaseModel subclass
    experiment_name : str
        Output directory name under ``experiments_base``.
    kwargs : dict
        Command line arguments, see :func:`add_args`.
    """

    @classmethod
    def get_experiment_args(cls, argv=None):
        r"""Creates the command line argument parser and returns the args dict.

        ``--config PATH`` pre-loads argument values from a JSON file — in
        particular the ``config.json`` every experiment writes — and
        explicit command-line flags override it, so
        ``--config experiments/old/config.json --experiment_name rerun``
        reproduces a run. (The reference's own TODO wished for config-file
        support; the flag surface itself is unchanged.)
        """
        pre = argparse.ArgumentParser(add_help=False)
        pre.add_argument('--config', dest='config', type=str, default=None)
        pre_args, _ = pre.parse_known_args(argv)

        parser = argparse.ArgumentParser(
            description='Experiment builder for TPU-native TTS model training and generation.')
        parser.add_argument('--config', dest='config', action='store', type=str, default=None,
                            help='JSON file of argument values (e.g. a previous run\'s '
                                 'config.json); explicit command-line flags override it.')
        cls.add_args(parser)

        if pre_args.config:
            with open(pre_args.config) as f:
                config = json.load(f)
            known = {action.dest for action in parser._actions}
            unknown = sorted(set(config) - known)
            if unknown:
                # config.json round-trips exactly today; tolerate forward-
                # compat extras loudly rather than failing a reproduction.
                print(f'--config: ignoring unknown keys {unknown}',
                      file=sys.stderr)
            parser.set_defaults(**{k: v for k, v in config.items()
                                   if k in known and k != 'config'})

        args = vars(parser.parse_args(argv))
        args.pop('config', None)
        return args

    @classmethod
    def add_args(cls, parser):
        r"""Adds command line arguments (superset of the reference flags)."""
        parser.add_argument('--model_kwargs', dest='model_kwargs', action=DictAction,
                            type=str, default={},
                            help='Keyword arguments forwarded to the model constructor, given as a '
                                 'quoted Python dict literal (parsed with ast.literal_eval).')
        parser.add_argument('--analysis_kwargs', dest='analysis_kwargs', action=DictAction,
                            type=str, default={'sample_rate': 16000},
                            help='Quoted dict literal forwarded to the `BaseModel.analysis_for_*` '
                                 'hooks (e.g. the synthesis sample rate).')

        # Training options.
        add_boolean_arg(parser, 'train', help='Run the training loop over --train_id_list '
                                              '(from --start_epoch to --end_epoch).')
        add_boolean_arg(parser, 'valid', help='Evaluate on --valid_id_list after every training epoch.')
        parser.add_argument('--test', dest='test', action='store_true', default=False,
                            help='Run generation (predict without targets) over --test_id_list '
                                 'once training finishes.')

        parser.add_argument('--start_epoch', dest='start_epoch', action='store', type=int, default=1,
                            help='First epoch number of this run; checkpoint files are named '
                                 'after the epoch, so set this when resuming to avoid '
                                 'overwriting earlier saves.')
        parser.add_argument('--end_epoch', dest='end_epoch', action='store', type=int, default=50,
                            help='Last epoch number (inclusive) of this run.')
        parser.add_argument('--checkpoint_path', dest='checkpoint_path', action='store', type=str, default=None,
                            help='Initialise model parameters from this checkpoint before any '
                                 "procedure runs ('latest' resumes a rolling step checkpoint).")
        parser.add_argument('--ema_checkpoint_path', dest='ema_checkpoint_path', action='store', type=str,
                            default=None,
                            help='Initialise the EMA (shadow) parameters from this checkpoint.')

        parser.add_argument('--batch_size', dest='batch_size', action='store', type=int, default=32,
                            help='Utterances per training/validation batch.')
        parser.add_argument('--learning_rate', dest='learning_rate', action='store', type=float, default=0.01,
                            help='Base optimiser learning rate (the value LR schedules scale).')
        parser.add_argument('--lr_schedule_name', dest='lr_schedule_name', action='store', type=str,
                            default='constant', help='Name of the learning-rate schedule '
                                                     '(see morgana_tpu.lr_schedules.SUPPORTED).')
        parser.add_argument('--lr_schedule_kwargs', dest='lr_schedule_kwargs', action=DictAction, type=str,
                            default={}, help='Quoted dict literal of schedule hyper-parameters '
                                             '(e.g. "{\'warmup_steps\': 4000}").')
        parser.add_argument('--weight_decay', dest='weight_decay', action='store', type=float, default=0.,
                            help='Strength of L2 parameter regularisation (0 disables it; '
                                 'decoupled decay under --optimizer adamw).')
        parser.add_argument('--optimizer', dest='optimizer', action='store', type=str, default='adam',
                            help='Optimiser: adam (torch-Adam semantics, the reference default), '
                                 'adamw (decoupled weight decay), sgd, or lamb.')
        parser.add_argument('--optimizer_kwargs', dest='optimizer_kwargs', action=DictAction, type=str,
                            default={}, help='Optimiser settings (b1/b2/eps, momentum/nesterov for sgd), '
                                             'a Python dict in quotes.')
        parser.add_argument('--ema_decay', dest='ema_decay', action='store', type=float, default=0.,
                            help='Decay of an exponential moving average of the parameters; '
                                 'when non-zero, validation/generation use the EMA weights '
                                 'and a twin `_ema` checkpoint is saved.')

        parser.add_argument('--device', dest='device', action='store', type=str, default=None,
                            help="JAX platform to run on ('tpu', 'cpu', or 'tpu:0'). Default: JAX default.")
        parser.add_argument('--num_data_threads', dest='num_data_threads', action='store', type=int, default=0,
                            help='Size of the host-side loader thread pool (0 = load inline; '
                                 'the C++ reader releases the GIL, so threads scale on '
                                 'multi-core hosts).')

        parser.add_argument('--model_checkpoint_interval', dest='model_checkpoint_interval', action='store',
                            type=int, default=1, help='Save a parameter checkpoint every N epochs.')
        parser.add_argument('--step_checkpoint_interval', dest='step_checkpoint_interval', action='store',
                            type=int, default=0,
                            help='If > 0, save a rolling mid-epoch checkpoint '
                                 '(checkpoints/step.npz + sidecar) every N train batches. '
                                 '--checkpoint_path latest resumes from it at the exact '
                                 'batch — step-level fault tolerance for long epochs '
                                 '(after a mid-epoch resume, that epoch\'s metrics cover '
                                 'the resumed remainder only; the resumed batch order is '
                                 'exact — incl. --length_sort_window, whose learned '
                                 'length map rides in the sidecar, and under --multihost, '
                                 'where each rank snapshots its own shard\'s map to '
                                 'checkpoints/step.lengths.pN.pkl).')
        parser.add_argument('--train_output_interval', dest='train_output_interval', action='store',
                            type=int, default=10, help='Run the train-set analysis hooks '
                                                       '(feature dumps/synthesis) every N epochs.')
        parser.add_argument('--valid_output_interval', dest='valid_output_interval', action='store',
                            type=int, default=10, help='Run the validation-set analysis hooks every N epochs.')
        parser.add_argument('--test_output_interval', dest='test_output_interval', action='store',
                            type=int, default=10, help='Run the test-set analysis hooks every N epochs.')

        # Paths for data and output.
        parser.add_argument('--data_root', dest='data_root', action='store', type=str, default='data',
                            help='Directory under which every corpus sub-directory lives.')
        parser.add_argument('--train_dir', dest='train_dir', action='store', type=str, default='train',
                            help='Training-corpus sub-directory of --data_root.')
        parser.add_argument('--valid_dir', dest='valid_dir', action='store', type=str, default='valid',
                            help='Validation-corpus sub-directory of --data_root.')
        parser.add_argument('--test_dir', dest='test_dir', action='store', type=str, default='test',
                            help='Test-corpus sub-directory of --data_root.')
        parser.add_argument('--train_id_list', dest='train_id_list', action='store', type=str,
                            default='train_file_id_list.scp',
                            help='Utterance-id list file (one basename per line) inside --train_dir.')
        parser.add_argument('--valid_id_list', dest='valid_id_list', action='store', type=str,
                            default='valid_file_id_list.scp',
                            help='Utterance-id list file inside --valid_dir.')
        parser.add_argument('--test_id_list', dest='test_id_list', action='store', type=str,
                            default='test_file_id_list.scp',
                            help='Utterance-id list file inside --test_dir.')
        parser.add_argument('--normalisation_dir', dest='normalisation_dir', action='store', type=str,
                            default='train',
                            help='Sub-directory of --data_root holding the JSON normaliser '
                                 'parameter files ({name}_mvn.json / {name}_minmax.json).')
        parser.add_argument('--experiments_base', dest='experiments_base', action='store', type=str,
                            default='experiments',
                            help='Directory that collects all experiment output directories.')
        parser.add_argument('--experiment_name', dest='experiment_name', action='store', type=str, required=True,
                            help='This run\'s output directory name under --experiments_base.')

        # TPU-native additions.
        parser.add_argument('--seed', dest='seed', action='store', type=int, default=1234567890,
                            help='Seed for parameter init and training RNG streams.')
        parser.add_argument('--data_parallel', dest='data_parallel', action='store_true', default=False,
                            help='Shard batches over all local devices (data parallelism over the ICI mesh).')
        parser.add_argument('--tensor_parallel', dest='tensor_parallel', action='store',
                            type=int, default=1,
                            help='Shard large parameter matrices over a N-way "model" mesh axis '
                                 '(tensor parallelism; combine with --data_parallel for a '
                                 'data x model mesh). Low value at this model scale — see '
                                 'docs/design.md for the measured analysis.')
        parser.add_argument('--fsdp', dest='fsdp', action='store_true', default=False,
                            help='With --data_parallel: shard parameters, optimiser moments and '
                                 'EMA over the "data" axis (ZeRO-3/FSDP storage sharding; GSPMD '
                                 'inserts the weight all_gather / gradient reduce_scatter). '
                                 'Divides state memory per device by the data-axis size. '
                                 'With --multihost, requires --orbax_dir (Orbax owns '
                                 'checkpoints; .npz saves are skipped).')
        parser.add_argument('--keep_checkpoints', dest='keep_checkpoints', action='store',
                            type=int, default=0,
                            help='If > 0, keep only the newest N epoch checkpoints '
                                 '(+EMA/training-state sidecars); 0 keeps all. '
                                 "--checkpoint_path accepts 'latest' for one-command resume.")
        parser.add_argument('--shard_map_step', dest='shard_map_step', action='store_true', default=False,
                            help='With --data_parallel: use the explicit-collective shard_map train '
                                 'step (hand-placed pmean over ICI) instead of relying on GSPMD.')
        parser.add_argument('--orbax_dir', dest='orbax_dir', action='store', type=str, default=None,
                            help='If set, also checkpoint full training state there via Orbax '
                                 '(async, sharding-aware); resumes from its latest step when no '
                                 '--checkpoint_path is given.')
        parser.add_argument('--multihost', dest='multihost', action='store_true', default=False,
                            help='Initialise jax.distributed over DCN for multi-host training: '
                                 'id lists are sharded per host, --batch_size is the GLOBAL batch, '
                                 'and only process 0 writes checkpoints/config/metrics. '
                                 'Pair with --data_parallel for synchronised training.')
        parser.add_argument('--compilation_cache_dir', dest='compilation_cache_dir',
                            action='store', type=str, default=None,
                            help='Persistent JAX compile cache directory: restarted runs '
                                 'reload compiled train/eval programs from disk instead of '
                                 'recompiling (faster resume/restart).')
        parser.add_argument('--log_interval', dest='log_interval', action='store', type=int, default=1,
                            help='Batches between progress-bar metric refreshes (higher avoids device syncs).')
        parser.add_argument('--profile_dir', dest='profile_dir', action='store', type=str, default=None,
                            help='If set, capture a jax.profiler trace of the first training epoch here.')
        parser.add_argument('--grad_clip_norm', dest='grad_clip_norm', action='store',
                            type=float, default=0.,
                            help='If > 0, clip the global gradient norm before Adam.')
        parser.add_argument('--grad_accum_steps', dest='grad_accum_steps', action='store',
                            type=int, default=1,
                            help='If > 1, sum gradients over N batches on device and apply '
                                 'the optimiser/EMA update once per cycle (effective batch '
                                 '= N * --batch_size without N x the activation memory). '
                                 'Batch-level LR schedules step once per applied update.')
        parser.add_argument('--remat', dest='remat', action='store_true', default=False,
                            help='Rematerialise recurrent layers in the backward pass '
                                 '(O(1) activation memory per layer; enables longer sequences).')
        parser.add_argument('--length_sort_window', dest='length_sort_window', action='store',
                            type=int, default=0,
                            help='If > 0, sort utterances by length within windows of N batches '
                                 '(after a first random epoch) to cut padded-frame compute.')
        parser.add_argument('--compute_dtype', dest='compute_dtype', action='store', type=str,
                            default='float32',
                            help="Matmul compute dtype: 'float32' (default) or 'bfloat16' "
                                 '(bf16 MXU matmuls with f32 accumulation and state).')
        parser.add_argument('--transfer_dtype', dest='transfer_dtype', action='store', type=str,
                            default=None,
                            help="Wire dtype for float32 sequence features on the "
                                 "host->device transfer, e.g. 'bfloat16' (halves batch "
                                 'upload bytes; the win when the device link, not '
                                 'compute, bounds throughput). Scalar features stay f32.')
        parser.add_argument('--device_normalise', dest='device_normalise',
                            action=argparse.BooleanOptionalAction, default=None,
                            help='Compute feature normalisation and delta windows ON DEVICE '
                                 '(inside XLA, after the transfer) instead of on the host: '
                                 'only raw streams cross the host->device wire (~5x fewer '
                                 'bytes at flagship shapes), reconstructed exactly on device. '
                                 'Speaker-dependent normalisers keep the host path. Default: '
                                 'AUTO — on for accelerator backends, off on CPU; '
                                 '--no-device_normalise opts out.')
        parser.add_argument('--device_cache', dest='device_cache',
                            action=argparse.BooleanOptionalAction, default=None,
                            help='Keep the WHOLE corpus resident in device memory (per-stream '
                                 'arenas) and assemble every batch on device by gather: after '
                                 'the one-time upload, only tiny (B,) index vectors cross the '
                                 'host->device wire (~8 bytes/utterance vs megabytes). The '
                                 'answer to link-bound training when the corpus fits in HBM; '
                                 'falls back to the streaming loader (with a warning) when it '
                                 'does not. Single-host only. Composes with '
                                 '--device_normalise (only raw streams are cached). Default: '
                                 'AUTO — on for single-host accelerator backends, off on CPU; '
                                 '--no-device_cache opts out.')
        parser.add_argument('--device_cache_gb', dest='device_cache_gb',
                            action='store', type=float, default=4.0,
                            help='Device-memory budget for --device_cache in GiB (default 4.0). '
                                 'A corpus over budget falls back to the streaming loader.')
        parser.add_argument('--steps_per_dispatch', dest='steps_per_dispatch',
                            action='store', type=int, default=None,
                            help='If > 1, run up to N consecutive same-shape training (and '
                                 'validation) batches as ONE compiled program (a lax.scan '
                                 'chaining batch assembly + fused step), so one host dispatch '
                                 'covers N steps. Implies --device_cache; per-step numerics '
                                 '(RNG, LR schedule, EMA, metrics) are unchanged. The win when '
                                 'per-dispatch latency (a remote/tunnelled device) bounds '
                                 'training, not compute. Default: AUTO — when the device cache '
                                 'is active and a startup probe measures a dispatch round trip '
                                 '>= 5 ms (a tunnelled/remote device), 16; else 1. '
                                 '--steps_per_dispatch 1 opts out.')
        parser.add_argument('--debug_nans', dest='debug_nans', action='store_true', default=False,
                            help='Debugging: raise at the FIRST operation producing a NaN/Inf '
                                 '(jax_debug_nans) instead of tripping the end-of-epoch '
                                 'divergence guard. Compiles without fusion optimisations '
                                 'and re-runs failing steps op-by-op — much slower; '
                                 'diagnosis only, never production.')
        parser.add_argument('--log_norms', dest='log_norms', action='store_true',
                            default=False,
                            help='Log grad_norm (raw, pre-clip), param_norm and update_norm '
                                 '(actual parameter change, lr included) per applied optimiser '
                                 'step as train metrics: per-epoch means land in metrics.json '
                                 'and tensorboard. Computed inside the fused step — three '
                                 'extra scalars per step, no host syncs.')
        parser.add_argument('--memory_report', dest='memory_report', action='store_true',
                            default=False,
                            help='Write memory_report.txt (compile-time HBM breakdown of the '
                                 'fused train step at the first batch\'s shapes + live device '
                                 'allocator stats) after the first training step. Costs one '
                                 'extra XLA compile of the step program.')
        parser.add_argument('--find_lr', dest='find_lr', action='store',
                            type=str, default=None,
                            help="LR range test instead of training: 'MIN,MAX[,STEPS]' "
                                 '(e.g. 1e-6,1.0,100) sweeps the learning rate '
                                 'exponentially over real fused train steps, records the '
                                 'smoothed loss, stops early on divergence (smoothed > 4x '
                                 'best), writes lr_find.json + lr_find.png with a '
                                 'steepest-descent suggestion, and exits. With '
                                 '--grad_accum_steps the sweep advances per micro-batch.')
        parser.add_argument('--search_batch_size', dest='search_batch_size', action='store',
                            type=float, default=0.,
                            help='If > 0: instead of training, binary-search the largest batch '
                                 'size whose fused-train-step compile-time peak fits this many '
                                 'GiB of device memory (at the first batch\'s length bucket), '
                                 'write batch_size_search.txt, and exit. Each probe is one XLA '
                                 'compile; no step is executed and no OOM is risked.')

    def __init__(self, model_class, experiment_name, **kwargs):
        self.model_class = model_class
        self.model_kwargs = kwargs.get('model_kwargs', {})
        self.experiment_name = experiment_name
        # Training-routine extension points (the reference's TODO wished for
        # an Ignite integration): a list of Callback objects, programmatic
        # only — popped so config.json stays JSON-clean.
        self.callbacks = list(kwargs.pop('callbacks', None) or [])

        self.train = kwargs['train']
        self.valid = kwargs['valid']
        self.test = kwargs['test']

        self.start_epoch = kwargs['start_epoch']
        self.end_epoch = kwargs['end_epoch']
        self.checkpoint_path = kwargs['checkpoint_path']
        self.ema_checkpoint_path = kwargs['ema_checkpoint_path']

        self.batch_size = kwargs['batch_size']
        self.learning_rate = kwargs['learning_rate']
        self.lr_schedule_name = kwargs['lr_schedule_name']
        self.lr_schedule_kwargs = kwargs['lr_schedule_kwargs']
        self.weight_decay = kwargs['weight_decay']
        self.optimizer = kwargs.get('optimizer', 'adam')
        self.optimizer_kwargs = kwargs.get('optimizer_kwargs') or {}
        self.ema_decay = kwargs['ema_decay']

        self.device = kwargs['device']
        self.num_data_threads = kwargs['num_data_threads']

        self.model_checkpoint_interval = kwargs['model_checkpoint_interval']
        self.step_checkpoint_interval = int(
            kwargs.get('step_checkpoint_interval', 0) or 0)
        # Mid-epoch resume: number of already-trained batches to skip in the
        # FIRST epoch (set when a resumed checkpoint's sidecar records a
        # mid-epoch position).
        self._resume_batches_done = 0
        self._resume_loader_lengths = None
        self._train_state_cache = {}
        self.train_output_interval = kwargs['train_output_interval']
        self.valid_output_interval = kwargs['valid_output_interval']
        self.test_output_interval = kwargs['test_output_interval']

        self.data_root = kwargs['data_root']
        self.train_dir = kwargs['train_dir']
        self.valid_dir = kwargs['valid_dir']
        self.test_dir = kwargs['test_dir']
        self.train_id_list = kwargs['train_id_list']
        self.valid_id_list = kwargs['valid_id_list']
        self.test_id_list = kwargs['test_id_list']

        self.normalisation_dir = kwargs['normalisation_dir']
        self.experiments_base = kwargs['experiments_base']
        self.analysis_kwargs = kwargs.get('analysis_kwargs', {})

        self.keep_checkpoints = kwargs.get('keep_checkpoints', 0)
        self.seed = kwargs.get('seed', 1234567890)
        self.data_parallel = kwargs.get('data_parallel', False)
        self.log_interval = kwargs.get('log_interval', 1)
        self.profile_dir = kwargs.get('profile_dir')
        self.memory_report = kwargs.get('memory_report', False)
        self._memory_report_written = False
        self.search_batch_size = float(kwargs.get('search_batch_size', 0.) or 0.)
        self.find_lr = kwargs.get('find_lr')
        self.compute_dtype = kwargs.get('compute_dtype', 'float32')
        self.transfer_dtype = kwargs.get('transfer_dtype')
        # None = AUTO (resolved against the backend in
        # _resolve_fast_path_defaults, after platform selection).
        self.device_normalise = kwargs.get('device_normalise', None)
        self.device_cache = kwargs.get('device_cache', None)
        self.device_cache_gb = float(kwargs.get('device_cache_gb', 4.0) or 0.)
        _spd = kwargs.get('steps_per_dispatch', None)
        self.steps_per_dispatch = None if _spd is None else max(1, int(_spd))
        self.length_sort_window = kwargs.get('length_sort_window', 0)
        nn.set_default_compute_dtype(self.compute_dtype)
        if kwargs.get('debug_nans'):
            # Before any compilation: every jitted program in this process
            # checks its outputs and re-runs op-by-op on the first NaN/Inf,
            # raising FloatingPointError at the producing operation.
            jax.config.update('jax_debug_nans', True)
        nn.set_default_remat(kwargs.get('remat', False))

        #
        # Add/modify settings and attributes.
        #

        self.experiment_dir = os.path.join(self.experiments_base, self.experiment_name)
        self.experiment_is_new = not os.path.exists(self.experiment_dir)

        #
        # Devices, multi-host, platform — all order-sensitive: jax.distributed
        # must initialise before any backend exists, platform selection before
        # the first device query. Logger creation follows (it needs the
        # process index for collision-free log files).
        #

        self.multihost = kwargs.get('multihost', False)
        self.process_index, self.process_count = 0, 1

        # Platform selection first: it only sets env/config (no backend is
        # created), whereas initialize_distributed ends by querying the
        # process index, which initialises the backend and freezes the
        # platform — the reverse order would make --device a silent no-op.
        platform_warning = None
        if self.device:
            from morgana_tpu import platform as _platform
            requested = str(self.device).split(':')[0].lower()
            got = _platform.select_platform(self.device, allow_fallback=True)
            # A satisfied 'tpu' request may return a plugin-specific platform
            # name (a tunnelled chip registers as e.g. 'axon') — that is
            # success, not a fallback.
            satisfied = got == requested or (
                requested == 'tpu' and _platform._platform_is_tpu(got))
            if not satisfied:
                platform_warning = (
                    f'Could not switch platform to {self.device} (backend '
                    f'already initialised); continuing on {got}')

        if kwargs.get('compilation_cache_dir'):
            from morgana_tpu import platform as _platform
            _platform.enable_compilation_cache(kwargs['compilation_cache_dir'])

        if self.multihost:
            from morgana_tpu import parallel
            parallel.initialize_distributed()
            self.process_index, self.process_count = parallel.process_info()
        self.is_lead_host = self.process_index == 0

        self.logger = _logging.create_logger(self.experiment_dir,
                                             process_index=self.process_index)
        if platform_warning:
            self.logger.warning(platform_warning)

        self._resolve_fast_path_defaults(kwargs)

        self._lr_schedule = lr_schedules.init_lr_schedule(
            self.lr_schedule_name, **self.lr_schedule_kwargs)

        self.resolve_latest_checkpoints()

        if self.ema_checkpoint_path is None:
            self.ema_checkpoint_path = self.checkpoint_path

        self.epoch = 0

        self.resolve_setting_conflicts()

        #
        # Sharding, global-batch accounting.
        #

        if self.batch_size % self.process_count:
            raise ValueError(
                f'--batch_size {self.batch_size} (the GLOBAL batch) must be '
                f'divisible by the number of hosts ({self.process_count})')
        self.local_batch_size = self.batch_size // self.process_count
        if self.multihost:
            self.logger.info(
                'Multi-host: process %d of %d; global batch %d = %d hosts x '
                'local batch %d', self.process_index, self.process_count,
                self.batch_size, self.process_count, self.local_batch_size)
            if not self.data_parallel:
                self.logger.warning(
                    '--multihost without --data_parallel: hosts will train '
                    'independently on disjoint data shards with NO gradient '
                    'synchronisation — pass --data_parallel for synchronised '
                    'training.')

        self.batch_sharding = None
        self.mesh = None
        self.tensor_parallel = max(1, int(kwargs.get('tensor_parallel', 1) or 1))
        if self.tensor_parallel > 1 and len(jax.devices()) % self.tensor_parallel:
            raise ValueError(
                f'--tensor_parallel {self.tensor_parallel} must divide the '
                f'device count ({len(jax.devices())})')
        if self.data_parallel or self.tensor_parallel > 1:
            from morgana_tpu import parallel
            # DP uses every device for 'data'; TP carves a 'model' axis out
            # first. TP without DP uses a 1 x N mesh (N devices total).
            self.mesh = parallel.make_mesh(
                num_data=None if self.data_parallel else 1,
                num_model=self.tensor_parallel)
            num_data = self.mesh.shape['data']
            if self.batch_size % num_data:
                raise ValueError(
                    f'--batch_size {self.batch_size} must be divisible by the '
                    f'number of data-parallel devices ({num_data})')
            self.batch_sharding = parallel.batch_sharding(self.mesh)
            self.logger.info('Parallel over mesh %s (data=%d, model=%d)',
                             self.mesh, num_data, self.mesh.shape['model'])
        self.logger.info('Using JAX backend %s with devices %s',
                         jax.default_backend(), jax.devices())

        #
        # Model, normalisers, EMA, training loop.
        #

        nn.manual_seed(self.seed)
        self.model = self.build_model(self.model_class, self.model_kwargs,
                                      checkpoint_path=self.checkpoint_path)

        normalisers = self.model.normaliser_sources()
        for name in normalisers.keys():
            normalisers[name].load_params(self.normalisation_dir, self.data_root)
        self.model.normalisers = normalisers

        self.ema = None
        if self.ema_decay:
            averaged_model = self.build_model(
                self.model_class, self.model_kwargs, checkpoint_path=self.ema_checkpoint_path)
            averaged_model.normalisers = normalisers
            self.ema = utils.ExponentialMovingAverage(model=averaged_model, decay=self.ema_decay)

        optimizer = build_optimizer(self.optimizer,
                                    weight_decay=self.weight_decay,
                                    grad_clip_norm=kwargs.get('grad_clip_norm', 0.),
                                    **self.optimizer_kwargs)
        self.shard_map_step = kwargs.get('shard_map_step', False)
        if self.shard_map_step and self.mesh is None:
            raise ValueError('--shard_map_step requires --data_parallel '
                             '(it is the explicit-collective formulation of '
                             'the data-parallel step).')
        self.log_norms = kwargs.get('log_norms', False)
        self.grad_accum_steps = max(1, int(kwargs.get('grad_accum_steps', 1) or 1))
        if self.grad_accum_steps > 1 and self.shard_map_step:
            raise ValueError('--grad_accum_steps > 1 is not supported with '
                             '--shard_map_step; drop --shard_map_step (the '
                             'default GSPMD data-parallel path supports '
                             'accumulation).')
        if self.tensor_parallel > 1 and self.shard_map_step:
            raise ValueError('--tensor_parallel is not supported with '
                             '--shard_map_step (the explicit shard_map step '
                             'is data-parallel only); the default GSPMD path '
                             'handles data x model meshes.')
        if self.steps_per_dispatch > 1:
            if not self.device_cache:
                raise ValueError('--steps_per_dispatch > 1 requires '
                                 '--device_cache (batches must assemble on '
                                 'device for the chained program to run '
                                 'without per-batch host data).')
            if self.shard_map_step:
                raise ValueError('--steps_per_dispatch > 1 is not supported '
                                 'with --shard_map_step; the GSPMD path '
                                 'supports chained dispatch.')
        self.fsdp = kwargs.get('fsdp', False)
        if self.fsdp:
            if self.mesh is None or self.mesh.shape['data'] <= 1:
                raise ValueError('--fsdp requires --data_parallel (parameter '
                                 "shards live on the 'data' mesh axis).")
            if self.shard_map_step:
                raise ValueError('--fsdp is not supported with '
                                 '--shard_map_step; the GSPMD path owns the '
                                 'FSDP collectives (all_gather/reduce_scatter).')
            if self.multihost and not (kwargs.get('orbax_dir')
                                       and checkpointing.orbax_available()):
                raise ValueError('--fsdp with --multihost requires '
                                 '--orbax_dir: epoch .npz checkpoints gather '
                                 'parameters to the lead host, which a '
                                 'cross-host-sharded array cannot do — Orbax '
                                 'checkpoints write each host\'s shards '
                                 'natively and own the save/resume path in '
                                 'this mode (.npz/.pkl epoch and step '
                                 'checkpoints are skipped).')
        self.loop = TrainLoop(self.model, optimizer, ema_decay=self.ema_decay,
                              seed=self.seed, ema_model=self.ema.model if self.ema else None,
                              shard_map_mesh=self.mesh if self.shard_map_step else None,
                              grad_accum_steps=self.grad_accum_steps,
                              log_norms=self.log_norms)
        if self.shard_map_step:
            self.logger.info('Using explicit shard_map train step over mesh %s', self.mesh)
        if self.tensor_parallel > 1:
            # Commit large kernels onto the 'model' axis; opt_state and EMA
            # follow via sharding propagation / zeros_like inside the step.
            from morgana_tpu import parallel
            self.loop.params = parallel.shard_params(
                self.loop.params, self.mesh, tensor_parallel=True)
            if self.loop.ema_params is not None:
                self.loop.ema_params = parallel.shard_params(
                    self.loop.ema_params, self.mesh, tensor_parallel=True)
            self.logger.info('Tensor parallel: params sharded %d-way over the '
                             "'model' axis", self.tensor_parallel)

        # Orbax: async full-state checkpoints; resume from the latest step
        # when no explicit --checkpoint_path was given.
        self._restored_lr_state = None
        self.orbax_dir = kwargs.get('orbax_dir')
        if self.orbax_dir and not self.checkpoint_path and self.train:
            if checkpointing.orbax_available():
                target = {'params': self.loop.params,
                          'opt_state': self.loop.opt_state,
                          'ema_params': self.loop.ema_params,
                          'step': 0}
                try:
                    state = checkpointing.orbax_restore(self.orbax_dir, target=target)
                except Exception as exc:  # noqa: BLE001 - resume is best-effort
                    self.logger.warning('Orbax restore from %s failed (%s); '
                                        'starting fresh', self.orbax_dir, exc)
                    state = None
                if state is not None:
                    self.loop.params = state['params']
                    self.loop.opt_state = state['opt_state']
                    if self.ema_decay and state.get('ema_params') is not None:
                        self.loop.ema_params = state['ema_params']
                    self.loop.step_count = int(state.get('step', 0))
                    self.loop.sync_model()
                    # The Orbax step key is the epoch; resume AFTER it (else
                    # the run would retrain from epoch 1 on restored params).
                    restored_epoch = checkpointing.orbax_latest_step(self.orbax_dir)
                    if restored_epoch is not None:
                        self.start_epoch = max(self.start_epoch, restored_epoch + 1)
                        # LR-schedule state rides in a pickle sidecar (its
                        # heterogeneous scalars are not an Orbax pytree);
                        # without it a resumed batch-level schedule (noam,
                        # cyclic, ...) would restart from schedule-step 0.
                        lr_path = checkpointing.orbax_sidecar_path(
                            self.orbax_dir, restored_epoch)
                        if os.path.exists(lr_path):
                            with open(lr_path, 'rb') as f:
                                self._restored_lr_state = pickle.load(f)
                        else:
                            self.logger.warning(
                                'Orbax step %s has no LR-schedule sidecar '
                                '(%s); batch-level schedules (noam, cyclic, '
                                '...) will restart from schedule step 0',
                                restored_epoch, lr_path)
                    self.logger.info('Restored training state from Orbax dir %s '
                                     '(epoch %s, step %d); start_epoch=%d',
                                     self.orbax_dir, restored_epoch,
                                     self.loop.step_count, self.start_epoch)
            else:
                self.logger.warning('--orbax_dir set but orbax is not importable; '
                                    'continuing with .npz checkpoints only')

        # Exact resume: restore optimiser/EMA state saved alongside the
        # checkpoint (mutually exclusive with the Orbax auto-resume above,
        # which only runs when no --checkpoint_path was given).
        if self.checkpoint_path and self.train:
            state = self._training_state_for(self.checkpoint_path)
            if state is not None:
                extra = state.get('extra') or {}
                self._restored_lr_state = extra.get('lr_schedule')
                # step.npz and its sidecar are each written atomically but
                # sequentially; a crash between the two leaves a torn pair
                # (new params, old optimiser state). The sidecar carries
                # params too, so for step-checkpoint resume it is treated as
                # the ONE consistent snapshot: params restore from it as
                # well, never mixing the two files' write generations.
                if state.get('params') is not None and os.path.normpath(
                        self.checkpoint_path) == os.path.normpath(
                        self._step_checkpoint_path()):
                    self.loop.params = state['params']
                    self.loop.sync_model()
                if state['opt_state'] is not None:
                    self.loop.opt_state = state['opt_state']
                if state.get('ema_params') is not None and self.ema_decay:
                    self.loop.ema_params = state['ema_params']
                self.loop.step_count = state.get('step', 0)
                self.logger.info('Restored optimiser state from %s',
                                 checkpointing.training_state_path_for(self.checkpoint_path))
                # Mid-epoch checkpoint: position the first training epoch at
                # the recorded batch (the epoch's earlier batches are already
                # inside the restored parameters).
                position = self._mid_epoch_position(self.checkpoint_path)
                if position is not None:
                    step_epoch, batches_done, num_batches = position
                    if step_epoch == self.start_epoch and (
                            num_batches is None or batches_done < num_batches):
                        self._resume_batches_done = batches_done
                        self.logger.info(
                            'Mid-epoch resume: epoch %d restarts at batch %d',
                            step_epoch, batches_done + 1)
                        self._resume_loader_lengths = extra.get('loader_lengths')
                        if self.length_sort_window and self.process_count > 1:
                            # Each host's loader learned lengths for ITS
                            # id-list shard only; the lead-host sidecar
                            # cannot carry them, so every rank snapshotted
                            # its own map (step.lengths.pN.pkl) at the same
                            # batch boundary.
                            self._resume_loader_lengths = \
                                self._load_rank_lengths(step_epoch,
                                                        batches_done)
                        if (self.length_sort_window
                                and self._resume_loader_lengths is not None):
                            lengths = self._resume_loader_lengths
                            self.logger.info(
                                'Restored the loader length maps (epoch '
                                'start: %d items, live: %d): the batch '
                                'order replays exactly.',
                                len(lengths.get('epoch_start', lengths)),
                                len(lengths.get('live', lengths)))
                        elif self.length_sort_window:
                            # The length-sorted order depends on sequence
                            # lengths the loader only learns by iterating;
                            # a fresh process has not seen them, so this
                            # epoch's batch order differs from the
                            # interrupted run's and skipping `batches_done`
                            # batches replays a DIFFERENT prefix: some
                            # utterances train twice this epoch, others not
                            # at all. Harmless statistically, but not the
                            # exact replay --step_checkpoint_interval
                            # otherwise guarantees.
                            self.logger.warning(
                                'Mid-epoch resume with --length_sort_window '
                                '%s: batch order is not reproducible across '
                                'a restart, so epoch %d is approximately '
                                '(not exactly) resumed. Use '
                                '--length_sort_window 0 for exact replay.',
                                self.length_sort_window, step_epoch)

        # FSDP placement runs AFTER every restore path so resumed optimiser/
        # EMA state (host pickles, Orbax arrays) lands sharded too. Sharded
        # leaves flow through the unchanged jitted step; elementwise updates
        # preserve the layout across steps.
        if self.fsdp:
            from morgana_tpu import parallel
            (self.loop.params, self.loop.opt_state, self.loop.ema_params,
             fsdp_shardings) = parallel.shard_fsdp_state(
                self.loop.params, self.loop.opt_state, self.loop.ema_params,
                self.mesh, tensor_parallel=self.tensor_parallel > 1)
            num_sharded = sum(
                1 for s in fsdp_shardings.values() if 'data' in s.spec)
            self.logger.info(
                "FSDP: %d/%d parameter leaves sharded %d-way over 'data' "
                '(+ Adam moments and EMA)', num_sharded,
                len(fsdp_shardings), self.mesh.shape['data'])

        #
        # Data loaders.
        #

        if self.train:
            self.train_loader = self.load_data(
                self.model.train_data_sources(), self.train_dir, self.train_id_list,
                normalisers, name='train')
        if self.valid:
            self.valid_loader = self.load_data(
                self.model.valid_data_sources(), self.valid_dir, self.valid_id_list,
                normalisers, name='valid', shuffle=False)
        if self.test:
            self.test_loader = self.load_data(
                self.model.test_data_sources(), self.test_dir, self.test_id_list,
                normalisers, name='test', shuffle=False)

        self.log_initial_setup(experiment_name=experiment_name, **kwargs)

        if self.is_lead_host:
            try:
                from tensorboardX import SummaryWriter
                self.model.tensorboard = SummaryWriter(self.experiment_dir)
            except Exception:  # noqa: BLE001 - observability must not break training
                self.logger.warning('tensorboardX unavailable; model.tensorboard is None')

        self.finalise_init()

    # ------------------------------------------------------------------ init

    def finalise_init(self):
        r"""Initialisation that requires normalisers can be performed here."""
        self.model.finalise_init()
        if self.ema_decay and self.ema:
            self.ema.model.finalise_init()

    def log_initial_setup(self, **kwargs):
        r"""Copies the model definition on first run; logs model summary + config.

        Only the lead host writes (shared-filesystem safety in multi-host runs).
        """
        if not self.is_lead_host:
            return
        if self.experiment_is_new and hasattr(sys.modules['__main__'], '__file__'):
            model_class_file = sys.modules['__main__'].__file__
            os.makedirs(self.experiment_dir, exist_ok=True)
            try:
                shutil.copy2(model_class_file, self.experiment_dir)
            except (shutil.SameFileError, FileNotFoundError):
                pass

        os.makedirs(self.experiment_dir, exist_ok=True)
        self.logger.info('\n\n%s\n\n', self.model)
        with open(os.path.join(self.experiment_dir, 'model_summary.txt'), 'w') as f:
            f.write(str(self.model))

        self.logger.info('\n\n%s\n\n', json.dumps(kwargs, indent=4, default=str))
        with open(os.path.join(self.experiment_dir, 'config.json'), 'w') as f:
            json.dump(kwargs, f, indent=4, default=str)

    def _training_state_for(self, checkpoint_path):
        """The ``.train.pkl`` sidecar contents for a params checkpoint (cached
        — resume logic consults it at several points), or None when absent or
        unreadable."""
        path = checkpointing.training_state_path_for(checkpoint_path)
        if path not in self._train_state_cache:
            state = None
            if os.path.exists(path):
                try:
                    state = checkpointing.load_training_state(path)
                except Exception as exc:  # noqa: BLE001 - resume is best-effort
                    self.logger.warning('Could not read training-state sidecar '
                                        '%s (%s)', path, exc)
            self._train_state_cache[path] = state
        return self._train_state_cache[path]

    def _mid_epoch_position(self, checkpoint_path):
        """``(epoch, batches_done, num_batches)`` recorded in a checkpoint's
        sidecar when it was saved mid-epoch, else None."""
        state = self._training_state_for(checkpoint_path)
        extra = (state or {}).get('extra') or {}
        if extra.get('batches_done') is None or not extra.get('epoch'):
            return None
        return (int(extra['epoch']), int(extra['batches_done']),
                int(extra['num_batches']) if extra.get('num_batches') else None)

    def _step_checkpoint_path(self):
        return os.path.join(self.experiment_dir, 'checkpoints', 'step.npz')

    @property
    def _cross_host_params(self):
        """True when parameter leaves are sharded ACROSS hosts (--fsdp
        --multihost): no single host can materialise them as numpy, so the
        .npz/.pkl checkpoint writes are skipped and Orbax (which writes each
        host's shards natively) owns the save/resume path."""
        return self.fsdp and self.process_count > 1

    @property
    def _rank_saves_lengths(self):
        """Multihost + --length_sort_window: every rank must snapshot its
        own shard's learned length map at step-checkpoint boundaries (the
        lead-host sidecar only describes the lead host's shard). Not under
        --fsdp --multihost: no step sidecar is written there (Orbax owns
        checkpoints at epoch granularity), so the snapshots would be dead
        I/O with no resume position to pair against."""
        return bool(self.length_sort_window) and self.process_count > 1 \
            and not self._cross_host_params

    def _rank_lengths_path(self):
        return os.path.join(self.experiment_dir, 'checkpoints',
                            f'step.lengths.p{self.process_index}.pkl')

    def _load_rank_lengths(self, epoch, batches_done):
        """This rank's length-map snapshot, iff it was taken at exactly the
        sidecar's resume position (a crash between the lead host's sidecar
        write and a rank's snapshot leaves a torn pair — detected here, and
        the resume degrades to the documented approximate-order warning)."""
        path = self._rank_lengths_path()
        if not os.path.exists(path):
            return None
        try:
            with open(path, 'rb') as f:
                payload = pickle.load(f)
        except Exception:
            return None
        if payload.get('epoch') != epoch or \
                payload.get('batches_done') != batches_done:
            return None
        return payload.get('lengths')

    def _save_step_checkpoint(self, batches_done, num_batches, lr_schedule):
        """Writes the rolling mid-epoch checkpoint (atomically — a crash
        mid-write must not corrupt the only copy): parameters to
        ``checkpoints/step.npz`` plus a ``.train.pkl`` sidecar carrying the
        full training state and the exact position
        (epoch, batches_done, num_batches). Under multihost with
        --length_sort_window every rank (lead included) also snapshots its
        own loader length map; non-lead ranks write nothing else (the
        parameters are replicated — the lead host's copy is the
        checkpoint)."""
        if self._rank_saves_lengths:
            payload = {'epoch': int(self.epoch),
                       'batches_done': int(batches_done),
                       'lengths': self.train_loader.lengths_state()}
            lpath = self._rank_lengths_path()
            os.makedirs(os.path.dirname(lpath), exist_ok=True)
            with open(lpath + '.tmp', 'wb') as f:
                pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(lpath + '.tmp', lpath)
        if not self.is_lead_host or self._cross_host_params:
            # Cross-host-sharded params cannot be fetched to one host;
            # epoch-granular Orbax checkpoints cover --fsdp --multihost.
            return
        self.loop.sync_model()
        path = self._step_checkpoint_path()
        checkpointing.save_state_dict(nn.state_dict(self.model), path, atomic=True)
        sidecar = checkpointing.training_state_path_for(path)
        checkpointing.save_training_state(
            sidecar, params=self.loop.params, opt_state=self.loop.opt_state,
            ema_params=self.loop.ema_params, step=self.loop.step_count,
            extra={'lr_schedule': lr_schedule.state_dict()
                   if hasattr(lr_schedule, 'state_dict') else None,
                   'epoch': int(self.epoch), 'batches_done': int(batches_done),
                   'num_batches': int(num_batches),
                   # With length_sort_window the batch order is a function of
                   # the loader's learned lengths; snapshotting them makes
                   # the mid-epoch replay exact even for length-sorted runs.
                   # Single-host they ride here; under multihost each rank
                   # (whose loader sees only its own id-list shard) writes
                   # its own step.lengths.pN.pkl instead — see
                   # _save_step_checkpoint/_load_rank_lengths.
                   'loader_lengths': (self.train_loader.lengths_state()
                                      if self.length_sort_window
                                      and self.process_count == 1 else None)},
            atomic=True)
        self._train_state_cache.pop(sidecar, None)

    def _latest_checkpoint(self, ema=False):
        """Newest ``epoch_{N}{_ema}.npz`` in this experiment's checkpoint dir,
        or None."""
        ckpt_dir = os.path.join(self.experiment_dir, 'checkpoints')
        if not os.path.isdir(ckpt_dir):
            return None
        import re
        pattern = re.compile(r'epoch_(\d+)_ema\.npz$' if ema else r'epoch_(\d+)\.npz$')
        found = [(int(m.group(1)), f) for f in os.listdir(ckpt_dir)
                 for m in [pattern.fullmatch(f)] if m]
        if not found:
            return None
        return os.path.join(ckpt_dir, max(found)[1])

    def resolve_latest_checkpoints(self):
        r"""``--checkpoint_path latest``: one-command resume. Resolves to the
        newest checkpoint in the experiment directory (fresh start when there
        is none — the same command is safe on first launch and on relaunch
        after a failure), and bumps ``start_epoch`` past the resumed epoch."""
        if self.checkpoint_path != 'latest' and self.ema_checkpoint_path != 'latest':
            return
        resolved_main = self.checkpoint_path == 'latest'
        if resolved_main:
            self.checkpoint_path = self._latest_checkpoint()
            self.logger.info('Resolved --checkpoint_path latest -> %s',
                             self.checkpoint_path or '(none; fresh start)')
        if self.ema_checkpoint_path == 'latest':
            self.ema_checkpoint_path = self._latest_checkpoint(ema=True)
        # Bump start_epoch only for a checkpoint WE resolved: an explicit
        # --checkpoint_path must keep the overwrite-protection check in
        # resolve_setting_conflicts (passing --ema_checkpoint_path latest
        # alongside it must not silently change start_epoch).
        if resolved_main and self.checkpoint_path and self.train:
            ckpt_epoch = utils.get_epoch_from_checkpoint_path(self.checkpoint_path)
            if self.start_epoch <= ckpt_epoch:
                self.start_epoch = ckpt_epoch + 1
                self.logger.info('Resuming: start_epoch -> %d', self.start_epoch)
        if resolved_main and self.train:
            self._maybe_resolve_step_checkpoint()

    def _maybe_resolve_step_checkpoint(self):
        """Step-level resume: when ``--step_checkpoint_interval`` runs left a
        rolling ``checkpoints/step.npz`` that is NEWER than the newest epoch
        checkpoint (its sidecar records an epoch past the last completed one),
        ``--checkpoint_path latest`` resumes from it — at the exact batch.
        A step checkpoint from an already-completed epoch is stale and
        ignored (the epoch checkpoint supersedes it)."""
        step_ckpt = self._step_checkpoint_path()
        if not os.path.exists(step_ckpt):
            return
        position = self._mid_epoch_position(step_ckpt)
        if position is None:
            return
        step_epoch, batches_done, num_batches = position
        epoch_ckpt_epoch = (utils.get_epoch_from_checkpoint_path(self.checkpoint_path)
                            if self.checkpoint_path else 0)
        if step_epoch <= epoch_ckpt_epoch or self.start_epoch > step_epoch + 1:
            return
        self.checkpoint_path = step_ckpt
        if num_batches is not None and batches_done >= num_batches:
            # The epoch actually ran to completion (e.g. it was not a
            # checkpointing epoch); resume after it.
            self.start_epoch = step_epoch + 1
        else:
            self.start_epoch = step_epoch
        self.logger.info('Resolved --checkpoint_path latest -> %s '
                         '(mid-epoch: epoch %d, %d/%s batches done)',
                         step_ckpt, step_epoch, batches_done,
                         num_batches if num_batches is not None else '?')

    def _prune_checkpoints(self, keep):
        """Retention: deletes all but the newest ``keep`` epochs' checkpoint
        files (params, EMA, training-state sidecars)."""
        import re
        ckpt_dir = os.path.join(self.experiment_dir, 'checkpoints')
        if not os.path.isdir(ckpt_dir):
            return
        by_epoch = {}
        for fname in os.listdir(ckpt_dir):
            # Emergency saves (epoch_{N}_interrupted.npz) are exempt from
            # retention: they exist precisely because the run did not reach
            # a clean later checkpoint.
            if '_interrupted' in fname:
                continue
            match = re.match(r'epoch_(\d+)', fname)
            if match:
                by_epoch.setdefault(int(match.group(1)), []).append(fname)
        for epoch in sorted(by_epoch)[:-keep]:
            for fname in by_epoch[epoch]:
                try:
                    os.remove(os.path.join(ckpt_dir, fname))
                except OSError:
                    pass

    @staticmethod
    def _dispatch_rtt_ms(rounds=5):
        """Median round-trip latency (ms) of one trivial jitted dispatch +
        scalar host readback — the per-batch overhead a training loop pays
        on this device link. On a local chip this is well under a
        millisecond; on a tunnelled/remote device it is a network round
        trip (~25-30 ms measured), which is exactly when chained dispatch
        (--steps_per_dispatch) wins. The operand feeds back on itself so
        repeated dispatches are never deduplicated (tunnel benchmarking
        rule, docs/design.md)."""
        import time as _time
        import jax.numpy as jnp
        fn = jax.jit(lambda x: x + 1)
        x = fn(jnp.float32(0))
        float(x)  # compile + warmup, readback barrier
        times = []
        for _ in range(rounds):
            t0 = _time.perf_counter()
            x = fn(x)
            float(x)
            times.append(_time.perf_counter() - t0)
        return float(np.median(times) * 1e3)

    def _resolve_fast_path_defaults(self, kwargs):
        """TPU-first by default: when the user does not say otherwise,
        training on an accelerator backend auto-enables the measured e2e
        ladder — --device_normalise, --device_cache (with the existing
        over-budget streaming fallback) and, when a startup probe finds the
        device link dispatch-latency-bound, --steps_per_dispatch 16 (the
        bench headline chain length). Explicit flags always win
        (--no-device_cache / --no-device_normalise / --steps_per_dispatch 1
        opt out), and AUTO never creates a conflict: shard_map_step keeps
        its per-batch path, and multihost caches per-process corpus shards
        (falling back to streaming on non-pure-data meshes). CPU backends
        keep all three off — there is no device link to save."""
        try:
            on_accel = jax.default_backend() != 'cpu'
        except Exception:
            on_accel = False
        auto = []
        if self.device_normalise is None:
            self.device_normalise = bool(on_accel)
            if self.device_normalise:
                auto.append('--device_normalise')
        explicit_chain = self.steps_per_dispatch is not None \
            and self.steps_per_dispatch > 1
        if self.device_cache is None:
            # An explicit --steps_per_dispatch N implies the device cache
            # (chains assemble batches from the device-resident corpus).
            # Multi-host composes since round 5: each process caches its own
            # corpus shard (data/device_cache.py).
            self.device_cache = bool(explicit_chain or on_accel)
            if self.device_cache and not explicit_chain:
                auto.append('--device_cache')
        if self.steps_per_dispatch is None:
            self.steps_per_dispatch = 1
            chain_ok = (self.device_cache
                        and not kwargs.get('shard_map_step', False))
            if chain_ok and on_accel:
                try:
                    rtt_ms = self._dispatch_rtt_ms()
                except Exception:
                    rtt_ms = None
                if rtt_ms is not None and rtt_ms >= 5.0:
                    self.steps_per_dispatch = 16
                    auto.append(f'--steps_per_dispatch 16 '
                                f'(dispatch round trip ~{rtt_ms:.1f} ms)')
                elif rtt_ms is not None:
                    self.logger.info(
                        'Dispatch round trip ~%.2f ms (local link): '
                        'per-batch dispatch, no chaining needed', rtt_ms)
        if auto:
            self.logger.info(
                'TPU-first defaults: %s auto-enabled (opt out with '
                '--no-device_cache / --no-device_normalise / '
                '--steps_per_dispatch 1)', ', '.join(auto))

    def resolve_setting_conflicts(self):
        r"""Checks and reconciles settings (reference
        ``morgana/experiment_builder.py:337-384``)."""
        if not (self.train or self.valid or self.test):
            raise ValueError('No process specified, use --train, --valid, or --test.')

        if self.train:
            if self.checkpoint_path:
                checkpoint_epoch = utils.get_epoch_from_checkpoint_path(self.checkpoint_path)
                if self.start_epoch <= checkpoint_epoch:
                    raise ValueError(
                        'Warning: --start_epoch is less than or equal to --checkpoint_path epoch, this may '
                        'cause checkpoints to be overwritten. Either rename the checkpoint or increase '
                        'start_epoch,\n'
                        '\tcheckpoint_path: {path}\n'
                        '\tstart_epoch\t <= checkpoint_epoch\n'
                        '\t{s_epoch}\t\t <= {c_epoch}'.format(
                            path=self.checkpoint_path, s_epoch=self.start_epoch,
                            c_epoch=checkpoint_epoch))

            if self.lr_schedule_name == 'plateau' and not self.valid:
                raise ValueError(
                    "To use the 'plateau' learning rate schedule you must turn on the validation process.")

        if (not self.train) and (self.valid or self.test):
            if self.checkpoint_path:
                self.epoch = utils.get_epoch_from_checkpoint_path(self.checkpoint_path)
            else:
                raise ValueError('If we are performing evaluations without training a checkpoint '
                                 'must be specified using --checkpoint_path.')

    def build_model(self, model_class, model_kwargs, checkpoint_path=None):
        r"""Creates the model instance; loads checkpoint parameters if given."""
        model = model_class(**model_kwargs)
        if checkpoint_path:
            self.logger.info('Loading model checkpoint from\n\t%s\n', checkpoint_path)
            model.load_parameters(checkpoint_path)
        return model

    def load_data(self, data_sources, data_dir, id_list, normalisers=None, name='', shuffle=True):
        r"""Creates a dataset + prefetching loader for one split.

        Multi-host: each host keeps only its slice of the id list (per-host
        sharded loading over DCN) and batches ``local_batch_size`` items; the
        global batch is assembled device-side by the loader's sharding.
        """
        self.logger.info('Loading %s data using %s from\n\t%s/%s',
                         name, id_list, self.data_root, data_dir)
        dataset = data.FilesDataset(data_sources, data_dir, id_list, normalisers, self.data_root,
                                    device_normalise=self.device_normalise)
        device_transform = None
        if dataset.device_names:
            from morgana_tpu.data.device_normalise import make_device_transform
            device_transform, engaged = make_device_transform(
                data_sources, normalisers, names=dataset.device_names,
                wire_dtype=self.transfer_dtype)
            self.logger.info(
                '%s: device-side normalisation for %s (raw streams only on '
                'the host->device wire)', name, sorted(engaged))
        if self.process_count > 1:
            from morgana_tpu import parallel
            dataset.file_ids = parallel.shard_id_list(
                dataset.file_ids, self.process_index, self.process_count)
            self.logger.info('%s: host shard %d/%d holds %d utterances',
                             name, self.process_index, self.process_count,
                             len(dataset.file_ids))
        # Sharded batches must be full-size on the TRAIN loader (a partial
        # batch would recompile the fused step and skew batch statistics) and
        # on every multi-host loader (hosts iterate in lockstep). Single-host
        # eval loaders keep the tail: the loader falls back to unsharded
        # placement for a final batch the data axis cannot divide, so no
        # utterance silently misses validation/synthesis.
        drop_remainder = bool(self.batch_sharding) and \
            (shuffle or self.process_count > 1)
        if drop_remainder:
            dropped = len(dataset.file_ids) % self.local_batch_size
            if dropped:
                self.logger.info(
                    '%s: final partial batch of %d utterance(s) is dropped '
                    '(sharded %s batches must be full-size)',
                    name, dropped, name)
        device_cache = None
        use_cache = self.device_cache
        if use_cache and self.process_count > 1 and self.tensor_parallel > 1:
            # The multi-host cache's row-per-device arena layout needs a
            # pure-data mesh; cross-host TP keeps the streaming loader.
            if not getattr(self, '_mh_cache_fallback_logged', False):
                self._mh_cache_fallback_logged = True
                self.logger.warning(
                    '--device_cache with --multihost requires a pure '
                    'data-parallel mesh; --tensor_parallel %d keeps the '
                    'streaming loader', self.tensor_parallel)
            use_cache = False
        if use_cache:
            from morgana_tpu.data.device_cache import (CacheOverBudget,
                                                       DeviceCorpusCache)
            # The budget is for the PROCESS: every split's arenas coexist
            # in HBM, so each successive cache builds against what is left.
            budget = int(self.device_cache_gb * 2**30) or None
            used = getattr(self, '_device_cache_bytes_used', 0)
            remaining_budget = None if budget is None \
                else max(budget - used, 0)
            try:
                device_cache = DeviceCorpusCache(
                    dataset, max_bytes=remaining_budget,
                    sharding=self.batch_sharding or None)
                self._device_cache_bytes_used = used + device_cache.bytes
                self.logger.info('%s: device cache built — %s; per-batch '
                                 'wire traffic is now index vectors only '
                                 '(%.2f/%s GiB budget used across splits)',
                                 name, device_cache.describe(),
                                 self._device_cache_bytes_used / 2**30,
                                 f'{self.device_cache_gb:g}')
            except CacheOverBudget as e:
                self.logger.warning(
                    '%s: --device_cache falls back to the streaming loader '
                    '(%s)', name, e)
        return data.batch(dataset, batch_size=self.local_batch_size, shuffle=shuffle,
                          num_data_threads=self.num_data_threads,
                          sharding=self.batch_sharding, seed=self.seed,
                          drop_remainder=drop_remainder,
                          length_sort_window=self.length_sort_window if shuffle else 0,
                          transfer_dtype=self.transfer_dtype,
                          device_transform=device_transform,
                          device_cache=device_cache)

    # ----------------------------------------------------------------- train

    def _log_metrics_to_tensorboard(self, mode):
        """Writes the epoch's visible scalar metrics to TensorBoard."""
        tb = self.model.tensorboard
        if tb is None:
            return
        for name, value in self.model.metrics.results_as_json_dict(mode).items():
            if isinstance(value, (int, float)):
                try:
                    tb.add_scalar(f'{mode}/{name}', value, self.epoch)
                except Exception:  # noqa: BLE001 - observability must not break training
                    pass

    def _for_analysis(self, tree):
        """Host-local numpy view of a batch for host-side analysis hooks.

        Multi-host: global arrays are sliced back to the rows THIS host
        loaded, so they pair with the host-local 'name' lists and every host
        analyses its own utterances."""
        if self.process_count > 1:
            from morgana_tpu import parallel
            return parallel.host_local_batch(tree)
        return tree

    def train_epoch(self, data_loader, lr_schedule=None, gen_output=False, out_dir=None):
        r"""Trains once over all batches: fused jit steps, EMA, batch-level LR
        schedule updates, metric accumulation, per-epoch metrics.json."""
        self.model.mode = 'train'
        self.model.metrics.reset_state('train')

        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

        num_batches = len(data_loader)
        # Mid-epoch resume: skip the batches already folded into the restored
        # parameters; step numbering and the epoch-end force_apply account
        # for the offset. With --length_sort_window the order is a function
        # of the loader's learned lengths, restored from the sidecar so the
        # replay stays exact (absent from pre-snapshot sidecars -> warned).
        skip = 0
        if self._resume_batches_done:
            skip, self._resume_batches_done = self._resume_batches_done, 0
            if self._resume_loader_lengths is not None:
                data_loader.set_lengths(self._resume_loader_lengths)
                self._resume_loader_lengths = None
            data_loader.set_skip_batches(skip)
        pbar = _logging.ProgressBar(num_batches - skip, print_interval=self.log_interval)
        epoch_start = time.perf_counter()

        # Chained multi-step dispatch (--steps_per_dispatch): consecutive
        # same-shape batches run as one compiled scan over the device-cached
        # corpus. Generation epochs need per-batch outputs for the analysis
        # hooks, so they fall back to the per-batch loop.
        use_chain = (self.steps_per_dispatch > 1
                     and getattr(data_loader, 'device_cache', None) is not None
                     and not gen_output)
        if self.steps_per_dispatch > 1 and not use_chain \
                and not getattr(self, '_chain_fallback_logged', False):
            self._chain_fallback_logged = True
            reason = 'generation epochs need per-batch outputs' if gen_output \
                else 'the device cache fell back to the streaming loader'
            self.logger.info('--steps_per_dispatch: per-batch loop this '
                             'epoch (%s)', reason)
        if use_chain:
            losses, frames_seen = self._chained_train_batches(
                data_loader, lr_schedule, skip, num_batches, pbar)
        else:
            losses, frames_seen = self._train_batches(
                data_loader, lr_schedule, gen_output, out_dir, skip,
                num_batches, pbar)

        if gen_output:
            self.model.analysis_for_train_epoch(out_dir=out_dir, **self.analysis_kwargs)

        if out_dir and self.is_lead_host:
            # Per-epoch step-time observability alongside the model metrics.
            epoch_metrics = dict(self.model.metrics.results_as_json_dict('train'))
            duration = time.perf_counter() - epoch_start
            epoch_metrics['epoch_duration_s'] = round(duration, 3)
            if num_batches - skip:
                epoch_metrics['ms_per_step'] = round(
                    1e3 * duration / (num_batches - skip), 3)
            # Multi-host global arrays span non-addressable devices and can't
            # be fetched with np.asarray; skip the frames rate there.
            if frames_seen and all(getattr(f, 'is_fully_addressable', True)
                                   for f in frames_seen):
                total = float(np.sum([np.asarray(f).sum() for f in frames_seen]))
                epoch_metrics['frames_per_sec'] = round(total / duration, 1)
            file_io.save_json(epoch_metrics, os.path.join(out_dir, 'metrics.json'))
        self._log_metrics_to_tensorboard('train')

        self.model.mode = ''
        # One bulk transfer, not a readback per batch scalar (each float()
        # of a device array is a full round trip on a tunnelled device).
        # Accumulate in f64: under compute_dtype='bfloat16' the per-batch
        # losses arrive as bf16 and numpy would reduce IN bf16, adding
        # ~0.1-1% noise to the value plateau LR scheduling thresholds on.
        # Chained dispatch appends (chain_len,) vectors; flatten so the
        # epoch loss stays the mean over BATCHES either way.
        if not losses:
            return 0.0
        flat = np.concatenate([np.atleast_1d(np.asarray(x, np.float64))
                               for x in jax.device_get(losses)])
        return float(flat.mean())

    def _train_batches(self, data_loader, lr_schedule, gen_output, out_dir,
                       skip, num_batches, pbar):
        """The per-batch training loop: one fused-step dispatch per batch.
        Returns the per-batch device losses and ``n_frames`` arrays."""
        losses = []
        frames_seen = []
        for i, features in zip(pbar, data_loader):
            self.model.step = (self.epoch - 1) * num_batches + skip + i + 1
            if 'n_frames' in features:
                # Device arrays: summed lazily at epoch end (no per-batch sync).
                frames_seen.append(features['n_frames'])

            lr = lr_schedule.lr if lr_schedule is not None else self.learning_rate
            # StepTraceAnnotation groups each step's ops in profiler traces
            # (--profile_dir); free when no trace is active.
            with jax.profiler.StepTraceAnnotation('train', step_num=self.model.step):
                # The last batch closes any open gradient-accumulation cycle
                # so every epoch ends with fully-applied parameters (eval,
                # checkpointing and exact resume never see a half cycle).
                batch_loss, staged, output_features = self.loop.train_step(
                    features, lr, force_apply=(skip + i == num_batches - 1))

            if lr_schedule is not None and self.loop.last_step_applied and \
                    self.lr_schedule_name in lr_schedules.BATCH_LR_SCHEDULES:
                lr_schedule.step()

            losses.append(batch_loss)

            if self.memory_report and not self._memory_report_written \
                    and self.is_lead_host:
                self._write_memory_report(features)

            self.model.metrics.apply_staged(staged, tag='train')
            self.model.metrics.accumulate(self.model.mode, loss=batch_loss)
            pbar.maybe_print('train', self.epoch, lambda: dict(
                batch_loss=utils.format_float_tensor(batch_loss),
                **self.model.metrics.results_as_str_dict('train')))

            # Rolling mid-epoch checkpoint (step-level fault tolerance).
            # Only at applied-parameter boundaries: a checkpoint inside an
            # open gradient-accumulation cycle could not resume exactly.
            if (self.step_checkpoint_interval
                    and (self.is_lead_host or self._rank_saves_lengths)
                    and self.loop.last_step_applied
                    and (skip + i + 1) % self.step_checkpoint_interval == 0):
                self._save_step_checkpoint(skip + i + 1, num_batches, lr_schedule)

            if gen_output:
                self.loop.sync_model()
                self.model.analysis_for_train_batch(
                    self._for_analysis(features), self._for_analysis(output_features),
                    out_dir=out_dir, **self.analysis_kwargs)
        return losses, frames_seen

    def _chain_groups(self, loader, cache):
        """Groups the epoch's batch index arrays into ``(n, B)`` matrices of
        CONSECUTIVE equal-shape-signature batches, ``n <=
        steps_per_dispatch`` — the unit of chained dispatch, yielded as
        ``(idx_mat, lengths)`` where ``lengths`` is the group's shared
        padded-length dict. Grouping only affects how many batches share one
        program call; each batch's content, order and step numbering are
        exactly the streaming path's.

        Multi-host: the per-batch lengths are harmonised across hosts up
        front (one allgather for the epoch), so every host computes the SAME
        signatures — and therefore the same groups — and the global batch
        shape agrees."""
        batches = loader.iter_batch_indices()
        lengths_list = [cache.padded_lengths(idxs, bucket=loader.bucket)
                        for idxs in batches]
        if getattr(cache, 'multihost', False):
            lengths_list = cache.harmonise_lengths(lengths_list)
        cur, cur_sig, cur_lengths = [], None, None
        for idxs, lengths in zip(batches, lengths_list):
            if loader.length_sort_window:
                # Same per-batch length recording as the cached streaming
                # iterator, so epoch orders match the host path exactly.
                for i in idxs:
                    loader._lengths[int(i)] = int(cache.item_lengths[int(i)])
            sig = cache.batch_signature(idxs, bucket=loader.bucket,
                                        lengths=lengths)
            if cur and (sig != cur_sig or len(cur) >= self.steps_per_dispatch):
                yield np.stack(cur), cur_lengths
                cur = []
            cur_sig, cur_lengths = sig, lengths
            cur.append(idxs)
        if cur:
            yield np.stack(cur), cur_lengths

    def _chained_train_batches(self, data_loader, lr_schedule, skip,
                               num_batches, pbar):
        """The --steps_per_dispatch training loop: consecutive same-shape
        batches run as ONE compiled program (``TrainLoop.train_chain``), so
        steady-state host work per chain is one dispatch and one (n, B)
        index upload. Per-step numerics (LR schedule, stateless RNG, EMA,
        metric partials) are identical to the per-batch loop."""
        cache = data_loader.device_cache
        loader = data_loader.data_loader
        post = data_loader.device_transform
        # Multi-host: host_stacked holds only this process's shard — skip
        # frames/sec accounting (matching the streaming multihost path,
        # which skips it for non-addressable global arrays).
        n_frames_host = None if getattr(cache, 'multihost', False) \
            else cache.host_stacked('n_frames')
        losses = []
        frames_seen = []
        done = 0
        try:
            for idx_mat, lengths in self._chain_groups(loader, cache):
                n = len(idx_mat)
                first_step = (self.epoch - 1) * num_batches + skip + done + 1
                # The last batch of the epoch closes any open gradient-
                # accumulation cycle (force apply), exactly like the
                # per-batch loop's force_apply at num_batches - 1.
                epoch_last = skip + done + n == num_batches
                # Pre-step LR per chained step; batch-level schedules advance
                # once per APPLIED step, exactly as the per-batch loop does
                # (with accumulation only every Nth step applies — the
                # schedule is deterministic, so it is computed up front).
                apply_flags, _ = self.loop.chain_apply_schedule(
                    n, idx_mat.shape[1], force_apply_last=epoch_last)
                lrs = []
                for applied in apply_flags:
                    lrs.append(lr_schedule.lr if lr_schedule is not None
                               else self.learning_rate)
                    if applied and lr_schedule is not None and \
                            self.lr_schedule_name in lr_schedules.BATCH_LR_SCHEDULES:
                        lr_schedule.step()

                with jax.profiler.StepTraceAnnotation('train', step_num=first_step):
                    if n == 1:
                        # Singletons (signature changes, remainder batches)
                        # take the ordinary fused step on an assembled batch —
                        # identical to the unchained cached path.
                        features = cache.assemble(idx_mat[0],
                                                  bucket=loader.bucket,
                                                  post=post, lengths=lengths)
                        batch_loss, staged, _ = self.loop.train_step(
                            features, lrs[0], force_apply=epoch_last)
                        self.model.metrics.apply_staged(staged, tag='train')
                    else:
                        batch_loss, staged = self.loop.train_chain(
                            cache, idx_mat, lrs, post=post,
                            batch_sharding=self.batch_sharding or None,
                            bucket=loader.bucket, force_apply_last=epoch_last,
                            lengths=lengths)
                        self.model.metrics.apply_staged(staged, tag='train',
                                                        steps=n)
                losses.append(batch_loss)
                # A (chain,) loss vector accumulates as n per-batch scalars
                # (Mean sums elements and counts n).
                self.model.metrics.accumulate(self.model.mode, loss=batch_loss)

                done += n
                self.model.step = (self.epoch - 1) * num_batches + skip + done
                if n_frames_host is not None:
                    frames_seen.append(
                        n_frames_host[np.asarray(idx_mat).reshape(-1)].sum())

                if self.memory_report and not self._memory_report_written \
                        and self.is_lead_host:
                    self._write_memory_report(
                        cache.assemble(idx_mat[0], bucket=loader.bucket,
                                       post=post, lengths=lengths))

                pbar.advance(n)
                pbar.maybe_print('train', self.epoch, lambda b=batch_loss: dict(
                    batch_loss=utils.format_float_tensor(
                        b if getattr(b, 'ndim', 0) == 0 else b[-1]),
                    **self.model.metrics.results_as_str_dict('train')), count=n)

                # Mid-epoch checkpoints land at the first chain boundary at or
                # past each interval multiple (chains need not align). Only at
                # applied-parameter boundaries: a checkpoint inside an open
                # gradient-accumulation cycle could not resume exactly.
                if (self.step_checkpoint_interval
                        and (self.is_lead_host or self._rank_saves_lengths)
                        and self.loop.last_step_applied
                        and (skip + done) // self.step_checkpoint_interval
                        > (skip + done - n) // self.step_checkpoint_interval):
                    self._save_step_checkpoint(skip + done, num_batches,
                                               lr_schedule)
        finally:
            pbar.close()
        return losses, frames_seen

    def _write_memory_report(self, features):
        """One-time compile-time HBM report of the fused train step
        (--memory_report), on the first batch's shapes."""
        self._memory_report_written = True
        report_path = os.path.join(self.experiment_dir, 'memory_report.txt')
        program = memory.write_report(
            report_path, self.loop, features,
            header=f'{type(self.model).__name__} fused train step')
        if program and 'peak_bytes' in program:
            self.logger.info('Train-step peak device memory %.2f MiB '
                             '(report: %s)', program['peak_bytes'] / 2**20,
                             report_path)
        else:
            self.logger.info('Memory report written to %s (no compile-time '
                             'analysis on this backend)', report_path)

    def run_train(self):
        r"""Runs training from ``start_epoch`` to ``end_epoch``: checkpointing
        (+EMA), validation/generation, epoch-level LR schedule updates."""
        self.logger.info('epoch %2d: Beginning training', self.start_epoch)

        lr_schedule = self._lr_schedule(self.learning_rate)
        if self._restored_lr_state is not None:
            lr_schedule.load_state_dict(self._restored_lr_state)
            self.logger.info('Restored LR-schedule state (last_epoch=%s)',
                             getattr(lr_schedule, 'last_epoch', '?'))

        self._profiling = False
        if self.profile_dir:
            os.makedirs(self.profile_dir, exist_ok=True)
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True

        try:
            self._train_epochs(lr_schedule)
        finally:
            # Divergence, KeyboardInterrupt, or a resume that skips every
            # epoch must still finalise the trace — an unstopped trace is
            # lost/corrupt. (No-op when the epoch loop already stopped it.)
            self._stop_profiling()

    def _stop_profiling(self):
        if getattr(self, '_profiling', False):
            jax.profiler.stop_trace()
            self._profiling = False
            self.logger.info('Profiler trace written to %s', self.profile_dir)

    def _fire(self, event, *args):
        """Dispatches a Callback hook; True when any callback asks to stop."""
        stop = False
        for cb in self.callbacks:
            stop = bool(getattr(cb, event)(self, *args)) or stop
        return stop

    def _train_epochs(self, lr_schedule):
        self._fire('on_train_begin')
        # Deterministic shuffle replay: key the loader's epoch counter to the
        # global epoch number, so a resumed run draws exactly the shuffled
        # orders the uninterrupted run would have (fresh start: a no-op).
        set_epoch = getattr(self.train_loader, 'set_epoch', None)
        if set_epoch is not None:
            set_epoch(self.start_epoch - 1)
        stop_requested = False
        for self.epoch in range(self.start_epoch, self.end_epoch + 1):
            self._fire('on_epoch_begin', self.epoch)
            gen_train_output = self.epoch % self.train_output_interval == 0
            epoch_train_dir = os.path.join(self.experiment_dir, 'train', f'epoch_{self.epoch}')

            self.logger.info('epoch %2d: Training model', self.epoch)
            if gen_train_output:
                self.logger.info('\toutput being saved to\n\t%s', epoch_train_dir)

            train_loss = self.train_epoch(self.train_loader, lr_schedule,
                                          gen_output=gen_train_output, out_dir=epoch_train_dir)

            # Failure detection: a non-finite loss means the run has diverged;
            # stop before overwriting good checkpoints (the reference would
            # silently keep training on NaNs).
            if not np.isfinite(train_loss):
                self.logger.error('epoch %2d: training loss is %s — stopping '
                                  '(reduce --learning_rate or inspect the data)',
                                  self.epoch, train_loss)
                raise FloatingPointError(
                    f'Training diverged: epoch {self.epoch} loss {train_loss}')

            # The trace covers epoch 1 only (enough to see the steady-state
            # step without an unboundedly large trace file).
            self._stop_profiling()

            # Save model (+ EMA model + training state for exact resume).
            # The .npz/.pkl writes are lead-host-only (parameters are
            # replicated; hosts must not race on shared files). The Orbax
            # save is a COLLECTIVE: every process must call it (Orbax
            # coordinates who writes what), so it sits outside the gate.
            if self.epoch % self.model_checkpoint_interval == 0:
                if self.is_lead_host and self._cross_host_params and \
                        not getattr(self, '_npz_skip_logged', False):
                    self._npz_skip_logged = True
                    self.logger.info(
                        '--fsdp --multihost: epoch .npz checkpoints skipped '
                        '(parameters are sharded across hosts); Orbax owns '
                        'checkpoints in this mode (%s)', self.orbax_dir)
                if self.is_lead_host and not self._cross_host_params:
                    self.logger.info(
                        'epoch %2d: loss %.3f: Saving model to\n\t%s/checkpoints/epoch_%d.npz',
                        self.epoch, train_loss, self.experiment_dir, self.epoch)
                    self.loop.sync_model()
                    ckpt_path = self.model.save_parameters(self.experiment_dir, self.epoch)
                    checkpointing.save_training_state(
                        checkpointing.training_state_path_for(ckpt_path),
                        params=self.loop.params, opt_state=self.loop.opt_state,
                        ema_params=self.loop.ema_params, step=self.loop.step_count,
                        extra={'lr_schedule': lr_schedule.state_dict()
                               if hasattr(lr_schedule, 'state_dict') else None})

                    if self.ema_decay:
                        self.logger.info(
                            'epoch %2d: Saving EMA model to\n\t%s/checkpoints/epoch_%d_ema.npz',
                            self.epoch, self.experiment_dir, self.epoch)
                        self.loop.sync_ema_model()
                        self.ema.model.save_parameters(self.experiment_dir, f'{self.epoch}_ema')

                    if self.keep_checkpoints > 0:
                        self._prune_checkpoints(self.keep_checkpoints)

                if self.orbax_dir and checkpointing.orbax_available():
                    # Async: the device->host transfer and write overlap with
                    # the next epoch's compute.
                    checkpointing.orbax_save(
                        self.orbax_dir, self.epoch,
                        {'params': self.loop.params, 'opt_state': self.loop.opt_state,
                         'ema_params': self.loop.ema_params, 'step': self.loop.step_count})
                    if self.is_lead_host and hasattr(lr_schedule, 'state_dict'):
                        # LR-schedule sidecar for exact Orbax resume (see the
                        # restore path in __init__).
                        os.makedirs(self.orbax_dir, exist_ok=True)
                        lr_path = checkpointing.orbax_sidecar_path(
                            self.orbax_dir, self.epoch)
                        with open(lr_path, 'wb') as f:
                            pickle.dump(lr_schedule.state_dict(), f)
                        # Sidecars live and die with their Orbax step.
                        checkpointing.orbax_prune_sidecars(self.orbax_dir)

            # Run validation.
            if self.valid:
                gen_valid_output = self.epoch % self.valid_output_interval == 0
                val_loss = self.run_valid(gen_valid_output)

                if self.lr_schedule_name == 'plateau':
                    lr_schedule.step(metrics=val_loss)
                stop_requested = self._fire('on_valid_end', self.epoch,
                                            float(val_loss)) or stop_requested

            # Run test.
            gen_test_output = self.epoch % self.test_output_interval == 0
            if self.test and gen_test_output:
                self.run_test()

            if self.lr_schedule_name in lr_schedules.EPOCH_LR_SCHEDULES:
                lr_schedule.step()

            stop_requested = self._fire('on_epoch_end', self.epoch,
                                        float(train_loss)) or stop_requested
            if stop_requested:
                self.logger.info('epoch %2d: stopping early (callback '
                                 'request)', self.epoch)
                break

        self._fire('on_train_end')
        if self.orbax_dir and checkpointing.orbax_available():
            checkpointing.orbax_wait(self.orbax_dir)

    # ----------------------------------------------------------------- valid

    def valid_epoch(self, data_loader, model=None, gen_output=False, out_dir=None):
        r"""Evaluates once over all batches (jitted forward, no grads)."""
        if model is None:
            model = self.ema.model if self.ema_decay else self.model
        # Use EMA parameters exactly when the EMA model was selected — the
        # passed model decides, as in the reference (morgana/experiment_builder.py:583-584).
        use_ema = bool(self.ema_decay) and self.ema is not None and model is self.ema.model

        model.mode = 'valid'
        self.model.mode = 'valid'
        model.metrics.reset_state('valid')
        self.model.metrics.reset_state('valid')

        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

        num_batches = len(data_loader)
        pbar = _logging.ProgressBar(num_batches, print_interval=self.log_interval)

        # Chained multi-step dispatch applies to validation too: eval epochs
        # are pure dispatch (no analysis outputs needed), so N same-shape
        # batches run as one compiled scan when the corpus is device-cached.
        use_chain = (self.steps_per_dispatch > 1
                     and getattr(data_loader, 'device_cache', None) is not None
                     and not gen_output)
        if use_chain:
            losses = self._chained_valid_batches(data_loader, use_ema,
                                                 num_batches, pbar)
        else:
            losses = self._valid_batches(data_loader, model, use_ema,
                                         gen_output, out_dir, num_batches,
                                         pbar)

        if gen_output:
            model.analysis_for_valid_epoch(out_dir=out_dir, **self.analysis_kwargs)

        if out_dir and self.is_lead_host:
            file_io.save_json(self.model.metrics.results_as_json_dict('valid'),
                              os.path.join(out_dir, 'metrics.json'))
        self._log_metrics_to_tensorboard('valid')

        model.mode = ''
        self.model.mode = ''
        # One bulk transfer, not a readback per batch scalar (each float()
        # of a device array is a full round trip on a tunnelled device).
        # Accumulate in f64: under compute_dtype='bfloat16' the per-batch
        # losses arrive as bf16 and numpy would reduce IN bf16, adding
        # ~0.1-1% noise to the value plateau LR scheduling thresholds on.
        # Chained dispatch appends (chain_len,) vectors; flatten so the
        # epoch loss stays the mean over BATCHES either way.
        if not losses:
            return 0.0
        flat = np.concatenate([np.atleast_1d(np.asarray(x, np.float64))
                               for x in jax.device_get(losses)])
        return float(flat.mean())

    def _valid_batches(self, data_loader, model, use_ema, gen_output, out_dir,
                       num_batches, pbar):
        """The per-batch validation loop: one eval-step dispatch per batch."""
        losses = []
        synced = False
        for i, features in zip(pbar, data_loader):
            self.model.step = (self.epoch - 1) * num_batches + i + 1

            batch_loss, staged, output_features = self.loop.eval_step(features, use_ema=use_ema)
            losses.append(batch_loss)

            self.model.metrics.apply_staged(staged, tag='eval')
            self.model.metrics.accumulate('valid', loss=batch_loss)
            pbar.maybe_print('valid', self.epoch, lambda: dict(
                batch_loss=utils.format_float_tensor(batch_loss),
                **self.model.metrics.results_as_str_dict('valid')))

            if gen_output:
                if not synced:
                    self.loop.sync_model()
                    self.loop.sync_ema_model()
                    synced = True
                model.analysis_for_valid_batch(
                    self._for_analysis(features), self._for_analysis(output_features),
                    out_dir=out_dir, **self.analysis_kwargs)
        return losses

    def _chained_valid_batches(self, data_loader, use_ema, num_batches, pbar):
        """The --steps_per_dispatch validation loop: consecutive same-shape
        batches evaluate as ONE compiled program (``TrainLoop.eval_chain``).
        Metric partials and the RNG key stream are identical to the
        per-batch loop's."""
        cache = data_loader.device_cache
        loader = data_loader.data_loader
        post = data_loader.device_transform
        losses = []
        done = 0
        try:
            for idx_mat, lengths in self._chain_groups(loader, cache):
                n = len(idx_mat)
                # Step book-keeping BEFORE the dispatch, mirroring
                # _valid_batches (which sets model.step before each batch):
                # a hook consuming model.step mid-epoch sees the step of the
                # last batch in the group, never a stale pre-group value.
                self.model.step = (self.epoch - 1) * num_batches + done + n
                if n == 1:
                    features = cache.assemble(idx_mat[0],
                                              bucket=loader.bucket,
                                              post=post, lengths=lengths)
                    batch_loss, staged, _ = self.loop.eval_step(
                        features, use_ema=use_ema)
                    self.model.metrics.apply_staged(staged, tag='eval')
                else:
                    batch_loss, staged = self.loop.eval_chain(
                        cache, idx_mat, post=post,
                        batch_sharding=self.batch_sharding or None,
                        bucket=loader.bucket, use_ema=use_ema,
                        lengths=lengths)
                    self.model.metrics.apply_staged(staged, tag='eval',
                                                    steps=n)
                losses.append(batch_loss)
                self.model.metrics.accumulate('valid', loss=batch_loss)

                done += n
                pbar.advance(n)
                pbar.maybe_print('valid', self.epoch, lambda b=batch_loss: dict(
                    batch_loss=utils.format_float_tensor(
                        b if getattr(b, 'ndim', 0) == 0 else b[-1]),
                    **self.model.metrics.results_as_str_dict('valid')), count=n)
        finally:
            pbar.close()
        return losses

    def run_valid(self, gen_output):
        r"""Runs evaluation for the current epoch (EMA weights if enabled,
        matching ``morgana/experiment_builder.py:629-632``)."""
        epoch_valid_dir = os.path.join(self.experiment_dir, 'valid', f'epoch_{self.epoch}')
        self.logger.info('epoch %2d: Evaluating loaded model on validation set', self.epoch)
        if gen_output:
            self.logger.info('\toutput being saved to\n\t%s', epoch_valid_dir)

        model = self.ema.model if self.ema_decay else self.model
        valid_loss = self.valid_epoch(self.valid_loader, model=model,
                                      gen_output=gen_output, out_dir=epoch_valid_dir)
        self.logger.info('epoch %2d: valid_loss %.3f', self.epoch, valid_loss)
        return valid_loss

    # ------------------------------------------------------------------ test

    def test_epoch(self, data_loader, model=None, out_dir=None):
        r"""Runs prediction (no loss) over all batches with analysis hooks."""
        if model is None:
            model = self.ema.model if self.ema_decay else self.model
        use_ema = bool(self.ema_decay) and self.ema is not None and model is self.ema.model

        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

        model.mode = 'test'
        self.model.mode = 'test'
        model.metrics.reset_state('test')
        self.model.metrics.reset_state('test')

        self.loop.sync_model()
        self.loop.sync_ema_model()

        num_batches = len(data_loader)
        pbar = _logging.ProgressBar(num_batches, print_interval=self.log_interval)
        for i, features in zip(pbar, data_loader):
            self.model.step = (self.epoch - 1) * num_batches + i + 1

            staged, output_features = self.loop.predict_step(features, use_ema=use_ema)
            self.model.metrics.apply_staged(staged, tag='predict')

            model.analysis_for_test_batch(
                self._for_analysis(features), self._for_analysis(output_features),
                out_dir=out_dir, **self.analysis_kwargs)

            pbar.maybe_print('test', self.epoch,
                             lambda: self.model.metrics.results_as_str_dict('test'))

        model.analysis_for_test_epoch(out_dir=out_dir, **self.analysis_kwargs)

        if out_dir and self.is_lead_host:
            file_io.save_json(self.model.metrics.results_as_json_dict('test'),
                              os.path.join(out_dir, 'metrics.json'))

        model.mode = ''
        self.model.mode = ''

    def run_test(self):
        r"""Runs generation for the current epoch."""
        epoch_test_dir = os.path.join(self.experiment_dir, 'test', f'epoch_{self.epoch}')
        self.logger.info('epoch %2d: Running synthesis for the test set, output being saved to\n\t%s',
                         self.epoch, epoch_test_dir)
        model = self.ema.model if self.ema_decay else self.model
        self.test_epoch(self.test_loader, model=model, out_dir=epoch_test_dir)

    # ------------------------------------------------------------------- run

    def _run_batch_size_search(self):
        """--search_batch_size: compile-time capacity search instead of
        training. Writes batch_size_search.txt and logs the result."""
        limit_bytes = int(self.search_batch_size * 2 ** 30)
        # --device_cache holds the corpus arenas in HBM alongside the step
        # program: they are real, persistent allocations the search must
        # leave room for.
        cache_bytes = 0
        for loader in (self.train_loader, getattr(self, 'valid_loader', None),
                       getattr(self, 'test_loader', None)):
            cache = getattr(loader, 'device_cache', None)
            if cache is not None:
                cache_bytes += cache.bytes
        if cache_bytes:
            limit_bytes = max(limit_bytes - cache_bytes, 0)
        # Pull the batch through the full loader path (ToDeviceWrapper), not
        # data_loader: the probe must see the post---transfer_dtype dtypes
        # and the data-parallel sharding, or it compiles a different program
        # than training runs (f32 unsharded vs bf16 sharded).
        probe_batch = next(iter(self.train_loader))
        # The step program traces metric staging keyed by the model's mode
        # tag, exactly as train_epoch sets it up.
        self.model.mode = 'train'
        self.model.metrics.reset_state('train')
        try:
            best, probes = memory.search_train_batch_size(
                self.loop, probe_batch, limit_bytes)
        finally:
            self.model.mode = ''
        stats = memory.device_memory_stats()
        lines = [f'Batch-size capacity search: limit '
                 f'{self.search_batch_size:g} GiB '
                 f'({limit_bytes} bytes) for the fused train step of '
                 f'{type(self.model).__name__}', '']
        if cache_bytes:
            lines.append(f'--device_cache arenas reserve '
                         f'{cache_bytes / 2 ** 20:.1f} MiB of the budget '
                         '(already subtracted from the limit above).')
        max_len = max((v.shape[1] for v in probe_batch.values()
                       if hasattr(v, 'shape') and v.ndim >= 2), default=None)
        lines.append(f'Probed at the first batch\'s length bucket '
                     f'(max_len={max_len}); longer buckets compile larger '
                     'programs — leave headroom or probe with the longest '
                     'bucket (--length_sort_window 0 and a full corpus '
                     'pass reach it).')
        if stats and 'bytes_limit' in stats:
            lines.append(f'Device reports bytes_limit = '
                         f'{stats["bytes_limit"] / 2 ** 30:.2f} GiB.')
        lines.append('')
        if best is None:
            smallest = min(probes) if probes else 1
            lines.append(f'No batch size fits: even batch {smallest} '
                         'exceeds the limit.')
        else:
            lines.append(f'Largest fitting batch size: {best}')
        lines.append('')
        lines.append('Probes (batch size -> compile-time peak bytes; '
                     '"-" = compiler refused):')
        for b in sorted(probes):
            peak = probes[b]
            lines.append(f'  {b:>6}: ' + (
                '-' if peak is None else f'{peak / 2 ** 20:.1f} MiB'))
        text = '\n'.join(lines) + '\n'
        path = os.path.join(self.experiment_dir, 'batch_size_search.txt')
        if self.is_lead_host:
            with open(path, 'w') as f:
                f.write(text)
        self.logger.info('Batch-size search: largest fitting batch = %s '
                         '(limit %.3g GiB, %d probes; %s)', best,
                         self.search_batch_size, len(probes), path)
        return best

    def _run_lr_find(self):
        """``--find_lr``: exponential LR range test (Smith 2015) instead of
        training. Runs real fused train steps with the lr swept from MIN to
        MAX geometrically (lr is a traced scalar, so the sweep never
        retraces), tracks a bias-corrected EMA of the loss, stops early on
        divergence, and writes ``lr_find.json`` + ``lr_find.png`` with a
        steepest-descent suggestion. The model's parameters are consumed by
        the probe steps — the process exits afterwards, nothing is saved."""
        parts = [p.strip() for p in str(self.find_lr).split(',')]
        if len(parts) not in (2, 3):
            raise ValueError(f"--find_lr takes 'MIN,MAX[,STEPS]', got "
                             f'{self.find_lr!r}')
        lr_min, lr_max = float(parts[0]), float(parts[1])
        steps = int(parts[2]) if len(parts) == 3 else 100
        if not (0 < lr_min < lr_max) or steps < 10:
            raise ValueError(f'--find_lr needs 0 < MIN < MAX and STEPS >= '
                             f'10, got {self.find_lr!r}')

        self.model.mode = 'train'
        self.model.metrics.reset_state('train')
        records = []
        beta = 0.98
        avg, best = 0.0, float('inf')
        stop_reason = f'completed all {steps} steps'
        try:
            done = False
            while not done:
                pass_start = len(records)
                for features in self.train_loader:
                    i = len(records)
                    if i >= steps:
                        done = True
                        break
                    lr = lr_min * (lr_max / lr_min) ** (i / max(steps - 1, 1))
                    loss, _staged, _ = self.loop.train_step(features, lr)
                    raw = float(np.asarray(loss))
                    if not np.isfinite(raw):
                        records.append({'lr': lr, 'loss': None,
                                        'smoothed': None})
                        stop_reason = (f'stopped at step {i}: non-finite '
                                       f'loss at lr {lr:.3g}')
                        done = True
                        break
                    avg = beta * avg + (1 - beta) * raw
                    smoothed = avg / (1 - beta ** (i + 1))
                    records.append({'lr': lr, 'loss': raw,
                                    'smoothed': smoothed})
                    best = min(best, smoothed)
                    # Divergence = smoothed loss 4x its best-so-far RANGE
                    # above the best. Scale by |best| (not 4*best, which is
                    # wrong for non-positive losses: 4x a negative best is
                    # BELOW it, tripping on any value).
                    if i >= 10 and smoothed > best + 4 * abs(best) + 1e-12:
                        stop_reason = (f'stopped at step {i}: smoothed loss '
                                       f'{smoothed:.4g} diverged above best '
                                       f'{best:.4g} at lr {lr:.3g}')
                        done = True
                        break
                if not done and len(records) == pass_start:
                    raise RuntimeError(
                        '--find_lr: the train loader yielded no batches '
                        '(empty corpus or batch size larger than the split '
                        'with drop_remainder); nothing to sweep')
        finally:
            self.model.mode = ''

        finite = [r for r in records if r['smoothed'] is not None]
        suggestion = None
        if len(finite) >= 5:
            lrs = np.array([r['lr'] for r in finite])
            smooth = np.array([r['smoothed'] for r in finite])
            # Steepest descent of the smoothed curve in log-lr, restricted
            # to at/before the minimum (past it the curve is diverging).
            lo = int(np.argmin(smooth)) + 1
            grad = np.gradient(smooth[:lo], np.log(lrs[:lo])) \
                if lo >= 3 else None
            if grad is not None and np.isfinite(grad).any():
                suggestion = float(lrs[:lo][int(np.nanargmin(grad))])

        result = {'lr_min': lr_min, 'lr_max': lr_max,
                  'steps_requested': steps, 'steps_run': len(records),
                  'stop_reason': stop_reason, 'suggestion': suggestion,
                  'records': records}
        if self.is_lead_host:
            with open(os.path.join(self.experiment_dir,
                                   'lr_find.json'), 'w') as f:
                json.dump(result, f, indent=2)
            if len(finite) >= 2:
                try:
                    import matplotlib
                    matplotlib.use('Agg')
                    import matplotlib.pyplot as plt
                    fig, ax = plt.subplots(figsize=(7, 4))
                    ax.plot([r['lr'] for r in finite],
                            [r['loss'] for r in finite],
                            alpha=0.35, label='loss')
                    ax.plot([r['lr'] for r in finite],
                            [r['smoothed'] for r in finite],
                            label='smoothed')
                    if suggestion:
                        ax.axvline(suggestion, color='tab:red', ls='--',
                                   label=f'suggestion {suggestion:.2e}')
                    ax.set_xscale('log')
                    ax.set_xlabel('learning rate')
                    ax.set_ylabel('train loss')
                    ax.legend()
                    fig.savefig(os.path.join(self.experiment_dir,
                                             'lr_find.png'),
                                bbox_inches='tight')
                    plt.close(fig)
                except Exception:  # noqa: BLE001 - the JSON is the artifact
                    self.logger.exception('lr_find plot failed')
        if suggestion:
            self.logger.info(
                'LR range test: suggestion %.3g (steepest smoothed descent; '
                '%s); details in lr_find.json', suggestion, stop_reason)
        else:
            self.logger.info('LR range test: no confident suggestion (%s); '
                             'inspect lr_find.json', stop_reason)
        return result

    def run_experiment(self):
        r"""Runs all procedures requested for the experiment."""
        if self.train and self.find_lr:
            return self._run_lr_find()
        if self.train and self.search_batch_size > 0:
            return self._run_batch_size_search()
        if self.train:
            try:
                self.run_train()

                if self.valid and self.is_lead_host:
                    metric_names = [name for name, metric in self.model.metrics['all'].items()
                                    if not metric.hidden]
                    viz.plotting.plot_experiment(self.experiment_name, metric_names,
                                                 self.experiments_base, save=True)
            except KeyboardInterrupt:
                # Fault tolerance beyond the reference (which only flushed the
                # plot): preserve the interrupted run's parameters so work is
                # never lost. The _interrupted suffix keeps the file out of
                # `--checkpoint_path latest` resolution (resume from it
                # explicitly; its epoch counter may be mid-epoch).
                if self.is_lead_host:
                    try:
                        self.loop.sync_model()
                        path = self.model.save_parameters(
                            self.experiment_dir, f'{max(self.epoch, 1)}_interrupted')
                        checkpointing.save_training_state(
                            checkpointing.training_state_path_for(path),
                            params=self.loop.params, opt_state=self.loop.opt_state,
                            ema_params=self.loop.ema_params,
                            step=self.loop.step_count)
                        self.logger.info('Interrupted: emergency checkpoint '
                                         'saved to %s', path)
                    except Exception:  # noqa: BLE001 - shutdown must proceed
                        self.logger.exception('Emergency checkpoint failed')
                if self.valid and self.is_lead_host:
                    metric_names = [name for name, metric in self.model.metrics['all'].items()
                                    if not metric.hidden]
                    viz.plotting.plot_experiment(self.experiment_name, metric_names,
                                                 self.experiments_base, save=True)
                raise

        if (not self.train) and self.valid:
            self.run_valid(gen_output=True)

        if (not self.train) and self.test:
            self.run_test()
