"""Run logging: console + file-mirrored channels and a metric progress bar.

Behavioural contract (reference-parity surface of ``morgana/_logging.py``,
rebuilt from the contract rather than the code): every experiment gets a
``log/`` directory containing timestamped ``.stdout`` / ``.stderr`` /
``.tqdm`` files; normal records go to the console and the ``.stdout`` file,
errors additionally to stderr and the ``.stderr`` file, and per-batch
progress-bar descriptions ONLY to the ``.tqdm`` file (so console scrollback
stays readable while the bar itself renders live).

Routing is driven by an ``is_tqdm`` record attribute (passed via the log
call's ``extra``) and the record level; the five output channels are
declared in one spec table, :data:`_CHANNELS`.
"""
import logging
import os
import sys
import time

from tqdm import tqdm

__all__ = ['create_logger', 'ProgressBar', 'LOGGER_NAME']

LOGGER_NAME = 'morgana_tpu'

_DETAIL_FMT = '{asctime} - {levelname:8s} - {module}.{funcName}:{lineno} - {message}'
_BARE_FMT = '{asctime} - {message}'


def _is_progress(record):
    """True for records tagged via ``extra={'is_tqdm': True}``. (The tag
    must NOT ride in the args slot: truthy args trigger ``msg % args`` in
    ``record.getMessage()``, so any '%' in a metric string would raise.)"""
    return bool(getattr(record, 'is_tqdm', False))


class _Route(logging.Filter):
    """Admits records matching an arbitrary predicate."""

    def __init__(self, predicate):
        super().__init__()
        self._admit = predicate

    def filter(self, record):
        return self._admit(record)


def _progress_only(record):
    return _is_progress(record)


def _console_out(record):
    return not _is_progress(record) and record.levelno < logging.ERROR


def _everything_else(record):
    return not _is_progress(record)


def _errors_only(record):
    return not _is_progress(record) and record.levelno >= logging.ERROR


# (sink, format, predicate). sink: a file suffix (str starting with '.')
# under log/, or a sys stream attribute name — resolved at create_logger time
# so later stream redirection (pytest capture, redirect_stdout) is honoured.
_CHANNELS = (
    ('.tqdm', _BARE_FMT, _progress_only),
    ('stdout', _DETAIL_FMT, _console_out),
    ('.stdout', _DETAIL_FMT, _everything_else),
    ('stderr', _DETAIL_FMT, _errors_only),
    ('.stderr', _DETAIL_FMT, _errors_only),
)


def create_logger(experiment_dir, process_index=0):
    """Builds the experiment logger from the :data:`_CHANNELS` spec.

    Idempotent across repeated calls (handlers are replaced, not stacked),
    so tests and notebook reuse don't duplicate output. In multi-host runs
    every host logs, with non-lead hosts' files suffixed ``.pN`` so files on
    a shared filesystem never collide.
    """
    log_dir = os.path.join(experiment_dir, 'log')
    os.makedirs(log_dir, exist_ok=True)
    run_stamp = time.strftime('%y_%m_%d-%H_%M_%S')
    if process_index:
        run_stamp += f'.p{process_index}'

    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(logging.DEBUG)
    # The five channels below are the complete output contract; without this,
    # libraries that configure the root logger (e.g. orbax/absl) would print
    # every record a second time.
    logger.propagate = False
    while logger.handlers:
        handler = logger.handlers[-1]
        logger.removeHandler(handler)
        handler.close()  # replaced FileHandlers must not leak descriptors

    for sink, fmt, predicate in _CHANNELS:
        if sink.startswith('.'):
            handler = logging.FileHandler(os.path.join(log_dir, run_stamp + sink))
        else:
            handler = logging.StreamHandler(getattr(sys, sink))
        handler.setFormatter(logging.Formatter(fmt, style='{'))
        handler.addFilter(_Route(predicate))
        logger.addHandler(handler)

    return logger


class ProgressBar:
    """Iterable batch counter rendering a live tqdm bar with metric text.

    Iterating yields ``0..num_batches-1`` while advancing the bar.
    :meth:`print` pushes a ``mode | epoch N: k = v | ...`` description onto
    the bar and logs the same string to the ``.tqdm`` channel;
    :meth:`maybe_print` is the rate-limited, lazy variant for jit-hot loops
    — the metric dict is only built (and device values only synchronised)
    on every ``print_interval``-th call.
    """

    _LAYOUT = ('{desc}{percentage:3.0f}% |{bar}| {n_fmt}/{total_fmt} '
               '[{elapsed}<{remaining}{postfix}]')

    def __init__(self, num_batches, print_interval=1):
        self._bar = tqdm(total=num_batches, bar_format=self._LAYOUT)
        self._every = max(1, int(print_interval))
        self._calls = 0

    def __iter__(self):
        with self._bar:
            for index in range(self._bar.total):
                yield index
                self._bar.update()

    def advance(self, n=1):
        """Advances the bar by ``n`` batches without iterating — the chained
        multi-step dispatch path consumes N batches per program call."""
        self._bar.update(n)

    def close(self):
        self._bar.close()

    def print(self, mode, epoch, **metrics):
        parts = [f'{mode} | epoch {epoch: >2}']
        if metrics:
            parts.append(': ')
            parts.append(' | '.join(f'{name} = {value}'
                                    for name, value in metrics.items()))
        text = ''.join(parts)
        logging.getLogger(LOGGER_NAME).debug(text, extra={'is_tqdm': True})
        self._bar.set_description(text)

    def maybe_print(self, mode, epoch, metrics_fn, count=1):
        """``count`` > 1 credits one call as that many batches (chained
        dispatch), so ``print_interval`` keeps its per-batch meaning."""
        before = self._calls
        self._calls += count
        if self._calls // self._every > before // self._every:
            self.print(mode, epoch, **metrics_fn())
