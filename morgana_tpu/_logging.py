"""Logging: file-mirrored stdout/stderr/tqdm channels + metric progress bar.

Same observability contract as the reference (``morgana/_logging.py``): a
'morgana_tpu' logger with five handlers writing timestamped ``.tqdm`` /
``.stdout`` / ``.stderr`` files under ``experiments/<name>/log/``, and a tqdm
progress bar whose per-batch metric descriptions are also logged.
"""
import logging
import os
import sys
import time

from tqdm import tqdm

__all__ = ['create_logger', 'ProgressBar', 'IsTqdmFilter', 'LessThanLevelFilter']

LOGGER_NAME = 'morgana_tpu'


def create_logger(experiment_dir):
    r"""Writes stdout and stderr to their stream and to files; tqdm progress
    output goes to a separate file."""
    curr_time = time.strftime('%y_%m_%d-%H_%M_%S')
    base_dir = os.path.join(experiment_dir, 'log')
    os.makedirs(base_dir, exist_ok=True)

    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(logging.DEBUG)
    # Re-creating the logger (e.g. across tests) should not stack handlers.
    for handler in list(logger.handlers):
        logger.removeHandler(handler)

    format_str = '{asctime} - {levelname:8s} - {module}.{funcName}:{lineno} - {message}'
    formatter = logging.Formatter(format_str, style='{')

    tqdm_file = logging.FileHandler(os.path.join(base_dir, f'{curr_time}.tqdm'))
    tqdm_file.setFormatter(logging.Formatter('{asctime} - {message}', style='{'))
    tqdm_file.addFilter(IsTqdmFilter(include_tqdm=True))
    logger.addHandler(tqdm_file)

    stdout_stream = logging.StreamHandler(sys.stdout)
    stdout_stream.setLevel(logging.DEBUG)
    stdout_stream.setFormatter(formatter)
    stdout_stream.addFilter(IsTqdmFilter())
    stdout_stream.addFilter(LessThanLevelFilter(level=logging.ERROR))
    logger.addHandler(stdout_stream)

    stdout_file = logging.FileHandler(os.path.join(base_dir, f'{curr_time}.stdout'))
    stdout_file.setLevel(logging.DEBUG)
    stdout_file.setFormatter(formatter)
    stdout_file.addFilter(IsTqdmFilter())
    logger.addHandler(stdout_file)

    stderr_stream = logging.StreamHandler(sys.stderr)
    stderr_stream.setLevel(logging.ERROR)
    stderr_stream.setFormatter(formatter)
    stderr_stream.addFilter(IsTqdmFilter())
    logger.addHandler(stderr_stream)

    stderr_file = logging.FileHandler(os.path.join(base_dir, f'{curr_time}.stderr'))
    stderr_file.setLevel(logging.ERROR)
    stderr_file.setFormatter(formatter)
    stderr_file.addFilter(IsTqdmFilter())
    logger.addHandler(stderr_file)

    return logger


class ProgressBar(tqdm):
    r"""tqdm bar with a :func:`print` method logging metric strings."""

    def __init__(self, num_batches, print_interval=1):
        bar_format = '{desc}{percentage:3.0f}% |{bar}| {n_fmt}/{total_fmt} [{elapsed}<{remaining}{postfix}]'
        super().__init__(range(num_batches), bar_format=bar_format)
        self.logger = logging.getLogger(LOGGER_NAME)
        self.print_interval = max(1, int(print_interval))
        self._print_count = 0

    def print(self, mode, epoch, **kwargs):
        r"""Formats metrics into the bar description and logs them."""
        desc = f'{mode} | epoch {epoch: >2}'
        if kwargs:
            desc += ': ' + ' | '.join(f'{k} = {v}' for k, v in kwargs.items())
        self.logger.debug(desc, {'is_tqdm': True})
        self.set_description(desc)

    def maybe_print(self, mode, epoch, kwargs_fn):
        r"""Rate-limited print with LAZY kwargs.

        ``print_interval`` lets high-throughput loops avoid forcing a device
        sync on every batch: metric strings (which synchronise on device
        values) are only materialised — by calling ``kwargs_fn()`` — on every
        N-th call.
        """
        self._print_count += 1
        if self._print_count % self.print_interval:
            return
        self.print(mode, epoch, **kwargs_fn())


class IsTqdmFilter(logging.Filter):
    r"""Allows only tqdm messages, or disallows all tqdm messages."""

    def __init__(self, name='', include_tqdm=False):
        super().__init__(name=name)
        self.include_tqdm = include_tqdm

    def filter(self, record):
        include_record = super().filter(record)
        record_has_kwargs = record.args and not isinstance(record.args, tuple)
        is_tqdm_message = record.args.get('is_tqdm', False) if record_has_kwargs else False
        if self.include_tqdm:
            return include_record and is_tqdm_message
        return include_record and not is_tqdm_message


class LessThanLevelFilter(logging.Filter):
    r"""Only allows messages below a given level."""

    def __init__(self, name='', level=logging.NOTSET):
        super().__init__(name=name)
        self.level = level

    def filter(self, record):
        return super().filter(record) and record.levelno < self.level
