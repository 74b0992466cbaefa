"""Shared benchmark helpers.

Benchmarks must NOT import ``tests/conftest.py``: importing it forces the
CPU backend with 8 virtual devices at module level (that is its job for the
test suite), which silently overrides a ``--device tpu`` selection and
produces CPU numbers labelled as TPU. The builder defaults live here,
side-effect-free.
"""


def builder_args(data_root, experiments_base, **overrides):
    """Default ExperimentBuilder kwargs for benchmark training runs (same
    values as the test suite's ``conftest.builder_args``, without
    conftest's platform-forcing import side effects)."""
    args = dict(
        model_kwargs={}, analysis_kwargs={'sample_rate': 16000},
        train=True, valid=True, test=False,
        start_epoch=1, end_epoch=2, checkpoint_path=None,
        ema_checkpoint_path=None,
        batch_size=4, learning_rate=0.005, lr_schedule_name='constant',
        lr_schedule_kwargs={}, weight_decay=0., ema_decay=0.,
        device=None, num_data_threads=0,
        model_checkpoint_interval=1, train_output_interval=10,
        valid_output_interval=10, test_output_interval=10,
        data_root=data_root, train_dir='train', valid_dir='valid',
        test_dir='test',
        train_id_list='train/train_file_id_list.scp',
        valid_id_list='valid/valid_file_id_list.scp',
        test_id_list='test/test_file_id_list.scp',
        normalisation_dir='train', experiments_base=experiments_base,
        seed=1234567890, data_parallel=False, log_interval=1,
        profile_dir=None,
    )
    args.update(overrides)
    return args
