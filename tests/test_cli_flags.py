"""CLI flag-surface stability: the parser must keep the reference's flags
(models call get_experiment_args unchanged) plus the TPU-native additions,
with safe dict parsing."""
import pytest

from morgana_tpu.experiment_builder import ExperimentBuilder


def _parse(argv):
    import argparse
    parser = argparse.ArgumentParser()
    ExperimentBuilder.add_args(parser)
    return vars(parser.parse_args(argv))


REFERENCE_FLAGS = [
    'model_kwargs', 'analysis_kwargs', 'train', 'valid', 'test',
    'start_epoch', 'end_epoch', 'checkpoint_path', 'ema_checkpoint_path',
    'batch_size', 'learning_rate', 'lr_schedule_name', 'lr_schedule_kwargs',
    'weight_decay', 'ema_decay', 'device', 'num_data_threads',
    'model_checkpoint_interval', 'train_output_interval',
    'valid_output_interval', 'test_output_interval',
    'data_root', 'train_dir', 'valid_dir', 'test_dir',
    'train_id_list', 'valid_id_list', 'test_id_list',
    'normalisation_dir', 'experiments_base', 'experiment_name',
]

TPU_FLAGS = [
    'seed', 'data_parallel', 'multihost', 'shard_map_step', 'orbax_dir',
    'keep_checkpoints', 'log_interval', 'profile_dir', 'grad_clip_norm',
    'remat', 'length_sort_window', 'compute_dtype', 'compilation_cache_dir',
]


def test_flag_surface_complete():
    args = _parse(['--experiment_name', 'x'])
    for flag in REFERENCE_FLAGS + TPU_FLAGS:
        assert flag in args, f'missing flag --{flag}'


def test_boolean_pairs_and_defaults():
    args = _parse(['--experiment_name', 'x'])
    assert args['train'] and args['valid'] and not args['test']
    args = _parse(['--experiment_name', 'x', '--no-train', '--no-valid', '--test'])
    assert not args['train'] and not args['valid'] and args['test']


def test_dict_flags_literal_eval_only():
    args = _parse(['--experiment_name', 'x',
                   '--model_kwargs', "{'hidden_size': 64, 'rnn_backend': 'scan'}"])
    assert args['model_kwargs'] == {'hidden_size': 64, 'rnn_backend': 'scan'}
    # Arbitrary code must NOT evaluate (the reference used eval()).
    with pytest.raises((ValueError, SyntaxError)):
        _parse(['--experiment_name', 'x',
                '--model_kwargs', "__import__('os').system('true')"])


def test_multihost_and_checkpoint_flags_parse():
    args = _parse(['--experiment_name', 'x', '--multihost', '--data_parallel',
                   '--shard_map_step', '--orbax_dir', '/tmp/ob',
                   '--keep_checkpoints', '3', '--checkpoint_path', 'latest'])
    assert args['multihost'] and args['data_parallel'] and args['shard_map_step']
    assert args['orbax_dir'] == '/tmp/ob'
    assert args['keep_checkpoints'] == 3
    assert args['checkpoint_path'] == 'latest'


def test_config_file_loads_and_cli_overrides(tmp_path):
    """--config pre-loads a previous run's config.json; explicit flags win;
    unknown keys are tolerated (forward compatibility)."""
    import json
    cfg = {'experiment_name': 'orig', 'batch_size': 16,
           'learning_rate': 0.007, 'model_kwargs': {'hidden_size': 99},
           'some_future_key': 1}
    path = tmp_path / 'config.json'
    path.write_text(json.dumps(cfg))

    args = ExperimentBuilder.get_experiment_args(
        ['--config', str(path), '--experiment_name', 'rerun'])
    assert args['experiment_name'] == 'rerun'          # CLI override
    assert args['batch_size'] == 16                    # from config
    assert args['learning_rate'] == 0.007
    assert args['model_kwargs'] == {'hidden_size': 99}
    assert 'config' not in args and 'some_future_key' not in args

    # Without --config the defaults are unchanged.
    args = ExperimentBuilder.get_experiment_args(['--experiment_name', 'x'])
    assert args['batch_size'] == 32
