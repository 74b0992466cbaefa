"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths (Mesh / NamedSharding / psum) are exercised without
TPU hardware — the JAX-native fake-backend testing recipe."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (xla_flags + ' --xla_force_host_platform_device_count=8').strip()

# The env var alone is not enough on machines where a TPU plugin pre-sets the
# platform; the config update below takes effect before backends initialise.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope='session')
def voice_data(tmp_path_factory):
    """A small synthetic voice dataset in the reference on-disk layout."""
    from morgana_tpu.data.synthetic import generate_voice_data
    root = tmp_path_factory.mktemp('voice_data')
    data_root = str(root / 'data')
    id_lists = generate_voice_data(data_root, num_train=8, num_valid=4, num_test=2, seed=1)
    return {'data_root': data_root, 'id_lists': id_lists}


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def builder_args(data_root, experiments_base, **overrides):
    """Default ExperimentBuilder kwargs for tests."""
    args = dict(
        model_kwargs={}, analysis_kwargs={'sample_rate': 16000},
        train=True, valid=True, test=False,
        start_epoch=1, end_epoch=2, checkpoint_path=None, ema_checkpoint_path=None,
        batch_size=4, learning_rate=0.005, lr_schedule_name='constant',
        lr_schedule_kwargs={}, weight_decay=0., ema_decay=0.,
        device=None, num_data_threads=0,
        model_checkpoint_interval=1, train_output_interval=10,
        valid_output_interval=10, test_output_interval=10,
        data_root=data_root, train_dir='train', valid_dir='valid', test_dir='test',
        train_id_list='train/train_file_id_list.scp',
        valid_id_list='valid/valid_file_id_list.scp',
        test_id_list='test/test_file_id_list.scp',
        normalisation_dir='train', experiments_base=experiments_base,
        seed=1234567890, data_parallel=False, log_interval=1, profile_dir=None,
    )
    args.update(overrides)
    return args
