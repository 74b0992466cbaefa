"""Memory observability (`morgana_tpu.memory`): compile-time program
breakdowns, the batch-size capacity search, and the --memory_report flag.

The reference has no memory tooling (OOM discovery is run-and-crash); under
XLA the fused step's peak HBM is a compile-time fact, which these tests pin
down on the CPU backend (whose compiler reports the same CompiledMemoryStats
structure as TPU)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import builder_args
from tiny_models import TinyF0Model
from test_parallel import _synthetic_batch

from morgana_tpu import memory, nn
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu.training import TrainLoop, build_optimizer


def _make_loop(seed=3, **kwargs):
    nn.manual_seed(seed)
    model = TinyF0Model()
    norm = model.normaliser_sources()['lf0']
    norm.params = {'mean': np.zeros(1, np.float32), 'std_dev': np.ones(1, np.float32)}
    norm.delta_params = {'mean': np.zeros(3, np.float32), 'std_dev': np.ones(3, np.float32)}
    model.normalisers = {'lf0': norm}
    model.mode = 'train'
    return TrainLoop(model, build_optimizer(), seed=0, **kwargs)


class TestProgramMemory:
    def test_breakdown_of_simple_program(self):
        f = jax.jit(lambda x, y: (x @ y).sum())
        x = jnp.ones((64, 128), jnp.float32)
        y = jnp.ones((128, 32), jnp.float32)
        stats = memory.program_memory(f, x, y)
        assert stats is not None
        # Arguments are exactly the two input buffers; output one f32 scalar.
        assert stats['arguments_bytes'] == (64 * 128 + 128 * 32) * 4
        assert stats['outputs_bytes'] == 4
        assert stats['peak_bytes'] >= stats['arguments_bytes']

    def test_abstract_args_allocate_nothing(self):
        """ShapeDtypeStruct args give the same analysis as concrete arrays —
        the capacity search never materialises the probed batches."""
        f = jax.jit(lambda x: jnp.tanh(x) * 2.0)
        concrete = memory.program_memory(f, jnp.ones((256, 256)))
        abstract = memory.program_memory(
            f, jax.ShapeDtypeStruct((256, 256), jnp.float32))
        assert concrete == abstract

    def test_train_step_memory_scales_with_batch(self, rng):
        loop = _make_loop()
        small = memory.train_step_memory(loop, _synthetic_batch(rng, batch=2))
        big = memory.train_step_memory(loop, _synthetic_batch(rng, batch=16))
        assert small is not None and big is not None
        assert big['arguments_bytes'] > small['arguments_bytes']
        assert big['peak_bytes'] > small['peak_bytes']

    def test_train_step_memory_accum_path(self, rng):
        """With accumulation the analysed program is the apply step, whose
        peak includes the gradient accumulator (>= the plain step's)."""
        batch = _synthetic_batch(rng, batch=4)
        plain = memory.train_step_memory(_make_loop(), batch)
        accum = memory.train_step_memory(
            _make_loop(grad_accum_steps=2), batch)
        assert accum['peak_bytes'] >= plain['peak_bytes']


class TestFindMaxBatchSize:
    def test_linear_model(self):
        best, probes = memory.find_max_batch_size(
            lambda b: b * 100, limit_bytes=850, start=1, max_batch=4096)
        assert best == 8
        # Log-many probes, not a linear sweep.
        assert len(probes) <= 2 * (12 + 1)

    def test_everything_fits_returns_max(self):
        best, _ = memory.find_max_batch_size(
            lambda b: b, limit_bytes=10**9, start=1, max_batch=48)
        assert best == 48

    def test_nothing_fits_returns_none(self):
        best, probes = memory.find_max_batch_size(
            lambda b: b * 100, limit_bytes=50, start=1, max_batch=64)
        assert best is None
        assert probes == {1: 100}

    def test_raising_probe_counts_as_over_limit(self):
        def peak(b):
            if b > 6:
                raise RuntimeError('RESOURCE_EXHAUSTED')
            return b * 10
        best, probes = memory.find_max_batch_size(
            peak, limit_bytes=10**9, start=1, max_batch=64)
        assert best == 6
        assert probes[8] is None

    def test_non_power_of_two_bracket(self):
        best, _ = memory.find_max_batch_size(
            lambda b: b, limit_bytes=37, start=2, max_batch=100)
        assert best == 37

    def test_real_compile_probe(self, rng):
        """End to end against real compiles: the search lands between the
        probed peaks bracketing the limit."""
        loop = _make_loop()

        def peak(b):
            return memory.train_step_memory(
                loop, _synthetic_batch(rng, batch=b))['peak_bytes']

        limit = peak(4) + 1  # batch 4 fits by construction
        best, probes = memory.find_max_batch_size(
            peak, limit_bytes=limit, start=1, max_batch=32)
        assert best >= 4
        assert probes[best] <= limit
        if best + 1 in probes:
            assert probes[best + 1] is None or probes[best + 1] > limit

    def test_bad_range_raises(self):
        with pytest.raises(ValueError):
            memory.find_max_batch_size(lambda b: b, 10, start=8, max_batch=4)

    def test_granularity_probes_multiples_only(self):
        """With a sharded batch axis only multiples of the shard count are
        valid program shapes — the search must respect that."""
        best, probes = memory.find_max_batch_size(
            lambda b: b * 100, limit_bytes=1950, start=1, max_batch=4096,
            granularity=8)
        assert best == 16  # largest multiple of 8 with peak <= 1950
        assert all(b % 8 == 0 for b in probes)

    def test_granularity_nothing_fits(self):
        best, probes = memory.find_max_batch_size(
            lambda b: b * 100, limit_bytes=50, start=1, max_batch=64,
            granularity=4)
        assert best is None
        assert probes == {4: 400}

    def test_analysis_unavailable_propagates(self):
        """'Backend cannot report memory' must surface as an error, not be
        swallowed into a confidently-wrong 'nothing fits' answer."""
        def peak(b):
            raise memory.MemoryAnalysisUnavailable('no analysis')
        with pytest.raises(memory.MemoryAnalysisUnavailable):
            memory.find_max_batch_size(peak, limit_bytes=10**9)


class TestSearchTrainBatchSize:
    def test_batch_shapes_at_rewrites_leading_axis(self, rng):
        batch = _synthetic_batch(rng, batch=4)
        shapes = memory.batch_shapes_at(batch, 32)
        assert shapes['normalised_lab'].shape == (32, 6, 600)
        assert shapes['n_frames'].shape == (32,)
        assert shapes['dur'].dtype == batch['dur'].dtype

    def test_search_brackets_limit(self, rng):
        loop = _make_loop()
        batch = _synthetic_batch(rng, batch=4)
        limit = memory.train_step_memory(loop, batch)['peak_bytes'] + 1
        best, probes = memory.search_train_batch_size(
            loop, batch, limit, max_batch=64)
        assert best >= 4
        assert probes[best] <= limit

    def test_abstract_shapes_preserve_named_sharding(self, rng):
        """The analysed program must be the real SPMD program: a NamedSharding
        on a leaf survives abstraction, so per-device HBM is reported, not
        the single-device ~N x overestimate."""
        from morgana_tpu import parallel
        mesh = parallel.make_mesh()
        batch = parallel.shard_batch(_synthetic_batch(rng, batch=8), mesh)
        abstract = memory.abstract_shapes(batch)
        leaf = abstract['normalised_lab']
        assert isinstance(leaf.sharding, jax.sharding.NamedSharding)
        assert leaf.sharding.spec[0] == 'data'

    def test_batch_granularity_and_sharded_shapes(self, rng):
        from morgana_tpu import parallel
        mesh = parallel.make_mesh()  # 8 virtual CPU devices on the data axis
        host = _synthetic_batch(rng, batch=8)
        assert memory.batch_granularity(host) == 1
        sharded = parallel.shard_batch(host, mesh)
        g = memory.batch_granularity(sharded)
        assert g == mesh.shape['data']
        shapes = memory.batch_shapes_at(sharded, 2 * g)
        leaf = shapes['normalised_lab']
        assert leaf.shape[0] == 2 * g
        assert isinstance(leaf.sharding, jax.sharding.NamedSharding)

    def test_sharded_search_reports_per_device_peak(self, rng):
        """Data-parallel capacity search: at the same global batch, the
        sharded program's peak is well below the unsharded one (the batch
        and its activations split over 8 devices)."""
        from morgana_tpu import parallel
        mesh = parallel.make_mesh()
        loop = _make_loop()
        host = _synthetic_batch(rng, batch=16)
        sharded = parallel.shard_batch(host, mesh)
        unsharded_peak = memory.train_step_memory(loop, host)['peak_bytes']
        sharded_peak = memory.train_step_memory(loop, sharded)['peak_bytes']
        assert sharded_peak < unsharded_peak
        # And the search only probes device-count multiples.
        best, probes = memory.search_train_batch_size(
            loop, sharded, sharded_peak + 1, max_batch=128)
        assert best is not None and best % mesh.shape['data'] == 0
        assert all(b % mesh.shape['data'] == 0 for b in probes)


class TestSearchBatchSizeFlag:
    def test_search_replaces_training(self, voice_data, tmp_path):
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            end_epoch=3, valid=False,
                            search_batch_size=1.0)  # placeholder; set below
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='bsearch', **args)
        # Budget relative to a measured peak so the test is backend-robust:
        # 4x the first batch's peak guarantees something fits and the
        # doubling phase exceeds the limit after a handful of compiles.
        host_batch = next(iter(exp.train_loader.data_loader))
        exp.model.mode = 'train'
        exp.model.metrics.reset_state('train')
        try:
            peak = memory.train_step_memory(
                exp.loop, host_batch)['peak_bytes']
        finally:
            exp.model.mode = ''
        exp.search_batch_size = (4 * peak) / 2 ** 30
        best = exp.run_experiment()
        assert best is not None and best >= 1
        path = os.path.join(exp.experiment_dir, 'batch_size_search.txt')
        text = open(path).read()
        assert f'Largest fitting batch size: {best}' in text
        assert 'length bucket' in text
        # Search mode must not have trained or checkpointed anything.
        ckpt_dir = os.path.join(exp.experiment_dir, 'checkpoints')
        assert not os.path.isdir(ckpt_dir) or not os.listdir(ckpt_dir)
        assert exp.loop.step_count == 0

    def test_flag_default_off(self):
        args = ExperimentBuilder.get_experiment_args(
            ['--experiment_name', 'x'])
        assert args['search_batch_size'] == 0.


class TestMemoryReportFlag:
    def test_report_written_once(self, voice_data, tmp_path):
        args = builder_args(voice_data['data_root'],
                            str(tmp_path / 'experiments'),
                            end_epoch=1, valid=False, memory_report=True)
        nn.manual_seed(args['seed'])
        exp = ExperimentBuilder(TinyF0Model, experiment_name='memrep', **args)
        exp.run_experiment()
        path = os.path.join(exp.experiment_dir, 'memory_report.txt')
        assert os.path.isfile(path)
        text = open(path).read()
        assert 'peak' in text
        assert 'Batch shapes' in text
        # CPU backend: program analysis present, allocator stats absent.
        assert 'temporaries' in text

    def test_flag_on_cli_parser(self):
        args = ExperimentBuilder.get_experiment_args(
            ['--experiment_name', 'x', '--memory_report'])
        assert args['memory_report'] is True
        defaults = ExperimentBuilder.get_experiment_args(
            ['--experiment_name', 'x'])
        assert defaults['memory_report'] is False
