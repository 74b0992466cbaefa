"""morgana_tpu — a TPU-native toolkit for defining and training TTS voices.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Morgana
(statistical parametric speech synthesis training framework): users write a
model class with ``train_data_sources``, ``predict`` and ``loss``; the
framework supplies data loading, normalisation, padding/batching (bucketed,
fixed-shape for XLA), fused jit train/valid/test loops, checkpointing, EMA,
LR schedules, streaming metrics, logging, plotting, MLPG and waveform
synthesis — plus data-parallel scaling over TPU meshes which the reference
never had.
"""
__version__ = '0.1.0'

from morgana_tpu import nn
from morgana_tpu import ops
from morgana_tpu import utils
from morgana_tpu import losses  # reference API path: ``morgana.losses``

__all__ = ['nn', 'ops', 'utils', 'losses', '__version__']


def __getattr__(name):
    # Lazy imports to keep `import morgana_tpu` light and avoid import cycles.
    import importlib
    lazy = {
        'base_models': 'morgana_tpu.base_models',
        'data': 'morgana_tpu.data',
        'experiment_builder': 'morgana_tpu.experiment_builder',
        'lr_schedules': 'morgana_tpu.lr_schedules',
        'memory': 'morgana_tpu.memory',
        'metrics': 'morgana_tpu.metrics',
        'sampling': 'morgana_tpu.sampling',
        'viz': 'morgana_tpu.viz',
        'parallel': 'morgana_tpu.parallel',
        'vocoder': 'morgana_tpu.vocoder',
        'checkpointing': 'morgana_tpu.checkpointing',
        'serve': 'morgana_tpu.serve',
        'streaming': 'morgana_tpu.streaming',
        'quantize': 'morgana_tpu.quantize',
        'pipeline': 'morgana_tpu.pipeline',
        'evaluate': 'morgana_tpu.evaluate',
    }
    if name in lazy:
        return importlib.import_module(lazy[name])
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
