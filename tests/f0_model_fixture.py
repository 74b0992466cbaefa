"""Shared test fixture: F0Model data-source/normaliser specs (kept separate so
data tests don't need the model)."""
from morgana_tpu import data
from morgana_tpu.data import data_sources


def make_f0_sources():
    return {
        'n_frames': data_sources.TextSource('n_frames', sentence_level=True),
        'n_phones': data_sources.TextSource('n_phones', sentence_level=True),
        'dur': data_sources.TextSource('dur'),
        'lab': data_sources.NumpyBinarySource('lab'),
        'counters': data_sources.NumpyBinarySource('counters'),
        'lf0': data_sources.NumpyBinarySource('lf0', use_deltas=True),
        'vuv': data_sources.NumpyBinarySource('vuv'),
    }


def make_f0_normalisers():
    return {
        'dur': data.MeanVarianceNormaliser('dur'),
        'lab': data.MinMaxNormaliser('lab'),
        'counters': data.MinMaxNormaliser('counters'),
        'lf0': data.MeanVarianceNormaliser('lf0', use_deltas=True),
    }
