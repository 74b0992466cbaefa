"""Data sources: per-utterance feature loaders.

Provides the ``_DataSource`` protocol that the reference imports from the
external ``tts_data_tools.data_sources`` package (used at
``models/RNN_SPSS.py:62-70``, ``models/f0_test_model.py:60-67`` and documented
as Morgana's public data spec in ``docs/reference/morgana.data.rst:48-108``):
``source(base_name, data_dir) -> {name: np.ndarray, ...}`` with optional
delta-feature emission (``{name}_deltas`` = static+delta+delta2, the x3
feature dims in ``models/RNN_SPSS.py:24``).
"""
import os

import numpy as np

from morgana_tpu.data import file_io
from morgana_tpu.ops.deltas import compute_deltas

__all__ = [
    '_DataSource', 'NumpyBinarySource', 'TextSource', 'StringSource',
    'ASCIISource', 'WavSource', 'SyntheticSource',
]


class _DataSource(object):
    r"""Abstract data source: loads one feature for one utterance.

    Parameters
    ----------
    name : str
        Feature name; also the sub-directory under ``data_dir`` holding the
        per-utterance files, and the key in the returned feature dict.
    use_deltas : bool
        If True, also emit ``{name}_deltas``: the static/delta/delta-delta
        windowed feature, concatenated along the feature dim.
    ext : str
        File extension.
    sentence_level : bool
        If True the feature is a single frame; it is squeezed to a scalar /
        vector instead of a (seq_len, feat_dim) sequence.
    """

    def __init__(self, name, use_deltas=False, ext=None, sentence_level=False):
        self.name = name
        self.use_deltas = use_deltas
        self.ext = ext
        self.sentence_level = sentence_level

    def file_path(self, base_name, data_dir):
        ext = f'.{self.ext}' if self.ext else ''
        return os.path.join(data_dir, self.name, f'{base_name}{ext}')

    def load_file(self, base_name, data_dir):
        raise NotImplementedError

    def __call__(self, base_name, data_dir):
        return self.package(self.load_file(base_name, data_dir))

    def package(self, feature):
        """Turns one loaded feature into the emitted feature dict (applies
        sentence-level squeezing and delta-window expansion). Split from
        ``__call__`` so batch preloaders (``FilesDataset.preload_batch``) can
        inject features read by the native batch reader."""
        features = {self.name: feature}

        if self.sentence_level and isinstance(feature, np.ndarray):
            flat = np.asarray(feature).reshape(-1)
            features[self.name] = flat[0] if flat.size == 1 else flat

        if self.use_deltas:
            features[f'{self.name}_deltas'] = compute_deltas(feature)

        return features


class NumpyBinarySource(_DataSource):
    r"""``.npy`` per-utterance binary feature files — the primary feature
    format (reference usage: ``models/RNN_SPSS.py:64-69``)."""

    def __init__(self, name, use_deltas=False, ext='npy', sentence_level=False):
        super().__init__(name, use_deltas, ext, sentence_level)

    def load_file(self, base_name, data_dir):
        feature = np.load(self.file_path(base_name, data_dir))
        feature = np.asarray(feature, dtype=np.float32)
        if feature.ndim == 1 and not self.sentence_level:
            feature = feature[:, None]
        return feature


class TextSource(_DataSource):
    r"""Whitespace-separated numeric text files (e.g. 'dur' phone durations,
    'n_frames' sentence-level counts; ``models/f0_test_model.py:60-62``)."""

    def __init__(self, name, use_deltas=False, ext='txt', sentence_level=False):
        super().__init__(name, use_deltas, ext, sentence_level)

    def load_file(self, base_name, data_dir):
        return np.asarray(file_io.load_txt(self.file_path(base_name, data_dir)),
                          np.float32)


class StringSource(_DataSource):
    r"""One string per utterance (kept as a Python string through collate)."""

    def __init__(self, name, ext='txt'):
        super().__init__(name, use_deltas=False, ext=ext, sentence_level=True)

    def load_file(self, base_name, data_dir):
        with open(self.file_path(base_name, data_dir), 'r') as f:
            return f.read().strip()

    def __call__(self, base_name, data_dir):
        return {self.name: self.load_file(base_name, data_dir)}


class ASCIISource(_DataSource):
    r"""A sequence of characters encoded as integer ids (seq_len, 1)."""

    def __init__(self, name, ext='txt'):
        super().__init__(name, use_deltas=False, ext=ext, sentence_level=False)

    def load_file(self, base_name, data_dir):
        with open(self.file_path(base_name, data_dir), 'r') as f:
            text = f.read().strip()
        return np.array([ord(c) for c in text], dtype=np.int64)[:, None]


class WavSource(_DataSource):
    r"""Mono 16-bit PCM waveforms, returned as float32 in [-1, 1]."""

    def __init__(self, name, ext='wav', sample_rate=None):
        super().__init__(name, use_deltas=False, ext=ext, sentence_level=False)
        self.sample_rate = sample_rate

    def load_file(self, base_name, data_dir):
        wav, sr = file_io.load_wav(self.file_path(base_name, data_dir))
        if self.sample_rate is not None and sr != self.sample_rate:
            raise ValueError(f'{base_name}: expected sample rate {self.sample_rate}, got {sr}')
        # 1/32768: a full-scale negative sample (-32768) must stay within
        # the documented [-1, 1] range (dividing by 32767 puts it at
        # -1.000031, and save_wav's clip would then lose exactness on a
        # load->save round trip).
        return (wav.astype(np.float32) / 32768.0)[:, None]


class SyntheticSource(_DataSource):
    r"""Generates deterministic synthetic features keyed by (base_name, name).

    Used by tests and benchmarks: produces the same shapes/statistics as disk
    sources without touching the filesystem.
    """

    def __init__(self, name, feat_dim, use_deltas=False,
                 sentence_level=False, kind='normal', seq_len_range=(50, 200)):
        super().__init__(name, use_deltas, None, sentence_level)
        self.feat_dim = feat_dim
        self.kind = kind
        self.seq_len_range = seq_len_range

    def load_file(self, base_name, data_dir):
        # Stable across processes: Python's str hash is randomised per
        # interpreter (PYTHONHASHSEED), which would silently change the
        # "deterministic" features between runs and between hosts.
        import zlib
        # The LENGTH is seeded by base_name alone so all sources of one
        # utterance (sharing a seq_len_range) agree on its frame count —
        # per-feature lengths would misalign frame-level streams; only the
        # CONTENT varies per (utterance, feature).
        len_rng = np.random.default_rng(zlib.crc32(base_name.encode()))
        lo, hi = self.seq_len_range
        n = int(len_rng.integers(lo, hi))
        rng = np.random.default_rng(
            zlib.crc32(f'{base_name}\x00{self.name}'.encode()))
        if self.sentence_level:
            return np.asarray([n], dtype=np.float32)
        if self.kind == 'binary':
            return (rng.random((n, self.feat_dim)) > 0.3).astype(np.float32)
        if self.kind == 'positive':
            return (0.5 + rng.random((n, self.feat_dim))).astype(np.float32)
        return rng.normal(size=(n, self.feat_dim)).astype(np.float32)
