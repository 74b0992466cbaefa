"""Dataset + collate: fixed-shape, length-bucketed padded batches for XLA.

``FilesDataset`` mirrors the reference's contract (``morgana/data.py:60-224``):
combine ``_DataSource`` outputs per utterance, add ``normalised_{name}``
(+``_deltas``) keys, zero-pad ragged sequences to a batch maximum.

The TPU-specific twist is **bucketed padding**: under jit every distinct batch
shape triggers one compilation, so instead of padding to the exact batch max
(a new shape almost every batch) the collate rounds the max length up to a
small ladder of bucket sizes (<= 8 buckets per octave). This bounds
recompilation count while keeping padding waste < ~12%.
"""
import os

import numpy as np

from morgana_tpu.data import file_io
from morgana_tpu.data.normalisers import _SpeakerDependentNormaliser

__all__ = ['FilesDataset', 'assemble_item', 'bucket_size', 'collate']


def bucket_size(n, minimum=16):
    """Rounds ``n`` up to the next bucket boundary: multiples of 1/8 of the
    PREVIOUS power of two, i.e. at most 8 buckets per octave and worst-case
    padding waste of ~12.4%. (``bit_length() - 3`` here would step by 1/8 of
    the *next* power of two — 4 buckets per octave, up to ~24% waste.)"""
    n = int(n)
    if n <= minimum:
        return minimum
    step = max(minimum // 8, 1 << max(0, (n - 1).bit_length() - 4))
    return -(-n // step) * step


class FilesDataset(object):
    r"""Combines multiple ``_DataSource`` instances and normalisers.

    Parameters mirror the reference (``morgana/data.py:87-104``).
    """

    def __init__(self, data_sources, data_dir, id_list, normalisers, data_root='.',
                 device_normalise=False):
        for name, normaliser in (normalisers or {}).items():
            if isinstance(normaliser, _SpeakerDependentNormaliser) and 'speaker_id' not in data_sources:
                raise KeyError(
                    f"{name} is a speaker-dependent normaliser, but no 'speaker_id' data_source was defined")
            if name in data_sources and normaliser.use_deltas and not data_sources[name].use_deltas:
                raise ValueError(f'To normalise deltas of {name}, set `data_source.use_deltas` to True.')

        self.data_sources = data_sources
        self.data_root = data_root
        self.data_dir = os.path.join(self.data_root, data_dir)

        self.id_list = os.path.join(self.data_root, id_list)
        self.file_ids = file_io.get_file_ids(self.id_list)

        self.normalisers = normalisers or {}
        # Streams whose normalised/delta keys are computed ON DEVICE by the
        # loader's post-device_put transform instead of here (see
        # data/device_normalise.py) — items emit only the raw stream plus a
        # tiny per-item length sidecar for those names.
        if device_normalise:
            from morgana_tpu.data.device_normalise import eligible_names
            self.device_names = frozenset(
                eligible_names(self.data_sources, self.normalisers))
        else:
            self.device_names = frozenset()

    def __len__(self):
        return len(self.file_ids)

    def __getitem__(self, index):
        return self.build_item(index, None)

    def build_item(self, index, preloaded=None):
        """Assembles one utterance's feature dict; features already read by
        :meth:`preload_batch` are taken from ``preloaded`` instead of disk."""
        base_name = self.file_ids[index]

        def get_packaged(name, data_source):
            if preloaded and name in preloaded:
                return data_source.package(preloaded[name])
            return data_source(base_name, self.data_dir)

        return assemble_item(self.data_sources, self.normalisers,
                             get_packaged, base_name,
                             device_names=self.device_names)

    @property
    def supports_native_preload(self):
        """True when :meth:`preload_batch` would actually use the GIL-free
        native reader for at least one source — the condition under which
        the loader's whole-batch pipelining pays off."""
        from morgana_tpu.data import native_io
        from morgana_tpu.data.sources import NumpyBinarySource
        return native_io.native_available() and any(
            type(src) is NumpyBinarySource and not src.sentence_level
            for src in self.data_sources.values())

    def preload_batch(self, indices):
        """Reads the batch's ``.npy`` features through the GIL-free native
        batch reader (``csrc/batch_io.cpp``: one C++ thread pool over all
        files). Returns ``{source_name: [per-item array]}`` — empty when the
        native library is unavailable or no source qualifies. The remaining
        per-item work (text sources, deltas, normalisation) still runs in
        :meth:`build_item`.
        """
        from morgana_tpu.data import native_io
        from morgana_tpu.data.sources import NumpyBinarySource

        if not native_io.native_available():
            return {}
        indices = list(indices)
        out = {}
        for name, src in self.data_sources.items():
            # Exactly NumpyBinarySource: subclasses may override load_file.
            if type(src) is not NumpyBinarySource or src.sentence_level:
                continue
            paths = [src.file_path(self.file_ids[i], self.data_dir)
                     for i in indices]
            batch_arr, lens = native_io.load_npy_batch(paths)
            out[name] = [batch_arr[j, :lens[j]] for j in range(len(indices))]
        return out

    @staticmethod
    def collate_fn(batch, bucket=True):
        return collate(batch, bucket=bucket)


def assemble_item(data_sources, normalisers, get_packaged, base_name,
                  device_names=()):
    """Builds one utterance's feature dict from packaged source features:
    adds ``normalised_{name}`` (+``_deltas``) keys exactly as the reference's
    ``FilesDataset.__getitem__`` (``morgana/data.py:106-154``).

    ``get_packaged(name, data_source)`` supplies each source's packaged dict —
    from disk (:class:`FilesDataset`), a native batch preload, or in-memory
    raw features (``serve.InferenceEngine.predict_items``).

    Streams in ``device_names`` skip the host normalised/delta keys (the
    loader recomputes them on device — ``data/device_normalise.py``) and
    gain a ``{name}_seq_len`` sidecar instead.
    """
    features = {'name': base_name}

    if 'speaker_id' in data_sources:
        features.update(get_packaged('speaker_id', data_sources['speaker_id']))

    def _normalise_feature(name, feature, is_deltas=False):
        normaliser = normalisers[name]
        if isinstance(normaliser, _SpeakerDependentNormaliser):
            out = normaliser.normalise(feature, features['speaker_id'], deltas=is_deltas)
        else:
            out = normaliser.normalise(feature, deltas=is_deltas)
        return np.asarray(out, np.float32)

    for name, data_source in data_sources.items():
        if name == 'speaker_id':
            continue

        data_source_features = get_packaged(name, data_source)

        if name in normalisers:
            if name in device_names:
                from morgana_tpu.data.device_normalise import strip_host_keys
                strip_host_keys(data_source_features, name,
                                data_source_features[name])
            else:
                data_source_features[f'normalised_{name}'] = \
                    _normalise_feature(name, data_source_features[name])
                if normalisers[name].use_deltas:
                    data_source_features[f'normalised_{name}_deltas'] = \
                        _normalise_feature(name, data_source_features[f'{name}_deltas'], is_deltas=True)

        features.update(data_source_features)

    return features


def collate(batch, bucket=True):
    r"""Collates a list of per-utterance feature dicts into a padded batch.

    Sequence features (ndim > 1) are zero-padded to the (bucketed) batch max
    length; 1-d/scalar features stack; non-numeric values pass through as
    lists (reference semantics: ``morgana/data.py:159-224``).
    """
    batch_size = len(batch)
    keys = batch[0].keys()

    batched = {}
    for key in keys:
        values = [item[key] for item in batch]
        first = values[0]

        if isinstance(first, np.ndarray) and first.ndim > 1:
            max_len = max(v.shape[0] for v in values)
            if bucket:
                max_len = bucket_size(max_len)
            if first.dtype == np.float32 and first.ndim == 2:
                # Parallel native pad-copy when libbatch_io.so is built
                # (the C++ path is (seq_len, feat_dim)-only).
                from morgana_tpu.data import native_io
                batched[key] = native_io.pad_collate(
                    [np.ascontiguousarray(v) for v in values], max_len)
            else:
                # Generic path: zero-pad the leading (time) axis, keeping
                # any trailing shape — (seq_len, H, W) features pad to
                # (batch, max_len, H, W).
                out = np.zeros((batch_size, max_len) + first.shape[1:],
                               dtype=first.dtype)
                for i, v in enumerate(values):
                    out[i, :v.shape[0]] = v
                batched[key] = out

        elif isinstance(first, np.ndarray):
            batched[key] = np.stack([np.asarray(v) for v in values])

        elif isinstance(first, bool):
            # Checked before int: Python bool subclasses int. uint8 matches
            # the reference dtype map (morgana/data.py:25).
            batched[key] = np.asarray(values, dtype=np.uint8)

        elif isinstance(first, (int, float, np.integer, np.floating)):
            dtype = np.int64 if isinstance(first, (int, np.integer)) else np.float32
            batched[key] = np.asarray(values, dtype=dtype)

        else:
            batched[key] = values

    return batched
