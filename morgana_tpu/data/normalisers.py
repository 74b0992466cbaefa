"""Feature normalisers (MVN / min-max, plus speaker-dependent variants).

Same parameter-file contract as the reference (``morgana/data.py:252-628``):
JSON files ``{name}_mvn.json`` / ``{name}_minmax.json`` (and
``{speaker_id}/{name}_*.json`` for speaker-dependent normalisers), so datasets
prepared for the reference are reusable unchanged.

Normalisers operate on both NumPy arrays (host data pipeline) and jnp arrays
(inside jitted model code) — the maths is written with operators common to
both, so there is no type dispatch and no host sync.
"""
import os

import jax.numpy as jnp
import numpy as np

from morgana_tpu.data import file_io
from morgana_tpu.utils import listify

__all__ = [
    'Normalisers', '_FeatureNormaliser', '_SpeakerDependentNormaliser',
    'MeanVarianceNormaliser', 'MinMaxNormaliser',
    'SpeakerDependentMeanVarianceNormaliser', 'SpeakerDependentMinMaxNormaliser',
    'normalise_mvn', 'denormalise_mvn', 'normalise_minmax', 'denormalise_minmax',
    'fit_mvn_params', 'fit_minmax_params',
]


def _align(param, feature):
    """Aligns ``(..., D)`` params to the feature for broadcasting: the time
    axis is inserted only when the feature actually HAS one (more dims than
    the params). Sentence-level ``(D,)`` / scalar features broadcast
    directly like the reference (``morgana/data.py:533-538``) — inserting
    an axis unconditionally would turn a ``(D,)`` feature into ``(1, D)``,
    which collate then zero-pads as a bogus one-frame sequence."""
    if np.ndim(feature) > np.ndim(param):
        return param[..., None, :]
    return param


def normalise_mvn(feature, mean, std_dev):
    return (feature - _align(mean, feature)) / (_align(std_dev, feature) + 1e-8)


def denormalise_mvn(feature, mean, std_dev):
    return (feature * _align(std_dev, feature)) + _align(mean, feature)


def _safe_scale(mmin, mmax):
    scale = mmax - mmin
    if isinstance(scale, np.ndarray):
        scale = scale.copy()
        scale[np.abs(scale) <= 1e-8] = 1.
        return scale
    return jnp.where(jnp.abs(scale) <= 1e-8, 1., scale)


def normalise_minmax(feature, mmin, mmax):
    scale = _safe_scale(mmin, mmax)
    return (feature - _align(mmin, feature)) / _align(scale, feature)


def denormalise_minmax(feature, mmin, mmax):
    scale = _safe_scale(mmin, mmax)
    return (feature * _align(scale, feature)) + _align(mmin, feature)


def fit_mvn_params(features):
    """Computes MVN params over a list of (seq_len, feat_dim) arrays."""
    stacked = np.concatenate([np.asarray(f, np.float64).reshape(-1, np.asarray(f).shape[-1])
                              for f in features], axis=0)
    return {'mean': stacked.mean(0).tolist(), 'std_dev': stacked.std(0).tolist()}


def fit_minmax_params(features):
    stacked = np.concatenate([np.asarray(f, np.float64).reshape(-1, np.asarray(f).shape[-1])
                              for f in features], axis=0)
    return {'mmin': stacked.min(0).tolist(), 'mmax': stacked.max(0).tolist()}


class _FeatureNormaliser(object):
    r"""Abstract feature normaliser; exposes ``normalise``/``denormalise``.

    Parameters are loaded from JSON (``load_params``) into float32 numpy
    arrays; jit-side use needs no explicit placement (jax moves the host
    arrays at trace time), so ``load_params``'s ``device`` argument —
    kept for the reference's call signature
    (``morgana/data.py:362-385``) — is accepted and ignored.
    """

    def __init__(self, name, use_deltas=False, file_pattern='{name}.json'):
        self.name = name
        self.use_deltas = use_deltas
        self.file_pattern = file_pattern
        self.params = None
        self.delta_params = None

    def _normalise(self, feature, **params):
        raise NotImplementedError

    def _denormalise(self, feature, **params):
        raise NotImplementedError

    def normalise(self, feature, deltas=False):
        return self._normalise(feature, **self.fetch_params(deltas=deltas))

    def denormalise(self, feature, deltas=False):
        return self._denormalise(feature, **self.fetch_params(deltas=deltas))

    def fetch_params(self, deltas=False):
        params = self.delta_params if deltas else self.params
        if params is None:
            hint = ('construct the normaliser with use_deltas=True'
                    if deltas and not self.use_deltas else 'call load_params')
            raise RuntimeError(
                f'Normaliser {self.name!r}: '
                f'{"delta " if deltas else ""}parameters not loaded '
                f'({hint})')
        return params

    @staticmethod
    def _from_json(file_path):
        feat_params = file_io.load_json(file_path)
        return {k: np.array(v, dtype=np.float32) for k, v in feat_params.items()}

    def load_params(self, data_dir, data_root='.', device=None):
        r"""Loads parameters from ``{data_root}/{data_dir}/{pattern}`` JSON files."""
        params_file = os.path.join(data_root, data_dir, self.file_pattern.format(name=self.name))
        self.params = self._from_json(params_file)
        if self.use_deltas:
            delta_file = os.path.join(
                data_root, data_dir, self.file_pattern.format(name=self.name + '_deltas'))
            self.delta_params = self._from_json(delta_file)

    def save_params(self, params, data_dir, data_root='.', deltas=False):
        name = self.name + ('_deltas' if deltas else '')
        path = os.path.join(data_root, data_dir, self.file_pattern.format(name=name))
        file_io.save_json({k: np.asarray(v).tolist() for k, v in params.items()}, path)
        if deltas:
            self.delta_params = {k: np.array(v, np.float32) for k, v in params.items()}
        else:
            self.params = {k: np.array(v, np.float32) for k, v in params.items()}


class _SpeakerDependentNormaliser(_FeatureNormaliser):
    r"""Speaker-dependent normaliser: per-speaker JSON param files, with
    batch-level parameter gathering by speaker id (``morgana/data.py:388-530``)."""

    def __init__(self, name, speaker_id_list, use_deltas=False,
                 file_pattern='{speaker_id}/{name}.json'):
        super().__init__(name, use_deltas=use_deltas, file_pattern=file_pattern)
        self.speaker_id_list = speaker_id_list
        self.speaker_ids = None
        self.params = {}
        self.delta_params = {} if use_deltas else None

    def normalise(self, feature, speaker_ids, deltas=False):
        return self._normalise(feature, **self.fetch_params(speaker_ids, deltas=deltas))

    def denormalise(self, feature, speaker_ids, deltas=False):
        return self._denormalise(feature, **self.fetch_params(speaker_ids, deltas=deltas))

    def save_params(self, params, data_dir, data_root='.', deltas=False,
                    speaker_id=None):
        """Per-speaker save: the base implementation would KeyError on the
        ``{speaker_id}`` pattern slot and flatten the per-speaker params
        dict; here the file and the in-memory entry are speaker-scoped."""
        if speaker_id is None:
            raise ValueError(f'{type(self).__name__}.save_params needs '
                             f'speaker_id= (params are per-speaker)')
        name = self.name + ('_deltas' if deltas else '')
        path = os.path.join(data_root, data_dir,
                            self.file_pattern.format(name=name,
                                                     speaker_id=speaker_id))
        file_io.save_json({k: np.asarray(v).tolist()
                           for k, v in params.items()}, path)
        target = self.delta_params if deltas else self.params
        target[speaker_id] = {k: np.array(v, np.float32)
                              for k, v in params.items()}

    def fetch_params(self, speaker_ids, deltas=False):
        if isinstance(speaker_ids, np.ndarray):
            # A collated batch of ids arrives as an array; .tolist() turns
            # it into hashable python scalars/strings (listify would wrap
            # the whole array as ONE unhashable key).
            speaker_ids = np.atleast_1d(speaker_ids).tolist()
        speaker_ids = listify(speaker_ids)
        speaker_params = self.delta_params if deltas else self.params
        if speaker_params is None:
            # Same informative guard as the base class (delta params need
            # use_deltas=True; everything needs load_params first).
            hint = ('construct the normaliser with use_deltas=True'
                    if deltas and not self.use_deltas else 'call load_params')
            raise RuntimeError(
                f'Normaliser {self.name!r}: '
                f'{"delta " if deltas else ""}parameters not loaded '
                f'({hint})')

        sd_params = {}
        for speaker_id in speaker_ids:
            if speaker_id not in speaker_params:
                raise KeyError(
                    f'Normaliser {self.name!r}: no parameters for speaker '
                    f'{speaker_id!r} (loaded speakers: '
                    f'{sorted(speaker_params)[:8]}; speaker ids must match '
                    'the speaker_id_list entries — string ids, not numeric '
                    'features)')
            for name, param in speaker_params[speaker_id].items():
                sd_params.setdefault(name, []).append(param)

        out = {}
        for name, plist in sd_params.items():
            stacked = np.stack(plist, axis=0)
            out[name] = stacked[0] if len(speaker_ids) == 1 else stacked
        return out

    def load_params(self, data_dir, data_root='.', device=None):
        if self.speaker_ids is None:
            self.speaker_ids = file_io.get_file_ids(os.path.join(data_root, self.speaker_id_list))

        for speaker_id in self.speaker_ids:
            params_file = os.path.join(
                data_root, data_dir, self.file_pattern.format(name=self.name, speaker_id=speaker_id))
            self.params[speaker_id] = self._from_json(params_file)
            if self.use_deltas:
                delta_file = os.path.join(
                    data_root, data_dir,
                    self.file_pattern.format(speaker_id=speaker_id, name=self.name + '_deltas'))
                self.delta_params[speaker_id] = self._from_json(delta_file)


class MeanVarianceNormaliser(_FeatureNormaliser):
    r"""Zero-mean unit-variance normalisation; params from ``{name}_mvn.json``."""

    def __init__(self, name, use_deltas=False):
        super().__init__(name, use_deltas, '{name}_mvn.json')

    def _normalise(self, feature, **params):
        return normalise_mvn(feature, params['mean'], params['std_dev'])

    def _denormalise(self, feature, **params):
        return denormalise_mvn(feature, params['mean'], params['std_dev'])


class MinMaxNormaliser(_FeatureNormaliser):
    r"""[0, 1] min-max normalisation; params from ``{name}_minmax.json``."""

    def __init__(self, name, use_deltas=False):
        super().__init__(name, use_deltas, '{name}_minmax.json')

    def _normalise(self, feature, **params):
        return normalise_minmax(feature, params['mmin'], params['mmax'])

    def _denormalise(self, feature, **params):
        return denormalise_minmax(feature, params['mmin'], params['mmax'])


class SpeakerDependentMeanVarianceNormaliser(_SpeakerDependentNormaliser):
    def __init__(self, name, speaker_id_list, use_deltas=False):
        super().__init__(name, speaker_id_list, use_deltas, '{speaker_id}/{name}_mvn.json')

    def _normalise(self, feature, **params):
        return normalise_mvn(feature, params['mean'], params['std_dev'])

    def _denormalise(self, feature, **params):
        return denormalise_mvn(feature, params['mean'], params['std_dev'])


class SpeakerDependentMinMaxNormaliser(_SpeakerDependentNormaliser):
    def __init__(self, name, speaker_id_list, use_deltas=False):
        super().__init__(name, speaker_id_list, use_deltas, '{speaker_id}/{name}_minmax.json')

    def _normalise(self, feature, **params):
        return normalise_minmax(feature, params['mmin'], params['mmax'])

    def _denormalise(self, feature, **params):
        return denormalise_minmax(feature, params['mmin'], params['mmax'])


class Normalisers(dict):
    r"""Dict container that loads parameters for all held normalisers
    (reference ``morgana/data.py:227-249``)."""

    def __init__(self, normaliser_sources, normalisation_dir, data_root='.', device=None):
        super().__init__()
        self.normalisation_dir = normalisation_dir
        self.data_root = data_root
        for name, normaliser in normaliser_sources.items():
            self[name] = normaliser
            # data_root rides separately: speaker-dependent normalisers
            # resolve their speaker_id_list against it, so baking it into
            # the dir (the old behaviour) left them reading from the CWD.
            self[name].load_params(normalisation_dir, data_root)
