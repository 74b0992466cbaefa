"""Feature dumping (reference-parity surface of ``morgana/viz/io.py``):
saves batched sequence features per utterance as
``{out_dir}/feats/{feat_name}/{utt}.npy``, handling device detachment and
padding removal.
"""
import os

import numpy as np

from morgana_tpu import utils
from morgana_tpu.data import file_io

__all__ = ['save_batched_seqs']


def save_batched_seqs(sequence_features, names, out_dir, seq_len=None, feat_names=None):
    r"""Saves multiple sequence features for multiple sentences.

    Parameters match the reference (``morgana/viz/io.py:10-56``):
    ``sequence_features`` may be a dict (keys become subdirectory names, with
    ``feat_names`` selecting a subset), or a list/single array with
    ``feat_names`` required.
    """
    pred_dir = os.path.join(out_dir, 'feats')
    os.makedirs(pred_dir, exist_ok=True)

    if isinstance(sequence_features, dict):
        if feat_names is None:
            feat_names = list(sequence_features.keys())
        sequence_features = [sequence_features[feat_name] for feat_name in feat_names]
    else:
        if feat_names is None:
            raise ValueError('If sequence features is not a dictionary, then feat_names must be provided.')
        if not isinstance(sequence_features, (list, tuple)):
            # A bare (batch, time, dim) array: wrap it so the star-splat
            # below passes ONE feature, not one array per batch item.
            sequence_features = [sequence_features]

    sequence_features = utils.detach_batched_seqs(*sequence_features, seq_len=seq_len)
    if not isinstance(sequence_features, list) or (
            len(sequence_features) and isinstance(sequence_features[0], np.ndarray)
            and len(feat_names) == 1):
        sequence_features = [sequence_features]

    for feat_name, values in zip(feat_names, sequence_features):
        if len(values) and isinstance(values[0], np.ndarray):
            file_io.save_dir(file_io.save_bin,
                             path=os.path.join(pred_dir, feat_name),
                             data=values,
                             file_ids=names)
