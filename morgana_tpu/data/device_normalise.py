"""Device-side feature normalisation and delta computation.

The reference (and our default host path) normalises every stream and
expands delta windows on the HOST, per utterance, inside the data workers
(``morgana/data.py:106-154``) — so each delta'd stream crosses the
host->device link four times per batch (raw, raw deltas x3 dims,
normalised, normalised deltas). Normalisation is an elementwise affine map
and the delta windows are three tiny convolutions: on a TPU both are
effectively free on-device, while the link is the measured bottleneck of
end-to-end training (BASELINE.md: transfer-bound e2e). ``--device_normalise``
moves them inside XLA:

- the dataset skips the host-side ``normalised_{name}`` /
  ``{name}_deltas`` / ``normalised_{name}_deltas`` keys for every eligible
  stream and emits a tiny ``{name}_seq_len`` (B,) int32 sidecar instead;
- the loader transfers ONLY the raw stream and applies a jitted transform
  after ``device_put`` that reconstructs the exact host-path keys (masked
  to zero in the padding region, per-item edge replication for deltas —
  bitwise-equal to the host path on CPU, see tests/test_device_normalise.py).

Wire-byte arithmetic at the flagship's shapes (``models/rnn_spss.py``):
lab 600 + normalised_lab 600, mcep 60 x (1 raw + 3 deltas + 1 + 3), bap
5 x 8, lf0 1 x 8, counters 9 x 2 ~= 1747 f32/frame on the host path vs
~676 with the flag; frame-rate delta'd WORLD streams compress 8x, so the
MEASURED whole-batch reduction at bench shapes is ~5x (26.1 -> 5.3 MB per
batch-32) — exactly where e2e training is bound.

Speaker-DEPENDENT normalisers gather per-speaker params by string id on the
host; their streams keep the host path (the transform simply never claims
them), so the flag degrades gracefully on multispeaker models.
"""
import numpy as np

from morgana_tpu.data.normalisers import _SpeakerDependentNormaliser

__all__ = ['eligible_names', 'seq_len_key', 'make_device_transform']


def seq_len_key(name):
    """Host->device sidecar carrying the true per-item lengths of ``name``
    (needed on device for masking + per-item delta edge replication)."""
    return f'{name}_seq_len'


def eligible_names(data_sources, normalisers):
    """Stream names whose normalised keys can move on-device: a plain
    (non-speaker-dependent) normaliser over an array-valued source."""
    out = []
    for name, normaliser in (normalisers or {}).items():
        if isinstance(normaliser, _SpeakerDependentNormaliser):
            continue
        if name not in (data_sources or {}):
            continue
        out.append(name)
    return out


def make_device_transform(data_sources, normalisers):
    """Builds the jitted post-``device_put`` transform.

    Returns ``(transform, names)``: ``transform(features)`` adds the
    ``normalised_{name}`` (+ ``{name}_deltas`` / ``normalised_{name}_deltas``
    for delta'd streams) keys for every eligible ``name``, consuming the
    ``{name}_seq_len`` sidecars; ``names`` is the eligible list (empty ->
    ``transform`` is None). Normaliser params are closed over as jit
    constants — they ride in the executable, not on the per-batch wire.
    """
    names = eligible_names(data_sources, normalisers)
    if not names:
        return None, []

    import jax
    import jax.numpy as jnp
    from morgana_tpu.ops.deltas import compute_deltas_jax
    from morgana_tpu.ops.masking import sequence_mask

    def _core(inputs):
        """(raw stream + length sidecar) dict -> ONLY the computed keys.
        Returning just the new arrays lets every untouched feature keep its
        original buffer (a jit pass-through output would be a device copy)."""
        out = {}
        for name in names:
            feature = inputs.get(name)
            if feature is None:
                continue
            normaliser = normalisers[name]
            seq_len = inputs.get(seq_len_key(name))
            has_time = getattr(feature, 'ndim', 0) >= 3  # (B, T, D)
            mask = None
            if has_time and seq_len is not None:
                # Host semantics: collate zero-pads AFTER normalisation, so
                # the padding region must be exactly zero (normalise(0) is
                # not zero for a nonzero mean).
                mask = sequence_mask(seq_len, feature.shape[1],
                                     dtype=feature.dtype)

            # Match the host-path dtypes: normalised keys arrive in the same
            # float dtype as the raw stream crossed the wire in (f32, or
            # bf16 under --transfer_dtype).
            out_dtype = feature.dtype \
                if jnp.issubdtype(feature.dtype, jnp.floating) else jnp.float32

            def finish(x):
                x = jnp.asarray(x).astype(out_dtype)
                return x * mask if mask is not None else x

            out[f'normalised_{name}'] = finish(normaliser.normalise(feature))
            if normaliser.use_deltas:
                deltas = compute_deltas_jax(feature, seq_len=seq_len)
                out[f'{name}_deltas'] = finish(deltas)
                out[f'normalised_{name}_deltas'] = finish(
                    normaliser.normalise(deltas, deltas=True))
        return out

    jitted = jax.jit(_core)

    def transform(features):
        inputs = {}
        for name in names:
            if name in features:
                inputs[name] = features[name]
                key = seq_len_key(name)
                if key in features:
                    inputs[key] = features[key]
        if not inputs:
            return features
        out = {key: value for key, value in features.items()
               if not (key.endswith('_seq_len')
                       and key[:-len('_seq_len')] in names)}
        out.update(jitted(inputs))
        return out

    return transform, names


def strip_host_keys(item_features, name, feature):
    """Per-item dataset hook: drops the host-computed ``{name}_deltas`` key
    (recomputed on device) and records the true length sidecar. Called by
    ``assemble_item`` for eligible names when device normalisation is on."""
    item_features.pop(f'{name}_deltas', None)
    if getattr(feature, 'ndim', 0) >= 2:  # (T, D) time series
        item_features[seq_len_key(name)] = np.int32(feature.shape[0])
    return item_features
