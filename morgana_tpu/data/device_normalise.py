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
them), so the flag degrades gracefully on multispeaker models. Streams whose
source emits deltas (``use_deltas=True``) under a NON-delta normaliser also
stay on the host path: the transform only rebuilds delta keys the normaliser
owns.

Composing with ``--transfer_dtype bfloat16``: naively quantizing the RAW
stream before normalisation would scale its rounding by 1/std (a
mean-dominated feature like lf0 — |x| ~ 5, std ~ 0.2 — would pick up ~0.2
sigma of wire noise, vs the host path's normalise-then-quantize error of
~eps). So under a lossy wire dtype, per stream:

- non-delta'd shiftable streams (the WIDE ones — lab, counters — where the
  bytes live) ship as the CENTERED residual ``{name}_wire = x - shift``
  (shift = MVN mean / minmax midpoint), whose rounding is proportional to
  ``|x - shift|`` — the host path's own error magnitude;
- delta'd streams ship raw in f32 (deltas are small differences divided by
  a small delta-std; ANY wire rounding of the raw signal would be amplified
  by sigma_x/sigma_delta in the normalised-delta keys) — still 4x fewer
  bytes than the host path's eight bf16 keys;
- every derived key is computed in f32 on device and cast to the wire dtype
  last, exactly like the host path's normalise-then-quantize order.

The f32 wire format keeps the raw/delta keys bitwise and normalised keys
within 1-2 ulp of the host path.
"""
import numpy as np

from morgana_tpu.data.normalisers import (_SpeakerDependentNormaliser,
                                          MeanVarianceNormaliser,
                                          MinMaxNormaliser)

__all__ = ['eligible_names', 'seq_len_key', 'make_device_transform']


def seq_len_key(name):
    """Host->device sidecar carrying the true per-item lengths of ``name``
    (needed on device for masking + per-item delta edge replication)."""
    return f'{name}_seq_len'


def eligible_names(data_sources, normalisers):
    """Stream names whose normalised keys can move on-device: a plain
    (non-speaker-dependent) normaliser over an array-valued source.

    Every eligibility rule lives HERE (the dataset's host-key stripping and
    the loader's device transform must agree on the same name set)."""
    out = []
    for name, normaliser in (normalisers or {}).items():
        if isinstance(normaliser, _SpeakerDependentNormaliser):
            continue
        source = (data_sources or {}).get(name)
        if source is None:
            continue
        if getattr(source, 'use_deltas', False) and not normaliser.use_deltas:
            # The source emits a ``{name}_deltas`` key the device transform
            # would NOT rebuild (it computes deltas only when the normaliser
            # wants them) — keep the host path for this stream.
            continue
        out.append(name)
    return out


def _wire_shift(normaliser):
    """The stream's center, subtracted host-side before a LOSSY wire cast so
    the rounding scales with ``|x - center|`` (the host path's error
    magnitude) instead of ``|x|``. None = ship plain raw."""
    params = getattr(normaliser, 'params', None) or {}
    if isinstance(normaliser, MeanVarianceNormaliser) and 'mean' in params:
        return np.asarray(params['mean'], np.float32)
    if isinstance(normaliser, MinMaxNormaliser) \
            and 'mmin' in params and 'mmax' in params:
        return 0.5 * (np.asarray(params['mmin'], np.float32)
                      + np.asarray(params['mmax'], np.float32))
    return None


def wire_key(name):
    """Key carrying the centered residual of ``name`` under a lossy wire."""
    return f'{name}_wire'


def make_device_transform(data_sources, normalisers, names=None,
                          wire_dtype=None):
    """Builds the jitted post-``device_put`` transform.

    Returns ``(transform, names)``: ``transform(features)`` adds the
    ``normalised_{name}`` (+ ``{name}_deltas`` / ``normalised_{name}_deltas``
    for delta'd streams) keys for every eligible ``name``, consuming the
    ``{name}_seq_len`` sidecars; ``names`` is the eligible list (empty ->
    ``transform`` is None). Normaliser params are closed over as jit
    constants — they ride in the executable, not on the per-batch wire.

    Pass ``names`` (e.g. ``FilesDataset.device_names``) to make the dataset's
    stripped-key set the single source of truth; by default it is recomputed
    with :func:`eligible_names` (identical by construction — all filtering
    rules live in that one function).

    ``wire_dtype``: the loader's ``transfer_dtype``. When lossy (not f32),
    the returned transform carries a ``transform.pre_put(features)`` hook the
    loader runs host-side BEFORE its wire cast: each shiftable stream is
    replaced by its centered residual ``{name}_wire`` (see :func:`_wire_shift`
    — the rename makes the shifted/unshifted contract explicit on both
    sides), and the device transform reconstructs the raw key exactly where
    the host path would have placed it.
    """
    names = sorted(names) if names is not None \
        else eligible_names(data_sources, normalisers)
    if not names:
        return None, []

    lossy = wire_dtype is not None and np.dtype(wire_dtype) != np.float32
    # Under a lossy wire, each eligible stream takes one of two routes:
    #  - non-delta'd + shiftable: ship the centered residual in the wire
    #    dtype (rounding ~ |x - center|, the host path's own magnitude);
    #  - delta'd (or shiftless): ship raw in F32 — deltas are small
    #    DIFFERENCES divided by a small delta-std, so any wire rounding of
    #    the raw signal is amplified by sigma_x/sigma_delta; keeping these
    #    few-dim streams at 4 bytes still beats the host path's 8-key ship
    #    4x, while the wide non-delta streams (where the bytes are) get the
    #    full residual compression.
    # Every derived key is then cast to the wire dtype on device, matching
    # the host path's post-normalise quantization bit-for-bit in fidelity.
    shifts = {}
    keep_f32 = frozenset()
    if lossy:
        for name in names:
            if not normalisers[name].use_deltas:
                shift = _wire_shift(normalisers[name])
                if shift is not None:
                    shifts[name] = shift
        keep_f32 = frozenset(set(names) - set(shifts))

    import jax
    import jax.numpy as jnp
    from morgana_tpu.ops.deltas import compute_deltas_jax
    from morgana_tpu.ops.masking import sequence_mask

    def _core(inputs):
        """(raw-or-centered stream + length sidecar) dict -> ONLY the
        computed keys. Returning just the new arrays lets every untouched
        feature keep its original buffer (a jit pass-through output would be
        a device copy)."""
        out = {}
        for name in names:
            shifted = inputs.get(wire_key(name))
            feature = shifted if shifted is not None else inputs.get(name)
            if feature is None:
                continue
            normaliser = normalisers[name]
            seq_len = inputs.get(seq_len_key(name))
            has_time = getattr(feature, 'ndim', 0) >= 3  # (B, T, ...)
            mask = None
            if has_time and seq_len is not None:
                # Host semantics: collate zero-pads AFTER normalisation, so
                # the padding region must be exactly zero (normalise(0) is
                # not zero for a nonzero mean).
                mask = sequence_mask(seq_len, feature.shape[1],
                                     dtype=jnp.float32)
                # sequence_mask is (B, T, 1); features may carry extra
                # trailing dims ((B, T, H, W) collates are legal).
                mask = mask.reshape(mask.shape[:2]
                                    + (1,) * max(feature.ndim - 2, 0))

            # Match the host-path dtypes: derived keys land in the dtype
            # the loader's wire cast would have given them (the wire dtype
            # for float sequence streams when lossy, else f32).
            is_float = jnp.issubdtype(feature.dtype, jnp.floating)
            if lossy and is_float:
                out_dtype = jnp.dtype(wire_dtype)
            else:
                out_dtype = feature.dtype if is_float else jnp.float32

            # Compute in f32 even when the wire format was bf16: the host
            # path normalises/accumulates deltas in f32 and quantizes LAST,
            # so low-precision intermediate math would compound the wire
            # quantization (the raw stream's own bf16 rounding is the one
            # divergence the wire format buys and cannot be undone here).
            work = feature.astype(jnp.float32) if is_float else feature
            if shifted is not None:
                # Centered-residual wire format: add the shift back in f32,
                # reconstructing the raw stream the host path would ship.
                work = work + jnp.asarray(shifts[name], jnp.float32)

            def finish(x):
                # Mask in f32 BEFORE the output cast (an exact 0/1 multiply
                # either way; done first so bf16 outputs round once).
                x = jnp.asarray(x)
                if mask is not None:
                    x = x * mask.astype(x.dtype)
                return x.astype(out_dtype)

            if lossy and is_float:
                # Re-emit the raw key in the wire dtype (shifted streams:
                # reconstructed; f32-shipped streams: cast exactly as the
                # loader's own cast would have).
                out[name] = finish(work)
            out[f'normalised_{name}'] = finish(normaliser.normalise(work))
            if normaliser.use_deltas:
                deltas = compute_deltas_jax(work, seq_len=seq_len)
                out[f'{name}_deltas'] = finish(deltas)
                out[f'normalised_{name}_deltas'] = finish(
                    normaliser.normalise(deltas, deltas=True))
        return out

    jitted = jax.jit(_core)

    def transform(features):
        inputs = {}
        for name in names:
            for key in (name, wire_key(name), seq_len_key(name)):
                if key in features:
                    inputs[key] = features[key]
        if not inputs:
            return features
        consumed = {seq_len_key(name) for name in names} \
            | {wire_key(name) for name in shifts}
        # (raw keys _core re-emits simply overwrite via out.update below)
        out = {key: value for key, value in features.items()
               if key not in consumed}
        out.update(jitted(inputs))
        return out

    def pre_put(features):
        """Host-side hook (run by the loader BEFORE its wire cast): replace
        each shiftable raw stream with its centered residual. Only sequence
        f32 arrays are renamed — the loader's cast condition — so a stream
        that would not be quantized ships (and reconstructs) unshifted."""
        out = dict(features)
        for name, shift in shifts.items():
            value = out.get(name)
            if isinstance(value, np.ndarray) and value.ndim >= 3 \
                    and value.dtype == np.float32:
                out[wire_key(name)] = value - shift
                del out[name]
        return out

    transform.pre_put = pre_put if shifts else None
    # Streams the loader must NOT quantize on the wire (delta'd/shiftless
    # eligible streams ship f32; the device transform casts their derived
    # keys to the wire dtype itself).
    transform.keep_f32 = keep_f32
    return transform, names


def strip_host_keys(item_features, name, feature):
    """Per-item dataset hook: drops the host-computed ``{name}_deltas`` key
    (recomputed on device) and records the true length sidecar. Called by
    ``assemble_item`` for eligible names when device normalisation is on."""
    item_features.pop(f'{name}_deltas', None)
    if getattr(feature, 'ndim', 0) >= 2:  # (T, D) time series
        item_features[seq_len_key(name)] = np.int32(feature.shape[0])
    return item_features
