"""On-device (XLA/TPU) WORLD-style waveform synthesis.

The reference synthesises waveforms strictly on the host CPU (pyworld /
``world_with_reaper_f0.synthesis``, ``models/RNN_SPSS.py:160``); this repo's
``vocoder/world.py`` keeps that contract with a C++/numpy implementation.
This module is the TPU-native alternative: the SAME source-filter algorithm
(``world.py::_synthesize_numpy``, mirrored operation for operation)
expressed in jax — batched minimum-phase filters, a closed-form glottal
pulse train, windowed FFT filtering and one scatter-add overlap-add — so a
BATCH of utterances synthesises as one compiled program on the accelerator
where the acoustic model's features already live, instead of frame loops on
a host core.

Design notes:

- **Pulse positions without a sample-level cumsum.** The host path
  accumulates per-sample phase in float64 (float32 accumulation over 100k+
  samples visibly drifts pulse positions — a bug class this repo has hit
  before). Here phase is accumulated per FRAME (T terms, via cumsum) and
  expanded within each frame in closed form ``frac(anchor) + (j+1) * f0/fs``
  — magnitudes stay small, so float32 matches the float64 reference to
  ~1e-4 cycles even on minutes-long signals.
- **Static shapes**: one compiled program per (frames, fft_size, hop)
  signature; the batched entry pads to a shared T and masks padding frames
  (their filters would otherwise pass noise: an all-zero mcep is a unity
  envelope, not silence).
- **Noise**: callers may inject the noise signal (the parity tests feed the
  host path's seeded numpy noise, making the two implementations directly
  comparable); by default it is drawn from a jax PRNG key on device.

Compute is float32 (TPU-native); the host path is float64. Fidelity bound
asserted in tests/test_jax_vocoder.py: waveform relative L2 error ~1e-3
against the float64 host path with shared noise, exact analysis round trip
(f0 tracking) on synthesised vowels.
"""
import numpy as np

from morgana_tpu.vocoder import world as _world

__all__ = ['synthesize_jax', 'synthesize_world_feats_jax', 'synthesize_batch']

_JIT_CORE = None          # lazily-created jitted _core (one wrapper = one cache)
_BATCH_FNS = {}           # (B, T, M, bands, fs, hop, fft) -> compiled batch fn


def _conversion_constants(num_mcep, num_bands, fft_size, fs):
    """The mcep->spectrum freqt matrix and bap->aperiodicity interpolation
    weights, reusing world.py's float64 caches (cast to f32 jit constants)."""
    import jax.numpy as jnp
    alpha = _world.default_alpha(fs)
    key = (num_mcep, fft_size // 2, float(-alpha))
    mat = _world._FREQT_MATRICES.get(key)
    if mat is None:
        mat = _world._freqt_recursion(np.eye(num_mcep), fft_size // 2, -alpha)
        _world._FREQT_MATRICES[key] = mat
    num_bins = fft_size // 2 + 1
    bkey = (num_bands, num_bins)
    weights = _world._BAP_INTERP_MATRICES.get(bkey)
    if weights is None:
        band_pos = (np.arange(num_bands) + 0.5) / num_bands * (num_bins - 1)
        bins = np.arange(num_bins)
        weights = np.stack([np.interp(bins, band_pos, row)
                            for row in np.eye(num_bands)])
        _world._BAP_INTERP_MATRICES[bkey] = weights
    return jnp.asarray(mat, jnp.float32), jnp.asarray(weights, jnp.float32)


def _mcep_to_spectrum_jax(mcep, freqt_mat, fft_size):
    """world.mcep_to_spectrum in jax: unwarp (one matmul), cosine series via
    rfft of the symmetrised cepstrum, exponentiate."""
    import jax.numpy as jnp
    c_lin = mcep @ freqt_mat                       # (T, fft/2 + 1)
    half = fft_size // 2
    buf = jnp.concatenate([c_lin, c_lin[:, 1:half][:, ::-1]], axis=-1)
    log_sp = jnp.fft.rfft(buf, axis=-1).real
    return jnp.exp(2.0 * log_sp)


def _minimum_phase_spectra_jax(power_sp, fft_size):
    """world._minimum_phase_spectra in jax (batched over frames)."""
    import jax.numpy as jnp
    log_amp = 0.5 * jnp.log(jnp.maximum(power_sp, 1e-38))
    cep = jnp.fft.irfft(log_amp, n=fft_size, axis=-1)
    half = fft_size // 2
    fold = jnp.concatenate([
        cep[:, :1],
        cep[:, 1:half] * 2.0,
        cep[:, half:half + 1],
        jnp.zeros_like(cep[:, half + 1:]),
    ], axis=-1)
    return jnp.exp(jnp.fft.rfft(fold, axis=-1))


def _core(f0, sp, ap, noise, frame_mask, fs, hop, fft_size):
    """One utterance: (T,) f0 / (T, K) sp / (T, K) ap / (S,) noise ->
    (S,) waveform. Mirrors world._synthesize_numpy step for step; padding
    frames are silenced via ``frame_mask`` (T,)."""
    import jax.numpy as jnp

    num_frames = f0.shape[0]
    num_samples = num_frames * hop

    f0 = f0 * frame_mask
    h_per = _minimum_phase_spectra_jax(
        sp * jnp.maximum(1.0 - ap ** 2, 1e-12), fft_size)
    h_apr = _minimum_phase_spectra_jax(
        sp * jnp.maximum(ap ** 2, 1e-12), fft_size)

    # Glottal pulse train: per-frame phase anchors (T-term cumsum), in-frame
    # closed form. The LAST in-frame phase is forced to the next frame's
    # anchor, so each frame detects exactly the integer crossings in
    # (anchor_t, anchor_{t+1}] and the total pulse count telescopes to
    # floor(total cycles) — float32 anchor rounding can jitter a boundary
    # pulse by a sample but can never drop or duplicate one (a naive
    # per-frame recomputation loses pulses whose crossing lands in the ulp
    # gap between anchor_t + hop*rate and anchor_{t+1}).
    rate = f0 / float(fs)                                   # cycles/sample
    anchors = jnp.concatenate([jnp.zeros(1, rate.dtype),
                               jnp.cumsum(rate * hop)])     # (T+1,)
    r_eff = (anchors[1:] - anchors[:-1]) / hop
    j = jnp.arange(hop, dtype=rate.dtype)
    ph_at = anchors[:-1, None] + (j[None, :] + 1.0) * r_eff[:, None]
    ph_at = ph_at.at[:, -1].set(anchors[1:])
    ph_before = jnp.concatenate([anchors[:-1, None], ph_at[:, :-1]], axis=1)
    pulses = (jnp.floor(ph_at) > jnp.floor(ph_before))
    voiced = (f0 > 0)[:, None]
    amp = jnp.sqrt(jnp.maximum(
        float(fs) / jnp.maximum(f0, 1.0), 1.0))[:, None]
    periodic = jnp.where(pulses & voiced, amp, 0.0).reshape(num_samples)

    noise = noise[:num_samples]

    win_len = min(fft_size, 4 * hop)
    window = jnp.asarray(np.hanning(win_len), jnp.float32)
    ola_gain = float(np.sum(np.hanning(win_len)[::hop])) \
        if hop < win_len else 1.0

    pad = fft_size
    exc_p = jnp.concatenate([periodic, jnp.zeros(pad, periodic.dtype)])
    exc_n = jnp.concatenate([noise, jnp.zeros(pad, noise.dtype)])
    starts = jnp.arange(num_frames) * hop
    gather = starts[:, None] + jnp.arange(win_len)[None, :]
    frames_p = exc_p[gather] * window[None, :]
    frames_n = exc_n[gather] * window[None, :]

    spec = (jnp.fft.rfft(frames_p, n=fft_size, axis=-1) * h_per
            + jnp.fft.rfft(frames_n, n=fft_size, axis=-1) * h_apr)
    filt = jnp.fft.irfft(spec, n=fft_size, axis=-1)
    # Padding frames must contribute SILENCE: an all-zero mcep row is a
    # unity filter, which would pass the noise excitation.
    filt = filt * frame_mask[:, None]

    idx = (starts[:, None] + jnp.arange(fft_size)[None, :]).reshape(-1)
    out = jnp.zeros(num_samples + fft_size, filt.dtype)
    out = out.at[idx].add(filt.reshape(-1))
    out = out[:num_samples] / max(ola_gain, 1e-12)

    peak = jnp.max(jnp.abs(out))
    scale = jnp.where(peak > 1e-12,
                      1.0 / jnp.maximum(1.0, peak / 0.9), 1.0)
    return out * scale


def synthesize_jax(f0, sp, ap, fs, frame_period=5.0, noise=None, key=None):
    """jax counterpart of :func:`morgana_tpu.vocoder.world.synthesize`
    (single utterance). ``noise``: optional (T*hop,) excitation noise (e.g.
    the host path's seeded numpy draw, for parity); otherwise drawn from
    ``key`` (default PRNGKey(0))."""
    import jax
    import jax.numpy as jnp

    f0 = jnp.asarray(f0, jnp.float32).reshape(-1)
    sp = jnp.atleast_2d(jnp.asarray(sp, jnp.float32))
    ap = jnp.broadcast_to(jnp.atleast_2d(jnp.asarray(ap, jnp.float32)),
                          sp.shape)
    if f0.shape[0] != sp.shape[0]:
        raise ValueError(f'{f0.shape[0]} f0 frames vs {sp.shape[0]} sp rows')
    hop = int(fs * frame_period / 1000.0)
    if hop <= 0:
        raise ValueError(f'frame_period {frame_period} ms at fs {fs} gives '
                         f'a non-positive hop ({hop})')
    fft_size = (sp.shape[-1] - 1) * 2
    num_samples = f0.shape[0] * hop
    if noise is None:
        noise = jax.random.normal(key if key is not None
                                  else jax.random.PRNGKey(0), (num_samples,))
    noise = jnp.asarray(noise, jnp.float32)
    mask = jnp.ones(f0.shape[0], jnp.float32)
    global _JIT_CORE
    if _JIT_CORE is None:
        _JIT_CORE = jax.jit(_core, static_argnums=(5, 6, 7))
    return _JIT_CORE(f0, sp, ap, noise, mask, int(fs), hop, fft_size)


def synthesize_world_feats_jax(f0, vuv, mcep, bap, sample_rate,
                               frame_period=5.0, fft_size=1024,
                               noise=None, key=None):
    """jax counterpart of :func:`world.synthesize_world_feats` (model-space
    features, single utterance)."""
    import jax.numpy as jnp
    f0 = jnp.asarray(f0, jnp.float32).reshape(-1)
    vuv = jnp.asarray(vuv, jnp.float32).reshape(-1)
    mcep = jnp.atleast_2d(jnp.asarray(mcep, jnp.float32))
    bap = jnp.atleast_2d(jnp.asarray(bap, jnp.float32))
    freqt_mat, bap_w = _conversion_constants(
        mcep.shape[-1], bap.shape[-1], fft_size, sample_rate)
    sp = _mcep_to_spectrum_jax(mcep, freqt_mat, fft_size)
    ap = jnp.clip(jnp.exp(bap @ bap_w), 1e-16, 1.0)
    f0 = jnp.where(vuv > 0.5, f0, 0.0)
    return synthesize_jax(f0, sp, ap, sample_rate,
                          frame_period=frame_period, noise=noise, key=key)


def synthesize_batch(f0, vuv, mcep, bap, seq_len, sample_rate,
                     frame_period=5.0, fft_size=1024, noise=None, key=None):
    """Batched on-device synthesis from model-space features.

    Parameters
    ----------
    f0, vuv : (B, T) or (B, T, 1); mcep : (B, T, M); bap : (B, T, Bands)
        Zero-padded to a shared T (the usual model output layout).
    seq_len : (B,) valid frame counts.
    noise : optional (B, T*hop) excitation noise; else drawn from ``key``.

    Returns
    -------
    (waves, wave_lens): (B, T*hop) float32 waveforms (zero beyond each
    utterance's ``seq_len * hop`` samples) and the (B,) sample counts.

    One compiled program per (B, T) signature synthesises the whole batch
    in parallel on the accelerator — the host path loops utterances on a
    CPU core (`benchmarks/bench_vocoder.py` measures the gap).
    """
    import jax
    import jax.numpy as jnp

    f0 = jnp.asarray(f0, jnp.float32)
    vuv = jnp.asarray(vuv, jnp.float32)
    if f0.ndim == 3:
        f0 = f0[..., 0]
    if vuv.ndim == 3:
        vuv = vuv[..., 0]
    mcep = jnp.asarray(mcep, jnp.float32)
    bap = jnp.asarray(bap, jnp.float32)
    seq_len = jnp.asarray(seq_len, jnp.int32).reshape(-1)

    batch, num_frames = f0.shape
    hop = int(sample_rate * frame_period / 1000.0)
    num_samples = num_frames * hop
    if noise is None:
        noise = jax.random.normal(key if key is not None
                                  else jax.random.PRNGKey(0),
                                  (batch, num_samples))
    noise = jnp.asarray(noise, jnp.float32)

    sig = (batch, num_frames, int(mcep.shape[-1]), int(bap.shape[-1]),
           int(sample_rate), hop, fft_size)
    fn = _BATCH_FNS.get(sig)
    if fn is None:
        freqt_mat, bap_w = _conversion_constants(
            int(mcep.shape[-1]), int(bap.shape[-1]), fft_size, sample_rate)

        def one(f0_i, vuv_i, mcep_i, bap_i, len_i, noise_i):
            sp = _mcep_to_spectrum_jax(mcep_i, freqt_mat, fft_size)
            ap = jnp.clip(jnp.exp(bap_i @ bap_w), 1e-16, 1.0)
            voiced_f0 = jnp.where(vuv_i > 0.5, f0_i, 0.0)
            mask = (jnp.arange(num_frames) < len_i).astype(jnp.float32)
            return _core(voiced_f0, sp, ap, noise_i, mask,
                         int(sample_rate), hop, fft_size)

        fn = _BATCH_FNS[sig] = jax.jit(jax.vmap(one))

    waves = fn(f0, vuv, mcep, bap, seq_len, noise)
    return waves, seq_len * hop
