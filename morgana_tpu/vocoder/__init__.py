"""WORLD-style vocoder: waveform synthesis from (f0, spectral envelope,
aperiodicity) and mel-cepstrum conversions.

Replaces the reference's external C++ vocoder stack (pyworld
``models/f0_test_model.py:136`` and tts_data_tools
``world_with_reaper_f0.synthesis``, ``models/RNN_SPSS.py:160``). Two
implementations with identical semantics:

* a native C++ library (``csrc/world_synth.cpp``) loaded via ctypes — the
  production path for host-side post-processing;
* a NumPy fallback used when the shared library has not been built;
* an on-device jax implementation (``jax_world``, lazily imported) that
  synthesises a whole batch of utterances as ONE compiled XLA program on
  the accelerator (``synthesize_batch`` / ``synthesize_world_feats_jax``)
  — see ``benchmarks/bench_vocoder.py`` for the host-vs-device numbers.

Synthesis model: per-frame excitation (glottal pulses at f0, white noise for
the aperiodic band) filtered by the minimum-phase reconstruction of the
spectral envelope, overlap-added — the same pulse/noise + minimum-phase
scheme WORLD uses.
"""
from morgana_tpu.vocoder.world import (
    synthesize, synthesize_world_feats, smooth_f0,
    mcep_to_spectrum, spectrum_to_mcep, bap_to_aperiodicity, native_available,
    StreamingSynthesizer,
)
from morgana_tpu.vocoder.analysis import (
    analyze, estimate_f0, spectral_envelope, band_aperiodicity,
    features_from_wav,
)

__all__ = [
    'synthesize', 'synthesize_world_feats', 'smooth_f0',
    'mcep_to_spectrum', 'spectrum_to_mcep', 'bap_to_aperiodicity',
    'native_available', 'StreamingSynthesizer',
    'analyze', 'estimate_f0', 'spectral_envelope',
    'band_aperiodicity', 'features_from_wav',
]
