"""Golden-fixture gate for the in-repo WORLD vocoder vs the real pyworld
toolchain (the reference's synthesis chain, ``models/RNN_SPSS.py:160``
calls ``tts_data_tools...world_with_reaper_f0.synthesis``).

pyworld cannot be installed in this environment, so these tests SKIP until
externally generated fixtures are dropped into
``tests/fixtures/world_golden/<case>/`` — layout and generation recipe in
that directory's README.md. No code changes are needed to activate them
(round-3 verdict item 6: label and fence the vocoder-fidelity assumption).
"""
import os

import numpy as np
import pytest

FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'fixtures', 'world_golden')


def _cases():
    if not os.path.isdir(FIXTURE_ROOT):
        return []
    return sorted(
        name for name in os.listdir(FIXTURE_ROOT)
        if os.path.isdir(os.path.join(FIXTURE_ROOT, name))
        and os.path.isfile(os.path.join(FIXTURE_ROOT, name, 'features.npz'))
        and os.path.isfile(os.path.join(FIXTURE_ROOT, name, 'golden.wav')))


def _load_case(name):
    case_dir = os.path.join(FIXTURE_ROOT, name)
    with np.load(os.path.join(case_dir, 'features.npz')) as z:
        feats = {k: z[k] for k in z.files}
    from morgana_tpu.data import file_io
    golden, fs = file_io.load_wav(os.path.join(case_dir, 'golden.wav'))
    assert int(fs) == int(feats['fs']), \
        f'{name}: golden.wav fs {fs} != features fs {feats["fs"]}'
    golden = np.asarray(golden, np.float64) / 2.0 ** 15
    source = None
    source_path = os.path.join(case_dir, 'source.wav')
    if os.path.isfile(source_path):
        source, _ = file_io.load_wav(source_path)
        source = np.asarray(source, np.float64) / 2.0 ** 15
    return feats, golden, source


def _log_spec_distance_db(a, b, fs, frame_len=1024, hop=256):
    """Mean frame-wise log-magnitude-spectral distance (dB) over the
    common length."""
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    frames = max(1, (n - frame_len) // hop)
    win = np.hanning(frame_len)
    dists = []
    for i in range(frames):
        seg_a = a[i * hop:i * hop + frame_len] * win
        seg_b = b[i * hop:i * hop + frame_len] * win
        mag_a = np.abs(np.fft.rfft(seg_a)) + 1e-8
        mag_b = np.abs(np.fft.rfft(seg_b)) + 1e-8
        d = 20.0 * (np.log10(mag_a) - np.log10(mag_b))
        dists.append(np.sqrt(np.mean(d ** 2)))
    return float(np.mean(dists))


CASES = _cases()


@pytest.mark.skipif(not CASES, reason='no WORLD golden fixtures present '
                    '(see tests/fixtures/world_golden/README.md)')
@pytest.mark.parametrize('case', CASES)
class TestWorldGolden:
    def test_synthesis_matches_pyworld(self, case):
        from morgana_tpu.vocoder import world

        feats, golden, _ = _load_case(case)
        fs = int(feats['fs'])
        ours = np.asarray(world.synthesize(
            feats['f0'], feats['sp'], feats['ap'], fs,
            frame_period=float(feats['frame_period'])), np.float64)

        hop = int(fs * float(feats['frame_period']) / 1000.0)
        assert abs(len(ours) - len(golden)) <= hop, \
            (len(ours), len(golden), hop)

        rms_ours = float(np.sqrt(np.mean(ours ** 2)) + 1e-12)
        rms_gold = float(np.sqrt(np.mean(golden ** 2)) + 1e-12)
        ratio = rms_ours / rms_gold
        assert 0.5 <= ratio <= 2.0, f'RMS ratio {ratio:.3f}'

        lsd = _log_spec_distance_db(ours, golden, fs)
        assert lsd < 10.0, f'log-spectral distance {lsd:.2f} dB'

    def test_resynthesis_f0_matches_pyworld(self, case):
        from morgana_tpu.vocoder import analysis, world

        feats, golden, _ = _load_case(case)
        fs = int(feats['fs'])
        fp = float(feats['frame_period'])
        ours = np.asarray(world.synthesize(
            feats['f0'], feats['sp'], feats['ap'], fs, frame_period=fp),
            np.float64)
        f0_ours, _ = analysis.estimate_f0(ours, fs, frame_period=fp)
        f0_gold, _ = analysis.estimate_f0(golden, fs, frame_period=fp)
        f0_ours, f0_gold = np.asarray(f0_ours), np.asarray(f0_gold)
        n = min(len(f0_ours), len(f0_gold))
        f0_ours, f0_gold = f0_ours[:n], f0_gold[:n]
        voiced_agree = np.mean((f0_ours > 0) == (f0_gold > 0))
        assert voiced_agree >= 0.9, f'V/UV agreement {voiced_agree:.3f}'
        both = (f0_ours > 0) & (f0_gold > 0)
        if both.any():
            med = float(np.median(np.abs(f0_ours[both] - f0_gold[both])))
            assert med < 10.0, f'median voiced |df0| {med:.2f} Hz'

    def test_analysis_matches_pyworld(self, case):
        from morgana_tpu.vocoder import analysis

        feats, _, source = _load_case(case)
        if source is None:
            pytest.skip(f'{case} has no source.wav (analysis side optional)')
        fs = int(feats['fs'])
        fp = float(feats['frame_period'])
        _f0, sp_ours, _ap = analysis.analyze(np.asarray(source, np.float64),
                                             fs, frame_period=fp)
        sp_gold = np.asarray(feats['sp'])
        n = min(len(sp_ours), len(sp_gold))
        # Resample our envelope onto pyworld's bin count if fft sizes differ.
        a = np.asarray(sp_ours)[:n]
        b = sp_gold[:n]
        if a.shape[1] != b.shape[1]:
            x_old = np.linspace(0.0, 1.0, a.shape[1])
            x_new = np.linspace(0.0, 1.0, b.shape[1])
            a = np.stack([np.interp(x_new, x_old, row) for row in a])
        d = 10.0 * (np.log10(a + 1e-10) - np.log10(b + 1e-10))
        lsd = float(np.mean(np.sqrt(np.mean(d ** 2, axis=1))))
        assert lsd < 12.0, f'analysis log-spectral distance {lsd:.2f} dB'


def test_fixture_discovery_contract(tmp_path, monkeypatch):
    """The discovery helper itself: an empty root yields no cases (the
    suite skips), and a well-formed case directory is found."""
    import test_world_golden as mod

    monkeypatch.setattr(mod, 'FIXTURE_ROOT', str(tmp_path))
    assert mod._cases() == []
    case = tmp_path / 'caseA'
    case.mkdir()
    assert mod._cases() == []          # incomplete case: no files yet
    np.savez(case / 'features.npz', f0=np.zeros(3))
    (case / 'golden.wav').write_bytes(b'RIFF')
    assert mod._cases() == ['caseA']


def test_metric_path_self_consistent(tmp_path, monkeypatch):
    """Harness validity without pyworld: a case whose golden.wav IS our own
    vocoder's output must pass every fixture metric — proving the loaders,
    scaling and distance math work end-to-end, so dropped-in pyworld
    fixtures exercise a functioning gate."""
    import test_world_golden as mod
    from morgana_tpu.data import file_io
    from morgana_tpu.vocoder import analysis, world

    fs, fp = 16000, 5.0
    t = np.arange(int(0.6 * fs)) / fs
    # A vowel-like source: f0 120 Hz with two formant-ish partials.
    wav = (0.4 * np.sin(2 * np.pi * 120 * t)
           + 0.2 * np.sin(2 * np.pi * 720 * t)
           + 0.1 * np.sin(2 * np.pi * 1240 * t))
    f0, sp, ap = analysis.analyze(wav, fs, frame_period=fp)
    golden = np.asarray(world.synthesize(f0, sp, ap, fs, frame_period=fp))

    case = tmp_path / 'self'
    case.mkdir()
    np.savez(case / 'features.npz', f0=f0, sp=sp, ap=ap, fs=fs,
             frame_period=fp)
    file_io.save_wav(np.clip(golden * 2.0 ** 15, -2 ** 15,
                             2 ** 15 - 1).astype(np.int16),
                     str(case / 'golden.wav'), fs)
    file_io.save_wav(np.clip(wav * 2.0 ** 15, -2 ** 15,
                             2 ** 15 - 1).astype(np.int16),
                     str(case / 'source.wav'), fs)

    monkeypatch.setattr(mod, 'FIXTURE_ROOT', str(tmp_path))
    assert mod._cases() == ['self']
    suite = mod.TestWorldGolden()
    suite.test_synthesis_matches_pyworld('self')
    suite.test_resynthesis_f0_matches_pyworld('self')
    suite.test_analysis_matches_pyworld('self')
