"""Standalone objective evaluation: compare generated features against a
reference set.

The reference framework computes distortion metrics only *inside* a
running experiment (``morgana/metrics.py`` accumulated by each model's
``loss``); once features are on disk there is no tool to score them. This
module evaluates any two directories in the per-utterance feature layout
used everywhere in this framework (``{dir}/{feat}/{utt}.npy`` — data
splits, ``viz.io.save_batched_seqs`` dumps, ``serve``/``pipeline``
outputs) with the SAME metric definitions training logs use
(:mod:`morgana_tpu.metrics`), so offline numbers are directly comparable
to the training-time ones:

* ``lf0``  -> LF0 RMSE in Hz over frames voiced in both (reference
  ``morgana/metrics.py:612-634`` semantics), using each side's ``vuv``
  when present;
* ``mcep`` -> mel-cepstral distortion excluding C0;
* ``bap``  -> band-aperiodicity distortion in dB;
* ``vuv``  -> voicing agreement (%);
* any other common numeric feature -> plain RMSE.

Utterances whose generated length differs from the reference (the normal
case when durations were *predicted*, ``morgana_tpu.pipeline``) are scored
over the first ``min(len_ref, len_gen)`` frames — a deliberate, simple
alignment policy (no DTW), reported alongside a mean length ratio so
duration error stays visible instead of silently truncated away.

CLI::

    python -m morgana_tpu.evaluate --ref_dir data/test \
        --gen_dir tts_out/feats [--id_list data/test/test_file_id_list.scp]

Prints one JSON line of metric -> value.
"""
import argparse
import json
import os

import numpy as np

__all__ = ['evaluate_dirs', 'main']

# Feature name -> metric factory + input builder. Lazily imported so the
# CLI can force the CPU platform before any jax touch.
_KNOWN = ('lf0', 'mcep', 'bap', 'vuv')


def _load(dirpath, feat, utt):
    path = os.path.join(dirpath, feat, f'{utt}.npy')
    if not os.path.exists(path):
        return None
    arr = np.load(path)
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    return arr


def _common_feats(ref_dir, gen_dir):
    def subdirs(d):
        return {name for name in os.listdir(d)
                if os.path.isdir(os.path.join(d, name))}
    return sorted(subdirs(ref_dir) & subdirs(gen_dir))


def evaluate_dirs(ref_dir, gen_dir, file_ids, feats=None):
    """Scores ``gen_dir`` against ``ref_dir`` over ``file_ids``.

    ``feats`` restricts evaluation to those feature names (default: every
    feature subdirectory present in BOTH directories). Returns a dict of
    results including ``utterances`` and ``mean_length_ratio``
    (gen frames / ref frames). Raises if nothing could be compared.
    """
    from morgana_tpu import metrics as metrics_mod

    if feats is None:
        # Default: the metrics with meaningful definitions. Inputs like
        # 'lab'/'counters' also live in both layouts but comparing them is
        # noise — score other features only when named explicitly.
        feats = [f for f in _common_feats(ref_dir, gen_dir) if f in _KNOWN]
    if not feats:
        raise ValueError(f'no common scoreable feature subdirectories '
                         f'between {ref_dir} and {gen_dir} '
                         f'(known: {list(_KNOWN)}; pass feats=... to score '
                         f'others with plain RMSE)')

    accs = {}
    for feat in feats:
        if feat == 'lf0':
            accs[feat] = ('LF0_RMSE_Hz', metrics_mod.LF0Distortion())
        elif feat == 'mcep':
            accs[feat] = ('MCEP_distortion', metrics_mod.MelCepDistortion())
        elif feat == 'bap':
            accs[feat] = ('BAP_distortion_dB', metrics_mod.Distortion())
        elif feat == 'vuv':
            accs[feat] = ('VUV_agreement_pct', metrics_mod.Mean())
        else:
            accs[feat] = (f'{feat}_RMSE', metrics_mod.RMSE())

    ratios = []
    compared = {feat: 0 for feat in feats}
    for utt in file_ids:
        lens = []
        pairs = {}
        for feat in feats:
            ref = _load(ref_dir, feat, utt)
            gen = _load(gen_dir, feat, utt)
            if ref is None or gen is None:
                continue
            pairs[feat] = (ref, gen)
            lens.append((gen.shape[0], ref.shape[0]))
        if not pairs:
            continue
        gen_frames = max(g for g, _ in lens)
        ref_frames = max(r for _, r in lens)
        if ref_frames:
            ratios.append(gen_frames / ref_frames)

        # Both-voiced masking for lf0 uses each side's own vuv when present.
        ref_vuv = _load(ref_dir, 'vuv', utt)
        gen_vuv = _load(gen_dir, 'vuv', utt)

        for feat, (ref, gen) in pairs.items():
            n = min(ref.shape[0], gen.shape[0])
            if n == 0 or ref.shape[1:] != gen.shape[1:]:
                continue
            ref_b, gen_b = ref[None, :n], gen[None, :n]
            name, metric = accs[feat]
            if feat == 'lf0':
                voiced = np.ones((1, n, 1), np.float32)
                if ref_vuv is not None:
                    voiced = voiced * (ref_vuv[None, :n] > 0.5)
                if gen_vuv is not None:
                    voiced = voiced * (gen_vuv[None, :n] > 0.5)
                metric.accumulate(ref_b, gen_b, voiced)
            elif feat == 'vuv':
                agree = ((ref_b > 0.5) == (gen_b > 0.5)).astype(np.float32)
                metric.accumulate(agree)
            else:
                metric.accumulate(ref_b, gen_b)
            compared[feat] += 1

    results = {}
    for feat, (name, metric) in accs.items():
        if compared[feat]:
            value = float(metric.result())
            if feat == 'vuv':
                value *= 100.0
            results[name] = round(value, 6)
            results[f'{name}_utterances'] = compared[feat]
    if not results:
        raise ValueError(
            f'no comparable utterances: checked {len(file_ids)} ids over '
            f'features {feats} in {ref_dir} vs {gen_dir}')
    results['utterances'] = len(ratios)
    if ratios:
        results['mean_length_ratio'] = round(float(np.mean(ratios)), 4)
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Objective evaluation of generated features against a '
                    'reference directory (same metric definitions as '
                    'training logs).')
    parser.add_argument('--ref_dir', required=True,
                        help='Reference features: {ref_dir}/{feat}/{utt}.npy '
                             '(e.g. a data split directory).')
    parser.add_argument('--gen_dir', required=True,
                        help='Generated features in the same layout (e.g. '
                             "a pipeline/serve run's feats/ directory).")
    parser.add_argument('--id_list', default=None,
                        help='Id-list file; defaults to every utterance '
                             'present in the first common feature dir.')
    parser.add_argument('--feats', default=None,
                        help='Comma-separated feature names (default: every '
                             'feature directory common to both).')
    args = parser.parse_args(argv)

    # Host-side tool: never initialise an accelerator backend.
    from morgana_tpu import platform as _platform
    _platform.force_cpu()

    if args.id_list:
        from morgana_tpu.data import file_io
        ids = file_io.get_file_ids(args.id_list)
    else:
        # Discover ids from a scoreable (.npy-bearing) common feature dir —
        # NOT simply the alphabetically first common dir: data splits keep
        # 'dur' as .txt files, which would yield zero ids.
        feats = _common_feats(args.ref_dir, args.gen_dir)
        ids = []
        for feat in [f for f in feats if f in _KNOWN] + feats:
            ids = sorted(os.path.splitext(f)[0] for f in
                         os.listdir(os.path.join(args.ref_dir, feat))
                         if f.endswith('.npy'))
            if ids:
                break
        if not ids:
            parser.error(f'no .npy utterances found in any common feature '
                         f'subdirectory of {args.ref_dir} and '
                         f'{args.gen_dir} (common: {feats})')
    feats = args.feats.split(',') if args.feats else None
    print(json.dumps(evaluate_dirs(args.ref_dir, args.gen_dir, ids,
                                   feats=feats)))


if __name__ == '__main__':
    main()
