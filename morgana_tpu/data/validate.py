"""Corpus validation: lint a dataset against a model's data contract.

``python -m morgana_tpu.data.validate --model file.py:Class --data_root data
--data_dir train`` checks everything the training run would otherwise
discover as a mid-epoch crash (or worse, silently mis-train on):

* the id list exists, is non-empty and duplicate-free;
* every id has a file for every data source, and each file loads;
* per-source feature dimensions are consistent across utterances, values
  are finite;
* frame-rate/phone-rate length relationships hold per utterance
  (``n_frames`` matches frame-level sources; ``sum(dur)`` matches
  ``n_frames`` — the upsample contract, ``morgana/utils.py:175-228``);
* normaliser parameter files exist (``{name}_mvn.json`` /
  ``{name}_minmax.json``, per-speaker files for speaker-dependent
  normalisers — the JSON contract of ``morgana/data.py:252-386``), load,
  are finite, match the data's feature dims, and still describe the data
  (sampled-stats drift check).

The reference has no equivalent tool: its failure mode for all of the above
is a runtime exception deep in ``FilesDataset.__getitem__`` / ``collate_fn``
(``morgana/data.py:106-224``) or a silently mis-scaled feature.

Exit code 0 = clean (warnings allowed), 1 = errors found.
"""
import argparse
import json
import os
import sys

import numpy as np

__all__ = ['validate_corpus', 'format_report', 'main']

# Sampled-stats drift thresholds (warnings, not errors: small samples and
# genuinely non-stationary corpora drift without being broken).
_MVN_DRIFT_SIGMA = 1.0
_MINMAX_TOLERANCE = 0.1  # fraction of the fitted range


class _Report(object):
    def __init__(self):
        self.errors = []
        self.warnings = []
        self.info = []

    def error(self, msg):
        self.errors.append(msg)

    def warn(self, msg):
        self.warnings.append(msg)

    def ok(self, msg):
        self.info.append(msg)

    def as_dict(self):
        return {'errors': self.errors, 'warnings': self.warnings,
                'checks': self.info, 'num_errors': len(self.errors),
                'num_warnings': len(self.warnings)}


def _short(ids, limit=5):
    ids = list(ids)
    head = ', '.join(str(i) for i in ids[:limit])
    return head + (f', … ({len(ids)} total)' if len(ids) > limit else '')


def _load_ids(report, data_root, id_list):
    from morgana_tpu.data import file_io
    path = os.path.join(data_root, id_list)
    if not os.path.isfile(path):
        report.error(f'id list not found: {path}')
        return []
    ids = file_io.get_file_ids(path)
    if not ids:
        report.error(f'id list is empty: {path}')
        return []
    seen, dupes = set(), set()
    for i in ids:
        (dupes if i in seen else seen).add(i)
    if dupes:
        report.error(f'id list has duplicate ids: {_short(sorted(dupes))}')
    report.ok(f'id list: {len(ids)} ids ({path})')
    return ids


def _check_files_present(report, sources, ids, data_dir):
    """Existence sweep over the full id list (cheap: stat only)."""
    all_present = True
    for name, source in sources.items():
        missing = [i for i in ids
                   if not os.path.isfile(source.file_path(i, data_dir))]
        if missing:
            all_present = False
            report.error(f"source '{name}': {len(missing)} missing file(s) "
                         f'under {os.path.join(data_dir, source.name)}: '
                         f'{_short(missing)}')
    if all_present:
        report.ok(f'files: {len(sources)} sources x {len(ids)} ids all present')
    return all_present


def _load_features(report, sources, uid, data_dir):
    """Loads every source for one id; returns None on any failure."""
    feats = {}
    for name, source in sources.items():
        if not os.path.isfile(source.file_path(uid, data_dir)):
            return None  # already reported by the existence sweep
        try:
            feats.update(source(uid, data_dir))
        except Exception as exc:  # noqa: BLE001 - report, don't crash the lint
            report.error(f"source '{name}': {uid} failed to load: {exc}")
            return None
    return feats


def _is_sequence(source, value):
    return (not source.sentence_level and isinstance(value, np.ndarray)
            and value.ndim >= 1 and np.issubdtype(value.dtype, np.number))


def _check_content(report, sources, ids, data_dir):
    """Load + finite + dim-consistency + length-relationship checks over the
    sampled ids. Returns per-source stats accumulators for the normaliser
    drift check: {source_name: [per-utterance 2-d arrays]}."""
    dims = {}         # source name -> trailing feature dim seen first
    collected = {}
    records = []      # (uid, seq_lens, n_frames, dur_len, frames_from_dur)
    nonfinite, load_failures, length_errors = [], [], 0

    for uid in ids:
        feats = _load_features(report, sources, uid, data_dir)
        if feats is None:
            load_failures.append(uid)
            continue

        n_frames = None
        if 'n_frames' in feats and sources.get('n_frames') is not None \
                and sources['n_frames'].sentence_level:
            n_frames = int(np.asarray(feats['n_frames']).reshape(-1)[0])
        dur_len = frames_from_dur = None
        if 'dur' in sources and 'dur' in feats:
            dur = np.asarray(feats['dur'])
            if _is_sequence(sources['dur'], dur):
                dur_len = dur.shape[0]
                frames_from_dur = int(np.asarray(dur, np.float64).sum())

        seq_lens = {}
        for name, source in sources.items():
            value = feats.get(name)
            if not isinstance(value, np.ndarray):
                continue
            if np.issubdtype(value.dtype, np.floating) \
                    and not np.isfinite(value).all():
                nonfinite.append((name, uid))
            if _is_sequence(source, value):
                seq_lens[name] = value.shape[0]
                dim = value.shape[-1] if value.ndim >= 2 else 1
                if name not in dims:
                    dims[name] = dim
                elif dims[name] != dim:
                    report.error(f"source '{name}': inconsistent feature dim "
                                 f'({uid} has {dim}, previously {dims[name]})')
                    continue  # keep the stats pool single-dim
                collected.setdefault(name, [])
                if len(collected[name]) < 64:  # bound the stats memory
                    collected[name].append(
                        np.asarray(value, np.float64).reshape(-1, dim))
        records.append((uid, seq_lens, n_frames, dur_len, frames_from_dur))

    # Classify each sequence source by MAJORITY vote across the sample —
    # frame-level (length == n_frames) or phone-level (length == dur's
    # phone count) — so one corrupted utterance cannot mislabel a source
    # (classifying on the first id alone would blind the check whenever
    # the first id happens to be the broken one).
    votes = {}
    for _, seq_lens, n_frames, dur_len, _ in records:
        for name, length in seq_lens.items():
            if name == 'dur':
                continue
            tally = votes.setdefault(name,
                                     {'frames': 0, 'phones': 0, None: 0})
            if n_frames is not None and length == n_frames:
                tally['frames'] += 1
            elif dur_len is not None and length == dur_len:
                tally['phones'] += 1
            else:
                tally[None] += 1
    roles = {name: max(tally, key=tally.get)
             for name, tally in votes.items()}

    for uid, seq_lens, n_frames, dur_len, frames_from_dur in records:
        for name, length in seq_lens.items():
            expect = None
            if roles.get(name) == 'frames' and n_frames is not None:
                expect = ('n_frames', n_frames)
            elif roles.get(name) == 'phones' and dur_len is not None:
                expect = ("dur's phone count", dur_len)
            if expect and length != expect[1]:
                report.error(f'length mismatch: {uid}: {name} has {length} '
                             f'rows but {expect[0]} says {expect[1]}')
                length_errors += 1
        if n_frames is not None and frames_from_dur is not None \
                and frames_from_dur != n_frames:
            report.error(f'duration mismatch: {uid}: sum(dur) = '
                         f'{frames_from_dur} but n_frames = {n_frames} '
                         '(upsample_to_repetitions would misalign)')
            length_errors += 1

    if nonfinite:
        by_source = {}
        for name, uid in nonfinite:
            by_source.setdefault(name, []).append(uid)
        for name, uids in sorted(by_source.items()):
            report.error(f"source '{name}': non-finite values in "
                         f'{_short(uids)}')
    if not (nonfinite or load_failures or length_errors):
        report.ok(f'content: {len(ids)} sampled ids load cleanly, dims '
                  'consistent, lengths agree, all values finite')
    return collected, dims


def _param_file(norm, data_root, norm_dir, name, speaker_id=None):
    pattern = norm.file_pattern.format(
        name=name, **({'speaker_id': speaker_id} if speaker_id else {}))
    return os.path.join(data_root, norm_dir, pattern)


def _check_param_content(report, path, params, expect_dim, label):
    for key, value in params.items():
        arr = np.asarray(value, np.float64)
        if not np.isfinite(arr).all():
            report.error(f'{label}: non-finite {key} in {path}')
        if expect_dim is not None and arr.size not in (1, expect_dim):
            report.error(f'{label}: {key} has {arr.size} entries but the '
                         f'data has {expect_dim} feature dims ({path})')
    if 'std_dev' in params and np.any(np.asarray(params['std_dev']) <= 0):
        report.warn(f'{label}: std_dev has zero/negative entries — those '
                    f'dims will not be scaled ({path})')
    if 'mmin' in params and 'mmax' in params and np.any(
            np.asarray(params['mmax']) <= np.asarray(params['mmin'])):
        report.warn(f'{label}: mmax <= mmin on some dims — zero-range guard '
                    f'will pass those through unscaled ({path})')


def _check_drift(report, params, samples, label):
    """Sampled-stats drift: do the fitted params still describe this data?"""
    stacked = np.concatenate(samples, axis=0)
    sizes = {np.asarray(v).size for v in params.values()}
    if not sizes <= {1, stacked.shape[1]}:
        return  # dim mismatch already reported by _check_param_content
    if 'mean' in params and 'std_dev' in params:
        mean = np.asarray(params['mean'], np.float64).reshape(-1)
        std = np.maximum(np.asarray(params['std_dev'],
                                    np.float64).reshape(-1), 1e-8)
        drift = np.abs(stacked.mean(0) - mean) / std
        worst = float(drift.max())
        if worst > _MVN_DRIFT_SIGMA:
            report.warn(f'{label}: sampled mean drifts {worst:.2f} sigma '
                        f'from the fitted params (dim {int(drift.argmax())})'
                        ' — refit or confirm the params match this corpus')
    if 'mmin' in params and 'mmax' in params:
        mmin = np.asarray(params['mmin'], np.float64).reshape(-1)
        mmax = np.asarray(params['mmax'], np.float64).reshape(-1)
        span = np.maximum(mmax - mmin, 1e-8)
        below = (mmin - stacked.min(0)) / span
        above = (stacked.max(0) - mmax) / span
        worst = float(np.maximum(below, above).max())
        if worst > _MINMAX_TOLERANCE:
            report.warn(f'{label}: sampled values exceed the fitted min/max '
                        f'range by {worst:.0%} of the range — normalised '
                        'features will leave [0, 1]; refit or confirm')


def _check_normalisers(report, model, sources, data_root, norm_dir,
                       collected, dims):
    from morgana_tpu.data.normalisers import _SpeakerDependentNormaliser
    normalisers = model.normaliser_sources()
    if not normalisers:
        return
    clean = True
    for name, norm in normalisers.items():
        source = sources.get(name)
        if source is not None and norm.use_deltas and not source.use_deltas:
            report.error(f"normaliser '{name}': use_deltas=True but the "
                         "data source has use_deltas=False — FilesDataset "
                         'will reject this pairing')
            clean = False
        speaker_ids = [None]
        if isinstance(norm, _SpeakerDependentNormaliser):
            id_path = os.path.join(data_root, norm.speaker_id_list)
            if not os.path.isfile(id_path):
                report.error(f"normaliser '{name}': speaker id list not "
                             f'found: {id_path}')
                clean = False
                continue
            from morgana_tpu.data import file_io
            speaker_ids = file_io.get_file_ids(id_path)

        names = [name] + ([f'{name}_deltas'] if norm.use_deltas else [])
        for pname in names:
            expect = dims.get(name)
            if expect is not None and pname.endswith('_deltas'):
                expect = 3 * expect
            for speaker in speaker_ids:
                path = _param_file(norm, data_root, norm_dir, pname, speaker)
                label = f"normaliser '{pname}'" + (
                    f' (speaker {speaker})' if speaker else '')
                if not os.path.isfile(path):
                    report.error(f'{label}: params file not found: {path}')
                    clean = False
                    continue
                try:
                    from morgana_tpu.data import file_io
                    params = file_io.load_json(path)
                except Exception as exc:  # noqa: BLE001
                    report.error(f'{label}: params file unreadable: {exc}')
                    clean = False
                    continue
                _check_param_content(report, path, params, expect, label)
                if speaker is None and not pname.endswith('_deltas') \
                        and collected.get(name):
                    _check_drift(report, params, collected[name], label)
    if clean:
        report.ok(f'normalisers: {len(normalisers)} param sets present and '
                  'well-formed')


def validate_corpus(model, data_root, data_dir, id_list=None,
                    normalisation_dir='train', sources='train', sample=256,
                    seed=0):
    """Validates ``{data_root}/{data_dir}`` against ``model``'s data contract.

    ``sources`` picks the data-source spec ('train' | 'valid' | 'test' —
    test specs usually omit targets, matching what generation needs on
    disk). ``sample`` bounds how many utterances get fully loaded for the
    content checks (file existence is always checked for every id).
    Returns a report dict; ``num_errors == 0`` means the corpus would not
    crash the corresponding run.
    """
    report = _Report()
    source_spec = {
        'train': model.train_data_sources,
        'valid': model.valid_data_sources,
        'test': model.test_data_sources,
    }[sources]()
    full_dir = os.path.join(data_root, data_dir)
    if not os.path.isdir(full_dir):
        report.error(f'data dir not found: {full_dir}')
        return report.as_dict()

    id_list = id_list or os.path.join(
        data_dir, f'{data_dir}_file_id_list.scp')
    ids = _load_ids(report, data_root, id_list)
    if not ids:
        return report.as_dict()

    _check_files_present(report, source_spec, ids, full_dir)

    sampled = ids
    if sample and len(ids) > sample:
        rng = np.random.default_rng(seed)
        sampled = [ids[i] for i in sorted(
            rng.choice(len(ids), size=sample, replace=False))]
        report.ok(f'content checks sampled {sample} of {len(ids)} ids')
    collected, dims = _check_content(report, source_spec, sampled, full_dir)

    _check_normalisers(report, model, source_spec, data_root,
                       normalisation_dir, collected, dims)
    return report.as_dict()


def format_report(result):
    lines = []
    for msg in result['checks']:
        lines.append(f'[ok] {msg}')
    for msg in result['warnings']:
        lines.append(f'[warning] {msg}')
    for msg in result['errors']:
        lines.append(f'[error] {msg}')
    lines.append(f"Summary: {result['num_errors']} error(s), "
                 f"{result['num_warnings']} warning(s)")
    return '\n'.join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Validate a corpus against a model\'s data contract '
                    '(files, shapes, lengths, normaliser params).')
    parser.add_argument('--model', required=True,
                        help="'module:Class' or 'path/to/file.py:Class'")
    parser.add_argument('--model_kwargs', default='{}',
                        help='Python dict literal of model constructor kwargs.')
    parser.add_argument('--data_root', default='data')
    parser.add_argument('--data_dir', default='train',
                        help='Sub-directory of --data_root to validate.')
    parser.add_argument('--id_list', default=None,
                        help='Id list path relative to --data_root '
                             '(default: {data_dir}/{data_dir}_file_id_list.scp).')
    parser.add_argument('--sources', default=None,
                        choices=('train', 'valid', 'test'),
                        help='Which data-source spec to validate against '
                             '(default: --data_dir when it names a split, '
                             'else train).')
    parser.add_argument('--normalisation_dir', default='train')
    parser.add_argument('--sample', type=int, default=256,
                        help='Max utterances fully loaded for content checks '
                             '(file existence always covers every id).')
    parser.add_argument('--json', default=None,
                        help='Also write the machine-readable report here.')
    args = parser.parse_args(argv)

    # Host-side tool: never initialise an accelerator backend (delta
    # expansion in the sources may otherwise dispatch to a tunnelled TPU).
    from morgana_tpu import platform as _platform
    _platform.force_cpu()

    import ast
    from morgana_tpu.serve import load_model_class
    model_class = load_model_class(args.model)
    model = model_class(**ast.literal_eval(args.model_kwargs))

    sources = args.sources or (
        args.data_dir if args.data_dir in ('train', 'valid', 'test')
        else 'train')
    result = validate_corpus(
        model, args.data_root, args.data_dir, id_list=args.id_list,
        normalisation_dir=args.normalisation_dir, sources=sources,
        sample=args.sample)
    print(format_report(result))
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(result, f, indent=2)
    return 1 if result['num_errors'] else 0


if __name__ == '__main__':
    sys.exit(main())
