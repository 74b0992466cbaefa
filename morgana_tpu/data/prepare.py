"""Voice data preparation: raw wavs (+ optional label files) -> the on-disk
training dataset layout.

The reference delegated this to the external tts_data_tools scripts; here it
is a single command::

    python -m morgana_tpu.data.prepare --wav_dir wavs --out_dir data \
        [--lab_dir labs] [--valid_fraction 0.1] [--test_fraction 0.1]

For every wav: extract lf0/vuv/mcep/bap (:mod:`morgana_tpu.vocoder.analysis`),
write ``n_frames``; copy phone-level ``lab``/``dur`` files when a label dir is
given; build frame-position ``counters``; split ids into train/valid/test;
fit and write the normalisation parameter JSONs the models expect.
"""
import argparse
import os

import numpy as np

from morgana_tpu.data import file_io
from morgana_tpu.data.normalisers import fit_mvn_params, fit_minmax_params
from morgana_tpu.ops.deltas import compute_deltas

__all__ = ['prepare_voice', 'fit_durations', 'main']


def fit_durations(dur, n_frames, utt_id=''):
    """Clips/pads phone durations so they sum EXACTLY to the analysed frame
    count. Excess frames are trimmed from the last phones backwards, keeping
    every phone >= 1 frame, so the invariant holds even when the excess
    exceeds the final phone's duration; a shortfall pads the final phone."""
    dur = np.asarray(dur, np.int64).copy()
    total = int(dur.sum())
    if total > n_frames:
        excess = total - n_frames
        for i in range(len(dur) - 1, -1, -1):
            take = min(excess, int(dur[i]) - 1)
            dur[i] -= take
            excess -= take
            if excess == 0:
                break
        if excess:
            raise ValueError(f'{utt_id}: label has more phones ({len(dur)}) '
                             f'than analysed frames ({n_frames})')
    elif total < n_frames:
        dur[-1] += n_frames - total
    return dur


def _frame_counters(n_frames, dur=None):
    """Frame-position counter features (9-dim, matching the reference models'
    'counters' input): global position fwd/bwd/frac + within-phone position
    fwd/bwd/frac + phone index fwd/bwd/frac (zeros when durations unknown)."""
    t = np.arange(n_frames, dtype=np.float32)
    cols = [t, n_frames - 1 - t, t / max(n_frames - 1, 1)]
    if dur is not None:
        phone_idx = np.repeat(np.arange(len(dur)), dur)[:n_frames]
        start = np.repeat(np.cumsum(dur) - dur, dur)[:n_frames]
        within = t - start
        dur_per_frame = np.repeat(dur, dur)[:n_frames].astype(np.float32)
        cols += [within, dur_per_frame - 1 - within,
                 within / np.maximum(dur_per_frame - 1, 1),
                 phone_idx.astype(np.float32),
                 len(dur) - 1 - phone_idx.astype(np.float32),
                 phone_idx / max(len(dur) - 1, 1)]
    else:
        cols += [np.zeros(n_frames, np.float32)] * 6
    return np.stack(cols, axis=1).astype(np.float32)


def prepare_voice(wav_dir, out_dir, lab_dir=None, sample_rate=None,
                  valid_fraction=0.1, test_fraction=0.1, frame_period=5.0,
                  fft_size=1024, mcep_order=59, num_bands=5, seed=0):
    r"""Prepares a complete voice dataset. Returns the per-split id lists."""
    wav_files = sorted(f for f in os.listdir(wav_dir) if f.endswith('.wav'))
    if not wav_files:
        raise FileNotFoundError(f'no .wav files in {wav_dir}')

    rng = np.random.default_rng(seed)
    ids = [os.path.splitext(f)[0] for f in wav_files]
    order = rng.permutation(len(ids))
    n_valid = max(1, int(len(ids) * valid_fraction)) if len(ids) > 2 else 0
    n_test = max(1, int(len(ids) * test_fraction)) if len(ids) > 2 else 0
    split_of = {}
    for rank, idx in enumerate(order):
        if rank < n_valid:
            split_of[ids[idx]] = 'valid'
        elif rank < n_valid + n_test:
            split_of[ids[idx]] = 'test'
        else:
            split_of[ids[idx]] = 'train'

    id_lists = {'train': [], 'valid': [], 'test': []}
    norm_feats = {}

    for utt_id, wav_file in zip(ids, wav_files):
        split = split_of[utt_id]
        id_lists[split].append(utt_id)
        split_dir = os.path.join(out_dir, split)

        wav, sr = file_io.load_wav(os.path.join(wav_dir, wav_file))
        wav = wav.astype(np.float64) / 32767.0
        if sample_rate is not None and sr != sample_rate:
            raise ValueError(f'{wav_file}: sample rate {sr} != {sample_rate}')

        from morgana_tpu.vocoder import features_from_wav
        feats = features_from_wav(wav, sr, frame_period=frame_period,
                                  fft_size=fft_size, mcep_order=mcep_order,
                                  num_bands=num_bands)
        n_frames = int(feats['n_frames'][0])

        dur = None
        if lab_dir is not None:
            lab_path = os.path.join(lab_dir, f'{utt_id}.npy')
            dur_path = os.path.join(lab_dir, f'{utt_id}.dur')
            if os.path.exists(lab_path):
                lab = np.load(lab_path).astype(np.float32)
                file_io.save_bin(lab, os.path.join(split_dir, 'lab', f'{utt_id}.npy'))
                if split == 'train':
                    norm_feats.setdefault('lab', []).append(lab)
            if os.path.exists(dur_path):
                dur = np.loadtxt(dur_path, dtype=np.int64).reshape(-1)
                dur = fit_durations(dur, n_frames, utt_id)
                file_io.save_txt(dur[:, None], os.path.join(split_dir, 'dur', f'{utt_id}.txt'))
                file_io.save_txt(np.array([[len(dur)]]),
                                 os.path.join(split_dir, 'n_phones', f'{utt_id}.txt'))
                if split == 'train':
                    norm_feats.setdefault('dur', []).append(dur[:, None].astype(np.float32))

        counters = _frame_counters(n_frames, dur)
        file_io.save_bin(counters, os.path.join(split_dir, 'counters', f'{utt_id}.npy'))
        file_io.save_txt(np.array([[n_frames]]),
                         os.path.join(split_dir, 'n_frames', f'{utt_id}.txt'))

        for name in ('lf0', 'vuv', 'mcep', 'bap'):
            file_io.save_bin(feats[name], os.path.join(split_dir, name, f'{utt_id}.npy'))

        if split == 'train':
            for name in ('lf0', 'mcep', 'bap'):
                norm_feats.setdefault(name, []).append(feats[name])
                norm_feats.setdefault(name + '_deltas', []).append(
                    compute_deltas(feats[name]))
            norm_feats.setdefault('counters', []).append(counters)

    # Normalisation parameters into the train dir (the default
    # --normalisation_dir).
    norm_dir = os.path.join(out_dir, 'train')
    for name in ('lf0', 'mcep', 'bap', 'lf0_deltas', 'mcep_deltas', 'bap_deltas', 'dur'):
        if name in norm_feats:
            file_io.save_json(fit_mvn_params(norm_feats[name]),
                              os.path.join(norm_dir, f'{name}_mvn.json'))
    for name in ('lab', 'counters'):
        if name in norm_feats:
            file_io.save_json(fit_minmax_params(norm_feats[name]),
                              os.path.join(norm_dir, f'{name}_minmax.json'))

    for split, utt_ids in id_lists.items():
        file_io.save_lines(utt_ids, os.path.join(out_dir, split,
                                                 f'{split}_file_id_list.scp'))
    return id_lists


def main():
    parser = argparse.ArgumentParser(description='Prepare a voice dataset from wavs.')
    parser.add_argument('--wav_dir', required=True)
    parser.add_argument('--out_dir', required=True)
    parser.add_argument('--lab_dir', default=None,
                        help='Optional dir of {utt}.npy label matrices and {utt}.dur files.')
    parser.add_argument('--valid_fraction', type=float, default=0.1)
    parser.add_argument('--test_fraction', type=float, default=0.1)
    parser.add_argument('--frame_period', type=float, default=5.0)
    parser.add_argument('--fft_size', type=int, default=1024)
    parser.add_argument('--mcep_order', type=int, default=59)
    parser.add_argument('--num_bands', type=int, default=5)
    args = parser.parse_args()
    id_lists = prepare_voice(args.wav_dir, args.out_dir, lab_dir=args.lab_dir,
                             valid_fraction=args.valid_fraction,
                             test_fraction=args.test_fraction,
                             frame_period=args.frame_period,
                             fft_size=args.fft_size, mcep_order=args.mcep_order,
                             num_bands=args.num_bands)
    for split, utt_ids in id_lists.items():
        print(f'{split}: {len(utt_ids)} utterances')


if __name__ == '__main__':
    main()
