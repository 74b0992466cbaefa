#!/usr/bin/env bash
# morgana_tpu quickstart: generate a synthetic voice, train the F0 model,
# evaluate, and synthesise waveforms — all from the CLI.
#
# From a fresh working directory:
#   bash /path/to/repo/examples/quickstart.sh
#
# Device selection: defaults to JAX's auto-pick (the TPU when one is
# attached). Set MORGANA_DEVICE=cpu to force the CPU backend — e.g. on a
# machine whose TPU is tunnelled and temporarily unreachable.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
DEVICE_ARGS=()
if [[ -n "${MORGANA_DEVICE:-}" ]]; then
  DEVICE_ARGS=(--device "$MORGANA_DEVICE")
fi

# 1. A complete synthetic voice dataset in the framework's on-disk layout
#    (with real data, use `python -m morgana_tpu.data.prepare --wav_dir ...`).
python -c "
from morgana_tpu.data.synthetic import generate_voice_data
generate_voice_data('data', num_train=16, num_valid=4, num_test=2, seed=1)
print('dataset written to ./data')"

# 2. Train + validate; every 2nd epoch the analysis hook synthesises wavs
#    into experiments/quickstart/valid/epoch_N/synth/. The corpus rides in
#    device memory (--device_cache: batches assemble on device, only index
#    vectors cross the wire) with normalisation computed on device too, and
#    consecutive same-shape train/valid batches run as one compiled program
#    (--steps_per_dispatch: one host dispatch per N steps). On TPU these
#    are AUTO defaults now; they are spelled out here so the CPU run
#    (MORGANA_DEVICE=cpu) exercises the same path.
python "$REPO/models/f0_test_model.py" \
  --experiment_name quickstart --data_root data \
  --train_id_list train/train_file_id_list.scp \
  --valid_id_list valid/valid_file_id_list.scp \
  --test_id_list test/test_file_id_list.scp \
  --batch_size 4 --end_epoch 4 --learning_rate 0.01 \
  --ema_decay 0.99 --valid_output_interval 2 --num_data_threads 2 \
  --device_cache --device_normalise --steps_per_dispatch 4 "${DEVICE_ARGS[@]}"

# 3. Serve the trained checkpoint (no experiment scaffolding needed):
#    batch synthesis of the test set with throughput stats.
python -m morgana_tpu.serve \
  --model "$REPO/models/f0_test_model.py:F0Model" \
  --checkpoint_path experiments/quickstart/checkpoints/epoch_4.npz \
  --data_root data --data_dir test --id_list test/test_file_id_list.scp \
  --out_dir served --analysis_kwargs "{'sample_rate': 16000}" "${DEVICE_ARGS[@]}"

# 4. Quantize the checkpoint to a ~4x-smaller int8 deployment artifact and
#    serve it directly (the engine auto-detects the format).
python -m morgana_tpu.quantize \
  --checkpoint experiments/quickstart/checkpoints/epoch_4.npz
python -m morgana_tpu.serve \
  --model "$REPO/models/f0_test_model.py:F0Model" \
  --checkpoint_path experiments/quickstart/checkpoints/epoch_4_q8.npz \
  --data_root data --data_dir test --id_list test/test_file_id_list.scp \
  --out_dir served_q8 --analysis_kwargs "{'sample_rate': 16000}" "${DEVICE_ARGS[@]}"

# 5. Two-stage TTS: train a duration model, then generate from labels alone
#    (predicted durations -> acoustic features; the F0 demo model emits lf0
#    trajectories — swap in models/rnn_spss.py as the acoustic stage for
#    full WORLD-parameter prediction and wav output).
python "$REPO/models/duration_model.py" \
  --experiment_name quickstart_dur --data_root data \
  --model_kwargs "{'hidden_size': 32}" \
  --train_id_list train/train_file_id_list.scp \
  --valid_id_list valid/valid_file_id_list.scp \
  --test_id_list test/test_file_id_list.scp \
  --batch_size 4 --end_epoch 4 --learning_rate 0.01 --no-valid "${DEVICE_ARGS[@]}"
python -m morgana_tpu.pipeline \
  --duration_model "$REPO/models/duration_model.py:DurationModel" \
  --duration_checkpoint experiments/quickstart_dur/checkpoints/epoch_4.npz \
  --duration_model_kwargs "{'hidden_size': 32}" \
  --acoustic_model "$REPO/models/f0_test_model.py:F0Model" \
  --acoustic_checkpoint experiments/quickstart/checkpoints/epoch_4.npz \
  --data_root data --data_dir test --out_dir tts_out "${DEVICE_ARGS[@]}"

echo
echo "Artifacts:"
find experiments/quickstart -maxdepth 2 | sort | head -20 || true
find served served_q8 tts_out -type f | sort | head -12 || true
