#!/usr/bin/env bash
# morgana_tpu quickstart: generate a synthetic voice, train the F0 model,
# evaluate, and synthesise waveforms — all from the CLI.
#
# From a fresh working directory:
#   bash /path/to/repo/examples/quickstart.sh
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

# 1. A complete synthetic voice dataset in the framework's on-disk layout
#    (with real data, use `python -m morgana_tpu.data.prepare --wav_dir ...`).
python -c "
from morgana_tpu.data.synthetic import generate_voice_data
generate_voice_data('data', num_train=16, num_valid=4, num_test=2, seed=1)
print('dataset written to ./data')"

# 2. Train + validate; every 2nd epoch the analysis hook synthesises wavs
#    into experiments/quickstart/valid/epoch_N/synth/.
python "$REPO/models/f0_test_model.py" \
  --experiment_name quickstart --data_root data \
  --train_id_list train/train_file_id_list.scp \
  --valid_id_list valid/valid_file_id_list.scp \
  --test_id_list test/test_file_id_list.scp \
  --batch_size 4 --end_epoch 4 --learning_rate 0.01 \
  --ema_decay 0.99 --valid_output_interval 2 --num_data_threads 2

# 3. Serve the trained checkpoint (no experiment scaffolding needed):
#    batch synthesis of the test set with throughput stats.
python -m morgana_tpu.serve \
  --model "$REPO/models/f0_test_model.py:F0Model" \
  --checkpoint_path experiments/quickstart/checkpoints/epoch_4.npz \
  --data_root data --data_dir test --id_list test/test_file_id_list.scp \
  --out_dir served --analysis_kwargs "{'sample_rate': 16000}"

echo
echo "Artifacts:"
find experiments/quickstart -maxdepth 2 | sort | head -20
find served -type f | sort | head -5
