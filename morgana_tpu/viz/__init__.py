"""Post-processing and visualisation: MLPG synthesis, metric plots, feature dumps."""
from morgana_tpu.viz import io
from morgana_tpu.viz import plotting
from morgana_tpu.viz import synthesis

from morgana_tpu.viz.io import save_batched_seqs
from morgana_tpu.viz.synthesis import MLPG
