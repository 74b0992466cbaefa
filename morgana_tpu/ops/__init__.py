"""TPU-native compute kernels (jit-safe, static shapes, mask-based)."""
from morgana_tpu.ops import attention
from morgana_tpu.ops import deltas
from morgana_tpu.ops import losses
from morgana_tpu.ops import masking
from morgana_tpu.ops import pallas_gru
from morgana_tpu.ops import pallas_rnn
from morgana_tpu.ops import rnn
from morgana_tpu.ops import sequence

from morgana_tpu.ops.deltas import compute_deltas, compute_deltas_jax, DEFAULT_WINDOWS
from morgana_tpu.ops.masking import sequence_mask, batched_masked_select, both_voiced_mask
from morgana_tpu.ops.mlpg import mlpg
from morgana_tpu.ops.sequence import upsample_to_repetitions, split_to_segments, get_segment_ends
