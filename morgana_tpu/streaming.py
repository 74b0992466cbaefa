"""Streaming (incremental) inference primitives.

The reference framework (and round-1/2 morgana_tpu) generates whole
utterances at once: latency to first output frame grows with utterance
length. This module provides the building blocks for chunked streaming
generation with constant per-chunk latency:

* :class:`StreamingMLPG` — maximum-likelihood parameter generation over a
  sliding fixed-shape window. Full MLPG (``viz/synthesis.py``; reference
  ``morgana/viz/synthesis.py:79-180``) solves one banded system over the
  whole utterance and is therefore inherently non-causal. The banded
  precision matrix's inverse decays exponentially off the diagonal, so a
  windowed solve with ``context`` past frames and ``lookahead`` future
  frames approximates the full trajectory to within a tolerance that
  shrinks exponentially in ``min(context, lookahead)`` (measured in
  ``tests/test_streaming.py``; ~1e-3 relative at 16/16 with the default
  windows). Every window solve has the SAME padded shape, so the whole
  stream — any utterance length — reuses ONE compiled XLA program, the
  TPU-native answer to variable-length streaming.

The model-facing streaming contract (``stream_inputs`` / ``stream_step`` /
``stream_output_spec``) lives on :class:`morgana_tpu.base_models.BaseSPSS`;
the serving loop that drives it is :class:`morgana_tpu.serve.StreamingSession`.
"""
import numpy as np

__all__ = ['StreamingMLPG']


class StreamingMLPG(object):
    """Incremental MLPG: push delta-feature means chunk by chunk, receive
    smoothed trajectory frames with a fixed ``lookahead``-frame delay.

    Parameters
    ----------
    variances : array (W*D,)
        Global variance vector for the delta streams (same meaning as
        ``MLPG``'s global-variance form).
    chunk_size : int
        Frames emitted per interior emission step.
    context : int
        Past frames included in each window solve (accuracy knob).
    lookahead : int
        Future frames required before a frame is emitted (latency/accuracy
        knob): emission of frames ``[s, s+chunk)`` waits until means for
        ``s + chunk + lookahead`` frames have been pushed.
    padding_size : int
        Edge burn-in replication, applied to every window solve — at true
        utterance boundaries this matches full ``MLPG(padding_size=...)``;
        at interior cuts the replicated edge stands in for the (unseen)
        continuation. Matching the model's training-time setting keeps the
        streamed and batch trajectories consistent.
    windows : optional
        MLPG window set (default: the standard static/delta/delta-delta).

    Notes
    -----
    All window solves use one fixed buffer shape
    ``(B, context + chunk + lookahead, W*D)`` with MLPG's ``seq_len``
    masking covering partially-filled windows — one compiled program per
    stream regardless of utterance length.
    """

    def __init__(self, variances, chunk_size, context=32, lookahead=16,
                 padding_size=0, windows=None):
        if chunk_size < 1:
            raise ValueError('chunk_size must be >= 1')
        if context < 0 or lookahead < 0:
            raise ValueError('context and lookahead must be >= 0')
        self.variances = np.asarray(variances, np.float32)
        self.chunk_size = int(chunk_size)
        self.context = int(context)
        self.lookahead = int(lookahead)
        self.padding_size = int(padding_size)
        self.windows = windows
        self.window_frames = self.context + self.chunk_size + self.lookahead

        self._chunks = []        # retained mean chunks, each (B, c_i, W*D)
        self._base = 0           # absolute index of the first retained frame
        self._total = 0          # frames pushed
        self._emitted = 0        # frames emitted
        self._finished = False

    # ------------------------------------------------------------------ api

    def push(self, means):
        """Feeds ``means`` (B, c, W*D) and returns newly emittable smoothed
        frames as (B, n_new, D) — possibly ``n_new == 0`` while the
        lookahead fills."""
        if self._finished:
            raise RuntimeError('push() after flush()')
        means = np.asarray(means)
        if means.ndim != 3:
            raise ValueError(f'means must be (batch, frames, W*D), '
                             f'got shape {means.shape}')
        if means.shape[1]:
            self._chunks.append(means)
            self._total += means.shape[1]

        emitted = []
        while self._total >= self._emitted + self.chunk_size + self.lookahead:
            emitted.append(self._solve_window(
                self._emitted, self._emitted + self.chunk_size))
            self._emitted += self.chunk_size
        self._trim()
        return self._concat(emitted, means.shape[0])

    def flush(self):
        """Emits every remaining frame (the final partial window). The
        stream is finished afterwards."""
        if self._finished:
            raise RuntimeError('flush() called twice')
        self._finished = True
        emitted = []
        while self._emitted < self._total:
            stop = min(self._emitted + self.chunk_size, self._total)
            emitted.append(self._solve_window(self._emitted, stop))
            self._emitted = stop
        batch = self._chunks[0].shape[0] if self._chunks else 1
        return self._concat(emitted, batch)

    @property
    def delay_frames(self):
        """Worst-case emission delay in frames (lookahead + chunk
        granularity)."""
        return self.lookahead + self.chunk_size - 1

    # ------------------------------------------------------------- internals

    def _concat(self, parts, batch):
        if not parts:
            d = self.variances.shape[-1] // self._num_windows()
            return np.zeros((batch, 0, d), np.float32)
        return np.concatenate(parts, axis=1)

    def _num_windows(self):
        from morgana_tpu.ops.deltas import DEFAULT_WINDOWS
        return len(self.windows if self.windows is not None else DEFAULT_WINDOWS)

    def _buffered(self, lo, hi):
        """Means for absolute frames [lo, hi) as one array."""
        if len(self._chunks) > 1:
            self._chunks = [np.concatenate(self._chunks, axis=1)]
        return self._chunks[0][:, lo - self._base:hi - self._base]

    def _trim(self):
        """Drops frames no future window can reference (< emitted - context)
        so a continuous stream holds O(window) frames, not the whole
        history."""
        keep_from = self._emitted - self.context
        if keep_from <= self._base or not self._chunks:
            return
        if len(self._chunks) > 1:
            self._chunks = [np.concatenate(self._chunks, axis=1)]
        self._chunks = [self._chunks[0][:, keep_from - self._base:]]
        self._base = keep_from

    def _solve_window(self, start, stop):
        """Solves one fixed-shape window and returns frames [start, stop)."""
        from morgana_tpu.viz.synthesis import MLPG

        lo = max(0, start - self.context)
        hi = min(self._total, stop + self.lookahead)
        window = self._buffered(lo, hi)
        batch, n = window.shape[0], window.shape[1]
        if n < self.window_frames:
            # Fixed compiled shape: right-pad with the edge frame; MLPG's
            # seq_len masking ignores the padding entirely.
            pad = np.repeat(window[:, -1:], self.window_frames - n, axis=1)
            window = np.concatenate([window, pad], axis=1)
        traj = MLPG(window, self.variances, windows=self.windows,
                    padding_size=self.padding_size,
                    seq_len=np.full((batch,), n, np.int32))
        traj = np.asarray(traj)
        return traj[:, start - lo:stop - lo].astype(np.float32, copy=False)
