"""Convolutional acoustic model: dilated-residual conv stack, all streams.

A third full acoustic-model family alongside the LSTM
(``models/rnn_spss.py``, reference ``models/RNN_SPSS.py``) and transformer
(``models/transformer_spss.py``) flagships, sharing their exact data
contract, losses, metrics, MLPG post-net and WORLD synthesis hook — only the
sequence mixer differs. Where the reference's cuDNN LSTM pays O(T)
sequential steps per layer (``/root/reference/morgana/utils.py:333-393``),
a dilated conv stack is O(1) sequential depth: every layer is k batched
matmuls the XLA compiler tiles straight onto the MXU, so training-step
latency is bounded by arithmetic rather than recurrence. Dilations double
per block (1, 2, 4, ...), giving a receptive field of
``1 + sum(k - 1) * dilation_i`` frames (~1.3 s at the defaults).

``causal=True`` switches every conv to left-only context, which makes the
model streamable through the same chunked engine as the recurrent flagship
(each conv carries a context-tail state; ``InferenceEngine.stream_item``
works unchanged via the hooks inherited from ``LSTMAcousticModel``).
"""
from morgana_tpu import nn
from morgana_tpu.experiment_builder import ExperimentBuilder

try:
    from rnn_spss import LSTMAcousticModel
except ImportError:  # Loaded by file path (serve --model models/...py:Class).
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rnn_spss import LSTMAcousticModel


class _ResidualConvBlock(nn.Module):
    """LayerNorm -> Conv1d(k, dilated) -> GELU -> Dropout -> +residual.

    Pre-norm residual form (the transformer flagship's convention): the
    residual path keeps gradients well-scaled at depth without the LSTM's
    gating machinery.
    """

    accepts_seq_len = True

    def __init__(self, channels, kernel_size, dilation, dropout_prob,
                 padding):
        self.norm = nn.LayerNorm(channels)
        self.conv = nn.Conv1d(channels, channels, kernel_size,
                              dilation=dilation, padding=padding)
        self.act = nn.GELU()
        self.drop = nn.Dropout(dropout_prob)

    def forward(self, x, seq_len=None):
        return x + self.drop(self.act(
            self.conv(self.norm(x), seq_len=seq_len)))

    def init_stream_state(self):
        return None

    def step(self, chunk, state):
        y, state = self.conv.step(self.norm(chunk), state)
        return chunk + self.drop(self.act(y)), state


class ConvAcousticModel(LSTMAcousticModel):
    """Same task surface as :class:`LSTMAcousticModel` (sources,
    normalisers, per-stream MLPG predict, masked-MSE + BCE loss, metrics,
    WORLD synthesis) with the LSTM stack replaced by a dilated-residual
    convolution stack."""

    def __init__(self, input_dim=600 + 9, output_dims=None, dropout_prob=0.,
                 num_layers=6, hidden_size=512, kernel_size=5,
                 causal=False):
        # Skip the LSTM constructor (it would build 8 recurrent layers just
        # to throw them away) but run the shared BaseSPSS + metric setup by
        # replaying the parent's non-architecture initialisation.
        from morgana_tpu.base_models import BaseSPSS
        from morgana_tpu import metrics
        if output_dims is None:
            output_dims = {'lf0': 1 * 3, 'vuv': 1, 'mcep': 60 * 3, 'bap': 5 * 3}
        BaseSPSS.__init__(self)
        self.input_dim = input_dim
        self.output_dims = output_dims
        self.dropout_prob = dropout_prob
        self.num_layers = num_layers
        self.hidden_size = hidden_size
        self.kernel_size = kernel_size
        self.causal = bool(causal)

        padding = 'causal' if causal else 'same'
        blocks = [
            _ResidualConvBlock(hidden_size, kernel_size,
                               dilation=2 ** (i % 4),
                               dropout_prob=dropout_prob, padding=padding)
            for i in range(num_layers)
        ]
        self.layers = nn.SequentialWithRecurrent(
            nn.Linear(self.input_dim, hidden_size),
            nn.GELU(),
            nn.Dropout(p=dropout_prob),
            *blocks,
            nn.LayerNorm(hidden_size),
            nn.Linear(hidden_size, 256),
            nn.Sigmoid(),
            nn.Dropout(p=dropout_prob),
            nn.Linear(256, sum(output_dims.values())),
        )

        self.metrics.add_metrics('all',
                                 LF0_RMSE_Hz=metrics.LF0Distortion(),
                                 VUV_accuracy=metrics.Mean(),
                                 MCEP_distortion=metrics.MelCepDistortion(),
                                 BAP_distortion=metrics.Distortion())


def main():
    args = ExperimentBuilder.get_experiment_args()
    nn.manual_seed(args.get('seed', 1234567890))
    experiment = ExperimentBuilder(ConvAcousticModel, **args)
    experiment.run_experiment()


if __name__ == '__main__':
    main()
