"""Transformer acoustic model: self-attention stack predicting all vocoder
parameter streams.

Beyond-reference model family (the reference is RNN-only —
``models/RNN_SPSS.py`` wraps cuDNN LSTMs, ``morgana/utils.py:333-393``):
the same SPSS task as :class:`models.rnn_spss.LSTMAcousticModel` (identical
data contract, losses, metrics, MLPG and vocoder synthesis) with the
sequence mixer swapped for a pre-LN Transformer encoder. This is the
TPU-flagship architecture: where the LSTM's sequential h-chain is
latency-bound (one small matmul per timestep), attention is O(1) sequential
depth — every matmul is (B·T, d) sized and lands on the MXU, so MFU is set
by arithmetic intensity rather than loop latency, and long sequences get
*faster* per frame, not slower.

Run it exactly like the reference models:

    python models/transformer_spss.py --experiment_name t1 --data_root data ...

with ``--model_kwargs "{'num_layers': 4, 'd_model': 256}"`` to resize.
Training notes: pre-LN tolerates constant learning rates, but transformers
prefer a gentler peak than the RNN default — ``--learning_rate 0.001`` (or
``--lr_schedule_name noam``) is a good starting point.
``--model_kwargs "{'causal': True}"`` selects the streamable sliding-window
configuration. Attention defaults to ``'auto'`` — the fused TPU splash
kernel whenever eligible, the exact XLA path otherwise (BASELINE.md
round-4 A/B; ``{'attention_backend': 'xla'}`` forces the portable path,
``'flash'`` the older kernel kept as a tested reference);
``--remat`` bounds activation memory on long utterances;
``{'pipeline_stages': 4}`` executes the encoder blocks as a GPipe pipeline
over a ('data', 'stage') device mesh (``morgana_tpu.parallel.pipeline``) —
checkpoints interchange with the sequential configuration;
``{'moe_experts': 8, 'expert_parallel': True}`` swaps every second block's
dense FFN for a Switch-style mixture of experts sharded over a
('data', 'expert') mesh (``nn.MoEFeedForward``) — parameter count scales
with experts at constant per-token FLOPs.
"""
from morgana_tpu.base_models import BaseSPSS
from morgana_tpu.experiment_builder import ExperimentBuilder
from morgana_tpu import metrics
from morgana_tpu import nn

try:
    from rnn_spss import LSTMAcousticModel
except ImportError:  # Loaded by file path (serve --model models/...py:Class).
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rnn_spss import LSTMAcousticModel


class TransformerAcousticModel(LSTMAcousticModel):
    """Drop-in peer of :class:`LSTMAcousticModel` — shares its data sources,
    normalisers, loss, metrics and synthesis hooks; only the network
    (``self.layers``) differs, so ``predict``/``loss`` are inherited
    unchanged through the ``SequentialWithRecurrent`` seq_len threading."""

    def __init__(self, input_dim=600 + 9, output_dims=None, dropout_prob=0.,
                 num_layers=6, d_model=384, num_heads=4, d_ff=None,
                 causal=False, attention_window=None, remat=None,
                 attention_backend='auto', pipeline_stages=None,
                 pipeline_microbatches=8, moe_experts=0, moe_every=2,
                 moe_capacity_factor=1.25, moe_aux_weight=0.01,
                 expert_parallel=False, sequence_parallel=0):
        if output_dims is None:
            output_dims = {'lf0': 1 * 3, 'vuv': 1, 'mcep': 60 * 3, 'bap': 5 * 3}
        if d_ff is None:
            d_ff = 4 * d_model
        if causal and attention_window is None:
            # Streamable configuration: sliding-window causal attention.
            # 256 frames = 1.28 s of left context at 5 ms frames — ample for
            # acoustic smoothness, and it is the KV-cache depth per layer.
            attention_window = 256

        # Deliberately skip LSTMAcousticModel.__init__ (it would build and
        # discard 8 LSTM layers' weights and advance the init RNG).
        BaseSPSS.__init__(self)
        self.input_dim = input_dim
        self.output_dims = output_dims
        self.dropout_prob = dropout_prob
        self.num_layers = num_layers
        self.d_model = d_model
        self.num_heads = num_heads
        self.d_ff = d_ff
        self.causal = causal
        self.attention_window = attention_window
        self.attention_backend = attention_backend
        self.pipeline_stages = pipeline_stages
        self.moe_experts = moe_experts

        activation_sharding = None
        if sequence_parallel:
            if pipeline_stages:
                raise ValueError('sequence_parallel and pipeline_stages '
                                 'cannot combine (the pipeline owns its own '
                                 'activation layout)')
            # Sequence parallelism: activations live sharded (batch over
            # 'data', time over 'seq'); GSPMD inserts the attention K/V
            # all-gather. Pays off on very long utterances where the T x T
            # attention or T-length activations pressure one device's HBM.
            import jax
            from jax.sharding import NamedSharding, PartitionSpec
            from morgana_tpu.parallel.mesh import make_seq_mesh
            seq_mesh = make_seq_mesh(int(sequence_parallel))
            activation_sharding = NamedSharding(
                seq_mesh, PartitionSpec('data' if seq_mesh.shape['data'] > 1
                                        else None, 'seq'))

        moe = None
        if moe_experts:
            if pipeline_stages:
                raise ValueError('pipeline_stages and moe_experts cannot '
                                 'combine (pipeline stages must be '
                                 'homogeneous dense blocks)')
            # Expert parallelism: shard the stacked expert weights and the
            # dispatched token blocks over a ('data', 'expert') mesh — XLA
            # inserts the token all-to-all (GSPMD).
            mesh = None
            if expert_parallel:
                from morgana_tpu.parallel.mesh import make_moe_mesh
                mesh = make_moe_mesh(moe_experts)
            moe = dict(num_experts=moe_experts,
                       capacity_factor=moe_capacity_factor,
                       aux_weight=moe_aux_weight, mesh=mesh)

        if pipeline_stages:
            # Pipeline parallelism: the encoder blocks execute as a GPipe
            # pipeline over a ('data', 'stage') mesh. Identical parameter
            # tree — checkpoints interchange with the sequential config.
            from morgana_tpu.parallel.pipeline import PipelinedTransformerEncoder
            encoder = PipelinedTransformerEncoder(
                num_layers, d_model, num_heads, d_ff,
                dropout=self.dropout_prob, causal=causal,
                window=attention_window, remat=remat,
                attention_backend=attention_backend,
                num_stages=pipeline_stages,
                num_microbatches=pipeline_microbatches)
        else:
            encoder = nn.TransformerEncoder(
                num_layers, d_model, num_heads, d_ff,
                dropout=self.dropout_prob, causal=causal,
                window=attention_window, remat=remat,
                attention_backend=attention_backend,
                moe=moe, moe_every=moe_every,
                activation_sharding=activation_sharding)

        self.layers = nn.SequentialWithRecurrent(
            nn.Linear(self.input_dim, d_model),
            nn.Dropout(p=self.dropout_prob),
            encoder,
            nn.Linear(d_model, sum(self.output_dims.values())),
        )

        self.metrics.add_metrics('all',
                                 LF0_RMSE_Hz=metrics.LF0Distortion(),
                                 VUV_accuracy=metrics.Mean(),
                                 MCEP_distortion=metrics.MelCepDistortion(),
                                 BAP_distortion=metrics.Distortion())

    # ------------------------------------------------------------ streaming

    def stream_step(self, inputs_chunk, state):
        if self.moe_experts:
            raise NotImplementedError(
                'streaming with MoE blocks is not supported: expert capacity '
                'is computed per routed window, so chunked routing would not '
                'reproduce batch predictions exactly')
        if not self.causal:
            raise NotImplementedError(
                'chunked streaming needs the streamable configuration '
                "(model_kwargs \"{'causal': True}\" — sliding-window causal "
                'attention with per-layer KV caches); the default '
                'bidirectional model requires the full utterance. '
                'LSTMAcousticModel streams in any configuration.')
        # The container threads each attention member's KV caches through
        # its hidden slot, so the LSTM implementation applies unchanged.
        return LSTMAcousticModel.stream_step(self, inputs_chunk, state)


def main():
    args = ExperimentBuilder.get_experiment_args()
    nn.manual_seed(args.get('seed', 1234567890))
    experiment = ExperimentBuilder(TransformerAcousticModel, **args)
    experiment.run_experiment()


if __name__ == '__main__':
    main()
