"""A minimal, explicit neural-network module system on JAX pytrees.

Why not torch-style stateful autograd: on TPU everything under ``jit`` is
traced once and compiled, so parameters must be an explicit pytree that can be
donated, sharded with ``jax.sharding``, and transformed with ``jax.grad``.
Why not a closed framework: the reference's user contract
(``morgana/base_models.py``) is an *object* with ``predict``/``loss`` methods
and mutable support attributes (``mode``, ``metrics``, ``normalisers``). This
module bridges the two:

* Modules are ordinary Python objects; parameters are :class:`Param` leaves
  discovered by attribute traversal (torch-style dotted names, so checkpoint
  state dicts look familiar and parity tests can load torch weights).
* :func:`parameters` extracts the param pytree; :func:`bind` temporarily
  installs (possibly traced) values into the same module objects, so a pure
  ``f(params, batch)`` can run the user's eager-looking method code under
  ``jit``/``grad`` with zero per-step Python overhead after compilation.
* RNG is a bound context (:func:`next_rng`) with deterministic
  ``fold_in`` sequencing, replacing torch's global RNG state.

Initialisation reproducibility: :func:`manual_seed` seeds a process-global
NumPy generator used by all initialisers (the TPU-native analogue of the
reference models' ``torch.random.manual_seed(1234567890)``,
``models/f0_test_model.py:141``).
"""
import contextlib
import math
import threading

import jax
import jax.numpy as jnp
import numpy as np

from morgana_tpu.ops import attention as attention_ops
from morgana_tpu.ops import rnn as rnn_ops

__all__ = [
    'Param', 'Module', 'ModuleList', 'Linear', 'Dropout', 'Embedding',
    'set_default_compute_dtype', 'default_compute_dtype',
    'set_default_remat', 'default_remat',
    'Recurrent', 'SequentialWithRecurrent', 'Sigmoid', 'Tanh', 'ReLU', 'GELU',
    'LayerNorm', 'Conv1d',
    'MultiHeadAttention', 'TransformerEncoderLayer', 'TransformerEncoder',
    'LSTM', 'GRU', 'MoEFeedForward',
    'manual_seed', 'parameters', 'named_parameters', 'load_parameters',
    'state_dict', 'load_state_dict', 'bind', 'next_rng', 'is_training',
    'aux_loss', 'collected_aux_loss',
    'ExponentialMovingAverage', 'ema_update',
]

# ---------------------------------------------------------------------------
# Global init RNG (torch.manual_seed analogue)
# ---------------------------------------------------------------------------

_INIT_RNG = np.random.default_rng(0)

# Global matmul compute dtype (None = full f32). Set to bfloat16 to run the
# large matmuls in bf16 on the MXU with f32 accumulation/state.
_DEFAULT_COMPUTE_DTYPE = None

# Global rematerialisation toggle: recurrent layers recompute their forward
# in the backward pass (jax.checkpoint) instead of saving per-step
# activations — O(T) activation memory becomes O(1) per layer, enabling much
# longer sequences / larger batches at ~1.3x train FLOPs.
_DEFAULT_REMAT = False


def _on_tpu():
    """Whether the default backend is TPU silicon. Checks device_kind, not
    the platform name: a tunnelled chip can register under a plugin-specific
    platform (e.g. 'axon'), which a ``default_backend() == 'tpu'`` test
    would misclassify (see platform._platform_is_tpu)."""
    if jax.default_backend() == 'tpu':
        return True
    try:
        devs = jax.devices()
        return bool(devs) and \
            'tpu' in str(getattr(devs[0], 'device_kind', '')).lower()
    except Exception:
        return False


def set_default_remat(enabled):
    global _DEFAULT_REMAT
    _DEFAULT_REMAT = bool(enabled)


def default_remat():
    return _DEFAULT_REMAT


def set_default_compute_dtype(dtype):
    # Accepts None, 'float32', 'bfloat16' or a dtype object.
    global _DEFAULT_COMPUTE_DTYPE
    if isinstance(dtype, str):
        dtype = None if dtype in ('float32', 'f32', 'none') else jnp.dtype(dtype)
    _DEFAULT_COMPUTE_DTYPE = dtype


def default_compute_dtype():
    return _DEFAULT_COMPUTE_DTYPE


def manual_seed(seed):
    """Seeds the global initialiser RNG used when constructing modules."""
    global _INIT_RNG
    _INIT_RNG = np.random.default_rng(seed)


def _matmul(x, w):
    """The compute-dtype matmul recipe shared by every dense projection
    (Linear, the cross-attention projections): inputs cast to the global
    compute dtype (bf16 MXU matmuls), accumulation/output in ``x.dtype``.
    One definition so the mixed-precision recipe cannot drift per call
    site. (The MoE router deliberately does NOT use it — its softmax
    balance statistics must stay exact f32.)"""
    cd = _DEFAULT_COMPUTE_DTYPE
    if cd is not None:
        return jnp.dot(x.astype(cd), w.astype(cd),
                       preferred_element_type=x.dtype)
    return x @ w


def _uniform(shape, bound, dtype=np.float32):
    return jnp.asarray(_INIT_RNG.uniform(-bound, bound, size=shape).astype(dtype))


# ---------------------------------------------------------------------------
# Param + Module
# ---------------------------------------------------------------------------

class Param:
    """A single parameter leaf holding a jnp array (possibly a tracer when bound)."""
    __slots__ = ('value',)

    def __init__(self, value):
        self.value = jnp.asarray(value)

    def __repr__(self):
        return f'Param(shape={tuple(self.value.shape)}, dtype={self.value.dtype})'


class Module:
    """Base class. Parameters/submodules are plain attributes; traversal order
    is attribute insertion order (deterministic)."""

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def forward(self, *args, **kwargs):
        raise NotImplementedError

    # -- traversal ---------------------------------------------------------

    def _children(self):
        for name, value in vars(self).items():
            yield name, value

    def named_parameters(self, prefix=''):
        # Bare Params inside containers are traversed too: silently skipping
        # them would leave those weights untrained, unsaved and un-bound
        # with no error (only layers with a hand-written override, like
        # Recurrent's, would escape the trap).
        for name, value in self._children():
            full = f'{prefix}{name}'
            if isinstance(value, Param):
                yield full, value
            elif isinstance(value, Module):
                yield from value.named_parameters(prefix=full + '.')
            elif isinstance(value, (list, tuple)):
                for i, item in enumerate(value):
                    if isinstance(item, Param):
                        yield f'{full}.{i}', item
                    elif isinstance(item, Module):
                        yield from item.named_parameters(prefix=f'{full}.{i}.')
            elif isinstance(value, dict):
                for k, item in value.items():
                    if isinstance(item, Param):
                        yield f'{full}.{k}', item
                    elif isinstance(item, Module):
                        yield from item.named_parameters(prefix=f'{full}.{k}.')

    def modules(self):
        yield self
        for _, value in self._children():
            if isinstance(value, Module):
                yield from value.modules()
            elif isinstance(value, (list, tuple)):
                for item in value:
                    if isinstance(item, Module):
                        yield from item.modules()
            elif isinstance(value, dict):
                for item in value.values():
                    if isinstance(item, Module):
                        yield from item.modules()

    def __repr__(self):
        lines = [self.__class__.__name__ + '(']
        for name, value in self._children():
            if isinstance(value, (Module, Param)):
                sub = repr(value).replace('\n', '\n  ')
                lines.append(f'  ({name}): {sub}')
            elif isinstance(value, (list, tuple)) and any(isinstance(v, Module) for v in value):
                for i, item in enumerate(value):
                    sub = repr(item).replace('\n', '\n  ')
                    lines.append(f'  ({name}.{i}): {sub}')
        lines.append(')')
        return '\n'.join(lines)


class ModuleList(Module):
    def __init__(self, modules=()):
        self.items = list(modules)

    def __iter__(self):
        return iter(self.items)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]

    def append(self, module):
        self.items.append(module)


# ---------------------------------------------------------------------------
# Functional access: parameters / bind / state dicts
# ---------------------------------------------------------------------------

def named_parameters(module):
    return dict(module.named_parameters())


def parameters(module):
    """Extracts the parameter pytree: {dotted_name: jnp array}."""
    return {name: p.value for name, p in module.named_parameters()}


def load_parameters(module, values):
    """Writes a {name: array} pytree back into the module's Param slots."""
    params = named_parameters(module)
    for name, value in values.items():
        if name not in params:
            raise KeyError(f'Unknown parameter {name!r}')
        params[name].value = value


def state_dict(module):
    """Host-side copy of all parameters as numpy arrays."""
    return {name: np.asarray(p.value) for name, p in module.named_parameters()}


def load_state_dict(module, sd, strict=True):
    params = named_parameters(module)
    missing = set(params) - set(sd)
    unexpected = set(sd) - set(params)
    if strict and (missing or unexpected):
        raise KeyError(f'state_dict mismatch: missing={sorted(missing)}, unexpected={sorted(unexpected)}')
    for name, value in sd.items():
        if name in params:
            params[name].value = jnp.asarray(value)


# Per-thread execution context (train flag + rng sequence) used under bind().
_CTX = threading.local()


def _ctx():
    if not hasattr(_CTX, 'stack'):
        _CTX.stack = []
    return _CTX.stack


@contextlib.contextmanager
def bind(module, params=None, rng=None, train=False):
    """Temporarily installs `params` into `module` and sets the execution
    context (rng stream + train flag). Used to build pure functions:

        def loss_fn(params, batch, rng):
            with nn.bind(model, params, rng=rng, train=True):
                return model(batch)
    """
    saved = None
    slots = None
    if params is not None:
        slots = named_parameters(module)
        unknown = [name for name in params if name not in slots]
        if unknown:
            # Validate BEFORE installing anything: a KeyError mid-install
            # would leave the module with a half-overwritten parameter set
            # (the finally below only restores what was saved).
            raise KeyError(f'unknown parameter(s) {unknown}; module has '
                           f'{sorted(slots)}')
        saved = {name: p.value for name, p in slots.items()}
        for name, value in params.items():
            slots[name].value = value
    _ctx().append({'rng': rng, 'n': 0, 'train': train, 'aux': []})
    try:
        yield module
    finally:
        _ctx().pop()
        if saved is not None:
            # Restore through the install-time slot objects, not a fresh
            # traversal: if the body renamed/deleted a submodule and then
            # raised, a re-traversal KeyError would mask the original
            # exception and leave the remaining Params holding bound values.
            for name, value in saved.items():
                slots[name].value = value


def next_rng():
    """Next deterministic PRNG key from the bound context (call-site ordered)."""
    stack = _ctx()
    if not stack or stack[-1]['rng'] is None:
        raise RuntimeError(
            'No RNG bound: stochastic layers need `with nn.bind(model, rng=key, ...)` '
            'or an explicit rng argument.')
    frame = stack[-1]
    key = jax.random.fold_in(frame['rng'], frame['n'])
    frame['n'] += 1
    return key


def is_training():
    stack = _ctx()
    return bool(stack) and stack[-1]['train']


def aux_loss(value):
    """Registers an auxiliary training loss from inside a layer (e.g. the
    MoE router's load-balancing term). Collected by the training step via
    :func:`collected_aux_loss`; a no-op outside a :func:`bind` context (so
    eval/predict paths need no special-casing)."""
    stack = _ctx()
    if stack:
        stack[-1].setdefault('aux', []).append(value)


def collected_aux_loss():
    """Sum of the auxiliary losses registered under the CURRENT bind
    context (0.0 when none)."""
    stack = _ctx()
    if not stack or not stack[-1].get('aux'):
        return 0.0
    return sum(stack[-1]['aux'])


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

class Linear(Module):
    """Dense layer, kernel stored (in, out) so ``x @ w`` maps onto the MXU.

    Init matches torch.nn.Linear: U(-1/sqrt(in), 1/sqrt(in)).
    """

    def __init__(self, in_features, out_features, bias=True):
        self.in_features = in_features
        self.out_features = out_features
        bound = 1.0 / math.sqrt(in_features)
        self.weight = Param(_uniform((in_features, out_features), bound))
        self.bias = Param(_uniform((out_features,), bound)) if bias else None

    def forward(self, x):
        y = _matmul(x, self.weight.value)
        if self.bias is not None:
            y = y + self.bias.value
        return y

    def __repr__(self):
        return f'Linear(in={self.in_features}, out={self.out_features})'


class Embedding(Module):
    def __init__(self, num_embeddings, features):
        self.weight = Param(jnp.asarray(
            _INIT_RNG.normal(0., 1., size=(num_embeddings, features)).astype(np.float32)))

    def forward(self, ids):
        return jnp.take(self.weight.value, jnp.asarray(ids), axis=0)


class Dropout(Module):
    def __init__(self, p=0.5):
        if not 0.0 <= p <= 1.0:
            # torch parity: a typo like p=1.5 must fail at construction,
            # not silently zero (or mis-scale) every activation in training.
            raise ValueError(f'dropout probability must be in [0, 1], '
                             f'got {p}')
        self.p = float(p)

    def forward(self, x):
        if self.p == 0.0 or not is_training():
            return x
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(next_rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0.)

    def __repr__(self):
        return f'Dropout(p={self.p})'


class LayerNorm(Module):
    """Layer normalisation over the feature dim (Ba et al., 2016) — the
    standard stabiliser for recurrent stacks; normalises per frame so it is
    mask-agnostic (padded frames normalise to garbage that downstream masking
    discards)."""

    def __init__(self, features, eps=1e-5):
        self.eps = float(eps)
        self.weight = Param(jnp.ones((features,)))
        self.bias = Param(jnp.zeros((features,)))

    def forward(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        normed = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return normed * self.weight.value + self.bias.value

    def __repr__(self):
        return f'LayerNorm({self.weight.value.shape[0]})'


class Conv1d(Module):
    """1-d convolution over ``(batch, time, channels)`` sequences — the
    MXU-native sequence mixer (a k-tap conv is k batched matmuls with O(1)
    sequential depth, vs the RNN's O(T) recurrence; XLA tiles it onto the
    systolic array directly).

    ``padding='same'`` keeps the time length (torch ``Conv1d(padding=
    'same')`` parity, incl. even kernels); ``padding='causal'`` left-pads
    ``dilation * (kernel - 1)`` so frame ``t`` sees only frames ``<= t`` —
    the streamable form (the layer then carries a context-tail state
    through ``step``, like a recurrent member).

    When ``seq_len`` is passed (the ``SequentialWithRecurrent`` container
    forwards it), padded frames are zeroed BEFORE the convolution: without
    this, batch-padding garbage (e.g. an upstream Linear's bias at
    zero-padded inputs) bleeds into the last valid frames, making an
    utterance's output depend on which length bucket it was collated into.

    Init matches ``torch.nn.Conv1d``: U(-b, b), b = 1/sqrt(in/groups * k).
    Weight stored ``(kernel, in/groups, out)`` (lax 'WIO' layout).
    """

    accepts_seq_len = True

    def __init__(self, in_channels, out_channels, kernel_size, dilation=1,
                 groups=1, bias=True, padding='same'):
        if padding not in ('same', 'causal'):
            raise ValueError(f"padding must be 'same' or 'causal', got "
                             f'{padding!r}')
        if in_channels % groups or out_channels % groups:
            raise ValueError(f'groups={groups} must divide in_channels='
                             f'{in_channels} and out_channels={out_channels}')
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = int(kernel_size)
        self.dilation = int(dilation)
        self.groups = int(groups)
        self.padding = padding
        bound = 1.0 / math.sqrt(in_channels // groups * kernel_size)
        self.weight = Param(_uniform(
            (self.kernel_size, in_channels // groups, out_channels), bound))
        self.bias = Param(_uniform((out_channels,), bound)) if bias else None

    @property
    def context(self):
        """Receptive-field tail: frames of left context one output needs."""
        return self.dilation * (self.kernel_size - 1)

    def _conv(self, x, pad_low, pad_high):
        w = self.weight.value
        cd = _DEFAULT_COMPUTE_DTYPE
        out_dtype = x.dtype
        if cd is not None:
            x, w = x.astype(cd), jnp.asarray(w).astype(cd)
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w), window_strides=(1,),
            padding=[(pad_low, pad_high)], rhs_dilation=(self.dilation,),
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            feature_group_count=self.groups,
            preferred_element_type=out_dtype)
        if self.bias is not None:
            y = y + self.bias.value
        return y

    def forward(self, x, seq_len=None):
        if seq_len is not None:
            from morgana_tpu.ops.masking import sequence_mask
            x = x * sequence_mask(seq_len, max_len=x.shape[1], dtype=x.dtype)
        total = self.context
        if self.padding == 'causal':
            return self._conv(x, total, 0)
        return self._conv(x, total // 2, total - total // 2)

    # ------------------------------------------------------------- streaming
    def init_stream_state(self):
        """Streaming protocol marker (the container feeds ``step`` a None
        state on the first chunk); only causal convolutions can stream."""
        return None

    def step(self, chunk, state):
        """One streamed chunk: convolves ``[context tail | chunk]`` with
        VALID padding — exactly the causal conv's output for these frames —
        and returns the new context tail as the carried state."""
        if self.padding != 'causal':
            raise NotImplementedError(
                "Conv1d(padding='same') cannot stream (needs future "
                "frames); build streaming models with padding='causal'.")
        ctx = self.context
        if ctx == 0:
            return self._conv(chunk, 0, 0), state
        if state is None:
            state = jnp.zeros((chunk.shape[0], ctx, self.in_channels),
                              chunk.dtype)
        x = jnp.concatenate([state, chunk], axis=1)
        y = self._conv(x, 0, 0)
        return y, x[:, x.shape[1] - ctx:]

    def __repr__(self):
        extras = []
        if self.dilation != 1:
            extras.append(f'dilation={self.dilation}')
        if self.groups != 1:
            extras.append(f'groups={self.groups}')
        extra = (', ' + ', '.join(extras)) if extras else ''
        return (f'Conv1d(in={self.in_channels}, out={self.out_channels}, '
                f'k={self.kernel_size}, {self.padding}{extra})')


class Sigmoid(Module):
    def forward(self, x):
        return jax.nn.sigmoid(x)

    def __repr__(self):
        return 'Sigmoid()'


class Tanh(Module):
    def forward(self, x):
        return jnp.tanh(x)

    def __repr__(self):
        return 'Tanh()'


class ReLU(Module):
    def forward(self, x):
        return jax.nn.relu(x)

    def __repr__(self):
        return 'ReLU()'


class GELU(Module):
    """Gaussian-error linear unit (exact erf form, matching
    ``torch.nn.GELU()`` for parity; elementwise, fuses on the VPU)."""

    def forward(self, x):
        return jax.nn.gelu(x, approximate=False)

    def __repr__(self):
        return 'GELU()'


class Recurrent(Module):
    """Masked scan LSTM/GRU stack — TPU replacement for the reference's
    ``RecurrentCuDNNWrapper`` (``morgana/utils.py:333-393``); no sorting or
    packing is needed on fixed-shape padded batches.

    Parameters use torch layout/naming conventions transposed to (in, gates)
    so parity tests can load torch RNN weights with a transpose.
    """

    def __init__(self, mode, input_size, hidden_size, num_layers=1, dropout=0.0,
                 unroll=8, compute_dtype=None, backend='scan', interpret=False,
                 remat=None, bidirectional=False):
        mode = mode.lower()
        if mode not in ('lstm', 'gru'):
            raise ValueError(f'Unsupported recurrent mode {mode!r}')
        if backend not in ('scan', 'pallas', 'wavefront'):
            raise ValueError(f'Unsupported backend {backend!r}')
        if bidirectional and backend != 'scan':
            raise ValueError('bidirectional currently uses the scan backend')
        self.mode = mode
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.dropout = Dropout(dropout) if dropout else None
        self.unroll = unroll
        self.compute_dtype = compute_dtype
        self.backend = backend
        self.interpret = interpret
        self.remat = remat
        self.bidirectional = bidirectional

        gates = 4 if mode == 'lstm' else 3
        bound = 1.0 / math.sqrt(hidden_size)
        num_directions = 2 if bidirectional else 1

        def make_weights(in_dim):
            return {
                'w_ih': Param(_uniform((in_dim, gates * hidden_size), bound)),
                'w_hh': Param(_uniform((hidden_size, gates * hidden_size), bound)),
                'b_ih': Param(_uniform((gates * hidden_size,), bound)),
                'b_hh': Param(_uniform((gates * hidden_size,), bound)),
            }

        self.layers = []
        self.layers_reverse = [] if bidirectional else None
        for layer in range(num_layers):
            in_dim = input_size if layer == 0 else hidden_size * num_directions
            self.layers.append(make_weights(in_dim))
            if bidirectional:
                self.layers_reverse.append(make_weights(in_dim))

    def named_parameters(self, prefix=''):
        for i, layer in enumerate(self.layers):
            for key, p in layer.items():
                yield f'{prefix}{key}_l{i}', p
            if self.bidirectional:
                for key, p in self.layers_reverse[i].items():
                    yield f'{prefix}{key}_l{i}_reverse', p
        if self.dropout is not None:
            yield from self.dropout.named_parameters(prefix=prefix + 'dropout.')

    def forward(self, inputs, hidden=None, seq_len=None):
        squeeze_time = inputs.ndim == 2
        if squeeze_time:
            inputs = inputs[:, None, :]

        if hidden is None:
            hidden = [None] * self.num_layers
        elif self.num_layers == 1 and not isinstance(hidden, list):
            hidden = [hidden]

        compute_dtype = self.compute_dtype
        if compute_dtype is None:
            compute_dtype = _DEFAULT_COMPUTE_DTYPE

        # The Pallas kernels are TPU programs; off-TPU (e.g. CPU analysis of a
        # model trained with backend='pallas'), fall back to the numerically
        # equivalent scan path unless interpret mode was requested.
        backend = self.backend
        if backend == 'pallas' and not self.interpret and not _on_tpu():
            backend = 'scan'
        if backend == 'pallas':
            # Quantized serving: the kernels take raw weight buffers, so
            # int8/int4 pytree leaves route to the numerically equivalent
            # scan path (which dequantises through ordinary jnp ops).
            from morgana_tpu.quantize import Int4QuantizedArray, QuantizedArray
            if any(isinstance(p.value, (QuantizedArray, Int4QuantizedArray))
                   for layer in self.layers for p in layer.values()):
                backend = 'scan'
        if self.backend == 'pallas' and backend == 'scan':
            # The kernels do all math in f32 (no compute_dtype knob), so
            # the 'numerically equivalent' fallback must not inherit a bf16
            # default — it would diverge from the pallas run far beyond
            # platform epsilon and break cross-platform parity audits.
            compute_dtype = None

        remat = self.remat if self.remat is not None else _DEFAULT_REMAT

        if backend == 'wavefront':
            # Whole stack as one diagonal-wavefront scan (~num_layers x fewer
            # sequential rounds; see ops.rnn.lstm_stack / gru_stack).
            weights = [(l['w_ih'].value, l['w_hh'].value,
                        l['b_ih'].value, l['b_hh'].value) for l in self.layers]
            if any(h is not None for h in hidden):
                # Match the scan backend exactly: zeros for absent layers.
                zero_state = lambda: jnp.zeros(
                    (inputs.shape[0], self.hidden_size), inputs.dtype)
                if self.mode == 'lstm':
                    h0s = [hc if hc is not None else (zero_state(), zero_state())
                           for hc in hidden]
                else:
                    h0s = [hc if hc is not None else zero_state()
                           for hc in hidden]
            else:
                h0s = None
            stack = rnn_ops.lstm_stack if self.mode == 'lstm' else rnn_ops.gru_stack

            # Inter-layer dropout: draw the L-1 scale masks here, in the SAME
            # order and shapes the sequential backend's per-boundary
            # ``dropout(x)`` calls would (dropout applied to ones IS the
            # scale mask), so the two backends stay numerically identical
            # under a shared rng. The stack applies mask j where layer j's
            # output feeds layer j+1 inside the diagonal scan.
            dropout_masks = None
            if (self.dropout is not None and self.num_layers > 1
                    and is_training()):
                ones = jnp.ones(
                    (inputs.shape[0], inputs.shape[1], self.hidden_size),
                    inputs.dtype)
                dropout_masks = [self.dropout(ones)
                                 for _ in range(self.num_layers - 1)]

            def stack_fn(x, *flat_weights):
                layer_w = [tuple(flat_weights[4 * i:4 * i + 4])
                           for i in range(self.num_layers)]
                return stack(x, layer_w, seq_len=seq_len, h0s=h0s,
                             unroll=self.unroll, compute_dtype=compute_dtype,
                             dropout_masks=dropout_masks)

            if remat:
                stack_fn = jax.checkpoint(stack_fn)
            x, new_hidden = stack_fn(inputs, *[w for lw in weights for w in lw])
            if squeeze_time:
                x = x[:, 0, :]
            if self.num_layers == 1:
                new_hidden = new_hidden[0]
            return x, new_hidden

        x = inputs
        new_hidden = []
        for i, layer in enumerate(self.layers):
            h0 = hidden[i]
            if self.bidirectional:
                x, h_pair = self._bidirectional_layer(i, x, seq_len, remat,
                                                      h0=h0,
                                                      compute_dtype=compute_dtype)
                new_hidden.append(h_pair)
                if self.dropout is not None and i < self.num_layers - 1:
                    x = self.dropout(x)
                continue
            if self.mode == 'lstm':
                h0c0 = (None, None) if h0 is None else h0
                if backend == 'pallas':
                    from morgana_tpu.ops.pallas_rnn import lstm_layer
                    fn = lambda x, w_ih, w_hh, b_ih, b_hh: lstm_layer(
                        x, w_ih, w_hh, b_ih, b_hh,
                        seq_len=seq_len, h0=h0c0[0], c0=h0c0[1],
                        interpret=self.interpret)
                else:
                    fn = lambda x, w_ih, w_hh, b_ih, b_hh: rnn_ops.lstm(
                        x, w_ih, w_hh, b_ih, b_hh,
                        seq_len=seq_len, h0=h0c0[0], c0=h0c0[1], unroll=self.unroll,
                        compute_dtype=compute_dtype)
                if remat:
                    fn = jax.checkpoint(fn)
                x, hc = fn(x, layer['w_ih'].value, layer['w_hh'].value,
                           layer['b_ih'].value, layer['b_hh'].value)
                new_hidden.append(hc)
            else:
                if backend == 'pallas':
                    from morgana_tpu.ops.pallas_gru import gru_layer
                    fn = lambda x, w_ih, w_hh, b_ih, b_hh: gru_layer(
                        x, w_ih, w_hh, b_ih, b_hh,
                        seq_len=seq_len, h0=h0, interpret=self.interpret)
                else:
                    fn = lambda x, w_ih, w_hh, b_ih, b_hh: rnn_ops.gru(
                        x, w_ih, w_hh, b_ih, b_hh,
                        seq_len=seq_len, h0=h0, unroll=self.unroll,
                        compute_dtype=compute_dtype)
                if remat:
                    fn = jax.checkpoint(fn)
                x, h = fn(x, layer['w_ih'].value, layer['w_hh'].value,
                          layer['b_ih'].value, layer['b_hh'].value)
                new_hidden.append(h)
            if self.dropout is not None and i < self.num_layers - 1:
                x = self.dropout(x)

        if squeeze_time:
            x = x[:, 0, :]
        if self.num_layers == 1:
            new_hidden = new_hidden[0]
        return x, new_hidden

    def _bidirectional_layer(self, i, x, seq_len, remat, h0=None,
                             compute_dtype=None):
        """Runs one bidirectional layer: the backward direction consumes the
        within-length-reversed sequence so its recurrence starts at each
        sequence's last valid frame (pack/unpack semantics), then its outputs
        are reversed back and concatenated with the forward direction.
        ``h0`` is the per-direction initial-state pair (state_f, state_b),
        matching the (h_f, h_b) this layer returns."""
        fwd_w, bwd_w = self.layers[i], self.layers_reverse[i]
        cell = rnn_ops.lstm if self.mode == 'lstm' else rnn_ops.gru
        h0_f, h0_b = (None, None) if h0 is None else h0

        def run(weights, seq, init):
            if self.mode == 'lstm':
                init_kw = {'h0': None if init is None else init[0],
                           'c0': None if init is None else init[1]}
            else:
                init_kw = {'h0': init}
            fn = lambda seq, w_ih, w_hh, b_ih, b_hh: cell(
                seq, w_ih, w_hh, b_ih, b_hh, seq_len=seq_len,
                unroll=self.unroll, compute_dtype=compute_dtype, **init_kw)
            if remat:
                fn = jax.checkpoint(fn)
            return fn(seq, weights['w_ih'].value, weights['w_hh'].value,
                      weights['b_ih'].value, weights['b_hh'].value)

        y_f, h_f = run(fwd_w, x, h0_f)
        x_rev = rnn_ops.reverse_sequences(x, seq_len)
        y_b, h_b = run(bwd_w, x_rev, h0_b)
        y_b = rnn_ops.reverse_sequences(y_b, seq_len)
        return jnp.concatenate([y_f, y_b], axis=-1), (h_f, h_b)

    def __repr__(self):
        return (f'Recurrent({self.mode.upper()}, in={self.input_size}, '
                f'hidden={self.hidden_size}, layers={self.num_layers})')


def LSTM(input_size, hidden_size, num_layers=1, dropout=0.0):
    return Recurrent('lstm', input_size, hidden_size, num_layers, dropout)


def GRU(input_size, hidden_size, num_layers=1, dropout=0.0):
    return Recurrent('gru', input_size, hidden_size, num_layers, dropout)


# ---------------------------------------------------------------------------
# Attention / Transformer (beyond-reference: the MXU-native sequence mixer;
# the reference framework is RNN-only, morgana/utils.py:333-393)
# ---------------------------------------------------------------------------

class MultiHeadAttention(Module):
    """Multi-head self/cross attention over padded batches.

    The QKV projection is ONE fused ``(B, T, E) @ (E, 3E)`` matmul (MXU-sized
    instead of three small ones); masking is additive on the logits
    (:mod:`morgana_tpu.ops.attention`), so variable-length batches share a
    single static-shape program. Parameter names (`in_proj.*`, `out_proj.*`)
    mirror ``torch.nn.MultiheadAttention`` so parity tests and
    :mod:`morgana_tpu.migrate` can load torch weights with a transpose.

    Backends (``backend=``):

    - ``'auto'`` (default): ``'splash'`` whenever eligible (on TPU, self-
      attention, no attention-probability dropout, bucket length >= 256
      BEFORE alignment — eligible lengths are then padded internally to
      the kernel's block layout, masked and sliced back), else ``'xla'``. Measured on the flagship shape (B32 x T640,
      E512): the XLA path is HBM-bound on the materialised T x T tensors
      (XLA cost analysis: ~52 GB/step over the 6-layer model = the observed
      ~60 ms), and the splash kernel's online-softmax streaming removes
      exactly that traffic — 1.3-1.4x faster attention fwd+bwd at dh=64
      and 1.4x at dh=128 (see BASELINE.md round-4 A/B).
    - ``'xla'``: two einsums + f32 softmax with additive masking — exact,
      runs everywhere, and the fallback for every ineligible case.
    - ``'splash'``: force the fused TPU kernel
      (``jax.experimental.pallas.ops.tpu.splash_attention``); falls back to
      ``'xla'`` off-TPU or when ineligible, like ``'auto'``.
    - ``'flash'``: the older fused kernel
      (``pallas.ops.tpu.flash_attention``) — kept as a tested reference;
      measured ~2x SLOWER than the XLA path at acoustic shapes (both in the
      round-3 throttled window and the round-4 healthy window), so never
      auto-selected.
    """

    def __init__(self, embed_dim, num_heads, dropout=0.0, bias=True,
                 backend='auto'):
        if embed_dim % num_heads != 0:
            raise ValueError(
                f'embed_dim {embed_dim} not divisible by num_heads {num_heads}')
        if backend not in ('auto', 'xla', 'flash', 'splash'):
            raise ValueError(f'Unsupported attention backend {backend!r}')
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.dropout_p = float(dropout)
        self.backend = backend
        self.in_proj = Linear(embed_dim, 3 * embed_dim, bias=bias)
        self.out_proj = Linear(embed_dim, embed_dim, bias=bias)

    def forward(self, x, seq_len=None, causal=False, kv=None, kv_seq_len=None,
                window=None):
        """Self-attention over ``x`` (batch, T, E); pass ``kv`` for
        cross-attention (queries from ``x``, keys/values from ``kv``).
        ``window`` (with ``causal=True``) restricts each query to the last
        ``window`` keys — the streamable sliding-window form."""
        if window is not None and not causal:
            # Silently computing FULL attention here would make batch
            # forward(window=W) diverge from step()'s always-windowed
            # streaming (same check TransformerEncoder does at build time).
            raise ValueError('window (sliding-window attention) requires '
                             'causal=True')
        batch, q_len, _ = x.shape
        compute_dtype = _DEFAULT_COMPUTE_DTYPE

        if kv is None:
            qkv = self.in_proj(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            k_len, k_seq_len = q_len, seq_len
        else:
            if causal:
                raise ValueError('causal cross-attention is not supported: '
                                 'causal masking needs a query/key position '
                                 'alignment that cross-attention lacks')
            # Cross-attention reuses the fused projection's three slices,
            # in the same compute dtype Linear would use (_matmul).
            w = self.in_proj.weight.value
            b = self.in_proj.bias.value if self.in_proj.bias is not None else None
            wq, wk, wv = jnp.split(w, 3, axis=-1)
            bq, bk, bv = (jnp.split(b, 3) if b is not None else (0., 0., 0.))
            q = _matmul(x, wq) + bq
            k = _matmul(kv, wk) + bk
            v = _matmul(kv, wv) + bv
            k_len, k_seq_len = kv.shape[1], kv_seq_len

        def to_heads(t, length):
            return t.reshape(batch, length, self.num_heads,
                             self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q, q_len), to_heads(k, k_len), to_heads(v, k_len)

        # The fused TPU kernels compute exact attention in O(B·T·E) HBM
        # traffic (no materialised T x T probabilities). They fall back to
        # the XLA path (same math) off-TPU, for cross attention, and when
        # attention-probability dropout is active (no dropout hook).
        dropout_p = self.dropout_p if is_training() else 0.0
        if (self.backend in ('auto', 'splash') and kv is None
                and dropout_p == 0.0 and q_len >= 256 and _on_tpu()):
            out = self._splash(q, k, v, seq_len, causal, window,
                               compute_dtype)
            out = out.transpose(0, 2, 1, 3).reshape(batch, q_len,
                                                    self.embed_dim)
            return self.out_proj(out)
        if (self.backend == 'flash' and kv is None and window is None
                and dropout_p == 0.0 and _on_tpu()):
            out = self._flash(q, k, v, seq_len, causal, compute_dtype)
            out = out.transpose(0, 2, 1, 3).reshape(batch, q_len,
                                                    self.embed_dim)
            return self.out_proj(out)

        bias_term = None
        if k_seq_len is not None:
            bias_term = attention_ops.padding_bias(k_seq_len, k_len)
        if causal:
            cb = (attention_ops.local_causal_bias(q_len, window)
                  if window else attention_ops.causal_bias(q_len))
            bias_term = cb if bias_term is None else bias_term + cb

        out = attention_ops.scaled_dot_product_attention(
            q, k, v, bias=bias_term, dropout_p=dropout_p,
            dropout_rng=next_rng() if dropout_p > 0 else None,
            compute_dtype=compute_dtype)
        out = out.transpose(0, 2, 1, 3).reshape(batch, q_len, self.embed_dim)
        return self.out_proj(out)

    def _splash_kernel(self, q_len, block, causal, window):
        """Builds (and caches) the splash-attention kernel for one padded
        length / block / mask shape. Block-size policy (see
        :meth:`_splash_layout`), measured on the flagship shape
        (BASELINE.md round-4 A/B): whole-sequence blocks with the fused
        backward kernel are the fast configuration at acoustic lengths
        (14.4 -> 5.2 ms fwd+bwd at T=640 vs 128-blocks) — the kernel then
        streams KV in one pass per query block with no revisits; past
        T=1024 blocks cap at >= 512 (the length is padded to divide)."""
        cache = getattr(self, '_splash_cache', None)
        if cache is None:
            cache = self._splash_cache = {}
        key = (q_len, block, self.num_heads, bool(causal), window)
        kernel = cache.get(key)
        if kernel is None:
            from jax.experimental.pallas.ops.tpu.splash_attention import (
                splash_attention_kernel as sk, splash_attention_mask as sm)
            if window is not None:
                head_mask = sm.LocalMask((q_len, q_len),
                                         window_size=(window - 1, 0),
                                         offset=0)
            elif causal:
                head_mask = sm.CausalMask((q_len, q_len))
            else:
                head_mask = sm.FullMask((q_len, q_len))
            mask = sm.MultiHeadMask([head_mask] * self.num_heads)
            bs = sk.BlockSizes(
                block_q=block, block_kv=block, block_kv_compute=block,
                block_q_dkv=block, block_kv_dkv=block,
                block_kv_dkv_compute=block, use_fused_bwd_kernel=True)
            kernel = cache[key] = sk.make_splash_mha(
                mask, head_shards=1, q_seq_shards=1, block_sizes=bs)
        return kernel

    @staticmethod
    def _splash_layout(q_len):
        """``(padded_len, block)`` for one raw padded length: pad to the
        next 128 multiple and use whole-sequence blocks at acoustic
        lengths (the measured-fastest configuration). Past 1024, pad to
        the next 512 multiple instead so the block stays >= 512 — blocks
        must divide the sequence, and narrow 128-wide blocks measured
        ~2.8x slower (BASELINE.md round-4 A/B); a few extra masked frames
        are far cheaper (e.g. 1408 -> 1536 with block 768, not 1408 with
        block 128)."""
        if q_len <= 1024:
            padded = -(-q_len // 128) * 128
            return padded, padded
        padded = -(-q_len // 128) * 128
        for block in (1024, 896, 768, 640, 512):
            if padded % block == 0:
                return padded, block
        padded = -(-padded // 512) * 512
        block = next(b for b in (1024, 768, 512) if padded % b == 0)
        return padded, block

    def _splash(self, q, k, v, seq_len, causal, window, compute_dtype):
        """Exact attention via the fused TPU splash kernel
        (``jax.experimental.pallas.ops.tpu.splash_attention`` — online
        softmax, no materialised T x T tensors, custom fused backward).
        Padding enters as segment ids (padded frames form their own
        segment); the kernel applies no logit scale, so q is pre-scaled by
        ``1/sqrt(head_dim)``. Padded query rows are NOT defined outputs:
        all pad positions share segment id 0, so a padded query attends the
        padded keys and returns whatever the padding activations (e.g.
        projection biases) produce — garbage, exactly like the flash/XLA
        paths' pad rows. Downstream consumers must mask by ``seq_len``
        (the sequence-masked losses/metrics already do).
        """
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk)

        out_dtype = q.dtype
        if compute_dtype is not None:
            q, k, v = (t.astype(compute_dtype) for t in (q, k, v))
        q_len = q.shape[2]
        # The kernel wants a sequence length its block size divides; length
        # buckets (data/dataset.py::bucket_size) often are not aligned
        # (320, 576, ...), so pad to the layout's length — the pad frames
        # are masked out as invalid segment positions and sliced off the
        # output, which keeps splash engaged for EVERY bucket instead of
        # silently falling back on non-aligned ones.
        padded_len, block = self._splash_layout(q_len)
        pad = padded_len - q_len
        if pad:
            q, k, v = (jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
                       for t in (q, k, v))
        # Pre-scale in f32: bf16 q values keep their exponent range.
        q = (q.astype(jnp.float32) / math.sqrt(self.head_dim)).astype(q.dtype)
        kernel = self._splash_kernel(padded_len, block, causal, window)
        if seq_len is not None:
            sl = jnp.asarray(seq_len)
            if sl.ndim == 2:
                sl = sl[:, 0]
        else:
            # No ragged lengths — but the pad frames (if any) must still be
            # hidden from every real query/key.
            sl = jnp.full((q.shape[0],), q_len, jnp.int32)
        valid = (jnp.arange(padded_len)[None, :]
                 < sl[:, None]).astype(jnp.int32)

        def per_example(q1, k1, v1, valid1):
            return kernel(q1, k1, v1,
                          segment_ids=sk.SegmentIds(q=valid1, kv=valid1))

        out = jax.vmap(per_example)(q, k, v, valid)
        if pad:
            out = out[:, :, :q_len]
        return out.astype(out_dtype)

    def _flash(self, q, k, v, seq_len, causal, compute_dtype):
        """Exact attention via the fused TPU kernel
        (``jax.experimental.pallas.ops.tpu.flash_attention``); padding
        enters as segment ids (padded frames form their own segment, so
        they only see each other and stay finite)."""
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        out_dtype = q.dtype
        if compute_dtype is not None:
            q, k, v = (t.astype(compute_dtype) for t in (q, k, v))
        seg = None
        if seq_len is not None:
            sl = jnp.asarray(seq_len)
            if sl.ndim == 2:
                sl = sl[:, 0]
            valid = (jnp.arange(q.shape[2])[None, :]
                     < sl[:, None]).astype(jnp.int32)
            seg = fa.SegmentIds(q=valid, kv=valid)
        out = fa.flash_attention(q, k, v, segment_ids=seg, causal=causal,
                                 sm_scale=1.0 / math.sqrt(self.head_dim))
        return out.astype(out_dtype)

    def step(self, x, cache_k, cache_v, pos, window):
        """One streamed chunk of sliding-window causal self-attention.

        ``x`` is (batch, chunk, E) at absolute positions ``pos + i``;
        ``cache_k``/``cache_v`` are the previous ``window`` frames'
        projected keys/values (batch, window, E), zero-filled before the
        stream starts (masked out by :func:`ops.attention.streaming_bias`
        while absolute positions are negative). Returns
        ``(out, new_cache_k, new_cache_v)`` — numerically identical to
        :meth:`forward` with ``causal=True, window=window`` on the full
        sequence, chunk boundaries included.
        """
        batch, chunk, _ = x.shape
        qkv = self.in_proj(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        k_full = jnp.concatenate([cache_k, k], axis=1)      # (B, W+C, E)
        v_full = jnp.concatenate([cache_v, v], axis=1)

        def to_heads(t):
            return t.reshape(batch, t.shape[1], self.num_heads,
                             self.head_dim).transpose(0, 2, 1, 3)

        bias = attention_ops.streaming_bias(pos, chunk, window)
        out = attention_ops.scaled_dot_product_attention(
            to_heads(q), to_heads(k_full), to_heads(v_full), bias=bias,
            compute_dtype=_DEFAULT_COMPUTE_DTYPE)
        out = out.transpose(0, 2, 1, 3).reshape(batch, chunk, self.embed_dim)
        # The cache keeps the most recent `window` frames. With chunk >=
        # window this is a pure slice of the chunk; otherwise it shifts.
        return self.out_proj(out), k_full[:, -cache_k.shape[1]:], \
            v_full[:, -cache_v.shape[1]:]

    def __repr__(self):
        return (f'MultiHeadAttention(embed={self.embed_dim}, '
                f'heads={self.num_heads})')


class MoEFeedForward(Module):
    """Mixture-of-experts FFN (Switch-Transformer-style top-1 routing) — the
    sparse drop-in for a dense ``Linear -> GELU -> Linear`` block, designed
    for **expert parallelism** over a TPU mesh.

    TPU-native formulation: routing is expressed as dense one-hot dispatch
    einsums (MXU work, static shapes — no ragged gathers), grouped per batch
    row so the dispatch tensor stays ``(B, T, E, C)`` rather than quadratic
    in total tokens. Every expert processes a fixed capacity
    ``C = ceil(capacity_factor * T / E)`` tokens per row; overflow tokens
    pass through on the residual path (standard Switch semantics). A
    load-balancing auxiliary loss (``E * sum_e f_e * p_e``, Fedus et al.
    2021 eq. 4) is registered via :func:`aux_loss` during training; the
    fused train step collects it automatically.

    Expert parallelism: pass ``mesh`` (with an ``'expert'`` axis) and the
    stacked expert parameters + dispatched ``(B, E, C, d)`` activations are
    sharding-constrained onto it — XLA inserts the token all-to-all (GSPMD,
    same stance as data parallelism; cf. parallel/tp_rnn.py for the
    hand-collective alternative style). Padded frames (beyond ``seq_len``)
    are excluded from routing, capacity and the balance loss.
    """

    accepts_seq_len = True

    def __init__(self, d_model, d_ff, num_experts, capacity_factor=1.25,
                 aux_weight=0.01, mesh=None, expert_axis='expert'):
        if num_experts < 1:
            raise ValueError(f'num_experts must be >= 1, got {num_experts}')
        self.d_model = d_model
        self.d_ff = d_ff
        self.num_experts = int(num_experts)
        self.capacity_factor = float(capacity_factor)
        self.aux_weight = float(aux_weight)
        self._mesh = mesh
        self.expert_axis = expert_axis
        self.router = Linear(d_model, num_experts, bias=False)
        bound_in = 1.0 / math.sqrt(d_model)
        bound_out = 1.0 / math.sqrt(d_ff)
        self.w_in = Param(_uniform((num_experts, d_model, d_ff), bound_in))
        self.b_in = Param(_uniform((num_experts, d_ff), bound_in))
        self.w_out = Param(_uniform((num_experts, d_ff, d_model), bound_out))
        self.b_out = Param(_uniform((num_experts, d_model), bound_out))

    def capacity(self, frames):
        return max(1, min(frames, int(math.ceil(
            self.capacity_factor * frames / self.num_experts))))

    def _constrain(self, t, spec_prefix):
        if self._mesh is None or self.expert_axis not in self._mesh.shape:
            return t
        from jax.sharding import NamedSharding, PartitionSpec
        spec = PartitionSpec(*spec_prefix)
        return jax.lax.with_sharding_constraint(
            t, NamedSharding(self._mesh, spec))

    def forward(self, x, seq_len=None):
        batch, frames, d_model = x.shape
        num_experts, cap = self.num_experts, self.capacity(frames)
        cd = _DEFAULT_COMPUTE_DTYPE

        # Router in float32: softmax balance statistics must stay exact.
        logits = jnp.dot(x.astype(jnp.float32),
                         self.router.weight.value.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)            # (B, T, E)
        gate = jnp.max(probs, axis=-1)                     # (B, T)
        expert = jnp.argmax(probs, axis=-1)                # (B, T)

        if seq_len is not None:
            valid = (jnp.arange(frames)[None, :]
                     < jnp.asarray(seq_len).reshape(batch, 1)).astype(jnp.float32)
        else:
            valid = jnp.ones((batch, frames), jnp.float32)

        onehot = jax.nn.one_hot(expert, num_experts,
                                dtype=jnp.float32) * valid[..., None]
        # Position of each token within its expert's per-row capacity.
        position = jnp.cumsum(onehot, axis=1) * onehot     # 1-based, (B,T,E)
        keep = onehot * (position <= cap)
        slot = jax.nn.one_hot((position - 1.0).astype(jnp.int32), cap,
                              dtype=x.dtype) * keep[..., None].astype(x.dtype)

        # Dispatch -> expert FFNs -> combine: three MXU einsums over static
        # shapes. The (B, E, C, d) blocks and (E, d, ff) weights carry the
        # 'expert' sharding; XLA turns the dispatch into the token
        # all-to-all when experts live on different devices.
        # Constraining the stacked weights (leading E axis over 'expert')
        # is what makes expert parallelism a MEMORY win, not just a compute
        # layout: with the stored parameters placed by
        # ``parallel.mesh.expert_param_shardings`` each device holds only
        # its E/e experts (and their Adam moments), and these constraints
        # keep XLA from gathering the full stack at use.
        w_in = self._constrain(self.w_in.value, (self.expert_axis,))
        b_in = self._constrain(self.b_in.value, (self.expert_axis,))
        w_out = self._constrain(self.w_out.value, (self.expert_axis,))
        b_out = self._constrain(self.b_out.value, (self.expert_axis,))
        if cd is not None:
            x_c, w_in_c, w_out_c = x.astype(cd), w_in.astype(cd), w_out.astype(cd)
            slot_c = slot.astype(cd)
        else:
            x_c, w_in_c, w_out_c, slot_c = x, w_in, w_out, slot
        dispatched = jnp.einsum('btec,btd->becd', slot_c, x_c,
                                preferred_element_type=x.dtype)
        dispatched = self._constrain(dispatched, (None, self.expert_axis))
        h = jnp.einsum('becd,edf->becf',
                       dispatched.astype(cd) if cd is not None else dispatched,
                       w_in_c, preferred_element_type=x.dtype)
        h = jax.nn.gelu(h + b_in[None, :, None, :], approximate=False)
        out = jnp.einsum('becf,efd->becd',
                         h.astype(cd) if cd is not None else h, w_out_c,
                         preferred_element_type=x.dtype)
        out = out + b_out[None, :, None, :]
        out = self._constrain(out, (None, self.expert_axis))
        y = jnp.einsum('btec,becd->btd', slot_c, out.astype(slot_c.dtype),
                       preferred_element_type=x.dtype)
        y = y * gate[..., None].astype(y.dtype)

        if is_training() and self.aux_weight:
            # Switch load-balancing loss over VALID tokens: E * sum_e f_e*p_e
            # (= 1 at perfect balance; each term sees gradients through p).
            denom = jnp.maximum(valid.sum(), 1.0)
            frac = jnp.sum(onehot, axis=(0, 1)) / denom
            mean_prob = jnp.sum(probs * valid[..., None], axis=(0, 1)) / denom
            aux_loss(self.aux_weight * num_experts
                     * jnp.sum(frac * mean_prob))
        return y

    def __repr__(self):
        return (f'MoEFeedForward(d_model={self.d_model}, d_ff={self.d_ff}, '
                f'experts={self.num_experts}, '
                f'capacity_factor={self.capacity_factor})')


class TransformerEncoderLayer(Module):
    """Pre-LN Transformer block: ``x + attn(LN(x))`` then ``x + ffn(LN(x))``
    (pre-norm trains stably without warmup at these depths). The FFN is two
    MXU matmuls around a GELU."""

    # SequentialWithRecurrent threads seq_len into members advertising this.
    accepts_seq_len = True

    def __init__(self, d_model, num_heads, d_ff, dropout=0.0,
                 attention_backend='auto', moe=None):
        self.attn_norm = LayerNorm(d_model)
        self.attn = MultiHeadAttention(d_model, num_heads, dropout=dropout,
                                       backend=attention_backend)
        self.ffn_norm = LayerNorm(d_model)
        if moe:
            # Sparse FFN: Switch-style mixture of experts (`moe` is the
            # MoEFeedForward kwarg dict, e.g. {'num_experts': 8}).
            self.moe = MoEFeedForward(d_model, d_ff, **moe)
            self.ffn_in = self.ffn_act = self.ffn_out = None
        else:
            self.moe = None
            self.ffn_in = Linear(d_model, d_ff)
            self.ffn_act = GELU()
            self.ffn_out = Linear(d_ff, d_model)
        self.dropout = Dropout(dropout) if dropout else None

    def forward(self, x, seq_len=None, causal=False, window=None):
        h = self.attn(self.attn_norm(x), seq_len=seq_len, causal=causal,
                      window=window)
        if self.dropout is not None:
            h = self.dropout(h)
        x = x + h
        x = x + self._ffn(x, seq_len=seq_len)
        return x

    def _ffn(self, x, seq_len=None):
        if self.moe is not None:
            h = self.moe(self.ffn_norm(x), seq_len=seq_len)
        else:
            h = self.ffn_out(self.ffn_act(self.ffn_in(self.ffn_norm(x))))
        if self.dropout is not None:
            h = self.dropout(h)
        return h

    def step(self, x, cache, pos, window):
        """Streamed-chunk form of :meth:`forward` (inference; dropout is a
        no-op outside training). ``cache`` is this block's (k, v) pair."""
        cache_k, cache_v = cache
        h, cache_k, cache_v = self.attn.step(
            self.attn_norm(x), cache_k, cache_v, pos, window)
        x = x + h
        return x + self._ffn(x), (cache_k, cache_v)

    def __repr__(self):
        ffn = (repr(self.moe) if self.moe is not None
               else f'd_ff={self.ffn_in.out_features}')
        return (f'TransformerEncoderLayer(d_model={self.attn.embed_dim}, '
                f'heads={self.attn.num_heads}, {ffn})')


class TransformerEncoder(Module):
    """A stack of pre-LN encoder blocks with sinusoidal positions at entry
    and a final LayerNorm. Call signature ``(x, seq_len=None)`` matches the
    container threading, so models drop it into
    :class:`SequentialWithRecurrent` exactly like a :class:`Recurrent`
    stack. ``remat=True`` rematerialises each block in the backward pass
    (O(depth) instead of O(depth·T) activation memory)."""

    accepts_seq_len = True

    def __init__(self, num_layers, d_model, num_heads, d_ff, dropout=0.0,
                 add_positions=True, causal=False, window=None, remat=None,
                 attention_backend='auto', moe=None, moe_every=2,
                 activation_sharding=None):
        if window is not None and not causal:
            raise ValueError('window (sliding-window attention) requires '
                             'causal=True')
        self.d_model = d_model
        self.add_positions = add_positions
        self.causal = causal
        self.window = window
        self.remat = remat
        # Sequence parallelism (GSPMD): a NamedSharding over (batch, time,
        # features) committed at entry and re-committed after every block.
        # Elementwise/FFN/LayerNorm work runs fully sharded along the time
        # axis; for the attention inner product XLA inserts the K/V
        # all-gather (and its reduce-scatter transpose in the backward) —
        # the compiler-owns-the-collectives stance, same as DP.
        self.activation_sharding = activation_sharding
        # With `moe` (a MoEFeedForward kwarg dict), every `moe_every`-th
        # block's dense FFN becomes a sparse expert mixture — the standard
        # interleaving (Switch/GLaM use every other layer).
        self.blocks = ModuleList([
            TransformerEncoderLayer(
                d_model, num_heads, d_ff, dropout=dropout,
                attention_backend=attention_backend,
                moe=moe if (moe and i % moe_every == moe_every - 1) else None)
            for i in range(num_layers)])
        self.norm = LayerNorm(d_model)

    def forward(self, x, seq_len=None):
        if self.add_positions:
            # Constant-folds under jit (static max_len); scaled like the
            # canonical Transformer so positions don't swamp small inputs.
            x = x + attention_ops.sinusoidal_positions(
                x.shape[1], self.d_model, dtype=x.dtype)
        remat = self.remat if self.remat is not None else _DEFAULT_REMAT

        def constrain(t):
            if self.activation_sharding is None:
                return t
            return jax.lax.with_sharding_constraint(t, self.activation_sharding)

        x = constrain(x)
        for block in self.blocks:
            if remat:
                # Params flow through `bind` (module attrs), so checkpointing
                # the x->y closure is enough: residuals recompute per block.
                # Aux losses (MoE load balance) registered while the closure
                # is traced belong to the checkpoint's inner trace — leaving
                # them on the bind frame would leak those tracers to the
                # outer step (UnexpectedTracerError). They are captured in
                # the closure, returned as a real checkpoint output and
                # re-registered outside; jax.checkpoint traces the closure
                # exactly once, so the frame bookkeeping stays balanced.
                def run(t, b=block):
                    frame = _ctx()[-1] if _ctx() else None
                    n_aux = len(frame['aux']) if frame is not None else 0
                    y = b(t, seq_len=seq_len, causal=self.causal,
                          window=self.window)
                    aux = 0.0
                    if frame is not None and len(frame['aux']) > n_aux:
                        aux = sum(frame['aux'][n_aux:])
                        del frame['aux'][n_aux:]
                    return y, jnp.asarray(aux, jnp.float32)

                x, aux = jax.checkpoint(run)(x)
                aux_loss(aux)
            else:
                x = block(x, seq_len=seq_len, causal=self.causal,
                          window=self.window)
            x = constrain(x)
        return self.norm(x)

    def init_stream_state(self, batch, dtype=jnp.float32):
        """Zero KV caches + position counter for :meth:`step`."""
        if not (self.causal and self.window):
            raise ValueError(
                'streaming needs causal=True and a finite window '
                '(bidirectional attention requires the full utterance)')
        caches = [(jnp.zeros((batch, self.window, self.d_model), dtype),
                   jnp.zeros((batch, self.window, self.d_model), dtype))
                  for _ in self.blocks]
        return {'pos': jnp.zeros((), jnp.int32), 'caches': caches}

    def step(self, x, state):
        """Streamed chunk (batch, C, d_model) -> (y, new_state); chaining
        chunks reproduces :meth:`forward` on the concatenated sequence
        exactly (same windowed-causal bias, positions at true offsets)."""
        if state is None:
            state = self.init_stream_state(x.shape[0], dtype=x.dtype)
        pos, caches = state['pos'], state['caches']
        if self.add_positions:
            x = x + attention_ops.sinusoidal_positions_at(
                pos + jnp.arange(x.shape[1]), self.d_model,
                dtype=x.dtype)
        new_caches = []
        for block, cache in zip(self.blocks, caches):
            x, cache = block.step(x, cache, pos, self.window)
            new_caches.append(cache)
        return self.norm(x), {'pos': pos + x.shape[1], 'caches': new_caches}

    def __repr__(self):
        return (f'TransformerEncoder(layers={len(self.blocks)}, '
                f'd_model={self.d_model})')


class SequentialWithRecurrent(Module):
    """Sequential container threading (hiddens, seq_len) through recurrent
    members — same contract as the reference (``morgana/utils.py:396-418``)."""

    def __init__(self, *modules):
        self.items = list(modules)

    def named_parameters(self, prefix=''):
        for i, item in enumerate(self.items):
            if isinstance(item, Module):
                yield from item.named_parameters(prefix=f'{prefix}{i}.')

    def forward(self, input, hiddens=None, seq_len=None, return_hiddens=False):
        if hiddens is None:
            hiddens = [None] * len(self.items)
        else:
            # Never mutate the caller's state list: a streaming client that
            # keeps the previous chunk's state for retry/rollback must not
            # find it silently overwritten with the post-chunk state.
            hiddens = list(hiddens)
        for i, module in enumerate(self.items):
            if isinstance(module, Recurrent):
                input, hiddens[i] = module(input, hiddens[i], seq_len)
            elif getattr(module, 'accepts_seq_len', False):
                if return_hiddens and hasattr(module, 'init_stream_state'):
                    # Streaming: chunked attention carries its KV caches in
                    # the member's hidden slot, like a recurrent state.
                    # (Gated on the full streaming contract — a bare
                    # TransformerEncoderLayer has a `step` too, but with a
                    # per-block signature this container cannot drive.)
                    input, hiddens[i] = module.step(input, hiddens[i])
                elif return_hiddens:
                    raise NotImplementedError(
                        f'{type(module).__name__} cannot stream: wrap '
                        'attention blocks in a TransformerEncoder (causal + '
                        'window) for chunked inference.')
                else:
                    # Batch path: attention members need the lengths (for
                    # the padding mask) but are stateless across calls.
                    input = module(input, seq_len=seq_len)
            else:
                input = module(input)
        if return_hiddens:
            # Streaming/chunked inference: thread the recurrent members'
            # final states back in so the next chunk continues exactly where
            # this one stopped (state slots for non-recurrent members stay
            # None and pass through untouched).
            return input, hiddens
        return input

    def __repr__(self):
        lines = ['SequentialWithRecurrent(']
        for i, item in enumerate(self.items):
            sub = repr(item).replace('\n', '\n  ')
            lines.append(f'  ({i}): {sub}')
        lines.append(')')
        return '\n'.join(lines)


# ---------------------------------------------------------------------------
# EMA (API-parity helper; the fused train step updates EMA on device)
# ---------------------------------------------------------------------------

def ema_update(ema_params, params, decay):
    """One EMA step on parameter pytrees:
    ``shadow = shadow - (1 - decay) * (shadow - x)`` (``morgana/utils.py:443-448``)."""
    return jax.tree_util.tree_map(
        lambda s, x: s - (1.0 - decay) * (s - x), ema_params, params)


class ExponentialMovingAverage:
    """Object-API parity with the reference's EMA helper
    (``morgana/utils.py:421-456``): wraps a separate averaged model whose
    parameters are updated towards another model's parameters."""

    def __init__(self, model, decay):
        self.model = model
        self.decay = decay

    def update_params(self, other_model):
        assert other_model is not self.model
        new = ema_update(parameters(self.model), parameters(other_model), self.decay)
        load_parameters(self.model, new)
