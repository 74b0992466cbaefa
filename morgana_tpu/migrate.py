"""Migration from reference (PyTorch) checkpoints (API + CLI).

Users switching from the torch reference can load their trained
``state_dict``s directly: this module maps torch parameter names/layouts onto
:mod:`morgana_tpu.nn` modules —

* ``Linear.weight`` (out, in)            -> ``weight`` (in, out), transposed
* ``RecurrentCuDNNWrapper.layer.weight_ih_l0`` (gates, in)
                                          -> ``w_ih_l0`` (in, gates), transposed
* ``TransformerEncoderLayer`` attributes (``self_attn.in_proj_weight``,
  ``linear1``, ``norm1``, ...)           -> our pre-LN block names
  (``attn.in_proj.weight``, ``ffn_in``, ``attn_norm``, ...), matrices
  transposed
* biases copy through unchanged; gate orders already match (torch layout).

Works on ``.pt`` files (requires torch importable) or already-loaded
``{name: tensor/ndarray}`` dicts.

CLI: one-command checkpoint conversion for users porting from the torch
reference (see docs/porting_guide) —

    python -m morgana_tpu.migrate --model models/rnn_spss.py:LSTMAcousticModel \\
        --torch_checkpoint experiments/x/checkpoints/epoch_50.pt \\
        --out epoch_50.npz

writes an ``epoch_{N}.npz`` loadable by ``--checkpoint_path`` / the serving
CLIs. ``--print_map`` shows the our-name -> torch-name parameter mapping
without converting anything.
"""
import argparse
import ast
import json
import os

import numpy as np

from morgana_tpu import nn

__all__ = ['torch_name_map', 'convert_torch_state_dict',
           'load_torch_state_dict', 'main']


def _is_transposed_matrix(name):
    leaf = name.rsplit('.', 1)[-1]
    return leaf == 'weight' or leaf.startswith('w_ih_l') or leaf.startswith('w_hh_l')


# Our pre-LN Transformer block's submodule names -> torch's
# ``nn.TransformerEncoderLayer`` attribute names.
_TFM_BLOCK_RENAME = {'attn': 'self_attn', 'attn_norm': 'norm1',
                     'ffn_norm': 'norm2', 'ffn_in': 'linear1',
                     'ffn_out': 'linear2'}


def _child(module, part):
    """Descends one name segment, mirroring ``nn.Module.named_parameters``'s
    traversal (attribute, indexed container, or plain list/tuple/dict)."""
    if isinstance(module, (nn.SequentialWithRecurrent, nn.ModuleList)):
        if part == 'items':          # ModuleList's storage attribute appears
            return module            # as a name segment; stay on the list.
        return module.items[int(part)]
    if isinstance(module, (list, tuple)):
        return module[int(part)]
    if isinstance(module, dict):
        return module[part]
    return getattr(module, part)


def _owning_module(model, name):
    """The module that owns parameter ``name``."""
    module = model
    for part in name.split('.')[:-1]:
        module = _child(module, part)
    return module


def torch_name_map(model):
    r"""Builds {our_name: torch_name} for a model built from
    ``nn.Linear``/``nn.Recurrent``/``nn.SequentialWithRecurrent`` modules
    (submodules held in plain list/tuple/dict attributes are supported, as
    in ``nn.Module.named_parameters``).

    The reference wrapped each ``nn.LSTM``/``nn.GRU`` in
    ``RecurrentCuDNNWrapper`` whose submodule is called ``layer``
    (``morgana/utils.py:341-343``), so torch names gain a ``.layer`` segment
    at each Recurrent position.
    """
    mapping = {}
    for name, _param in model.named_parameters():
        parts = name.split('.')
        torch_parts = []
        module = model
        fused_in_proj = False
        for part in parts[:-1]:
            sub = _child(module, part)
            torch_part = part
            if isinstance(module, nn.TransformerEncoderLayer):
                torch_part = _TFM_BLOCK_RENAME.get(part, part)
            elif isinstance(module, nn.TransformerEncoder) and part == 'blocks':
                torch_part = 'layers'
            elif isinstance(module, nn.ModuleList) and part == 'items':
                # Our ModuleList stores children under `.items`; torch
                # containers index directly.
                continue
            elif isinstance(module, nn.MultiHeadAttention) \
                    and part == 'in_proj':
                # torch.nn.MultiheadAttention keeps the fused projection as
                # flat attributes (in_proj_weight / in_proj_bias), not a
                # submodule: merge this segment into the leaf below.
                fused_in_proj = True
                module = sub
                continue
            torch_parts.append(torch_part)
            if isinstance(sub, nn.Recurrent):
                torch_parts.append('layer')
            module = sub
        leaf = parts[-1]
        if fused_in_proj:
            leaf = f'in_proj_{leaf}'
        elif leaf.startswith(('w_ih_l', 'w_hh_l', 'b_ih_l', 'b_hh_l')):
            kind, layer_idx = leaf.rsplit('_l', 1)
            leaf = {'w_ih': 'weight_ih', 'w_hh': 'weight_hh',
                    'b_ih': 'bias_ih', 'b_hh': 'bias_hh'}[kind] + f'_l{layer_idx}'
        torch_parts.append(leaf)
        mapping[name] = '.'.join(torch_parts)
    return mapping


def convert_torch_state_dict(model, torch_sd, strict=True):
    r"""Converts a torch state dict into this model's layout.

    Parameters
    ----------
    model : nn.Module
    torch_sd : dict[str, tensor-like]
    strict : bool
        When False, torch-side missing parameters are skipped (with a
        warning) instead of raising — enabling partial migration of models
        that gained new layers.

    Returns
    -------
    dict[str, np.ndarray] loadable with ``nn.load_state_dict``.
    """
    mapping = torch_name_map(model)
    target_shapes = {name: tuple(p.value.shape)
                     for name, p in model.named_parameters()}
    out = {}
    missing = []
    for our_name, torch_name in mapping.items():
        if torch_name not in torch_sd:
            missing.append(torch_name)
            continue
        value = torch_sd[torch_name]
        # np.array (not asarray): an f32 tensor's .numpy() is a VIEW of the
        # torch storage, and migrated params must not alias it — a later
        # torch-side optimiser step would silently mutate our model.
        value = np.array(value.detach().cpu().numpy() if hasattr(value, 'detach')
                         else value, np.float32)
        # Transposition is shape-driven: torch stores Linear/RNN matrices
        # (out, in); ours are (in, out). Square matrices (ambiguous) fall back
        # to the name heuristic — except Embeddings, whose (num_embeddings,
        # dim) orientation matches torch and must copy through untouched.
        target = target_shapes[our_name]
        owner = _owning_module(model, our_name)
        transposable = value.ndim == 2 and not isinstance(owner, nn.Embedding)
        if transposable and value.shape != target and value.T.shape == target:
            value = value.T
        elif transposable and value.shape == target \
                and value.shape[0] == value.shape[1] \
                and _is_transposed_matrix(our_name):
            value = value.T
        if tuple(value.shape) != target:
            # A silent wrong-shape load would surface as a confusing matmul
            # error far from here — or broadcast into silent garbage.
            raise ValueError(
                f'{torch_name!r} has shape {tuple(value.shape)}, but '
                f'{our_name!r} expects {target} (different architecture '
                'or model_kwargs than the checkpoint was trained with?)')
        out[our_name] = value
    if missing:
        msg = (f'torch state dict is missing parameters: {missing[:5]}'
               f'{"..." if len(missing) > 5 else ""}')
        if strict:
            raise KeyError(msg)
        import logging
        logging.getLogger('morgana_tpu').warning('%s (skipped: strict=False)', msg)
    return out


def load_torch_state_dict(model, state_dict_or_path, strict=True):
    r"""Loads a reference (torch) checkpoint into a morgana_tpu model."""
    if isinstance(state_dict_or_path, (str, bytes, os.PathLike)):
        import torch
        state_dict_or_path = torch.load(state_dict_or_path, map_location='cpu')
    converted = convert_torch_state_dict(model, state_dict_or_path, strict=strict)
    nn.load_state_dict(model, converted, strict=strict)
    return converted


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Convert a torch reference checkpoint (.pt state dict) '
                    'into a morgana_tpu epoch_{N}.npz checkpoint.')
    parser.add_argument('--model', required=True,
                        help="Model spec 'path/to/file.py:ClassName' (the "
                             'morgana_tpu port of the torch model).')
    parser.add_argument('--model_kwargs', default='{}',
                        help='Python dict literal of model constructor '
                             'kwargs (must match the torch architecture).')
    parser.add_argument('--torch_checkpoint', default=None,
                        help='The .pt state-dict file to convert (required '
                             'unless --print_map).')
    parser.add_argument('--out', default=None,
                        help="Output .npz path (default: the torch file's "
                             "name with .npz — e.g. epoch_50.pt -> "
                             'epoch_50.npz next to it).')
    parser.add_argument('--non_strict', action='store_true',
                        help='Skip (with a warning) parameters the torch '
                             'checkpoint is missing instead of failing — '
                             'their fresh initialisation is saved.')
    parser.add_argument('--seed', type=int, default=1234567890,
                        help='Init seed for parameters NOT in the torch '
                             'checkpoint (only relevant with --non_strict).')
    parser.add_argument('--print_map', action='store_true',
                        help='Print the our-name -> torch-name mapping as '
                             'JSON and exit (no checkpoint needed).')
    args = parser.parse_args(argv)

    # Host-side file transform: never initialise an accelerator backend.
    from morgana_tpu import platform as _platform
    _platform.force_cpu()
    from morgana_tpu.serve import load_model_class
    from morgana_tpu import checkpointing

    model_kwargs = ast.literal_eval(args.model_kwargs)
    if not isinstance(model_kwargs, dict):
        parser.error('--model_kwargs must be a dict literal')
    nn.manual_seed(args.seed)
    model = load_model_class(args.model)(**model_kwargs)

    if args.print_map:
        print(json.dumps(torch_name_map(model), indent=2))
        return 0
    if not args.torch_checkpoint:
        parser.error('--torch_checkpoint is required (or use --print_map)')

    converted = load_torch_state_dict(model, args.torch_checkpoint,
                                      strict=not args.non_strict)
    out = args.out
    if out is None:
        out = os.path.splitext(args.torch_checkpoint)[0] + '.npz'
    out = checkpointing.save_state_dict(nn.state_dict(model), out)
    total = len(nn.state_dict(model))
    print(json.dumps({
        'torch_checkpoint': args.torch_checkpoint,
        'out': out,
        'parameters_converted': len(converted),
        'parameters_total': total,
        'bytes_out': os.path.getsize(out),
    }))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
