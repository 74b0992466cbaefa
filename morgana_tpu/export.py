"""AOT deployment bundles: export compiled predict programs + parameters.

``python -m morgana_tpu.export --model file.py:Class --checkpoint_path
epoch_N.npz --data_root data --out_dir bundle/`` walks the serving data once,
AOT-compiles the engine's predict program for every distinct padded batch
shape it produces (= every length bucket at the chosen batch size), and
writes a **self-contained deployment bundle**:

* ``manifest.json`` — model/checkpoint provenance + one entry per exported
  program (file name, batch size, padded frame count, full input signature);
* ``params.pkl`` — the serving parameter pytree (host numpy copies; already
  quantized when ``--quantize int8`` was given);
* ``predict_b{B}_t{T}.hlo`` — serialized ``jax.export`` StableHLO artifacts.

:class:`ExportedVoice` runs a bundle **without the model's Python class,
data sources, or normaliser files** — the runtime dependency is jax itself.
This is the process-churn / hermetic-deploy answer beyond
``--compilation_cache_dir``: the bundle survives moving to a machine that
has no model repository at all. (The reference had no deployment story —
generation required a full ``ExperimentBuilder`` test run,
``morgana/experiment_builder.py:682-693``.)

Callers feed :meth:`ExportedVoice.run` batches collated to one of the
manifest's signatures; outputs come back padded (strip with each item's
``n_frames``, as :meth:`InferenceEngine._unpad` does).
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

__all__ = ['export_bundle', 'ExportedVoice', 'main']

_MANIFEST = 'manifest.json'
_PARAMS = 'params.pkl'


def _signature(batch):
    """Canonical (hashable/JSON-able) shape+dtype signature of a numeric
    batch — the key that selects which exported program can run it."""
    return tuple(sorted(
        (key, tuple(int(d) for d in np.shape(value)), str(np.asarray(value).dtype))
        for key, value in batch.items()))


def _sig_to_json(sig):
    return [{'name': name, 'shape': list(shape), 'dtype': dtype}
            for name, shape, dtype in sig]


def _sig_from_json(entries):
    return tuple(sorted((e['name'], tuple(int(d) for d in e['shape']),
                         e['dtype']) for e in entries))


def _max_frames(sig):
    dims = [shape[1] for _, shape, _ in sig if len(shape) >= 2]
    return max(dims) if dims else 0


def export_bundle(engine, out_dir, data_dir='test', id_list=None,
                  file_ids=None, model_spec=None):
    """Exports every distinct padded batch shape ``data_dir`` produces
    through ``engine`` into ``out_dir``; returns the manifest dict."""
    import jax
    from morgana_tpu.training import numeric_features

    os.makedirs(out_dir, exist_ok=True)
    programs = []
    seen = set()
    for features in engine._loader(data_dir, id_list=id_list,
                                   file_ids=file_ids):
        batch = numeric_features(features)
        sig = _signature(batch)
        if sig in seen:
            continue
        seen.add(sig)
        batch_dim = next(iter(batch.values())).shape[0]
        name = f'predict_b{batch_dim}_t{_max_frames(sig)}'
        if any(p['file'].startswith(name) for p in programs):
            name += f'_{len(programs)}'
        file_name = name + '.hlo'
        engine.export_program(features, os.path.join(out_dir, file_name))
        programs.append({'file': file_name, 'batch': int(batch_dim),
                         'max_frames': int(_max_frames(sig)),
                         'inputs': _sig_to_json(sig)})

    if not programs:
        raise ValueError(f'no batches produced from {data_dir!r} — nothing '
                         'to export (empty id list?)')

    # Host copies of the serving parameter pytree (quantized pytrees pickle
    # as their QuantizedArray nodes and reload as long as morgana_tpu is
    # importable — jax is a bundle dependency anyway).
    params = jax.tree_util.tree_map(np.asarray, engine._params)
    with open(os.path.join(out_dir, _PARAMS), 'wb') as f:
        pickle.dump(params, f)

    manifest = {
        'model': model_spec or type(engine.model).__name__,
        'checkpoint': os.path.abspath(engine.checkpoint_path),
        'batch_size': engine.batch_size,
        'quantize': engine._quantize,
        'params_file': _PARAMS,
        'programs': programs,
    }
    with open(os.path.join(out_dir, _MANIFEST), 'w') as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedVoice(object):
    """Runs a deployment bundle written by :func:`export_bundle` /
    ``python -m morgana_tpu.export`` — no model code, sources, or
    normaliser files needed.

    ``run(batch)`` selects the exported program whose input signature
    matches the batch's shapes/dtypes exactly and returns ``(staged,
    outputs)`` as the engine's predict step would (outputs padded; strip
    with ``n_frames``). Programs deserialize lazily, once each.
    """

    def __init__(self, bundle_dir):
        self.bundle_dir = bundle_dir
        with open(os.path.join(bundle_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        with open(os.path.join(bundle_dir,
                               self.manifest['params_file']), 'rb') as f:
            self.params = pickle.load(f)
        self._by_sig = {_sig_from_json(p['inputs']): p
                        for p in self.manifest['programs']}
        self._loaded = {}

    def signatures(self):
        """The batch signatures this bundle can run (one per program)."""
        return list(self._by_sig)

    def _program(self, sig):
        if sig not in self._loaded:
            from morgana_tpu.serve import load_exported_program
            path = os.path.join(self.bundle_dir, self._by_sig[sig]['file'])
            self._loaded[sig] = load_exported_program(path)
        return self._loaded[sig]

    def run(self, batch, rng=None):
        import jax
        from morgana_tpu.training import numeric_features

        batch = numeric_features(batch)
        sig = _signature(batch)
        if sig not in self._by_sig:
            available = [(p['batch'], p['max_frames'])
                         for p in self.manifest['programs']]
            raise ValueError(
                f'no exported program matches this batch '
                f'(batch={next(iter(batch.values())).shape[0]}, '
                f'max_frames={_max_frames(sig)}); bundle has '
                f'(batch, max_frames) = {available}. Collate to an exported '
                'shape or re-export with the shapes you serve.')
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._program(sig)(self.params, batch, rng)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='Export a self-contained AOT deployment bundle: one '
                    'compiled predict program per padded batch shape, plus '
                    'the parameter pytree and a manifest.')
    parser.add_argument('--model', required=True,
                        help="'module:Class' or 'path/to/file.py:Class'")
    parser.add_argument('--model_kwargs', default='{}')
    parser.add_argument('--checkpoint_path', required=True)
    parser.add_argument('--data_root', default='data')
    parser.add_argument('--data_dir', default='test',
                        help='Split whose batches define the exported '
                             'shapes (walk covers every length bucket).')
    parser.add_argument('--id_list', default=None,
                        help='Id list path relative to --data_dir (default: '
                             '{data_dir}/{data_dir}_file_id_list.scp '
                             'resolution as in serving).')
    parser.add_argument('--normalisation_dir', default='train')
    parser.add_argument('--out_dir', required=True)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--device', default=None,
                        help="Platform to compile FOR ('cpu' or 'tpu') — "
                             'exported artifacts are platform-specific.')
    parser.add_argument('--compute_dtype', default=None)
    parser.add_argument('--quantize', default=None,
                        choices=('int8', 'int4'),
                        help='Bake weight-only quantization into the bundle '
                             '(params.pkl stores the int8/int4 pytree).')
    args = parser.parse_args(argv)

    import ast
    from morgana_tpu.serve import InferenceEngine, load_model_class

    engine = InferenceEngine(
        load_model_class(args.model), args.checkpoint_path,
        data_root=args.data_root, normalisation_dir=args.normalisation_dir,
        model_kwargs=ast.literal_eval(args.model_kwargs),
        device=args.device, compute_dtype=args.compute_dtype,
        batch_size=args.batch_size, quantize=args.quantize)

    id_list = args.id_list or os.path.join(
        args.data_dir, f'{args.data_dir}_file_id_list.scp')
    manifest = export_bundle(engine, args.out_dir, data_dir=args.data_dir,
                             id_list=id_list, model_spec=args.model)
    print(json.dumps({
        'out_dir': args.out_dir,
        'programs': len(manifest['programs']),
        'shapes': [(p['batch'], p['max_frames'])
                   for p in manifest['programs']],
        'quantized': bool(manifest['quantize']),
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
