"""Checkpoint save/load.

The reference saved ``state_dict`` to ``experiments/<name>/checkpoints/
epoch_{N}.pt`` (``morgana/base_models.py:142-175``) and did *not* checkpoint
optimiser state (resume restarted Adam moments). Here:

* Model parameters -> ``epoch_{N}.npz`` (same directory/naming contract; the
  epoch-from-filename regex in ``morgana_tpu.utils`` is unchanged).
* Full training state (params, optimiser state, EMA params, step counter)
  -> ``epoch_{N}.train.pkl`` for *exact* resume — an improvement the
  reference lacked.
* Optional Orbax async checkpointing for large sharded state.
"""
import os
import pickle

import jax
import numpy as np

__all__ = [
    'save_state_dict', 'load_state_dict', 'save_training_state',
    'load_training_state', 'training_state_path_for',
]


def _to_host(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, (jax.Array, np.ndarray)) else x, tree)


def save_state_dict(sd, path, atomic=False):
    """Saves a flat {dotted_name: array} state dict as .npz.

    ``atomic`` writes to a temp file then ``os.replace``s it into place —
    required for ROLLING checkpoints (e.g. the mid-epoch ``step.npz``) where
    a crash mid-write must not corrupt the only copy."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    target = str(path)
    if not target.endswith('.npz'):
        # np.savez appends '.npz' to other extensions, so without this the
        # non-atomic path would write `target.npz` yet return `target`,
        # while the atomic path would os.replace to exactly `target` — two
        # different files for the same argument, and load_state_dict's
        # extensionless fallback would prefer whichever is staler.
        target += '.npz'
    write_path = target + '.tmp.npz' if atomic else target
    np.savez(write_path, **{k: np.asarray(v) for k, v in sd.items()})
    if atomic:
        os.replace(write_path, target)
    return target


def load_state_dict(path):
    if not os.path.exists(path) and os.path.exists(str(path) + '.npz'):
        path = str(path) + '.npz'
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def training_state_path_for(checkpoint_path):
    """Derives the training-state sidecar path from a params checkpoint path."""
    base, _ext = os.path.splitext(str(checkpoint_path))
    return base + '.train.pkl'


def save_training_state(path, params, opt_state=None, ema_params=None, step=0,
                        extra=None, atomic=False):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state = {
        'params': _to_host(params),
        'opt_state': _to_host(opt_state),
        'ema_params': _to_host(ema_params),
        'step': int(step),
        'extra': extra,
    }
    target = str(path)
    write_path = target + '.tmp' if atomic else target
    with open(write_path, 'wb') as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    if atomic:
        os.replace(write_path, target)
    return target


def load_training_state(path):
    with open(path, 'rb') as f:
        return pickle.load(f)


# ---------------------------------------------------------------------------
# Orbax (optional): async, sharding-aware checkpoints for large state
# ---------------------------------------------------------------------------

_ORBAX_MANAGERS = {}


def orbax_available():
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except ImportError:
        return False


def _orbax_manager(directory, async_save=True):
    import orbax.checkpoint as ocp
    directory = os.path.abspath(directory)
    if directory not in _ORBAX_MANAGERS:
        options = ocp.CheckpointManagerOptions(enable_async_checkpointing=async_save)
        _ORBAX_MANAGERS[directory] = ocp.CheckpointManager(directory, options=options)
    return _ORBAX_MANAGERS[directory]


def orbax_save(directory, step, state, async_save=True):
    """Asynchronously saves a (possibly sharded) training-state pytree under
    ``directory/<step>``. Non-blocking when ``async_save``: the transfer and
    write overlap with subsequent training steps.

    An existing step is overwritten (deleted first) — same semantics as the
    ``epoch_{N}.npz`` saves. Without it, a run that failed to restore and
    "started fresh" would crash with StepAlreadyExistsError at its first
    save over a stale step."""
    import orbax.checkpoint as ocp
    manager = _orbax_manager(directory, async_save)
    if step in manager.all_steps():
        manager.delete(step)
    manager.save(step, args=ocp.args.StandardSave(state), force=True)
    if not async_save:
        # The manager is cached per directory and may have been created
        # async-enabled by an earlier call; a synchronous save must be
        # durable on return regardless of which manager instance served it.
        manager.wait_until_finished()
    return directory


def orbax_latest_step(directory):
    """The newest step saved under ``directory`` (None when empty).

    Probes without instantiating a manager: CheckpointManager construction
    CREATES the directory as a side effect (a typo'd path would appear on
    disk) and would pin this call's options into the per-directory cache."""
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = [int(entry) for entry in os.listdir(directory) if entry.isdigit()]
    return max(steps) if steps else None


def orbax_restore(directory, step=None, target=None):
    """Restores a training-state pytree saved by :func:`orbax_save`.

    Returns None when the directory holds no checkpoints. Pass ``target`` (a
    pytree with the desired structure, e.g. the freshly-initialised training
    state) to restore custom-node structures like optax states — without it,
    Orbax returns plain nested containers.
    """
    import orbax.checkpoint as ocp
    if step is None:
        # Probe first (no manager): an empty/missing directory returns None
        # without creating it on disk.
        step = orbax_latest_step(directory)
        if step is None:
            return None
    manager = _orbax_manager(directory)
    if target is not None:
        return manager.restore(step, args=ocp.args.StandardRestore(target))
    return manager.restore(step)


def orbax_sidecar_path(directory, step):
    """Path of the LR-schedule pickle sidecar for an Orbax step (the
    schedule's heterogeneous scalars are not an Orbax pytree)."""
    return os.path.join(directory, f'lr_state_{int(step)}.pkl')


def orbax_prune_sidecars(directory):
    """Deletes ``lr_state_{N}.pkl`` sidecars whose step Orbax no longer
    retains, so sidecars cannot accumulate past the checkpoints they
    belong to. Returns the steps removed."""
    import re
    kept = set(_orbax_manager(directory).all_steps())
    removed = []
    try:
        entries = os.listdir(directory)
    except OSError:
        return removed
    for entry in entries:
        match = re.fullmatch(r'lr_state_(\d+)\.pkl', entry)
        if match and int(match.group(1)) not in kept:
            try:
                os.unlink(os.path.join(directory, entry))
                removed.append(int(match.group(1)))
            except OSError:
                pass
    return removed


def orbax_wait(directory):
    """Blocks until pending async saves for ``directory`` complete."""
    if os.path.abspath(directory) in _ORBAX_MANAGERS:
        _ORBAX_MANAGERS[os.path.abspath(directory)].wait_until_finished()
