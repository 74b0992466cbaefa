"""Multi-host (DCN) initialisation and host-local data sharding."""
import os

import jax

__all__ = ['initialize_distributed', 'process_info', 'shard_id_list']


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialises jax.distributed for multi-host training over DCN.

    On TPU pods with standard env configuration all arguments are inferred.
    For generic launchers (including multi-process CPU testing), configure
    via environment variables on every host::

        MORGANA_COORDINATOR=host:port MORGANA_NUM_PROCESSES=N \\
        MORGANA_PROCESS_ID=i  python models/<model>.py --multihost ...

    Safe to call on a single host (no-op on failure to infer a cluster).
    """
    coordinator_address = coordinator_address or os.environ.get('MORGANA_COORDINATOR')
    if num_processes is None and 'MORGANA_NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['MORGANA_NUM_PROCESSES'])
    if process_id is None and 'MORGANA_PROCESS_ID' in os.environ:
        process_id = int(os.environ['MORGANA_PROCESS_ID'])
    explicit = any(v is not None for v in
                   (coordinator_address, num_processes, process_id))
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        if explicit:
            # A partially/incorrectly configured cluster must FAIL, not
            # silently degrade to N independent single-host runs that all
            # believe they are rank 0 and race on shared files.
            raise
        # No cluster configured/inferable: single-host run.
    return jax.process_index(), jax.process_count()


def process_info():
    """``(process_index, process_count)`` for this host.

    The single indirection the runtime reads its multi-host topology
    through, so tests can fake an N-host cluster in one process.
    """
    return jax.process_index(), jax.process_count()


def shard_id_list(file_ids, process_index=None, process_count=None,
                  equal_shards=True):
    """Host-local shard of an utterance id list: each host reads only its own
    slice, so the global batch is assembled without any cross-host data
    movement (per-host sharded loading).

    ``equal_shards`` PADS every shard to ``ceil(len(file_ids) / count)`` items
    by cycling the shard's own ids. Equal shard sizes are REQUIRED for
    lockstep multi-host training (hosts with unequal shards run different
    numbers of collective steps and deadlock); padding — rather than
    truncating — keeps every utterance covered (at most ``count - 1`` ids are
    seen twice per pass). The padding is deterministic from the global list
    length, so no cross-host communication is needed to agree on it.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    shard = list(file_ids[process_index::process_count])
    if equal_shards and process_count > 1:
        if len(file_ids) < process_count:
            raise ValueError(
                f'id list has {len(file_ids)} items for {process_count} hosts '
                f'— every host needs at least one utterance')
        target = -(-len(file_ids) // process_count)
        base = len(shard)
        for i in range(target - base):
            shard.append(shard[i % base])
    return shard
