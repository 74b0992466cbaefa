"""Parallelism over TPU device meshes.

The reference is strictly single-process, single-device
(``morgana/experiment_builder.py:262-263``; no NCCL/MPI/Gloo anywhere). Here
scaling is first-class and TPU-idiomatic:

* **Data parallelism**: a 1-D (or 2-D dp x tp) ``jax.sharding.Mesh``; batches
  are ``device_put`` directly into a ``NamedSharding`` over the ``'data'``
  axis, parameters are replicated, and XLA's SPMD partitioner inserts the
  gradient ``psum`` over ICI automatically — the fused train step is unchanged.
* **Tensor parallelism** (optional): parameter sharding rules place large
  Dense/recurrent kernels over a ``'model'`` axis (GSPMD path,
  ``--tensor_parallel``), and :mod:`morgana_tpu.parallel.tp_rnn` provides
  the explicit Megatron-style sharded recurrence (gate-major layout,
  per-step hidden ``all_gather``, exact gradients).
* **Pipeline parallelism**: GPipe-style stage pipelining of the transformer
  encoder over a ``'stage'`` axis — one ``lax.scan`` of compute+``ppermute``
  ticks inside ``shard_map`` (:mod:`morgana_tpu.parallel.pipeline`).
* **FSDP / ZeRO-3** (``--fsdp``): parameters, Adam moments and EMA shards
  live sharded over the ``'data'`` axis (largest-axis storage sharding);
  GSPMD inserts the weight ``all_gather`` / gradient ``reduce_scatter``
  and each device updates only its own parameter shard.
* **Multi-host**: ``jax.distributed.initialize`` over DCN, with host-local
  id-list sharding for the data pipeline.
"""
from morgana_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, put_global,
    host_local_batch, shard_batch, shard_params, param_shardings,
    expert_param_shardings,
    fsdp_param_shardings, fsdp_state_shardings, shard_fsdp_state,
)
from morgana_tpu.parallel.distributed import (
    initialize_distributed, process_info, shard_id_list,
)
from morgana_tpu.parallel.shard_map_step import build_shard_map_train_step
from morgana_tpu.parallel import tp_rnn
from morgana_tpu.parallel import pipeline
