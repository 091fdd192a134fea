"""Device mesh + sharding helpers (the framework's 'distributed backend').

The reference's only parallelism is torch DataParallel single-process
scatter/gather (ref tools/train_linemod.py:258) plus DataLoader worker
processes; there is no NCCL/MPI anywhere (SURVEY.md section 2.7). The
TPU-native equivalent is declarative: a jax.sharding.Mesh plus NamedSharding
annotations on the jitted step — XLA inserts all-reduces over ICI within a
slice and DCN across slices.
"""

from pvnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, shard_batch, replicate,
    make_global_mesh, shard_batch_global, replicate_global)
