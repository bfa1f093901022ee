"""Device mesh construction and data-parallel sharding.

Replaces the reference's torchrun/NCCL-DDP stack (reference:
pretrain.py:257, README.md:119-132) with a JAX device mesh: the batch is
sharded over the `data` axis (ICI within a slice, DCN across hosts), params
are replicated, and XLA emits the gradient all-reduce. TP/PP/SP/EP are out
of the reference's capability envelope (SURVEY.md §2.4) and deliberately
not implemented.
"""

from .mesh import (  # noqa: F401
    distributed_init, local_row_range, make_mesh, put_batch,
    put_batch_process_local, put_replicated, replicate, shard_batch)
