"""Multi-host (pod) orchestration helpers.

The reference scales across nodes with `accelerate launch` + DDP (NCCL):
every rank builds its own DataLoader over the full dataset with a
DistributedSampler-equivalent split and torch broadcasts/reduces gradients
(/root/reference/scripts/README.md:16-26, scripts/CTCLIPTrainer.py:138-140).

The TPU-native equivalent: after `jax.distributed.initialize()` every host
process sees the global mesh but only its local chips.  Each host

  1. reads a DISJOINT slice of the dataset (`shard_indices_for_process` —
     same shuffle order everywhere, strided split, exactly the torch
     DistributedSampler contract);
  2. preprocesses its `global_batch // process_count` volumes locally;
  3. assembles the global batch with
     `jax.make_array_from_process_local_data`, which places each host's
     rows on its own chips per the `data`-axis sharding — no host ever
     materializes the global batch;
  4. runs the SAME jitted train step as single-host: XLA inserts the
     gradient psums / negative all-gathers over ICI/DCN from the shardings.

Checkpointing stays collective (Orbax writes sharded arrays from every
process); logging/eval artifacts are gated on `is_main_process()`.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """Gate for host-side artifacts (metrics files, eval tables, stdout) —
    the reference's `accelerator.is_main_process` / rank-0-only blocks
    (scripts/CTCLIPTrainer.py:331-337)."""
    return jax.process_index() == 0


def shard_indices_for_process(order: Sequence[int],
                              index: Optional[int] = None,
                              count: Optional[int] = None) -> np.ndarray:
    """Strided per-host slice of a dataset index order.

    Every process must pass the SAME `order` (i.e. shuffle with the same
    seed) — the strided split then yields disjoint subsets whose union is
    the full epoch, the torch DistributedSampler contract the reference
    gets implicitly from accelerate.
    """
    index = process_index() if index is None else index
    count = process_count() if count is None else count
    order = np.asarray(order)
    return order[index::count]


def local_batch_size(global_batch_size: int,
                     count: Optional[int] = None) -> int:
    count = process_count() if count is None else count
    assert global_batch_size % count == 0, (
        f"global batch {global_batch_size} not divisible by "
        f"{count} processes")
    return global_batch_size // count


def assemble_global_batch(local_batch: Dict[str, np.ndarray], mesh: Mesh,
                          data_axis: str = "data",
                          count: Optional[int] = None) -> Dict[str, jax.Array]:
    """Host-local arrays (local_b, ...) -> global jax.Arrays
    (local_b * process_count, ...) sharded along `data_axis`.

    Uses `jax.make_array_from_process_local_data`: each host's rows land on
    its own addressable devices; no host->host traffic and no global-batch
    materialization anywhere.  Works unchanged in single-process runs
    (local == global) where it just splits the batch across local chips.
    """
    count = process_count() if count is None else count
    sharding = NamedSharding(mesh, P(data_axis))
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        global_shape = (v.shape[0] * count,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(sharding, v,
                                                        global_shape)
    return out
