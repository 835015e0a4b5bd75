"""Host-side parallel volume loader with device prefetch.

The reference leans on torch DataLoader worker processes doing the full
preprocess on CPU (~seconds/volume, SURVEY.md §3.1).  Here the host only
reads + gunzips NIfTI bytes in a thread pool (C++ fast path when built),
pads each raw volume to a shape bucket, and ships it to device where the
fused preprocess kernel (ops/resample.py) does the voxel math.  A small
prefetch queue keeps the device fed (double buffering across the host->HBM
boundary, the TPU equivalent of `cycle(dl)` + pinned-memory loading).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .datasets import CTReportDataset, VolumeMeta

# Bucket granularity per axis: raw CT volumes are typically (Z, 512, 512)
# with Z in [100, 600]; round Z up to 64s and XY up to 128s.
BUCKET_Z = 64
BUCKET_XY = 128


def bucket_shape(shape: Sequence[int]) -> Tuple[int, int, int]:
    z, x, y = shape

    def up(v, m):
        return ((v + m - 1) // m) * m

    return (up(z, BUCKET_Z), up(x, BUCKET_XY), up(y, BUCKET_XY))


@dataclass
class RawSample:
    vol: np.ndarray            # (Zb, Xb, Yb) zero-padded to bucket
    true_sizes: np.ndarray     # (3,) int32 actual extents (vol-layout order)
    spacing: np.ndarray        # (3,) f32 (z, x, y)
    slope: np.float32
    intercept: np.float32
    meta: VolumeMeta
    layout: str = "zxy"        # vol axis order: "zxy" or "zyx"


def preprocess_sample(sample: "RawSample", clip_before_resample: bool,
                      out_dtype=None, **kwargs):
    """RawSample -> (240, 480, 480) model input on device, layout-aware.

    One-stop consumer for both loader layouts: passes the raw (possibly
    int16, possibly (Z, Y, X)) volume straight to the fused device
    preprocess (ops/resample.py), which folds any relayout into its
    resample matmuls.  `out_dtype` folds the model-input cast in too."""
    import jax.numpy as jnp

    from ..ops.resample import preprocess_volume

    true = sample.true_sizes
    if sample.layout == "zyx":
        true = true[[0, 2, 1]]  # semantic (z, x, y) order
    return preprocess_volume(
        jnp.asarray(sample.vol), jnp.asarray(sample.spacing),
        jnp.float32(sample.slope), jnp.float32(sample.intercept),
        true_sizes=jnp.asarray(true),
        clip_before_resample=clip_before_resample,
        input_layout=sample.layout, out_dtype=out_dtype, **kwargs)


def preprocess_sample_rows(sample: "RawSample", clip_before_resample: bool,
                           out_dtype=None, temporal_patch_size: int = 10,
                           patch_size: int = 20, **kwargs):
    """RawSample -> (n_tokens, patch_dim) patch rows on device — the model's
    native ingest format (ops/resample.preprocess_to_patch_rows): the
    patchify shuffle runs once here instead of in every encode step."""
    import jax.numpy as jnp

    from ..ops.resample import preprocess_to_patch_rows

    true = sample.true_sizes
    if sample.layout == "zyx":
        true = true[[0, 2, 1]]  # semantic (z, x, y) order
    return preprocess_to_patch_rows(
        jnp.asarray(sample.vol), jnp.asarray(sample.spacing),
        jnp.float32(sample.slope), jnp.float32(sample.intercept),
        true_sizes=jnp.asarray(true),
        clip_before_resample=clip_before_resample,
        temporal_patch_size=temporal_patch_size, patch_size=patch_size,
        input_layout=sample.layout, out_dtype=out_dtype, **kwargs)


def preprocess_sample_rows_into(batch_buf, slot: int, sample: "RawSample",
                                clip_before_resample: bool,
                                temporal_patch_size: int = 10,
                                patch_size: int = 20, **kwargs):
    """preprocess_sample_rows fused with batch assembly: writes the sample's
    patch rows straight into `batch_buf[slot]` (donated) and returns the
    updated buffer — one dispatch per volume, no host-side window + stack
    (ops/resample.preprocess_rows_into)."""
    import jax.numpy as jnp

    from ..ops.resample import preprocess_rows_into

    true = sample.true_sizes
    if sample.layout == "zyx":
        true = true[[0, 2, 1]]  # semantic (z, x, y) order
    return preprocess_rows_into(
        batch_buf, slot, jnp.asarray(sample.vol),
        jnp.asarray(sample.spacing), jnp.float32(sample.slope),
        jnp.float32(sample.intercept), true_sizes=jnp.asarray(true),
        clip_before_resample=clip_before_resample,
        temporal_patch_size=temporal_patch_size, patch_size=patch_size,
        input_layout=sample.layout, **kwargs)


class VolumeLoader:
    """Iterates RawSamples with `num_workers` reader threads and a bounded
    prefetch queue.  Shuffling + infinite cycling for training."""

    def __init__(self, dataset: CTReportDataset, num_workers: int = 8,
                 prefetch: int = 8, shuffle: bool = False,
                 infinite: bool = False, seed: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 raw_dtype=None, raw_layout: str = "zxy",
                 inflate_threads: Optional[int] = None):
        """`process_index`/`process_count` give each host of a multi-host
        (pod) run a disjoint strided slice of every epoch — the torch
        DistributedSampler contract accelerate applies in the reference.
        The shuffle order depends only on `seed`, so all hosts agree on it
        (parallel/multihost.shard_indices_for_process).

        `raw_dtype=np.int16` ships stored voxel ints instead of scaled f32
        (halves host->device bytes); `raw_layout="zyx"` additionally skips
        the host-side in-plane transpose — RawSample.vol is then (Z, Y, X)
        and the consumer transposes axes (1, 2) on device.  See
        CTReportDataset.read_raw.

        `inflate_threads` parallelises the gunzip of each single file when
        the corpus was prepared with `ct-clip recompress` (indexed
        multi-member gzip).  Default: spread the cores left over by the
        file-level workers, cpu_count // num_workers."""
        import os

        self.ds = dataset
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.infinite = infinite
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.raw_dtype = raw_dtype
        self.raw_layout = raw_layout
        if inflate_threads is None:
            inflate_threads = max(1, (os.cpu_count() or 1)
                                  // max(1, num_workers))
        self.inflate_threads = inflate_threads

    def _indices(self) -> Iterator[int]:
        from ..parallel.multihost import shard_indices_for_process

        rng = np.random.RandomState(self.seed)
        epoch = 0
        while True:
            order = np.arange(len(self.ds))
            if self.shuffle:
                rng.shuffle(order)
            if self.process_count > 1:
                order = shard_indices_for_process(order, self.process_index,
                                                  self.process_count)
            yield from order.tolist()
            epoch += 1
            if not self.infinite:
                return

    def __iter__(self) -> Iterator[RawSample]:
        def load(index: int) -> RawSample:
            vol, meta = self.ds.read_raw(index, dtype=self.raw_dtype,
                                         layout=self.raw_layout,
                                         inflate_threads=self.inflate_threads)
            true = np.asarray(vol.shape, np.int32)
            bshape = bucket_shape(vol.shape)
            if tuple(bshape) != vol.shape:
                padded = np.zeros(bshape, vol.dtype)
                padded[: vol.shape[0], : vol.shape[1], : vol.shape[2]] = vol
                vol = padded
            return RawSample(vol=vol, true_sizes=true,
                             spacing=np.asarray(meta.spacing_zxy, np.float32),
                             slope=np.float32(meta.slope),
                             intercept=np.float32(meta.intercept), meta=meta,
                             layout=self.raw_layout)

        indices = self._indices()
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            for _ in range(self.prefetch):
                idx = next(indices, None)
                if idx is None:
                    break
                pending.append(pool.submit(load, idx))
            while pending:
                fut = pending.pop(0)
                idx = next(indices, None)
                if idx is not None:
                    pending.append(pool.submit(load, idx))
                yield fut.result()
