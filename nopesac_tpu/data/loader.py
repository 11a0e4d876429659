"""Batched data loading with background prefetch.

Replaces detectron2's build_detection_{train,test}_loader
(train_NopeSAC.py:73-85): pairs are mapped to fixed-shape numpy samples
either in the producer thread (num_workers=0) or in a fork-based
multiprocessing pool (num_workers>0, the DATALOADER.NUM_WORKERS semantics
of the reference Base.yaml:30 - PIL decode + RLE + mask rasterisation are
GIL-bound, so real hosts want processes). Collated batches are prefetched
through a bounded queue. Multi-host: each process takes a strided shard of
the dataset (index % num_shards == shard_id), like d2's per-rank sampler.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional

import numpy as np

from .mapper import collate

# fork-pool worker state: the mapper is shipped ONCE via the pool
# initializer (inherited memory at fork), not pickled per map call — per-call
# pickling both costs (the mapper holds the k_inv_dot_xy1 ray map) and
# FREEZES the mapper's augmentation RNG (the parent's state never advances)
_WORKER_MAPPER = None


def _init_worker(mapper):
    global _WORKER_MAPPER
    _WORKER_MAPPER = mapper


def _map_item(args):
    pair, seed = args
    return _WORKER_MAPPER(pair, aug_seed=seed)


class _LoaderClosed(Exception):
    """Producer-side signal: the loader was close()d mid-epoch."""


class PairLoader:
    def __init__(
        self,
        dataset: List[dict],
        mapper: Callable,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 42,
        num_shards: int = 1,
        shard_id: int = 0,
        prefetch: int = 2,
        infinite: bool = False,
        num_workers: int = 0,
    ):
        self.dataset = dataset[shard_id::num_shards] if num_shards > 1 else dataset
        self.mapper = mapper
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.infinite = infinite
        self.num_workers = num_workers
        self._pool = None
        self._closing = False  # close() racing a live producer thread
        self._item_counter = 0  # monotone per-sample augmentation seed base
        if num_workers > 0:
            import multiprocessing as mp

            # fork: the mapper + dataset are inherited; only (pair, seed)
            # tuples travel per item. Forked HERE, from the main thread at
            # construction, not lazily from the producer thread - fork()
            # from a multi-threaded process can deadlock/abort the children
            # on inherited locks (jax/XLA spin up many threads).
            self._pool = mp.get_context("fork").Pool(
                num_workers, initializer=_init_worker, initargs=(mapper,))

    def _map_chunk(self, chunk) -> list:
        items = [self.dataset[i] for i in chunk]
        # explicit per-sample seeds: deterministic given (loader seed, item
        # order), identical semantics in both the pool and in-line paths
        seeds = [self.seed * 1_000_003 + self._item_counter + k
                 for k in range(len(items))]
        self._item_counter += len(items)
        pool = self._pool
        if pool is not None:
            try:
                return pool.map(_map_item, list(zip(items, seeds)))
            except ValueError:
                # close() terminated the pool under a producer thread
                # mid-epoch ("Pool not running"); surface as a clean stop
                # instead of an unraisable thread exception
                if self._closing or self._pool is None:
                    raise _LoaderClosed()
                raise
        return [self.mapper(d, aug_seed=s) for d, s in zip(items, seeds)]

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        return idx

    def _produce(self, q: "queue.Queue", stop: threading.Event):
        epoch = 0
        while not stop.is_set():
            idx = self._epoch_indices(epoch)
            nb = len(self)
            for b in range(nb):
                if stop.is_set():
                    return
                lo = b * self.batch_size
                chunk = idx[lo: lo + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last:
                    break
                try:
                    batch = collate(self._map_chunk(chunk))
                except _LoaderClosed:
                    return
                # bounded put that honours stop: a consumer that abandons
                # the iterator (e.g. train() breaking at max_iter) would
                # otherwise leave this thread blocked in q.put forever,
                # pinning prefetch+1 collated batches
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
            if not self.infinite:
                while not stop.is_set():
                    try:
                        q.put(None, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                return
            epoch += 1

    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        t = threading.Thread(target=self._produce, args=(q, stop), daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()

    def close(self):
        self._closing = True
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):
        self.close()
