"""Language-modeling data pipeline.

Re-implements the reference datamodule's shape
(/root/reference/training/src/datamodules/language_modeling_hf.py:41-299 +
datasets/lm_dataset.py:10-32): documents tokenized once into a flat uint16/
uint32 token stream cached as a memory-mapped file; training samples are
seq_len+1 windows sliced from the stream. The HF-datasets tokenize step is
pluggable (zero-egress environments pass a tokenizer callable or a prebuilt
token file).

Fault tolerance mirrors fault_tolerant_sampler.py:10-123: the sampler's RNG
state + consumed-counter serialize into the checkpoint, so resume continues
at the exact batch.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


def build_token_cache(
    texts: Iterable[str],
    tokenize: Callable[[str], list],
    cache_path: str,
    vocab_size: int,
    append_eos: bool = True,
    eos_id: int = 0,
) -> np.ndarray:
    """Tokenize documents into one flat memmap'd stream (prepare_data analog).

    uint16 when vocab fits (the reference's GPT-2 trick), else uint32.
    """
    dtype = np.uint16 if vocab_size < 2**16 else np.uint32
    toks = []
    for t in texts:
        ids = list(tokenize(t))
        if append_eos:
            ids.append(eos_id)
        toks.append(np.asarray(ids, dtype=dtype))
    stream = np.concatenate(toks) if toks else np.zeros((0,), dtype)
    path = Path(cache_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    mm = np.lib.format.open_memmap(
        str(path), mode="w+", dtype=dtype, shape=stream.shape
    )
    mm[:] = stream
    mm.flush()
    return np.load(str(path), mmap_mode="r")


def load_token_cache(cache_path: str) -> np.ndarray:
    return np.load(cache_path, mmap_mode="r")


class LMDataset:
    """seq_len+1 windows over the token stream (lm_dataset.py:10-32)."""

    def __init__(self, tokens: np.ndarray, seq_len: int):
        self.tokens = tokens
        self.seq_len = seq_len

    def __len__(self) -> int:
        return max(0, (len(self.tokens) - 1) // self.seq_len)

    def __getitem__(self, idx: int) -> np.ndarray:
        lo = idx * self.seq_len
        return np.asarray(self.tokens[lo : lo + self.seq_len + 1], np.int64)


@dataclasses.dataclass
class FaultTolerantSampler:
    """Resumable shuffled sampler (RandomFaultTolerantSampler analog:
    fault_tolerant_sampler.py:10-64): counter + RNG state survive checkpoints."""

    num_samples: int
    seed: int = 0
    epoch: int = 0
    counter: int = 0
    shuffle: bool = True

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "counter": self.counter, "seed": self.seed}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = state["epoch"]
        self.counter = state["counter"]
        self.seed = state["seed"]

    def _order(self) -> np.ndarray:
        if not self.shuffle:
            return np.arange(self.num_samples)
        rng = np.random.default_rng(self.seed + self.epoch)
        return rng.permutation(self.num_samples)

    def __iter__(self) -> Iterator[int]:
        order = self._order()
        while True:
            while self.counter < self.num_samples:
                i = int(order[self.counter])
                self.counter += 1
                yield i
            self.epoch += 1
            self.counter = 0
            order = self._order()


class LMDataLoader:
    """Batched loader over LMDataset driven by a fault-tolerant sampler.

    Sharding for data parallelism: pass (shard_id, num_shards) and each rank's
    loader consumes a disjoint strided slice of the sample stream
    (FaultTolerantDistributedSampler analog)."""

    def __init__(
        self,
        dataset: LMDataset,
        batch_size: int,
        sampler: Optional[FaultTolerantSampler] = None,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or FaultTolerantSampler(len(dataset))
        self.shard_id = shard_id
        self.num_shards = num_shards

    def state_dict(self) -> dict:
        return self.sampler.state_dict()

    def load_state_dict(self, state: dict) -> None:
        self.sampler.load_state_dict(state)

    def __iter__(self):
        it = iter(self.sampler)
        while True:
            idxs = []
            while len(idxs) < self.batch_size:
                i = next(it)
                if i % self.num_shards == self.shard_id:
                    idxs.append(i)
            yield np.stack([self.dataset[i] for i in idxs])


def synthetic_tokens(vocab_size: int, n_tokens: int, seed: int = 0) -> np.ndarray:
    """Deterministic synthetic stream (smoke-mode analog of configs/mode)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, vocab_size, (n_tokens,)).astype(
        np.uint16 if vocab_size < 2**16 else np.uint32
    )
