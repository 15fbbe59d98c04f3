"""Dataloader factory + threaded/process-pooled prefetching loader.

Reference: create_dataloaders (src/dataloaders.py:10-113) — JSON load, seeded
shuffle, 90/10 split, torch DataLoaders with num_workers + pin_memory. The
TPU-native analog: a thread-pooled batch builder (the native FLAC decode
releases the GIL, so threads parallelize decode) with a bounded prefetch
queue feeding device puts; no torch dependency.

Scaling past one chip (round-3 VERDICT #6): the thread pool tops out at one
core's worth of Python-side work (tokenize/collate hold the GIL even though
the native decode releases it). `worker_processes=N` switches batch building
to a ProcessPoolExecutor — the reference's num_workers>0 fork semantics
(torch DataLoader workers are separate processes too, SURVEY.md §3.4) — with
the dataset shipped once per worker via the pool initializer and one pickle
per COLLATED BATCH coming back (~2 MB/clip of mel-ready audio; a memcpy,
not a re-decode). Throughput then scales with cores until the ~GB/s result
pipe saturates; combine with multi-host loader shards
(process_index/process_count) beyond that.
"""

from __future__ import annotations

import json
import logging
import random
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Tuple

from .dataset import AudioLLMDataset, DatasetConfig, collate

logger = logging.getLogger(__name__)

# Per-process dataset cache for ProcessPoolExecutor workers: the dataset is
# pickled ONCE per worker (initializer), not once per task.
_WORKER_DATASET: Optional[AudioLLMDataset] = None


def _pool_init(dataset: AudioLLMDataset) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _pool_build(batch_idx: List[int], force_audio: Optional[bool],
                audio_samples: Optional[int]) -> Dict[str, Any]:
    ds = _WORKER_DATASET
    assert ds is not None, "worker pool not initialized"
    if force_audio is None:
        return collate([ds[i] for i in batch_idx])
    return collate(
        [ds[i] for i in batch_idx],
        force_audio=force_audio,
        audio_samples=audio_samples,
    )


class DataLoader:
    """Map-style loader with in-order threaded prefetch."""

    def __init__(
        self,
        dataset: AudioLLMDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 42,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        process_index: int = 0,
        process_count: int = 1,
        worker_processes: int = 0,
    ):
        """process_index/process_count: multi-host data sharding. batch_size
        stays the GLOBAL batch size; every process computes the identical
        seeded global batch index list and loads only its contiguous
        batch_size/process_count row slice (parallel/distributed.py assembles
        the global device batch). Batch MODALITY (audio vs text-only) is
        decided from metadata over the GLOBAL index list so all processes
        compile/run the same program structure even when a local slice is
        all-text in a mixed batch."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.worker_processes = max(0, worker_processes)
        if self.worker_processes:
            # keep every pool process busy: at least one in-flight batch each
            self.prefetch = max(self.prefetch, self.worker_processes)
        self._epoch = 0
        self.process_index = process_index
        self.process_count = max(1, process_count)
        if self.process_count > 1:
            if batch_size % self.process_count:
                raise ValueError(
                    f"global batch_size {batch_size} must be divisible by "
                    f"process_count {self.process_count}"
                )
            if not drop_last:
                raise ValueError(
                    "multi-process loading requires drop_last=True (ragged "
                    "final batches cannot be split evenly across hosts)"
                )

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _batches(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self._epoch).shuffle(idx)
        out = []
        for i in range(0, len(idx), self.batch_size):
            b = idx[i : i + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                continue
            out.append(b)
        return out

    def _build(self, batch_idx: List[int]) -> Dict[str, Any]:
        if self.process_count == 1:
            return collate([self.dataset[i] for i in batch_idx])
        # Metadata-only modality vote over the GLOBAL batch (no IO): all
        # processes agree on batch structure without communicating.
        force_audio = any(self.dataset.entry_has_audio(i) for i in batch_idx)
        lbs = self.batch_size // self.process_count
        local = batch_idx[self.process_index * lbs : (self.process_index + 1) * lbs]
        return collate(
            [self.dataset[i] for i in local],
            force_audio=force_audio,
            audio_samples=self.dataset.cfg.max_samples,
        )

    def _submit_fn(self, ex):
        """(executor, batch_idx) -> future, for both pool flavors."""
        if self.worker_processes:
            def submit(batch_idx):
                if self.process_count == 1:
                    return ex.submit(_pool_build, batch_idx, None, None)
                force_audio = any(
                    self.dataset.entry_has_audio(i) for i in batch_idx
                )
                lbs = self.batch_size // self.process_count
                local = batch_idx[
                    self.process_index * lbs : (self.process_index + 1) * lbs
                ]
                return ex.submit(
                    _pool_build, local, force_audio,
                    self.dataset.cfg.max_samples,
                )

            return submit
        return lambda batch_idx: ex.submit(self._build, batch_idx)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        batches = self._batches()
        if self.worker_processes:
            pool = ProcessPoolExecutor(
                max_workers=self.worker_processes,
                initializer=_pool_init,
                initargs=(self.dataset,),
            )
        else:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
        with pool as ex:
            submit = self._submit_fn(ex)
            inflight = []
            it = iter(batches)
            try:
                for _ in range(self.prefetch):
                    inflight.append(submit(next(it)))
            except StopIteration:
                pass
            i = 0
            while i < len(batches):
                fut = inflight.pop(0)
                try:
                    inflight.append(submit(batches[i + self.prefetch]))
                except IndexError:
                    pass
                yield fut.result()
                i += 1


def create_dataloaders(
    data_path: str,
    audio_dir: str,
    tokenizer,
    batch_size: int = 8,
    val_split: float = 0.1,
    seed: int = 42,
    num_workers: int = 4,
    dataset_config: Optional[DatasetConfig] = None,
    dataset_config_path: Optional[str] = None,
    max_samples: Optional[int] = None,
    val_batch_size: Optional[int] = None,
    process_index: int = 0,
    process_count: int = 1,
    worker_processes: int = 0,
) -> Tuple[DataLoader, DataLoader, DatasetConfig]:
    """JSON -> (train_loader, val_loader, dataset_config).

    Matches the reference semantics (src/dataloaders.py:10-113): seeded
    shuffle, (1-val_split)/val_split split, train shuffled / val not. The key
    mapping from dataset_config.json IS honored here (reference bug fixed).
    """
    cfg = dataset_config if dataset_config is not None else DatasetConfig()
    if dataset_config_path:
        # The file's key mapping wins over the object's defaults — the
        # trainer passes both (object = shape/policy flags, file = keymap
        # produced by the corpus builder; reference src/get_librispeech.py:
        # 319-333). Ignoring the file when an object is present would
        # recreate the reference's ignored-keymap bug.
        file_cfg = DatasetConfig.from_json_file(dataset_config_path)
        cfg.audio_key = file_cfg.audio_key
        cfg.text_key = file_cfg.text_key
        cfg.response_key = file_cfg.response_key

    with open(data_path) as f:
        data = json.load(f)
    if isinstance(data, dict) and "examples" in data:
        data = data["examples"]
    if max_samples:
        data = data[:max_samples]

    rng = random.Random(seed)
    rng.shuffle(data)
    n_val = max(1, int(len(data) * val_split)) if len(data) > 1 else 0
    val_entries = data[:n_val]
    train_entries = data[n_val:]
    logger.info(
        "dataset: %d train / %d val entries", len(train_entries), len(val_entries)
    )

    train_ds = AudioLLMDataset(train_entries, audio_dir, tokenizer, cfg)
    val_ds = AudioLLMDataset(val_entries, audio_dir, tokenizer, cfg)
    train = DataLoader(
        train_ds, batch_size, shuffle=True, seed=seed, drop_last=True,
        num_workers=num_workers,
        process_index=process_index, process_count=process_count,
        worker_processes=worker_processes,
    )
    # Static-shape eval: clamp to the dataset and drop ragged tails only
    # when at least one full batch exists (jitted eval steps are compiled
    # per batch shape).
    vbs = min(val_batch_size or batch_size, max(len(val_ds), 1))
    if process_count > 1:
        # global val batches must split evenly across hosts
        vbs = max(vbs - vbs % process_count, process_count)
    val = DataLoader(
        val_ds, vbs, shuffle=False, seed=seed,
        drop_last=len(val_ds) >= vbs or process_count > 1,
        num_workers=num_workers,
        process_index=process_index, process_count=process_count,
        worker_processes=worker_processes,
    )
    return train, val, cfg


def get_sample_batch(loader: DataLoader) -> Dict[str, Any]:
    """First batch (debug helper; reference src/dataloaders.py:115-126)."""
    return next(iter(loader))
