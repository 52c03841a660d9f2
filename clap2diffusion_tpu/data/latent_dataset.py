"""AudioCaps latent dataset: the real training data path.

Re-implements the reference's ``AudioCapsLatentDataset``
(reference data/dataset_latent.py:16-220, one of two byte-identical copies —
SURVEY.md 2.7) as a numpy/JAX pipeline:

- ``metadata_unified.json`` with a ``samples`` list; per-sample ``split``
  field honored, with a seeded 80/10/10 fallback (reference :64-90).
- samples filtered to those whose latent + audio files exist (:92-101).
- pairing strategies matching / shifted(+k mod n) / random (:116-135).
- zero-tensor fallbacks on load errors (:160-162, :190-192).
- latents are [4,64,64] (.npy native, .pt accepted for reference artifacts),
  shape-validated (:180-192); stored NCHW, returned NHWC for TPU.

The loader replaces torch DataLoader workers with a background-thread
prefetcher that overlaps host decode with device steps; batches are
device_put with data-axis sharding by the trainer.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


class AudioCapsLatentDataset:
    def __init__(
        self,
        data_root: str,
        split: str = "train",
        max_samples: Optional[int] = None,
        audio_duration: float = 10.0,
        sample_rate: int = 48_000,
        composition_strategy: str = "matching",
        composition_shift: int = 0,
        seed: int = 42,
        latent_hw: int = 64,
    ):
        self.data_root = Path(data_root)
        self.split = split
        self.sample_rate = sample_rate
        self.target_length = int(sample_rate * audio_duration)
        self.latent_hw = latent_hw
        self.audio_dir = self.data_root / "audio"
        self.latents_dir = self.data_root / "latents"
        metadata_path = self.data_root / "metadata_unified.json"
        if not self.latents_dir.exists():
            raise ValueError(f"Latents directory not found: {self.latents_dir}")
        with open(metadata_path) as f:
            metadata = json.load(f)
        all_samples = metadata.get("samples", [])

        samples = [s for s in all_samples if s.get("split") == split]
        if not samples:
            rng = np.random.RandomState(seed)
            indices = rng.permutation(len(all_samples))
            n_train = int(0.8 * len(all_samples))
            n_val = int(0.1 * len(all_samples))
            sel = {
                "train": indices[:n_train],
                "val": indices[n_train : n_train + n_val],
                "test": indices[n_train + n_val :],
            }[split]
            samples = [all_samples[i] for i in sel]

        self.samples = [
            s for s in samples
            if self._latent_path(s["id"]) is not None
            and (self.audio_dir / f"{s['id']}.wav").exists()
        ]
        if max_samples:
            self.samples = self.samples[:max_samples]

        self.pairs = self._create_pairs(composition_strategy, composition_shift)

    def _latent_path(self, sample_id: str) -> Optional[Path]:
        for ext in (".npy", ".pt"):
            p = self.latents_dir / f"{sample_id}{ext}"
            if p.exists():
                return p
        return None

    def _create_pairs(self, strategy: str, shift: int) -> List[Tuple[int, int]]:
        n = len(self.samples)
        if strategy == "matching":
            return [(i, i) for i in range(n)]
        if strategy == "shifted":
            return [(i, (i + shift) % n) for i in range(n)]
        if strategy == "random":
            rng = np.random.RandomState(42)
            perm = rng.permutation(n)
            return [(i, int(perm[i])) for i in range(n)]
        raise ValueError(f"unknown composition strategy {strategy!r}")

    def __len__(self) -> int:
        return len(self.pairs)

    def _load_audio(self, sample_id: str) -> np.ndarray:
        # Native C++ loader (threaded decode+resample) when built; the
        # pure-numpy path otherwise. Both zero-fallback on errors
        # (reference dataset_latent.py:160-162).
        from clap2diffusion_tpu.utils.native_audio import load_audio

        return load_audio(
            str(self.audio_dir / f"{sample_id}.wav"),
            self.sample_rate,
            self.target_length,
        )

    def _load_latent(self, sample_id: str) -> np.ndarray:
        path = self._latent_path(sample_id)
        expected = (4, self.latent_hw, self.latent_hw)
        try:
            if path is None:
                raise FileNotFoundError(sample_id)
            if path.suffix == ".npy":
                lat = np.load(path)
            else:
                import torch

                lat = torch.load(path, map_location="cpu", weights_only=True).numpy()
            lat = np.asarray(lat, np.float32)
            if lat.shape != expected:
                raise ValueError(f"bad latent shape {lat.shape}")
            return lat
        except Exception:
            # zero fallback (reference dataset_latent.py:190-192)
            return np.zeros(expected, np.float32)

    def __getitem__(self, idx: int) -> Dict:
        ai, li = self.pairs[idx]
        a, im = self.samples[ai], self.samples[li]
        latent_nchw = self._load_latent(im["id"])
        return {
            "audio": self._load_audio(a["id"]),
            "latent": latent_nchw.transpose(1, 2, 0),  # NHWC for TPU
            "caption": a.get("caption", ""),
            "audio_id": a["id"],
            "image_id": im["id"],
        }


class PrefetchLoader:
    """Background-thread batch prefetcher (replaces torch DataLoader workers,
    reference data/dataset.py:421-463): decode next batches on the host while
    the device runs the current step."""

    def __init__(
        self,
        dataset: AudioCapsLatentDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 42,
        prefetch: int = 2,
        drop_last: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        """``shard_index``/``num_shards``: multi-host data sharding. Every
        host shuffles the full index list with the SAME seed, truncates it
        to a multiple of ``num_shards``, and takes the strided slice
        ``order[shard_index::num_shards]`` — guaranteed disjoint per step
        (not merely disjoint in expectation), the analogue of the
        reference's seeded per-worker sampling (reference
        data/dataset.py:351-360,417-418). The truncation makes every
        shard the SAME size, so all hosts advance epochs in lockstep —
        without it, hosts with one extra batch would drift onto different
        epoch permutations, whose strided slices are NOT disjoint (review
        r3 finding #1). The <= num_shards-1 dropped samples rotate with
        the per-epoch reshuffle."""
        if not (0 <= shard_index < num_shards):
            raise ValueError(f"shard_index {shard_index} not in [0, {num_shards})")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards

    def _shard_size(self) -> int:
        return len(self.dataset) // self.num_shards

    def __len__(self) -> int:
        n = self._shard_size()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _collate(self, items: List[Dict]) -> Dict:
        return {
            "audio": np.stack([it["audio"] for it in items]),
            "latent": np.stack([it["latent"] for it in items]),
            "caption": [it["caption"] for it in items],
            "audio_id": [it["audio_id"] for it in items],
            "image_id": [it["image_id"] for it in items],
        }

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch_idx).shuffle(order)
        usable = self._shard_size() * self.num_shards
        order = order[:usable][self.shard_index :: self.num_shards]
        n_batches = len(self)
        if n_batches == 0:
            # a silent empty epoch would spin run_stage's while-loop forever
            # while peer hosts block in collectives
            raise ValueError(
                f"shard {self.shard_index}/{self.num_shards} has "
                f"{len(order)} samples — fewer than batch_size "
                f"{self.batch_size}; shrink the batch or the shard count"
            )
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def worker():
            for b in range(n_batches):
                idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                if self.drop_last and len(idxs) < self.batch_size:
                    break
                q.put(self._collate([self.dataset[int(i)] for i in idxs]))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
