"""Packed DCT-tensor corpus: decode once, train from memmapped coefficients.

The host pipeline's ceiling is the per-image JPEG decode + augment + DCT
re-encode (~80 img/s on this VM class, BENCHMARK.md) — the same per-epoch tax
the reference pays in its generator loop (`_dct_j2d.py:1167-1189`).  With the
device-side augmentation chain (`ops/dct_detect_augment.py`) no pixel-space
work remains per epoch, so the host job collapses to "hand the device fixed-
shape coefficient tensors".  This module pre-decodes a detection dataset ONCE
into memmapped arrays:

    <stem>.y.npy     (N, H8, W8, 64)   int16 luma coefficients
    <stem>.cbcr.npy  (N, H8/2, W8/2, 128) int16 chroma
    <stem>.labels.npz  gt (N, max_gt, 5) f32, gt_mask (N, max_gt) bool,
                       image ids

and serves batches at memory-bandwidth speed (`PackedDctPipeline`): per batch
the only Python work is a fancy-index gather + int16 -> f32 cast.  Epochs are
deterministically shuffled per seed; per-host sharding slices the index space
(deterministic, disjoint — SURVEY.md §5.8's improvement over the reference's
independent shuffles).

Role in the reference: `create_hdf5_dataset` (`object_detection_2d_data_
generator.py:673`) packed encoded bytes for RAM locality but still decoded
per epoch; this packs the DECODED representation the model actually eats.
"""

from __future__ import annotations

import json
import os

import numpy as np

from jpeg_detection_resnet_ssd_tpu.data import augment as aug
from jpeg_detection_resnet_ssd_tpu.data.dct_convert import rgb_to_dct_tensors
from jpeg_detection_resnet_ssd_tpu.data.pipeline import _load_record_rgb


class PackedDctDataset:
    """Memmap-backed fixed-frame DCT corpus for the device-augment path.

    Detection corpora (via `create`) carry padded GT boxes; classification
    corpora (via `create_classification`) carry int class labels."""

    def __init__(self, stem: str):
        self.stem = stem
        with open(stem + ".meta.json") as f:
            self.meta = json.load(f)
        self.y = np.load(stem + ".y.npy", mmap_mode="r")
        self.cbcr = np.load(stem + ".cbcr.npy", mmap_mode="r")
        labels = np.load(stem + ".labels.npz", allow_pickle=False)
        if "labels" in labels:  # classification corpus
            self.labels = labels["labels"]
            self.gt = self.gt_mask = None
        else:
            self.gt = labels["gt"]
            self.gt_mask = labels["gt_mask"]
            self.labels = None
        self.image_ids = [s for s in labels["image_ids"]]

    def __len__(self):
        return self.y.shape[0]

    @classmethod
    def create_classification(
        cls,
        dataset,
        stem: str,
        img_size: int = 256,
        quality: int = 75,
        num_workers: int = 8,
        verbose: bool = False,
    ) -> "PackedDctDataset":
        """Pack an (image, class-label) dataset (e.g. ImageFolderDataset,
        records `(path, label)`) at the device-augment SOURCE frame
        (oversized, e.g. 256 = 32 luma blocks for a 224 crop)."""
        from concurrent.futures import ThreadPoolExecutor

        from jpeg_detection_resnet_ssd_tpu.data.augment import (
            classification_eval_view,
        )

        n = len(dataset)
        s8 = img_size // 8
        y_arr = np.lib.format.open_memmap(
            stem + ".y.npy", mode="w+", dtype=np.int16,
            shape=(n, s8, s8, 64),
        )
        c_arr = np.lib.format.open_memmap(
            stem + ".cbcr.npy", mode="w+", dtype=np.int16,
            shape=(n, s8 // 2, s8 // 2, 128),
        )
        labels = np.zeros((n,), np.int32)
        image_ids = [""] * n

        def work(i):
            path, label = dataset[i]
            from jpeg_detection_resnet_ssd_tpu.data.pipeline import _load_rgb

            image = classification_eval_view(_load_rgb(path), size=img_size)
            y, cbcr = rgb_to_dct_tensors(image, quality=quality)
            y_arr[i] = y.astype(np.int16)
            c_arr[i] = cbcr.astype(np.int16)
            labels[i] = label
            image_ids[i] = os.path.basename(path)
            if verbose and i % 1000 == 0:
                print(f"pack: {i}/{n}", flush=True)

        with ThreadPoolExecutor(num_workers) as pool:
            list(pool.map(work, range(n)))
        y_arr.flush()
        c_arr.flush()
        np.savez(
            stem + ".labels.npz", labels=labels,
            image_ids=np.asarray(image_ids),
        )
        with open(stem + ".meta.json", "w") as f:
            json.dump(
                {"n": n, "img_size": img_size, "quality": quality,
                 "task": "classification"},
                f,
            )
        return cls(stem)

    @classmethod
    def create(
        cls,
        dataset,
        stem: str,
        img_height: int = 352,
        img_width: int = 352,
        max_gt: int = 64,
        quality: int = 75,
        num_workers: int = 8,
        verbose: bool = False,
        use_native: bool = True,
    ) -> "PackedDctDataset":
        """Decode + resize + block-DCT every record once.

        `dataset` is any detection dataset (records with image_path/bytes and
        (k, 5) `boxes`).  The frame is the device-augment SOURCE frame
        (oversized, e.g. 352 = 44 luma blocks for a 304 crop).

        `use_native=True` runs the whole per-image hot loop (JPEG decode ->
        cv2-convention bilinear resize -> 4:2:0 re-encode -> coefficient
        decode) in ONE C++ call (`dctjpeg.pack`) that releases the GIL — the
        thread pool then scales across cores without PIL/numpy round-trips.
        Records whose bytes the native path cannot decode (e.g. PNGs in a
        mixed corpus) fall back to the Python path per record; box rescaling
        matches `aug.resize` exactly (parity-tested)."""
        from concurrent.futures import ThreadPoolExecutor

        n = len(dataset)
        h8, w8 = img_height // 8, img_width // 8
        y_arr = np.lib.format.open_memmap(
            stem + ".y.npy", mode="w+", dtype=np.int16,
            shape=(n, h8, w8, 64),
        )
        c_arr = np.lib.format.open_memmap(
            stem + ".cbcr.npy", mode="w+", dtype=np.int16,
            shape=(n, h8 // 2, w8 // 2, 128),
        )
        gt = np.zeros((n, max_gt, 5), np.float32)
        gt_mask = np.zeros((n, max_gt), bool)
        image_ids = [""] * n

        def _native_pack_record(rec):
            """One C++ call for the image path; returns (y, cbcr, labels) or
            None when the record needs the Python fallback."""
            import io

            from PIL import Image

            from jpeg_detection_resnet_ssd_tpu import dctjpeg

            buf = rec.get("image_bytes")
            if buf is None:
                with open(rec["image_path"], "rb") as f:
                    buf = f.read()
            try:
                # Header-only probe for the original size (PIL decodes
                # lazily), needed to rescale boxes like `aug.resize`.
                with Image.open(io.BytesIO(buf)) as im:
                    if im.format != "JPEG":
                        return None
                    w0, h0 = im.size
                y, cbcr = dctjpeg.pack(
                    buf, img_height, img_width, quality=quality
                )
            except (dctjpeg.JPEGDecodeError, OSError):
                return None
            labels = rec["boxes"].astype(np.float32).copy()
            if len(labels):
                labels[:, [1, 3]] *= img_width / w0
                labels[:, [2, 4]] *= img_height / h0
            return y, cbcr, labels

        def work(i):
            rec = dataset[i]
            native = _native_pack_record(rec) if use_native else None
            if native is not None:
                y, cbcr, labels = native
            else:
                image = _load_record_rgb(rec)
                labels = rec["boxes"].copy()
                image, labels = aug.resize(
                    aug.to_3_channels(image), labels, img_height, img_width,
                    filter_degenerate=False,
                )
                y, cbcr = rgb_to_dct_tensors(image, quality=quality)
            y_arr[i] = y.astype(np.int16)
            c_arr[i] = cbcr.astype(np.int16)
            k = min(len(labels), max_gt)
            if k:
                gt[i, :k] = labels[:k]
                gt_mask[i, :k] = True
            image_ids[i] = str(rec.get("image_id", i))
            if verbose and i % 200 == 0:
                print(f"pack: {i}/{n}", flush=True)

        with ThreadPoolExecutor(num_workers) as pool:
            list(pool.map(work, range(n)))
        y_arr.flush()
        c_arr.flush()
        np.savez(
            stem + ".labels.npz", gt=gt, gt_mask=gt_mask,
            image_ids=np.asarray(image_ids),
        )
        with open(stem + ".meta.json", "w") as f:
            json.dump(
                {
                    "n": n, "img_height": img_height, "img_width": img_width,
                    "max_gt": max_gt, "quality": quality,
                },
                f,
            )
        return cls(stem)


def load_or_create(
    stem: str,
    dataset,
    *,
    task: str = "detection",
    num_workers: int = 8,
    verbose: bool = True,
    **create_kwargs,
) -> PackedDctDataset:
    """Multi-host-safe create-or-load with staleness validation.

    Pass the FULL (unsharded) dataset: only process 0 packs (concurrent
    writers would corrupt the shared memmaps), other hosts wait at a global
    sync, and every host validates the loaded corpus against the requested
    dataset size and pack parameters — a stale cache (different --train-dir,
    changed frame size/quality) raises instead of silently training on the
    wrong data.  Per-host sharding belongs at the PIPELINE
    (`PackedDctPipeline(shard_index=..., shard_count=...)`), never at pack
    time."""
    import jax

    # Barrier participation must be collectively consistent: if each host
    # branched on its OWN os.path.exists() a host that observes the cache
    # only after process 0 finishes packing would skip the barrier while
    # others wait in it (cross-host TOCTOU -> hang / mispaired collectives,
    # ADVICE.md round 2).  So under multi-process we ALWAYS enter the
    # barrier; only the create decision is local to process 0.
    if jax.process_index() == 0 and not os.path.exists(stem + ".meta.json"):
        create = (
            PackedDctDataset.create_classification
            if task == "classification"
            else PackedDctDataset.create
        )
        create(dataset, stem, num_workers=num_workers, verbose=verbose,
               **create_kwargs)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"pack:{stem}")
    packed = PackedDctDataset(stem)
    if len(packed) != len(dataset):
        raise ValueError(
            f"pack cache {stem} holds {len(packed)} records but the dataset "
            f"has {len(dataset)} — stale cache? delete {stem}.* to re-pack"
        )
    for k, v in create_kwargs.items():
        if k in packed.meta and packed.meta[k] != v:
            raise ValueError(
                f"pack cache {stem} was built with {k}={packed.meta[k]} but "
                f"this run wants {k}={v} — delete {stem}.* to re-pack"
            )
    return packed


class PackedDctPipeline:
    """Batch iterator over a PackedDctDataset: gather + cast, nothing else.

    Yields {'inputs': (y, cbcr) f32, 'gt', 'gt_mask'} — exactly the batch
    contract of `Trainer(augment_fn=make_dct_detection_augment_v2(...),
    target_encoder=...)`.  Deterministic per-(seed, epoch) shuffle;
    `shard_index/shard_count` slice the example space disjointly per host.
    """

    def __init__(
        self,
        dataset: PackedDctDataset,
        batch_size: int,
        *,
        train: bool = True,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
        drop_last: bool = True,
        ship_dtype=np.float32,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.epoch = 0
        idx = np.arange(len(dataset))
        self.indices = idx[shard_index::shard_count]
        self.drop_last = drop_last
        # ship_dtype=np.int16 halves host->device transfer; the device-side
        # augment factories cast to f32 inside the compiled step.  Only use
        # with a Trainer augment_fn (raw int16 into a conv would mispromote).
        self.ship_dtype = np.dtype(ship_dtype)

    def __iter__(self):
        idx = self.indices
        if self.train:
            rng = np.random.default_rng((self.seed, self.epoch))
            idx = rng.permutation(idx)
            self.epoch += 1
        n_full = len(idx) // self.batch_size
        end = n_full * self.batch_size if self.drop_last else len(idx)
        for s in range(0, end, self.batch_size):
            take = np.sort(idx[s : s + self.batch_size])
            batch = {
                "inputs": (
                    np.ascontiguousarray(self.ds.y[take], self.ship_dtype),
                    np.ascontiguousarray(self.ds.cbcr[take], self.ship_dtype),
                ),
            }
            if self.ds.labels is not None:
                batch["labels"] = self.ds.labels[take]
            else:
                batch["gt"] = self.ds.gt[take]
                batch["gt_mask"] = self.ds.gt_mask[take]
            yield batch

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
