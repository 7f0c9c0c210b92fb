"""Host-side input pipelines: threaded decode/augment -> DCT -> device batches.

Replaces the reference's Keras `Sequence` generators + `fit_generator(workers=4,
use_multiprocessing=True)` (`classification_part/training.py:179-198`,
`localisation_part/.../object_detection_2d_data_generator_dct_j2d.py:843-1195`)
with a deterministic, explicitly-seeded pipeline:

  * per-epoch shuffle from a seeded generator (reproducible; per-host sharding
    composes via `dataset.shard` — an improvement over the reference's
    independent per-rank shuffles, SURVEY.md §5.7);
  * a thread pool runs the per-image work (PIL decode, augmentation chain,
    JPEG re-encode, native DCT decode) — libjpeg/cv2/ctypes release the GIL,
    so threads scale without the reference's fork-based worker quirks;
  * target encoding runs as ONE jit-compiled batched XLA program
    (`boxes.TargetEncoder`) instead of per-image NumPy;
  * `prefetch_to_device` double-buffers host->device transfers.

Input formats (matching the reference's generator variants):
  'dct'        -> (y, cbcr)           DCTGeneratorJPEG2DCT / DataGeneratorDCT
  'dct_deconv' -> (y, cb, cr)         ...JPEG2DCTDeconv / DataGeneratorDeconvDCT
  'rgb'        -> float32 image       DataGenerator (RGB SSD)
  'dct_image'  -> (H, W, 3) DCT plane jpegdecoder path (DataGeneratorDCT _dct.py)
  'dct_255'    -> (H, W, 3) DCT plane rescaled to 0-255
                 (`object_detection_2d_data_generator_dct_255.py:1174-1184`)
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable

import numpy as np
from PIL import Image

from jpeg_detection_resnet_ssd_tpu.data import augment as aug
from jpeg_detection_resnet_ssd_tpu.data.dct_convert import (
    rgb_to_dct_image,
    rgb_to_dct_tensors,
    split_cbcr,
)


def _load_rgb(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _load_record_rgb(rec: dict) -> np.ndarray:
    """Decode a detection record's image from bytes (HDF5 cache) or path."""
    if "image_bytes" in rec:
        import io

        with Image.open(io.BytesIO(rec["image_bytes"])) as im:
            return np.asarray(im.convert("RGB"))
    return _load_rgb(rec["image_path"])


def _pack_inputs(images: list[np.ndarray], input_format: str):
    if input_format == "rgb":
        return np.stack(images).astype(np.float32)
    if input_format == "dct_image":
        return np.stack(
            [rgb_to_dct_image(im) for im in images]
        ).astype(np.float32)
    if input_format == "dct_255":
        # The `_dct_255` generator variant: same jpegdecoder level-2 spatial
        # layout, each dequantized coefficient affinely rescaled into 0-255
        # with the reference's exact integer arithmetic `(x + 1024) * 255
        # // 2048` (floor division; coefficients live in ~[-1024, 1016] so
        # the result is in [0, 254]).  Reference:
        # `object_detection_2d_data_generator_dct_255.py:1174-1184`.
        planes = np.stack(
            [rgb_to_dct_image(im) for im in images]
        ).astype(np.int64)
        return ((planes + 1024) * 255 // 2048).astype(np.float32)
    ys, cbcrs = zip(*(rgb_to_dct_tensors(im) for im in images))
    y = np.stack(ys).astype(np.float32)
    cbcr = np.stack(cbcrs).astype(np.float32)
    if input_format == "dct_deconv":
        cb, cr = cbcr[..., :64], cbcr[..., 64:]
        return (y, cb, cr)
    if input_format == "dct":
        return (y, cbcr)
    raise ValueError(f"unknown input_format {input_format!r}")


class _BasePipeline:
    def __init__(self, dataset, batch_size: int, *, train: bool,
                 input_format: str = "dct", seed: int = 0,
                 num_workers: int = 8, drop_remainder: bool | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.train = train
        self.input_format = input_format
        self.seed = seed
        self.num_workers = num_workers
        self.drop_remainder = train if drop_remainder is None else drop_remainder
        self._pool = ThreadPoolExecutor(max_workers=num_workers)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self):
        order = np.arange(len(self.dataset))
        if self.train:
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
        self._epoch += 1
        return order

    def _item_rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, self._epoch, int(index)))

    def __iter__(self):
        order = self._epoch_order()
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            items = list(self._pool.map(self._prepare_item, idx))
            yield self._collate(items)

    def _prepare_item(self, index):  # pragma: no cover - abstract
        raise NotImplementedError

    def _collate(self, items):  # pragma: no cover - abstract
        raise NotImplementedError


class ClassificationPipeline(_BasePipeline):
    """ImageNet-style pipeline: role of `DCTGeneratorJPEG2DCT[Deconv]` /
    `DCTGeneratorImageNet` (`generators.py:39-472`).

    Yields {'inputs': ..., 'labels': int32 (B,)}.
    """

    def __init__(self, dataset, batch_size: int, *, train: bool,
                 input_format: str = "dct", image_size: int = 224,
                 host_augment: bool | None = None, **kw):
        super().__init__(dataset, batch_size, train=train,
                         input_format=input_format, **kw)
        self.image_size = image_size
        # host_augment=False with train=True: epoch shuffling + drop_remainder
        # stay in training mode but the host emits the deterministic eval view
        # — the contract of the device-augment paths, where crop/flip/
        # photometric run on the accelerator instead.
        self.host_augment = train if host_augment is None else host_augment

    def _prepare_item(self, index):
        path, label = self.dataset[int(index)]
        image = _load_rgb(path)
        if self.host_augment:
            image = aug.classification_train_view(
                image, self._item_rng(index), self.image_size
            )
        else:
            image = aug.classification_eval_view(image, self.image_size)
        return image, label

    def _collate(self, items):
        images = [im for im, _ in items]
        labels = np.asarray([lab for _, lab in items], np.int32)
        return {
            "inputs": _pack_inputs(images, self.input_format),
            "labels": labels,
        }


class DetectionPipeline(_BasePipeline):
    """Pascal-VOC-style pipeline: role of `DataGenerator[Deconv]DCT.generate`
    (`_dct_j2d.py:843-1195`).

    Training (`encoder` set): yields {'inputs', 'targets'} with targets from
    the jit-compiled `TargetEncoder`.  Evaluation (`encoder=None`): yields
    {'inputs', 'labels', 'image_ids', 'inverters'} where inverters map
    predicted boxes back to original image coordinates (the reference's
    `apply_inverse_transforms` contract).
    """

    def __init__(self, dataset, batch_size: int, *, train: bool,
                 encoder=None, augmentation: Callable | str | None = "default",
                 input_format: str = "dct", img_height: int = 300,
                 img_width: int = 300, max_gt: int = 64,
                 device_encode: bool = False, **kw):
        super().__init__(dataset, batch_size, train=train,
                         input_format=input_format, **kw)
        self.encoder = encoder
        # device_encode: emit raw padded GT ('gt'/'gt_mask') instead of encoded
        # 'targets'; pair with Trainer(target_encoder=encoder.encode_fn) to
        # fuse encoding into the train step (minimizes host->device transfer).
        self.device_encode = device_encode
        self.img_height, self.img_width = img_height, img_width
        self.max_gt = max_gt
        # augmentation: "default" -> the Caffe-SSD chain when training;
        # None -> resize only (EXPLICIT no-augmentation, e.g. for debugging /
        # evaluation); any callable -> used as-is.
        if augmentation == "default":
            augmentation = (
                aug.SSDDataAugmentation(img_height, img_width) if train
                else None
            )
        self.augmentation = augmentation

    def _prepare_item(self, index):
        rec = self.dataset[int(index)]
        image = _load_record_rgb(rec)
        labels = rec["boxes"].copy()
        inverter = None
        if self.augmentation is not None:
            image, labels = self.augmentation(
                image, labels, self._item_rng(index)
            )
        else:
            image = aug.to_3_channels(image)
            image, labels, inverter = aug.resize(
                image, labels, self.img_height, self.img_width,
                filter_degenerate=False, return_inverter=True,
            )
        difficult = rec.get(
            "difficult", np.zeros(len(rec["boxes"]), bool)
        )
        return image, labels, rec.get("image_id"), inverter, rec, difficult

    def _collate(self, items):
        images = [it[0] for it in items]
        labels_list = [it[1] for it in items]
        batch: dict[str, Any] = {
            "inputs": _pack_inputs(images, self.input_format)
        }
        if self.encoder is not None:
            gt, mask = self.encoder.pad_labels(labels_list, self.max_gt)
            if self.device_encode:
                batch["gt"] = gt
                batch["gt_mask"] = mask
            else:
                batch["targets"] = np.asarray(self.encoder(gt, mask))
        else:
            # Evaluation contract: original-coordinate GT + inverse transforms
            # (`average_precision_evaluator.py:323-422`).
            batch["labels"] = [it[4]["boxes"] for it in items]
            batch["image_ids"] = [it[2] for it in items]
            batch["inverters"] = [it[3] for it in items]
            batch["difficult"] = [it[5] for it in items]
        return batch


def prefetch_to_device(iterator, size: int = 2, device_put: bool = True):
    """Double-buffered prefetch: a background thread stages the next batches
    (optionally already on device) while the current step runs — the role of
    Keras' generator workers + implicit feed pipelining."""
    import jax

    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for batch in iterator:
                if device_put:
                    batch = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x)
                        if isinstance(x, np.ndarray)
                        else x,
                        batch,
                    )
                q.put(batch)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item


class DeviceDCTAugmentedPipeline:
    """Recompression-free classification pipeline: host decodes ONE oversized
    DCT map per image; crop/flip run on DEVICE in coefficient space.

    The fast path replacing the reference's per-step pixel-space augment +
    JPEG re-encode loop (`generators.py:145-183`, the throughput ceiling of
    its training stack — SURVEY.md §3.1): the host pays one JPEG decode per
    image per epoch (no re-encode), and `ops.dct_random_crop_flip` applies a
    batched random 16px-aligned crop + horizontal flip on the accelerator.

    Wraps a `ClassificationPipeline`-style dataset; yields batches with
    `inputs = (y (B,28,28,64), cbcr (B,14,14,128))` like input_format='dct'.
    Photometric parity note: pixel-space photometric distortions are not
    applied on this path (DCT-domain equivalents: brightness = DC shift,
    contrast = coefficient scale — round-2 work); distribution parity is a
    metric-level argument (SURVEY.md §7.4).
    """

    def __init__(self, dataset, batch_size: int, *, train: bool = True,
                 source_size: int = 256, crop_blocks: int = 28,
                 photometric: bool = True,
                 seed: int = 0, num_workers: int = 8, quality: int = 75):
        from jpeg_detection_resnet_ssd_tpu.data.augment import (
            classification_eval_view,
        )

        self.inner = ClassificationPipeline(
            dataset, batch_size, train=train, host_augment=False,
            input_format="dct", image_size=source_size, seed=seed,
            num_workers=num_workers,
        )
        self.train = train
        self.crop_blocks = crop_blocks
        self.photometric = photometric
        self.seed = seed
        self._step = 0

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        import jax

        from jpeg_detection_resnet_ssd_tpu.ops import dct_random_crop_flip
        from jpeg_detection_resnet_ssd_tpu.ops.dct_augment import (
            dct_random_photometric,
        )

        for batch in self.inner:
            y, cbcr = batch["inputs"]
            if self.train:
                key = jax.random.PRNGKey((self.seed << 20) ^ self._step)
                self._step += 1
                y, cbcr = dct_random_crop_flip(
                    y, cbcr, key,
                    out_y_blocks=self.crop_blocks,
                    out_cbcr_blocks=self.crop_blocks // 2,
                )
                if self.photometric:
                    y, cbcr = dct_random_photometric(
                        y, cbcr, jax.random.fold_in(key, 1)
                    )
            else:
                # center crop
                H8 = y.shape[1]
                off = ((H8 - self.crop_blocks) // 4) * 2
                y = y[:, off : off + self.crop_blocks,
                      off : off + self.crop_blocks]
                offc = off // 2
                cb = self.crop_blocks // 2
                cbcr = cbcr[:, offc : offc + cb, offc : offc + cb]
            yield {"inputs": (y, cbcr), "labels": batch["labels"]}
