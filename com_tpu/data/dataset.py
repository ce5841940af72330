"""Dataset template + fixed-shape collate + loader.

Rebuild of pcdet/datasets/dataset.py (DatasetTemplate.prepare_data:144-238 and
collate_batch:240-370) with one deliberate change: the collate emits
**fixed-shape** batches (points padded to MAX_POINTS_PER_SCENE, gt to
MAX_GT_OBJECTS, voxels to MAX_NUMBER_OF_VOXELS) so every train step hits the
same XLA executable.  COM side-arrays are optional per-dataset features — a
dataset without them trains fine (fixes the reference's Waymo-only coupling,
SURVEY §2.3).
"""
from __future__ import annotations

import queue as _queue
import threading
from collections import defaultdict

import numpy as np

from ..utils.registry import DATASETS
from .augmentor.data_augmentor import DataAugmentor
from .point_feature_encoder import PointFeatureEncoder
from .processor import DataProcessor

GT_SIDE_KEYS = ("num_points_in_gt", "true_object", "occupancy_ratio", "facade_type")


class _ThreadLocalRng:
    """np.random.RandomState facade with one independent state per thread.

    PrefetchLoader prepares items on several worker threads; a single
    shared RandomState would race the reseed-then-draw pattern and break
    the advertised per-(seed, epoch, index) determinism whenever
    num_workers > 1.  Each thread lazily gets its own RandomState (seeded
    with the base seed) and _reseed_for_item re-seeds only the calling
    thread's state."""

    def __init__(self, seed: int):
        self._seed = int(seed)
        self._tl = threading.local()

    def _state(self) -> np.random.RandomState:
        rs = getattr(self._tl, "rs", None)
        if rs is None:
            rs = np.random.RandomState(self._seed)
            self._tl.rs = rs
        return rs

    def __getattr__(self, name):
        return getattr(self._state(), name)


class DatasetTemplate:
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None, db_infos=None, seed=None):
        self.dataset_cfg = dataset_cfg
        self.class_names = list(class_names)
        self.training = training
        self.root_path = root_path if root_path is not None else dataset_cfg.get("DATA_PATH")
        self.logger = logger
        self.seed = seed if seed is not None else 0
        # one RandomState shared by augmentor/processor/collate, reseeded per
        # (seed, epoch, index) in _reseed_for_item — per-sample determinism
        # independent of worker scheduling (stronger than the reference's
        # per-worker seeding, common_utils.py:111-117).
        # DATA_AUGMENTOR.SEED_PARITY instead routes every draw through the
        # GLOBAL np.random stream in the reference's call order (the
        # BASELINE.md "GT-Aug sampling seed-matched" target): seed np.random
        # once like the reference's train.py seed 666+rank and the sampled
        # db indices / world-aug decisions replay the PyTorch run.
        self.seed_parity = bool(
            (dataset_cfg.get("DATA_AUGMENTOR") or {}).get("SEED_PARITY", False))
        self.rng = np.random if self.seed_parity else _ThreadLocalRng(self.seed)

        self.point_cloud_range = np.asarray(dataset_cfg["POINT_CLOUD_RANGE"], np.float32)
        self.point_feature_encoder = PointFeatureEncoder(dataset_cfg["POINT_FEATURE_ENCODING"])
        self.data_augmentor = (
            DataAugmentor(
                self.root_path,
                dataset_cfg["DATA_AUGMENTOR"],
                class_names,
                logger=logger,
                db_infos=db_infos,
                rng=self.rng,
            )
            if training and dataset_cfg.get("DATA_AUGMENTOR") is not None
            else None
        )
        self.data_processor = DataProcessor(
            dataset_cfg.get("DATA_PROCESSOR", []),
            self.point_cloud_range,
            training,
            self.point_feature_encoder.num_point_features,
            rng=self.rng,
        )
        self.grid_size = self.data_processor.grid_size
        self.voxel_size = self.data_processor.voxel_size
        self.max_points = int(dataset_cfg.get("MAX_POINTS_PER_SCENE", 180224))
        self.max_gt = int(dataset_cfg.get("MAX_GT_OBJECTS", 500))
        self.epoch = 0

    @property
    def mode(self):
        """'train'/'test' split selector (reference dataset.py:60-62)."""
        return "train" if self.training else "test"

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError

    def set_epoch(self, epoch):
        self.epoch = epoch
        if self.data_augmentor is not None and self.data_augmentor.gt_sampler is not None:
            self.data_augmentor.gt_sampler.epoch = epoch

    def _reseed_for_item(self, index):
        if self.seed_parity:
            return  # global-stream mode: never reseed (reference semantics)
        self.rng.seed((self.seed * 1_000_003 + self.epoch * 9_973 + index) % 2**31)

    def set_confidence_groups(self, conf):
        """Device->host curriculum feedback (train_utils.py:321-328 role)."""
        if self.data_augmentor is not None and self.data_augmentor.gt_sampler is not None:
            self.data_augmentor.gt_sampler.confidence_groups = conf

    def prepare_data(self, data_dict):
        """Augment -> class filter -> feature encode -> process.

        prepare_data parity (dataset.py:144-238) with side-arrays kept aligned
        through the class filter.
        """
        if self.training:
            assert "gt_boxes" in data_dict
            gt_boxes_mask = np.array(
                [n in self.class_names for n in data_dict["gt_names"]], dtype=bool
            )
            data_dict["gt_boxes_mask"] = gt_boxes_mask
            # ensure side-arrays exist so samplers/filters stay aligned
            n = len(data_dict["gt_names"])
            for k, default in (
                ("num_points_in_gt", 0.0),
                ("true_object", 1.0),
                ("occupancy_ratio", 0.0),
                ("facade_type", 0.0),
            ):
                if k not in data_dict:
                    data_dict[k] = np.full(n, default, np.float32)
            if self.data_augmentor is not None:
                data_dict = self.data_augmentor.forward(data_dict)
            else:
                data_dict.pop("gt_boxes_mask", None)

        if data_dict.get("gt_boxes", None) is not None:
            keep = np.array([n in self.class_names for n in data_dict["gt_names"]], bool)
            data_dict["gt_boxes"] = data_dict["gt_boxes"][keep]
            data_dict["gt_names"] = data_dict["gt_names"][keep]
            for k in GT_SIDE_KEYS:
                if k in data_dict and len(np.atleast_1d(data_dict[k])) == len(keep):
                    data_dict[k] = np.asarray(data_dict[k])[keep]
            if "gt_boxes2d" in data_dict and \
                    len(data_dict["gt_boxes2d"]) == len(keep):
                data_dict["gt_boxes2d"] = np.asarray(
                    data_dict["gt_boxes2d"])[keep]
            classes = np.array(
                [self.class_names.index(n) + 1 for n in data_dict["gt_names"]], np.float32
            )
            data_dict["gt_boxes"] = np.concatenate(
                [data_dict["gt_boxes"].astype(np.float32), classes[:, None]], axis=1
            )

        data_dict = self.point_feature_encoder.forward(data_dict)
        data_dict = self.data_processor.forward(data_dict)

        if self.training and len(data_dict.get("gt_boxes", [])) == 0:
            # resample another frame (dataset.py:231-236 behavior)
            new_index = self.rng.randint(len(self))
            return self[new_index]
        data_dict.pop("gt_names", None)
        data_dict.pop("gt_boxes_mask", None)
        return data_dict

    # ---- fixed-shape collate ----
    def collate_batch(self, samples):
        batch = defaultdict(list)
        for s in samples:
            for k, v in s.items():
                batch[k].append(v)
        bs = len(samples)
        out = {"batch_size": bs}

        if "points" in batch:
            pts = np.zeros(
                (bs, self.max_points, batch["points"][0].shape[1]), np.float32
            )
            mask = np.zeros((bs, self.max_points), bool)
            for i, p in enumerate(batch["points"]):
                n = min(len(p), self.max_points)
                if len(p) > self.max_points:
                    sel = self.rng.choice(len(p), self.max_points, replace=False)
                    p = p[sel]
                pts[i, :n] = p[:n]
                mask[i, :n] = True
            out["points"] = pts
            out["points_mask"] = mask

        if "gt_boxes" in batch and batch["gt_boxes"][0] is not None:
            # max width over the batch: an empty (0, W) first sample still
            # reports its true W, and mixed widths (shouldn't happen) pad up
            width = max(
                (np.asarray(g).shape[1] if np.asarray(g).ndim == 2 else 0)
                for g in batch["gt_boxes"]
            ) or 8
            gt = np.zeros((bs, self.max_gt, width), np.float32)
            for i, g in enumerate(batch["gt_boxes"]):
                g = np.asarray(g, np.float32)
                if g.ndim != 2 or not len(g):
                    continue
                n = min(len(g), self.max_gt)
                gt[i, :n, : g.shape[1]] = g[:n]
            out["gt_boxes"] = gt
            for k in GT_SIDE_KEYS:
                if k in batch:
                    arr = np.zeros((bs, self.max_gt), np.float32)
                    for i, v in enumerate(batch[k]):
                        n = min(len(v), self.max_gt)
                        arr[i, :n] = np.asarray(v, np.float32)[:n]
                    out[k] = arr

        if "voxels" in batch:
            # pad to the STATIC config cap — a per-batch max would change the
            # array shape every step and force an XLA recompile per batch
            vmax = self.data_processor.max_voxels or max(
                v.shape[0] for v in batch["voxels"]
            )
            t, f = batch["voxels"][0].shape[1:]
            vox = np.zeros((bs, vmax, t, f), np.float32)
            coords = np.full((bs, vmax, 3), -1, np.int32)
            vnum = np.zeros((bs, vmax), np.int32)
            for i in range(bs):
                n = batch["voxels"][i].shape[0]
                vox[i, :n] = batch["voxels"][i]
                coords[i, :n] = batch["voxel_coords"][i]
                vnum[i, :n] = batch["voxel_num_points"][i]
            out["voxels"] = vox
            out["voxel_coords"] = coords
            out["voxel_num_points"] = vnum

        if "images" in batch:
            # static pad shape so the device batch never retriggers compile
            ph, pw = self.dataset_cfg.get("IMAGE_PAD_SHAPE", (384, 1280))
            ch = batch["images"][0].shape[-1]
            imgs = np.zeros((bs, int(ph), int(pw), ch), np.float32)
            for i, im in enumerate(batch["images"]):
                h = min(im.shape[0], int(ph))
                w = min(im.shape[1], int(pw))
                imgs[i, :h, :w] = im[:h, :w]
            out["images"] = imgs
            out["image_shape"] = np.stack([
                np.asarray(im.shape[:2], np.int32) for im in batch["images"]])
        for k in ("trans_lidar_to_cam", "trans_cam_to_img"):
            if k in batch:
                out[k] = np.stack(batch[k]).astype(np.float32)
        if "gt_boxes2d" in batch and batch["gt_boxes2d"][0] is not None:
            g2 = np.zeros((bs, self.max_gt, 4), np.float32)
            for i, g in enumerate(batch["gt_boxes2d"]):
                n = min(len(g), self.max_gt)
                g2[i, :n] = np.asarray(g, np.float32)[:n]
            out["gt_boxes2d"] = g2
        # world-aug parameters for in-jit camera-projection reversal
        for k, default in (("noise_rot", 0.0), ("noise_scale", 1.0),
                           ("flip_x", False), ("flip_y", False)):
            if k in batch:
                out[k] = np.asarray(
                    [v if v is not None else default for v in batch[k]],
                    bool if isinstance(default, bool) else np.float32)

        for k in ("frame_id", "metadata"):
            if k in batch:
                out[k] = batch[k]
        return out


class PrefetchLoader:
    """Minimal host loader: index sampling + worker threads + prefetch queue.

    IO and numpy augmentation release the GIL enough for threads to overlap
    with device steps; a process-pool variant can slot in later without
    changing the interface (iter of collated fixed-shape batches).
    """

    def __init__(self, dataset: DatasetTemplate, batch_size: int, shuffle: bool,
                 seed: int = 0, num_workers: int = 2, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.epoch = 0
        # multihost data parallelism: each process feeds only its shard of
        # the (epoch-shuffled) index space — DistributedSampler role
        # (pcdet/datasets/__init__.py:65-72); all processes share the same
        # shuffle seed so the shards are disjoint and covering.
        self.process_index = int(process_index)
        self.process_count = max(1, int(process_count))

    def set_epoch(self, epoch):
        self.epoch = epoch
        self.dataset.set_epoch(epoch)

    def _shard_order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        if self.process_count > 1:
            # pad to a multiple of world size (wrap) so every process sees
            # the same number of samples, then take a strided shard
            total = int(np.ceil(len(order) / self.process_count)) * self.process_count
            order = np.concatenate([order, order[: total - len(order)]])
            order = order[self.process_index :: self.process_count]
        return order

    def __len__(self):
        n_samples = int(np.ceil(len(self.dataset) / self.process_count))
        n = n_samples // self.batch_size
        if not self.drop_last and n_samples % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        order = self._shard_order()
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order) - (self.batch_size - 1 if self.drop_last else 0), self.batch_size)
        ]
        # SEED_PARITY routes every draw through the GLOBAL np.random stream
        # in the reference's sequential call order — concurrent workers
        # would scramble exactly the order the mode exists to replay
        workers = 1 if getattr(self.dataset, "seed_parity", False) \
            else self.num_workers
        q: _queue.Queue = _queue.Queue(maxsize=workers * 2)
        stop = object()
        errors: list = []

        def worker(batch_indices_list):
            try:
                for idxs in batch_indices_list:
                    samples = [self.dataset[int(i)] for i in idxs]
                    q.put(self.dataset.collate_batch(samples))
            except BaseException as e:  # surfaced in the consumer
                errors.append(e)
            finally:
                # the sentinel must reach the consumer even on failure, or
                # the training loop blocks on the queue forever
                q.put(stop)

        shards = [batches[i::workers] for i in range(workers)]
        threads = [
            threading.Thread(target=worker, args=(s,), daemon=True) for s in shards
        ]
        for t in threads:
            t.start()
        done = 0
        while done < len(threads):
            item = q.get()
            if item is stop:
                done += 1
                continue
            yield item
        if errors:
            raise RuntimeError("dataloader worker failed") from errors[0]


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False, root_path=None,
                     workers=2, logger=None, training=True, seed=666, db_infos=None):
    """(dataset, loader) — role of pcdet/datasets/__init__.py:50-81."""
    dataset_cls = DATASETS.get(dataset_cfg["DATASET"])
    dataset = dataset_cls(
        dataset_cfg=dataset_cfg,
        class_names=class_names,
        training=training,
        root_path=root_path,
        logger=logger,
        db_infos=db_infos,
        seed=seed,
    )
    process_index, process_count = 0, 1
    if dist:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    loader = PrefetchLoader(
        dataset, batch_size, shuffle=training, seed=seed, num_workers=workers,
        drop_last=training, process_index=process_index,
        process_count=process_count,
    )
    return dataset, loader
