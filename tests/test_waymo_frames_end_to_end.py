"""Reference-format Waymo frames through the FULL framework path.

No real Waymo data exists in this image, so this builds a deterministic
surrogate in the exact on-disk format the reference's extraction produces
(per-sequence info pkls + per-frame (N, 6) npy with NLZ column, 4x4 poses,
annos with gt_boxes_lidar / num_points_in_gt / difficulty and the COM
occupancy/facade arrays) and drives: WaymoDataset frame loading (tanh
intensity squash, NLZ filter), multiframe pose fusion, prepare_data +
fixed-shape collate, one jitted COM train step on the flagship config, and
the eval loop ending in TF-free AP/APH numbers.
"""
import pickle

import numpy as np
import pytest


def _pose(tx, yaw):
    p = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    p[:2, :2] = [[c, -s], [s, c]]
    p[0, 3] = tx
    return p


def _make_frame(rng, n=6000, n_obj=6):
    """Waymo-like frame: ground plane + clusters; (N, 6) with NLZ."""
    r = 60 * rng.rand(n) ** 0.75
    th = rng.uniform(-np.pi, np.pi, n)
    x, y = r * np.cos(th), r * np.sin(th)
    z = np.where(rng.rand(n) < 0.7, rng.normal(0, 0.05, n),
                 rng.uniform(0.2, 3.0, n))
    inten = rng.rand(n) * 3  # raw (pre-tanh) intensity
    elong = rng.rand(n)
    nlz = np.where(rng.rand(n) < 0.95, -1.0, 1.0)  # 5% in no-label zones
    boxes = np.zeros((n_obj, 9), np.float32)
    boxes[:, 0:2] = rng.uniform(-40, 40, (n_obj, 2))
    boxes[:, 2] = rng.uniform(0.5, 1.2, n_obj)
    boxes[:, 3:6] = rng.uniform([3.8, 1.7, 1.5], [5.0, 2.2, 1.9],
                                (n_obj, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_obj)
    # plant points inside each box so num_points_in_gt is honest
    planted = []
    for b in boxes:
        k = rng.randint(8, 40)
        local = (rng.rand(k, 3) - 0.5) * b[3:6] * 0.9
        c, s = np.cos(b[6]), np.sin(b[6])
        px = b[0] + local[:, 0] * c - local[:, 1] * s
        py = b[1] + local[:, 0] * s + local[:, 1] * c
        pz = b[2] + local[:, 2]
        planted.append(np.stack([px, py, pz, rng.rand(k) * 3, rng.rand(k),
                                 -np.ones(k)], 1))
    pts = np.concatenate(
        [np.stack([x, y, z, inten, elong, nlz], 1)] + planted, 0
    ).astype(np.float32)
    return pts, boxes


@pytest.fixture(scope="module")
def waymo_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("waymo")
    seq = "segment-0000_fixture"
    (root / "waymo_processed_data_v0_5_0" / seq).mkdir(parents=True)
    (root / "ImageSets").mkdir()
    (root / "ImageSets" / "train.txt").write_text(seq + ".tfrecord\n")
    (root / "ImageSets" / "val.txt").write_text(seq + ".tfrecord\n")

    rng = np.random.RandomState(7)
    infos = []
    names = np.array(["Vehicle"] * 4 + ["Pedestrian", "Cyclist"])
    for i in range(3):
        pts, boxes = _make_frame(rng)
        np.save(root / "waymo_processed_data_v0_5_0" / seq / f"{i:04d}.npy",
                pts)
        n_in = np.array([
            int(((np.abs(pts[:, 0] - b[0]) < b[3])
                 & (np.abs(pts[:, 1] - b[1]) < b[4])).sum())
            for b in boxes])
        infos.append({
            "point_cloud": {"lidar_sequence": seq, "sample_idx": i,
                            "num_points_of_each_lidar": [len(pts)]},
            "frame_id": f"{seq}_{i:03d}",
            "pose": _pose(2.0 * i, 0.02 * i),
            "annos": {
                "name": names.copy(),
                "gt_boxes_lidar": boxes.copy(),
                "num_points_in_gt": n_in,
                "difficulty": np.zeros(len(boxes), np.int64),
                "occupancy_ratio": rng.rand(len(boxes)).astype(np.float32),
                "facade_type": rng.randint(0, 4, len(boxes)).astype(
                    np.float32),
            },
        })
    # both the COM "_short" (train) and plain (eval) variants
    for suffix in ("_short.pkl", ".pkl"):
        with open(root / "waymo_processed_data_v0_5_0" / seq
                  / f"{seq}{suffix}", "wb") as f:
            pickle.dump(infos, f)
    return root


def _dataset(waymo_root, cfg_updates=None, training=True):
    from com_tpu.data.waymo.waymo_dataset import WaymoDataset
    from com_tpu.utils.config import CfgNode

    cfg = CfgNode({
        "DATA_PATH": str(waymo_root),
        "PROCESSED_DATA_TAG": "waymo_processed_data_v0_5_0",
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "SAMPLED_INTERVAL": {"train": 1, "test": 1},
        "POINT_CLOUD_RANGE": [-74.88, -74.88, -2, 74.88, 74.88, 4.0],
        "MAX_POINTS_PER_SCENE": 16384,
        "MAX_GT_OBJECTS": 32,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "shuffle_points",
             "SHUFFLE_ENABLED": {"train": True, "test": False}},
            {"NAME": "sort_points_by_bev_pillar",
             "VOXEL_SIZE": [0.32, 0.32, 6.0]},
        ],
    })
    if cfg_updates:
        cfg.update(cfg_updates)
    return WaymoDataset(cfg, ["Vehicle", "Pedestrian", "Cyclist"],
                        training=training, seed=11)


def test_frame_loading_nlz_and_tanh(waymo_root):
    ds = _dataset(waymo_root)
    assert len(ds) == 3
    pts = ds.get_lidar("segment-0000_fixture", 0)
    assert pts.shape[1] == 5
    # NLZ rows dropped; intensity squashed into (-1, 1)
    assert pts[:, 3].max() <= 1.0
    raw = np.load(waymo_root / "waymo_processed_data_v0_5_0"
                  / "segment-0000_fixture" / "0000.npy")
    assert len(pts) == int((raw[:, 5] == -1).sum())


def test_multiframe_pose_fusion(waymo_root):
    ds = _dataset(waymo_root, {"SEQUENCE_CONFIG": {
        "ENABLED": True, "SAMPLE_OFFSET": [-2, 0]}})
    info = ds.infos[2]
    pts0 = ds.get_lidar("segment-0000_fixture", 2)
    fused = ds.get_sequence_data(info, pts0, "segment-0000_fixture", 2,
                                 ds.dataset_cfg["SEQUENCE_CONFIG"])
    assert fused.shape[1] == 6  # +timestamp channel
    assert len(fused) > len(pts0)
    # past frames carry POSITIVE 0.1*lag timestamps (reference sign:
    # mppnet crops frame i by t == +0.1*i, so a negative tag would leave
    # every past crop empty)
    ts = np.unique(np.round(fused[:, 5], 4))
    np.testing.assert_allclose(np.sort(ts), [0.0, 0.1, 0.2], atol=1e-4)
    # pose re-projection moved the past points (ego advanced 2 m per frame)
    past = fused[len(pts0):]
    assert np.abs(past[:, 0]).max() > 0


def test_multiframe_fusion_survives_interval_subsampling(waymo_root):
    """SAMPLED_INTERVAL > 1 must not empty the past-frame lookup: the
    sequence index is built over the FULL-rate infos (the subsampled list
    almost never contains offsets -1..-k)."""
    ds = _dataset(waymo_root, {
        "SEQUENCE_CONFIG": {"ENABLED": True, "SAMPLE_OFFSET": [-2, 0]},
        "SAMPLED_INTERVAL": {"train": 2, "test": 1},
    })
    # pick a kept frame with at least 2 predecessors in the sequence
    info = next(i for i in ds.infos if i["point_cloud"]["sample_idx"] >= 2)
    sample_idx = info["point_cloud"]["sample_idx"]
    pts0 = ds.get_lidar("segment-0000_fixture", sample_idx)
    fused = ds.get_sequence_data(info, pts0, "segment-0000_fixture",
                                 sample_idx, ds.dataset_cfg["SEQUENCE_CONFIG"])
    assert len(fused) > len(pts0), "past frames missing under subsampling"


def test_full_train_step_on_fixture_frames(waymo_root):
    import jax
    import jax.numpy as jnp

    from com_tpu.data.dataset import PrefetchLoader
    from com_tpu.models.detectors import DatasetMeta, build_network
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import device_batch_keys, make_train_step
    from com_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file(
        "configs/waymo_models/com/centerpoint_pillar_3cls_com.yaml")
    ds = _dataset(waymo_root)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=1,
                            num_workers=1, drop_last=False)
    batch_np = next(iter(loader))
    keys = device_batch_keys(cfg.MODEL)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items() if k in keys}
    assert batch["points"].shape == (2, 16384, 5)

    grid = (468, 468, 1)
    # shrink the grid for CPU test speed: rescale ranges accordingly
    grid = (64, 64, 1)
    pc_range = [-10.24, -10.24, -2.0, 10.24, 10.24, 4.0]
    meta = DatasetMeta(list(cfg.CLASS_NAMES), pc_range, [0.32, 0.32, 6.0],
                       grid, 5)
    net = build_network(cfg.MODEL, meta)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx, _ = build_optimizer(variables["params"], cfg.OPTIMIZATION,
                            total_steps=100, steps_per_epoch=10)
    state = TrainState.create_jit(variables, tx, num_head_groups=1)
    step = jax.jit(make_train_step(net, cfg.MODEL, list(cfg.CLASS_NAMES),
                                   meta, tx, (grid[1], grid[0])))
    state, metrics = step(state, batch, 0)
    assert np.isfinite(float(metrics["loss"]))


def test_eval_to_ap_numbers(waymo_root):
    """Detections round-trip through WaymoDataset.evaluation into AP/APH."""
    ds = _dataset(waymo_root, training=False)
    det_annos = []
    for info in ds.infos:
        annos = info["annos"]
        det_annos.append({
            "frame_id": info["frame_id"],
            "boxes_lidar": annos["gt_boxes_lidar"][:, :7].copy(),
            "name": annos["name"].copy(),
            "score": np.linspace(0.9, 0.5, len(annos["name"])),
        })
    msg, result = ds.evaluation(det_annos,
                                ["Vehicle", "Pedestrian", "Cyclist"])
    assert "APH" in msg
    # perfect detections -> L2 AP 1.0 for every class present
    assert result["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)
    assert result["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH"] == pytest.approx(1.0)
    assert result["OBJECT_TYPE_TYPE_CYCLIST_LEVEL_2/AP"] == pytest.approx(1.0)
