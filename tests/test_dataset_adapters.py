"""Dataset adapters: NuScenes/Lyft/Pandaset/Custom __getitem__ pipelines on
synthetic infos, and Waymo tfrecord label extraction on a stubbed frame."""
import pickle
import types

import numpy as np
import pytest

from com_tpu.data.custom.custom_dataset import CustomDataset
from com_tpu.data.lyft.lyft_dataset import LyftDataset
from com_tpu.data.nuscenes.nuscenes_dataset import NuScenesDataset
from com_tpu.data.pandaset.pandaset_dataset import PandasetDataset
from com_tpu.data.waymo.waymo_utils import frame_info, generate_labels
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["car", "pedestrian"]


def base_cfg(extra=None):
    cfg = {
        "POINT_CLOUD_RANGE": [-20, -20, -3, 20, 20, 3],
        "MAX_POINTS_PER_SCENE": 4096,
        "MAX_GT_OBJECTS": 16,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
        ],
    }
    cfg.update(extra or {})
    return CfgNode(cfg)


def _write_nusc_scene(tmp_path, rng, with_sweep=True):
    pts = np.concatenate(
        [rng.uniform(-15, 15, (500, 3)), rng.rand(500, 2)], 1
    ).astype(np.float32)
    lidar = tmp_path / "samples_lidar_0.bin"
    pts.tofile(lidar)
    sweeps = []
    if with_sweep:
        spts = pts + np.asarray([1, 0, 0, 0, 0], np.float32)
        sw = tmp_path / "sweep_0.bin"
        spts.tofile(sw)
        sweeps.append({"lidar_path": sw.name, "time_lag": 0.05,
                       "transform_matrix": np.eye(4, dtype=np.float64)})
    info = {
        "lidar_path": lidar.name,
        "token": "tok0",
        "sweeps": sweeps,
        "gt_boxes": np.asarray([[2.0, 3, 0, 4, 2, 1.5, 0.3, 0.5, -0.2]]),
        "gt_names": np.asarray(["car"]),
        "num_lidar_pts": np.asarray([30]),
    }
    return info


def test_nuscenes_getitem_with_sweeps(tmp_path):
    rng = np.random.RandomState(0)
    info = _write_nusc_scene(tmp_path, rng)
    cfg = base_cfg({"MAX_SWEEPS": 2, "PRED_VELOCITY": False,
                    "SET_NAN_VELOCITY_TO_ZEROS": True,
                    "FILTER_MIN_POINTS_IN_GT": 1})
    ds = NuScenesDataset(cfg, CLASS_NAMES, training=False,
                         root_path=tmp_path, infos=[info])
    assert len(ds) == 1
    item = ds[0]
    # 4 raw features + timestamp channel, both sweeps fused
    assert item["points"].shape[1] >= 4
    assert item["points"].shape[0] > 500  # sweep points added
    assert item["gt_boxes"].shape[-1] == 8  # velocity dropped
    assert item["gt_boxes"][0, -1] == 1  # class id for 'car'


def test_nuscenes_balanced_resampling():
    rng = np.random.RandomState(1)
    infos = (
        [{"gt_names": ["car"], "lidar_path": "x", "sweeps": []}] * 9
        + [{"gt_names": ["pedestrian"], "lidar_path": "x", "sweeps": []}]
    )
    cfg = base_cfg({"BALANCED_RESAMPLING": True})
    ds = NuScenesDataset(cfg, CLASS_NAMES, training=True, root_path=".",
                         infos=infos)
    names = [i["gt_names"][0] for i in ds.infos]
    # rare class duplicated toward balance
    assert names.count("pedestrian") > 1


def test_lyft_and_pandaset_getitem(tmp_path):
    rng = np.random.RandomState(2)
    pts = np.concatenate(
        [rng.uniform(-15, 15, (400, 3)), rng.rand(400, 2)], 1
    ).astype(np.float32)
    (tmp_path / "l0.bin").write_bytes(pts.tobytes())
    np.save(tmp_path / "p0.npy",
            np.concatenate([pts[:, :3], pts[:, 3:4]], 1))

    linfo = {"lidar_path": "l0.bin", "token": "t", "sweeps": [],
             "gt_boxes": np.asarray([[0.0, 0, 0, 4, 2, 1.5, 0.1]]),
             "gt_names": np.asarray(["car"])}
    lds = LyftDataset(base_cfg({"MAX_SWEEPS": 1}), CLASS_NAMES,
                      training=False, root_path=tmp_path, infos=[linfo])
    item = lds[0]
    assert item["points"].shape[0] > 0 and item["gt_boxes"].shape[0] == 1

    pinfo = {"lidar_path": "p0.npy", "frame_id": "seq0_000",
             "gt_boxes": np.asarray([[1.0, 1, 0, 4, 2, 1.5, 0.0]]),
             "gt_names": np.asarray(["car"])}
    pds = PandasetDataset(base_cfg(), CLASS_NAMES, training=False,
                          root_path=tmp_path, infos=[pinfo])
    item = pds[0]
    assert item["points"].shape[0] > 0 and item["gt_boxes"][0, -1] == 1


def test_custom_dataset(tmp_path):
    rng = np.random.RandomState(3)
    (tmp_path / "points").mkdir()
    (tmp_path / "labels").mkdir()
    pts = np.concatenate(
        [rng.uniform(-15, 15, (300, 3)), rng.rand(300, 1)], 1
    ).astype(np.float32)
    np.save(tmp_path / "points" / "000.npy", pts)
    (tmp_path / "labels" / "000.txt").write_text("1.0 2.0 0.0 4 2 1.5 0.3 car\n")
    ds = CustomDataset(base_cfg(), CLASS_NAMES, training=False,
                       root_path=tmp_path)
    assert len(ds) == 1
    item = ds[0]
    assert item["gt_boxes"].shape == (1, 8)
    np.testing.assert_allclose(item["gt_boxes"][0, :2], [1.0, 2.0])


def _stub_frame():
    def ns(**kw):
        return types.SimpleNamespace(**kw)

    labels = [
        ns(box=ns(center_x=1.0, center_y=2.0, center_z=0.5, length=4.2,
                  width=1.9, height=1.6, heading=0.3),
           type=1, detection_difficulty_level=0, tracking_difficulty_level=1,
           id="obj1", num_lidar_points_in_box=42,
           metadata=ns(speed_x=3.0, speed_y=-1.0, accel_x=0.0, accel_y=0.1)),
        ns(box=ns(center_x=0.0, center_y=0.0, center_z=0.0, length=1.0,
                  width=1.0, height=1.0, heading=0.0),
           type=0, detection_difficulty_level=0, tracking_difficulty_level=0,
           id="unk", num_lidar_points_in_box=0,
           metadata=ns(speed_x=0.0, speed_y=0.0, accel_x=0.0, accel_y=0.0)),
    ]
    cams = [ns(height=1280, width=1920) for _ in range(5)]
    return ns(
        laser_labels=labels,
        context=ns(name="ctx", camera_calibrations=cams),
        timestamp_micros=12345,
        pose=ns(transform=list(np.eye(4).reshape(-1))),
    )


def test_waymo_generate_labels_and_info_from_stub():
    frame = _stub_frame()
    pose = np.eye(4, dtype=np.float32)
    annos = generate_labels(frame, pose)
    # unknown dropped; 9-dim boxes with sensor-frame velocity
    assert list(annos["name"]) == ["Vehicle"]
    assert annos["gt_boxes_lidar"].shape == (1, 9)
    np.testing.assert_allclose(annos["gt_boxes_lidar"][0, 7:9], [3.0, -1.0])
    np.testing.assert_allclose(annos["gt_boxes_lidar"][0, :3], [1, 2, 0.5])
    assert annos["num_points_in_gt"][0] == 42

    info = frame_info(frame, "seq", 3)
    assert info["frame_id"] == "seq_003"
    assert info["image"]["image_shape_0"] == (1280, 1920)
    assert info["annos"]["name"][0] == "Vehicle"

    # rotated pose: velocity re-expressed in the sensor frame
    c, s = np.cos(0.5), np.sin(0.5)
    pose_r = np.eye(4, dtype=np.float32)
    pose_r[:2, :2] = [[c, -s], [s, c]]
    annos_r = generate_labels(frame, pose_r)
    v = annos_r["gt_boxes_lidar"][0, 7:9]
    expect = np.array([3.0, -1.0, 0.0]) @ np.linalg.inv(pose_r[:3, :3].T)
    np.testing.assert_allclose(v, expect[:2], atol=1e-5)
