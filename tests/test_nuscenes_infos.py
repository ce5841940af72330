"""nuScenes raw-info extraction (fill_trainval_infos) on a stubbed devkit:
schema parity with the reference nuscenes_utils.py:250-384, hand-checked
frame transforms, sweep-chain composition, the >0-points filter, name
mapping, and the scene split."""
import numpy as np
import pytest

from com_tpu.data.nuscenes.nuscenes_utils import (
    MAP_NAME_FROM_GENERAL_TO_DETECTION,
    fill_trainval_infos,
    get_available_scenes,
    quat_inv,
    quat_mul,
    quat_rotmat,
    quaternion_yaw,
    transform_matrix,
)


def _yaw_q(yaw):
    return np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])


class _Box:
    def __init__(self, center, wlh, q, name, token):
        self.center = np.asarray(center, np.float64)
        self.wlh = np.asarray(wlh, np.float64)
        self.orientation = type("Q", (), {"elements": np.asarray(q)})()
        self.name = name
        self.token = token


class FakeNusc:
    """Two scenes x two samples, lidar sweeps chained via prev tokens."""

    def __init__(self, tmp):
        self.tmp = tmp
        ident = {"translation": [0, 0, 0], "rotation": [1, 0, 0, 0]}
        # ego pose for the ref frame of scene0/sample0: shifted + rotated
        self.yaw_pose = 0.5
        pose0 = {"translation": [100.0, 50.0, 0.0],
                 "rotation": list(_yaw_q(self.yaw_pose))}
        self._tables = {
            ("calibrated_sensor", "cs0"): {
                "translation": [1.0, 0.0, 1.8], "rotation": [1, 0, 0, 0]},
            ("ego_pose", "p0"): pose0,
            ("ego_pose", "p1"): {"translation": [104.0, 50.0, 0.0],
                                 "rotation": list(_yaw_q(self.yaw_pose))},
            ("sample_data", "sd0"): {
                "token": "sd0", "calibrated_sensor_token": "cs0",
                "ego_pose_token": "p0", "timestamp": 2_000_000,
                "prev": "sd_prev"},
            ("sample_data", "sd_prev"): {
                "token": "sd_prev", "calibrated_sensor_token": "cs0",
                "ego_pose_token": "p1", "timestamp": 1_900_000, "prev": ""},
            ("sample_data", "sd1"): {
                "token": "sd1", "calibrated_sensor_token": "cs0",
                "ego_pose_token": "p0", "timestamp": 3_000_000, "prev": ""},
            ("sample_annotation", "a0"): {
                "num_lidar_pts": 12, "num_radar_pts": 0},
            ("sample_annotation", "a1"): {
                "num_lidar_pts": 0, "num_radar_pts": 0},
        }
        self.sample = [
            {"token": "s0", "scene_token": "scene_train",
             "data": {"LIDAR_TOP": "sd0"}, "anns": ["a0", "a1"]},
            {"token": "s1", "scene_token": "scene_val",
             "data": {"LIDAR_TOP": "sd1"}, "anns": []},
        ]
        self.scene = [
            {"token": "scene_train", "name": "scene-0001",
             "first_sample_token": "s0"},
            {"token": "scene_val", "name": "scene-0002",
             "first_sample_token": "s1"},
        ]
        # global-frame gt boxes for sd0
        self._boxes = {
            "sd0": [
                _Box([110.0, 55.0, 1.0], [2.0, 4.5, 1.7],
                     _yaw_q(1.0), "vehicle.car", "a0"),
                _Box([120.0, 60.0, 1.0], [0.6, 0.6, 1.8],
                     _yaw_q(0.2), "human.pedestrian.adult", "a1"),
            ],
            "sd1": [],
        }
        self._vel = {"a0": np.array([1.0, 0.0, 0.0]),
                     "a1": np.array([0.0, 0.0, 0.0])}

    def get(self, table, token):
        if table == "sample":
            return next(s for s in self.sample if s["token"] == token)
        return self._tables[(table, token)]

    def get_sample_data_path(self, token):
        p = self.tmp / f"{token}.bin"
        p.write_bytes(b"")
        return str(p)

    def get_boxes(self, token):
        return self._boxes[token]

    def box_velocity(self, token):
        return self._vel[token]


@pytest.fixture
def nusc(tmp_path):
    return FakeNusc(tmp_path)


def test_quat_helpers():
    q = _yaw_q(0.7)
    np.testing.assert_allclose(quaternion_yaw(q), 0.7, atol=1e-12)
    np.testing.assert_allclose(
        quat_mul(q, quat_inv(q)), [1, 0, 0, 0], atol=1e-12)
    R = quat_rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    tm = transform_matrix([1, 2, 3], q, inverse=False)
    tmi = transform_matrix([1, 2, 3], q, inverse=True)
    np.testing.assert_allclose(tm @ tmi, np.eye(4), atol=1e-12)


def test_fill_trainval_infos_schema_and_split(nusc, tmp_path):
    train, val = fill_trainval_infos(
        tmp_path, nusc, train_scenes={"scene_train"},
        val_scenes={"scene_val"}, max_sweeps=3)
    assert len(train) == 1 and len(val) == 1
    info = train[0]
    for key in ["lidar_path", "token", "sweeps", "ref_from_car",
                "car_from_global", "timestamp", "gt_boxes", "gt_names",
                "gt_boxes_velocity", "gt_boxes_token", "num_lidar_pts",
                "num_radar_pts"]:
        assert key in info, key
    # max_sweeps-1 entries; chain ends -> duplicate last
    assert len(info["sweeps"]) == 2
    assert info["sweeps"][0]["transform_matrix"] is not None
    assert info["sweeps"][1] is info["sweeps"][0]
    assert info["sweeps"][0]["time_lag"] == pytest.approx(0.1)


def test_gt_boxes_transformed_to_sensor_frame(nusc, tmp_path):
    train, _ = fill_trainval_infos(
        tmp_path, nusc, train_scenes={"scene_train"}, val_scenes=set(),
        max_sweeps=2)
    info = train[0]
    # a1 has zero points -> filtered; only the car remains
    assert list(info["gt_names"]) == ["car"]
    assert info["num_lidar_pts"].tolist() == [12]
    box = info["gt_boxes"][0]
    # hand-compute: global (110, 55, 1) -> ego (R^-1 (c - t)) -> sensor
    # (- [1, 0, 1.8])
    Rp = quat_rotmat(_yaw_q(nusc.yaw_pose))
    ego = Rp.T @ (np.array([110.0, 55.0, 1.0]) - np.array([100.0, 50.0, 0.0]))
    sensor = ego - np.array([1.0, 0.0, 1.8])
    np.testing.assert_allclose(box[:3], sensor, atol=1e-9)
    # dims are (l, w, h) from wlh
    np.testing.assert_allclose(box[3:6], [4.5, 2.0, 1.7])
    # yaw composes: global yaw 1.0 minus pose yaw 0.5
    assert box[6] == pytest.approx(1.0 - nusc.yaw_pose)
    # velocity rotated into the sensor frame
    np.testing.assert_allclose(
        info["gt_boxes_velocity"][0],
        Rp.T @ np.array([1.0, 0.0, 0.0]), atol=1e-12)
    np.testing.assert_allclose(box[7:9], (Rp.T @ [1.0, 0.0, 0.0])[:2],
                               atol=1e-12)


def test_sweep_transform_chain_roundtrip(nusc, tmp_path):
    """transform_matrix maps a sweep-frame point into the ref lidar frame:
    verify against a direct composition of the four stage transforms."""
    train, _ = fill_trainval_infos(
        tmp_path, nusc, train_scenes={"scene_train"}, val_scenes=set(),
        max_sweeps=2)
    tm = train[0]["sweeps"][0]["transform_matrix"]
    # sweep sensor frame -> car (cs0) -> global (p1) -> ref car (p0^-1)
    # -> ref sensor (cs0^-1)
    p = np.array([3.0, -2.0, 0.5, 1.0])
    cs_t, cs_q = [1.0, 0.0, 1.8], [1, 0, 0, 0]
    car = transform_matrix(cs_t, cs_q) @ p
    glob = transform_matrix([104.0, 50.0, 0.0],
                            _yaw_q(nusc.yaw_pose)) @ car
    ref_car = transform_matrix([100.0, 50.0, 0.0],
                               _yaw_q(nusc.yaw_pose), inverse=True) @ glob
    ref_sensor = transform_matrix(cs_t, cs_q, inverse=True) @ ref_car
    np.testing.assert_allclose(tm @ p, ref_sensor, atol=1e-9)


def test_get_available_scenes_checks_disk(nusc, tmp_path):
    scenes = get_available_scenes(nusc)
    assert len(scenes) == 2  # get_sample_data_path creates the files


def test_name_mapping_table_matches_reference():
    # spot-check the taxonomy mapping (reference nuscenes_utils.py:16-42)
    assert MAP_NAME_FROM_GENERAL_TO_DETECTION["vehicle.car"] == "car"
    assert MAP_NAME_FROM_GENERAL_TO_DETECTION["human.pedestrian.child"] == "pedestrian"
    assert MAP_NAME_FROM_GENERAL_TO_DETECTION["animal"] == "ignore"
    assert len(MAP_NAME_FROM_GENERAL_TO_DETECTION) == 23
