"""Pandaset info creation + world->normative geometry goldens.

The conversion chain (world -> pandaset-ego -> normative boxes/points) is
checked two ways:
  * against the reference's own _get_lidar_points/_get_annotations
    (pcdet/datasets/pandaset/pandaset_dataset.py:151-254) executed from
    /root/reference with the `pandaset` devkit stubbed by an independent
    in-test implementation of geometry.lidar_points_to_ego (quat2mat per the
    transforms3d spec the devkit uses);
  * by round-trip: normative_boxes_to_world o read_frame_cuboids recovers
    the on-disk world cuboid fields (the prediction-output path, ref
    generate_prediction_dicts :259-321).

create_pandaset_infos (ref :441-466) is driven end-to-end over a stub
on-disk devkit layout (pandas-pickled frames + poses.json), producing the
three split info pkls and the train GT database.
"""
import gzip
import importlib.util
import json
import pickle
import sys
import types
from pathlib import Path

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from com_tpu.data.pandaset import pandaset_utils as pu

pytestmark = pytest.mark.quick

REF = Path("/root/reference/pcdet/datasets/pandaset/pandaset_dataset.py")


# ------------------------------------------------------------- stub layout
POSES = [
    {"position": {"x": 12.0, "y": -3.0, "z": 1.5},
     "heading": {"w": 0.9689124, "x": 0.0, "y": 0.0, "z": 0.2474040}},
    {"position": {"x": 13.1, "y": -2.7, "z": 1.52},
     "heading": {"w": 0.9238795, "x": 0.02, "y": -0.01, "z": 0.3826834}},
]


def _rng_frame(rng, pose, n=64):
    """World-frame points around the pose so the crop boxes catch some."""
    t = np.array([pose["position"]["x"], pose["position"]["y"],
                  pose["position"]["z"]])
    pts = t + rng.normal(scale=8.0, size=(n, 3))
    inten = rng.integers(0, 256, size=n).astype(np.float64)
    ts = np.full(n, 1557539924.0) + rng.random(n)
    dev = (np.arange(n) % 2).astype(np.int64)  # half device 0, half 1
    return pd.DataFrame({
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
        "i": inten, "t": ts, "d": dev,
    })


def _rng_cuboids(rng, pose, m=5):
    t = np.array([pose["position"]["x"], pose["position"]["y"],
                  pose["position"]["z"]])
    centers = t + rng.normal(scale=6.0, size=(m, 3))
    dims = rng.uniform(0.8, 4.5, size=(m, 3))
    yaw = rng.uniform(-np.pi, np.pi, size=m)
    labels = np.array(["Car", "Pedestrian", "Pickup Truck", "Car", "Bicycle"])
    sensor = np.array([-1, 0, -1, 1, -1])  # -1 both, 0/1 exclusive
    return pd.DataFrame({
        "uuid": [f"u{i}" for i in range(m)],
        "label": labels[:m],
        "yaw": yaw,
        "position.x": centers[:, 0], "position.y": centers[:, 1],
        "position.z": centers[:, 2],
        "dimensions.x": dims[:, 0], "dimensions.y": dims[:, 1],
        "dimensions.z": dims[:, 2],
        "cuboids.sensor_id": sensor[:m],
    })


@pytest.fixture()
def layout(tmp_path):
    rng = np.random.default_rng(7)
    root = tmp_path
    for seq in ("001", "046"):
        seq_dir = root / "dataset" / seq
        (seq_dir / "lidar").mkdir(parents=True)
        (seq_dir / "annotations" / "cuboids").mkdir(parents=True)
        with open(seq_dir / "lidar" / "poses.json", "w") as f:
            json.dump(POSES, f)
        for fi, pose in enumerate(POSES):
            _rng_frame(rng, pose).to_pickle(
                seq_dir / "lidar" / f"{fi:02d}.pkl.gz")
            _rng_cuboids(rng, pose).to_pickle(
                seq_dir / "annotations" / "cuboids" / f"{fi:02d}.pkl.gz")
    return root


CFG = {
    "LIDAR_DEVICE": 0,
    "TRAINING_CATEGORIES": {"Car": "Car", "Pickup Truck": "Car",
                            "Pedestrian": "Pedestrian"},
    "SEQUENCES": {"train": ["001"], "val": ["046"], "test": []},
}


# ------------------------------------------- reference module, devkit stubbed
def _quat2mat(q):
    """transforms3d.quaternions.quat2mat (the devkit's dependency), written
    from its published formula — independent of com_tpu's quat_rotmat."""
    w, x, y, z = [float(v) for v in q]
    nq = w * w + x * x + y * y + z * z
    s = 2.0 / nq
    X, Y, Z = x * s, y * s, z * s
    wX, wY, wZ = w * X, w * Y, w * Z
    xX, xY, xZ = x * X, x * Y, x * Z
    yY, yZ, zZ = y * Y, y * Z, z * Z
    return np.array([
        [1.0 - (yY + zZ), xY - wZ, xZ + wY],
        [xY + wZ, 1.0 - (xX + zZ), yZ - wX],
        [xZ - wY, yZ + wX, 1.0 - (xX + yY)],
    ])


def _devkit_lidar_points_to_ego(points, pose):
    """pandaset-devkit geometry.lidar_points_to_ego: invert the 4x4 pose."""
    T = np.eye(4)
    T[:3, :3] = _quat2mat([pose["heading"][k] for k in "wxyz"])
    T[:3, 3] = [pose["position"][k] for k in "xyz"]
    Ti = np.linalg.inv(T)
    pts = np.asarray(points, np.float64)
    return (Ti[:3, :3] @ pts.T + Ti[:3, [3]]).T


def _load_reference():
    stubs = {}
    for name in ["pcdet", "pcdet.datasets", "pcdet.datasets.pandaset",
                 "pcdet.datasets.dataset",
                 "pcdet.ops", "pcdet.ops.roiaware_pool3d",
                 "pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils",
                 "pandaset", "pandaset.geometry"]:
        stubs[name] = types.ModuleType(name)
        stubs[name].__path__ = []  # mark as package for relative imports
    stubs["pcdet.datasets.dataset"].DatasetTemplate = object
    stubs["pcdet.datasets"].dataset = stubs["pcdet.datasets.dataset"]
    stubs["pcdet.ops"].roiaware_pool3d = stubs["pcdet.ops.roiaware_pool3d"]
    stubs["pcdet.ops.roiaware_pool3d"].roiaware_pool3d_utils = \
        stubs["pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils"]
    stubs["pandaset"].geometry = stubs["pandaset.geometry"]
    stubs["pandaset.geometry"].lidar_points_to_ego = _devkit_lidar_points_to_ego
    stubs["pandaset"].DataSet = lambda *a, **k: None

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "pcdet.datasets.pandaset.pandaset_dataset", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


class _Cfg(dict):
    __getattr__ = dict.__getitem__


@pytest.mark.skipif(not REF.exists(), reason="reference checkout not present")
def test_points_and_cuboids_golden_vs_reference(layout):
    ref = _load_reference()
    fake = types.SimpleNamespace(dataset_cfg=_Cfg(CFG), logger=None)
    pose = POSES[1]
    seq_dir = layout / "dataset" / "001"
    info = {"lidar_path": str(seq_dir / "lidar" / "01.pkl.gz"),
            "cuboids_path": str(seq_dir / "annotations" / "cuboids" /
                                "01.pkl.gz")}

    ref_pts = ref.PandasetDataset._get_lidar_points(fake, info, pose)
    got_pts = pu.read_frame_points(info["lidar_path"], pose, 0)
    np.testing.assert_allclose(got_pts, ref_pts, rtol=0, atol=1e-5)

    ref_boxes, ref_labels, ref_zrot = ref.PandasetDataset._get_annotations(
        fake, info, pose)
    boxes, labels, zrot = pu.read_frame_cuboids(
        info["cuboids_path"], pose, CFG["TRAINING_CATEGORIES"], 0)
    np.testing.assert_allclose(boxes, ref_boxes, rtol=0, atol=1e-5)
    assert list(labels) == list(ref_labels)
    np.testing.assert_allclose(zrot, ref_zrot, atol=1e-12)
    # sensor filter really dropped the other-device-exclusive cuboid
    assert len(boxes) == 4


def test_world_roundtrip(layout):
    """normative -> world (prediction path) inverts cuboid ingestion."""
    pose = POSES[0]
    cub_path = layout / "dataset" / "001" / "annotations" / "cuboids" / \
        "00.pkl.gz"
    boxes, _, zrot = pu.read_frame_cuboids(cub_path, pose, {}, -1)
    fields = pu.normative_boxes_to_world(boxes, pose, zrot)
    df = pd.read_pickle(cub_path)
    for col in ["position.x", "position.y", "position.z",
                "dimensions.x", "dimensions.y", "dimensions.z"]:
        np.testing.assert_allclose(fields[col], df[col].to_numpy(),
                                   atol=1e-4)
    dy = (fields["yaw"] - df["yaw"].to_numpy()) % (2 * np.pi)
    dy = np.minimum(dy, 2 * np.pi - dy)
    np.testing.assert_allclose(dy, 0.0, atol=1e-6)


def test_create_infos_and_gt_database(layout, tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    pu.create_pandaset_infos(_Cfg(CFG), ["Car", "Pedestrian"], layout, out)
    for split, n in [("train", 2), ("val", 2), ("test", 0)]:
        with open(out / f"pandaset_infos_{split}.pkl", "rb") as f:
            infos = pickle.load(f)
        assert len(infos) == n
        for info in infos:
            assert (layout / info["lidar_path"]).exists()
            assert (layout / info["cuboids_path"]).exists()

    with open(layout / "pandaset_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert set(db) <= {"Car", "Pedestrian", "Bicycle"}
    total = sum(len(v) for v in db.values())
    assert total == 8  # 2 frames x 4 device-0-visible cuboids
    one = db["Car"][0]
    bin_path = layout / "gt_database" / Path(one["path"]).name
    assert bin_path.exists()
    pts = np.fromfile(bin_path, np.float32).reshape(-1, 4)
    assert pts.shape[0] == one["num_points_in_gt"]


def test_dataset_getitem_devkit_layout(layout):
    """PandasetDataset consumes devkit-layout infos end to end."""
    from com_tpu.data.pandaset.pandaset_dataset import PandasetDataset
    from com_tpu.utils.config import CfgNode, merge_new_config

    infos = pu.get_sequence_infos(layout, "001")
    assert len(infos) == 2
    cfg = merge_new_config(CfgNode(), {
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "LIDAR_DEVICE": 0,
        "TRAINING_CATEGORIES": CFG["TRAINING_CATEGORIES"],
        "SEQUENCES": CFG["SEQUENCES"],
        "POINT_CLOUD_RANGE": [-75.0, -75.0, -10.0, 75.0, 75.0, 10.0],
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
        ],
    })
    ds = PandasetDataset(cfg, ["Car", "Pedestrian"], training=False,
                         root_path=layout, infos=infos)
    item = ds[1]
    assert item["points"].shape[1] == 4
    assert item["gt_boxes"].shape[1] == 8  # 7 + class id
    assert np.isfinite(item["zrot_world_to_ego"])
    assert item["pose"].shape == (7,)
