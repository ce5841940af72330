"""KittiDataset multimodal pipeline end-to-end: GET_ITEM_LIST images/
calib_matricies/gt_boxes2d loading, road planes, aug-param recording, and
the fixed-shape collate for the image keys — on a synthetic on-disk KITTI
tree (no real data in the image)."""
import numpy as np
import pytest


@pytest.fixture
def kitti_root(tmp_path):
    from PIL import Image

    root = tmp_path / "kitti"
    for sub in ["velodyne", "label_2", "calib", "image_2", "planes"]:
        (root / "training" / sub).mkdir(parents=True)
    (root / "ImageSets").mkdir()
    rng = np.random.RandomState(0)
    ids = ["000000", "000001"]
    for idx in ids:
        pts = np.concatenate([
            rng.uniform(2, 60, (3000, 1)), rng.uniform(-30, 30, (3000, 1)),
            rng.uniform(-2.5, 0.5, (3000, 1)), rng.rand(3000, 1),
        ], axis=1).astype(np.float32)
        pts.tofile(str(root / "training" / "velodyne" / f"{idx}.bin"))
        with open(root / "training" / "calib" / f"{idx}.txt", "w") as f:
            f.write("P2: 700 0 600 45 0 700 180 -0.1 0 0 1 0.003\n")
            f.write("R0_rect: 1 0 0 0 1 0 0 0 1\n")
            f.write("Tr_velo_to_cam: 0 -1 0 0 0 0 -1 -0.08 1 0 0 -0.27\n")
        # one Car at 10m ahead (camera coords: x right, y down, z fwd)
        with open(root / "training" / "label_2" / f"{idx}.txt", "w") as f:
            f.write("Car 0.0 0 1.55 590 175 650 200 "
                    "1.53 1.63 3.88 0.5 1.7 10.0 1.56\n")
        img = (rng.rand(370, 1240, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(str(root / "training" / "image_2" / f"{idx}.png"))
        with open(root / "training" / "planes" / f"{idx}.txt", "w") as f:
            f.write("# Plane\nWidth 4\nHeight 1\n0 -1 0 1.65\n")
    with open(root / "ImageSets" / "train.txt", "w") as f:
        f.write("\n".join(ids))
    return root


def test_multimodal_batch_through_loader(kitti_root):
    from com_tpu.data.dataset import build_dataloader
    from com_tpu.utils.config import CfgNode, cfg_from_yaml_file

    cfg = cfg_from_yaml_file(
        "configs/kitti_models/voxel_rcnn_car_focal_multimodal.yaml")
    dc = cfg.DATA_CONFIG
    dc["DATA_PATH"] = str(kitti_root)
    dc["IMAGE_PAD_SHAPE"] = [384, 1280]
    # no db infos on disk: drop gt_sampling but keep the world augs so the
    # reversal params are exercised
    augs = [a for a in dc.DATA_AUGMENTOR.AUG_CONFIG_LIST
            if a["NAME"] != "gt_sampling"]
    dc.DATA_AUGMENTOR["AUG_CONFIG_LIST"] = augs

    ds, loader = build_dataloader(dc, ["Car"], batch_size=2, training=True,
                                  seed=3, workers=1)
    batch = next(iter(loader))
    assert batch["images"].shape == (2, 384, 1280, 3)
    assert batch["images"].dtype == np.float32
    assert 0.0 <= batch["images"].min() and batch["images"].max() <= 1.0
    assert batch["image_shape"].tolist() == [[370, 1240], [370, 1240]]
    assert batch["trans_lidar_to_cam"].shape == (2, 4, 4)
    assert batch["trans_cam_to_img"].shape == (2, 3, 4)
    assert batch["gt_boxes2d"].shape[0] == 2 and batch["gt_boxes2d"].shape[2] == 4
    # aug params recorded per sample for in-jit reversal
    assert batch["noise_rot"].shape == (2,)
    assert batch["noise_scale"].shape == (2,)
    assert batch["flip_x"].dtype == bool
    assert np.all(batch["noise_scale"] > 0.9)
    # the Car parsed from the label survives into gt_boxes
    assert (batch["gt_boxes"][:, :, 7] > 0).sum() >= 2


def test_road_plane_parsed(kitti_root):
    from com_tpu.data.kitti.kitti_dataset import KittiDataset
    from com_tpu.utils.config import CfgNode

    ds = KittiDataset(
        CfgNode({"DATA_PATH": str(kitti_root),
                 "POINT_CLOUD_RANGE": [0, -40, -3, 70.4, 40, 1],
                 "DATA_SPLIT": {"train": "train"},
                 "POINT_FEATURE_ENCODING": {
                     "encoding_type": "absolute_coordinates_encoding",
                     "used_feature_list": ["x", "y", "z", "intensity"],
                     "src_feature_list": ["x", "y", "z", "intensity"]}}),
        ["Car"], training=True)
    plane = ds.get_road_plane("000000")
    assert plane is not None
    np.testing.assert_allclose(np.linalg.norm(plane[:3]), 1.0)
    assert plane[1] < 0  # y-up flipped
