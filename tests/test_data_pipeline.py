"""Data layer: pipeline end-to-end, COMAug curriculum sampler semantics,
determinism, fixed-shape collate."""
import numpy as np
import pytest

from com_tpu.data.augmentor.database_sampler import (
    DataBaseSamplerCOM2,
    DataBaseSamplerV2,
    split_density_groups,
    split_difficulty_groups,
)
from com_tpu.data.dataset import build_dataloader
from com_tpu.data.synthetic import make_synthetic_db_infos
from com_tpu.utils.config import CfgNode

CLASS_NAMES = ["Vehicle", "Pedestrian", "Cyclist"]


def dataset_cfg(with_gt_sampling=True, n_scenes=4):
    aug_list = []
    if with_gt_sampling:
        aug_list.append({
            "NAME": "gt_sampling", "USE_CURRICULUM_AUG": True, "COM": True,
            "M3": [3.0, 0.5, 0.5], "S3": [0.2, 0.2, 0.2], "STOP": 100,
            "ANTI": True, "BACK": False,
            "PREPARE": {"filter_by_min_points": ["Vehicle:5", "Pedestrian:5", "Cyclist:5"]},
            "SAMPLE_GROUPS": ["Vehicle:8", "Pedestrian:6", "Cyclist:6"],
            "NUM_POINT_FEATURES": 5, "REMOVE_EXTRA_WIDTH": [0.0, 0.0, 0.0],
            "LIMIT_WHOLE_SCENE": True,
        })
    aug_list += [
        {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x", "y"]},
        {"NAME": "random_world_rotation", "WORLD_ROT_ANGLE": [-0.785, 0.785]},
        {"NAME": "random_world_scaling", "WORLD_SCALE_RANGE": [0.95, 1.05]},
    ]
    return CfgNode({
        "DATASET": "SyntheticDataset",
        "NUM_SCENES": n_scenes, "NUM_OBJECTS": 6, "NUM_BG_POINTS": 3000,
        "POINT_CLOUD_RANGE": [-40, -40, -2, 40, 40, 4],
        "MAX_POINTS_PER_SCENE": 8192, "MAX_GT_OBJECTS": 64,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
        },
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"], "AUG_CONFIG_LIST": aug_list},
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}},
        ],
    })


@pytest.mark.quick
def test_pipeline_end_to_end_and_collate_shapes():
    ds, loader = build_dataloader(dataset_cfg(), CLASS_NAMES, batch_size=2,
                                  training=True, seed=7, workers=1)
    batch = next(iter(loader))
    assert batch["points"].shape == (2, 8192, 5)
    assert batch["points_mask"].shape == (2, 8192)
    assert batch["gt_boxes"].shape == (2, 64, 8)
    for k in ("num_points_in_gt", "true_object", "occupancy_ratio", "facade_type"):
        assert batch[k].shape == (2, 64)
    # gt classes encoded 1..3 in last col; padding zero
    labels = batch["gt_boxes"][..., -1]
    assert labels.max() <= 3 and labels.min() >= 0
    # pasted objects present: true_object==2 somewhere
    assert (batch["true_object"] == 2).any()


def test_pipeline_deterministic_per_seed():
    def run(seed):
        ds, loader = build_dataloader(dataset_cfg(), CLASS_NAMES, batch_size=2,
                                      training=True, seed=seed, workers=1)
        return next(iter(loader))

    b1, b2 = run(7), run(7)
    np.testing.assert_array_equal(b1["points"], b2["points"])
    np.testing.assert_array_equal(b1["gt_boxes"], b2["gt_boxes"])
    b3 = run(8)
    assert not np.array_equal(b1["points"], b3["points"])


def test_split_difficulty_groups_partition():
    rng = np.random.RandomState(0)
    db = make_synthetic_db_infos(rng, CLASS_NAMES, per_class=200)
    for cls, expected in (("Vehicle", 96), ("Pedestrian", 15), ("Cyclist", 15)):
        groups = split_difficulty_groups(db, cls)
        assert len(groups) == expected
        concat = np.sort(np.concatenate([g for g in groups]))
        in_range = [
            i for i, info in enumerate(db[cls])
            if np.sqrt(info["box3d_lidar"][0] ** 2 + info["box3d_lidar"][1] ** 2) <= 75
        ]
        np.testing.assert_array_equal(concat, np.sort(in_range))


@pytest.mark.quick
def test_v2_density_split_and_equal_share_draw():
    """Reference V2 semantics (database_sampler_v2.py:137-210): 3 distance
    bands, keep density > band 1/3-quantile, equal-share contiguous draw."""
    rng = np.random.RandomState(3)
    db = make_synthetic_db_infos(rng, ["Vehicle"], per_class=300)
    groups = split_density_groups(db, "Vehicle")
    assert len(groups) == 3
    box = np.stack([i["box3d_lidar"] for i in db["Vehicle"]])
    dist = np.sqrt(box[:, 0] ** 2 + box[:, 1] ** 2)
    density = np.array([i["num_points_in_gt"] for i in db["Vehicle"]]) / (
        box[:, 3] * box[:, 4] * box[:, 5]
    )
    bands = [(dist <= 30), (dist > 30) & (dist <= 50), (dist > 50)]
    for g, band in zip(groups, bands):
        assert band[g].all()
        if band.sum():
            thr = np.sort(density[band])[int(band.sum() / 3)]
            assert (density[g] > thr).all()
            # bottom third dropped from the pool
            assert len(g) <= band.sum() * 2 / 3 + 1

    cfg = CfgNode({
        "USE_CURRICULUM_AUG": True, "V2": True,
        "SAMPLE_GROUPS": ["Vehicle:10"], "NUM_POINT_FEATURES": 5,
        "PREPARE": {},
    })
    s = DataBaseSamplerV2(None, cfg, ["Vehicle"], db_infos=db,
                          rng=np.random.RandomState(0))
    sg = s.sample_groups["Vehicle"]
    # fresh pointers start at group size -> first draw permutes, then reads
    # int(10/3)+1 = 4 from each non-empty group
    sampled = s._sample_for_class("Vehicle", sg)
    nonempty = sum(1 for g in sg["indices"] if len(g) >= 4)
    assert len(sampled) >= 4 * nonempty - 3  # short groups may give fewer
    for g in range(3):
        if len(sg["indices"][g]) >= 4:
            assert sg["pointer"][g] == 4


def test_com2_gaussian_pacing():
    """COM2 probability: Gaussian around the k-th sorted confidence, k paced
    by epoch * M3; ANTI picks ascending order (easy first when confidences
    low=hard)."""
    rng = np.random.RandomState(1)
    db = make_synthetic_db_infos(rng, ["Vehicle"], per_class=400)
    cfg = CfgNode({
        "USE_CURRICULUM_AUG": True, "COM": True,
        "M3": [3.0, 0.5, 0.5], "S3": [0.2, 0.2, 0.2], "ANTI": True,
        "SAMPLE_GROUPS": ["Vehicle:10"], "NUM_POINT_FEATURES": 5,
        "PREPARE": {},
    })
    s = DataBaseSamplerCOM2(None, cfg, ["Vehicle"], db_infos=db,
                            rng=np.random.RandomState(0))
    sg = s.sample_groups["Vehicle"]

    # no feedback yet -> proportional to group sizes
    p0 = s.group_probability("Vehicle", sg)
    sizes = np.array([len(g) for g in sg["indices"]], float)
    np.testing.assert_allclose(p0, sizes / sizes.sum(), atol=1e-12)

    # feed confidences; epoch 0, ANTI -> center on the k=0-th (lowest) conf
    conf = np.zeros((3, 96))
    conf[0, :] = np.linspace(0.1, 0.9, 96)
    s.confidence_groups = conf
    s.epoch = 0
    p = s.group_probability("Vehicle", sg)
    nonzero_sizes = sizes > 0
    # groups whose confidence is near the lowest get boosted relative to size
    boost = np.where(nonzero_sizes, p / np.clip(sizes / sizes.sum(), 1e-12, None), 0)
    assert boost[:10].mean() > boost[-10:].mean()

    # later epoch -> center moves to higher-confidence groups
    s.epoch = 20  # k = min(60, 95)
    p_late = s.group_probability("Vehicle", sg)
    boost_late = np.where(nonzero_sizes, p_late / np.clip(sizes / sizes.sum(), 1e-12, None), 0)
    assert boost_late[55:70].mean() > boost_late[:10].mean()

    # STOP kills sampling
    s2 = DataBaseSamplerCOM2(None, CfgNode({**cfg.to_dict(), "STOP": 5}),
                             ["Vehicle"], db_infos=db, rng=np.random.RandomState(0))
    s2.epoch = 6
    assert s2._sample_for_class("Vehicle", s2.sample_groups["Vehicle"]) == []


def test_sampler_collision_rejection():
    rng = np.random.RandomState(2)
    db = make_synthetic_db_infos(rng, ["Vehicle"], per_class=50)
    cfg = CfgNode({
        "USE_CURRICULUM_AUG": False, "SAMPLE_GROUPS": ["Vehicle:20"],
        "NUM_POINT_FEATURES": 5, "PREPARE": {}, "LIMIT_WHOLE_SCENE": False,
        "REMOVE_EXTRA_WIDTH": [0.0, 0.0, 0.0],
    })
    from com_tpu.data.augmentor.database_sampler import build_gt_sampler
    s = build_gt_sampler(None, cfg, ["Vehicle"], db_infos=db,
                         rng=np.random.RandomState(3))
    data = {
        "points": rng.uniform(-40, 40, (2000, 5)).astype(np.float32),
        "gt_boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
        "gt_names": np.array(["Vehicle"]),
        "gt_boxes_mask": np.array([True]),
        "num_points_in_gt": np.array([10.0], np.float32),
        "true_object": np.array([1.0], np.float32),
        "occupancy_ratio": np.array([0.5], np.float32),
        "facade_type": np.array([1.0], np.float32),
    }
    out = s(dict(data))
    boxes = out["gt_boxes"]
    from com_tpu.ops.iou import boxes_iou_bev
    iou = boxes_iou_bev(boxes[:, :7], boxes[:, :7])
    np.fill_diagonal(iou, 0)
    assert iou.max() < 1e-6, "pasted boxes must not collide"
    assert (out["true_object"][1:] == 2).all()
