"""Every shipped config parses and its model composes via build_network."""
from pathlib import Path

import pytest

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.utils.config import cfg_from_yaml_file

REPO = Path(__file__).resolve().parents[1]
CONFIGS = sorted(
    p for p in (REPO / "configs").rglob("*.yaml")
    if "dataset_configs" not in str(p)
)


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: str(p.relative_to(REPO)))
def test_config_builds(path):
    cfg = cfg_from_yaml_file(str(path))
    assert "MODEL" in cfg and "CLASS_NAMES" in cfg
    dc = cfg.DATA_CONFIG
    pc_range = list(dc.POINT_CLOUD_RANGE)
    vsize = [0.32, 0.32, 6.0]
    grid = (64, 64, 1)
    for proc in dc.get("DATA_PROCESSOR", []):
        if proc.get("NAME") == "transform_points_to_voxels":
            vsize = list(proc["VOXEL_SIZE"])
            grid = tuple(
                int(round((pc_range[i + 3] - pc_range[i]) / vsize[i]))
                for i in range(3)
            )
    meta = DatasetMeta(cfg.CLASS_NAMES, pc_range, vsize, grid, 5)
    net = build_network(cfg.MODEL, meta)
    assert net is not None
