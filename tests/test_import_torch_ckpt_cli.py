"""End-to-end CLI round-trip: reference .pth -> tools/import_torch_ckpt.py ->
orbax checkpoint loadable by our restore path.

Builds the reference torch module chain matching
configs/synthetic_models/centerpoint_synth_com.yaml, saves a
reference-format checkpoint (``{'model_state': state_dict, 'epoch': 30}``,
train_utils.py:354-387 format), runs the import CLI, and verifies the
emitted orbax payload round-trips tensors with the right layout transforms.
"""
from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ref_torch_models import AttrDict, reference_modules  # noqa: E402

pytestmark = pytest.mark.quick

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parents[1]


def _build_ref_synth():
    """Reference chain matching centerpoint_synth_com.yaml's MODEL section."""
    import torch.nn as nn

    with reference_modules(
            "pcdet.models.backbones_3d.vfe.pillar_vfe",
            "pcdet.models.backbones_2d.base_bev_backbone",
            "pcdet.models.dense_heads.center_head") as mods:
        torch.manual_seed(3)
        pv = mods["pcdet.models.backbones_3d.vfe.pillar_vfe"]
        bb = mods["pcdet.models.backbones_2d.base_bev_backbone"]
        ch = mods["pcdet.models.dense_heads.center_head"]
        vfe = pv.PillarVFE(
            AttrDict({"USE_NORM": True, "WITH_DISTANCE": False,
                      "USE_ABSLOTE_XYZ": True, "NUM_FILTERS": [64, 64]}),
            num_point_features=5, voxel_size=[0.4, 0.4, 6.0],
            point_cloud_range=[-40, -40, -2, 40, 40, 4])
        bev = bb.BaseBEVBackbone(
            AttrDict({"LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
                      "NUM_FILTERS": [64, 128], "UPSAMPLE_STRIDES": [1, 2],
                      "NUM_UPSAMPLE_FILTERS": [64, 64]}), input_channels=64)
        head = ch.CenterHead(
            AttrDict({
                "CLASS_AGNOSTIC": False,
                "CLASS_NAMES_EACH_HEAD": [["Vehicle", "Pedestrian",
                                           "Cyclist"]],
                "SHARED_CONV_CHANNEL": 64, "USE_BIAS_BEFORE_NORM": True,
                "NUM_HM_CONV": 2,
                "SEPARATE_HEAD_CFG": {
                    "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
                    "HEAD_DICT": {
                        "center": {"out_channels": 2, "num_conv": 2},
                        "center_z": {"out_channels": 1, "num_conv": 2},
                        "dim": {"out_channels": 3, "num_conv": 2},
                        "rot": {"out_channels": 2, "num_conv": 2}}},
                "TARGET_ASSIGNER_CONFIG": {"FEATURE_MAP_STRIDE": 1},
            }), input_channels=128, num_class=3,
            class_names=["Vehicle", "Pedestrian", "Cyclist"],
            grid_size=np.array([200, 200, 1]),
            point_cloud_range=[-40, -40, -2, 40, 40, 4],
            voxel_size=[0.4, 0.4, 6.0], predict_boxes_when_training=False)
        full = torch.nn.ModuleDict(
            {"vfe": vfe, "backbone_2d": bev, "dense_head": head})
    return full


def test_cli_round_trip(tmp_path):
    full = _build_ref_synth()
    sd = full.state_dict()
    pth = tmp_path / "checkpoint_epoch_30.pth"
    torch.save({"model_state": sd, "epoch": 30, "it": 1234,
                "version": "pcdet+0.6.0"}, pth)

    out_dir = tmp_path / "imported"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, str(REPO / "tools/import_torch_ckpt.py"),
         "--cfg_file", "configs/synthetic_models/centerpoint_synth_com.yaml",
         "--ckpt", str(pth), "--out", str(out_dir)],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=540)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "mapped" in res.stdout
    assert "MISMATCH" not in res.stdout
    assert "MISSING" not in res.stdout
    assert "unused torch key" not in res.stdout

    import orbax.checkpoint as ocp

    payload = ocp.PyTreeCheckpointer().restore(out_dir.absolute())
    params = payload["state"]["params"]
    bs = payload["state"]["batch_stats"]
    # PFN linear: torch (out, in) -> Dense (in, out)
    w = sd["vfe.pfn_layers.0.linear.weight"].numpy()
    got = np.asarray(params["DynamicPillarVFE_0"]["_PFNLayer_0"]["Dense_0"]
                     ["kernel"])
    np.testing.assert_allclose(got, w.T)
    # first backbone conv: OIHW -> HWIO
    w = sd["backbone_2d.blocks.0.1.weight"].numpy()
    got = np.asarray(params["BaseBEVBackbone_0"]["body"]["ConvBNReLU_0"]
                     ["Conv_0"]["kernel"])
    np.testing.assert_allclose(got, w.transpose(2, 3, 1, 0))
    # deblock BN running stats land in batch_stats
    rv = sd["backbone_2d.deblocks.1.1.running_var"].numpy()
    got = np.asarray(bs["BaseBEVBackbone_0"]["body"]["BatchNorm_1"]["var"])
    np.testing.assert_allclose(got, rv)
    # head final conv bias (hm init bias -2.19 was overwritten by randn? no —
    # reference fills it at init; whatever its value, it must round-trip)
    b = sd["dense_head.heads_list.0.hm.1.bias"].numpy()
    got = np.asarray(params["CenterHead_0"]["head_0"]["hm_out"]["bias"])
    np.testing.assert_allclose(got, b)
    assert int(payload["meta"]["epoch"]) == 30
