"""MPPNet trajectory-linking golden parity: the reference
MPPNetHead.generate_trajectory (mppnet_head.py:635-659) executed from
/root/reference (torch-cpu; its CUDA iou3d swapped for our oracle-tested
rotated IoU) vs our jnp generate_trajectory."""
import importlib.util
import sys
import types
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

REF = Path("/root/reference/pcdet/models/roi_heads/mppnet_head.py")


def _load_reference_head():
    import torch

    from com_tpu.ops.iou import boxes_iou3d

    def iou3d_torch(a, b):
        return torch.from_numpy(
            np.asarray(boxes_iou3d(a.numpy(), b.numpy())).astype(np.float32))

    stubs = {}
    names = [
        "pcdet", "pcdet.ops", "pcdet.ops.iou3d_nms",
        "pcdet.ops.iou3d_nms.iou3d_nms_utils",
        "pcdet.ops.pointnet2", "pcdet.ops.pointnet2.pointnet2_stack",
        "pcdet.ops.pointnet2.pointnet2_stack.pointnet2_modules",
        "pcdet.utils", "pcdet.utils.common_utils", "pcdet.utils.loss_utils",
        "pcdet.models", "pcdet.models.roi_heads",
        "pcdet.models.roi_heads.roi_head_template",
        "pcdet.models.roi_heads.target_assigner",
        "pcdet.models.roi_heads.target_assigner.proposal_target_layer",
        "pcdet.models.model_utils", "pcdet.models.model_utils.mppnet_utils",
    ]
    for name in names:
        mod = types.ModuleType(name)
        mod.__path__ = []
        stubs[name] = mod
    stubs["pcdet.ops.iou3d_nms"].iou3d_nms_utils = stubs[
        "pcdet.ops.iou3d_nms.iou3d_nms_utils"]
    stubs["pcdet.ops.iou3d_nms.iou3d_nms_utils"].boxes_iou3d_gpu = iou3d_torch
    stubs["pcdet.utils"].common_utils = stubs["pcdet.utils.common_utils"]
    stubs["pcdet.utils"].loss_utils = stubs["pcdet.utils.loss_utils"]

    class _Base:  # RoIHeadTemplate stand-in
        def __init__(self, *a, **k):
            pass

    stubs["pcdet.models.roi_heads.roi_head_template"].RoIHeadTemplate = _Base
    stubs["pcdet.models.roi_heads.target_assigner.proposal_target_layer"
          ].ProposalTargetLayer = _Base
    mu = stubs["pcdet.models.model_utils.mppnet_utils"]
    mu.build_transformer = lambda *a, **k: None
    mu.PointNet = _Base
    mu.MLP = _Base
    stubs["pcdet.ops.pointnet2.pointnet2_stack"].pointnet2_modules = stubs[
        "pcdet.ops.pointnet2.pointnet2_stack.pointnet2_modules"]

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "pcdet.models.roi_heads.mppnet_head", str(REF))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        return mod.MPPNetHead
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _boxes(rng, *shape):
    out = np.zeros(shape + (9,), np.float32)
    out[..., :2] = rng.uniform(-30, 30, shape + (2,))
    out[..., 2] = rng.uniform(-1, 1, shape)
    out[..., 3:6] = rng.uniform(1.5, 5, shape + (3,))
    out[..., 6] = rng.uniform(-np.pi, np.pi, shape)
    out[..., 7:9] = rng.uniform(-0.5, 0.5, shape + (2,))
    return out


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_generate_trajectory_matches_reference():
    import torch

    from com_tpu.models.mppnet import generate_trajectory

    RefHead = _load_reference_head()
    rng = np.random.RandomState(0)
    b, f, p = 2, 4, 24
    proposals = _boxes(rng, b, f, p)
    # frame-1+ proposals cluster near frame-0 boxes so matches happen
    for i in range(1, f):
        keep = rng.rand(b, p) < 0.7
        jitter = rng.uniform(-0.4, 0.4, (b, p, 2)).astype(np.float32)
        prop = proposals[:, 0].copy()
        prop[..., :2] += prop[..., 7:9] * i + jitter
        proposals[:, i] = np.where(keep[..., None], prop, proposals[:, i])
    cur = proposals[:, 0]

    ref = RefHead.__new__(RefHead)
    batch_dict = {"rois": torch.zeros((b, p, f, 9)), "batch_size": b}
    traj_ref, valid_ref = ref.generate_trajectory(
        torch.from_numpy(cur.copy()), torch.from_numpy(proposals.copy()),
        batch_dict)

    traj, valid = generate_trajectory(jnp.asarray(cur), jnp.asarray(proposals))
    np.testing.assert_allclose(np.asarray(valid), valid_ref.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(traj), traj_ref.numpy(),
                               rtol=1e-5, atol=1e-5)
