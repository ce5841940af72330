"""World-augmentation golden parity vs the reference augmentor_utils
(executed from /root/reference with SharedArray stubbed; its common_utils
and box_utils load for real on torch-cpu).  Same RNG stream -> identical
flipped/rotated/scaled points and boxes."""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from com_tpu.data.augmentor import transforms

REF_DIR = Path("/root/reference/pcdet")


def _load_reference_augmentor():
    sa = types.ModuleType("SharedArray")
    saved = {"SharedArray": sys.modules.get("SharedArray")}
    sys.modules["SharedArray"] = sa

    stubs = {}
    for name in ["pcdet", "pcdet.utils", "pcdet.ops",
                 "pcdet.ops.roiaware_pool3d",
                 "pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils",
                 "pcdet.datasets", "pcdet.datasets.augmentor"]:
        mod = types.ModuleType(name)
        mod.__path__ = []
        stubs[name] = mod
    stubs["pcdet.ops.roiaware_pool3d"].roiaware_pool3d_utils = stubs[
        "pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils"]
    for k in stubs:
        saved.setdefault(k, sys.modules.get(k))
    sys.modules.update(stubs)
    try:
        for sub in ["common_utils", "box_utils"]:
            spec = importlib.util.spec_from_file_location(
                f"pcdet.utils.{sub}", str(REF_DIR / "utils" / f"{sub}.py"))
            mod = importlib.util.module_from_spec(spec)
            sys.modules[spec.name] = mod
            spec.loader.exec_module(mod)
            setattr(stubs["pcdet.utils"], sub, mod)
        spec = importlib.util.spec_from_file_location(
            "pcdet.datasets.augmentor.augmentor_utils",
            str(REF_DIR / "datasets/augmentor/augmentor_utils.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _scene(rng, n=200, m=12):
    pts = rng.uniform(-30, 30, (n, 4)).astype(np.float32)
    boxes = np.zeros((m, 9), np.float32)
    boxes[:, :3] = rng.uniform(-25, 25, (m, 3))
    boxes[:, 3:6] = rng.uniform(1.5, 5, (m, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, m)
    boxes[:, 7:9] = rng.uniform(-1, 1, (m, 2))
    return boxes, pts


@pytest.mark.skipif(not REF_DIR.exists(), reason="reference unavailable")
@pytest.mark.parametrize("op,ours,args", [
    ("random_flip_along_x", transforms.random_flip_along_x, ()),
    ("random_flip_along_y", transforms.random_flip_along_y, ()),
    ("global_rotation", transforms.global_rotation, ([-0.785, 0.785],)),
    ("global_scaling", transforms.global_scaling, ([0.9, 1.1],)),
])
def test_world_aug_matches_reference(op, ours, args):
    au = _load_reference_augmentor()
    rng = np.random.RandomState(3)
    boxes, pts = _scene(rng)

    np.random.seed(42)
    ref_boxes, ref_pts = getattr(au, op)(boxes.copy(), pts.copy(), *args)
    np.random.seed(42)
    got_boxes, got_pts = ours(boxes.copy(), pts.copy(), *args)
    np.testing.assert_allclose(got_pts, ref_pts, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_boxes, ref_boxes, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not REF_DIR.exists(), reason="reference unavailable")
@pytest.mark.parametrize("op,ours,args", [
    ("local_rotation", transforms.random_local_rotation, ([-0.157, 0.157],)),
    ("local_scaling", transforms.random_local_scaling, ([0.95, 1.05],)),
])
def test_local_aug_matches_reference(op, ours, args):
    au = _load_reference_augmentor()
    rng = np.random.RandomState(5)
    boxes, pts = _scene(rng, n=400, m=6)
    boxes = boxes[:, :7].copy()  # reference local ops index box cols directly
    # put some points inside each box
    for i in range(len(boxes)):
        k = 10
        local = (rng.rand(k, 3) - 0.5) * 0.8 * boxes[i, 3:6]
        inside = np.concatenate([boxes[i, :3] + local,
                                 rng.rand(k, 1)], axis=1).astype(np.float32)
        pts = np.concatenate([pts, inside], axis=0)

    np.random.seed(7)
    ref_boxes, ref_pts = getattr(au, op)(boxes.copy(), pts.copy(), *args)
    np.random.seed(7)
    got_boxes, got_pts = ours(boxes.copy(), pts.copy(), *args)
    np.testing.assert_allclose(got_boxes, ref_boxes, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_pts, ref_pts, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not REF_DIR.exists(), reason="reference unavailable")
@pytest.mark.parametrize("d", ["top", "bottom", "left", "right"])
def test_world_frustum_dropout_matches_reference(d):
    au = _load_reference_augmentor()
    rng = np.random.RandomState(11)
    boxes, pts = _scene(rng)
    np.random.seed(3)
    ref_boxes, ref_pts = getattr(au, f"global_frustum_dropout_{d}")(
        boxes.copy(), pts.copy(), [0.0, 0.2])
    np.random.seed(3)
    got_boxes, got_pts = transforms.random_world_frustum_dropout(
        boxes.copy(), pts.copy(), [0.0, 0.2], [d])
    np.testing.assert_allclose(got_pts, ref_pts, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_boxes, ref_boxes, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not REF_DIR.exists(), reason="reference unavailable")
@pytest.mark.parametrize("op,args", [
    ("local_pyramid_dropout", (0.4,)),
    ("local_pyramid_sparsify", (0.5, 8)),
])
def test_pyramid_aug_matches_reference(op, args):
    au = _load_reference_augmentor()
    rng = np.random.RandomState(9)
    boxes, pts = _scene(rng, n=100, m=5)
    boxes = boxes[:, :7].copy()
    for i in range(len(boxes)):
        k = 60
        local = (rng.rand(k, 3) - 0.5) * 0.9 * boxes[i, 3:6]
        inside = np.concatenate([boxes[i, :3] + local,
                                 rng.rand(k, 1)], axis=1).astype(np.float32)
        # rotate object-local offsets into the box frame
        c, s = np.cos(boxes[i, 6]), np.sin(boxes[i, 6])
        dx, dy = local[:, 0].copy(), local[:, 1].copy()
        inside[:, 0] = boxes[i, 0] + dx * c - dy * s
        inside[:, 1] = boxes[i, 1] + dx * s + dy * c
        pts = np.concatenate([pts, inside], axis=0)

    np.random.seed(13)
    ref_out = getattr(au, op)(boxes.copy(), pts.copy(), *args)
    np.random.seed(13)
    got_out = getattr(transforms, op)(boxes.copy(), pts.copy(), *args)
    # (gt_boxes, points, pyramids)
    np.testing.assert_allclose(got_out[1], ref_out[1], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_out[2], ref_out[2], rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not REF_DIR.exists(), reason="reference unavailable")
@pytest.mark.parametrize("seed", [21, 22, 23])
def test_pyramid_chain_with_swap_matches_reference(seed):
    """Full SE-SSD chain (dropout -> sparsify -> swap with the pyramids
    threaded through) vs the reference, same RNG stream."""
    au = _load_reference_augmentor()
    rng = np.random.RandomState(seed)
    boxes, pts = _scene(rng, n=150, m=6)
    boxes = boxes[:, :7].copy()
    for i in range(len(boxes)):
        k = 80
        local = (rng.rand(k, 3) - 0.5) * 0.9 * boxes[i, 3:6]
        inside = np.concatenate([boxes[i, :3] + local,
                                 rng.rand(k, 1)], axis=1).astype(np.float32)
        c, s = np.cos(boxes[i, 6]), np.sin(boxes[i, 6])
        dx, dy = local[:, 0].copy(), local[:, 1].copy()
        inside[:, 0] = boxes[i, 0] + dx * c - dy * s
        inside[:, 1] = boxes[i, 1] + dx * s + dy * c
        pts = np.concatenate([pts, inside], axis=0)

    np.random.seed(seed * 7 + 1)
    rb, rp, rpyr = au.local_pyramid_dropout(boxes.copy(), pts.copy(), 0.3)
    rb, rp, rpyr = au.local_pyramid_sparsify(rb, rp, 0.3, 30, rpyr)
    rb, rp = au.local_pyramid_swap(rb, rp, 0.8, 10, rpyr)

    np.random.seed(seed * 7 + 1)
    gb, gp, gpyr = transforms.local_pyramid_dropout(boxes.copy(), pts.copy(), 0.3)
    gb, gp, gpyr = transforms.local_pyramid_sparsify(gb, gp, 0.3, 30, gpyr)
    gb, gp = transforms.local_pyramid_swap(gb, gp, 0.8, 10, gpyr)

    np.testing.assert_allclose(gp, rp, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gb, rb, rtol=1e-4, atol=1e-4)
