"""Lyft official mAP: golden parity vs the reference lyft_mAP_eval executed
from /root/reference (pyquaternion/shapely stubbed with exact numpy
equivalents: quaternion->rotation matrix and convex-polygon clipping)."""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from com_tpu.data.lyft.lyft_eval import (
    get_ap,
    get_average_precisions,
    recall_precision,
)
from com_tpu.data.nuscenes.nuscenes_utils import quat_rotmat

REF = Path("/root/reference/pcdet/datasets/lyft/lyft_mAP_eval/lyft_eval.py")


class _Quaternion:
    def __init__(self, elements):
        self.elements = np.asarray(elements, np.float64)

    @property
    def rotation_matrix(self):
        return quat_rotmat(self.elements)


def _clip_convex(subject, clip):
    """Sutherland-Hodgman convex clip (both CCW)."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    def intersect(p1, p2, a, b):
        dx1, dy1 = p2[0] - p1[0], p2[1] - p1[1]
        dx2, dy2 = b[0] - a[0], b[1] - a[1]
        den = dx1 * dy2 - dy1 * dx2
        t = ((a[0] - p1[0]) * dy2 - (a[1] - p1[1]) * dx2) / den
        return (p1[0] + t * dx1, p1[1] + t * dy1)

    out = list(subject)
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        src, out = out, []
        if not src:
            break
        prev = src[-1]
        for cur in src:
            if inside(cur, a, b):
                if not inside(prev, a, b):
                    out.append(intersect(prev, cur, a, b))
                out.append(cur)
            elif inside(prev, a, b):
                out.append(intersect(prev, cur, a, b))
            prev = cur
    return out


def _shoelace(pts):
    if len(pts) < 3:
        return 0.0
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


class _Polygon:
    def __init__(self, pts):
        pts = [tuple(p) for p in pts]
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        # normalize to CCW for the clipper
        if 0.5 * sum(
            pts[i][0] * pts[(i + 1) % len(pts)][1]
            - pts[(i + 1) % len(pts)][0] * pts[i][1]
            for i in range(len(pts))
        ) < 0:
            pts = pts[::-1]
        self.pts = pts

    @property
    def area(self):
        return _shoelace(self.pts)

    def intersection(self, other):
        return _Polygon(_clip_convex(self.pts, other.pts)) if _clip_convex(
            self.pts, other.pts) else _EmptyPoly()


class _EmptyPoly:
    area = 0.0


def _load_reference_lyft_eval():
    saved = {}
    stubs = {
        "pyquaternion": types.ModuleType("pyquaternion"),
        "shapely": types.ModuleType("shapely"),
        "shapely.geometry": types.ModuleType("shapely.geometry"),
    }
    stubs["pyquaternion"].Quaternion = _Quaternion
    stubs["shapely.geometry"].Polygon = _Polygon
    stubs["shapely"].geometry = stubs["shapely.geometry"]
    for k, v in stubs.items():
        saved[k] = sys.modules.get(k)
        sys.modules[k] = v
    try:
        spec = importlib.util.spec_from_file_location("ref_lyft_eval", str(REF))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _yaw_quat(yaw):
    return [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]


def _scene(rng, n_frames=4, classes=("car", "pedestrian")):
    gt, preds = [], []
    for f in range(n_frames):
        tok = f"frame{f}"
        for _ in range(rng.randint(2, 6)):
            name = classes[rng.randint(len(classes))]
            c = rng.uniform(-30, 30, 3)
            wlh = [rng.uniform(1.5, 2.5), rng.uniform(3.5, 5.0),
                   rng.uniform(1.4, 2.0)]
            yaw = rng.uniform(-np.pi, np.pi)
            gt.append({"sample_token": tok, "translation": list(c),
                       "size": wlh, "rotation": _yaw_quat(yaw), "name": name})
            # noisy detection most of the time, sometimes a miss + an FP
            if rng.rand() < 0.8:
                off = rng.normal(0, 0.3, 3)
                preds.append({
                    "sample_token": tok,
                    "translation": list(c + off),
                    "size": wlh, "rotation": _yaw_quat(yaw + rng.normal(0, 0.1)),
                    "name": name, "score": float(rng.uniform(0.2, 0.99)),
                })
            if rng.rand() < 0.3:
                preds.append({
                    "sample_token": tok,
                    "translation": list(rng.uniform(-30, 30, 3)),
                    "size": wlh, "rotation": _yaw_quat(rng.uniform(-3, 3)),
                    "name": name, "score": float(rng.uniform(0.1, 0.9)),
                })
    return gt, preds


def _to_ours(dicts, with_score=False):
    out = []
    for d in dicts:
        w, l, h = d["size"]
        yaw = 2 * np.arctan2(d["rotation"][3], d["rotation"][0])
        e = {
            "sample_token": d["sample_token"],
            "box": np.array(list(d["translation"]) + [l, w, h, yaw]),
            "name": d["name"],
        }
        if with_score:
            e["score"] = d["score"]
        out.append(e)
    return out


@pytest.mark.skipif(not REF.exists(), reason="reference unavailable")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_average_precisions_match_reference(seed):
    ref = _load_reference_lyft_eval()
    rng = np.random.RandomState(seed)
    gt, preds = _scene(rng)
    classes = ["car", "pedestrian"]
    ious = [0.3, 0.5, 0.7]

    ref_ap = ref.get_average_precisions(gt, preds, classes, ious)
    got_ap = get_average_precisions(
        _to_ours(gt), _to_ours(preds, with_score=True), classes, ious)
    np.testing.assert_allclose(got_ap, ref_ap, rtol=1e-6, atol=1e-9)


@pytest.mark.skipif(not REF.exists(), reason="reference unavailable")
def test_get_ap_matches_reference():
    ref = _load_reference_lyft_eval()
    rng = np.random.RandomState(3)
    for _ in range(5):
        n = rng.randint(3, 30)
        rec = np.sort(rng.rand(n))
        prec = rng.rand(n)
        assert get_ap(rec.copy(), prec.copy()) == pytest.approx(
            ref.get_ap(rec.copy(), prec.copy()))


def test_recall_precision_empty_gt():
    assert recall_precision([], [], [0.5]) == (-1, -1, -1)


def test_lyft_dataset_evaluation_end_to_end():
    """LyftDataset.evaluation produces official-style mAP without a devkit."""
    from com_tpu.data.lyft.lyft_dataset import LyftDataset

    box = np.array([5.0, 2.0, 1.0, 4.5, 1.9, 1.7, 0.3])
    ds = LyftDataset.__new__(LyftDataset)
    ds.infos = [{
        "token": "t0",
        "gt_boxes": box[None],
        "gt_names": np.array(["car"]),
    }]
    ds.dataset_cfg = {}
    det = [{
        "metadata": {"token": "t0"},
        "boxes_lidar": box[None],
        "name": np.array(["car"]),
        "score": np.array([0.9]),
    }]
    msg, result = LyftDataset.evaluation(ds, det, ["car"],
                                         eval_metric="lyft")
    assert result["car"] == pytest.approx(1.0)
    assert result["mAP"] == pytest.approx(1.0)


def test_lyft_evaluation_matches_by_frame_id():
    """det_annos carrying only frame_id (eval_model's historical output)
    still match their gt frame via the lidar-file-stem secondary key; an
    eval_metric=None kwarg (tools/test.py with no EVAL_METRIC in config)
    defaults to the lyft loop instead of crashing."""
    from com_tpu.data.lyft.lyft_dataset import LyftDataset

    box = np.array([5.0, 2.0, 1.0, 4.5, 1.9, 1.7, 0.3])
    ds = LyftDataset.__new__(LyftDataset)
    ds.infos = [{
        "token": "abcdef0123456789",
        "lidar_path": "lidar/host-a004_lidar1_12345.bin",
        "gt_boxes": box[None],
        "gt_names": np.array(["car"]),
    }]
    ds.dataset_cfg = {}
    det = [{
        "frame_id": "host-a004_lidar1_12345",
        "boxes_lidar": box[None],
        "name": np.array(["car"]),
        "score": np.array([0.9]),
    }]
    msg, result = LyftDataset.evaluation(ds, det, ["car"], eval_metric=None)
    assert result["car"] == pytest.approx(1.0)
    assert result["mAP"] == pytest.approx(1.0)
