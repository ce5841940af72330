"""Waymo official-eval cross-check harness (VERDICT #6).

Stub-level: the reference's OpenPCDetWaymoDetectionMetricsEstimator
(pcdet/datasets/waymo/waymo_eval.py:23-251) is executed from /root/reference
with TF / waymo-open-dataset stubbed — its array-assembly half
(generate_waymo_type_results, mask_by_distance, the metric-config text) is
pure numpy/python up to the TF op call — and compared against our adapter
(com_tpu/data/waymo/waymo_eval.py) on identical detections.

Gated: when the real waymo_open_dataset lib imports, the full official
metric runs through BOTH the reference estimator and our waymo_evaluation
on the same detections, asserts they agree, and cross-checks the TF-free
numpy AP/APH (com_tpu/data/waymo/waymo_ap.py) against the official numbers
within tolerance — ready to fire the moment the lib is installable.
"""
import importlib.util
import re
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from com_tpu.data.waymo.waymo_eval import (
    assemble_gt_arrays,
    assemble_pred_arrays,
    build_metric_config,
    mask_by_distance,
)

REF = Path("/root/reference/pcdet/datasets/waymo/waymo_eval.py")

pytestmark = pytest.mark.quick


def _have_waymo_lib():
    try:
        import tensorflow  # noqa: F401
        from waymo_open_dataset.metrics.python import detection_metrics  # noqa: F401
        return True
    except Exception:
        return False


def _load_reference_estimator(capture=None):
    """Execute the reference waymo_eval.py with its heavy imports stubbed.

    capture: optional dict; when given, text_format.Merge stores the merged
    config text under capture['text'] so the stub-level test can compare the
    metric-config semantics without protobuf.
    """
    stubs = {}
    tf = types.ModuleType("tensorflow")
    tf.get_logger = lambda: types.SimpleNamespace(setLevel=lambda *_: None)
    tf.test = types.SimpleNamespace(TestCase=object)
    stubs["tensorflow"] = tf

    gp = types.ModuleType("google.protobuf")
    tfmt = types.ModuleType("google.protobuf.text_format")

    def _merge(text, config):
        if capture is not None:
            capture["text"] = text
        return config

    tfmt.Merge = _merge
    gp.text_format = tfmt
    stubs["google.protobuf"] = gp
    stubs["google.protobuf.text_format"] = tfmt

    class _FakeConfig:
        def __init__(self):
            self.score_cutoffs = []

    wod = types.ModuleType("waymo_open_dataset")
    wod.__path__ = []
    protos = types.ModuleType("waymo_open_dataset.protos")
    protos.__path__ = []
    mpb = types.ModuleType("waymo_open_dataset.protos.metrics_pb2")
    mpb.Config = _FakeConfig
    protos.metrics_pb2 = mpb
    metrics = types.ModuleType("waymo_open_dataset.metrics")
    metrics.__path__ = []
    mpy = types.ModuleType("waymo_open_dataset.metrics.python")
    mpy.__path__ = []
    dm = types.ModuleType("waymo_open_dataset.metrics.python.detection_metrics")
    dm.get_detection_metric_ops = lambda *a, **k: {}
    mpy.detection_metrics = dm
    metrics.python = mpy
    wod.protos = protos
    wod.metrics = metrics
    stubs.update({
        "waymo_open_dataset": wod,
        "waymo_open_dataset.protos": protos,
        "waymo_open_dataset.protos.metrics_pb2": mpb,
        "waymo_open_dataset.metrics": metrics,
        "waymo_open_dataset.metrics.python": mpy,
        "waymo_open_dataset.metrics.python.detection_metrics": dm,
    })

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_waymo_eval_stubbed", str(REF))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _synthetic_frames(n_frames=6, seed=7):
    """Matched (gt_infos, det_annos) with real-lidar gt boxes (center-z)."""
    rng = np.random.default_rng(seed)
    names = np.array(["Vehicle", "Pedestrian", "Cyclist"])
    gt_infos, det_annos = [], []
    for _ in range(n_frames):
        n_gt = int(rng.integers(3, 9))
        box = np.zeros((n_gt, 7))
        box[:, 0:2] = rng.uniform(-80, 80, (n_gt, 2))
        box[:, 2] = rng.uniform(-1, 2, n_gt)
        box[:, 3:6] = rng.uniform(0.5, 6.0, (n_gt, 3))
        box[:, 6] = rng.uniform(-2 * np.pi, 2 * np.pi, n_gt)
        name = names[rng.integers(0, 3, n_gt)]
        npts = rng.integers(0, 40, n_gt)
        diff = np.where(rng.random(n_gt) < 0.3, 2, 0).astype(np.int64)
        gt_infos.append({
            "name": name.copy(),
            "gt_boxes_lidar": box.copy(),
            "difficulty": diff.copy(),
            "num_points_in_gt": npts.copy(),
        })
        # detections: jittered copies of a subset + one spurious box
        keep = rng.random(n_gt) < 0.8
        dbox = box[keep] + rng.normal(0, 0.05, (int(keep.sum()), 7))
        spur = np.array([[rng.uniform(-60, 60), rng.uniform(-60, 60), 0.5,
                          4.0, 1.8, 1.6, 0.3]])
        dbox = np.concatenate([dbox, spur])
        dname = np.concatenate([name[keep], ["Vehicle"]])
        det_annos.append({
            "name": dname,
            "boxes_lidar": dbox,
            "score": rng.uniform(0.05, 1.0, len(dbox)),
        })
    return gt_infos, det_annos


def test_gt_assembly_matches_reference_stubbed():
    mod = _load_reference_estimator()
    est = mod.OpenPCDetWaymoDetectionMetricsEstimator()
    gt_infos, _ = _synthetic_frames()
    class_names = ["Vehicle", "Pedestrian", "Cyclist"]

    # the reference mutates info['difficulty'] in place -> deep-copy per side
    ref_infos = [{k: np.copy(v) if isinstance(v, np.ndarray) else v
                  for k, v in i.items()} for i in gt_infos]
    rf, rbox, rtyp, rscore, rnlz, rdiff = est.generate_waymo_type_results(
        ref_infos, class_names, is_gt=True, fake_gt_infos=False)

    our_infos = [{k: np.copy(v) if isinstance(v, np.ndarray) else v
                  for k, v in i.items()} for i in gt_infos]
    of, obox, otyp, odiff = assemble_gt_arrays(our_infos, class_names)

    np.testing.assert_array_equal(of, rf)
    np.testing.assert_allclose(obox, rbox, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(otyp, rtyp)
    np.testing.assert_array_equal(odiff, rdiff.astype(np.int64))


def test_pred_assembly_matches_reference_stubbed():
    mod = _load_reference_estimator()
    est = mod.OpenPCDetWaymoDetectionMetricsEstimator()
    _, det_annos = _synthetic_frames()
    rf, rbox, rtyp, rscore, rnlz, rdiff = est.generate_waymo_type_results(
        det_annos, ["Vehicle", "Pedestrian", "Cyclist"], is_gt=False)
    of, obox, otyp, oscore = assemble_pred_arrays(det_annos)
    np.testing.assert_array_equal(of, rf)
    np.testing.assert_allclose(obox, rbox, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(otyp, rtyp)
    np.testing.assert_allclose(oscore, rscore)
    assert not rnlz.any()  # we pass zeros_like for overlap_nlz, same meaning


def test_distance_mask_matches_reference_stubbed():
    mod = _load_reference_estimator()
    est = mod.OpenPCDetWaymoDetectionMetricsEstimator()
    rng = np.random.default_rng(3)
    box = np.zeros((64, 7))
    box[:, 0:2] = rng.uniform(-140, 140, (64, 2))
    aux = rng.integers(0, 5, 64)
    rbox, raux = est.mask_by_distance(100.0, box.copy(), aux.copy())
    obox, oaux = mask_by_distance(100.0, box.copy(), aux.copy())
    np.testing.assert_allclose(obox, rbox)
    np.testing.assert_array_equal(oaux, raux)


def _parse_config_text(text):
    """Flatten a proto-text config into comparable (key, value) pairs.

    Tokenizes rather than line-parses so both multi-line and inline message
    blocks (``difficulties { levels: 1 levels: 2 }``) flatten identically.
    Order is preserved — iou_thresholds are positional per object type.
    """
    tokens = re.findall(r"\w+\s*:|\{|\}|[^\s{}]+", text)
    pairs, stack = [], []
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok == "}":
            stack.pop()
            i += 1
        elif tok.endswith(":"):
            key = ".".join(stack + [tok[:-1].strip()])
            val = tokens[i + 1]
            try:
                val = float(val)
            except ValueError:
                pass
            pairs.append((key, val))
            i += 2
        elif i + 1 < len(tokens) and tokens[i + 1] == "{":
            stack.append(tok)
            i += 2
        else:  # bare token (field name directly before '{' handled above)
            i += 1
    return pairs


def test_metric_config_matches_reference_stubbed():
    cap_ref = {}
    mod = _load_reference_estimator(capture=cap_ref)
    est = mod.OpenPCDetWaymoDetectionMetricsEstimator()
    ref_cfg = est.build_config()

    cap_our = {}

    class _Fmt:
        @staticmethod
        def Merge(text, config):
            cap_our["text"] = text
            return config

    class _Pb2:
        class Config:
            def __init__(self):
                self.score_cutoffs = []

    our_cfg = build_metric_config(_Pb2, _Fmt)

    assert _parse_config_text(cap_our["text"]) == \
        _parse_config_text(cap_ref["text"])
    np.testing.assert_allclose(our_cfg.score_cutoffs, ref_cfg.score_cutoffs)
    assert len(our_cfg.score_cutoffs) == 101


@pytest.mark.skipif(not _have_waymo_lib(),
                    reason="waymo_open_dataset/tensorflow not installed")
def test_official_metric_crosscheck_real_lib():
    """Fires the moment waymo-open-dataset installs: reference estimator vs
    our adapter vs the TF-free numpy AP/APH on identical detections."""
    import importlib

    from com_tpu.data.waymo.waymo_ap import waymo_ap_evaluation
    from com_tpu.data.waymo.waymo_eval import waymo_evaluation

    spec = importlib.util.spec_from_file_location("ref_waymo_eval_real",
                                                  str(REF))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    gt_infos, det_annos = _synthetic_frames(n_frames=8)
    class_names = ["Vehicle", "Pedestrian", "Cyclist"]

    est = mod.OpenPCDetWaymoDetectionMetricsEstimator()
    ref_ap = est.waymo_evaluation(
        [dict(a) for a in det_annos],
        [{k: np.copy(v) for k, v in i.items()} for i in gt_infos],
        class_names, distance_thresh=1000, fake_gt_infos=False)

    infos = [{"annos": {k: np.copy(v) for k, v in i.items()}}
             for i in gt_infos]
    _, ours = waymo_evaluation([dict(a) for a in det_annos], infos,
                               class_names, distance_thresh=1000)
    ref_d = {k: float(np.asarray(v).reshape(-1)[0]) for k, v in
             (ref_ap.items() if isinstance(ref_ap, dict) else ref_ap[1].items())}
    for k, v in ours.items():
        if k in ref_d:
            assert abs(v - ref_d[k]) < 1e-6, (k, v, ref_d[k])

    # numpy AP/APH within tolerance of the official library
    np_res = waymo_ap_evaluation(det_annos, infos, class_names)
    for k, v in np_res.items():
        if k in ref_d and "AP" in k:
            assert abs(v - ref_d[k]) < 0.02, (k, v, ref_d[k])
