"""Detector composition: config-driven module chains (flax).

Mirror of the reference's detector zoo (pcdet/models/detectors/): detectors
are thin compositions over the fixed slot order vfe -> backbone_3d ->
map_to_bev -> backbone_2d -> dense_head (detector3d_template.py:23-26), with
modules communicating through a batch dict of fixed-shape arrays.
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..utils.registry import (
    BACKBONES_2D,
    BACKBONES_3D,
    DENSE_HEADS,
    DETECTORS,
    MAP_TO_BEV,
    VFES,
)
from . import backbone2d as _b2  # noqa: F401 (register)
from . import backbone3d as _b3  # noqa: F401
from . import map_to_bev as _mb  # noqa: F401
from . import pfe as _pfe  # noqa: F401
from . import image_vfe as _ivfe  # noqa: F401
from . import vfe as _vfe  # noqa: F401
from . import dense_heads as _dh  # noqa: F401


class DatasetMeta:
    """Static dataset facts the model needs (shapes, ranges, classes)."""

    def __init__(self, class_names, point_cloud_range, voxel_size, grid_size,
                 num_point_features):
        self.class_names = tuple(class_names)
        self.point_cloud_range = tuple(float(v) for v in point_cloud_range)
        self.voxel_size = tuple(float(v) for v in voxel_size)
        self.grid_size = tuple(int(v) for v in grid_size)
        self.num_point_features = int(num_point_features)


def decode_center_proposals(batch, dh_cfg, meta, k: int = 512):
    """Decode per-head top-k boxes from a CenterHead's pred_dicts into flat
    (boxes, scores, labels, valid) proposal candidates (fixed shapes, no
    NMS — callers apply proposal_layer / top-k)."""
    import jax.numpy as jnp

    from .dense_heads.center_head import decode_center_boxes

    stride = int(dh_cfg["TARGET_ASSIGNER_CONFIG"].get("FEATURE_MAP_STRIDE", 1))
    class_names = list(meta.class_names)
    bx, sc, lb, vd = [], [], [], []
    for pred_dict, names in zip(batch["pred_dicts"],
                                dh_cfg["CLASS_NAMES_EACH_HEAD"]):
        missing = [n for n in names if n not in class_names]
        if missing:
            # a silent drop would shorten the label map while the heatmap
            # keeps len(names) channels — the clamped OOB gather would then
            # mislabel every detection of the dropped channel
            raise ValueError(
                f"CLASS_NAMES_EACH_HEAD entries {missing} are not in the "
                f"dataset CLASS_NAMES {class_names}")
        ids = tuple(class_names.index(n) + 1 for n in names)
        hm = pred_dict["hm"]
        k_eff = min(k, int(hm.shape[1] * hm.shape[2] * hm.shape[3]))
        boxes, scores, labels, valid = decode_center_boxes(
            pred_dict, ids, meta.point_cloud_range, meta.voxel_size, stride,
            k=k_eff, head_order=tuple(dh_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"]),
        )
        bx.append(boxes)
        sc.append(scores * valid.astype(scores.dtype))
        lb.append(labels)
        vd.append(valid)
    return (jnp.concatenate(bx, axis=1), jnp.concatenate(sc, axis=1),
            jnp.concatenate(lb, axis=1), jnp.concatenate(vd, axis=1))


class Detector3D(nn.Module):
    """Generic slot-ordered detector; concrete detectors set the slots used."""

    model_cfg: Any
    meta: Any

    def _build_vfe(self):
        cfg = self.model_cfg.get("VFE")
        if cfg is None:
            return None
        if self.model_cfg.get("MIXED_PRECISION", False) and "MIXED_PRECISION" not in cfg:
            cfg = dict(cfg, MIXED_PRECISION=True)
        cls = VFES.get(cfg["NAME"])
        kw = dict(model_cfg=cfg, num_point_features=self.meta.num_point_features)
        if cfg["NAME"] != "MeanVFE" or cfg.get("VOXELIZE_ON_DEVICE"):
            kw.update(
                voxel_size=self.meta.voxel_size,
                point_cloud_range=self.meta.point_cloud_range,
            )
        if cfg["NAME"] in ("DynamicPillarVFE", "DynamicMeanVFE",
                           "ImageVFE") or cfg.get("VOXELIZE_ON_DEVICE"):
            kw.update(grid_size=self.meta.grid_size)
        return cls(**kw)

    def _build_map_to_bev(self):
        cfg = self.model_cfg.get("MAP_TO_BEV")
        if cfg is None:
            return None
        name = cfg["NAME"]
        cls = MAP_TO_BEV.get(name)
        if name == "PointPillarScatter":
            return cls(model_cfg=cfg, grid_size=self.meta.grid_size)
        return cls(model_cfg=cfg)

    def _build_backbone2d(self, in_ch):
        cfg = self.model_cfg.get("BACKBONE_2D")
        if cfg is None:
            return None
        import jax.numpy as jnp

        dt = jnp.bfloat16 if self.model_cfg.get("MIXED_PRECISION", False) else None
        return BACKBONES_2D.get(cfg["NAME"])(model_cfg=cfg, input_channels=in_ch,
                                             dtype=dt)

    def _build_backbone3d(self):
        cfg = self.model_cfg.get("BACKBONE_3D")
        if cfg is None:
            return None
        return BACKBONES_3D.get(cfg["NAME"])(
            model_cfg=cfg,
            input_channels=self.meta.num_point_features,
            grid_size=self.meta.grid_size,
            voxel_size=self.meta.voxel_size,
            point_cloud_range=self.meta.point_cloud_range,
        )

    def _build_dense_head(self):
        cfg = self.model_cfg.get("DENSE_HEAD")
        if cfg is None:
            return None
        if self.model_cfg.get("MIXED_PRECISION", False) and "MIXED_PRECISION" not in cfg:
            cfg = dict(cfg, MIXED_PRECISION=True)
        return DENSE_HEADS.get(cfg["NAME"])(
            model_cfg=cfg,
            input_channels=0,  # inferred from inputs (NHWC)
            num_class=len(self.meta.class_names),
            class_names=self.meta.class_names,
        )

    @nn.compact
    def __call__(self, batch, train: bool = True):
        # dynamic-VFE fuses the scatter; skip map_to_bev when it already
        # produced spatial_features
        vfe = self._build_vfe()
        if vfe is not None:
            batch = vfe(batch, train)
        b3d = self._build_backbone3d()
        if b3d is not None:
            batch = b3d(batch, train)
        if "spatial_features" not in batch:
            m2b = self._build_map_to_bev()
            if m2b is not None:
                batch = m2b(batch, train)
        b2d = self._build_backbone2d(batch["spatial_features"].shape[-1])
        if b2d is not None:
            batch = b2d(batch, train)
        head = self._build_dense_head()
        if head is not None:
            batch = head(batch, train)
        return batch


@DETECTORS.register
class CenterPoint(Detector3D):
    """CenterPoint (detectors/centerpoint.py parity) — COM's primary detector."""


@DETECTORS.register
class PointPillar(Detector3D):
    """PointPillars (detectors/pointpillar.py parity)."""


@DETECTORS.register
class SECONDNet(Detector3D):
    """SECOND (detectors/second_net.py parity) — sparse 3D voxel backbone."""


@DETECTORS.register
class PVRCNN(Detector3D):
    """PV-RCNN (detectors/pv_rcnn.py parity): two-stage — the dense head's
    decoded boxes become RoIs (predict_boxes_when_training,
    detector3d_template.py:135), VoxelSetAbstraction keypoints feed RoI-grid
    pooling, and the RCNN head refines.  RoI sampling happens in-module during
    training (it needs gt_boxes); the losses read batch["roi_targets"]."""

    def _build_pfe(self):
        cfg = self.model_cfg.get("PFE")
        if cfg is None:
            return None
        return BACKBONES_3D.get(cfg["NAME"])(
            model_cfg=cfg,
            input_channels=self.meta.num_point_features,
            grid_size=self.meta.grid_size,
            voxel_size=self.meta.voxel_size,
            point_cloud_range=self.meta.point_cloud_range,
        )

    def _build_roi_head(self):
        from ..utils.registry import ROI_HEADS
        from . import roi_heads as _rh  # noqa: F401 (register)

        cfg = self.model_cfg.get("ROI_HEAD")
        if cfg is None:
            return None
        return ROI_HEADS.get(cfg["NAME"])(model_cfg=cfg, num_class=1)

    def _proposals(self, batch, train: bool):
        """Decode first-stage boxes into fixed-size proposals with real
        proposal-stage NMS (roi_head_template.py proposal_layer semantics:
        score top-k prefilter, rotated-BEV NMS, NMS_POST_MAXSIZE rois).

        Returns (rois, roi_scores, roi_labels, roi_valid): padded/suppressed
        slots carry roi_valid=False and must not surface as detections."""
        import jax
        import jax.numpy as jnp

        from ..ops.boxes import ResidualCoder
        from .dense_heads.anchor_head import build_anchors, decode_anchor_boxes
        from .roi_heads.proposal_layer import proposal_layer

        head_cfg = self.model_cfg["DENSE_HEAD"]
        nms_cfg = dict(self.model_cfg.get("ROI_HEAD", {}).get("NMS_CONFIG", {}))
        nms_cfg.update(nms_cfg.get("TRAIN" if train else "TEST", {}))
        if "ANCHOR_GENERATOR_CONFIG" in head_cfg:
            anchors_flat, _, _, _, _ = build_anchors(
                head_cfg, list(self.meta.class_names), self.meta.grid_size,
                self.meta.point_cloud_range,
            )
            # honor the config's coder like the train loss and eval do —
            # a default 7-dim coder would mis-reshape sincos/code_size-9
            # head outputs (detector3d_template generate_predicted_boxes)
            coder_cfg = head_cfg.get("TARGET_ASSIGNER_CONFIG", {}).get(
                "BOX_CODER_CONFIG", {})
            coder = ResidualCoder(
                code_size=int(coder_cfg.get("code_size", 7)),
                encode_angle_by_sincos=bool(
                    coder_cfg.get("encode_angle_by_sincos", False)),
            )
            boxes, scores, labels = decode_anchor_boxes(
                batch, jnp.asarray(anchors_flat), None,
                len(self.meta.class_names), coder,
                dir_cfg=head_cfg if head_cfg.get("USE_DIRECTION_CLASSIFIER") else None,
            )
            valid = jnp.ones(scores.shape, bool)  # every anchor is a real box
        else:
            # CenterHead RPN (pv_rcnn_with_centerhead_rpn.yaml /
            # voxel_rcnn_with_centerhead_dyn_voxel.yaml compositions)
            boxes, scores, labels, valid = decode_center_proposals(
                batch, head_cfg, self.meta)
        boxes = jax.lax.stop_gradient(boxes)
        scores = jax.lax.stop_gradient(scores)
        if "NMS_THRESH" in nms_cfg:
            return proposal_layer(
                boxes, jnp.where(valid, scores, -jnp.inf), labels,
                nms_pre=min(int(nms_cfg.get("NMS_PRE_MAXSIZE", 4096)),
                            int(boxes.shape[1])),
                nms_post=int(nms_cfg.get("NMS_POST_MAXSIZE", 512)),
                nms_thresh=float(nms_cfg["NMS_THRESH"]),
                use_fast_nms=nms_cfg.get("NMS_TYPE") == "fast_nms",
            )
        num_p = min(int(nms_cfg.get("TRAIN_PRE" if train else "TEST_PRE", 512)),
                    int(scores.shape[1]))
        top, idx = jax.lax.top_k(jnp.where(valid, scores, -jnp.inf), num_p)
        take = jax.vmap(lambda a, i: a[i])
        roi_valid = jnp.isfinite(top)
        return (take(boxes, idx), jnp.where(roi_valid, top, 0.0),
                take(labels, idx), roi_valid)

    def _stage2_rois(self, batch, train: bool, eval_topk: int | None = None,
                     proposals=None):
        """Shared second-stage RoI flow for every two-stage detector
        (factored from the per-detector copies): proposals, then train-time
        target assignment (random fg/bg subsampling) or eval-time RoI
        selection.  Sets batch[rois / roi_scores / roi_labels / roi_valid /
        roi_targets].  ``proposals`` overrides self._proposals for heads
        that generate their own (PointRCNN's per-point proposals)."""
        import jax
        import jax.numpy as jnp

        from .roi_heads.roi_targets import assign_roi_targets

        rois, roi_scores, roi_labels, roi_valid = (
            proposals if proposals is not None
            else self._proposals(batch, train))
        # suppressed slots can carry -inf ranking scores; keep downstream
        # arithmetic finite (validity rides in roi_valid)
        roi_scores = jnp.where(roi_valid, roi_scores, 0.0)
        if train and "gt_boxes" in batch:
            roi_cfg = self.model_cfg.get("ROI_HEAD", {}).get("TARGET_CONFIG", {})
            targets = assign_roi_targets(
                rois, roi_scores, roi_labels, roi_valid, batch["gt_boxes"],
                roi_per_image=int(roi_cfg.get("ROI_PER_IMAGE", 128)),
                fg_ratio=float(roi_cfg.get("FG_RATIO", 0.5)),
                reg_fg_thresh=float(roi_cfg.get("REG_FG_THRESH", 0.55)),
                cls_fg_thresh=float(roi_cfg.get("CLS_FG_THRESH", 0.75)),
                cls_bg_thresh=float(roi_cfg.get("CLS_BG_THRESH", 0.25)),
                cls_bg_thresh_lo=float(roi_cfg.get("CLS_BG_THRESH_LO", 0.1)),
                hard_bg_ratio=float(roi_cfg.get("HARD_BG_RATIO", 0.8)),
                rng=(self.make_rng("roi_sampling")
                     if self.has_rng("roi_sampling") else None),
            )
            batch["roi_targets"] = targets
            batch["rois"] = targets.rois
            return batch
        if eval_topk is not None:
            k = min(int(self.model_cfg.get("ROI_HEAD", {}).get("NMS_CONFIG", {})
                        .get("TEST_POST", eval_topk)), int(roi_scores.shape[1]))
            top, idx = jax.lax.top_k(
                jnp.where(roi_valid, roi_scores, -jnp.inf), k)
            take = jax.vmap(lambda a, i: a[i])
            rois, roi_labels = take(rois, idx), take(roi_labels, idx)
            roi_valid = jnp.isfinite(top)
            roi_scores = jnp.where(roi_valid, top, 0.0)
        batch["rois"] = rois
        batch["roi_scores"] = roi_scores
        batch["roi_labels"] = roi_labels
        batch["roi_valid"] = roi_valid
        return batch

    @nn.compact
    def __call__(self, batch, train: bool = True):
        batch = self._build_vfe()(batch, train)
        batch = self._build_backbone3d()(batch, train)
        if "spatial_features" not in batch:
            batch = self._build_map_to_bev()(batch, train)
        batch = self._build_pfe()(batch, train)
        batch = self._build_backbone2d(batch["spatial_features"].shape[-1])(batch, train)
        batch = self._build_dense_head()(batch, train)

        pnt_cfg = self.model_cfg.get("POINT_HEAD")
        if pnt_cfg is not None:
            from .dense_heads.point_head import PointHeadSimple

            batch = PointHeadSimple(model_cfg=pnt_cfg, name="point_head")(batch, train)

        batch = self._stage2_rois(batch, train, eval_topk=128)
        batch = self._build_roi_head()(batch, train)
        return batch


@DETECTORS.register
class PVRCNNPlusPlus(PVRCNN):
    """PV-RCNN++ (detectors/pv_rcnn_plusplus.py): proposals are generated
    BEFORE keypoint extraction so the VSA can do sectorized proposal-centric
    sampling; keypoint aggregation and RoI grid pooling use VectorPool
    local-structure features."""

    @nn.compact
    def __call__(self, batch, train: bool = True):
        import jax.numpy as jnp

        from ..utils.registry import ROI_HEADS
        from . import roi_heads as _rh  # noqa: F401

        batch = self._build_vfe()(batch, train)
        batch = self._build_backbone3d()(batch, train)
        if "spatial_features" not in batch:
            batch = self._build_map_to_bev()(batch, train)
        batch = self._build_backbone2d(batch["spatial_features"].shape[-1])(batch, train)
        batch = self._build_dense_head()(batch, train)

        # proposals first (pv_rcnn_plusplus.py:16-27)
        batch = self._stage2_rois(batch, train)

        batch = self._build_pfe()(batch, train)  # SPC sampling sees rois

        pnt_cfg = self.model_cfg.get("POINT_HEAD")
        if pnt_cfg is not None:
            from .dense_heads.point_head import PointHeadSimple

            batch = PointHeadSimple(model_cfg=pnt_cfg, name="point_head")(batch, train)

        head_cfg = self.model_cfg["ROI_HEAD"]
        head = ROI_HEADS.get(head_cfg["NAME"])(
            model_cfg=head_cfg, num_class=1, name="roi_head")
        batch = head(batch, train)
        return batch


@DETECTORS.register
class CaDDN(Detector3D):
    """CaDDN camera-only detector (detectors/caddn.py): ImageVFE depth
    frustum -> voxel grid -> Conv2DCollapse BEV -> anchor head; the DDN
    depth loss joins the RPN loss in the train step."""


@DETECTORS.register
class SECONDNetIoU(PVRCNN):
    """SECOND + BEV-pooled IoU rescoring head (detectors/second_net_iou.py):
    SECOND backbone + anchor head proposals, then SECONDHead predicts an IoU
    per RoI from rotated RoI-aligned BEV features.  Eval ranks by
    NMS_CONFIG.SCORE_TYPE (train/eval.py _fused_scores): 'iou' (reference
    default), 'cls', 'weighted_iou_cls', 'num_pts_iou_cls', or
    'score_by_class'."""

    @nn.compact
    def __call__(self, batch, train: bool = True):
        from ..utils.registry import ROI_HEADS
        from . import roi_heads as _rh  # noqa: F401

        batch = self._build_vfe()(batch, train)
        batch = self._build_backbone3d()(batch, train)
        if "spatial_features" not in batch:
            batch = self._build_map_to_bev()(batch, train)
        batch = self._build_backbone2d(batch["spatial_features"].shape[-1])(batch, train)
        batch = self._build_dense_head()(batch, train)

        batch = self._stage2_rois(batch, train)

        head_cfg = self.model_cfg["ROI_HEAD"]
        head = ROI_HEADS.get(head_cfg["NAME"])(
            model_cfg=head_cfg, num_class=1,
            point_cloud_range=self.meta.point_cloud_range,
            voxel_size=self.meta.voxel_size, name="roi_head")
        batch = head(batch, train)
        return batch


@DETECTORS.register
class PartA2Net(PVRCNN):
    """PartA2 (detectors/PartA2_net.py): UNetV2 point-wise features + part
    offsets feed RoI-aware pooled aggregation (PartA2FCHead).  Loss =
    RPN (anchor head) + point seg/part + RCNN cls/reg (+corner)."""

    @nn.compact
    def __call__(self, batch, train: bool = True):
        from ..utils.registry import ROI_HEADS
        from . import roi_heads as _rh  # noqa: F401
        from .dense_heads.point_head import PointIntraPartOffsetHead

        batch = self._build_vfe()(batch, train)
        batch = self._build_backbone3d()(batch, train)  # UNetV2
        if "spatial_features" not in batch:
            batch = self._build_map_to_bev()(batch, train)
        batch = self._build_backbone2d(batch["spatial_features"].shape[-1])(batch, train)
        batch = self._build_dense_head()(batch, train)

        pnt_cfg = self.model_cfg.get("POINT_HEAD", {})
        batch = PointIntraPartOffsetHead(
            model_cfg=pnt_cfg, num_class=1, name="point_head")(batch, train)

        batch = self._stage2_rois(batch, train)

        head_cfg = self.model_cfg["ROI_HEAD"]
        head = ROI_HEADS.get(head_cfg["NAME"])(
            model_cfg=head_cfg, num_class=1, name="roi_head")
        batch = head(batch, train)
        return batch


@DETECTORS.register
class VoxelRCNN(PVRCNN):
    """Voxel-RCNN (detectors/voxel_rcnn.py): SECOND-style sparse backbone +
    anchor/center proposals, second stage pools multi-scale sparse voxel
    features via voxel queries (VoxelRCNNHead)."""

    @nn.compact
    def __call__(self, batch, train: bool = True):
        import jax.numpy as jnp

        from ..utils.registry import ROI_HEADS
        from . import roi_heads as _rh  # noqa: F401

        batch = self._build_vfe()(batch, train)
        batch = self._build_backbone3d()(batch, train)
        if "spatial_features" not in batch:
            batch = self._build_map_to_bev()(batch, train)
        batch = self._build_backbone2d(batch["spatial_features"].shape[-1])(batch, train)
        batch = self._build_dense_head()(batch, train)

        batch = self._stage2_rois(batch, train)

        head_cfg = self.model_cfg["ROI_HEAD"]
        head = ROI_HEADS.get(head_cfg["NAME"])(
            model_cfg=head_cfg, num_class=1,
            point_cloud_range=self.meta.point_cloud_range,
            voxel_size=self.meta.voxel_size, name="roi_head")
        batch = head(batch, train)
        return batch


@DETECTORS.register
class PointRCNN(PVRCNN):
    """PointRCNN (detectors/point_rcnn.py): PointNet2MSG features ->
    PointHeadBox per-point proposals -> NMS -> PointRCNNHead canonical-frame
    refinement over pooled member points."""

    @nn.compact
    def __call__(self, batch, train: bool = True):
        import jax
        import jax.numpy as jnp

        from ..utils.registry import DENSE_HEADS, ROI_HEADS
        from . import pointnet2_backbone as _pn2  # noqa: F401 (register)
        from . import roi_heads as _rh  # noqa: F401
        from .dense_heads import point_head as _ph  # noqa: F401 (register)
        from .roi_heads.proposal_layer import proposal_layer

        b3d_cfg = self.model_cfg["BACKBONE_3D"]
        if "VFE" in self.model_cfg:
            # PartA2-free composition (PartA2_free.yaml): MeanVFE + UNetV2
            # provide the per-point features instead of PointNet2MSG
            batch = self._build_vfe()(batch, train)
            batch = self._build_backbone3d()(batch, train)
        else:
            backbone = BACKBONES_3D.get(b3d_cfg["NAME"])(
                model_cfg=b3d_cfg, input_channels=self.meta.num_point_features,
                name="backbone_3d")
            batch = backbone(batch, train)

        head_cfg = self.model_cfg["POINT_HEAD"]
        head_cls = DENSE_HEADS.get(head_cfg.get("NAME", "PointHeadBox"))
        batch = head_cls(
            model_cfg=head_cfg, num_class=len(self.meta.class_names),
            name="point_head")(batch, train)

        boxes = jax.lax.stop_gradient(batch["point_box_preds"])
        scores = jax.lax.stop_gradient(batch["point_cls_scores"])
        scores = jnp.where(batch.get("point_valid", True), scores, -jnp.inf)
        labels = batch["point_pred_labels"]

        nms_cfg = dict(self.model_cfg.get("ROI_HEAD", {}).get("NMS_CONFIG", {}))
        nms_cfg.update(nms_cfg.get("TRAIN" if train else "TEST", {}))
        props = proposal_layer(
            boxes, scores, labels.astype(jnp.int32),
            nms_pre=int(nms_cfg.get("NMS_PRE_MAXSIZE", 4096)),
            nms_post=int(nms_cfg.get("NMS_POST_MAXSIZE", 512)),
            nms_thresh=float(nms_cfg.get("NMS_THRESH", 0.8)),
            use_fast_nms=nms_cfg.get("NMS_TYPE") == "fast_nms",
        )
        batch = self._stage2_rois(batch, train, proposals=props)

        rh_cfg = self.model_cfg["ROI_HEAD"]
        head = ROI_HEADS.get(rh_cfg["NAME"])(
            model_cfg=rh_cfg, num_class=1, name="roi_head")
        batch = head(batch, train)
        return batch


@DETECTORS.register
class MPPNet(nn.Module):
    """MPPNet second-stage-only temporal detector (detectors/mppnet.py:12-43):
    consumes precomputed per-frame first-stage proposals
    (batch["roi_boxes"] (B, F, P, 9+), batch["roi_scores"] (B, F, P),
    batch["roi_labels"] (B, P)) plus multi-frame fused points, links
    trajectories, and refines with the multi-frame transformer head.
    Training targets are sampled in-graph; losses read
    batch["mppnet_preds"] + batch["mppnet_targets"]."""

    model_cfg: dict
    meta: DatasetMeta

    @nn.compact
    def __call__(self, batch, train: bool = True):
        import jax
        import jax.numpy as jnp

        from .mppnet import MPPNetHead, generate_trajectory, sample_mppnet_targets

        head_cfg = self.model_cfg["ROI_HEAD"]
        proposals = batch["roi_boxes"]  # (B, F, P, D)
        cur = proposals[:, 0]
        trajectory, valid_length = generate_trajectory(cur, proposals)

        if train and "gt_boxes" in batch:
            tc = head_cfg["TARGET_CONFIG"]
            targets = sample_mppnet_targets(
                trajectory, valid_length,
                batch["roi_scores"][:, 0],
                batch["roi_labels"].astype(jnp.int32),
                batch["gt_boxes"],
                roi_per_image=int(tc.get("ROI_PER_IMAGE", 96)),
                fg_ratio=float(tc.get("FG_RATIO", 0.5)),
                reg_fg_thresh=float(tc.get("REG_FG_THRESH", 0.55)),
                cls_fg_thresh=float(tc.get("CLS_FG_THRESH", 0.75)),
                cls_bg_thresh=float(tc.get("CLS_BG_THRESH", 0.25)),
                sample_by_class=bool(tc.get("SAMPLE_ROI_BY_EACH_CLASS", True)),
            )
            batch["mppnet_targets"] = targets
            batch["trajectory_rois"] = jax.lax.stop_gradient(
                targets.trajectory_rois)
            batch["valid_length"] = targets.valid_length
            batch["roi_labels_sampled"] = targets.roi_labels
        else:
            batch["trajectory_rois"] = trajectory
            batch["valid_length"] = valid_length
            batch["roi_scores_cur"] = batch["roi_scores"][:, 0]
            batch["roi_labels_sampled"] = batch["roi_labels"]

        head = MPPNetHead(model_cfg=head_cfg, num_class=1, name="roi_head")
        batch = head(batch, train)
        return batch


@DETECTORS.register
class MPPNetE2E(Detector3D):
    """MPPNet end-to-end streaming detector (detectors/mppnet_e2e.py role):
    full first stage (VFE -> 3D backbone -> BEV -> CenterHead with velocity)
    plus the memory-bank refinement head (mppnet_memory_bank_e2e.py).

    The rolling MemoryBank is an explicit pytree: pass it in
    batch["memory_bank"]; when absent (first frame of a sequence, or a
    compile check) a zero-initialized bank over the decoded proposals is
    built in-graph.  The streaming driver
    (com_tpu.models.mppnet.mppnet_e2e_stream_step) owns the roll/push
    between frames."""

    @nn.compact
    def __call__(self, batch, train: bool = True):
        import jax
        import jax.numpy as jnp

        from .mppnet import MPPNetHeadE2E, init_bank

        batch = self._build_vfe()(batch, train)
        batch = self._build_backbone3d()(batch, train)
        if "spatial_features" not in batch:
            batch = self._build_map_to_bev()(batch, train)
        batch = self._build_backbone2d(batch["spatial_features"].shape[-1])(batch, train)
        batch = self._build_dense_head()(batch, train)

        head_cfg = self.model_cfg["ROI_HEAD"]
        if "rois" not in batch:
            # decode fixed-size proposals from the center head's top-k
            num_p = int(head_cfg.get("TARGET_CONFIG", {}).get("ROI_PER_IMAGE", 96))
            boxes, scores, labels, valid = decode_center_proposals(
                batch, self.model_cfg["DENSE_HEAD"], self.meta, k=num_p)
            top, idx = jax.lax.top_k(
                jnp.where(valid, scores, -jnp.inf),
                min(num_p, int(scores.shape[1])))
            take = jax.vmap(lambda a, i: a[i])
            roi_valid = jnp.isfinite(top)
            batch["rois"] = jax.lax.stop_gradient(take(boxes, idx))
            batch["roi_scores"] = jax.lax.stop_gradient(
                jnp.where(roi_valid, top, 0.0))
            batch["roi_labels"] = take(labels, idx)
            batch["roi_valid"] = roi_valid
        if "memory_bank" not in batch:
            f = int(head_cfg["Transformer"]["num_frames"])
            g3 = int(head_cfg["Transformer"]["num_proxy_points"])
            c = int(head_cfg["TRANS_INPUT"])
            zero_geo = jnp.zeros((*batch["rois"].shape[:2], g3, c), jnp.float32)
            batch["memory_bank"] = init_bank(
                batch["rois"], batch["roi_labels"], batch["roi_scores"],
                zero_geo, f)

        head = MPPNetHeadE2E(model_cfg=head_cfg, num_class=1, name="roi_head")
        return head(batch, train)


def build_network(model_cfg, meta: DatasetMeta):
    cls = DETECTORS.get(model_cfg["NAME"])
    return cls(model_cfg=model_cfg, meta=meta)
