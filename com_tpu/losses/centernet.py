"""CenterNet losses (pcdet/utils/loss_utils.py:655-663, 1312-1385 parity)."""
from __future__ import annotations

import jax.numpy as jnp


def sigmoid_clamped(x, eps=1e-4):
    """torch.clamp(x.sigmoid(), 1e-4, 1-1e-4) (curriculum_center_head.py:311)."""
    return jnp.clip(1.0 / (1.0 + jnp.exp(-x)), eps, 1.0 - eps)


def focal_loss_centernet(pred, gt, mask=None):
    """Penalty-reduced pixelwise focal loss (CornerNet / FocalLossCenterNet).

    pred: (B, H, W, C) post-sigmoid heatmap; gt: same shape; mask optional
    per-pixel weights (the COM curriculum mask).  Reference applies the mask
    with a buggy extra broadcast dim (loss_utils.py:1293-1296 creates a
    (B,B,C,H,W) product); we apply it correctly elementwise.

    With a mask, the normalizer is the mask-WEIGHTED positive count — that is
    the reference's own semantics (loss_utils.py:1296 num_pos =
    (pos_inds * mask).sum()), deliberately kept (golden-tested), even though
    plain CornerNet would normalize by the raw count.
    """
    pos_inds = (gt == 1.0).astype(pred.dtype)
    neg_inds = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2) * pos_inds
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, 2) * neg_weights * neg_inds

    if mask is not None:
        pos_loss = pos_loss * mask
        neg_loss = neg_loss * mask
        num_pos = (pos_inds * mask).sum()
    else:
        num_pos = pos_inds.sum()

    pos_loss = pos_loss.sum()
    neg_loss = neg_loss.sum()
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.clip(num_pos, 1e-4, None))


def reg_loss_centernet(pred, inds, target, mask):
    """Gather-at-index L1 regression loss (RegLossCenterNet / _reg_loss).

    pred: (B, H, W, D); inds: (B, M) flat y*W+x; target: (B, M, D);
    mask: (B, M) — 0/1 validity *or* per-object curriculum weights (box_mask):
    the weights scale both the per-object loss and the normalizer, exactly as
    in the reference (loss_utils.py:1364-1385).
    Returns (D,) per-dim losses (multiplied by code weights by the caller).
    """
    b, h, w, d = pred.shape
    flat = pred.reshape(b, h * w, d)
    gathered = jnp.take_along_axis(flat, inds[..., None], axis=1)  # (B, M, D)
    num = mask.sum()
    m = mask[..., None]
    notnan = jnp.isfinite(target).astype(pred.dtype)
    m = m * notnan
    loss = jnp.abs(gathered * m - target * m)
    return loss.sum(axis=(0, 1)) / (num + 1e-4)
