"""Single-frame inference demo (tools/demo.py parity; text output instead of
open3d/mayavi — zero-display environments print the top detections)."""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--data_path", type=str, required=True,
                        help="a point cloud file or a directory of them")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ext", type=str, default=".bin", choices=[".bin", ".npy"])
    parser.add_argument("--save_viz", type=str, default=None,
                        help="directory for BEV PNG renders of each sample")
    args = parser.parse_args()

    import jax

    from com_tpu.data.demo_dataset import DemoDataset
    from com_tpu.models.detectors import DatasetMeta, build_network
    from com_tpu.train.eval import make_eval_step
    from com_tpu.utils.common import create_logger
    from com_tpu.utils.config import CfgNode, cfg_from_yaml_file

    logger = create_logger()
    cfg = cfg_from_yaml_file(args.cfg_file, CfgNode())
    dataset = DemoDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                          root_path=args.data_path, ext=args.ext, logger=logger)
    logger.info("loaded %d samples", len(dataset))

    grid = dataset.grid_size if dataset.grid_size is not None else [468, 468, 1]
    vsize = dataset.voxel_size if dataset.voxel_size is not None else [0.32, 0.32, 6.0]
    meta = DatasetMeta(cfg.CLASS_NAMES, dataset.point_cloud_range, vsize, grid,
                       dataset.point_feature_encoder.num_point_features)
    net = build_network(cfg.MODEL, meta)

    sample = dataset.collate_batch([dataset[0]])
    example = {k: v for k, v in sample.items() if isinstance(v, np.ndarray)}
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example, train=False
    )
    if args.ckpt:
        from com_tpu.utils.checkpoint import load_checkpoint

        payload = load_checkpoint(args.ckpt)
        st = payload["state"]
        variables = {"params": st["params"], "batch_stats": st["batch_stats"]}
        logger.info("loaded checkpoint %s", args.ckpt)

    eval_step = jax.jit(make_eval_step(net, cfg.MODEL, list(cfg.CLASS_NAMES), meta))
    for idx in range(len(dataset)):
        batch = dataset.collate_batch([dataset[idx]])
        host = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        boxes, scores, labels, valid = jax.device_get(eval_step(variables, host))
        v = valid[0]
        order = np.argsort(-scores[0][v])[:20]
        logger.info("sample %d: %d detections (top 20 shown)", idx, int(v.sum()))
        for b, s, l in zip(boxes[0][v][order], scores[0][v][order], labels[0][v][order]):
            name = cfg.CLASS_NAMES[int(l) - 1]
            logger.info(
                "  %-10s score=%.3f xyz=(%.1f, %.1f, %.1f) lwh=(%.1f, %.1f, %.1f) yaw=%.2f",
                name, s, *b[:7],
            )
        if args.save_viz:
            from com_tpu.utils.visualize import draw_scene_bev

            out_dir = Path(args.save_viz)
            out_dir.mkdir(parents=True, exist_ok=True)
            pts = batch["points"][0][batch["points_mask"][0]] \
                if "points_mask" in batch else batch["points"][0]
            out_png = out_dir / f"sample_{idx:04d}.png"
            draw_scene_bev(
                pts, pred_boxes=boxes[0][v], pred_scores=scores[0][v],
                pred_labels=labels[0][v], class_names=list(cfg.CLASS_NAMES),
                point_range=dataset.point_cloud_range, save_path=out_png,
                title=f"sample {idx}",
            )
            logger.info("  wrote %s", out_png)


if __name__ == "__main__":
    main()
