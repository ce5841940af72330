"""Evaluation CLI (tools/test.py parity: single-ckpt and eval-all modes)."""
from __future__ import annotations

import argparse
import datetime
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--eval_all", action="store_true",
                        help="poll the ckpt dir and evaluate checkpoints as they appear")
    parser.add_argument("--max_waiting_mins", type=int, default=30)
    parser.add_argument("--ckpt_dir", type=str, default=None,
                        help="override the checkpoint directory to poll")
    parser.add_argument("--eval_tag", type=str, default="default")
    parser.add_argument("--start_epoch", type=int, default=0,
                        help="skip checkpoints older than this epoch in --eval_all")
    parser.add_argument("--infer_time", action="store_true",
                        help="report per-frame inference latency (device-synced)")
    parser.add_argument("--save_to_file", action="store_true",
                        help="write detection results to result.pkl")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (multi-host eval; "
                             "role of the reference's --launcher slurm)")
    parser.add_argument("--tcp_port", type=int, default=None,
                        help="coordinator port for SLURM launches")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    if args.multihost:
        from com_tpu.parallel.mesh import init_multihost

        init_multihost(args.tcp_port)

    from com_tpu.utils.config import CfgNode, cfg_from_list, cfg_from_yaml_file

    cfg = cfg_from_yaml_file(args.cfg_file, CfgNode())
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


class EvalContext:
    """Everything checkpoint-independent, built ONCE: dataloader, network,
    eval step, restore template, mesh.  --eval_all reuses it across polled
    checkpoints (the reference reuses its built model and reloads weights;
    rebuilding re-compiles the eval step for minutes per checkpoint over
    the axon tunnel)."""

    def __init__(self, cfg, args, logger):
        import jax

        from com_tpu.data import build_dataloader
        from com_tpu.models.detectors import DatasetMeta, build_network
        from com_tpu.train.eval import make_eval_step
        from com_tpu.train.optim import build_optimizer
        from com_tpu.train.state import TrainState
        from com_tpu.train.step import conf_shape_for, is_anchor_head
        from com_tpu.utils.transfer import host_zeros_like

        self.cfg, self.args, self.logger = cfg, args, logger
        # global batch = per-device batch x devices (train.py parity) so
        # the data-parallel eval shard condition can actually hold
        batch_per_device = args.batch_size or int(
            cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU)
        n_devices = len(jax.devices())
        self.dataset, self.loader = build_dataloader(
            cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_per_device * n_devices,
            training=False, workers=args.workers, logger=logger,
        )
        dataset = self.dataset
        grid = dataset.grid_size if dataset.grid_size is not None else [468, 468, 1]
        vsize = dataset.voxel_size if dataset.voxel_size is not None else [0.32, 0.32, 6.0]
        self.meta = DatasetMeta(
            cfg.CLASS_NAMES, dataset.point_cloud_range, vsize, grid,
            dataset.point_feature_encoder.num_point_features)
        self.net = build_network(cfg.MODEL, self.meta)

        sample = next(iter(self.loader))
        example = {k: v for k, v in sample.items() if isinstance(v, np.ndarray)}
        variables = jax.jit(self.net.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), example, train=False
        )
        tx, _ = build_optimizer(variables["params"], cfg.OPTIMIZATION, 1000, 100)
        # the template must match train.py's TrainState exactly (incl. the
        # curriculum conf accumulators) or the typed restore structure-
        # mismatches and silently degrades to a raw double read
        if is_anchor_head(cfg.MODEL):
            num_heads = 1
            anchor_nc = (len(cfg.CLASS_NAMES)
                         if "LOSS_CURRICULUM" in cfg.MODEL.DENSE_HEAD else None)
        else:
            num_heads = len(cfg.MODEL.DENSE_HEAD.CLASS_NAMES_EACH_HEAD)
            anchor_nc = None
        template = TrainState.create_jit(
            variables, tx, num_head_groups=num_heads, anchor_num_class=anchor_nc,
            conf_shape=conf_shape_for(cfg.MODEL, list(cfg.CLASS_NAMES)))
        self.template = host_zeros_like(template)
        self.eval_step = make_eval_step(self.net, cfg.MODEL,
                                        list(cfg.CLASS_NAMES), self.meta)
        self.mesh = None
        if n_devices > 1:
            from com_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh()  # data-parallel eval over all chips

    def load(self, ckpt_path):
        from com_tpu.utils.checkpoint import load_checkpoint

        payload = load_checkpoint(ckpt_path, self.template)
        state = payload["state"]
        return {
            "params": state.params if hasattr(state, "params") else state["params"],
            "batch_stats": (state.batch_stats if hasattr(state, "batch_stats")
                            else state["batch_stats"]),
        }


def evaluate_ckpt(ckpt_path, cfg, args, logger, ctx: EvalContext | None = None):
    import jax

    from com_tpu.train.eval import eval_model

    if ctx is None:
        ctx = EvalContext(cfg, args, logger)
    dataset, loader = ctx.dataset, ctx.loader
    variables = ctx.load(ckpt_path)
    eval_step = ctx.eval_step
    if args.infer_time:
        # per-frame latency with a forced device sync per batch
        # (reference --infer_time + CUDA_LAUNCH_BLOCKING role)
        import jax.numpy as jnp
        jit_step = jax.jit(eval_step)
        first = next(iter(loader))
        dev = {k: v for k, v in first.items() if isinstance(v, np.ndarray)}
        out = jit_step(variables, dev)
        _ = float(jnp.asarray(out[0]).ravel()[0])  # compile + sync
        lat = []
        for i, b in enumerate(loader):
            if i >= 20:
                break
            dev = {k: v for k, v in b.items() if isinstance(v, np.ndarray)}
            # explicit batch-size source: every collated batch carries
            # batch-leading 'points'; don't trust dict iteration order
            bs = dev["points"].shape[0] if "points" in dev else len(
                next(iter(dev.values())))
            t0 = time.time()
            out = jit_step(variables, dev)
            jax.block_until_ready(out)
            _ = float(jnp.asarray(out[0]).ravel()[0])  # axon: force full sync
            lat.append((time.time() - t0) / bs)
        logger.info("inference latency: %.2f ms/frame (median of %d batches)",
                    1e3 * float(np.median(lat)), len(lat))
    det_annos, recalls, spe = eval_model(
        eval_step, variables, loader, list(cfg.CLASS_NAMES), logger=logger,
        recall_thresh_list=tuple(cfg.MODEL.get("POST_PROCESSING", {}).get("RECALL_THRESH_LIST", [0.3, 0.5, 0.7])),
        mesh=ctx.mesh,
    )
    if args.save_to_file:
        import pickle
        out_path = Path(args.output_dir or (REPO / "output")) / "result.pkl"
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "wb") as f:
            pickle.dump(det_annos, f)
        logger.info("wrote %s (%d frames)", out_path, len(det_annos))
    if hasattr(dataset, "evaluation"):
        # forward the config-declared metric (reference test.py passes
        # eval_metric=cfg.MODEL.POST_PROCESSING.EVAL_METRIC)
        result_str, result_dict = dataset.evaluation(
            det_annos, list(cfg.CLASS_NAMES),
            eval_metric=cfg.MODEL.get("POST_PROCESSING", {}).get(
                "EVAL_METRIC", None))
        logger.info("eval result: %s", result_str)
        return result_dict
    return {}


def main():
    args, cfg = parse_config()
    from com_tpu.utils.checkpoint import _ckpt_dirs
    from com_tpu.utils.common import create_logger

    out_root = Path(args.output_dir) if args.output_dir else REPO / "output"
    out_dir = out_root / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    eval_dir = out_dir / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(eval_dir / f"log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt")

    if not args.eval_all:
        assert args.ckpt is not None, "--ckpt required unless --eval_all"
        evaluate_ckpt(args.ckpt, cfg, args, logger)
        return

    # repeat_eval_ckpt: poll ckpt dir, evaluate new checkpoints as they appear
    ckpt_dir = Path(args.ckpt_dir) if args.ckpt_dir else out_dir / "ckpt"
    ledger = eval_dir / f"eval_list_{args.eval_tag}.txt"
    ctx = None
    evaluated = set()
    if ledger.exists():
        evaluated = set(ledger.read_text().split())
    waited = 0.0
    while waited < args.max_waiting_mins * 60:
        todo = [(e, p) for e, p in _ckpt_dirs(ckpt_dir)
                if str(e) not in evaluated and e >= args.start_epoch]
        if not todo:
            time.sleep(30)
            waited += 30
            continue
        waited = 0.0
        if ctx is None:
            ctx = EvalContext(cfg, args, logger)  # built once, reused
        for epoch, path in todo:
            logger.info("evaluating checkpoint epoch %d", epoch)
            evaluate_ckpt(path, cfg, args, logger, ctx=ctx)
            evaluated.add(str(epoch))
            with open(ledger, "a") as f:
                f.write(f"{epoch}\n")


if __name__ == "__main__":
    main()
