"""Training CLI (tools/train.py parity: same flags, TPU-native internals)."""
from __future__ import annotations

import argparse
import datetime
import os
import sys
import warnings
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--pretrained_model", type=str, default=None,
                        help="params-only init from a checkpoint; shape "
                             "mismatches are skipped (reference "
                             "load_params_from_file semantics)")
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--seed", type=int, default=666)
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--max_ckpt_save_num", type=int, default=50)
    parser.add_argument("--ckpt_save_time_interval", type=int, default=300,
                        help="rolling latest_model save period (seconds)")
    parser.add_argument("--logger_iter_interval", type=int, default=50)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--spatial_shard", type=int, default=1,
                        help="shard the BEV canvas rows over this many chips "
                             "(hybrid data x spatial mesh; XLA inserts the "
                             "conv halo exchanges)")
    parser.add_argument("--model_shard", type=int, default=1,
                        help="shard conv output channels over this many chips")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (TPU pod slices / "
                             "multi-host; replaces the reference's "
                             "dist_train.sh NCCL launch)")
    parser.add_argument("--tcp_port", type=int, default=None,
                        help="coordinator port for SLURM launches (role of "
                             "the reference's --tcp_port, train.py:29)")
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


def main():
    args, cfg = parse_config()

    import jax

    from com_tpu.data import build_dataloader
    from com_tpu.models.detectors import DatasetMeta, build_network
    from com_tpu.parallel.mesh import make_mesh, shard_state
    from com_tpu.train.loop import train_model
    from com_tpu.train.optim import build_optimizer
    from com_tpu.train.state import TrainState
    from com_tpu.train.step import make_train_step
    from com_tpu.utils.checkpoint import resume_latest
    from com_tpu.utils.common import create_logger, set_random_seed
    from com_tpu.utils.config import log_config_to_file

    out_root = Path(args.output_dir) if args.output_dir else REPO / "output"
    out_dir = out_root / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = out_dir / "ckpt"
    out_dir.mkdir(parents=True, exist_ok=True)
    log_file = out_dir / f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    logger = create_logger(log_file)
    logger.info("devices: %s", jax.devices())
    log_config_to_file(cfg, logger=logger)

    if args.fix_random_seed:
        set_random_seed(args.seed)

    batch_per_device = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU)
    n_devices = len(jax.devices())
    global_batch = batch_per_device * n_devices
    epochs = args.epochs or int(cfg.OPTIMIZATION.NUM_EPOCHS)

    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, global_batch, training=True,
        workers=args.workers, logger=logger, seed=args.seed,
    )
    grid = dataset.grid_size if dataset.grid_size is not None else [468, 468, 1]
    vsize = dataset.voxel_size if dataset.voxel_size is not None else [0.32, 0.32, 6.0]
    meta = DatasetMeta(
        cfg.CLASS_NAMES, dataset.point_cloud_range, vsize, grid,
        dataset.point_feature_encoder.num_point_features,
    )
    from com_tpu.data.processor import pipeline_presorts_points
    if ("VFE" in cfg.MODEL and "ASSUME_SORTED_POINTS" not in cfg.MODEL.VFE
            and pipeline_presorts_points(cfg.DATA_CONFIG, vsize)):
        # the pipeline contractually pre-sorts points by pillar id, so the
        # sorted-scan VFE can statically drop its device sort + cond
        cfg.MODEL.VFE["ASSUME_SORTED_POINTS"] = True
    net = build_network(cfg.MODEL, meta)

    from com_tpu.train.step import device_batch_keys

    bkeys = device_batch_keys(cfg.MODEL)
    sample = next(iter(loader))
    example = {k: v for k, v in sample.items()
               if isinstance(v, np.ndarray) and k in bkeys}
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(args.seed), example, train=False
    )
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    logger.info("model %s: %.2fM params", cfg.MODEL.NAME, n_params / 1e6)

    steps_per_epoch = len(loader)
    tx, lr_fn = build_optimizer(
        variables["params"], cfg.OPTIMIZATION,
        total_steps=steps_per_epoch * epochs, steps_per_epoch=steps_per_epoch,
    )
    from com_tpu.train.step import is_anchor_head

    if is_anchor_head(cfg.MODEL):
        num_heads = 1
        anchor_nc = (
            len(cfg.CLASS_NAMES)
            if "LOSS_CURRICULUM" in cfg.MODEL.DENSE_HEAD
            else None
        )
    else:
        num_heads = len(cfg.MODEL.DENSE_HEAD.CLASS_NAMES_EACH_HEAD)
        anchor_nc = None
    from com_tpu.train.step import conf_shape_for

    state = TrainState.create_jit(variables, tx, num_head_groups=num_heads,
                                  anchor_num_class=anchor_nc,
                                  conf_shape=conf_shape_for(cfg.MODEL, list(cfg.CLASS_NAMES)))

    from com_tpu.utils.transfer import host_zeros_like

    start_epoch = 0
    start_iter = 0
    if args.pretrained_model:
        from com_tpu.utils.checkpoint import load_params_only

        state = load_params_only(args.pretrained_model, state, logger=logger)
    if args.ckpt:
        # explicit checkpoint takes priority over resume-latest
        # (train.py --ckpt reference semantics)
        from com_tpu.utils.checkpoint import load_checkpoint

        resumed = load_checkpoint(args.ckpt, host_zeros_like(state))
        logger.info("resumed from --ckpt %s", args.ckpt)
    else:
        resumed = resume_latest(ckpt_dir, host_zeros_like(state),
                                logger=logger)
    if resumed is not None:
        state = resumed["state"]
        start_epoch = int(resumed["meta"]["epoch"])
        start_iter = int(resumed["meta"].get("it", 0))
        if resumed.get("sampler") is not None:
            dataset.set_confidence_groups(resumed["sampler"]["confidence_groups"])

    fmap_hw = (int(grid[1]), int(grid[0]))
    # donate state + batch: params/opt-state update in place and the point/
    # canvas input buffers are recycled, instead of XLA allocating a second
    # copy of both every step (the batch is fresh from the prefetcher each
    # iteration and the previous state is never reused after the call).
    # On CPU backends donation is partially unsupported; silence the noise.
    warnings.filterwarnings(
        "ignore", message="Some donated buffers were not usable")
    step = jax.jit(make_train_step(net, cfg.MODEL, list(cfg.CLASS_NAMES), meta, tx,
                                   fmap_hw, seed=args.seed),
                   donate_argnums=(0, 1))

    mesh = None
    if n_devices > 1:
        mesh = make_mesh(spatial=args.spatial_shard, model=args.model_shard)
        from com_tpu.parallel.sharding import activate

        activate(mesh)  # canvas constraints in VFE/backbone pick this up
        state = shard_state(state, mesh)

    from com_tpu.utils.metrics import MetricsLogger

    mlog = MetricsLogger(out_dir / "metrics")
    log_every = args.logger_iter_interval

    from com_tpu.utils.transfer import fast_device_get

    import jax.numpy as jnp

    # precompute the whole LR curve in one device call (per-step eager
    # schedule evaluation would round-trip the tunnel every log)
    lr_table = np.asarray(
        jax.jit(jax.vmap(lr_fn))(jnp.arange(steps_per_epoch * epochs))
    )

    def metric_hook(epoch, it, metrics):
        if it % log_every == 0:
            step_idx = epoch * steps_per_epoch + it
            scalars = {k: v for k, v in metrics.items()
                       if getattr(v, "ndim", 1) == 0}
            scalars = fast_device_get(scalars)  # one packed transfer
            scalars["lr"] = lr_table[min(step_idx, len(lr_table) - 1)]
            mlog.log(step_idx, scalars)

    logger.info("start training: %d epochs x %d steps, global batch %d",
                epochs, steps_per_epoch, global_batch)
    state, it = train_model(
        step, state, loader, epochs,
        ckpt_dir=ckpt_dir, logger=logger, start_epoch=start_epoch,
        ckpt_save_interval=args.ckpt_save_interval,
        ckpt_save_time_interval=float(args.ckpt_save_time_interval),
        max_ckpt_save_num=args.max_ckpt_save_num, mesh=mesh, batch_keys=bkeys,
        metric_hook=metric_hook, start_iter=start_iter,
    )
    mlog.close()
    logger.info("training done: %d iterations", it)


if __name__ == "__main__":
    main()
