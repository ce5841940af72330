"""Training loop with the COM epoch feedback (train_utils.py:219-387 role).

Per epoch: set sampler/head epoch -> run jitted steps over the loader ->
accumulate the per-(class,group) confidence sums/counts (already globally
reduced inside the step under pjit) -> normalize and hand to the COMAug
sampler -> checkpoint.  The device->host transfer is one small (C, G) array
per epoch, versus the reference's per-iter python-side accumulation plus
epoch-end NCCL all_gather (train_utils.py:109-123, 269-289).
"""
from __future__ import annotations

import time

import jax
import numpy as np

from ..utils.checkpoint import save_checkpoint
from ..utils.common import AverageMeter
from ..utils.transfer import fast_device_get


class DevicePrefetcher:
    """Double-buffered host->device transfer: a worker thread device_puts the
    NEXT batch while the current step runs, hiding transfer latency behind
    compute (the reference's dataloader+load_data_to_gpu overlap,
    train_utils.py:69-91 role).  depth=2 keeps one batch in flight."""

    def __init__(self, host_iter, mesh=None, batch_keys=None, depth: int = 2):
        import queue
        import threading

        self.q = queue.Queue(maxsize=depth)
        self._stop = object()

        def to_device(batch):
            host_batch = {k: v for k, v in batch.items()
                          if isinstance(v, np.ndarray)
                          and (batch_keys is None or k in batch_keys)}
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                return shard_batch(host_batch, mesh)
            return jax.device_put(host_batch)

        self._error = None

        def worker():
            try:
                for batch in host_iter:
                    self.q.put(to_device(batch))
            except BaseException as e:  # surfaced in the consumer thread
                self._error = e
            finally:
                self.q.put(self._stop)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self._stop:
                # a loader/transfer failure must fail the run, not read as a
                # clean end of epoch (which would checkpoint + feed back
                # curriculum stats from a silently truncated epoch)
                if self._error is not None:
                    raise RuntimeError(
                        "data prefetch worker failed") from self._error
                return
            yield item


def train_model(
    step_fn,
    state,
    loader,
    num_epochs: int,
    ckpt_dir=None,
    logger=None,
    start_epoch: int = 0,
    ckpt_save_interval: int = 1,
    max_ckpt_save_num: int = 50,
    log_interval: int = 50,
    mesh=None,
    metric_hook=None,
    batch_keys=None,
    ckpt_save_time_interval: float = 300.0,
    start_iter: int = 0,
):
    # resume continues the reference's monotone `it` bookkeeping
    # (checkpoint metadata orders by iteration; train_utils.py:354-370)
    accumulated_iter = start_iter
    last_timed_save = time.time()
    for epoch in range(start_epoch, num_epochs):
        loader.set_epoch(epoch)
        if getattr(state, "conf_sum", None) is not None:
            state = state.reset_epoch_stats()
        data_meter, step_meter = AverageMeter(), AverageMeter()
        end = time.time()
        metrics = None
        prefetcher = DevicePrefetcher(iter(loader), mesh=mesh,
                                      batch_keys=batch_keys)
        for it, dev_batch in enumerate(prefetcher):
            data_meter.update(time.time() - end)
            state, metrics = step_fn(state, dev_batch, epoch)
            step_meter.update(time.time() - end - data_meter.val)
            end = time.time()
            accumulated_iter += 1
            if logger and it % log_interval == 0:
                logger.info(
                    "epoch %d it %d loss %.4f d_time %.3f s_time %.3f",
                    epoch, it, float(metrics["loss"]), data_meter.avg, step_meter.avg,
                )
            if metric_hook is not None:
                metric_hook(epoch, it, metrics)
            # rolling in-epoch save (reference latest_model every
            # ckpt_save_time_interval seconds, train_utils.py:198-206)
            if (ckpt_dir is not None and ckpt_save_time_interval > 0
                    and time.time() - last_timed_save > ckpt_save_time_interval):
                from ..utils.checkpoint import save_latest

                save_latest(fast_device_get(state), ckpt_dir, epoch,
                            accumulated_iter)
                last_timed_save = time.time()
                if logger:
                    logger.info("saved latest_model at epoch %d it %d",
                                epoch, it)

        # epoch-end device->host curriculum feedback (one small transfer)
        if getattr(state, "conf_sum", None) is not None:
            conf = np.asarray(state.conf_sum) / (np.asarray(state.conf_cnt) + 0.01)
            loader.dataset.set_confidence_groups(conf)
            if logger:
                logger.info("epoch %d confidence groups updated (mean %.4f)",
                            epoch, float(conf.mean()))

        if ckpt_dir is not None and (epoch + 1) % ckpt_save_interval == 0:
            sampler = getattr(loader.dataset, "data_augmentor", None)
            sampler = sampler.gt_sampler if sampler is not None else None
            sampler_state = None
            if sampler is not None and sampler.confidence_groups is not None:
                sampler_state = {"confidence_groups": np.asarray(sampler.confidence_groups)}
            save_checkpoint(
                fast_device_get(state), ckpt_dir, epoch + 1, accumulated_iter,
                sampler_state=sampler_state, max_ckpt_save_num=max_ckpt_save_num,
            )
            if logger:
                logger.info("saved checkpoint epoch %d", epoch + 1)
    return state, accumulated_iter
