"""Micro-batching inference server over a frozen serving artifact.

The StableHLO artifact (utils/serving.py) is compiled for ONE static batch
shape (B, N, F) — the TPU contract.  Production traffic arrives one scene at
a time; this server turns that stream back into full batches:

* requests enqueue a (points, future) pair;
* a dispatch thread collects up to B scenes (waiting at most ``max_wait_ms``
  after the first), pads the tail of a partial batch with masked-out empty
  scenes, runs the module ONCE, and resolves each future with its slice.

Deliberately scheduler-simple: one dispatch thread, one device stream —
matching the one-process-per-chip rule (a second in-flight batch would just
queue behind the first on the same core).  The reference has no serving
path at all (its eval loop is tools/test.py batch files through the full
pcdet stack); this plus tools/serve.py is the deployment story.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    scenes_padded: int = 0
    wait_ms_total: float = 0.0
    infer_ms_total: float = 0.0

    def as_dict(self) -> dict:
        d = dict(self.__dict__)
        if self.batches:
            d["mean_occupancy"] = self.requests / max(
                1, self.requests + self.scenes_padded)
            d["mean_infer_ms"] = self.infer_ms_total / self.batches
        return d


@dataclass
class _Item:
    points: np.ndarray
    future: Future = field(default_factory=Future)


class BatchServer:
    """Batches single-scene requests onto a fixed-shape inference fn.

    run: callable(batch dict) -> (boxes, scores, labels, valid), e.g. the
        ``run`` returned by utils.serving.load_artifact, or any jitted fn.
    input_spec: {"points": ((B, N, F), dtype), "points_mask": ((B, N), _)}
        shapes (manifest["input_spec"] accepted directly).
    max_wait_ms: how long the dispatcher waits for more scenes after the
        first before launching a partial batch.
    score_thresh: detections below this are dropped from responses.
    """

    def __init__(self, run, input_spec, max_wait_ms: float = 20.0,
                 score_thresh: float = 0.1):
        shape = tuple(input_spec["points"][0])
        self.batch_size, self.max_points, self.num_feats = (
            int(shape[0]), int(shape[1]), int(shape[2]))
        self._run = run
        self.max_wait_s = max_wait_ms / 1e3
        self.score_thresh = float(score_thresh)
        self.stats = ServerStats()
        self._q: queue.Queue = queue.Queue()
        self._stop = object()
        self._closed = False
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._thread.start()

    # -- client side ------------------------------------------------------
    def submit(self, points: np.ndarray) -> Future:
        """points: (n, F) float32, n <= max_points.  Resolves to a dict
        {"boxes": (k, 7+), "scores": (k,), "labels": (k,)} above thresh."""
        points = np.asarray(points, np.float32)
        if points.ndim != 2 or points.shape[1] != self.num_feats:
            raise ValueError(
                f"expected (n, {self.num_feats}) points, got {points.shape}")
        if points.shape[0] > self.max_points:
            raise ValueError(
                f"{points.shape[0]} points exceeds the artifact cap "
                f"{self.max_points}; re-export with a larger --max_points")
        if self._closed:
            raise RuntimeError("BatchServer is closed")
        item = _Item(points)
        self._q.put(item)
        return item.future

    def infer(self, points: np.ndarray, timeout: float | None = 60.0) -> dict:
        return self.submit(points).result(timeout=timeout)

    def close(self):
        self._closed = True
        self._q.put(self._stop)
        self._thread.join(timeout=30.0)
        # fail any request that raced past the closed check or was queued
        # behind the stop sentinel — a never-resolved future would block
        # its caller for the full timeout
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not self._stop and not item.future.done():
                item.future.set_exception(RuntimeError("BatchServer closed"))

    # -- dispatch side ----------------------------------------------------
    def _collect(self):
        """Block for the first item, then fill up to batch_size within the
        wait budget.  Returns (items, saw_stop, wait_ms) where wait_ms is
        the batching wait measured from the FIRST item's arrival (queue
        idle time before it does not count)."""
        first = self._q.get()
        if first is self._stop:
            return [], True, 0.0
        t0 = time.monotonic()
        items, deadline = [first], t0 + self.max_wait_s
        stop = False
        while len(items) < self.batch_size:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except queue.Empty:
                break
            if nxt is self._stop:
                stop = True
                break
            items.append(nxt)
        return items, stop, (time.monotonic() - t0) * 1e3

    def _dispatch(self):
        while True:
            items, stop, wait_ms = self._collect()
            if items:
                self.stats.wait_ms_total += wait_ms
                try:
                    self._run_batch(items)
                except BaseException as e:  # resolve, don't kill the thread
                    for it in items:
                        if not it.future.done():
                            it.future.set_exception(e)
            if stop:
                return

    def _run_batch(self, items):
        b, n, f = self.batch_size, self.max_points, self.num_feats
        pts = np.zeros((b, n, f), np.float32)
        mask = np.zeros((b, n), bool)
        for i, it in enumerate(items):
            k = it.points.shape[0]
            pts[i, :k] = it.points
            mask[i, :k] = True
        t0 = time.monotonic()
        boxes, scores, labels, valid = self._run(
            {"points": pts, "points_mask": mask})
        boxes, scores, labels, valid = (
            np.asarray(boxes), np.asarray(scores),
            np.asarray(labels), np.asarray(valid))
        self.stats.infer_ms_total += (time.monotonic() - t0) * 1e3
        self.stats.batches += 1
        self.stats.requests += len(items)
        self.stats.scenes_padded += b - len(items)
        for i, it in enumerate(items):
            keep = valid[i] & (scores[i] >= self.score_thresh)
            it.future.set_result({
                "boxes": boxes[i][keep],
                "scores": scores[i][keep],
                "labels": labels[i][keep].astype(np.int32),
            })
