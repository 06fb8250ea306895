"""Streaming segmentation node — the middleware-free stand-in for the
reference's ROS2 node (src/recursive_patchwork_node.cpp).

The reference node subscribes to PointCloud2, runs filterGroundPoints per
message, republishes ground/obstacle clouds and two text markers with the
counts (cpp:61-221).  Here the same role is a pure-array streaming loop:
scans come from any iterator (KITTI directory, decoded bag arrays,
synthetic generator), the engine runs double-buffered on device (enqueue
scan t+1 while t computes), and sinks receive fixed-shape masks + count
summaries.

Parameter surface mirrors the node's 8 declared parameters
(cpp:16-33), with one deliberate fix: the reference maps its
``angle_threshold`` parameter onto th_seeds (cpp:40 — a seed *height*
threshold, not an angle; SURVEY.md §5 flags this as a mis-mapping).  We
keep the parameter name for drop-in compatibility and document that it
feeds th_seeds.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Iterator, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .core.config import PatchworkConfig
from .core.timing import StageTimes
from .segment.engine import filter_ground

__all__ = ["NodeParams", "FrameResult", "PatchworkNode", "run_stream"]


@dataclasses.dataclass
class NodeParams:
    """The reference node's parameter block (cpp:16-33)."""

    input_topic: str = "/lidar/points"
    ground_topic: str = "/patchwork/ground"
    obstacles_topic: str = "/patchwork/obstacles"
    visualization_topic: str = "/patchwork/visualization"
    min_points: int = 100
    max_iterations: int = 50
    distance_threshold: float = 0.1
    # NOTE: feeds th_seeds (seed height margin) for parity with the
    # reference's mapping (cpp:40); the name is historical.
    angle_threshold: float = 0.1

    def to_config(self, base: Optional[PatchworkConfig] = None) -> PatchworkConfig:
        base = base or PatchworkConfig()
        return base.replace(
            max_iter=self.max_iterations,
            th_dist=self.distance_threshold,
            th_seeds=self.angle_threshold,
        )


@dataclasses.dataclass
class FrameResult:
    """Per-frame output bundle (the node's two clouds + marker counts)."""

    index: int
    ground_mask: np.ndarray     # over input rows
    valid_mask: np.ndarray
    num_ground: int
    num_obstacles: int
    latency_s: float

    def ground_points(self, pts: np.ndarray) -> np.ndarray:
        return pts[self.ground_mask[: len(pts)]]

    def obstacle_points(self, pts: np.ndarray) -> np.ndarray:
        m = self.valid_mask[: len(pts)] & ~self.ground_mask[: len(pts)]
        return pts[m]


class PatchworkNode:
    """Streaming engine with fixed-capacity buckets and async pipelining."""

    def __init__(
        self,
        params: NodeParams | None = None,
        config: PatchworkConfig | None = None,
        capacity: int = 131072,
        batch_size: int = 1,
    ):
        """``batch_size`` > 1 groups frames into one vmapped device step —
        the throughput mode for offline sequence processing (BASELINE
        configs[2]); batch_size=1 minimizes per-frame latency."""
        self.params = params or NodeParams()
        self.config = self.params.to_config(config)
        self.capacity = capacity
        self.batch_size = max(batch_size, 1)
        self.times = StageTimes()
        cfg = self.config

        @jax.jit
        def step(xyz, valid):
            res = filter_ground(xyz, valid, cfg)
            ground = res.ground
            obstacles = res.valid & ~res.ground
            return (
                ground,
                res.valid,
                jnp.sum(ground, dtype=jnp.int32),
                jnp.sum(obstacles, dtype=jnp.int32),
            )

        @jax.jit
        def step_batched(xyz, valid):
            res = jax.vmap(lambda p, v: filter_ground(p, v, cfg))(xyz, valid)
            ground = res.ground
            obstacles = res.valid & ~res.ground
            return (
                ground,
                res.valid,
                jnp.sum(ground, axis=-1, dtype=jnp.int32),
                jnp.sum(obstacles, axis=-1, dtype=jnp.int32),
            )

        self._step = step
        self._step_batched = step_batched

    def _pad(self, pts: np.ndarray):
        n = min(len(pts), self.capacity)
        xyz = np.zeros((self.capacity, 3), np.float32)
        xyz[:n] = np.asarray(pts, np.float32)[:n, :3]
        valid = np.zeros(self.capacity, bool)
        valid[:n] = True
        return jnp.asarray(xyz), jnp.asarray(valid)

    def process(self, pts: np.ndarray, index: int = 0) -> Optional[FrameResult]:
        """Process one scan synchronously; None if below min_points
        (reference drops short clouds, cpp:74-78 via empty-check)."""
        if len(pts) < self.params.min_points:
            return None
        t0 = time.perf_counter()
        with self.times.time("h2d"):
            xyz, valid = self._pad(pts)
        with self.times.time("engine"):
            g, v, ng, no = self._step(xyz, valid)
            ng = int(ng)
        with self.times.time("d2h"):
            res = FrameResult(
                index=index,
                ground_mask=np.asarray(g),
                valid_mask=np.asarray(v),
                num_ground=ng,
                num_obstacles=int(no),
                latency_s=0.0,
            )
        res.latency_s = time.perf_counter() - t0
        return res

    def run(
        self,
        scans: Iterable[np.ndarray],
        sinks: Optional[List[Callable[[np.ndarray, FrameResult], None]]] = None,
        limit: Optional[int] = None,
        pipeline_depth: int = 2,
    ) -> List[FrameResult]:
        """Stream scans through the engine with software pipelining.

        Device work for scan t+1 is enqueued before scan t's results are
        pulled to the host, hiding transfer latency (the reference
        processes strictly sequentially per DDS message).
        """
        if self.batch_size > 1:
            return self._run_batched(scans, sinks or [], limit)
        sinks = sinks or []
        results: List[FrameResult] = []
        inflight: List[tuple] = []  # (index, pts, device outputs, t0)

        def drain_one():
            idx, pts, (g, v, ng, no), t0 = inflight.pop(0)
            res = FrameResult(
                index=idx,
                ground_mask=np.asarray(g),
                valid_mask=np.asarray(v),
                num_ground=int(ng),
                num_obstacles=int(no),
                latency_s=time.perf_counter() - t0,
            )
            self.times.add("frame", res.latency_s)
            results.append(res)
            for sink in sinks:
                sink(pts, res)

        for i, pts in enumerate(scans):
            if limit is not None and i >= limit:
                break
            if len(pts) < self.params.min_points:
                continue
            try:
                t0 = time.perf_counter()
                xyz, valid = self._pad(pts)
                out = self._step(xyz, valid)
                inflight.append((i, pts, out, t0))
                while len(inflight) >= pipeline_depth:
                    drain_one()
            except Exception as e:  # per-frame resilience (reference
                # node catches and logs per callback, cpp:105-107)
                print(f"Error processing frame {i}: {type(e).__name__}: {e}")
        while inflight:
            drain_one()
        return results

    def _run_batched(self, scans, sinks, limit) -> List[FrameResult]:
        """Group frames into vmapped batches (short final batch padded with
        empty frames that are dropped from the results)."""
        results: List[FrameResult] = []
        buf: List[tuple] = []  # (index, pts)

        def flush():
            if not buf:
                return
            t0 = time.perf_counter()
            b = self.batch_size
            xyz = np.zeros((b, self.capacity, 3), np.float32)
            valid = np.zeros((b, self.capacity), bool)
            for slot, (_, pts) in enumerate(buf):
                n = min(len(pts), self.capacity)
                xyz[slot, :n] = np.asarray(pts, np.float32)[:n, :3]
                valid[slot, :n] = True
            g, v, ng, no = self._step_batched(
                jnp.asarray(xyz), jnp.asarray(valid)
            )
            g, v = np.asarray(g), np.asarray(v)
            dt = time.perf_counter() - t0
            for slot, (idx, pts) in enumerate(buf):
                res = FrameResult(
                    index=idx,
                    ground_mask=g[slot],
                    valid_mask=v[slot],
                    num_ground=int(ng[slot]),
                    num_obstacles=int(no[slot]),
                    latency_s=dt / len(buf),
                )
                self.times.add("frame", res.latency_s)
                results.append(res)
                for sink in sinks:
                    sink(pts, res)
            buf.clear()

        for i, pts in enumerate(scans):
            if limit is not None and i >= limit:
                break
            if len(pts) < self.params.min_points:
                continue
            buf.append((i, pts))
            if len(buf) == self.batch_size:
                flush()
        flush()
        return results


def run_stream(
    scans: Iterator[np.ndarray],
    params: NodeParams | None = None,
    config: PatchworkConfig | None = None,
    capacity: int = 131072,
    verbose: bool = True,
) -> List[FrameResult]:
    """Convenience wrapper: stream + log like the node's DEBUG output
    (cpp:96-103: 'Processed in N ms: G ground, O obstacles')."""
    node = PatchworkNode(params, config, capacity)
    results = node.run(scans)
    if verbose:
        for r in results:
            print(
                f"Processed frame {r.index} in {r.latency_s * 1e3:.1f} ms: "
                f"{r.num_ground} ground, {r.num_obstacles} obstacles"
            )
        print(node.times.report())
    return results
