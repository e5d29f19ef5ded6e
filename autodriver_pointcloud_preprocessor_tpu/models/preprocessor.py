"""Standalone preprocessing engine (non-ROS API).

The reference wished for exactly this split — "Create a Python package for
standalone non-ROS use then just import that here" (reference:
pointcloud_preprocessor.py:48). ``Preprocessor`` owns the config, the jit
cache, and the per-stage timing dict; the runtime node layer
(runtime/node.py) is a thin topic-and-parameter shell around it.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scan import ScanBuffer, from_soa, to_soa, valid_count
from ..core.timing import StageTimer, get_current_time, get_time_difference
from .pipeline import (
    STAGE_TIMING_KEYS,
    PipelineParams,
    PipelineSettings,
    build_pipeline,
    params_from_config,
    settings_from_config,
    stage_functions,
)

__all__ = ["Preprocessor"]


def _sync(buf: ScanBuffer) -> None:
    """Force real device completion (block_until_ready lies on this backend;
    see PERF_NOTES.md) by pulling one mask element."""
    np.asarray(buf.mask[:1])


class Preprocessor:
    """Configurable, compile-cached scan preprocessing engine.

    Args:
        config: flat dict using the reference's dotted parameter names
            (missing keys -> reference defaults).
        profile: when True, stages run as separate programs with a device
            sync each so ``processing_times`` carries real per-stage wall
            times under the reference's keys (SURVEY.md §6). When False the
            whole pipeline is one fused program and only
            ``preprocessing_time`` is recorded — the production mode.
        seed: base PRNG seed for RANSAC (reproducible, unlike Open3D).
    """

    def __init__(
        self,
        config: Optional[Dict[str, object]] = None,
        profile: bool = False,
        seed: int = 0,
    ):
        self.config: Dict[str, object] = dict(config or {})
        self.profile = profile
        self.processing_times: Dict[str, float] = {}
        self._timer = StageTimer(self.processing_times)
        self._key = jax.random.PRNGKey(seed)
        self._frame = 0
        self._tf_matrix: Optional[np.ndarray] = None
        self._rebuild()

    # -- configuration --------------------------------------------------------

    def _rebuild(self) -> None:
        cfg = dict(self.config)
        cfg["_has_tf"] = self._tf_matrix is not None
        self.settings: PipelineSettings = settings_from_config(cfg)
        self.params: PipelineParams = params_from_config(cfg, self._tf_matrix)

    def update_config(self, delta: Dict[str, object]) -> None:
        """Apply a config change. Numeric changes are free (traced params);
        stage toggles change the static settings and therefore recompile on
        next use (bounded by the jit cache).

        A delta that fails validation (settings_from_config raises) is
        ROLLED BACK — the previous config stays live, so one rejected
        reconfigure cannot poison every later one."""
        old = dict(self.config)
        self.config.update(delta)
        try:
            self._rebuild()
        except Exception:
            self.config = old
            self._rebuild()
            raise

    def set_tf_matrix(self, matrix: Optional[np.ndarray]) -> None:
        """Install (or clear) the sensor->robot homogeneous transform."""
        self._tf_matrix = None if matrix is None else np.asarray(matrix, np.float32)
        self._rebuild()

    # -- processing -----------------------------------------------------------

    def process_soa(
        self,
        soa: Dict[str, np.ndarray],
        metadata: Optional[dict] = None,
        capacity: Optional[int] = None,
    ) -> Tuple[Dict[str, np.ndarray], dict]:
        """Host SoA in -> processed host SoA out (one H2D + one D2H).

        Records the reference's timing keys: ``tensor_transfer`` (H2D +
        padding), per-stage keys in profile mode, ``preprocessing_time``.
        """
        start = get_current_time(monotonic=True)
        buf, metadata = from_soa(soa, capacity=capacity, metadata=metadata)
        self.processing_times["tensor_transfer"] = get_time_difference(
            start, get_current_time(monotonic=True)
        )

        buf, plane = self.process_buffer(buf)

        start = get_current_time(monotonic=True)
        out = to_soa(buf, metadata)
        # device->host egress (the node records the reference's
        # 'pointcloud_msg_parsing' key separately for its struct building)
        self.processing_times["device_to_host"] = get_time_difference(
            start, get_current_time(monotonic=True)
        )
        if self.settings.estimate_normals:
            metadata["has_normals"] = True
        metadata["ground_plane_estimate"] = (
            None if np.isnan(np.asarray(plane)).any() else np.asarray(plane)
        )
        return out, metadata

    def process_soa_async(self, soa, metadata=None, capacity=None):
        """Dispatch a scan and return a resolver (no sync).

        Dispatches H2D + the fused pipeline asynchronously; calling the
        returned function performs the single packed D2H and yields
        ``(out_soa, metadata)``. Lets callers overlap scan N's device work
        and egress with scan N+1's ingest (the node's pipelined mode).
        """
        buf, metadata = from_soa(soa, capacity=capacity, metadata=metadata)
        buf, plane = self.process_buffer(buf)

        def resolve():
            out = to_soa(buf, metadata)
            if self.settings.estimate_normals:
                metadata["has_normals"] = True
            p = np.asarray(plane)
            metadata["ground_plane_estimate"] = (
                None if np.isnan(p).any() else p
            )
            return out, metadata

        return resolve

    def process_batch(self, bufs, sequential: bool = False):
        """Process a list of same-capacity ScanBuffers as ONE program.

        ``sequential=False`` (default): vmapped — every stage batches
        across scans; best for SMALL scans where dispatch overhead
        dominates. ``sequential=True``: ``lax.map`` — scans run one after
        another inside a single dispatch; best for LARGE scans (one 128k
        scan already saturates the core, and independent dispatches cost
        ~2.3 ms each of queue overhead on this backend — the sequential
        batch sustains chained-latency throughput, measured 3.68 ->
        1.39 ms/scan at B=8; PERF_NOTES.md round 3). Adds B-1 scans of
        latency either way. RANSAC keys differ per scan.
        Returns (list of ScanBuffers, planes float32[B, 4]).
        """
        if not bufs:
            return [], np.zeros((0, 4), np.float32)
        from ..models.pipeline import build_pipeline, pipeline_runner

        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bufs)
        keys = jax.random.split(
            jax.random.fold_in(self._key, self._frame), len(bufs)
        )
        self._frame += 1
        fn = (
            _seq_batched_pipeline(self.settings)
            if sequential
            else _batched_pipeline(self.settings)
        )
        start = get_current_time(monotonic=True)
        out, planes = fn(stacked, self.params, keys)
        self.processing_times["preprocessing_time"] = get_time_difference(
            start, get_current_time(monotonic=True)
        )
        outs = [
            jax.tree_util.tree_map(lambda x: x[i], out) for i in range(len(bufs))
        ]
        return outs, planes

    def process_buffer(self, buf: ScanBuffer) -> Tuple[ScanBuffer, jax.Array]:
        """Device buffer in -> device buffer out (the fused hot path)."""
        key = jax.random.fold_in(self._key, self._frame)
        self._frame += 1

        start = get_current_time(monotonic=True)
        if self.profile:
            buf, plane = self._run_profiled(buf, key)
        else:
            fn = build_pipeline(self.settings)
            buf, plane = fn(buf, self.params, key)
        self.processing_times["preprocessing_time"] = get_time_difference(
            start, get_current_time(monotonic=True)
        )
        return buf, plane

    def _run_profiled(self, buf: ScanBuffer, key: jax.Array):
        plane = jnp.full((4,), jnp.nan, jnp.float32)
        _sync(buf)
        for name, fn in stage_functions(self.settings, separate_stages=True):
            jfn = _stage_jit(self.settings, name)
            with self._timer.stage(STAGE_TIMING_KEYS[name]):
                buf, aux = jfn(buf, self.params, key)
                _sync(buf)
            if aux is not None:
                plane = aux
        return buf, plane

    # -- introspection --------------------------------------------------------

    def count(self, buf: ScanBuffer) -> int:
        return int(valid_count(buf))


import functools


@functools.lru_cache(maxsize=64)
def _batched_pipeline(settings: PipelineSettings):
    from ..models.pipeline import pipeline_runner

    # the Pallas window kernel batches natively under vmap (custom_vmap
    # routes the batch onto a kernel grid dimension, ops/pallas_window.py)
    return jax.jit(jax.vmap(pipeline_runner(settings), in_axes=(0, None, 0)))


@functools.lru_cache(maxsize=64)
def _seq_batched_pipeline(settings: PipelineSettings):
    from ..models.pipeline import pipeline_runner

    runner = pipeline_runner(settings)

    def fn(stacked, params, keys):
        return jax.lax.map(lambda bk: runner(bk[0], params, bk[1]),
                           (stacked, keys))

    return jax.jit(fn)


@functools.lru_cache(maxsize=256)
def _stage_jit(settings: PipelineSettings, name: str):
    for n, fn in stage_functions(settings, separate_stages=True):
        if n == name:
            return jax.jit(fn)
    raise KeyError(name)
