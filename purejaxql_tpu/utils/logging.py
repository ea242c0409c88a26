"""Metric pipeline: in-graph metric dicts stream to host sinks via
`jax.debug.callback` (the reference's wandb-only pipeline,
pqn_gymnax.py:346-358, generalized to a sink interface).

Sinks: console (throttled), JSONL file, in-memory (for tests), and wandb if
the package happens to be importable. Per-seed streams are supported the
same way the reference keys them by the raw seed value
(WANDB_LOG_ALL_SEEDS, pqn_gymnax.py:349-355).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, List, Optional

import numpy as np


class Sink:
    def log(self, metrics: Dict[str, Any], step: int) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class ConsoleSink(Sink):
    def __init__(self, interval_s: float = 2.0, keys: Optional[List[str]] = None):
        self.interval_s = interval_s
        self.keys = keys
        self._last = 0.0

    def log(self, metrics, step):
        now = time.time()
        if now - self._last < self.interval_s:
            return
        self._last = now
        keys = self.keys or sorted(metrics)
        parts = []
        for k in keys:
            v = metrics.get(k)
            if isinstance(v, (int, np.integer)):
                parts.append(f"{k}={v}")
            elif isinstance(v, (float, np.floating)):
                parts.append(f"{k}={v:.4g}")
        print(f"[step {step}] " + " ".join(parts), file=sys.stderr)


class JsonlSink(Sink):
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def log(self, metrics, step):
        row = {"step": int(step)}
        for k, v in metrics.items():
            if isinstance(v, (np.integer, np.floating, np.bool_)):
                row[k] = v.item()
            elif isinstance(v, (int, float, str, bool)):
                row[k] = v
        self._f.write(json.dumps(row) + "\n")

    def close(self):
        self._f.flush()
        self._f.close()


class MemorySink(Sink):
    def __init__(self):
        self.rows: List[Dict[str, Any]] = []

    def log(self, metrics, step):
        self.rows.append({"step": int(step), **metrics})


class WandbSink(Sink):
    def __init__(self, **init_kwargs):
        import wandb  # optional dependency

        self._wandb = wandb
        if wandb.run is None:
            wandb.init(**init_kwargs)

    def log(self, metrics, step):
        self._wandb.log(metrics, step=step)


class MetricLogger:
    """Fan-out logger. `make_callback()` returns a host function suitable for
    `jax.debug.callback(cb, metrics, seed_id)` inside jitted code."""

    def __init__(self, sinks: Optional[List[Sink]] = None, log_all_seeds: bool = False):
        self.sinks = sinks if sinks is not None else []
        self.log_all_seeds = log_all_seeds

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        for sink in self.sinks:
            sink.log(metrics, step)

    def make_callback(self, step_key: str = "update_steps"):
        def callback(metrics, seed_id):
            metrics = {
                k: np.asarray(v).item() if np.ndim(v) == 0 else np.asarray(v)
                for k, v in metrics.items()
            }
            if self.log_all_seeds:
                metrics = {
                    **metrics,
                    **{f"rng{int(seed_id)}/{k}": v for k, v in metrics.items()},
                }
            self.log(metrics, int(metrics.get(step_key, 0)))

        return callback

    def log_history(self, metrics, step_key: str = "update_steps") -> None:
        """Replay stacked in-graph metrics (arrays of shape (num_updates,)
        or (num_seeds, num_updates)) through the sinks after the run — the
        path for backends without host-callback support."""
        metrics = {k: np.asarray(v) for k, v in metrics.items()}
        arrs = {k: v for k, v in metrics.items() if v.ndim >= 1}
        if not arrs:
            return
        some = next(iter(arrs.values()))
        if some.ndim >= 2:  # leading seed axis from vmap
            for s in range(some.shape[0]):
                self.log_history(
                    {k: v[s] for k, v in arrs.items()}, step_key
                )
            return
        n = some.shape[0]
        for i in range(n):
            row = {k: v[i].item() if v[i].ndim == 0 else v[i] for k, v in arrs.items()}
            self.log(row, int(row.get(step_key, i)))

    def close(self):
        for sink in self.sinks:
            sink.close()


def make_logger(config: Dict[str, Any]) -> MetricLogger:
    # Multi-host: only process 0 owns sinks — on a 2-host pod every
    # process traces the same program and would otherwise write duplicate
    # log rows/files (metrics are pmean'd over the mesh, so process 0's
    # stream is the global one). LOG_ALL_PROCESSES=True opts out for
    # per-host debugging.
    if not config.get("LOG_ALL_PROCESSES", False):
        from purejaxql_tpu.parallel.mesh import is_main_process

        if not is_main_process():
            return MetricLogger([])
    sinks: List[Sink] = []
    mode = str(config.get("LOG_MODE", config.get("WANDB_MODE", "disabled")))
    if config.get("LOG_CONSOLE", False):
        sinks.append(ConsoleSink())
    if config.get("LOG_JSONL"):
        sinks.append(JsonlSink(config["LOG_JSONL"]))
    if mode == "online":
        try:
            sinks.append(
                WandbSink(
                    entity=config.get("ENTITY", ""),
                    project=config.get("PROJECT", ""),
                    config=config,
                )
            )
        except ImportError:
            print("wandb not available; skipping wandb sink", file=sys.stderr)
    return MetricLogger(sinks, log_all_seeds=config.get("WANDB_LOG_ALL_SEEDS", False))
