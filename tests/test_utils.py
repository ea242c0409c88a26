"""Utils coverage: metric sinks, throughput accounting, atari scores,
profiling helpers."""

import json
import os

import jax
import numpy as np

from purejaxql_tpu.utils.logging import (
    JsonlSink, MemorySink, MetricLogger,
)
from purejaxql_tpu.utils.atari_scores import ATARI_SCORES, human_normalized_score
from purejaxql_tpu.utils.profiling import Throughput, time_fn


def test_metric_logger_fanout_and_history(tmp_path):
    path = os.path.join(tmp_path, "m.jsonl")
    mem = MemorySink()
    logger = MetricLogger([JsonlSink(path), mem])
    logger.log({"a": 1.0, "update_steps": 3}, step=3)
    logger.log_history({"a": np.arange(4.0), "update_steps": np.arange(4)})
    logger.close()
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == 5
    assert rows[-1]["a"] == 3.0
    assert len(mem.rows) == 5


def test_log_history_seed_axis():
    mem = MemorySink()
    logger = MetricLogger([mem])
    logger.log_history(
        {"a": np.arange(6.0).reshape(2, 3), "update_steps": np.tile(np.arange(3), (2, 1))}
    )
    assert len(mem.rows) == 6  # 2 seeds x 3 updates


def test_atari_scores_table():
    assert len(ATARI_SCORES) == 57
    assert human_normalized_score("Pong-v5", 14.6) == 1.0
    assert human_normalized_score("Pong-v5", -20.7) == 0.0
    assert np.isnan(human_normalized_score("NotAGame", 0.0))


def test_throughput_accounting():
    t = Throughput()
    out = t.mark(1000)
    assert out["env_steps"] == 1000
    assert out["sps"] > 0
    out2 = t.mark(3000)
    assert out2["env_steps"] == 3000


def test_time_fn_returns_timings():
    f = jax.jit(lambda x: (x * 2).sum())
    out = time_fn(f, np.ones(128, np.float32), warmup=1, iters=2)
    assert out["best_s"] > 0
    assert out["mean_s"] >= out["best_s"]
