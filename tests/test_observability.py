"""Observability + misc utils tests."""

import logging
import time

from music_generation_tpu.utils import (StageTimer, device_memory_stats)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) >= 1
    assert all("device" in s for s in stats)


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0.01
    assert "b" in s
