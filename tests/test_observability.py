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


def test_metrics_writer_images(tmp_path):
    """Array-valued metrics become heatmap PNGs (parity: the reference's
    spectrogram image summaries, VISinger/utils/utils.py:93-146)."""
    import numpy as np
    from music_generation_tpu.train.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    spec = np.random.RandomState(0).rand(32, 65).astype(np.float32)
    w.write(3, {"loss": 1.0, "img_spec": spec})
    w.close()
    import json
    with open(w.path) as fh:
        row = json.loads(fh.readline())
    assert row["loss"] == 1.0 and "img_spec" not in row
    import glob
    import os
    pngs = glob.glob(os.path.join(str(tmp_path), "images", "img_spec_3.*"))
    assert pngs, os.listdir(str(tmp_path))
