"""Training metrics sink: JSONL file + optional TensorBoard.

Replaces the reference's TensorBoard `summarize` helper
(VISinger/utils/utils.py:74-83). JSONL is the primary sink (greppable,
dependency-free); TensorBoard is used when the package is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsWriter:
    def __init__(self, log_dir: str, name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self._fh = open(self._path, "a", encoding="utf-8")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=os.path.join(log_dir, "tb"))
        except Exception:
            pass

    def write(self, step: int, metrics: dict) -> None:
        # array-valued entries (spectrograms, alignments) become images;
        # scalars go to JSONL + TB as before
        scalars, arrays = {}, {}
        for k, v in metrics.items():
            if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 2:
                arrays[k] = v
            else:
                scalars[k] = v
        row = {"step": int(step), "time": time.time()}
        row.update({k: float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))
        for k, v in arrays.items():
            self.write_image(step, k, v)

    def write_image(self, step: int, name: str, array) -> None:
        """Render a [T, C] array as a heatmap PNG under <log_dir>/images and
        to TensorBoard (parity: the reference's spectrogram/alignment image
        summaries, VISinger/utils/utils.py:93-146 + plot.py:8-45)."""
        import numpy as np
        img = plot_spectrogram_to_numpy(np.asarray(array, dtype=np.float32))
        if img is None:
            return
        img_dir = os.path.join(os.path.dirname(self._path), "images")
        os.makedirs(img_dir, exist_ok=True)
        try:
            from matplotlib import image as mpimg
            mpimg.imsave(os.path.join(img_dir, f"{name}_{int(step)}.png"), img)
        except Exception:
            np.save(os.path.join(img_dir, f"{name}_{int(step)}.npy"), img)
        if self._tb is not None:
            self._tb.add_image(name, img, int(step), dataformats="HWC")

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()

    @property
    def path(self) -> str:
        return self._path


def plot_spectrogram_to_numpy(spectrogram):
    """[T, C] -> HWC uint8 heatmap (channels up, frames right), the
    reference's plot_spectrogram_to_numpy re-expressed
    (VISinger/utils/utils.py:93-117). Returns None without matplotlib."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pylab as plt
    except Exception:
        return None
    import numpy as np
    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(spectrogram.T, aspect="auto", origin="lower",
                   interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return data
