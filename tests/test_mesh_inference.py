"""Multi-chip SVS inference: DP x TP sharded synthesize_batch on the
8-device virtual CPU mesh must match the single-device result.

Reference had no multi-device inference (per-process GPU pinning only,
SURVEY.md §2.7); this is a TPU-native capability: params tensor-parallel
over `model`, sentences sharded over `data`, XLA collectives over ICI.
"""

import jax
import numpy as np
import pytest

from music_generation_tpu.models.svs import SVSConfig
from music_generation_tpu.parallel import make_mesh
from music_generation_tpu.pipeline.synthesis import SVSSynthesizer

TINY = SVSConfig(inter_channels=16, hidden_channels=16, filter_channels=32,
                 n_heads=2, n_layers=1, spec_channels=65,
                 resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
                 upsample_rates=(4, 4), upsample_initial_channel=32,
                 upsample_kernel_sizes=(8, 8), hop_length=16)


def _scores(svs, n):
    texts = ["你好世界", "小小的天", "隐形的翅膀", "带我飞翔"]
    out = []
    for i in range(n):
        text = texts[i % len(texts)]
        notes = ["C4", "C4", "D4", "D4", "E4", "E4", "F4", "F4"][: 2 * len(text)]
        durs = [0.3] * len(notes)
        out.append(svs.frontend.align(text, notes, durs))
    return out


@pytest.mark.parametrize("n_data,n_model", [(4, 2), (8, 1)])
def test_meshed_batch_matches_single_device(n_data, n_model):
    if len(jax.devices("cpu")) < n_data * n_model:
        pytest.skip("needs 8 virtual CPU devices")
    base = SVSSynthesizer(TINY, seed=3)
    scores = _scores(base, 5)  # pads to b=8 on the 4-wide data axis
    ref = base.synthesize_batch(scores)

    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices("cpu")[: n_data * n_model])
    meshed = SVSSynthesizer(TINY, params=base.params, seed=3, mesh=mesh)
    got = meshed.synthesize_batch(scores)

    assert len(got) == len(ref) == 5
    for a, b in zip(ref, got):
        assert a.shape == b.shape and a.dtype == b.dtype == np.int16
        # partitioned reductions reorder float ops; allow a few int16 LSBs
        assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 64
        # and the waveforms must be essentially the same signal
        denom = max(float(np.abs(a).max()), 1.0)
        assert np.mean(np.abs(a - b)) / denom < 1e-3


def test_meshed_batch_pads_to_data_axis():
    if len(jax.devices("cpu")) < 4:
        pytest.skip("needs virtual CPU devices")
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices("cpu")[:4])
    svs = SVSSynthesizer(TINY, seed=0, mesh=mesh)
    # 1 sentence still works (padded to a 4-divisible batch internally)
    wavs = svs.synthesize_batch(_scores(svs, 1))
    assert len(wavs) == 1 and wavs[0].dtype == np.int16
