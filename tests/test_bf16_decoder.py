"""bf16 vocoder mode: same structure, bounded deviation from f32."""

import jax
import jax.numpy as jnp
import numpy as np

from music_generation_tpu.models.svs import SVSConfig, VISinger

BASE = dict(
    n_vocab=100, n_vocab_note=100, n_vocab_shengdiao=300, spec_channels=65,
    inter_channels=16, hidden_channels=16, filter_channels=32, n_heads=2,
    n_layers=1, kernel_size=3, p_dropout=0.1, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 4),
    upsample_initial_channel=32, upsample_kernel_sizes=(8, 8),
    segment_size=16 * 8, hop_length=16)


def test_bf16_decoder_close_to_f32():
    cfg32 = SVSConfig(**BASE, decoder_bf16=False)
    cfg16 = SVSConfig(**BASE, decoder_bf16=True)
    rng = np.random.RandomState(0)
    t = 8
    batch = dict(
        phones=jnp.asarray(rng.randint(3, 60, (1, t)), jnp.int32),
        x_lengths=jnp.asarray([t], jnp.int32),
        note_ids=jnp.asarray(rng.randint(40, 80, (1, t)), jnp.int32),
        note_durations=jnp.asarray(rng.uniform(0.2, 0.4, (1, t)), jnp.float32),
        shengdiao=jnp.asarray(rng.randint(3, 250, (1, t)), jnp.int32),
    )
    noise = jnp.asarray(rng.randn(1, 64, 16), jnp.float32)
    m32 = VISinger(cfg32)
    params = m32.init({"params": jax.random.PRNGKey(0),
                       "noise": jax.random.PRNGKey(1)},
                      **batch, max_frames=64, method=VISinger.infer)
    a32, l32, _ = m32.apply(params, **batch, max_frames=64, noise=noise,
                            method=VISinger.infer)
    m16 = VISinger(cfg16)
    a16, l16, _ = m16.apply(params, **batch, max_frames=64, noise=noise,
                            method=VISinger.infer)
    assert int(l32[0]) == int(l16[0])
    mae = float(jnp.abs(a32 - a16).mean())
    scale = float(jnp.abs(a32).mean()) + 1e-9
    assert mae / scale < 0.15  # bf16 rounding only, same signal
