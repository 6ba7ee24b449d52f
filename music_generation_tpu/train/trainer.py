"""GAN trainer for VISinger: pjit data/tensor-parallel train step + orbax.

Replaces the reference's dormant Lightning-style DDP trainer
(VISinger/utils/pl_utils.py:354-1618): instead of mp.spawn + NCCL DDP, one
jitted train step runs SPMD over a (data, model) mesh; gradients are averaged
across `data` implicitly by sharded-batch autodiff, TP weights keep their
sharding through the optimizer. Checkpoint/resume is orbax.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..audio.stft import mel_spectrogram, spec_to_mel
from ..core.masking import slice_segments
from ..models.svs import MultiPeriodDiscriminator, SVSConfig, VISinger
from . import losses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-4
    betas: tuple = (0.8, 0.99)
    eps: float = 1e-9
    lr_decay: float = 0.999875
    # lr_decay is the reference's per-EPOCH gamma (VISinger/configs/
    # ours.json lr_decay + torch ExponentialLR stepped once per epoch); set
    # steps_per_epoch from the dataset (train CLI does) so long runs don't
    # decay ~12500x too fast.
    steps_per_epoch: int = 1
    c_mel: float = 45.0
    # AE-variant spec_predict L1 weight; None = same as c_mel. Setting it
    # low AFTER the frame-prior has converged concentrates gradient on the
    # vocoder re-adapting to its (now near-ground-truth) spec_predict input
    # — the front half converges much faster than the decoder and keeps
    # shifting the decoder's input distribution (observed: finetune drove
    # spec L1 0.52->0.08 while mel L1 rose 0.65->1.02).
    c_spec: Optional[float] = None
    c_kl: float = 1.0
    # adversarial / feature-matching weights. c_adv=0 also skips the
    # discriminator update entirely — a pure-regression (mel+spec+KL)
    # phase; used to finetune reconstruction after the LSGAN discriminator
    # saturates (observed: disc loss ~2e-4 by step 2k on the toy set while
    # loss_mel RISES 26->44 chasing adv/fm noise)
    c_adv: float = 1.0
    c_fm: float = 1.0
    # weight of the reverse-KL surrogate (gaussian_nll of z_hat under the
    # posterior). The reference ships no training script, so this weight is
    # ours: at 1.0 the term can explode — z_p_hat = m_p + eps*exp(logs_p)
    # samples far out whenever the prior logs_p grows, and the tight
    # posterior's exp(-2*logs_q) amplifies the miss quadratically (observed:
    # round-2 full-size run, loss_gen ~15k by step 1800 from this term while
    # loss_mel rose 26 -> 44). Default damps it to a regularizer.
    c_kl_rev: float = 0.05
    # multi-resolution STFT loss weight (losses.multires_stft_loss):
    # full-band (to-Nyquist) magnitude pressure the 7600 Hz-capped mel loss
    # can't provide — counters upsampler imaging (a measured -10 dB
    # fs/2 - f0 tone on the NSF decoder). 0 = off (reference recipe parity);
    # ~2.5 gives it loss-scale comparable to c_mel*melL1 late in training.
    c_stft: float = 0.0
    # squared log-RMS-ratio loudness loss (losses.energy_loss). ON by
    # default: without it the recipe converges ~-6 dB quiet (round-4
    # measured rms_ratio 0.505) because mel L1 under-prices a uniform
    # amplitude deficit relative to its cost in adversarial texture. At
    # ratio 0.5 the raw term is log(0.5)^2 ~ 0.48; weight 10 makes it
    # comparable to loss_adv (~6) until closed, then it vanishes
    # quadratically. Set 0 for strict VITS-recipe parity.
    c_energy: float = 10.0
    seed: int = 1234
    grad_clip: float = 500.0
    # global-norm clip + LR warmup: the random-init KL/reverse-KL transient
    # is enormous (observed: step-0 loss_gen ~3e6 on the full-size model)
    # and one unprotected update drives the HiFi-GAN decoder's pre-tanh
    # activations into saturation (mean |x| ~8 at conv_post => tanh grad
    # ~1e-7) — the decoder then NEVER recovers waveform shape (square-wave
    # output, mel-L1 floor ~0.64 no matter how long training runs).
    # Elementwise clip(500) does not prevent this; a global-norm bound plus
    # a few hundred warmup steps does.
    grad_clip_norm: float = 100.0
    # default 0 keeps single-step semantics exact (unit tests assert params
    # move on step 1); the train CLI defaults --warmup-steps to 200
    warmup_steps: int = 0
    # parity: pl_utils accumulate_grad_batches (pl_utils.py:257-282,367) —
    # optimizer updates apply every N steps with averaged gradients
    accumulate_grad_batches: int = 1
    # mixed precision (parity: fp16_run=true in VISinger/configs/ours.json).
    # TPU-native: bf16 compute (no loss scaling needed), fp32 master params,
    # losses and optimizer in fp32.
    bf16_run: bool = False
    # derive phone durations by monotonic alignment search inside the train
    # step (VISinger/models.py:590-604) instead of batch["phone_durations"]
    use_mas: bool = False
    # discriminator learning-rate multiplier (GAN balance knob: <1 slows the
    # discriminator when it collapses the adversarial signal)
    disc_lr_scale: float = 1.0
    # DC-drift penalty on the generated segment: mean_t(audio)^2 * c_dc.
    # The mel loss rewards cheap low-band energy, and the lowest-cost way
    # for the decoder to produce it is a DC rail — which then saturates the
    # output tanh and kills every waveform-loss gradient permanently. This
    # term removes the reward while gradients are still alive (it cannot
    # CURE saturation: it flows through the same dead tanh).
    c_dc: float = 10.0
    # instance noise: iid Gaussian added to BOTH real and fake waveforms at
    # the discriminator input. On synthetically clean corpora (the toy sine
    # singer) the disc game is otherwise unwinnable — any GAN noise floor
    # identifies the fake, the disc saturates (loss_disc ~1e-3) and the
    # adversarial gradient degenerates. Noise keeps the real/fake supports
    # overlapping so D stays near its decision boundary.
    disc_input_noise: float = 0.0
    # pause discriminator updates while its loss is below this floor (i.e.
    # while D has decisively won). Complements disc_lr_scale/instance noise:
    # observed toy-set runs reach loss_disc ~0.005 with loss_adv ~6 (D(fake)
    # pinned at 0) by step ~300, after which adversarial gradients are
    # noise. 0 disables. Implemented as a branchless state freeze so it
    # stays jit/pjit-compatible.
    disc_loss_floor: float = 0.0
    # emit spectrogram images with the metrics (parity: the reference's
    # TensorBoard image summaries, VISinger/utils/utils.py:93-146)
    log_images: bool = False


class TrainState(train_state.TrainState):
    pass


def make_optimizer(cfg: TrainConfig, lr_scale: float = 1.0):
    # the schedule counts APPLIED optimizer updates — under MultiSteps that
    # is once per accumulate_grad_batches mini-steps — so convert the
    # per-epoch mini-step count into update counts to keep the decay at
    # exactly one gamma per epoch
    updates_per_epoch = max(
        cfg.steps_per_epoch // max(cfg.accumulate_grad_batches, 1), 1)
    if cfg.warmup_steps > 0:
        schedule = optax.warmup_exponential_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate * lr_scale,
            warmup_steps=cfg.warmup_steps,
            transition_steps=updates_per_epoch,
            decay_rate=cfg.lr_decay, staircase=True)
    else:
        schedule = optax.exponential_decay(
            init_value=cfg.learning_rate * lr_scale,
            transition_steps=updates_per_epoch,
            decay_rate=cfg.lr_decay, staircase=True)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.clip(cfg.grad_clip),
        optax.adamw(schedule, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                    weight_decay=0.0),
    )
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)
    return tx


def create_states(svs_cfg: SVSConfig, train_cfg: TrainConfig, batch_example,
                  rngs=None):
    """Initialize generator + discriminator TrainStates."""
    gen = VISinger(svs_cfg)
    disc = MultiPeriodDiscriminator()
    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    gen_vars = gen.init(
        {"params": k1, "noise": k2, "slice": k3, "dropout": k4},
        batch_example["phones"], batch_example["x_lengths"],
        batch_example["spec"], batch_example["y_lengths"],
        batch_example["note_ids"], batch_example["note_durations"],
        batch_example["f0_score"], batch_example["phone_durations"],
        batch_example["shengdiao"], deterministic=True,
        log_f0=batch_example["log_f0"])
    seg = svs_cfg.segment_size
    disc_vars = disc.init(k5, jnp.zeros((1, seg, 1)), jnp.zeros((1, seg, 1)))
    gen_state = TrainState.create(apply_fn=gen.apply, params=gen_vars["params"],
                                  tx=make_optimizer(train_cfg))
    disc_state = TrainState.create(
        apply_fn=disc.apply, params=disc_vars["params"],
        tx=make_optimizer(train_cfg, lr_scale=train_cfg.disc_lr_scale))
    return gen_state, disc_state, gen, disc


def _slice_real_audio(audio, ids_slice, segment_size, hop):
    starts = ids_slice * hop
    return slice_segments(audio, starts, segment_size)


def make_train_step(gen: VISinger, disc: MultiPeriodDiscriminator,
                    svs_cfg: SVSConfig, train_cfg: TrainConfig):
    """Returns train_step(gen_state, disc_state, batch, rng) -> (states, metrics).
    Pure function of its inputs; jit/pjit-able over any mesh."""

    def _to_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def _to_f32(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, tree)

    def gen_forward(gen_params, batch, rng):
        k_noise, k_slice, k_drop = jax.random.split(rng, 3)
        if train_cfg.bf16_run:
            # bf16 compute, fp32 masters: the cast sits inside autodiff so
            # gradients accumulate back into fp32 leaves; losses below see
            # fp32 outputs
            gen_params, batch = _to_bf16(gen_params), _to_bf16(batch)
        out = gen.apply({"params": gen_params},
                        batch["phones"], batch["x_lengths"], batch["spec"],
                        batch["y_lengths"], batch["note_ids"],
                        batch["note_durations"], batch["f0_score"],
                        batch["phone_durations"], batch["shengdiao"],
                        deterministic=False, use_mas=train_cfg.use_mas,
                        log_f0=batch["log_f0"],
                        rngs={"noise": k_noise, "slice": k_slice,
                              "dropout": k_drop})
        return _to_f32(out) if train_cfg.bf16_run else out

    def disc_apply(disc_params, y_real, y_fake, noise_rng=None):
        if noise_rng is not None and train_cfg.disc_input_noise > 0.0:
            kr, kf = jax.random.split(noise_rng)
            s = train_cfg.disc_input_noise
            y_real = y_real + s * jax.random.normal(kr, y_real.shape,
                                                    y_real.dtype)
            y_fake = y_fake + s * jax.random.normal(kf, y_fake.shape,
                                                    y_fake.dtype)
        if train_cfg.bf16_run:
            disc_params = _to_bf16(disc_params)
            y_real = y_real.astype(jnp.bfloat16)
            y_fake = y_fake.astype(jnp.bfloat16)
        out = disc.apply({"params": disc_params}, y_real, y_fake)
        return _to_f32(out) if train_cfg.bf16_run else out

    def disc_loss_fn(disc_params, gen_out, batch, noise_rng=None):
        y_real = _slice_real_audio(batch["audio"], gen_out["ids_slice"],
                                   svs_cfg.segment_size, svs_cfg.hop_length)
        y_fake = jax.lax.stop_gradient(gen_out["audio"])
        d_real, d_fake, _, _ = disc_apply(disc_params, y_real, y_fake,
                                          noise_rng=noise_rng)
        return losses.discriminator_adv_loss(d_real, d_fake)

    def gen_loss_fn(gen_params, disc_params, batch, rng, noise_rng=None):
        out = gen_forward(gen_params, batch, rng)
        y_real = _slice_real_audio(batch["audio"], out["ids_slice"],
                                   svs_cfg.segment_size, svs_cfg.hop_length)
        d_real, d_fake, fmap_r, fmap_g = disc_apply(
            disc_params, y_real, out["audio"], noise_rng=noise_rng)

        mel_real = mel_spectrogram(y_real[..., 0], svs_cfg.sampling_rate,
                                   hop=svs_cfg.hop_length)
        mel_fake = mel_spectrogram(out["audio"][..., 0], svs_cfg.sampling_rate,
                                   hop=svs_cfg.hop_length)
        l_mel = losses.l1_masked(mel_fake, mel_real) * train_cfg.c_mel
        l_kl = losses.kl_divergence(out["z_p"], out["logs_q"], out["m_p"],
                                    out["logs_p"], out["y_mask"]) * train_cfg.c_kl
        # reverse direction: the flow/prior sample z_hat should land where
        # the posterior is. Stop-grad the posterior stats — otherwise this
        # term pays the generator for shrinking logs_q toward the clamp
        # (observed as loss_gen going hundreds negative while loss_mel
        # rises mid-run) instead of improving the prior/flow.
        l_kl_rev = losses.gaussian_nll(
            out["z_hat"], jax.lax.stop_gradient(out["m_q"]),
            jax.lax.stop_gradient(out["logs_q"]),
            out["y_mask"]) * train_cfg.c_kl_rev
        # duration targets = whatever drove the LengthRegulator (ground
        # truth, or the in-step MAS alignment when use_mas)
        l_dur = losses.duration_loss(out["duration_fraction"],
                                     batch["note_durations"],
                                     out["duration_targets"],
                                     svs_cfg.frame_seconds, out["x_mask"][..., 0])
        l_f0 = losses.f0_loss(out["log_f0"], batch["log_f0"],
                              out["y_mask"][..., 0])
        l_adv = losses.generator_adv_loss(d_fake) * train_cfg.c_adv
        l_fm = losses.feature_matching_loss(fmap_r, fmap_g) * train_cfg.c_fm
        # DC-drift penalty: see TrainConfig.c_dc
        l_dc = jnp.mean(jnp.mean(out["audio"][..., 0], axis=1) ** 2) \
            * train_cfg.c_dc
        # loudness supervision: see TrainConfig.c_energy / losses.energy_loss
        l_energy = losses.energy_loss(out["audio"][..., 0],
                                      y_real[..., 0]) * train_cfg.c_energy
        total = l_mel + l_kl + l_kl_rev + l_dur + l_f0 + l_adv + l_fm \
            + l_dc + l_energy
        if train_cfg.c_stft > 0:
            l_stft = losses.multires_stft_loss(
                out["audio"][..., 0], y_real[..., 0]) * train_cfg.c_stft
            total = total + l_stft
        metrics = {"loss_gen": total, "loss_mel": l_mel, "loss_kl": l_kl,
                   "loss_kl_rev": l_kl_rev, "loss_dur": l_dur,
                   "loss_f0": l_f0, "loss_adv": l_adv, "loss_fm": l_fm,
                   "loss_dc": l_dc, "loss_energy": l_energy,
                   **({"loss_stft": l_stft} if train_cfg.c_stft > 0 else {}),
                   # tanh-saturation telemetry: a healthy decoder stays well
                   # inside |y|<0.95; sat_frac ramping toward 1 is the
                   # death-state signature (gradients about to vanish)
                   "audio_dc": jnp.mean(out["audio"]),
                   "audio_sat_frac": jnp.mean(
                       (jnp.abs(out["audio"]) > 0.95).astype(jnp.float32))}
        if svs_cfg.autoencoder:
            c_spec = (train_cfg.c_spec if train_cfg.c_spec is not None
                      else train_cfg.c_mel)
            l_spec = losses.l1_masked(out["spec_predict"], batch["spec"],
                                      out["y_mask"]) * c_spec
            total = total + l_spec
            metrics["loss_spec"] = l_spec
            metrics["loss_gen"] = total
        if train_cfg.log_images:
            # first-in-batch debug images; MetricsWriter renders array
            # values as heatmap PNGs / TB images
            metrics["img_mel_predict"] = out["mel_predict"][0]
            if svs_cfg.autoencoder:
                metrics["img_spec_predict"] = out["spec_predict"][0]
                metrics["img_spec_target"] = batch["spec"][0]
            # phone->frame alignment staircase (parity: the reference's
            # plot_alignment_to_numpy, VISinger/utils/plot.py:24-45). For
            # hard MAS the alignment IS the duration staircase, so this
            # renders the learned alignment under --durations mas and the
            # annotation alignment otherwise.
            tgt = out["duration_targets"][0].astype(jnp.float32)
            ends = jnp.cumsum(tgt)
            starts = ends - tgt
            t_idx = jnp.arange(out["mel_predict"].shape[1],
                               dtype=jnp.float32)[:, None]
            metrics["img_alignment"] = (
                (t_idx >= starts[None, :]) & (t_idx < ends[None, :])
            ).astype(jnp.float32)
        return total, (out, metrics)

    def train_step(gen_state, disc_state, batch, rng):
        rng_d, rng_g, rng_nd, rng_ng = jax.random.split(rng, 4)
        if train_cfg.c_adv == 0.0:
            # pure-regression phase: no discriminator update (the gen loss
            # still runs disc_apply for the — zero-weighted — terms, but no
            # adversarial game is played)
            d_loss = jnp.float32(0.0)
        else:
            # --- discriminator step (fresh generator sample) ---
            gen_out = gen_forward(gen_state.params, batch, rng_d)
            d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
                disc_state.params, gen_out, batch, noise_rng=rng_nd)
            new_disc = disc_state.apply_gradients(grads=d_grads)
            if train_cfg.disc_loss_floor > 0.0:
                # freeze D (params + optimizer state + step) while it has
                # decisively won; resumes automatically once G pushes
                # loss_disc back above the floor
                live = d_loss >= train_cfg.disc_loss_floor
                disc_state = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(live, new, old),
                    new_disc, disc_state)
            else:
                disc_state = new_disc
        # --- generator step ---
        (g_loss, (_, metrics)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(gen_state.params, disc_state.params,
                                       batch, rng_g, noise_rng=rng_ng)
        gen_state = gen_state.apply_gradients(grads=g_grads)
        metrics["loss_disc"] = d_loss
        return gen_state, disc_state, metrics

    return train_step


def save_checkpoint(path: str, gen_state, disc_state, step: int,
                    keep_last: Optional[int] = None,
                    metric: Optional[float] = None):
    """Save step_<step>; optionally retain only the newest ``keep_last``
    checkpoints plus the best-metric one (keep-N semantics of the
    reference's LatestModelCheckpoint, VISinger/utils/pl_utils.py:284-352,
    which keeps num_ckpt_keep sorted checkpoints and deletes the rest)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(f"{path}/step_{step}",
               {"gen": {"params": gen_state.params,
                        "opt_state": gen_state.opt_state,
                        "step": gen_state.step},
                "disc": {"params": disc_state.params,
                         "opt_state": disc_state.opt_state,
                         "step": disc_state.step}},
               force=True)
    ckptr.wait_until_finished()
    # orbax coordinates the array save across processes; the best-pointer
    # and prune bookkeeping are plain-file ops -> primary host only
    if jax.process_index() != 0:
        return
    if metric is not None:
        _update_best_pointer(path, step, metric)
    if keep_last:
        prune_checkpoints(path, keep_last)


def _best_file(path: str) -> str:
    import os
    return os.path.join(path, "best.json")


def _update_best_pointer(path: str, step: int, metric: float) -> None:
    """Track the lowest-metric step in <path>/best.json (mode='min', like
    pl_utils.LatestModelCheckpoint's best_k_models)."""
    import json
    import os
    best = {"step": step, "metric": float(metric)}
    f = _best_file(path)
    if os.path.exists(f):
        with open(f) as fh:
            prev = json.load(fh)
        if prev.get("metric", float("inf")) <= metric:
            return
    os.makedirs(path, exist_ok=True)
    with open(f, "w") as fh:
        json.dump(best, fh)


def prune_checkpoints(path: str, keep_last: int) -> list:
    """Delete all but the newest ``keep_last`` step_* dirs (and the best.json
    step, if tracked). Returns the pruned step numbers."""
    import glob
    import json
    import os
    import re
    import shutil
    steps = []
    for d in glob.glob(os.path.join(path, "step_*")):
        m = re.fullmatch(r"step_(\d+)", os.path.basename(d))
        if m:
            steps.append(int(m.group(1)))
    steps.sort()
    protect = set(steps[-keep_last:]) if keep_last > 0 else set()
    f = _best_file(path)
    if os.path.exists(f):
        with open(f) as fh:
            protect.add(json.load(fh).get("step"))
    pruned = [s for s in steps if s not in protect]
    for s in pruned:
        shutil.rmtree(os.path.join(path, f"step_{s}"), ignore_errors=True)
    return pruned


def restore_checkpoint(path: str, gen_state, disc_state):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    target = {"gen": {"params": gen_state.params,
                      "opt_state": gen_state.opt_state,
                      "step": gen_state.step},
              "disc": {"params": disc_state.params,
                       "opt_state": disc_state.opt_state,
                       "step": disc_state.step}}
    try:
        restored = ckptr.restore(path, target)
    except Exception:
        # optimizer-state layout mismatch (a checkpoint saved before a
        # gradient transform was added/removed from the optax chain):
        # restore params + step only and keep the fresh optimizer state —
        # evaluation and resume-with-new-optimizer both stay possible
        raw = ocp.PyTreeCheckpointer().restore(path)
        import jax as _jax
        remap = lambda tgt, sub: _jax.tree_util.tree_map(
            lambda _, v: v, tgt, sub)
        gen_state = gen_state.replace(
            params=remap(gen_state.params, raw["gen"]["params"]),
            step=jnp.asarray(raw["gen"]["step"]))
        disc_state = disc_state.replace(
            params=remap(disc_state.params, raw["disc"]["params"]),
            step=jnp.asarray(raw["disc"]["step"]))
        return gen_state, disc_state
    gen_state = gen_state.replace(params=restored["gen"]["params"],
                                  opt_state=restored["gen"]["opt_state"],
                                  step=restored["gen"]["step"])
    disc_state = disc_state.replace(params=restored["disc"]["params"],
                                    opt_state=restored["disc"]["opt_state"],
                                    step=restored["disc"]["step"])
    return gen_state, disc_state
