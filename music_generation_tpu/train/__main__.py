"""Training CLI for the VISinger GAN (SPMD over all local devices).

Usage:
  python -m music_generation_tpu.train --steps 1000 --ckpt-dir ./ckpts \
      [--data-dir preprocessed_npy_dir] [--tiny] [--n-model 1]

Data: either synthetic batches (smoke / throughput measurement) or a
directory of preprocessed .npy arrays following the reference's cpop layout
(cpop_text_preprocessor.py main(): *-phone-ids.npy, *-note-ids.npy,
*-note-duration-ids.npy, *-phone-duration.npy + *-wav.npy/-spec.npy).
"""

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--ckpt-dir", default="./checkpoints")
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--keep-last", type=int, default=3,
                   help="retain only the newest N checkpoints (+ best loss)")
    p.add_argument("--accumulate-grad-batches", type=int, default=1,
                   help="apply optimizer updates every N steps (averaged "
                        "grads; pl_utils accumulate_grad_batches parity)")
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--resume", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--n-model", type=int, default=1,
                   help="tensor-parallel width (mesh model axis)")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--packed", default=None, metavar="PREFIX",
                   help="packed indexed dataset prefix (PREFIX.data/.idx; "
                        "see train.dataset pack_dataset)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="prefetch depth: assemble + device_put the next N "
                        "batches on a background thread (0 = synchronous)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute with fp32 master params (parity: "
                        "fp16_run in VISinger/configs/ours.json)")
    p.add_argument("--durations", default="dataset",
                   choices=["dataset", "mas"],
                   help="phone-duration source for the LengthRegulator: the "
                        "dataset's annotations, or in-step monotonic "
                        "alignment search (VISinger/models.py:590-604; "
                        "Pallas maximum_path on TPU) for corpora without "
                        "duration labels")
    p.add_argument("--disc-lr-scale", type=float, default=1.0,
                   help="discriminator LR multiplier (GAN balance knob)")
    p.add_argument("--c-kl-rev", type=float, default=None,
                   help="reverse-KL weight (default TrainConfig.c_kl_rev)")
    p.add_argument("--c-adv", type=float, default=None,
                   help="adversarial weight; 0 = pure-regression phase "
                        "(skips the discriminator update)")
    p.add_argument("--c-fm", type=float, default=None,
                   help="feature-matching weight")
    p.add_argument("--c-stft", type=float, default=None,
                   help="multi-resolution STFT loss weight (full-band "
                        "magnitude pressure to Nyquist; counters upsampler "
                        "imaging the 7600 Hz-capped mel loss can't see). "
                        "0/None = off (reference recipe parity)")
    p.add_argument("--c-energy", type=float, default=None,
                   help="squared log-RMS-ratio loudness weight (default "
                        "TrainConfig.c_energy = 10; fixes the recipe's "
                        "-6 dB convergence — round-4 rms_ratio 0.505). "
                        "0 = off (strict VITS-recipe parity)")
    p.add_argument("--c-spec", type=float, default=None,
                   help="AE spec_predict L1 weight (default = c_mel); set "
                        "low to focus gradient on the vocoder once the "
                        "frame-prior has converged")
    p.add_argument("--c-mel", type=float, default=None,
                   help="mel-reconstruction weight (default TrainConfig"
                        ".c_mel = 45, the reference's c_mel)")
    p.add_argument("--lr", type=float, default=None,
                   help="initial learning rate (default TrainConfig"
                        ".learning_rate = 2e-4); lower for polish finetunes")
    p.add_argument("--warmup-steps", type=int, default=200,
                   help="linear LR warmup steps (0 disables) — protects "
                        "the decoder from the huge random-init KL "
                        "transient (saturated-tanh lockup)")
    p.add_argument("--grad-clip-norm", type=float, default=None,
                   help="global-norm gradient clip (default TrainConfig"
                        ".grad_clip_norm = 100)")
    p.add_argument("--log-images", action="store_true",
                   help="write spectrogram heatmaps (predicted vs target) "
                        "with each metrics log (TB + PNGs under "
                        "<ckpt-dir>/logs/images)")
    p.add_argument("--c-dc", type=float, default=None,
                   help="DC-drift penalty weight on generated segments "
                        "(default TrainConfig.c_dc; guards the output tanh "
                        "against the DC-rail saturation death state)")
    p.add_argument("--disc-loss-floor", type=float, default=None,
                   help="pause discriminator updates while loss_disc is "
                        "below this value (D has decisively won); 0 = off")
    p.add_argument("--disc-input-noise", type=float, default=None,
                   help="instance-noise sigma added to both real and fake "
                        "discriminator inputs (keeps the disc game alive on "
                        "synthetically clean corpora)")
    p.add_argument("--nsf", action="store_true",
                   help="NSF harmonic excitation: condition the vocoder on "
                        "a sample-rate sine source at the target F0 "
                        "(models/svs/excitation.py) — fixes the plain "
                        "decoder's inability to phase-track held notes")
    p.add_argument("--decoder", default="hifigan",
                   choices=["hifigan", "istft", "mb_istft"],
                   help="vocoder decoder family (istft variants trade the "
                        "highest-rate conv stages for an inverse STFT; "
                        "models/svs/istft.py)")
    p.add_argument("--f0-residual", action="store_true",
                   help="residual F0 head: the (zero-initialized) predictor "
                        "output is a deviation added to the score note's "
                        "log-F0 instead of an absolute log-F0 — starts on "
                        "pitch, learns only expressive deviation "
                        "(SVSConfig.f0_residual)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host DCN; each "
                        "host runs this same command). --batch-size is "
                        "PER HOST; the global batch is nprocs x batch-size")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="explicit jax.distributed coordinator (defaults to "
                        "auto-detection from the cluster environment)")
    p.add_argument("--nprocs", type=int, default=None,
                   help="explicit process count for --coordinator")
    p.add_argument("--proc-id", type=int, default=None,
                   help="explicit process index for --coordinator")
    args = p.parse_args(argv)

    import jax
    if args.multihost:
        if args.coordinator:
            jax.distributed.initialize(coordinator_address=args.coordinator,
                                       num_processes=args.nprocs,
                                       process_id=args.proc_id)
        else:
            jax.distributed.initialize()
        print(f"process {jax.process_index()}/{jax.process_count()}")
    proc0 = jax.process_index() == 0

    from ..parallel import (batch_sharding, make_hybrid_mesh, make_mesh,
                            put_global_batch, shard_params)
    from . import (TrainConfig, build_svs_config, create_states,
                   make_train_step, restore_checkpoint, save_checkpoint,
                   synthetic_batch, tool_shapes)

    try:
        svs_cfg = build_svs_config(tiny=args.tiny, decoder=args.decoder,
                                   nsf=args.nsf,
                                   f0_residual=args.f0_residual)
    except ValueError as e:
        p.error(str(e))
    t_phones, t_frames = tool_shapes(args.tiny)

    tcfg = TrainConfig(accumulate_grad_batches=args.accumulate_grad_batches,
                       bf16_run=args.bf16, use_mas=args.durations == "mas",
                       disc_lr_scale=args.disc_lr_scale,
                       log_images=args.log_images)
    import dataclasses as _dc
    for field, val in (("c_kl_rev", args.c_kl_rev), ("c_adv", args.c_adv),
                       ("c_fm", args.c_fm), ("c_mel", args.c_mel),
                       ("c_stft", args.c_stft),
                       ("c_energy", args.c_energy),
                       ("c_spec", args.c_spec), ("learning_rate", args.lr),
                       ("warmup_steps", args.warmup_steps),
                       ("grad_clip_norm", args.grad_clip_norm),
                       ("c_dc", args.c_dc),
                       ("disc_loss_floor", args.disc_loss_floor),
                       ("disc_input_noise", args.disc_input_noise)):
        if val is not None:
            tcfg = _dc.replace(tcfg, **{field: val})
    n_dev = len(jax.devices())
    n_model = args.n_model
    if jax.process_count() > 1:
        # DP across hosts (DCN), TP inside a host (ICI)
        mesh = make_hybrid_mesh(n_model=n_model)
    else:
        n_data = max(n_dev // n_model, 1)
        mesh = make_mesh(n_data=n_data, n_model=n_model,
                         devices=jax.devices()[: n_data * n_model])
    if proc0:
        print(f"mesh: {dict(mesh.shape)} over {n_dev} devices")

    dataset = None
    # each host samples a DIFFERENT stream (seed offset by process index);
    # the global batch is the concatenation over hosts (put_global_batch)
    ds_seed = jax.process_index()
    if args.packed:
        from .dataset import PackedDataset
        dataset = PackedDataset(args.packed, svs_cfg, t_phones=t_phones,
                                t_frames=t_frames, seed=ds_seed)
        if proc0:
            print(f"dataset: {len(dataset)} utterances from "
                  f"{args.packed}.data")
    elif args.data_dir:
        from .dataset import NpyDataset
        dataset = NpyDataset(args.data_dir, svs_cfg, t_phones=t_phones,
                             t_frames=t_frames, seed=ds_seed)
        if proc0:
            print(f"dataset: {len(dataset)} utterances from {args.data_dir}")
    if dataset is not None:
        # the reference decays LR once per EPOCH (ExponentialLR +
        # configs/ours.json lr_decay); derive epoch length from the dataset
        import dataclasses as _dc
        tcfg = _dc.replace(tcfg, steps_per_epoch=max(
            1, len(dataset) // args.batch_size))

    def next_batch(step):
        if dataset is not None:
            return dataset.batch(args.batch_size)
        return synthetic_batch(svs_cfg, batch=args.batch_size,
                               t_phones=t_phones, t_frames=t_frames,
                               seed=step * jax.process_count()
                               + jax.process_index())

    batch = next_batch(0)
    gen_state, disc_state, gen, disc = create_states(svs_cfg, tcfg, batch)
    start_step = 0
    if args.resume:
        gen_state, disc_state = restore_checkpoint(args.resume, gen_state,
                                                   disc_state)
        # the loop counter below restarts at 0 (--steps means ADDITIONAL
        # steps); offset checkpoint/metric step numbers by the restored
        # optimizer step so a same-dir resume extends the run instead of
        # overwriting its earlier checkpoints
        start_step = int(gen_state.step)
        print(f"resumed from {args.resume} at step {start_step}")

    train_step = make_train_step(gen, disc, svs_cfg, tcfg)
    rng = jax.random.PRNGKey(tcfg.seed)
    from .metrics import MetricsWriter
    # one metrics file per run; in multihost the losses are globally
    # replicated scalars, so only process 0 writes them
    metrics_writer = (MetricsWriter(os.path.join(args.ckpt_dir, "logs"))
                      if proc0 else None)

    with mesh:
        bs = batch_sharding(mesh)
        gen_state = gen_state.replace(params=shard_params(gen_state.params, mesh))
        disc_state = disc_state.replace(params=shard_params(disc_state.params, mesh))
        step_fn = jax.jit(train_step, donate_argnums=(0, 1))

        def transfer(b):
            return put_global_batch(b, bs)

        feed = None
        if args.prefetch > 0:
            from ..runtime import Prefetcher
            feed = Prefetcher(next_batch, args.steps, depth=args.prefetch,
                              transfer=transfer)
            batches = iter(feed)
        else:
            batches = ((s, transfer(next_batch(s)))
                       for s in range(args.steps))

        t0 = time.time()
        metrics = None
        try:
            for step, batch in batches:
                rng, sub = jax.random.split(rng)
                gen_state, disc_state, metrics = step_fn(gen_state, disc_state,
                                                         batch, sub)
                if step % args.log_every == 0:
                    m = {k: round(float(v), 4) for k, v in metrics.items()
                         if getattr(v, "ndim", 0) == 0}
                    dt = time.time() - t0
                    print(f"step {start_step + step} ({dt:.1f}s): {m}")
                    if metrics_writer is not None:
                        metrics_writer.write(start_step + step, metrics)
                if args.ckpt_every and step and step % args.ckpt_every == 0:
                    save_checkpoint(os.path.abspath(args.ckpt_dir), gen_state,
                                    disc_state, start_step + step,
                                    keep_last=args.keep_last,
                                    metric=float(metrics["loss_mel"]))
        finally:
            if feed is not None:  # stop the producer on consumer error too
                feed.close()
        save_checkpoint(os.path.abspath(args.ckpt_dir), gen_state, disc_state,
                        start_step + args.steps, keep_last=args.keep_last,
                        metric=(float(metrics["loss_mel"])
                                if metrics is not None else None))
        total = time.time() - t0
        print(f"done: {args.steps} steps in {total:.1f}s "
              f"({args.steps * args.batch_size / total:.2f} samples/s)")


if __name__ == "__main__":
    main()
