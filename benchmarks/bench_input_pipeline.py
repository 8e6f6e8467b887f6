"""End-to-end input-pipeline throughput: record store -> device -> step.

bench.py measures compute only (a synthetic batch resident on device);
this harness measures the full training loop the CLIs actually run —
host batch assembly (C++ gather + numpy), host->device transfer,
on-device log-mel, and the HOP GAN step — and reports where the time
goes and whether the input path can starve the device at a given batch
size (reference comparison: its DataLoader workers recompute librosa mel
+ tokenizer per sample per epoch, lmdb_data_loader.py:216-218).

JAX's async dispatch overlaps the host work of batch N+1 with the device
execution of batch N, so steady-state steps/s ~ max(host, device) rather
than their sum; both are reported.

Note: over the tunneled single-chip dev setup the host->device copy
crosses the tunnel and is much slower than a direct-attached chip's DMA;
treat `device_put` here as an upper bound.

Usage:
  python benchmarks/bench_input_pipeline.py --data /path/records/train \
      [--batch-size 256] [--steps 30]
(--data synthetic fabricates a store first.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--data", default="synthetic")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hop_tpu.cli import common as C
    from hop_tpu.config import ted_config
    from hop_tpu.data import synthetic
    from hop_tpu.data.dataset import SpeechMotionDataset
    from hop_tpu.data.preprocessor import DataPreprocessor
    from hop_tpu.data.vocab import build_vocab
    from hop_tpu.models.hop import HOPModel
    from hop_tpu.models.multimodal_context import ConvDiscriminator
    from hop_tpu.train.llm import make_hop_train_steps

    cfg = ted_config()
    bs = args.batch_size

    if args.data == "synthetic":
        import tempfile
        tmp = tempfile.mkdtemp(prefix="hop_pipe_")
        videos = synthetic.make_source_clips(cfg, n_videos=8,
                                             clip_seconds=60.0,
                                             seed=args.seed)
        DataPreprocessor(cfg.data, tmp + "/train").run(videos)
        data_path = tmp + "/train"
    else:
        data_path = args.data

    ds = SpeechMotionDataset(data_path, cfg.data)
    lang = build_vocab("words", [[w for aux in ds._aux_cache
                                  for w in aux["words"]]],
                       None, None, cfg.data.wordembed_dim)
    ds.set_lang_model(lang)
    print(f"samples: {len(ds)}")
    if len(ds) < bs:
        raise SystemExit(f"need >= {bs} samples, have {len(ds)}")

    # --- stage timings on the host side -----------------------------------
    idx = np.arange(bs)
    for _ in range(2):
        hb = ds.make_batch(idx)              # warm the mmap
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        hb = ds.make_batch(idx)
    t_host = (time.perf_counter() - t0) / reps

    db = C.device_batch(hb, cfg)             # compile mel
    jax.block_until_ready(db["log_mel"])
    t0 = time.perf_counter()
    for _ in range(reps):
        db = C.device_batch(hb, cfg)
        jax.block_until_ready(db["log_mel"])
    t_put_mel = (time.perf_counter() - t0) / reps

    # --- full loop: host pipeline + GAN step, overlapped -------------------
    model = HOPModel(cfg, n_speakers=max(ds.speaker_model.n_words, 1))
    disc = ConvDiscriminator()
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    b = {k: db[k] for k in ("in_audio", "log_mel", "text_padded",
                            "target_vec", "vid_indices")}
    gen_vars = jax.jit(lambda r: model.init(
        rngs, b["in_audio"], b["log_mel"], b["text_padded"],
        b["target_vec"][:, :cfg.data.n_seed_frames], b["vid_indices"],
        rng=r, train=True))(jax.random.PRNGKey(2))
    dis_vars = jax.jit(lambda t: disc.init(rngs, t, train=True))(
        b["target_vec"])
    _, gan_step, init_state = make_hop_train_steps(cfg, model, disc)
    state = init_state(gen_vars, dis_vars)

    def step_once(state, db, key):
        sb = {k: db[k] for k in ("in_audio", "log_mel", "text_padded",
                                 "target_vec", "vid_indices")}
        return gan_step(state, sb, key)

    state, metrics = step_once(state, db, jax.random.PRNGKey(10))
    jax.block_until_ready(metrics["loss"])

    def run_epoch_loop(n_steps):
        nonlocal state
        rng = np.random.default_rng(args.seed)
        t0 = time.perf_counter()
        m = None
        done = 0
        while done < n_steps:
            order = rng.permutation(len(ds))
            for i in range(0, len(order) - bs + 1, bs):
                hb = ds.make_batch(order[i:i + bs])
                db = C.device_batch(hb, cfg)
                state, m = step_once(state, db,
                                     jax.random.PRNGKey(100 + done))
                done += 1
                if done >= n_steps:
                    break
        jax.block_until_ready(m["loss"])
        return (time.perf_counter() - t0) / n_steps

    t_loop = run_epoch_loop(args.steps)

    # compute-only reference: same step on a resident batch
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step_once(state, db, jax.random.PRNGKey(500 + i))
    jax.block_until_ready(m["loss"])
    t_compute = (time.perf_counter() - t0) / args.steps

    platform = jax.devices()[0].platform
    print(json.dumps({
        "metric": f"hop_ted_e2e_train_steps_per_sec_bs{bs}",
        "value": round(1.0 / t_loop, 4), "unit": "steps/s",
        "platform": platform,
        "detail": {
            "host_batch_assembly_ms": round(t_host * 1e3, 2),
            "device_put_plus_mel_ms": round(t_put_mel * 1e3, 2),
            "compute_only_step_ms": round(t_compute * 1e3, 2),
            "e2e_step_ms": round(t_loop * 1e3, 2),
            "input_bound": bool(t_loop > 1.15 * t_compute),
        }}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
