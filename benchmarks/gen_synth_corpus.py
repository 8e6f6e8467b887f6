"""Pre-generate a synthetic record-store corpus for loop-level benchmarks.

run_ted's `--data synthetic` regenerates the clip corpus on every
invocation, which is fine at the default 3 videos but costs minutes at the
~100 videos needed to fill batch-256 epochs (VERDICT r3 item 2). This
writes the exact same artifact once — synthetic.make_source_clips through
the real offline DataPreprocessor (windowing, motion filters, dir-vec
normalization; reference data_preprocessor.py semantics) — into a
record-store directory usable via `run_ted --data <out>/train
--val-data <out>/val`.

Usage: python benchmarks/gen_synth_corpus.py --out /tmp/corpus
       [--videos 100] [--clip-seconds 20] [--seed 0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# corpus generation is pure host work; never touch the TPU tunnel
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--videos", type=int, default=100)
    p.add_argument("--val-videos", type=int, default=4)
    p.add_argument("--clip-seconds", type=float, default=20.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset", default="TED", choices=("TED", "expressive"))
    a = p.parse_args()

    from hop_tpu.config import expressive_config, ted_config
    from hop_tpu.data import synthetic
    from hop_tpu.data.preprocessor import DataPreprocessor

    cfg = ted_config() if a.dataset == "TED" else expressive_config()

    t0 = time.time()
    videos = synthetic.make_source_clips(
        cfg, n_videos=a.videos, clip_seconds=a.clip_seconds, seed=a.seed)
    print(f"made {len(videos)} source videos in {time.time() - t0:.1f}s",
          flush=True)

    os.makedirs(a.out, exist_ok=True)
    for split, vids in (("train", videos), ("val", videos[:a.val_videos])):
        t1 = time.time()
        out = os.path.join(a.out, split)
        n = DataPreprocessor(cfg.data, out).run(vids)
        print(f"{split}: {n} window samples -> {out} "
              f"({time.time() - t1:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
