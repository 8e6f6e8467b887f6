"""Inference / demo entry point (reference test_checkpoint.py).

Loads a trained HOP checkpoint, pulls a clip (synthetic here unless a record
store is given), synthesises long-form gestures by sliding 34-frame windows
with 16-frame feedback + 4-frame cross-fade, renders a video, and runs the
full validation metrics.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from hop_tpu.config import ted_config, expressive_config
from hop_tpu.cli import common as C
from hop_tpu.data import synthetic
from hop_tpu.infer import generate_long_form


def main(argv=None):
    p = argparse.ArgumentParser("HOP-TPU inference demo")
    p.add_argument("--checkpoint-dir", default="./checkpoints")
    p.add_argument("--dataset", default="TED",
                   choices=("TED", "TED_expressive"))
    p.add_argument("--data", default="synthetic",
                   help="'synthetic' or a source-LMDB path (the reference "
                        "pulls a raw clip from the test LMDB, "
                        "test_checkpoint.py:325-349); readable without the "
                        "lmdb package via data/lmdbfile.py")
    p.add_argument("--clip-index", type=int, default=0,
                   help="which clip of --data to synthesise (reference used "
                        "a fixed key)")
    p.add_argument("--out", default="./output")
    p.add_argument("--render-video", action="store_true")
    p.add_argument("--evaluate", action="store_true",
                   help="after generation, run the full validation metrics "
                        "(L1/MAE/FGD/BC/diversity) like the reference's "
                        "test_checkpoint.py:526-545")
    p.add_argument("--eval-net", default=None,
                   help=".npz with the frozen FGD feature-net params for "
                        "--evaluate (the reference's demo evaluates with "
                        "the trained net, test_checkpoint.py:526-545; "
                        "random init is used — and loudly labeled — when "
                        "absent)")
    p.add_argument("--vid", type=int, default=None,
                   help="speaker id for synthesis; default draws one from "
                        "the trained speaker model like the reference "
                        "(random.randrange(model.z_obj.n_words), "
                        "test_checkpoint.py:387)")
    p.add_argument("--use-hf-token-stream", action="store_true",
                   help="drive the LLM with WordPiece token ids (requires "
                        "--hf-vocab; reference test_checkpoint.py:438-446)")
    p.add_argument("--hf-vocab", default=None,
                   help="WordPiece vocab.txt for --use-hf-token-stream")
    p.add_argument("--seed", type=int, default=2021)
    args = p.parse_args(argv)
    tokenizer = C.make_tokenizer(args)

    cfg = ted_config() if args.dataset == "TED" else expressive_config()
    if args.use_hf_token_stream:
        import dataclasses
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, use_hf_token_stream=True))
    skel = cfg.data.skeleton

    if args.data == "synthetic":
        # one long synthetic clip + a vocabulary over its words
        videos = synthetic.make_source_clips(cfg, n_videos=1,
                                             clip_seconds=20.0,
                                             seed=args.seed)
        clip = videos[0][1][0]
    else:
        # real clip from a source LMDB (reference test_checkpoint.py:325-349
        # fetches one raw test clip and synthesises over its full length);
        # stop deserialising as soon as the requested clip is reached —
        # real LMDBs are multi-GB
        from hop_tpu.data.import_ted import iter_source_videos
        clip, videos, n_seen = None, [], 0
        for vid, cs in iter_source_videos(args.data):
            videos.append((vid, cs))
            if clip is None and args.clip_index < n_seen + len(cs):
                clip = cs[args.clip_index - n_seen]
                break
            n_seen += len(cs)
        if clip is None:
            raise SystemExit(f"--clip-index {args.clip_index} out of range "
                             f"({n_seen} clips in {args.data})")
        print(f"clip {args.clip_index} vid={clip.vid} "
              f"({clip.end_time - clip.start_time:.1f}s, "
              f"{len(clip.words)} words)")
    from hop_tpu.data.vocab import build_vocab
    lang = build_vocab("words", [clip.words], None, None,
                       cfg.data.wordembed_dim)

    cfg, model, variables, n_speakers = C.restore_hop_model(
        cfg, args.checkpoint_dir, allow_random_init=True)

    # seed pose: resampled ground truth start, converted to dir-vec space
    from hop_tpu import geometry
    skeletons = geometry.resample_pose_seq(
        clip.skeletons_3d, clip.end_time - clip.start_time,
        cfg.data.pose_resampling_fps)
    seed_vec = np.asarray(geometry.convert_pose_seq_to_dir_vec(
        skeletons[:cfg.data.n_seed_frames], skel)).reshape(
        cfg.data.n_seed_frames, -1)
    if skel.mean_dir_vec is not None:
        seed_vec = seed_vec - skel.mean_dir_vec

    # pass the variables as a runtime argument — closing over them would
    # bake ~500MB of weights into the HLO as constants (the tunneled
    # remote-compile service rejects such payloads)
    @jax.jit
    def _fwd(v, in_audio, log_mel, text, pre_seq, vid, rng):
        out, *_ = model.apply(v, in_audio, log_mel, text, pre_seq,
                              vid, rng=rng, train=False)
        return out

    def forward(in_audio, log_mel, text, pre_seq, vid, rng):
        return _fwd(variables, in_audio, log_mel, text, pre_seq, vid, rng)

    # speaker: explicit --vid, else drawn from the trained speaker model
    # like the reference (random.randrange(model.z_obj.n_words),
    # test_checkpoint.py:387)
    import random as _random
    vid_index = (args.vid if args.vid is not None
                 else _random.Random(args.seed).randrange(n_speakers))
    print(f"vid: {vid_index}")
    out_dir_vec = generate_long_form(
        cfg, forward, clip.audio_raw, clip.words, seed_vec, lang,
        vid_index=vid_index, tokenizer=tokenizer,
        rng=jax.random.PRNGKey(args.seed))
    print(f"generated {out_dir_vec.shape[0]} frames "
          f"({out_dir_vec.shape[0] / cfg.data.pose_resampling_fps:.1f}s)")

    np.save(f"{args.out}_dir_vec.npy", out_dir_vec)

    if args.evaluate:
        from hop_tpu.data.dataset import SpeechMotionDataset
        from hop_tpu.data.preprocessor import DataPreprocessor
        from hop_tpu.eval.evaluate import evaluate_testset
        import tempfile
        tmp = tempfile.mkdtemp(prefix="hop_eval_")
        DataPreprocessor(cfg.data, tmp + "/val").run(videos)
        val_ds = SpeechMotionDataset(tmp + "/val", cfg.data,
                                     tokenizer=tokenizer)
        val_ds.set_lang_model(lang)
        evaluator = C.make_fgd_evaluator(cfg, lang.n_words, args.eval_net)

        def gen(batch, vids, rng_step):
            return forward(batch["in_audio"], batch["log_mel"],
                           batch["text_padded"], batch["target_vec"][
                               :, :cfg.data.n_seed_frames], vids, rng_step)

        batches = (C.device_batch(b, cfg)
                   for b in val_ds.batches(min(8, len(val_ds)),
                                           shuffle=False, drop_last=False))
        result = evaluate_testset(
            batches, gen, evaluator, epoch=cfg.loss.bc_start_epoch + 1,
            cfg=cfg, n_speakers=n_speakers, rng=jax.random.PRNGKey(7))
        print(str(result))

    if args.render_video:
        from hop_tpu.utils.render import create_video_and_save
        create_video_and_save(
            args.out, 0, "demo", None, out_dir_vec,
            skel.mean_dir_vec if skel.mean_dir_vec is not None
            else np.zeros(cfg.data.pose_dim), title="HOP-TPU demo",
            skeleton=skel, audio=clip.audio_raw)
    return out_dir_vec


if __name__ == "__main__":
    main()
