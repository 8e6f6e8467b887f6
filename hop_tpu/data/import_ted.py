"""Convert the reference's TED LMDB datasets into the record store.

Bridges real data into this framework with **no external dependencies**:
LMDB environments are parsed directly from disk (`lmdbfile.LmdbReader`)
and values in the long-removed ``pyarrow.serialize`` format are decoded
by `arrow_legacy.deserialize` (pickled values are auto-detected too).

Two source kinds:

- ``--src-kind source`` (default): the reference's *source* LMDB — one
  value per video, ``{'vid', 'clips': [{skeletons_3d, audio_raw,
  audio_feat, words, start/end ...}]}`` (reference data_preprocessor.py:
  46-80). Each clip runs through our DataPreprocessor (windowing, motion
  filters, dir-vec normalisation) into ``<out>.bin/.idx``.
- ``--src-kind cache``: the reference's *preprocessed* ``*_cache`` LMDB —
  one value per window sample, ``[words, poses, normalized_dir_vec,
  audio, spectrogram, aux]`` (data_preprocessor.py:168-172). Samples are
  re-laid-out into the record store verbatim (no re-filtering), so an
  existing reference training cache imports bit-for-bit.

Usage:
  python -m hop_tpu.data.import_ted --src data/ted_dataset/lmdb_train \
      --out /data/records/train --dataset TED [--src-kind cache]
"""

from __future__ import annotations

import argparse
import logging

import numpy as np


def load_value(raw: bytes, fmt: str = "auto"):
    """Decode one LMDB value (legacy-pyarrow or pickle)."""
    if fmt == "pickle" or (fmt == "auto" and raw[:1] == b"\x80"):
        import pickle
        return pickle.loads(raw)
    from hop_tpu.data import arrow_legacy
    return arrow_legacy.deserialize(raw)


def iter_source_videos(src_path: str, fmt: str = "auto"):
    from hop_tpu.data.lmdbfile import LmdbReader
    from hop_tpu.data.preprocessor import SourceClip

    for _, value in LmdbReader(src_path).items():
        video = load_value(value, fmt)
        clips = [SourceClip(
            vid=video["vid"],
            skeletons_3d=np.asarray(c["skeletons_3d"]),
            audio_raw=np.asarray(c["audio_raw"]),
            audio_spectrogram=np.asarray(c["audio_feat"]),
            words=c["words"],
            start_frame_no=c["start_frame_no"],
            end_frame_no=c["end_frame_no"],
            start_time=c["start_time"],
            end_time=c["end_time"],
        ) for c in video["clips"]]
        yield video["vid"], clips


def import_cache(src_path: str, out_path: str, data_cfg, fmt: str = "auto",
                 strict: bool = True) -> int:
    """Reference preprocessed-cache LMDB -> record store, sample-for-sample
    (value layout data_preprocessor.py:168-172, consumed by
    lmdb_data_loader.py:117-124)."""
    from hop_tpu.data.lmdbfile import LmdbReader
    from hop_tpu.data.records import RecordWriter, schema_for

    skel = data_cfg.skeleton
    schema = schema_for(data_cfg.n_poses, data_cfg.pose_resampling_fps,
                        skel.n_joints, skel.n_bones, data_cfg.mel_bins)
    n = 0
    with RecordWriter(out_path, schema) as writer:
        for key, value in LmdbReader(src_path).items():
            words, poses, vec, audio, spec, aux = load_value(value, fmt)
            poses = np.asarray(poses, np.float32)
            vec = np.asarray(vec, np.float32).reshape(
                poses.shape[0], skel.n_bones, 3)
            if poses.shape[0] != schema.n_frames_ext:
                msg = (f"sample {key!r}: {poses.shape[0]} frames, schema "
                       f"expects {schema.n_frames_ext} — wrong --dataset?")
                if strict:
                    raise ValueError(msg)
                logging.warning("%s (skipped)", msg)
                continue
            writer.append(
                poses, vec,
                np.asarray(audio, np.float32),
                np.asarray(spec, np.float32),
                aux={"vid": aux["vid"],
                     "words": [list(w) for w in words],
                     "start_frame_no": int(aux["start_frame_no"]),
                     "end_frame_no": int(aux["end_frame_no"]),
                     "start_time": float(aux["start_time"]),
                     "end_time": float(aux["end_time"])})
            n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--dataset", default="TED",
                   choices=("TED", "TED_expressive"))
    p.add_argument("--src-kind", default="source",
                   choices=("source", "cache"))
    p.add_argument("--format", default="auto",
                   choices=("auto", "pickle", "pyarrow"))
    p.add_argument("--truncate-videos-frac", type=float, default=1.0,
                   help="0.5 reproduces the reference TED preprocessor's "
                        "first-half-of-videos quirk")
    p.add_argument("--disable-filtering", action="store_true")
    args = p.parse_args(argv)

    import dataclasses
    from hop_tpu.config import ted_config, expressive_config

    cfg = (ted_config() if args.dataset == "TED" else expressive_config())
    data_cfg = dataclasses.replace(
        cfg.data, truncate_videos_frac=args.truncate_videos_frac)

    if args.src_kind == "cache":
        n = import_cache(args.src, args.out, data_cfg, args.format,
                         strict=not args.disable_filtering)
    else:
        from hop_tpu.data.preprocessor import DataPreprocessor
        pre = DataPreprocessor(data_cfg, args.out,
                               disable_filtering=args.disable_filtering)
        n = pre.run(iter_source_videos(args.src, args.format))
    logging.info("wrote %d samples to %s", n, args.out)
    print(f"imported {n} samples -> {args.out}.bin/.idx")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
