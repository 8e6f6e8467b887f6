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


def dry_import(src_path: str, src_kind: str, data_cfg, fmt: str = "auto"):
    """Fast-fail validation of a user-supplied LMDB: parse the environment
    header, count entries, decode ONE value and check its schema — without
    running the full (hours-long on real TED data) import. Returns a
    summary dict; raises with a pointed message on mismatch."""
    from hop_tpu.data.lmdbfile import LmdbReader

    reader = LmdbReader(src_path)
    n_entries = 0
    first = None
    for key, value in reader.items():
        if first is None:
            first = (key, value)
        n_entries += 1
    if first is None:
        raise ValueError(f"{src_path}: LMDB opens but contains no entries")
    key, value = first
    decoded = load_value(value, fmt)
    summary = {"path": src_path, "entries": n_entries,
               "first_key": key.decode("latin1"),
               "value_bytes": len(value)}
    if src_kind == "cache":
        if not (isinstance(decoded, (list, tuple)) and len(decoded) == 6):
            raise ValueError(
                f"{src_path}: first value is {type(decoded).__name__} of "
                f"length {len(decoded) if hasattr(decoded, '__len__') else '?'}"
                " — a reference cache LMDB holds 6-element samples "
                "[words, poses, vec, audio, spectrogram, aux] "
                "(data_preprocessor.py:168-172); is this a SOURCE lmdb? "
                "(drop --src-kind cache)")
        words, poses, vec, audio, spec, aux = decoded
        poses = np.asarray(poses)
        want = int(round(data_cfg.n_poses * 1.25))
        if poses.ndim < 2 or poses.shape[0] != want:
            raise ValueError(
                f"{src_path}: sample has {poses.shape} pose frames, schema "
                f"expects {want} extended frames — wrong --dataset preset?")
        summary.update(n_frames=int(poses.shape[0]),
                       pose_shape=tuple(poses.shape),
                       audio_len=int(np.asarray(audio).shape[0]),
                       vid=aux.get("vid"))
    else:
        if not (isinstance(decoded, dict) and "clips" in decoded):
            raise ValueError(
                f"{src_path}: first value is not a video dict with 'clips' "
                "(data_preprocessor.py:46-50) — is this a preprocessed "
                "CACHE lmdb? (add --src-kind cache)")
        clips = decoded["clips"]
        need = ("skeletons_3d", "audio_raw", "words", "start_time",
                "end_time")
        missing = [k for k in need if clips and k not in clips[0]]
        if missing:
            raise ValueError(f"{src_path}: clip record lacks keys {missing}")
        summary.update(vid=decoded.get("vid"), n_clips=len(clips),
                       skeleton_shape=tuple(np.asarray(
                           clips[0]["skeletons_3d"]).shape) if clips else ())
        if clips:
            n_joints = np.asarray(clips[0]["skeletons_3d"]).shape[1]
            if n_joints != data_cfg.skeleton.n_joints:
                raise ValueError(
                    f"{src_path}: clips carry {n_joints} joints, --dataset "
                    f"preset expects {data_cfg.skeleton.n_joints} "
                    "(TED=10, TED_expressive=43)")
    return summary


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--dry-import", action="store_true",
                   help="validate the LMDB's header/first sample against "
                        "the --dataset schema and exit — the first real "
                        "import run fails fast instead of hours in")
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

    if args.dry_import:
        summary = dry_import(args.src, args.src_kind, data_cfg, args.format)
        print("dry-import ok:", " ".join(f"{k}={v}"
                                         for k, v in summary.items()))
        return 0
    if args.out is None:
        p.error("--out is required (unless --dry-import)")
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
