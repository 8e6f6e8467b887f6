"""Convert the reference's TED LMDB datasets into the record store.

Bridges real data into this framework: reads the reference's *source*
LMDB (one value per video: {'vid', 'clips': [{skeletons_3d, audio_raw,
audio_feat, words, start/end...}]}, reference data_preprocessor.py:46-80),
feeds each clip through our DataPreprocessor, and writes <out>.bin/.idx.

Gated on optional deps: `lmdb` for the store and a deserializer for the
values. The reference used the long-removed pyarrow.serialize format
(data_preprocessor.py:172); values in that format need `pyarrow<2` or a
re-export to pickle/msgpack upstream — pass --format to match.

Usage:
  python -m hop_tpu.data.import_ted --src data/ted_dataset/lmdb_train \
      --out /data/records/train --dataset TED [--format pickle]
"""

from __future__ import annotations

import argparse
import logging
import sys


def _load_value(raw: bytes, fmt: str):
    if fmt == "pickle":
        import pickle
        return pickle.loads(raw)
    if fmt == "pyarrow":
        import pyarrow  # the legacy serialize API needs pyarrow < 2.0
        if not hasattr(pyarrow, "deserialize"):
            raise RuntimeError(
                "this pyarrow lacks the legacy deserialize(); re-export the "
                "LMDB values to pickle or install pyarrow<2")
        return pyarrow.deserialize(raw)
    raise ValueError(fmt)


def iter_source_videos(src_path: str, fmt: str):
    import lmdb
    from hop_tpu.data.preprocessor import SourceClip

    env = lmdb.open(src_path, readonly=True, lock=False)
    with env.begin(write=False) as txn:
        for _, value in txn.cursor():
            video = _load_value(value, fmt)
            clips = [SourceClip(
                vid=video["vid"],
                skeletons_3d=c["skeletons_3d"],
                audio_raw=c["audio_raw"],
                audio_spectrogram=c["audio_feat"],
                words=c["words"],
                start_frame_no=c["start_frame_no"],
                end_frame_no=c["end_frame_no"],
                start_time=c["start_time"],
                end_time=c["end_time"],
            ) for c in video["clips"]]
            yield video["vid"], clips
    env.close()


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--dataset", default="TED",
                   choices=("TED", "TED_expressive"))
    p.add_argument("--format", default="pickle",
                   choices=("pickle", "pyarrow"))
    p.add_argument("--truncate-videos-frac", type=float, default=1.0,
                   help="0.5 reproduces the reference TED preprocessor's "
                        "first-half-of-videos quirk")
    p.add_argument("--disable-filtering", action="store_true")
    args = p.parse_args(argv)

    try:
        import lmdb  # noqa: F401
    except ImportError:
        print("lmdb is not installed in this environment; run this where "
              "the reference data lives", file=sys.stderr)
        return 2

    import dataclasses
    from hop_tpu.config import ted_config, expressive_config
    from hop_tpu.data.preprocessor import DataPreprocessor

    cfg = (ted_config() if args.dataset == "TED" else expressive_config())
    data_cfg = dataclasses.replace(
        cfg.data, truncate_videos_frac=args.truncate_videos_frac)
    pre = DataPreprocessor(data_cfg, args.out,
                           disable_filtering=args.disable_filtering)
    n = pre.run(iter_source_videos(args.src, args.format))
    logging.info("wrote %d samples to %s", n, args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
