"""JSONL metric stream -> TensorBoard / CSV adapters."""

import json
import os

from hop_tpu.utils.metrics_export import export_csv, export_tensorboard
from hop_tpu.train.loops import MetricWriter


def _write_stream(path):
    w = MetricWriter(str(path))
    for e in range(3):
        w.scalar("val_frechet_dist/val", 10.0 - e, e)
        w.scalar("BC/val", 0.1 * e, e)
    w.close()


def test_csv_export(tmp_path):
    src = tmp_path / "m.jsonl"
    _write_stream(src)
    out = str(tmp_path / "m.csv")
    assert export_csv(str(src), out) == 3
    rows = open(out).read().splitlines()
    assert rows[0] == "step,val_frechet_dist/val,BC/val"
    assert rows[1].startswith("0,10.0,")


def test_tensorboard_export(tmp_path):
    src = tmp_path / "m.jsonl"
    _write_stream(src)
    logdir = str(tmp_path / "tb")
    n = export_tensorboard(str(src), logdir)
    assert n == 6
    assert any(f.startswith("events.") for f in os.listdir(logdir))


def test_live_mirror(tmp_path):
    logdir = str(tmp_path / "tb_live")
    w = MetricWriter(str(tmp_path / "m.jsonl"), tensorboard_dir=logdir)
    w.scalar("loss/val", 1.0, 0)
    w.close()
    assert any(f.startswith("events.") for f in os.listdir(logdir))
    assert json.loads(open(tmp_path / "m.jsonl").read())["name"] == "loss/val"
