"""Meters, checkpointing, logging, profiling."""

from hop_tpu.utils.meters import AverageMeter  # noqa: F401
