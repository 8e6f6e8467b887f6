"""3D skeleton video rendering (host-side, non-performance path).

Counterpart of reference convert.py:118-220 / utils/train_utils_expressive.py
:62-168: side-by-side matplotlib 3D animation of generated vs ground-truth
poses, optional ffmpeg audio mux.
"""

from __future__ import annotations

import shutil
import subprocess
import time
from pathlib import Path
from typing import Optional

import numpy as np

from hop_tpu import geometry


def _plot_skeleton(ax, pose, skeleton, title):
    """One frame, matching convert.py:152-177: y/z swapped into the plot
    axes, mirrored y/z limits, per-bone linewidth 5, blank axis labels."""
    ax.clear()
    for p, c, _ in skeleton.pairs:
        ax.plot([pose[p, 0], pose[c, 0]],
                [pose[p, 2], pose[c, 2]],
                [pose[p, 1], pose[c, 1]], zdir="z", linewidth=5)
    ax.set_xlim3d(-0.5, 0.5)
    ax.set_ylim3d(0.5, -0.5)
    ax.set_zlim3d(0.5, -0.5)
    ax.set_xlabel("")
    ax.set_ylabel("")
    ax.set_zlabel("")
    ax.set_title(title)


def create_video_and_save(save_path: str, iter_idx, prefix: str,
                          target_dir_vec: Optional[np.ndarray],
                          output_dir_vec: np.ndarray,
                          mean_dir_vec: np.ndarray,
                          title: str,
                          skeleton: geometry.Skeleton = geometry.TED_SKELETON,
                          audio: Optional[np.ndarray] = None,
                          sample_rate: int = 16000,
                          clipping_to_shortest_stream: bool = False,
                          fps: int = 15) -> str:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    start = time.time()
    mean = np.asarray(mean_dir_vec).reshape(-1)
    out_poses = np.asarray(geometry.convert_dir_vec_to_pose(
        output_dir_vec + mean, skeleton))
    tgt_poses = None
    if target_dir_vec is not None:
        tgt_poses = np.asarray(geometry.convert_dir_vec_to_pose(
            target_dir_vec + mean, skeleton))

    from textwrap import wrap
    fig = plt.figure(figsize=(8, 4))
    # human (target) left, generated right, elev 20 / azim -60
    # (convert.py:123-126, 145-148)
    axes = [fig.add_subplot(1, 2, 1, projection="3d"),
            fig.add_subplot(1, 2, 2, projection="3d")]
    for ax in axes:
        ax.view_init(elev=20, azim=-60)
    fig.suptitle("\n".join(wrap(title, 75)), fontsize="medium")

    n = len(out_poses)

    def animate(i):
        if tgt_poses is not None and i < len(tgt_poses):
            _plot_skeleton(axes[0], tgt_poses[i], skeleton,
                           f"human ({i + 1}/{n})")
        _plot_skeleton(axes[1], out_poses[i], skeleton,
                       f"generated ({i + 1}/{n})")

    ani = animation.FuncAnimation(fig, animate, frames=len(out_poses))
    Path(save_path).mkdir(parents=True, exist_ok=True)
    have_ffmpeg = shutil.which("ffmpeg") is not None
    ext = "mp4" if have_ffmpeg else "gif"  # PillowWriter fallback
    video_path = str(Path(save_path) /
                     f"temp_{prefix}_{iter_idx}.{ext}")
    if have_ffmpeg:
        ani.save(video_path, fps=fps, dpi=80)
    else:
        ani.save(video_path, dpi=80,
                 writer=animation.PillowWriter(fps=fps))
    plt.close(fig)

    final_path = str(Path(save_path) / f"{prefix}_{iter_idx}.{ext}")
    if audio is not None and not have_ffmpeg:
        # still persist the audio next to the silent animation
        _write_wav(str(Path(save_path) / f"{prefix}_{iter_idx}.wav"),
                   np.asarray(audio), sample_rate)
        Path(video_path).rename(final_path)
    elif audio is not None:
        audio_path = str(Path(save_path) / f"{prefix}_{iter_idx}.wav")
        _write_wav(audio_path, np.asarray(audio), sample_rate)
        cmd = ["ffmpeg", "-loglevel", "panic", "-y", "-i", video_path,
               "-i", audio_path, "-strict", "-2", final_path]
        if clipping_to_shortest_stream:
            cmd.insert(-1, "-shortest")
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            Path(video_path).unlink(missing_ok=True)
        except Exception:
            final_path = video_path
    else:
        Path(video_path).rename(final_path)

    print(f"rendered video in {time.time() - start:.1f}s: {final_path}")
    return final_path


def _write_wav(path: str, audio: np.ndarray, sr: int):
    """Minimal PCM16 WAV writer (no soundfile dependency)."""
    import struct
    import wave
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
