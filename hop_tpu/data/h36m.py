"""Human3.6M gesture-autoencoder dataset (FGD feature-net training data).

Counterpart of reference data_loader/h36m_loader.py:14-107: select 12 upper
-body joints, hip-center, swap/flip axes, frontalize on the hip direction,
drop hips, slice 34-frame windows at stride 10 with frame-stride 2, optional
Gaussian noise augmentation, and emit (poses, mean-centred dir-vecs).
"""

from __future__ import annotations

import math
import random
from typing import Optional

import numpy as np

from hop_tpu import geometry

TRAIN_SUBJECTS = ["S1", "S5", "S6", "S7", "S8"]
TEST_SUBJECTS = ["S9", "S11"]
TARGET_JOINTS = [1, 6, 12, 13, 14, 15, 17, 18, 19, 25, 26, 27]


def rotation_matrix(axis, theta):
    axis = np.asarray(axis, float)
    axis = axis / math.sqrt(np.dot(axis, axis))
    a = math.cos(theta / 2.0)
    b, c, d = -axis * math.sin(theta / 2.0)
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    bc, ad, ac, ab, bd, cd = b * c, a * d, a * c, a * b, b * d, c * d
    return np.array([[aa + bb - cc - dd, 2 * (bc + ad), 2 * (bd - ac)],
                     [2 * (bc - ad), aa + cc - bb - dd, 2 * (cd + ab)],
                     [2 * (bd + ac), 2 * (cd - ab), aa + dd - bb - cc]])


def normalize_h36m(data: np.ndarray) -> np.ndarray:
    """(frames, 12, 3) raw -> hip-centered, axis-fixed, frontalized, hips
    dropped -> (frames, 10, 3)."""
    data = np.array(data, float)
    for f in range(data.shape[0]):
        data[f] -= data[f, 2]
        data[f] = data[f][:, (0, 2, 1)]
        data[f, :, 1] = -data[f, :, 1]
    for f in range(data.shape[0]):
        hip_vec = data[f, 1] - data[f, 0]
        angle = np.pi - math.atan2(hip_vec[2], hip_vec[0])
        if 180 < np.rad2deg(angle) < 360:
            angle -= np.deg2rad(360)
        data[f] = data[f] @ rotation_matrix([0, 1, 0], angle)
    return data[:, 2:]


class Human36M:
    def __init__(self, positions_3d: dict, mean_dir_vec: np.ndarray,
                 is_train: bool = True, augment: bool = False,
                 n_poses: int = 34, frame_stride: int = 2,
                 window_stride: int = 10,
                 skeleton: geometry.Skeleton = geometry.TED_SKELETON,
                 seed: int = 0):
        """positions_3d: {subject: {action: (frames, 32, 3)}} (the npz
        payload of the reference's data file)."""
        self.mean_dir_vec = np.asarray(mean_dir_vec, np.float32).reshape(-1)
        self.augment = augment
        self.skeleton = skeleton
        self._rng = random.Random(seed)
        self._np_rng = np.random.default_rng(seed)
        subjects = TRAIN_SUBJECTS if is_train else TEST_SUBJECTS
        self.data = []
        for subject, actions in positions_3d.items():
            if subject not in subjects:
                continue
            for _, positions in actions.items():
                positions = positions[:, TARGET_JOINTS]
                positions = normalize_h36m(positions)
                for f in range(0, len(positions), window_stride):
                    end = f + n_poses * frame_stride
                    if end > len(positions):
                        break
                    self.data.append(positions[f:end:frame_stride])

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index: int):
        poses = self.data[index]
        dir_vec = np.asarray(geometry.convert_pose_seq_to_dir_vec(
            poses, self.skeleton))
        poses = np.asarray(geometry.convert_dir_vec_to_pose(
            dir_vec, self.skeleton))
        if self.augment:
            sigma2 = 0.002 if self._rng.random() < 0.2 else 0.0001
            poses = poses + self._np_rng.normal(0, sigma2 ** 0.5, poses.shape)
        dir_vec = np.asarray(geometry.convert_pose_seq_to_dir_vec(
            poses, self.skeleton)).reshape(poses.shape[0], -1)
        dir_vec = dir_vec - self.mean_dir_vec
        return poses.astype(np.float32), dir_vec.astype(np.float32)
