"""Camera controls — the interactive paths the reference wires but
leaves disabled (mouse orbit: kernel.cu:113-139; WASD fly:
kernel.cu:51-104), as pure pose-mutation functions.

Camera pose is a per-frame argument to the jitted renderer, so these
never trigger recompilation (Camera.cu:29-31 analog).
"""

from __future__ import annotations

import numpy as np

from ..core import transforms as T


def orbit(pose: np.ndarray, dx: float, dy: float, sensitivity: float = 0.001) -> np.ndarray:
    """Mouse-drag orbit: yaw += dx*s, pitch -= dy*s (kernel.cu:131-132)."""
    pose = np.asarray(pose, np.float32).copy()
    pose[3] += dx * sensitivity
    pose[4] -= dy * sensitivity
    return pose


def fly(pose: np.ndarray, forward: float = 0.0, right: float = 0.0, up: float = 0.0) -> np.ndarray:
    """WASD-style fly: move along the camera's local axes
    (kernel.cu:51-104: apply_lre(invert_lre(pose), step))."""
    pose = np.asarray(pose, np.float32).copy()
    step = np.array([right, forward, up], np.float32)
    new_pos = np.asarray(T.apply_lre(T.invert_lre(pose), step))
    pose[0:3] = new_pos
    return pose


def fly_through(
    start_pose: np.ndarray,
    frames: int,
    forward_per_frame: float = 0.05,
    yaw_per_frame: float = 0.005,
):
    """Generator of poses for an animated camera fly-through
    (BASELINE config 5's animated camera)."""
    pose = np.asarray(start_pose, np.float32).copy()
    for _ in range(frames):
        pose = fly(pose, forward=forward_per_frame)
        pose[3] += yaw_per_frame
        yield pose.copy()
