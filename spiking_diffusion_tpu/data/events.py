"""Event-stream (neuromorphic/DVS) utilities — ``spikingjelly/datasets/``
core functionality.

The reference vendors loaders for DVS128 Gesture, CIFAR10-DVS, N-MNIST,
SHD, etc., all built on two primitives: integrate an event stream
(t, x, y, p) into frame tensors either by a fixed number of frames or a
fixed time duration (``spikingjelly/datasets/__init__.py``
``integrate_events_by_fixed_frames_number`` /
``integrate_events_by_fixed_duration``). Those primitives are rebuilt here
as vectorized numpy (download-free; the event files themselves cannot be
fetched in this environment — point the AEDAT/NPZ parsing of a given
dataset at these integrators).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def integrate_events_to_frames(
    events: Dict[str, np.ndarray],
    H: int,
    W: int,
    num_frames: int,
    split_by: str = "time",
    use_native: bool = True,
) -> np.ndarray:
    """(t, x, y, p) event stream -> (num_frames, H, W, 2) count frames.

    ``split_by``: 'time' slices the recording into equal-duration bins;
    'number' into equal-event-count bins (parity with the reference's two
    integrators). Dispatches to the C++ kernel
    (:mod:`spiking_diffusion_tpu.native`) when available — np.add.at is a
    serial scatter and this is the per-sample hot loop of event datasets.
    """
    if use_native:
        from spiking_diffusion_tpu import native

        if native.available():
            return native.integrate_events_to_frames(
                events, H, W, num_frames, split_by
            )
    t = np.asarray(events["t"], np.int64)
    x = np.asarray(events["x"], np.int64)
    y = np.asarray(events["y"], np.int64)
    p = np.asarray(events["p"], np.int64)
    n = t.shape[0]
    frames = np.zeros((num_frames, H, W, 2), np.float32)
    if n == 0:
        return frames

    if split_by == "time":
        t0, t1 = t[0], t[-1]
        span = max(int(t1 - t0), 1)
        idx = np.minimum(
            ((t - t0) * num_frames) // (span + 1), num_frames - 1
        )
    elif split_by == "number":
        idx = np.minimum(np.arange(n) * num_frames // n, num_frames - 1)
    else:
        raise ValueError(f"unknown split_by {split_by!r}")

    np.add.at(frames, (idx, y, x, p), 1.0)
    return frames


def events_to_voxel_grid(
    events: Dict[str, np.ndarray], H: int, W: int, num_bins: int
) -> np.ndarray:
    """Bilinear-in-time voxel grid (num_bins, H, W) with polarity ±1 —
    the common DVS representation for analog-input SNNs."""
    t = np.asarray(events["t"], np.float64)
    x = np.asarray(events["x"], np.int64)
    y = np.asarray(events["y"], np.int64)
    pol = np.asarray(events["p"], np.float32) * 2.0 - 1.0
    grid = np.zeros((num_bins, H, W), np.float32)
    if t.size == 0:
        return grid
    t0, t1 = t[0], t[-1]
    tau = (t - t0) / max(t1 - t0, 1e-9) * (num_bins - 1)
    lo = np.floor(tau).astype(np.int64)
    frac = (tau - lo).astype(np.float32)
    hi = np.minimum(lo + 1, num_bins - 1)
    np.add.at(grid, (lo, y, x), pol * (1 - frac))
    np.add.at(grid, (hi, y, x), pol * frac)
    return grid


def random_temporal_delete(
    frames: np.ndarray, keep: int, rng: np.random.RandomState
) -> np.ndarray:
    """Temporal augmentation: keep a random contiguous window of ``keep``
    frames (spikingjelly ``RandomTemporalDelete``)."""
    t = frames.shape[0]
    if keep >= t:
        return frames
    start = rng.randint(0, t - keep + 1)
    return frames[start : start + keep]
