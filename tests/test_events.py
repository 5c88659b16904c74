"""Event-stream integration tests."""

import numpy as np

from spiking_diffusion_tpu.data.events import (
    events_to_voxel_grid,
    integrate_events_to_frames,
    random_temporal_delete,
)


def _toy_events():
    return {
        "t": np.array([0, 10, 20, 30, 40, 50]),
        "x": np.array([1, 2, 3, 1, 2, 3]),
        "y": np.array([0, 0, 1, 1, 2, 2]),
        "p": np.array([0, 1, 0, 1, 0, 1]),
    }


def test_integrate_by_time():
    f = integrate_events_to_frames(_toy_events(), H=4, W=4, num_frames=2,
                                   split_by="time")
    assert f.shape == (2, 4, 4, 2)
    assert f.sum() == 6  # every event lands exactly once
    # first three events (t=0,10,20) in frame 0
    assert f[0].sum() == 3


def test_integrate_by_number():
    f = integrate_events_to_frames(_toy_events(), H=4, W=4, num_frames=3,
                                   split_by="number")
    assert f.shape == (3, 4, 4, 2)
    np.testing.assert_array_equal(f.sum(axis=(1, 2, 3)), [2, 2, 2])


def test_integrate_empty():
    empty = {k: np.array([], dtype=np.int64) for k in "txyp"}
    f = integrate_events_to_frames(empty, 4, 4, 2)
    assert f.sum() == 0


def test_voxel_grid():
    g = events_to_voxel_grid(_toy_events(), H=4, W=4, num_bins=3)
    assert g.shape == (3, 4, 4)
    # polarity signed: 3 ON (+1) and 3 OFF (-1) events -> total ~0
    assert abs(g.sum()) < 1e-5
    assert np.abs(g).sum() > 0


def test_random_temporal_delete():
    frames = np.arange(10)[:, None, None, None] * np.ones((10, 2, 2, 1))
    rng = np.random.RandomState(0)
    out = random_temporal_delete(frames, keep=4, rng=rng)
    assert out.shape == (4, 2, 2, 1)
    # contiguous window
    start = out[0, 0, 0, 0]
    np.testing.assert_array_equal(out[:, 0, 0, 0], start + np.arange(4))
