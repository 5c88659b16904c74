"""Event transforms (data/transforms.py) vs reference to_x_rep semantics."""

import numpy as np
import pytest

from spiking_diffusion_tpu.data import transforms as tx


def _events(rng, n=1000, H=16, W=16, t_max=50_000):
    return {
        "t": np.sort(rng.randint(0, t_max, n)).astype(np.int64),
        "x": rng.randint(0, W, n).astype(np.int64),
        "y": rng.randint(0, H, n).astype(np.int64),
        "p": rng.randint(0, 2, n).astype(np.int64),
    }


def test_slice_by_time_bins_cover_and_overlap():
    rng = np.random.RandomState(0)
    ev = _events(rng)
    plain = tx.slice_by_time_bins(ev, 8, overlap=0.0)
    assert len(plain) == 8
    # zero overlap: slices are disjoint and ordered
    ends = [s["t"][-1] for s in plain if len(s["t"])]
    starts = [s["t"][0] for s in plain if len(s["t"])]
    assert all(a <= b for a, b in zip(ends, starts[1:]))

    over = tx.slice_by_time_bins(ev, 8, overlap=0.25)
    assert len(over) == 8
    # overlapping windows are strictly larger on average
    assert (np.mean([len(s["t"]) for s in over])
            > np.mean([len(s["t"]) for s in plain]))
    with pytest.raises(ValueError):
        tx.slice_by_time_bins(ev, 4, overlap=1.0)


def test_slice_by_event_count_parity():
    rng = np.random.RandomState(1)
    ev = _events(rng, n=1000)
    slices = tx.slice_by_event_count(ev, 300, overlap=100)
    # reference arithmetic: floor((1000-300)/200)+1 = 4 slices
    assert len(slices) == 4
    assert all(len(s["t"]) == 300 for s in slices)
    # stride 200: slice i starts at event 200*i
    np.testing.assert_array_equal(slices[1]["t"], ev["t"][200:500])
    incl = tx.slice_by_event_count(ev, 300, overlap=100,
                                   include_incomplete=True)
    assert len(incl) == 5 and len(incl[-1]["t"]) < 300
    with pytest.raises(ValueError):
        tx.slice_by_event_count(ev, 100, overlap=100)


def _ref_bina_rep(frames):
    """Literal transcription of ``bina_rep`` (``to_x_rep.py:342-357``)."""
    mask = 2 ** np.arange(frames.shape[0] - 1, -1, -1, dtype=np.float32)
    mask = np.stack(
        [mask] * (frames.shape[1] * frames.shape[2] * frames.shape[3]),
        axis=-1,
    ).reshape(frames.shape)
    return np.sum(mask * frames, 0) / (2 ** mask.shape[0] - 1)


def test_bina_rep_parity():
    rng = np.random.RandomState(2)
    raw = (rng.rand(2 * 4, 2, 8, 8) > 0.6).astype(np.float32) * 3.0
    ours = tx.to_bina_rep(raw, n_frames=2, n_bits=4)
    assert ours.shape == (2, 2, 8, 8)
    binary = (raw > 0).astype(np.float32)
    for i in range(2):
        ref = _ref_bina_rep(binary[i * 4: (i + 1) * 4])
        np.testing.assert_allclose(ours[i], ref, rtol=1e-6)
    assert ours.max() <= 1.0 and ours.min() >= 0.0
    with pytest.raises(ValueError, match="expected"):
        tx.to_bina_rep(raw, n_frames=3, n_bits=4)


def test_compose_and_factories():
    rng = np.random.RandomState(3)
    ev = _events(rng, H=8, W=8)
    pipeline = tx.Compose([tx.to_frame(8, 8, frames_num=4)])
    frames = pipeline(ev)
    assert frames.shape == (4, 8, 8, 2) and frames.sum() == 1000
    img = tx.to_image(8, 8)(ev)
    assert img.shape == (8, 8, 2) and img.sum() == 1000
    grid = tx.to_voxel_grid(8, 8, n_time_bins=5)(ev)
    assert grid.shape == (5, 8, 8)
    assert "Compose" in repr(pipeline)
