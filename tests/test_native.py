"""Native C++ host kernels: build, parity with numpy, speed sanity."""

import numpy as np
import pytest

from spiking_diffusion_tpu import native
from spiking_diffusion_tpu.data import events as np_events


def _toy_events(n=5000, H=32, W=32, seed=0):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.randint(0, 100000, n)).astype(np.int64)
    return {
        "t": t,
        "x": rng.randint(0, W, n).astype(np.int64),
        "y": rng.randint(0, H, n).astype(np.int64),
        "p": rng.randint(0, 2, n).astype(np.int64),
    }


def test_native_builds():
    # g++ is baked into this image; the native path must be live here
    assert native.available()


@pytest.mark.parametrize("split_by", ["time", "number"])
def test_integrate_parity_with_numpy(split_by):
    ev = _toy_events()
    ref = np_events.integrate_events_to_frames(ev, 32, 32, 8, split_by,
                                               use_native=False)
    out = native.integrate_events_to_frames(ev, 32, 32, 8, split_by)
    np.testing.assert_array_equal(out, ref)
    assert out.sum() == len(ev["t"])


def test_integrate_out_of_bounds():
    ev = _toy_events(100)
    ev["x"][5] = 99  # out of the 32-wide grid
    if native.available():
        with pytest.raises(ValueError):
            native.integrate_events_to_frames(ev, 32, 32, 4)


def test_decode_idx_batch_parity():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (50, 28, 28, 1)).astype(np.uint8)
    idx = rng.permutation(50)[:16]
    out = native.decode_idx_batch(imgs, idx)
    ref = imgs[idx].astype(np.float32) / 255.0
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    assert out.dtype == np.float32


def test_decode_idx_batch_bounds_checked():
    """Out-of-range indices must raise on BOTH paths (the native kernel
    would otherwise read out of bounds)."""
    imgs = np.zeros((5, 4, 4, 1), np.uint8)
    with pytest.raises(IndexError):
        native.decode_idx_batch(imgs, np.array([0, 5]))
    with pytest.raises(IndexError):
        native.decode_idx_batch(imgs, np.array([-1]))


def test_native_bitpack_roundtrip():
    rng = np.random.RandomState(2)
    s = (rng.rand(3, 41) < 0.3).astype(np.float32)
    packed = native.pack_spikes(s)
    out = native.unpack_spikes(packed, s.shape)
    np.testing.assert_array_equal(out, s)
    # parity with the device-side packer
    import jax.numpy as jnp

    from spiking_diffusion_tpu.ops.bitpack import pack_spikes as jpack

    jp, _ = jpack(jnp.asarray(s))
    np.testing.assert_array_equal(packed, np.asarray(jp))


def test_native_integration_speed():
    # the reason this kernel exists: np.add.at is slow; native must not be
    # slower on a realistic event count
    import time

    ev = _toy_events(n=200_000)
    t0 = time.perf_counter()
    native.integrate_events_to_frames(ev, 128, 128, 16)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    np_events.integrate_events_to_frames(ev, 128, 128, 16, use_native=False)
    t_numpy = time.perf_counter() - t0
    if native.available():
        assert t_native < t_numpy * 1.5, (t_native, t_numpy)
