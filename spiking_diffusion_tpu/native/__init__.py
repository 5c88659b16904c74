"""Native (C++) host-side kernels, built on demand and bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; this package covers the host-side
hot loops (event-stream integration, IDX batch decode, spike bit-packing)
with a small C++ library compiled by g++ at first import (cached under the
package dir, then /tmp if the tree is read-only). Every entry point has a
pure-numpy fallback, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "event_ops.cc")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    candidates = [
        os.path.join(os.path.dirname(__file__), "_event_ops.so"),
        os.path.join(tempfile.gettempdir(), "sdtpu_event_ops.so"),
    ]
    for so_path in candidates:
        if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
            try:
                _LIB = ctypes.CDLL(so_path)
                break
            except OSError:
                continue
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 _SRC, "-o", so_path],
                check=True, capture_output=True, timeout=120,
            )
            _LIB = ctypes.CDLL(so_path)
            break
        except (OSError, subprocess.SubprocessError):
            continue
    if _LIB is not None:
        _declare(_LIB)
    return _LIB


def _declare(lib: ctypes.CDLL) -> None:
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for name in ("integrate_events_time", "integrate_events_number"):
        fn = getattr(lib, name)
        fn.argtypes = [i64p, i64p, i64p, i64p,
                       ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                       ctypes.c_int64, f32p]
        fn.restype = ctypes.c_int
    lib.decode_idx_batch.argtypes = [u8p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, f32p]
    lib.decode_idx_batch.restype = None
    lib.pack_spikes_f32.argtypes = [f32p, ctypes.c_int64, u8p]
    lib.pack_spikes_f32.restype = None
    lib.unpack_spikes_f32.argtypes = [u8p, ctypes.c_int64, f32p]
    lib.unpack_spikes_f32.restype = None


def available() -> bool:
    return _build_and_load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def integrate_events_to_frames(
    events, H: int, W: int, num_frames: int, split_by: str = "time"
) -> np.ndarray:
    """Native event->frame integration; numpy fallback when no compiler.

    Same contract as data.events.integrate_events_to_frames.
    """
    lib = _build_and_load()
    t = np.ascontiguousarray(events["t"], np.int64)
    x = np.ascontiguousarray(events["x"], np.int64)
    y = np.ascontiguousarray(events["y"], np.int64)
    p = np.ascontiguousarray(events["p"], np.int64)
    if lib is None:
        from spiking_diffusion_tpu.data.events import (
            integrate_events_to_frames as np_impl,
        )

        return np_impl({"t": t, "x": x, "y": y, "p": p}, H, W, num_frames,
                       split_by, use_native=False)
    frames = np.zeros((num_frames, H, W, 2), np.float32)
    fn = (lib.integrate_events_time if split_by == "time"
          else lib.integrate_events_number)
    rc = fn(
        _ptr(t, ctypes.c_int64), _ptr(x, ctypes.c_int64),
        _ptr(y, ctypes.c_int64), _ptr(p, ctypes.c_int64),
        t.shape[0], H, W, num_frames, _ptr(frames, ctypes.c_float),
    )
    if rc != 0:
        raise ValueError("event coordinates out of bounds")
    return frames


def decode_idx_batch(images_u8: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Gather + normalize a batch from (N, H, W[, C]) uint8 images.

    Returns (B, H, W[, C]) float32 in [0, 1].
    """
    lib = _build_and_load()
    idx = np.ascontiguousarray(indices, np.int64)
    n_images = images_u8.shape[0]
    if idx.size and (idx.min() < 0 or idx.max() >= n_images):
        raise IndexError(
            f"decode_idx_batch: index out of range [0, {n_images})"
        )
    if lib is None:
        return images_u8[idx].astype(np.float32) / 255.0
    imgs = np.ascontiguousarray(images_u8)
    row = int(np.prod(imgs.shape[1:]))
    out = np.empty((idx.shape[0], row), np.float32)
    lib.decode_idx_batch(
        _ptr(imgs.reshape(imgs.shape[0], row), ctypes.c_uint8),
        _ptr(idx, ctypes.c_int64), idx.shape[0], row,
        _ptr(out, ctypes.c_float),
    )
    return out.reshape((idx.shape[0],) + imgs.shape[1:])


def pack_spikes(spikes: np.ndarray) -> np.ndarray:
    """(…) 0/1 float32 -> packed uint8 (host-side bitpack)."""
    lib = _build_and_load()
    flat = np.ascontiguousarray(spikes, np.float32).reshape(-1)
    if lib is None:
        return np.packbits(flat.astype(np.uint8), bitorder="little")
    out = np.zeros(((flat.size + 7) // 8,), np.uint8)
    lib.pack_spikes_f32(_ptr(flat, ctypes.c_float), flat.size,
                        _ptr(out, ctypes.c_uint8))
    return out


def unpack_spikes(packed: np.ndarray, shape) -> np.ndarray:
    lib = _build_and_load()
    n = int(np.prod(shape))
    if lib is None:
        bits = np.unpackbits(packed, bitorder="little")[:n]
        return bits.astype(np.float32).reshape(shape)
    out = np.empty((n,), np.float32)
    lib.unpack_spikes_f32(
        _ptr(np.ascontiguousarray(packed, np.uint8), ctypes.c_uint8), n,
        _ptr(out, ctypes.c_float),
    )
    return out.reshape(shape)
