"""Neuromorphic readers: binary-format round-trips + integration parity.

The real archives are not downloadable here, so each parser is tested by
PACKING known events into the actual on-disk binary format (aedat 3.1,
ATIS 40-bit, jAER 2.0 big-endian) and parsing them back; the integrators
are tested against a literal transcription of the reference's per-frame
bincount loop (``spikingjelly.zip!datasets/__init__.py:171-415``).
"""

import os
import struct

import numpy as np
import pytest

from spiking_diffusion_tpu.data import neuromorphic as nm


def _rand_events(rng, n=500, H=34, W=34, t_max=100_000):
    return {
        "t": np.sort(rng.randint(0, t_max, n)).astype(np.int64),
        "x": rng.randint(0, W, n).astype(np.int64),
        "y": rng.randint(0, H, n).astype(np.int64),
        "p": rng.randint(0, 2, n).astype(np.int64),
    }


# ---------------------------------------------------------------------------
# parsers: pack the real binary layout, parse, compare
# ---------------------------------------------------------------------------

def _pack_aedat_v3(events, packet_size=128, tsoverflow=0):
    """Serialize events as aedat 3.1 polarity packets (the format
    DVS128Gesture recordings use)."""
    out = [b"#!AER-DAT3.1\r\n#!END-HEADER\r\n"]
    n = len(events["t"])
    for lo in range(0, n, packet_size):
        hi = min(lo + packet_size, n)
        cap = hi - lo
        out.append(struct.pack(
            "<HHIIIIII", 1, 0, 8, 0, tsoverflow, cap, cap, cap
        ))
        for i in range(lo, hi):
            aer = (
                (int(events["x"][i]) << 17)
                | (int(events["y"][i]) << 2)
                | (int(events["p"][i]) << 1)
            )
            out.append(struct.pack("<II", aer, int(events["t"][i])))
    return b"".join(out)


def test_aedat_v3_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    ev = _rand_events(rng, n=300, H=128, W=128)
    path = os.path.join(tmp_path, "x.aedat")
    with open(path, "wb") as f:
        f.write(_pack_aedat_v3(ev))
    got = nm.load_aedat_v3(path)
    for k in ("t", "x", "y", "p"):
        np.testing.assert_array_equal(got[k], ev[k])


def test_aedat_v3_skips_non_polarity_packets_and_overflow(tmp_path):
    rng = np.random.RandomState(1)
    ev = _rand_events(rng, n=64, H=128, W=128)
    blob = _pack_aedat_v3(ev, tsoverflow=1)
    # insert a frame-event packet (type 2) mid-stream: must be skipped
    junk = struct.pack("<HHIIIIII", 2, 0, 8, 0, 0, 4, 4, 4) + b"\0" * 32
    hlen = len(b"#!AER-DAT3.1\r\n#!END-HEADER\r\n")
    head, tail = blob[:hlen], blob[hlen:]
    path = os.path.join(tmp_path, "x.aedat")
    with open(path, "wb") as f:
        f.write(head + junk + tail)
    got = nm.load_aedat_v3(path)
    # timestamps carry the overflow bit exactly as the reference does
    np.testing.assert_array_equal(got["t"], ev["t"] | (1 << 31))
    np.testing.assert_array_equal(got["x"], ev["x"])


def test_atis_bin_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    ev = _rand_events(rng, n=400, H=34, W=34, t_max=(1 << 23) - 1)
    raw = np.zeros(len(ev["t"]) * 5, np.uint8)
    raw[0::5] = ev["x"]
    raw[1::5] = ev["y"]
    raw[2::5] = (ev["p"] << 7) | ((ev["t"] >> 16) & 0x7F)
    raw[3::5] = (ev["t"] >> 8) & 0xFF
    raw[4::5] = ev["t"] & 0xFF
    path = os.path.join(tmp_path, "x.bin")
    raw.tofile(path)
    got = nm.load_atis_bin(path)
    for k in ("t", "x", "y", "p"):
        np.testing.assert_array_equal(got[k], ev[k])


def test_jaer_dat_cifar10dvs_convention(tmp_path):
    """Pack jAER 2.0 with the CIFAR10-DVS 7-bit address layout and check
    the class applies the events-tfds coordinate fix (x'=127-y, y'=127-x,
    p'=1-p — ``datasets/cifar10_dvs.py:186-196``)."""
    rng = np.random.RandomState(3)
    ev = _rand_events(rng, n=200, H=128, W=128)
    addr = (ev["x"] << 1) | (ev["y"] << 8) | ev["p"]
    data = np.empty(len(ev["t"]) * 2, dtype=">u4")
    data[0::2] = addr
    data[1::2] = ev["t"]
    path = os.path.join(tmp_path, "x.aedat")
    with open(path, "wb") as f:
        f.write(b"#!AER-DAT2.0\r\n# comment line\r\n")
        f.write(data.tobytes())
    got = nm.CIFAR10DVS.load_origin_data(path)
    np.testing.assert_array_equal(got["t"], ev["t"])
    np.testing.assert_array_equal(got["x"], 127 - ev["y"])
    np.testing.assert_array_equal(got["y"], 127 - ev["x"])
    np.testing.assert_array_equal(got["p"], 1 - ev["p"])


# ---------------------------------------------------------------------------
# integration parity vs a literal reference-semantics oracle
# ---------------------------------------------------------------------------

def _ref_segment_to_frame(x, y, p, H, W, j_l, j_r):
    """Transcription of ``integrate_events_segment_to_frame``
    (``datasets/__init__.py:171-247``): per-polarity bincount, (2, H, W)."""
    frame = np.zeros([2, H * W])
    x = x[j_l:j_r].astype(int)
    y = y[j_l:j_r].astype(int)
    p = p[j_l:j_r]
    for c, mask in enumerate([p == 0, p != 0]):
        pos = y[mask] * W + x[mask]
        cnt = np.bincount(pos)
        frame[c][np.arange(cnt.size)] += cnt
    return frame.reshape((2, H, W))


def _ref_fixed_frames(events, split_by, M, H, W):
    """Transcription of ``cal_fixed_frames_number_segment_index`` +
    ``integrate_events_by_fixed_frames_number``."""
    t = events["t"]
    N = t.size
    j_l = np.zeros(M, int)
    j_r = np.zeros(M, int)
    if split_by == "number":
        di = N // M
        for i in range(M):
            j_l[i] = i * di
            j_r[i] = j_l[i] + di
        j_r[-1] = N
    else:
        dt = (t[-1] - t[0]) // M
        idx = np.arange(N)
        for i in range(M):
            t_l = dt * i + t[0]
            mask = np.logical_and(t >= t_l, t < t_l + dt)
            masked = idx[mask]
            j_l[i] = masked[0]
            j_r[i] = masked[-1] + 1
        j_r[-1] = N
    frames = np.zeros([M, 2, H, W])
    for i in range(M):
        frames[i] = _ref_segment_to_frame(
            events["x"], events["y"], events["p"], H, W, j_l[i], j_r[i]
        )
    return frames


@pytest.mark.parametrize("split_by", ["time", "number"])
@pytest.mark.parametrize("M", [4, 16])
def test_fixed_frames_parity(split_by, M):
    rng = np.random.RandomState(42)
    H = W = 34
    # dense stream -> every time bin non-empty (the reference oracle
    # crashes on empty bins; ours zero-fills, an intended divergence)
    ev = _rand_events(rng, n=5000, H=H, W=W)
    ours = nm.integrate_by_fixed_frames(ev, split_by, M, H, W)
    ref = _ref_fixed_frames(ev, split_by, M, H, W)
    np.testing.assert_array_equal(ours.transpose(0, 3, 1, 2), ref)
    assert ours.sum() == 5000  # every event lands in exactly one bin


def test_fixed_frames_empty_time_bin_zero_fills():
    # all events in the first tenth of the recording + one at the end:
    # middle time bins are empty -> zero frames, no crash
    t = np.concatenate([np.arange(100), [10_000]]).astype(np.int64)
    ev = {"t": t, "x": t % 5, "y": t % 7, "p": t % 2}
    out = nm.integrate_by_fixed_frames(ev, "time", 8, 7, 5)
    assert out.shape == (8, 7, 5, 2)
    assert out.sum() == t.size
    assert (out[3] == 0).all()


def _ref_fixed_duration(events, duration, H, W):
    """Transcription of ``integrate_events_by_fixed_duration``
    (``datasets/__init__.py:352-389``)."""
    x, y, t, p = events["x"], events["y"], events["t"], events["p"]
    N = t.size
    frames = []
    left = right = 0
    while True:
        t_l = t[left]
        while True:
            if right == N or t[right] - t_l > duration:
                break
            right += 1
        frames.append(np.expand_dims(
            _ref_segment_to_frame(x, y, p, H, W, left, right), 0
        ))
        left = right
        if right == N:
            return np.concatenate(frames)


def test_fixed_duration_parity():
    rng = np.random.RandomState(7)
    H = W = 16
    ev = _rand_events(rng, n=1000, H=H, W=W, t_max=50_000)
    ours = nm.integrate_by_fixed_duration(ev, 5_000, H, W)
    ref = _ref_fixed_duration(ev, 5_000, H, W)
    assert ours.shape[0] == ref.shape[0]
    np.testing.assert_array_equal(ours.transpose(0, 3, 1, 2), ref)


# ---------------------------------------------------------------------------
# dataset folders over a synthetic events_np tree (the real layout)
# ---------------------------------------------------------------------------

def test_nmnist_folder_event_and_frame(tmp_path):
    root = nm.NMNIST.synthesize(str(tmp_path), per_class=2, num_classes=3)
    ds = nm.NMNIST(root, train=True, data_type="event")
    assert len(ds) == 6 and ds.classes == ["0", "1", "2"]
    ev, label = ds[0]
    assert set(ev) == {"t", "x", "y", "p"} and label == 0

    ds_f = nm.NMNIST(
        root, train=False, data_type="frame", frames_number=8,
        split_by="number",
    )
    x, y = ds_f.as_arrays()
    assert x.shape == (6, 8, 34, 34, 2)
    assert x.sum(axis=(1, 2, 3, 4)).min() > 0
    # second construction must serve from the cache (no events re-read)
    cache = os.path.join(root, "frames_number_8_split_by_number")
    assert os.path.isdir(cache)
    ds_f2 = nm.NMNIST(
        root, train=False, data_type="frame", frames_number=8,
        split_by="number",
    )
    np.testing.assert_array_equal(ds_f2.as_arrays()[0], x)


def test_folder_duration_and_custom_integration(tmp_path):
    root = nm.NMNIST.synthesize(
        str(tmp_path), per_class=1, num_classes=2, seed=3
    )
    ds = nm.NMNIST(root, train=True, data_type="frame", duration=200_000)
    x0, _ = ds[0]
    assert x0.ndim == 4 and x0.shape[1:] == (34, 34, 2)

    def halves(ev, H, W):
        return nm.integrate_by_fixed_frames(ev, "number", 2, H, W)

    ds_c = nm.NMNIST(
        root, train=True, data_type="frame",
        custom_integrate_function=halves,
    )
    x, _ = ds_c[0]
    assert x.shape == (2, 34, 34, 2)


def test_dvs128_gesture_trial_split(tmp_path):
    """Full create_events_np_files flow from a fake extract/ tree: aedat
    trial files + label csvs + trials_to_{train,test}.txt."""
    rng = np.random.RandomState(5)
    extract = os.path.join(tmp_path, "extract")
    ad = os.path.join(extract, "DvsGesture")
    os.makedirs(ad)
    trials = {"train": ["user01_led"], "test": ["user02_led"]}
    for split, stems in trials.items():
        with open(os.path.join(ad, f"trials_to_{split}.txt"), "w") as f:
            f.write("\n".join(s + ".aedat" for s in stems) + "\n")
        for stem in stems:
            ev = _rand_events(rng, n=600, H=128, W=128, t_max=90_000)
            with open(os.path.join(ad, stem + ".aedat"), "wb") as f:
                f.write(_pack_aedat_v3(ev))
            # 3 gesture windows: labels 1, 2, 2 (csv labels are 1-based)
            with open(os.path.join(ad, stem + "_labels.csv"), "w") as f:
                f.write("class,startTime_usec,endTime_usec\n")
                f.write("1,0,30000\n2,30000,60000\n2,60000,90001\n")
    root = os.path.join(tmp_path, "root")
    nm.DVS128Gesture.create_events_np_files(
        extract, os.path.join(root, "events_np")
    )
    ds = nm.DVS128Gesture(root, train=True, data_type="event")
    assert ds.classes == ["0", "1"]  # csv labels 1,2 -> 0,1
    labels = [label for _p, label in ds.samples]
    assert labels.count(0) == 1 and labels.count(1) == 2
    ev0, _ = ds[0]
    assert (ev0["t"] < 30000).all()  # window slicing respected
    ds_test = nm.DVS128Gesture(root, train=False, data_type="event")
    assert len(ds_test) == 3


def test_cifar10dvs_synthesize_and_frames(tmp_path):
    root = nm.CIFAR10DVS.synthesize(str(tmp_path))
    ds = nm.CIFAR10DVS(
        root, train=True, data_type="frame", frames_number=4,
        split_by="time",
    )
    assert ds.classes == sorted(nm.CIFAR10DVS.CLASS_NAMES)
    x, y = ds.as_arrays()
    assert x.shape == (10, 4, 128, 128, 2) and set(y) == set(range(10))


def test_missing_tree_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        nm.NMNIST(str(tmp_path), train=True)


# ---------------------------------------------------------------------------
# batching utilities
# ---------------------------------------------------------------------------

def test_pad_sequence_stack_and_mask():
    seqs = [np.ones((3, 2, 2)), np.ones((5, 2, 2)), np.ones((1, 2, 2))]
    batch, lens = nm.pad_sequence_stack(seqs)
    assert batch.shape == (3, 5, 2, 2)
    np.testing.assert_array_equal(lens, [3, 5, 1])
    assert batch[0, 3:].sum() == 0 and batch[1].sum() == 5 * 4

    mask = np.asarray(nm.padded_sequence_mask(lens, T=5))
    assert mask.shape == (5, 3)
    np.testing.assert_array_equal(mask.sum(axis=0), lens)
    assert mask[0].all() and not mask[4, 2]


def test_split_to_train_test_set():
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1, 1, 1])
    tr, te = nm.split_to_train_test_set(0.5, labels, 2)
    assert len(tr) == 5 and len(te) == 5
    assert sorted(np.concatenate([tr, te])) == list(range(10))
    # per-class balance preserved
    assert (labels[tr] == 0).sum() == 2 and (labels[tr] == 1).sum() == 3


# ---------------------------------------------------------------------------
# SHD / SSC (1-D audio spikes over HDF5)
# ---------------------------------------------------------------------------

def _ref_shd_fixed_frames(events, split_by, M, W):
    """Transcription of the SHD integrators (``datasets/shd.py:15-63``):
    float dt in 'time' mode, no polarity channel."""
    t, x = events["t"], events["x"]
    N = t.size
    j_l = np.zeros(M, int)
    j_r = np.zeros(M, int)
    if split_by == "number":
        di = N // M
        for i in range(M):
            j_l[i] = i * di
            j_r[i] = j_l[i] + di
        j_r[-1] = N
    else:
        dt = (t[-1] - t[0]) / M
        idx = np.arange(N)
        for i in range(M):
            t_l = dt * i + t[0]
            mask = np.logical_and(t >= t_l, t < t_l + dt)
            masked = idx[mask]
            j_l[i] = masked[0]
            j_r[i] = masked[-1] + 1
        j_r[-1] = N
    frames = np.zeros([M, W])
    for i in range(M):
        frame = np.zeros([W])
        xs = x[j_l[i]: j_r[i]].astype(int)
        cnt = np.bincount(xs)
        frame[np.arange(cnt.size)] += cnt
        frames[i] = frame
    return frames


@pytest.mark.parametrize("split_by", ["time", "number"])
def test_shd_integration_parity(split_by):
    rng = np.random.RandomState(11)
    n, W = 4000, 700
    ev = {
        "t": np.sort(rng.rand(n)),
        "x": rng.randint(0, W, n).astype(np.int64),
    }
    ours = nm.integrate_1d_by_fixed_frames(ev, split_by, 16, W)
    ref = _ref_shd_fixed_frames(ev, split_by, 16, W)
    np.testing.assert_array_equal(ours, ref)
    assert ours.sum() == n


def test_shd_dataset_event_and_frame(tmp_path):
    h5py = pytest.importorskip("h5py")  # noqa: F841
    root = nm.SpikingHeidelbergDigits.synthesize(
        str(tmp_path), per_class=1, n_events=200
    )
    ds = nm.SpikingHeidelbergDigits(root, train=True, data_type="event")
    assert len(ds) == 20
    ev, label = ds[0]
    assert set(ev) == {"t", "x"} and label == 0

    ds_f = nm.SpikingHeidelbergDigits(
        root, train=False, data_type="frame", frames_number=8,
        split_by="number",
    )
    x, y = ds_f.as_arrays()
    assert x.shape == (20, 8, 700)
    assert sorted(set(y)) == list(range(20))
    # cache hit on second construction
    x2, _ = nm.SpikingHeidelbergDigits(
        root, train=False, data_type="frame", frames_number=8,
        split_by="number",
    ).as_arrays()
    np.testing.assert_array_equal(x, x2)


def test_ssc_valid_split(tmp_path):
    pytest.importorskip("h5py")
    # SSC's synthesize writes all three splits (it iterates H5_SPLITS)
    root = nm.SpikingSpeechCommands.synthesize(
        str(tmp_path), per_class=1, n_events=100
    )
    ds = nm.SpikingSpeechCommands(root, train="valid", data_type="event")
    assert len(ds) == 35  # 35 classes, one sample each
    with pytest.raises(ValueError, match="unknown split"):
        nm.SpikingHeidelbergDigits(root, train="valid")


# ---------------------------------------------------------------------------
# splitless folder datasets (train=None): N-Caltech101 + ASL-DVS
# ---------------------------------------------------------------------------

def test_ncaltech101_splitless_folder(tmp_path):
    root = nm.NCaltech101.synthesize(str(tmp_path), per_class=2)
    ds = nm.NCaltech101(root, train=None, data_type="event")
    assert len(ds) == 4 and ds.classes == ["airplanes", "faces"]
    # frame mode caches without a split level
    ds_f = nm.NCaltech101(
        root, train=None, data_type="frame", frames_number=4,
        split_by="number",
    )
    x, y = ds_f.as_arrays()
    assert x.shape == (4, 4, 180, 240, 2)
    tr, te = nm.split_to_train_test_set(0.5, y, 2)
    assert len(tr) == 2 and len(te) == 2


def test_asl_dvs_mat_roundtrip(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    rng = np.random.RandomState(4)
    ev = _rand_events(rng, n=150, H=180, W=240)
    extract = os.path.join(tmp_path, "extract")
    os.makedirs(os.path.join(extract, "a"))
    scipy_io.savemat(
        os.path.join(extract, "a", "a_0001.mat"),
        # on-disk .mat stores the UNflipped camera coordinates
        {"ts": ev["t"], "x": 239 - ev["x"], "y": 179 - ev["y"],
         "p_unused": 0, "pol": ev["p"]},
    )
    root = os.path.join(tmp_path, "root")
    nm.ASLDVS.create_events_np_files(
        extract, os.path.join(root, "events_np")
    )
    ds = nm.ASLDVS(root, train=None, data_type="event")
    got, label = ds[0]
    assert label == 0
    np.testing.assert_array_equal(got["x"], ev["x"])  # flip applied
    np.testing.assert_array_equal(got["y"], ev["y"])
    np.testing.assert_array_equal(got["p"], ev["p"])


def test_hardvs_label_file_flow(tmp_path):
    """create_events_np_files from a fake extract tree (npz samples +
    split label lists), including the 'val' split view."""
    rng = np.random.RandomState(6)
    extract = os.path.join(tmp_path, "extract")
    lines = {"train": [], "val": [], "test": []}
    for c in (1, 2):
        cdir = os.path.join(extract, f"action_{c:03d}")
        os.makedirs(cdir)
        for i, split in enumerate(("train", "val", "test")):
            name = f"dvSave-sample{i}"
            ev = _rand_events(rng, n=50, H=260, W=346)
            np.savez(os.path.join(cdir, name + ".npz"), **ev)
            lines[split].append(f"action_{c:03d}/{name} {c}")
    for split, ls in lines.items():
        with open(os.path.join(extract, f"{split}_label.txt"), "w") as f:
            f.write("\n".join(ls) + "\n")
    root = os.path.join(tmp_path, "root")
    nm.HARDVS.create_events_np_files(
        extract, os.path.join(root, "events_np")
    )
    tr = nm.HARDVS(root, train=True, data_type="event")
    te = nm.HARDVS(root, train=False, data_type="event")
    va = nm.HARDVS(root, train="val", data_type="event")
    assert len(tr) == len(te) == len(va) == 2
    assert tr.classes == ["action_001", "action_002"]
    ev, label = va[1]
    assert label == 1 and set(ev) == {"t", "x", "y", "p"}


def test_atis_td_dat_roundtrip_and_negative_dt_drop(tmp_path):
    """Pack the NavGesture ATIS _td.dat u64 layout, parse, verify the
    bit extraction, zero-origin shift, and negative-dt filtering."""
    rng = np.random.RandomState(8)
    n = 200
    t = np.sort(rng.randint(1000, 50_000, n)).astype(np.uint64)
    x = rng.randint(0, 304, n).astype(np.uint64)
    y = rng.randint(0, 240, n).astype(np.uint64)
    p = rng.randint(0, 2, n).astype(np.uint64)
    words = t | (x << 32) | (y << 41) | (p << 49)
    # corrupt one timestamp backwards: must be dropped
    words[50] = (np.uint64(10)) | (x[50] << 32) | (y[50] << 41) | (p[50] << 49)
    path = os.path.join(tmp_path, "user01_le_1.dat")
    with open(path, "wb") as f:
        f.write(b"% header line\n% another\n")
        f.write(bytes([0, 8]))  # ev_type, ev_size
        f.write(words.astype("<u8").tobytes())
    got = nm.load_atis_td_dat(path)
    keep = np.ones(n, bool)
    keep[50] = False
    np.testing.assert_array_equal(got["t"], (t[keep] - t[0]).astype(np.int64))
    np.testing.assert_array_equal(got["x"], x[keep].astype(np.int64))
    np.testing.assert_array_equal(got["y"], y[keep].astype(np.int64))
    np.testing.assert_array_equal(got["p"], p[keep].astype(np.int64))


def test_navgesture_folder_flow(tmp_path):
    rng = np.random.RandomState(9)
    extract = os.path.join(tmp_path, "extract")
    for user in ("user01", "user02"):
        udir = os.path.join(extract, user)
        os.makedirs(udir)
        for label in ("le", "up"):
            n = 100
            t = np.sort(rng.randint(0, 10_000, n)).astype(np.uint64)
            x = rng.randint(0, 304, n).astype(np.uint64)
            y = rng.randint(0, 240, n).astype(np.uint64)
            p = rng.randint(0, 2, n).astype(np.uint64)
            words = (t | (x << 32) | (y << 41) | (p << 49)).astype("<u8")
            with open(os.path.join(
                    udir, f"{user}_{label}_0.dat"), "wb") as f:
                f.write(b"% h\n" + bytes([0, 8]) + words.tobytes())
    root = os.path.join(tmp_path, "root")
    nm.NAVGestureWalk.create_events_np_files(
        extract, os.path.join(root, "events_np")
    )
    ds = nm.NAVGestureWalk(root, train=None, data_type="event")
    # all 6 label dirs exist; only le/up have samples
    assert ds.classes == sorted(nm.NAVGestureWalk.LABELS)
    assert len(ds) == 4
    ev, label = ds[0]
    assert ds.classes[label] in ("le", "up")
    assert ev["y"].max() <= 239  # flip applied within range


def test_es_imagenet_loader_and_folder(tmp_path):
    rng = np.random.RandomState(10)
    extract = os.path.join(tmp_path, "extract", "ES-imagenet-0.18")
    for split in ("train", "val"):
        cdir = os.path.join(extract, split, "n01440764")
        os.makedirs(cdir)
        pos = np.stack([rng.randint(0, 256, 60), rng.randint(0, 256, 60),
                        rng.randint(0, 1000, 60)], axis=1)
        neg = np.stack([rng.randint(0, 256, 40), rng.randint(0, 256, 40),
                        rng.randint(0, 1000, 40)], axis=1)
        np.savez(os.path.join(cdir, "sample0.npz"), pos=pos, neg=neg)
    root = os.path.join(tmp_path, "root")
    nm.ESImageNet.create_events_np_files(
        os.path.join(tmp_path, "extract"), os.path.join(root, "events_np")
    )
    ds = nm.ESImageNet(root, train=True, data_type="event")
    ev, label = ds[0]
    assert label == 0 and len(ev["t"]) == 100
    assert (np.diff(ev["t"]) >= 0).all()  # time-sorted after merge
    assert ev["p"].sum() == 60  # pos events carry p=1
    ds_test = nm.ESImageNet(root, train=False, data_type="event")
    assert len(ds_test) == 1
