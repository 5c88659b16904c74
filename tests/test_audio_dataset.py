"""SpeechCommands raw-audio dataset — parity with the reference's split,
silence, weighting, and normalization semantics
(``spikingjelly.zip!datasets/speechcommands.py``)."""

import os

import numpy as np
import pytest

from spiking_diffusion_tpu.data.audio import (
    SpeechCommands,
    TRAIN_RECORD,
    load_wav,
)

LABELS = ("yes", "no", "stop")
LABEL_DICT = {lb: i for i, lb in enumerate(LABELS)}
LABEL_DICT["_silence_"] = len(LABELS)


@pytest.fixture(scope="module")
def sc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("speech_commands"))
    SpeechCommands.synthesize(root, labels=LABELS, per_label=4)
    return root


def test_load_wav_pcm16_range(sc_root):
    path = os.path.join(sc_root, "yes",
                        sorted(os.listdir(os.path.join(sc_root, "yes")))[0])
    wave, sr = load_wav(path)
    assert sr == 16000
    assert wave.dtype == np.float32
    assert np.abs(wave).max() <= 1.0


def test_splits_disjoint_and_cover(sc_root):
    train = SpeechCommands(LABEL_DICT, sc_root, "train")
    val = SpeechCommands(LABEL_DICT, sc_root, "val")
    test = SpeechCommands(LABEL_DICT, sc_root, "test")
    # per_label=4: 2 train + 1 val + 1 test per label
    assert len(train) == 2 * len(LABELS)
    assert len(val) == len(LABELS)
    assert len(test) == len(LABELS)
    sets = [set(ds._walker) for ds in (train, val, test)]
    assert not (sets[0] & sets[1]) and not (sets[0] & sets[2])
    # the training list is cached exactly as the reference does
    assert os.path.exists(os.path.join(sc_root, TRAIN_RECORD))
    train2 = SpeechCommands(LABEL_DICT, sc_root, "train")
    assert train2._walker == train._walker


def test_getitem_normalized_and_labeled(sc_root):
    ds = SpeechCommands(LABEL_DICT, sc_root, "train")
    for i in range(len(ds)):
        wave, label = ds[i]
        assert np.abs(wave).max() == pytest.approx(1.0)
        assert label == LABEL_DICT[ds._walker[i].split("/")[0]]


def test_silence_tail(sc_root):
    ds = SpeechCommands(
        LABEL_DICT, sc_root, "train", silence_cnt=3, silence_size=800
    )
    assert len(ds) == 2 * len(LABELS) + 3
    wave, label = ds[len(ds) - 1]
    assert label == LABEL_DICT["_silence_"]
    assert wave.shape == (800,)
    # weights: inverse class frequency + shared silence weight, summing
    # to ~1 over classes (speechcommands.py:160-169)
    assert ds.weights.shape == (len(ds),)
    assert ds.weights.min() > 0
    # silence entries share one weight
    tail = ds.weights[-3:]
    assert np.allclose(tail, tail[0])


def test_val_split_has_no_silence(sc_root):
    ds = SpeechCommands(
        LABEL_DICT, sc_root, "val", silence_cnt=5
    )
    assert len(ds) == len(LABELS)  # silence only augments training


def test_transform_applied(sc_root):
    ds = SpeechCommands(
        LABEL_DICT, sc_root, "test", transform=lambda w: w[:100]
    )
    wave, _ = ds[0]
    assert wave.shape == (100,)
