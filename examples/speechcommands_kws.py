"""Example: convolutional-SNN keyword spotting on Speech Commands.

The analogue of spikingjelly's
``activation_based/examples/speechcommands.py`` (a reproduction of
arXiv:1911.10124): raw 1 s waveforms -> power spectrogram (30 ms window,
10 ms hop -> T=101 frames) -> 40-bin Slaney mel filterbank -> per-mel
std rescale, then a 3-block dilated Conv2d+LIF net over the (T, mel)
plane where each LIF scans the *frame* axis as SNN time
(tau=10/7, Sigmoid(alpha=10) surrogate, ``speechcommands.py:298-322``),
a linear readout per frame, and a mean over frames
(``speechcommands.py:320-322``). Training: weighted-random sampling from
the silence-augmented train split, Adam + CE.

With no ``--dataset_dir``, a tiny synthetic Speech Commands tree (tone
words) is written under /tmp and the net is trained on it — the full
pipeline (WAV -> mel -> SNN) is exercised end to end.

    python examples/speechcommands_kws.py [--epochs 8] [--channels 16]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spiking_diffusion_tpu.data.audio import SpeechCommands
from spiking_diffusion_tpu.snn.neuron import NeuronParams, lif_scan
from spiking_diffusion_tpu.snn.surrogate import SurrogateFn

SR = 16000
N_FFT = int(30e-3 * SR)  # 480 (speechcommands.py:337)
HOP = int(10e-3 * SR)  # 160
N_MELS = 40
F_MIN, F_MAX = 20.0, 4000.0

#: the reference's 12-class task: 10 command words + other + silence
#: (``speechcommands.py:68``); the synthetic fallback uses a subset
FULL_LABEL_DICT = {
    "yes": 0, "stop": 1, "no": 2, "right": 3, "up": 4, "left": 5,
    "on": 6, "down": 7, "off": 8, "go": 9, "_silence_": 11,
}


def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    mel = f / (200.0 / 3)
    log_region = f >= 1000.0
    mel = np.where(
        log_region,
        15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
        mel,
    )
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f = m * (200.0 / 3)
    log_region = m >= 15.0
    return np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)


def mel_filterbank(n_freqs, n_mels=N_MELS, f_min=F_MIN, f_max=F_MAX, sr=SR):
    """Slaney-normalized triangular filterbank (n_freqs, n_mels) — the
    reference's own ``create_fb_matrix`` (``speechcommands.py:138-176``)."""
    freqs = np.linspace(0, sr / 2, n_freqs)
    m_pts = np.linspace(
        _hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2
    )
    f_pts = _mel_to_hz_slaney(m_pts)
    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    enorm = 2.0 / (f_pts[2:] - f_pts[:-2])  # slaney area norm
    return (fb * enorm[None, :]).astype(np.float32)


def features(wave: np.ndarray, fb: np.ndarray) -> np.ndarray:
    """1 s waveform -> (T=101, n_mels) rescaled log-free mel power, the
    reference transform chain Pad -> Spectrogram -> MelScale -> Rescale
    (``speechcommands.py:239-256,345-354``)."""
    pad = (SR - len(wave)) // 2
    wave = np.pad(wave, (pad, SR - len(wave) - pad))
    from scipy.signal import stft

    # torchaudio Spectrogram: hann window, center-padded, power=2
    _, _, z = stft(
        wave, nperseg=N_FFT, noverlap=N_FFT - HOP, boundary="zeros",
        padded=False, window="hann",
    )
    spec = (np.abs(z) ** 2).astype(np.float32)  # (n_freqs, T)
    mel = spec.T @ fb  # (T, n_mels)
    std = mel.std(axis=0, keepdims=True)  # biased, per mel (Rescale)
    return mel / np.where(std == 0, 1.0, std)


LIF_P = NeuronParams(tau=10.0 / 7, surrogate=SurrogateFn("sigmoid", 10.0))


def conv_lif(x, w, dilation):
    """Conv2d over the (T, mel) plane (SAME-style reference paddings are
    baked into ``w``'s call site) followed by LIF scanning the frame axis.
    x: (N, T, M, C_in) -> (N, T', M', C_out)."""
    pad_t, pad_m, dil_t, dil_m = dilation
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((pad_t, pad_t), (pad_m, pad_m)),
        rhs_dilation=(dil_t, dil_m),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    s, _ = lif_scan(jnp.transpose(y, (1, 0, 2, 3)), params=LIF_P)
    return jnp.transpose(s, (1, 0, 2, 3))


def net_apply(params, x):
    """(N, T, M, 1) -> (N, classes). Reference Net (speechcommands.py:
    298-322): 3 dilated conv+LIF blocks, per-frame linear, mean over T."""
    h = conv_lif(x, params["w1"], (2, 1, 1, 1))
    h = conv_lif(h, params["w2"], (6, 3, 4, 3))
    h = conv_lif(h, params["w3"], (24, 9, 16, 9))
    n, t = h.shape[0], h.shape[1]
    h = h.reshape(n, t, -1)
    logits = h @ params["wf"] + params["bf"]  # (N, T, classes)
    return logits.mean(axis=1)


def init_params(key, channels, n_mels, n_classes):
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def conv_w(k, kh, kw, cin, cout):
        fan = kh * kw * cin
        return jax.random.normal(k, (kh, kw, cin, cout)) / np.sqrt(fan)

    return {
        "w1": conv_w(k1, 4, 3, 1, channels),
        "w2": conv_w(k2, 4, 3, channels, channels),
        "w3": conv_w(k3, 4, 3, channels, channels),
        "wf": jax.random.normal(k4, (channels * n_mels, n_classes))
        / np.sqrt(channels * n_mels),
        "bf": jnp.zeros((n_classes,)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", default=None,
                   help="extracted speech_commands dir (synthetic if unset)")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--channels", type=int, default=16,
                   help="conv width (reference: 64)")
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--silence_cnt", type=int, default=2)
    p.add_argument("--steps_per_epoch", type=int, default=8)
    args = p.parse_args()

    if args.dataset_dir is None:
        root = "/tmp/sd_tpu_speechcommands"
        labels = ("yes", "no", "stop", "go")
        if not os.path.isdir(root):
            SpeechCommands.synthesize(root, labels=labels, per_label=8)
        label_dict = {lb: i for i, lb in enumerate(labels)}
        label_dict["_silence_"] = len(labels)
        print(f"synthetic dataset at {root}")
    else:
        root = args.dataset_dir
        label_dict = FULL_LABEL_DICT
    n_classes = len(set(label_dict.values()))

    train = SpeechCommands(
        label_dict, root, "train", silence_cnt=args.silence_cnt
    )
    test = SpeechCommands(label_dict, root, "test")
    fb = mel_filterbank(N_FFT // 2 + 1)

    def featurize(ds, idx):
        xs, ys = [], []
        for i in idx:
            w, lb = ds[i]
            xs.append(features(w, fb))
            ys.append(lb)
        x = np.stack(xs)[..., None]  # (N, T, M, 1)
        # collate_fn batch-std rescale (speechcommands.py:258-266)
        std = x.std(axis=(0, 1), keepdims=True)
        return x / np.where(std == 0, 1, std), np.asarray(ys, np.int32)

    import optax

    key = jax.random.PRNGKey(0)
    params = init_params(key, args.channels, N_MELS, n_classes)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            logits = net_apply(p, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()
            return loss, (logits.argmax(-1) == y).mean()

        (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss, acc

    @jax.jit
    def predict(params, x):
        return net_apply(params, x).argmax(-1)

    rng = np.random.default_rng(0)
    w = train.weights / train.weights.sum()
    for epoch in range(args.epochs):
        losses, accs = [], []
        for _ in range(args.steps_per_epoch):
            idx = rng.choice(len(train), size=args.batch_size, p=w)
            x, y = featurize(train, idx)
            params, opt_state, loss, acc = train_step(
                params, opt_state, jnp.asarray(x), jnp.asarray(y)
            )
            losses.append(float(loss))
            accs.append(float(acc))
        xt, yt = featurize(test, range(len(test)))
        test_acc = float(
            (np.asarray(predict(params, jnp.asarray(xt))) == yt).mean()
        )
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"train_acc {np.mean(accs):.3f} test_acc {test_acc:.3f}")


if __name__ == "__main__":
    main()
