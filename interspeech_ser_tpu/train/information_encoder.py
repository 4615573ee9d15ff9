"""Information-encoder components: prosody reference encoder + timbre perturb.

Ports reference src/information_encoder/utils.py:
- ``ReferenceEncoderClassifier`` (L21-92): 6× Conv2d(3×3, stride 2) +
  BatchNorm + ReLU over melspec → GRU → (optional tanh proj) → classifier,
  used by the angular-prototypical speaker-style trainers.
- timbre perturbation (L187-281): Praat 'Change gender' formant shifting.
  This is a HOST-side CPU augmentation op (SURVEY.md §2.9). parselmouth is
  not in this image, so the default implementation is a spectral-envelope
  formant shift (STFT envelope warp, original phase) with the same
  segmentation/sampling structure; when parselmouth IS importable the
  exact Praat path is used instead.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.gru import gru_scan

try:  # exact Praat path when available
    import parselmouth  # type: ignore

    _HAS_PRAAT = True
except Exception:
    _HAS_PRAAT = False


class ReferenceEncoderClassifier(nn.Module):
    """mel [B, T, num_mel] → class logits [B, num_classes]."""

    num_mel: int
    embedding_dim: int
    num_classes: int
    use_nonlinear_proj: bool = False

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B = mel.shape[0]
        x = mel[:, :, :, None]  # NHWC: [B, T, num_mel, 1]
        filters = [32, 32, 64, 64, 128, 128]
        for i, f in enumerate(filters):
            x = nn.Conv(
                f, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], name=f"conv{i}"
            )(x)
            x = nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        # [B, T', H', 128] → [B, T', H'*128]
        x = x.reshape(B, x.shape[1], -1)
        H = self.embedding_dim
        bound = 1.0 / (H ** 0.5)
        u = lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound)
        w_ih = self.param("gru_w_ih", u, (x.shape[-1], 3 * H))
        w_hh = self.param("gru_w_hh", u, (H, 3 * H))
        b_ih = self.param("gru_b_ih", u, (3 * H,))
        b_hh = self.param("gru_b_hh", u, (3 * H,))
        seq = gru_scan(x, jnp.zeros((B, H), jnp.float32), w_ih, w_hh, b_ih, b_hh)
        out = seq[:, -1]  # final hidden state
        if self.use_nonlinear_proj:
            out = jnp.tanh(nn.Dense(H, name="proj")(out))
            out = nn.Dropout(0.5)(out, deterministic=deterministic)
        return nn.Dense(self.num_classes, name="classifier_layer")(out)


# ---------------------------------------------------------------------------
# Timbre perturbation (host-side augmentation)
# ---------------------------------------------------------------------------


def formant_shift_sampler(ratio: float, rng: Optional[np.random.Generator] = None) -> float:
    """U(1, ratio), flipped to its inverse with p=0.5 (reference L187-197)."""
    rng = rng or np.random.default_rng()
    shift = rng.random() * (ratio - 1.0) + 1.0
    if rng.random() < 0.5:
        shift = shift ** -1
    return float(shift)


def _formant_shift_dsp(
    wav: np.ndarray, sr: int, shift: float, lift: int = 40
) -> np.ndarray:
    """Source-filter spectral-envelope warp (Praat-free approximation of
    'Change gender' at formant ratio ``shift``, pitch factors 1.0).

    Per STFT frame the log-magnitude is split into a cepstrally-smoothed
    envelope (quefrencies < ``lift``) and the harmonic excitation
    residual; only the ENVELOPE is resampled by ``shift`` along
    frequency, so formants move while pitch/harmonics stay put — which is
    what Praat's formant-shift does. Original phase kept.

    Measured fidelity (tests/test_information_encoder.py::
    TestFormantShiftFidelity): against directly-synthesized shifted-
    formant vowels (f0 110-210 Hz, 2-3 formants, shifts 0.8/1.25/1.4),
    mel-spectral distance to the ideal target is 3.0 dB mean / 4.7 dB
    worst, and the output is ALWAYS closer to the target than the input
    is (the pre-r03 whole-spectrum warp failed that at f0≥180 because it
    dragged the harmonics along: 5.7 dB mean / 9.9 worst). Envelope peaks
    scale by the requested ratio within 12%.
    """
    if len(wav) < 512 or abs(shift - 1.0) < 1e-3:
        return wav.astype(np.float32)
    from scipy.signal import stft as sp_stft, istft as sp_istft

    f, t, Z = sp_stft(wav, fs=sr, nperseg=512, noverlap=384)
    mag, phase = np.abs(Z), np.angle(Z)
    n_bins = mag.shape[0]
    logm = np.log(np.maximum(mag, 1e-10))
    # cepstral smoothing along frequency (even extension, low-quefrency keep)
    ext = np.concatenate([logm, logm[-2:0:-1]], axis=0)
    cep = np.fft.rfft(ext, axis=0)
    cep[lift:] = 0
    env = np.fft.irfft(cep, n=ext.shape[0], axis=0)[:n_bins]
    exc = logm - env
    src_bins = np.clip(np.arange(n_bins) / shift, 0, n_bins - 1)
    lo = np.floor(src_bins).astype(int)
    hi = np.minimum(lo + 1, n_bins - 1)
    frac = (src_bins - lo)[:, None]
    env_w = env[lo] * (1 - frac) + env[hi] * frac
    warped = np.exp(env_w + exc)
    _, out = sp_istft(warped * np.exp(1j * phase), fs=sr, nperseg=512, noverlap=384)
    out = out[: len(wav)]
    if len(out) < len(wav):
        out = np.pad(out, (0, len(wav) - len(out)))
    return out.astype(np.float32)


def timbre_perturb(
    wav: np.ndarray,
    sr: int,
    formant_shift: float = 1.0,
    pitch_steps: float = 0.01,
    pitch_floor: float = 75,
    pitch_ceil: float = 600,
    fname: str = "null",
) -> np.ndarray:
    """Single-shift perturbation (reference L211-258)."""
    if _HAS_PRAAT:  # exact Praat 'Change gender' path
        snd = parselmouth.Sound(wav, sampling_frequency=sr)
        try:
            pitch = parselmouth.praat.call(snd, "To Pitch", pitch_steps, pitch_floor, pitch_ceil)
        except Exception:
            return snd.values[0]
        ndpit = pitch.selected_array["frequency"]
        nonzero = ndpit > 1e-5
        if nonzero.sum() == 0:
            return snd.values[0]
        median = float(np.median(ndpit[nonzero]))
        (out,) = parselmouth.praat.call(
            (snd, pitch), "Change gender", formant_shift, median, 1.0, 1.0
        ).values
        return out
    return _formant_shift_dsp(np.asarray(wav, np.float32), sr, formant_shift)


def sliced_timbre_perturb(
    wav: np.ndarray,
    sr: int = 16000,
    segment_size: int = 16000 // 2,
    formant_rate: float = 1.4,
    pitch_steps: float = 0.01,
    pitch_floor: float = 75,
    pitch_ceil: float = 600,
    fname: str = "null",
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Per-segment random formant shifts (reference L199-209)."""
    rng = rng or np.random.default_rng()
    out = []
    for i in range(len(wav) // segment_size + 1):
        seg = wav[segment_size * i : segment_size * (i + 1)]
        if len(seg) == 0:
            continue
        shift = formant_shift_sampler(formant_rate, rng)
        out.append(timbre_perturb(seg, sr, shift, pitch_steps, pitch_floor, pitch_ceil, fname))
    return np.concatenate(out) if out else np.asarray(wav)


def fixed_timbre_perturb(
    wav: np.ndarray,
    sr: int = 16000,
    segment_size: int = 16000 // 2,
    formant_rate: float = 1.4,
    pitch_steps: float = 0.01,
    pitch_floor: float = 75,
    pitch_ceil: float = 600,
    fname: str = "null",
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """One sampled shift for the whole utterance (reference L260-281;
    the WavSet augmentation, benchmark/utils/dataset/dataset.py:176-179)."""
    shift = formant_shift_sampler(formant_rate, rng)
    return timbre_perturb(wav, sr, shift, pitch_steps, pitch_floor, pitch_ceil, fname)


def train_reference_encoder(
    model,
    train_batches,
    val_batches,
    epochs: int = 100,
    eval_epochs: int = 5,
    lr: float = 0.001,
    save_model_path: Optional[str] = None,
    checkpoint_every: int = 5000,
    seed: int = 0,
    log=print,
):
    """Adam + CE epoch trainer for ``ReferenceEncoderClassifier``.

    Capability port of the reference's generic train loop
    (src/information_encoder/utils.py:96-184): per-epoch train accuracy,
    val every ``eval_epochs`` epochs, periodic ``checkpoint_<iter>``
    saves and best-val-loss ``best_model_<iter>`` saves (torch-format
    flat state dicts). ``train_batches``/``val_batches`` are callables
    returning iterables of (melspec [B, T, M] np, labels [B] np) — the
    reference's DataLoader role.

    Returns (params, train_loss, val_loss, train_acc, val_acc).
    """
    import os as _os

    import jax
    import jax.numpy as jnp
    import optax

    from ..utils import ptio

    key = jax.random.PRNGKey(seed)
    first = next(iter(train_batches()))
    variables = model.init(key, jnp.asarray(first[0][:1]), deterministic=False)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def _ce(logits, y):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.mean(-jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0])

    @jax.jit
    def step(p, bs, opt_state, mel, y):
        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": bs}, mel, deterministic=False,
                mutable=["batch_stats"],
            )
            return _ce(logits, y), (logits, updates["batch_stats"])

        (loss, (logits, bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(p, updates), bs, opt_state, loss, logits

    @jax.jit
    def eval_fwd(p, bs, mel, y):
        logits = model.apply({"params": p, "batch_stats": bs}, mel)
        return _ce(logits, y), logits

    def save(name):
        if save_model_path is None:
            return
        _os.makedirs(save_model_path, exist_ok=True)
        flat = {}

        def rec(node, prefix):
            for k, v in node.items():
                if isinstance(v, dict):
                    rec(v, f"{prefix}{k}.")
                else:
                    flat[f"{prefix}{k}"] = np.asarray(v)

        rec(jax.tree.map(np.asarray, params), "")
        rec(jax.tree.map(np.asarray, {"batch_stats": bstats}), "")
        ptio.save_state_dict(flat, _os.path.join(save_model_path, name))

    train_loss, val_loss, train_acc, val_acc = [], [], [], []
    best_loss = float("inf")
    it = 0
    for epoch in range(epochs):
        correct = total = 0
        for mel, y in train_batches():
            params, bstats, opt_state, loss, logits = step(
                params, bstats, opt_state, jnp.asarray(mel), jnp.asarray(y)
            )
            train_loss.append(float(loss))
            correct += int((np.asarray(logits).argmax(-1) == np.asarray(y)).sum())
            total += len(y)
            it += 1
            if it % checkpoint_every == 0:
                save(f"checkpoint_{it}.pth")
        train_acc.append(correct / max(total, 1))

        if epoch % eval_epochs == 0:
            correct = total = 0
            losses_e = []
            for mel, y in val_batches():
                loss, logits = eval_fwd(
                    params, bstats, jnp.asarray(mel), jnp.asarray(y)
                )
                losses_e.append(float(loss))
                val_loss.append(float(loss))
                correct += int((np.asarray(logits).argmax(-1) == np.asarray(y)).sum())
                total += len(y)
            avg = float(np.mean(losses_e)) if losses_e else float("nan")
            val_acc.append(correct / max(total, 1))
            if avg < best_loss:
                best_loss = avg
                save(f"best_model_{it}.pth")
            log(f"epoch {epoch}: train acc={train_acc[-1]:.3f} "
                f"val loss={avg:.4f} acc={val_acc[-1]:.3f}")
    return params, train_loss, val_loss, train_acc, val_acc
