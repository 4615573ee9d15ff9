"""LoRA fine-tuning engine + wrapper classifier models.

Ports the reference's two LoRA stacks onto the functional transform in
models/lora.py:

- ``MeanPoolClassifier``: WavLM/Whisper encoder → mean-pool →
  Linear(→512)→ReLU→Dropout(.5)→Linear(→8) — the production fine-tune whose
  checkpoint feeds ``preprocess_{speech,whisper}_pretrained``
  (reference: preprocessing/preprocess_speech_pretrained.py:108-163).
- ``WavLMWrapperModel``: learnable softmax layer-weighted sum of hidden
  states → 3×(pointwise conv + ReLU + Dropout .1) → mean/masked pooling →
  Linear→ReLU→Linear head (reference: lora_wavlm/model.py:123-199).

Training updates only the LoRA factors + downstream head (the base tree is
stop-gradient'd), with weighted CE, ReduceLROnPlateau, and UAR/ACC
tracking, mirroring lora_wavlm/ft_lora.py (which the reference ships as a
non-runnable sketch — SURVEY.md §2.6; this engine is the runnable version).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..models import lora as lora_lib
from ..ops.kernel_context import kernel_mesh
from ..utils import ptio
from ..utils.metrics import accuracy
from . import losses


class MeanPoolClassifier(nn.Module):
    """last_hidden_state mean-pool → 512 MLP → logits."""

    hidden_size: int
    num_emotions: int = 8

    @nn.compact
    def __call__(self, feats, frame_mask=None, deterministic=True):
        if frame_mask is not None:
            denom = jnp.maximum(frame_mask.sum(axis=1, keepdims=True), 1.0)
            pooled = (feats * frame_mask[:, :, None]).sum(axis=1) / denom
        else:
            pooled = feats.mean(axis=1)
        h = nn.Dense(512, name="fc1")(pooled)
        h = nn.relu(h)
        h = nn.Dropout(0.5)(h, deterministic=deterministic)
        return nn.Dense(self.num_emotions, name="fc2")(h)


class WavLMWrapperModel(nn.Module):
    """Layer-weighted hidden-state fusion head (lora_wavlm/model.py)."""

    num_layers: int
    hidden_size: int
    hidden_dim: int = 256
    output_class_num: int = 4
    use_conv_output: bool = True

    @nn.compact
    def __call__(self, hidden_states: Sequence[jnp.ndarray], lengths=None, deterministic=True):
        if self.use_conv_output:
            stack = jnp.stack(hidden_states, axis=0)  # [L+1, B, T, D]
            w0 = jnp.ones((self.num_layers + 1,)) / (self.num_layers + 1)
        else:
            stack = jnp.stack(hidden_states[1:], axis=0)
            w0 = jnp.zeros((self.num_layers,))
        weights = self.param("layer_weights", lambda k, s: jnp.asarray(w0), w0.shape)
        norm_w = jax.nn.softmax(weights)
        feats = jnp.einsum("l,lbtd->btd", norm_w, stack)

        h = feats
        for i in range(3):
            h = nn.Dense(self.hidden_dim, name=f"seq{i}")(h)  # 1x1 conv == Dense
            if i < 2:
                h = nn.relu(h)
                h = nn.Dropout(0.1)(h, deterministic=deterministic)
        if lengths is not None:
            T = h.shape[1]
            mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(h.dtype)
            pooled = (h * mask[:, :, None]).sum(axis=1) / jnp.maximum(
                lengths[:, None].astype(h.dtype), 1.0
            )
        else:
            pooled = h.mean(axis=1)
        out = nn.Dense(self.hidden_dim, name="out1")(pooled)
        out = nn.relu(out)
        return nn.Dense(self.output_class_num, name="out2")(out)


def uar(y_true, y_pred, num_classes: int) -> float:
    """Unweighted average recall (lora_wavlm/evaluation.py UAR)."""
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    recalls = []
    for c in range(num_classes):
        sel = y_true == c
        if sel.sum():
            recalls.append(float((y_pred[sel] == c).mean()))
    return float(np.mean(recalls)) if recalls else 0.0


class ReduceLROnPlateau:
    """Host-side torch-equivalent scheduler (mode=min)."""

    def __init__(self, lr: float, factor: float = 0.5, patience: int = 2, min_lr: float = 1e-7):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best - 1e-12:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad = 0
        return self.lr


class LoRAFTEngine:
    """Fine-tune a speech/whisper encoder with LoRA + a classifier head."""

    def __init__(
        self,
        ssl_type: str,
        rank: int = 8,
        alpha: float = 16.0,
        target: str = "qv",  # 'qv' (peft variant) | 'ffn' (loralib variant)
        num_emotions: int = 8,
        seed: int = 7,
        dtype: str = "float32",
        n_devices: Optional[int] = None,
    ):
        import dataclasses as _dc

        from transformers import AutoConfig

        from ..models.loader import _resolve_dir, build_speech_encoder, build_whisper_encoder
        from ..parallel.mesh import make_mesh

        # Whisper dirs dispatch to the encoder-only whisper stack (the
        # reference fine-tunes it with the same peft q/v LoRA —
        # preprocessing/preprocess_whisper_pretrained.py:117-169); the
        # mel frontend runs on-device inside the same jit.
        self.is_whisper = AutoConfig.from_pretrained(_resolve_dir(ssl_type)).model_type == "whisper"
        if self.is_whisper:
            if target != "qv":
                raise ValueError(
                    "whisper LoRA targets q/v projections (peft variant); "
                    "'ffn' matches no whisper parameter names"
                )
            self.model, self.base_params, self.cfg = build_whisper_encoder(
                ssl_type, dtype=dtype
            )
            # measured training default: differentiable one-shot attention
            # pair, 1.279x vs XLA autodiff at whisper fine-tune shapes
            # (scripts/exp_attn_bwd.py) — engages only on bf16 + TPU.
            self.cfg = _dc.replace(self.cfg, train_kernels=True)
            self.model = self.model.clone(config=self.cfg)
            self.do_normalize = False  # whisper frontend is log-mel, not z-norm
            hidden = self.cfg.d_model
        else:
            self.model, self.base_params, self.cfg, self.do_normalize = build_speech_encoder(
                ssl_type, dtype=dtype
            )
            hidden = self.cfg.hidden_size
        # data-parallel over the mesh (GSPMD jit): batches sharded along
        # rows, base/LoRA/head replicated, grad all-reduce by XLA. The
        # train step traces under ops.kernel_context.kernel_mesh, so on a
        # multi-device mesh the whisper train-kernel pair engages through
        # attention_core's nested per-shard shard_map (same measured
        # 1.28-1.56x default as one chip) instead of self-gating to XLA.
        self.mesh = make_mesh(n_devices)
        self.n_data = self.mesh.shape["data"]
        self.rank, self.alpha = rank, alpha
        match = lora_lib.match_attention_qv if target == "qv" else lora_lib.match_ffn_dense
        key = jax.random.PRNGKey(seed)
        k_lora, k_head, self.key = jax.random.split(key, 3)
        self.lora = lora_lib.init_lora(k_lora, self.base_params, match, rank)
        self.head = MeanPoolClassifier(hidden, num_emotions)
        self.head_params = self.head.init(
            k_head, jnp.zeros((1, 4, hidden))
        )["params"]
        self.num_emotions = num_emotions
        self._steps: Dict = {}

    def _forward(self, base, lora, head, wav, mask, deterministic, dkey=None):
        merged = lora_lib.merge_lora(base, lora, self.alpha, self.rank)
        if self.is_whisper:
            from ..extract.pipeline import WhisperExtractionPipeline
            from ..ops.mel import whisper_log_mel

            N = WhisperExtractionPipeline.N_SAMPLES  # 480000 = 30 s
            B, L = wav.shape
            w30 = wav[:, :N] if L >= N else jnp.pad(wav, ((0, 0), (0, N - L)))
            mel = whisper_log_mel(w30, self.cfg.num_mel_bins)
            out = self.model.apply({"params": merged}, mel)
            # true frame count = ceil(samples/320) (preprocess_whisper.py:50)
            n_samp = jnp.minimum(jnp.sum(mask, axis=1), N)
            T = out["last_hidden_state"].shape[1]
            out = dict(
                out,
                frame_mask=(
                    jnp.arange(T)[None, :] * 320 < n_samp[:, None]
                ).astype(jnp.float32),
            )
        else:
            out = self.model.apply({"params": merged}, wav, mask)
        rngs = None if deterministic else {"dropout": dkey}
        return self.head.apply(
            {"params": head},
            out["last_hidden_state"],
            out["frame_mask"],
            deterministic=deterministic,
            rngs=rngs,
        )

    def train_epochs(
        self,
        wavs: Sequence[np.ndarray],
        labels: np.ndarray,
        dev_wavs: Sequence[np.ndarray],
        dev_labels: np.ndarray,
        epochs: int = 5,
        batch_size: int = 8,
        lr: float = 5e-4,
        class_weights: Optional[np.ndarray] = None,
        log=print,
    ) -> Dict:
        from ..utils.audio import normalize_waveform
        from ..utils.seeding import numpy_generator

        from ..parallel.mesh import replicate, shard_batch

        rng = numpy_generator(0)
        tx = optax.inject_hyperparams(optax.adamw)(learning_rate=lr, weight_decay=1e-2)
        trainable = replicate(self.mesh, {"lora": self.lora, "head": self.head_params})
        opt_state = replicate(self.mesh, tx.init(trainable))
        # base rides as a jit ARGUMENT (closed-over device trees lower as
        # HLO constants — payload bloat on the remote-compile tunnel) and
        # carries an explicit replicated sharding for the mesh
        base = replicate(self.mesh, self.base_params)
        cw = jnp.asarray(class_weights) if class_weights is not None else None
        sched = ReduceLROnPlateau(lr)

        def step(base, trainable, opt_state, wav, mask, y, smask, dkey, lr_now):
            def loss_fn(t):
                logits = self._forward(
                    lora_lib.freeze_base(base), t["lora"], t["head"], wav, mask, False, dkey
                )
                return losses.weighted_cross_entropy(logits, y, cw, smask)

            # trace-time context: on a >1-device mesh attention_core wraps
            # the differentiable Pallas pair in a nested shard_map over
            # 'data' (ops/kernel_context.py) — GSPMD math stays global
            with kernel_mesh(self.mesh):
                loss, grads = jax.value_and_grad(loss_fn)(trainable)
            opt_state.hyperparams["learning_rate"] = lr_now
            updates, opt_state = tx.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), opt_state, loss

        step_jit: Dict = {}
        history = []
        n = len(wavs)
        norm = [normalize_waveform(w, self.do_normalize) for w in wavs]
        dev_norm = [normalize_waveform(w, self.do_normalize) for w in dev_wavs]
        lr_now = lr
        # static rows: batch padded up to a mesh multiple (smask 0 rows
        # contribute zero loss/grad, so the step is shard-count invariant)
        rows = -(-batch_size // self.n_data) * self.n_data
        for epoch in range(epochs):
            order = rng.permutation(n)
            for s in range(0, n, batch_size):
                idxs = order[s : s + batch_size]
                L = max(len(norm[i]) for i in idxs)
                L = ((L + 3199) // 3200) * 3200
                wav = np.zeros((rows, L), np.float32)
                mask = np.zeros((rows, L), np.float32)
                y = np.zeros((rows,), np.int32)
                smask = np.zeros((rows,), np.float32)
                for r, i in enumerate(idxs):
                    wav[r, : len(norm[i])] = norm[i]
                    mask[r, : len(norm[i])] = 1
                    y[r] = labels[i]
                    smask[r] = 1
                sig = wav.shape
                if sig not in step_jit:
                    step_jit[sig] = jax.jit(step, donate_argnums=(1, 2))
                self.key, dkey = jax.random.split(self.key)
                wav_d, mask_d, y_d, smask_d = shard_batch(
                    self.mesh, (wav, mask, y, smask)
                )
                trainable, opt_state, loss = step_jit[sig](
                    base, trainable, opt_state,
                    wav_d, mask_d, y_d, smask_d,
                    replicate(self.mesh, dkey), lr_now,
                )
            self.lora, self.head_params = trainable["lora"], trainable["head"]
            dev_pred = self.predict(dev_norm, batch_size)
            dev_acc = accuracy(dev_labels, dev_pred)
            dev_uar = uar(dev_labels, dev_pred, self.num_emotions)
            lr_now = sched.step(1.0 - dev_uar)
            log(
                f"epoch {epoch}: loss={float(loss):.4f} dev_acc={dev_acc:.4f} "
                f"dev_uar={dev_uar:.4f} lr={lr_now:.2e}"
            )
            history.append({"epoch": epoch, "acc": dev_acc, "uar": dev_uar})
        return {"history": history}

    def predict(self, wavs: Sequence[np.ndarray], batch_size: int = 8) -> np.ndarray:
        from ..parallel.mesh import replicate, shard_batch

        preds = np.zeros(len(wavs), np.int64)
        fwd_jit: Dict = {}
        rows = -(-batch_size // self.n_data) * self.n_data
        base = replicate(self.mesh, self.base_params)
        lora = replicate(self.mesh, self.lora)
        head = replicate(self.mesh, self.head_params)
        for s in range(0, len(wavs), batch_size):
            chunk = wavs[s : s + batch_size]
            L = ((max(len(w) for w in chunk) + 3199) // 3200) * 3200
            wav = np.zeros((rows, L), np.float32)
            mask = np.zeros((rows, L), np.float32)
            for r, w in enumerate(chunk):
                wav[r, : len(w)] = w
                mask[r, : len(w)] = 1
            sig = wav.shape
            if sig not in fwd_jit:

                def _fwd(b, l, h, w, m):
                    # same trace-time context as the train step: on a
                    # >1-device mesh the whisper attention pair engages
                    # per-shard instead of self-gating to XLA
                    with kernel_mesh(self.mesh):
                        return self._forward(b, l, h, w, m, True)

                fwd_jit[sig] = jax.jit(_fwd)
            wav_d, mask_d = shard_batch(self.mesh, (wav, mask))
            logits = np.asarray(fwd_jit[sig](base, lora, head, wav_d, mask_d))
            preds[s : s + len(chunk)] = np.argmax(logits[: len(chunk)], axis=1)
        return preds

    # -- checkpoints -----------------------------------------------------------

    def save(self, path: str) -> None:
        """LoRA factors + head in one torch state dict (loralib-style)."""
        sd = lora_lib.lora_state_dict(self.lora)
        head = jax.tree.map(np.asarray, self.head_params)
        sd["classifier.fc1.kernel"] = head["fc1"]["kernel"]
        sd["classifier.fc1.bias"] = head["fc1"]["bias"]
        sd["classifier.fc2.kernel"] = head["fc2"]["kernel"]
        sd["classifier.fc2.bias"] = head["fc2"]["bias"]
        ptio.save_state_dict(sd, path)

    def load(self, path: str) -> None:
        sd = ptio.load_state_dict(path)
        if any(".lora_A.default." in k for k in sd):  # peft-style checkpoint
            self.lora = lora_lib.lora_from_peft_state_dict(sd)
        else:
            self.lora = lora_lib.lora_from_state_dict(sd)
        if "classifier.fc1.kernel" in sd:
            self.head_params = {
                "fc1": {"kernel": sd["classifier.fc1.kernel"], "bias": sd["classifier.fc1.bias"]},
                "fc2": {"kernel": sd["classifier.fc2.kernel"], "bias": sd["classifier.fc2.bias"]},
            }

    def merged_backbone_params(self) -> Dict:
        """LoRA-merged encoder params for the *_pretrained extraction CLIs."""
        return lora_lib.merge_lora(self.base_params, self.lora, self.alpha, self.rank)
