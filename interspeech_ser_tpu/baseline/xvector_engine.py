"""X-vector SER trainer (reference bin/old/train_cat_baselinelike_xvector.py).

The reference fine-tunes speechbrain's pretrained ``spkrec-xvect-voxceleb``
encoder (fbank → 5 TDNN blocks → stats pooling → 512-d embedding, trained
with AdamW at the same LR as the head, :201-207) jointly with an
``EmotionRegression(512, head_dim, 1, 8)`` head under weighted CE; best
dev-loss checkpointing saves ``final_ser.pt`` + ``final_xvector.pt``
(:307-312). speechbrain is not installable in this image, so the encoder is
the repo's :class:`~interspeech_ser_tpu.models.xvector.XVector` with a
speechbrain checkpoint converter — pass ``xvector_ckpt`` to start from the
pretrained voxceleb weights when available; otherwise training starts from
random init (documented deviation, zero-egress image).

NOTE (replicate-or-fix decision): the reference computes the dev loss on
only the LAST dev batch (:283-287 uses ``emo_pred``/``y`` after the loop
instead of the concatenated ``total_pred``/``total_y``) — a latent bug that
makes model selection noisy. We compute it on the full dev set (the evident
intent); flag ``last_batch_dev_loss=True`` replicates the bug bit-for-bit.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.xvector import XVector, xvector_from_speechbrain, xvector_to_speechbrain
from ..ops.mel import speechbrain_fbank
from ..utils import ptio
from ..utils.labels import CLASSES
from ..utils.metrics import LogManager
from ..utils.seeding import numpy_generator
from ..train import losses
from . import data as bdata
from .models import (
    EmotionRegression,
    ser_flax_to_torch,
    ser_torch_to_flax,
)


class XVectorEngine:
    def __init__(
        self,
        head_dim: int = 1024,
        seed: int = 7,
        xvector_ckpt: Optional[str] = None,
        last_batch_dev_loss: bool = False,
        n_devices: Optional[int] = None,
    ):
        from ..parallel.mesh import make_mesh

        # data-parallel over the mesh (GSPMD jit, same recipe as
        # BaselineEngine); BatchNorm batch moments become global under
        # GSPMD — i.e. sync-BN — so the step is shard-count invariant
        self.mesh = make_mesh(n_devices)
        self.n_data = self.mesh.shape["data"]
        self.xvector = XVector()
        self.head = EmotionRegression(512, head_dim, 1, 8, dropout=0.5)
        self.head_dim = head_dim
        self.rng = numpy_generator(seed)
        self.key = jax.random.PRNGKey(seed)
        self.last_batch_dev_loss = last_batch_dev_loss

        self.key, k1, k2 = jax.random.split(self.key, 3)
        xv_vars = self.xvector.init(k1, jnp.zeros((1, 16, 24), jnp.float32))
        if xvector_ckpt:
            xv_vars = xvector_from_speechbrain(ptio.load_state_dict(xvector_ckpt))
            xv_vars = {
                "params": jax.tree.map(jnp.asarray, xv_vars["params"]),
                "batch_stats": jax.tree.map(jnp.asarray, xv_vars["batch_stats"]),
            }
        self.xv_params = xv_vars["params"]
        self.xv_stats = xv_vars.get("batch_stats", {})
        self.head_params = self.head.init(k2, jnp.zeros((1, 512)))["params"]

    # -- forward -------------------------------------------------------------

    def _apply(self, xv_params, xv_stats, head_params, wav, lengths, train, dkey=None):
        feats = speechbrain_fbank(wav, lengths=lengths)
        out = self.xvector.apply(
            {"params": xv_params, "batch_stats": xv_stats},
            feats,
            lengths=1 + lengths.astype(jnp.int32) // 160,
            train=train,
            mutable=["batch_stats"] if train else False,
        )
        if train:
            emb, updates = out
            new_stats = updates["batch_stats"]
        else:
            emb, new_stats = out, xv_stats
        rngs = None if dkey is None else {"dropout": dkey}
        pred = self.head.apply(
            {"params": head_params}, emb, deterministic=not train, rngs=rngs
        )
        return pred, new_stats

    # -- training ------------------------------------------------------------

    def fit(
        self,
        label_path: str,
        audio_path: str,
        model_path: str,
        batch_size: int = 32,
        accumulation_steps: int = 1,
        epochs: int = 10,
        lr: float = 1e-4,
        use_balanced_batch: bool = False,
        normalize_wav: bool = True,
        log=print,
    ) -> Dict:
        from .podcast import load_cat_emo_label

        os.makedirs(model_path, exist_ok=True)
        train_utts, train_labs = load_cat_emo_label(label_path, "train")
        dev_utts, dev_labs = load_cat_emo_label(label_path, "dev")
        train_wavs = bdata.load_audio(audio_path, train_utts)
        dev_wavs = bdata.load_audio(audio_path, dev_utts)
        train_set = bdata.WavDataset(
            train_wavs, train_labs, train_utts, normalize_wav=normalize_wav
        )
        train_set.save_norm_stat(os.path.join(model_path, "train_norm_stat.pkl"))
        dev_set = bdata.WavDataset(
            dev_wavs, dev_labs, dev_utts,
            wav_mean=train_set.wav_mean, wav_std=train_set.wav_std,
            normalize_wav=normalize_wav,
        )

        freq = np.asarray(train_labs).sum(axis=0).astype(np.float64)
        w = np.where(
            freq != 0, len(train_labs) / (len(CLASSES) * np.maximum(freq, 1)), 0.0
        )
        class_weights = jnp.asarray(w, jnp.float32)

        # two AdamW at the same LR (reference :201-207); AdamW is
        # per-parameter, so one optimizer over both trees is identical.
        # torch.optim.AdamW defaults weight_decay=1e-2 (optax's is 1e-4).
        from ..parallel.mesh import make_mesh, replicate, shard_batch

        micro_bs = batch_size // accumulation_steps
        # BatchNorm batch moments include every static row, so padded
        # rows are NOT free here (unlike the mask-excluded losses of the
        # other engines) — the micro batch must split evenly; when it
        # does not, train on the largest sub-mesh that divides it
        mesh, n_data = self.mesh, self.n_data
        if micro_bs % n_data:
            n_data = max(
                d for d in range(1, min(micro_bs, n_data) + 1)
                if micro_bs % d == 0
            )
            mesh = make_mesh(n_data)
            log(
                f"micro batch {micro_bs} not divisible by the "
                f"{self.n_data}-device mesh; training on {n_data} device(s)"
            )

        tx = optax.adamw(lr, weight_decay=1e-2)
        params = replicate(mesh, {"xv": self.xv_params, "head": self.head_params})
        opt_state = replicate(mesh, tx.init(params))

        def grad_step(params, xv_stats, wav, lengths, y, smask, dkey):
            def loss_fn(p):
                pred, new_stats = self._apply(
                    p["xv"], xv_stats, p["head"], wav, lengths, True, dkey
                )
                loss = losses.weighted_cross_entropy(pred, y, class_weights, smask)
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return loss, new_stats, grads

        grad_jit: Dict = {}
        apply_jit = jax.jit(
            lambda p, s, g, n: (
                lambda us: (optax.apply_updates(p, us[0]), us[1])
            )(tx.update(jax.tree.map(lambda x: x / n, g), s, p)),
            donate_argnums=(0, 1, 2),
        )
        add = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b), donate_argnums=(0,))

        sample_w = None
        if use_balanced_batch:
            sample_w = bdata.inverse_freq_sample_weights(train_labs)

        lm = LogManager()
        lm.alloc_stat_type_list(["train_loss", "dev_loss"])
        best = {"epoch": -1, "loss": float("inf")}
        xv_stats = replicate(mesh, self.xv_stats)
        n = len(train_set)
        lengths_arr = np.asarray([len(w_) for w_ in train_set.wav_list])

        for epoch in range(epochs):
            log(f"Epoch: {epoch}")
            lm.init_stat()
            if sample_w is not None:
                order = self.rng.choice(n, size=n, replace=True, p=sample_w)
                batches = [list(order[i : i + micro_bs]) for i in range(0, n, micro_bs)]
            else:
                batches = bdata.epoch_batches(n, micro_bs, self.rng, True, lengths_arr)
            accum, n_micro = None, 0
            for i, idxs in enumerate(batches):
                b = bdata.collate_wav(train_set, idxs, micro_bs)
                lens = b.mask.sum(axis=1)
                sig = b.wav.shape
                if sig not in grad_jit:
                    grad_jit[sig] = jax.jit(grad_step)
                self.key, dkey = jax.random.split(self.key)
                batch_d = shard_batch(
                    mesh,
                    (b.wav, lens, np.argmax(b.labels, axis=1), b.sample_mask),
                )
                loss, xv_stats, grads = grad_jit[sig](
                    params, xv_stats, *batch_d, replicate(mesh, dkey),
                )
                accum = grads if accum is None else add(accum, grads)
                n_micro += 1
                if (i + 1) % accumulation_steps == 0 or (i + 1) == len(batches):
                    params, opt_state = apply_jit(params, opt_state, accum, float(n_micro))
                    accum, n_micro = None, 0
                lm.add_stat("train_loss", float(loss))

            self.xv_params, self.head_params = params["xv"], params["head"]
            self.xv_stats = xv_stats
            dev = self.evaluate(dev_set, class_weights)
            lm.add_stat("dev_loss", dev["loss"])
            lm.print_stat()
            log(f"|VALIDATION| Epoch ({epoch + 1}/{epochs}): eval_loss = {dev['loss']}")
            if dev["loss"] < best["loss"]:
                best = {"epoch": epoch, "loss": dev["loss"]}
                log(f"New best model at epoch {epoch + 1}")
                self.save_checkpoints(model_path)
        return best

    # -- evaluation ------------------------------------------------------------

    def predict(self, dataset: bdata.WavDataset, batch_size: int = 8) -> np.ndarray:
        n = len(dataset)
        order = np.argsort([len(w) for w in dataset.wav_list], kind="stable")
        preds = np.zeros((n, 8), np.float32)
        # cache jitted eval fns across calls: fit() evaluates every epoch
        # and a per-call cache would recompile every bucket every epoch
        eval_jit: Dict = self.__dict__.setdefault("_eval_jit", {})
        from ..parallel.mesh import replicate, shard_batch

        # eval uses running stats (no batch moments), so padded rows ARE
        # free here — round rows up to a mesh multiple like BaselineEngine
        rows = -(-batch_size // self.n_data) * self.n_data
        rep = replicate(
            self.mesh, (self.xv_params, self.xv_stats, self.head_params)
        )
        for s in range(0, n, batch_size):
            idxs = order[s : s + batch_size].tolist()
            b = bdata.collate_wav(dataset, idxs, rows)
            sig = b.wav.shape
            if sig not in eval_jit:
                eval_jit[sig] = jax.jit(
                    lambda xp, xs, hp, w, l: self._apply(xp, xs, hp, w, l, False)[0]
                )
            lens = b.mask.sum(axis=1)
            wav_d, lens_d = shard_batch(self.mesh, (b.wav, lens))
            pred = np.asarray(eval_jit[sig](*rep, wav_d, lens_d))
            preds[idxs] = pred[: len(idxs)]
        return preds

    def evaluate(self, dataset: bdata.WavDataset, class_weights) -> Dict:
        from ..train.engine import _host_weighted_ce

        preds = self.predict(dataset)
        y = np.argmax(np.asarray(dataset.labels), axis=1)
        if self.last_batch_dev_loss:
            # replicate the reference's last-batch dev loss (:283-287)
            preds_, y_ = preds[-8:], y[-8:]
        else:
            preds_, y_ = preds, y
        loss = _host_weighted_ce(preds_, y_, np.asarray(class_weights))
        return {"loss": loss, "preds": preds, "y": y}

    # -- checkpoints ------------------------------------------------------------

    def save_checkpoints(self, model_path: str) -> None:
        ptio.save_state_dict(
            ser_flax_to_torch(jax.tree.map(np.asarray, self.head_params), 1),
            os.path.join(model_path, "final_ser.pt"),
        )
        ptio.save_state_dict(
            xvector_to_speechbrain(
                {
                    "params": jax.tree.map(np.asarray, self.xv_params),
                    "batch_stats": jax.tree.map(np.asarray, self.xv_stats),
                }
            ),
            os.path.join(model_path, "final_xvector.pt"),
        )

    def load_checkpoints(self, model_path: str) -> None:
        self.head_params = ser_torch_to_flax(
            ptio.load_state_dict(os.path.join(model_path, "final_ser.pt")), 1
        )
        xv = xvector_from_speechbrain(
            ptio.load_state_dict(os.path.join(model_path, "final_xvector.pt"))
        )
        self.xv_params = jax.tree.map(jnp.asarray, xv["params"])
        self.xv_stats = jax.tree.map(jnp.asarray, xv["batch_stats"])
