"""Challenge-baseline train/eval engines (end-to-end SSL fine-tune).

Ports reference benchmark/train_eval_files/{train,eval}_{cat,dim}_ser*.py:
whole-dataset waveform RAM load, WavSet z-norm (+ shipped norm-stat
pickle), frozen conv frontend, AttentiveStatisticsPooling, EmotionRegression
head, weighted CE (cat) / 1-CCC (dim, trained under bf16 ≈ the reference's
AMP autocast), grad accumulation, best-dev-loss checkpointing to
``final_{ser,ssl,pool}.pt`` (torch formats the reference can reload).

Deliberate simplification (mathematically identical): the reference steps
three separate AdamW optimizers with one shared lr (train_cat_ser.py:144-153);
AdamW is a per-parameter update, so one AdamW over the same trainables with
the conv frontend masked out produces the same trajectory.

Scale-out: training and prediction are data-parallel over a device mesh
(GSPMD jit — batches sharded along rows, params/opt state replicated,
XLA inserts the grad all-reduce over ICI). Batch rows are padded to a
mesh multiple with ``sample_mask`` 0, so the loss — including the dim
task's batch-global CCC moments — is exactly shard-count invariant
(tested: 1-device == 8-device trajectories, tests/test_baseline.py).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.convert_hf import speech_flax_to_hf
from ..utils import ptio
from ..utils.labels import CLASSES, INDEX_TO_LETTER
from ..utils.metrics import LogManager
from ..utils.seeding import numpy_generator
from ..train import losses
from . import data as bdata
from .models import (
    AttentiveStatisticsPooling,
    EmotionRegression,
    pooling_flax_to_torch,
    pooling_torch_to_flax,
    ser_flax_to_torch,
    ser_torch_to_flax,
)


class BaselineEngine:
    """End-to-end SSL + pooling + head trainer/evaluator."""

    def __init__(
        self,
        ssl_type: str,
        task: str = "cat",  # 'cat' (8-way CE) | 'dim' (3-attr CCC)
        head_dim: int = 1024,
        seed: int = 100,
        dtype: str = "float32",
        n_devices: Optional[int] = None,
        dropout: float = 0.5,
        loss_mode: str = "wce",  # 'wce' | 'ce_focal3' (baselinelike_focalloss)
    ):
        from ..models.loader import build_speech_encoder
        from ..parallel.mesh import make_mesh

        assert task in ("cat", "dim")
        self.task = task
        # data-parallel over the mesh: batches are sharded along rows
        # (padded rows carry sample_mask 0 so the loss is shard-count
        # invariant), params/optimizer state replicated, and XLA inserts
        # the grad all-reduce over ICI — same GSPMD recipe as
        # train/engine.FusionEngine. On one chip this degrades to the
        # plain single-device path.
        self.mesh = make_mesh(n_devices)
        self.n_data = self.mesh.shape["data"]
        self.ssl_model, ssl_params, self.ssl_cfg, _ = build_speech_encoder(
            ssl_type, dtype=dtype
        )
        feat_dim = self.ssl_cfg.hidden_size
        self.pool = AttentiveStatisticsPooling(feat_dim)
        out_dim = 8 if task == "cat" else 3
        self.loss_mode = loss_mode
        self.head = EmotionRegression(2 * feat_dim, head_dim, 1, out_dim, dropout=dropout)
        self.head_dim = head_dim
        self.rng = numpy_generator(seed)
        self.key = jax.random.PRNGKey(seed)

        dummy_x = jnp.zeros((1, 8, feat_dim), jnp.float32)
        dummy_m = jnp.ones((1, 8 * 320), jnp.float32)
        self.key, k1, k2 = jax.random.split(self.key, 3)
        self.params = {
            "ssl": ssl_params,
            "pool": self.pool.init(k1, dummy_x, dummy_m)["params"],
            "head": self.head.init(k2, jnp.zeros((1, 2 * feat_dim)))["params"],
        }
        self._steps: Dict = {}

    # -- forward -----------------------------------------------------------

    def _apply(self, params, wav, mask, deterministic, dkey=None):
        # freeze_feature_extractor mirrors the optimizer-side 'frozen' label
        # AND prunes the frontend backward pass (reference
        # freeze_feature_encoder, train_cat_ser.py:118-119)
        ssl_out = self.ssl_model.apply(
            {"params": params["ssl"]}, wav, mask,
            freeze_feature_extractor=not deterministic,
        )
        feats = ssl_out["last_hidden_state"]
        pooled = self.pool.apply({"params": params["pool"]}, feats, mask)
        rngs = None if deterministic else {"dropout": dkey}
        return self.head.apply(
            {"params": params["head"]}, pooled, deterministic=deterministic, rngs=rngs
        )

    def _loss(self, pred, labels, sample_mask, class_weights):
        if self.task == "cat":
            y = jnp.argmax(labels, axis=1)
            if self.loss_mode == "ce_focal3":
                # reference bin/old/train_cat_baselinelike_focalloss.py:266-272
                return losses.weighted_cross_entropy(
                    pred, y, None, sample_mask
                ) + losses.focal_loss(
                    pred, y, alpha=1.0, gamma=3.0, dynamic_alpha=True,
                    sample_mask=sample_mask,
                )
            return losses.weighted_cross_entropy(pred, y, class_weights, sample_mask)
        # sample_mask matters: the final partial batch of an epoch is
        # padded to the static row count, and CCC moments over zero rows
        # would otherwise corrupt the loss
        return losses.ccc_loss(pred, labels, sample_mask)

    # -- training ------------------------------------------------------------

    def fit(
        self,
        label_path: str,
        audio_path: str,
        model_path: str,
        batch_size: int = 32,
        accumulation_steps: int = 4,
        epochs: int = 20,
        lr: float = 1e-5,
        weight_decay: float = 1e-2,
        use_balanced_batch: bool = False,
        normalize_wav: bool = True,
        use_timbre_perturb: bool = False,
        tp_prob: float = 0.0,
        log=print,
    ):
        from .podcast import load_adv_emo_label, load_cat_emo_label

        os.makedirs(model_path, exist_ok=True)
        loader = load_cat_emo_label if self.task == "cat" else load_adv_emo_label
        train_utts, train_labs = loader(label_path, "train")
        dev_utts, dev_labs = loader(label_path, "dev")
        train_wavs = bdata.load_audio(audio_path, train_utts)
        dev_wavs = bdata.load_audio(audio_path, dev_utts)

        train_set = bdata.WavDataset(
            train_wavs, train_labs, train_utts, normalize_wav=normalize_wav
        )
        if use_timbre_perturb:
            from ..train.information_encoder import fixed_timbre_perturb

            aug_rng = numpy_generator(int(self.rng.integers(1 << 31)))

            def augment(w):  # reference WavSet, dataset.py:176-179
                if aug_rng.random() < tp_prob:
                    return fixed_timbre_perturb(w, sr=16000, rng=aug_rng)
                return w

            train_set.augment_fn = augment
        train_set.save_norm_stat(os.path.join(model_path, "train_norm_stat.pkl"))
        dev_set = bdata.WavDataset(
            dev_wavs, dev_labs, dev_utts,
            wav_mean=train_set.wav_mean, wav_std=train_set.wav_std,
            normalize_wav=normalize_wav,
        )

        class_weights = None
        if self.task == "cat":
            freq = np.asarray(train_labs).sum(axis=0)
            w = np.where(freq != 0, len(train_labs) / (len(CLASSES) * np.maximum(freq, 1)), 0.0)
            class_weights = jnp.asarray(w, dtype=jnp.float32)

        # frozen conv frontend (reference freeze_feature_encoder, L118-119)
        def label_fn(params):
            ssl_labels = {
                k: jax.tree.map(
                    lambda _: "frozen" if k == "feature_extractor" else "train", v
                )
                for k, v in params["ssl"].items()
            }
            return {
                "ssl": ssl_labels,
                "pool": jax.tree.map(lambda _: "train", params["pool"]),
                "head": jax.tree.map(lambda _: "train", params["head"]),
            }

        from ..parallel.mesh import replicate, shard_batch

        tx = optax.multi_transform(
            {
                "train": optax.adamw(
                    lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
                ),
                "frozen": optax.set_to_zero(),
            },
            label_fn(self.params),
        )
        opt_state = replicate(self.mesh, tx.init(self.params))
        micro_bs = batch_size // accumulation_steps  # reference L105
        # static row count: micro batch padded up to a mesh multiple
        # (extra rows carry sample_mask 0 → zero loss/grad contribution)
        micro_rows = -(-micro_bs // self.n_data) * self.n_data

        def grad_step(params, wav, mask, labels, smask, dkey):
            def loss_fn(p):
                pred = self._apply(p, wav, mask, False, dkey)
                return self._loss(pred, labels, smask, class_weights)

            return jax.value_and_grad(loss_fn)(params)

        grad_jit: Dict = {}
        apply_jit = jax.jit(
            lambda p, s, g, n: (
                lambda upd_state: (optax.apply_updates(p, upd_state[0]), upd_state[1])
            )(tx.update(jax.tree.map(lambda x: x / n, g), s, p)),
            donate_argnums=(0, 1, 2),
        )
        add = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b), donate_argnums=(0,))

        lm = LogManager()
        lm.alloc_stat_type_list(["train_loss", "dev_loss"])
        best = {"epoch": -1, "loss": float("inf")}
        params = replicate(self.mesh, self.params)
        lengths = np.asarray([len(w) for w in train_wavs])

        sample_w = None
        if use_balanced_batch and self.task == "cat":
            from .data import inverse_freq_sample_weights

            sample_w = inverse_freq_sample_weights(train_labs)

        for epoch in range(epochs):
            log(f"Epoch: {epoch}")
            lm.init_stat()
            if sample_w is not None:
                order = self.rng.choice(
                    len(train_set), size=len(train_set), replace=True, p=sample_w
                )
                batches = [
                    list(order[i : i + micro_bs])
                    for i in range(0, len(order), micro_bs)
                ]
            else:
                batches = bdata.epoch_batches(
                    len(train_set), micro_bs, self.rng, True, lengths
                )
            accum, n_micro = None, 0
            for i, idxs in enumerate(batches):
                b = bdata.collate_wav(train_set, idxs, micro_rows)
                sig = b.wav.shape
                if sig not in grad_jit:
                    grad_jit[sig] = jax.jit(grad_step)
                self.key, dkey = jax.random.split(self.key)
                wav_d, mask_d, lab_d, smask_d = shard_batch(
                    self.mesh, (b.wav, b.mask, b.labels, b.sample_mask)
                )
                loss, grads = grad_jit[sig](
                    params, wav_d, mask_d, lab_d, smask_d,
                    replicate(self.mesh, dkey),
                )
                accum = grads if accum is None else add(accum, grads)
                n_micro += 1
                if (i + 1) % accumulation_steps == 0 or (i + 1) == len(batches):
                    params, opt_state = apply_jit(params, opt_state, accum, float(n_micro))
                    accum, n_micro = None, 0
                lm.add_stat("train_loss", float(loss))

            self.params = params
            dev = self.evaluate(dev_set, class_weights)
            lm.add_stat("dev_loss", dev["loss"])
            lm.print_stat()
            if dev["loss"] < best["loss"]:
                best = {"epoch": epoch, "loss": dev["loss"]}
                log(f"Save {epoch}")
                log(f"Loss {dev['loss']}")
                self.save_checkpoints(model_path)
        return best

    # -- evaluation ------------------------------------------------------------

    def predict(self, dataset: bdata.WavDataset, batch_size: int = 8, timing=None):
        from ..parallel.mesh import replicate, shard_batch

        n = len(dataset)
        order = np.argsort([len(w) for w in dataset.wav_list], kind="stable")
        out_dim = 8 if self.task == "cat" else 3
        preds = np.zeros((n, out_dim), np.float32)
        eval_jit: Dict = {}
        rows = -(-batch_size // self.n_data) * self.n_data
        params = replicate(self.mesh, self.params)
        for s in range(0, n, batch_size):
            idxs = order[s : s + batch_size].tolist()
            b = bdata.collate_wav(dataset, idxs, rows)
            sig = b.wav.shape
            if sig not in eval_jit:
                eval_jit[sig] = jax.jit(
                    lambda p, w, m: self._apply(p, w, m, True)
                )
            t0 = time.perf_counter()
            wav_d, mask_d = shard_batch(self.mesh, (b.wav, b.mask))
            pred = np.asarray(eval_jit[sig](params, wav_d, mask_d))
            if timing is not None:
                timing["inference"] = timing.get("inference", 0.0) + time.perf_counter() - t0
                timing["audio_sec"] = timing.get("audio_sec", 0.0) + float(b.mask.sum()) / 16000
            preds[idxs] = pred[: len(idxs)]
        return preds

    def evaluate(self, dataset: bdata.WavDataset, class_weights=None) -> Dict:
        preds = self.predict(dataset)
        labels = np.asarray(dataset.labels, np.float32)
        if self.task == "cat":
            from ..train.engine import _host_weighted_ce

            y = np.argmax(labels, axis=1)
            loss = _host_weighted_ce(
                preds, y, np.asarray(class_weights) if class_weights is not None else None
            )
            return {"loss": loss, "preds": preds, "y": y}
        from ..utils.metrics import concordance_ccc

        cccs = [concordance_ccc(preds[:, i], labels[:, i]) for i in range(3)]
        return {"loss": 3.0 - sum(cccs), "ccc": cccs, "preds": preds}

    # -- checkpoints ------------------------------------------------------------

    def save_checkpoints(self, model_path: str) -> None:
        ptio.save_state_dict(
            ser_flax_to_torch(jax.tree.map(np.asarray, self.params["head"]), 1),
            os.path.join(model_path, "final_ser.pt"),
        )
        ptio.save_state_dict(
            pooling_flax_to_torch(jax.tree.map(np.asarray, self.params["pool"])),
            os.path.join(model_path, "final_pool.pt"),
        )
        ptio.save_state_dict(
            speech_flax_to_hf(jax.tree.map(np.asarray, self.params["ssl"]), self.ssl_cfg),
            os.path.join(model_path, "final_ssl.pt"),
        )

    def load_checkpoints(self, model_path: str) -> None:
        from ..models.convert_hf import speech_hf_to_flax

        self.params["head"] = ser_torch_to_flax(
            ptio.load_state_dict(os.path.join(model_path, "final_ser.pt")), 1
        )
        self.params["pool"] = pooling_torch_to_flax(
            ptio.load_state_dict(os.path.join(model_path, "final_pool.pt"))
        )
        self.params["ssl"] = speech_hf_to_flax(
            ptio.load_state_dict(os.path.join(model_path, "final_ssl.pt")), self.ssl_cfg
        )


def write_test3_submission(preds: np.ndarray, utts, model_path: str, dtype: str = "test3"):
    """argmax→letter submission CSV, sorted by FileName (eval_cat_ser.py:182-203)."""
    import pandas as pd

    os.makedirs(os.path.join(model_path, "results"), exist_ok=True)
    letters = [INDEX_TO_LETTER[int(i)] for i in np.argmax(preds, axis=1)]
    df = pd.DataFrame({"FileName": list(utts), "EmoClass": letters})
    df = df.sort_values(by="FileName").reset_index(drop=True)
    out = os.path.join(model_path, "results", f"{dtype}.csv")
    df.to_csv(out, index=False)
    return out
