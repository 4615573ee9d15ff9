"""Joint roberta+wavlm end-to-end trainers (bin/old ``train_cat_roberta*``).

One engine covers the 6-script family (reference /root/reference/bin/old/):

| variant    | reference script                         | head        | encoders  | loss            |
|------------|------------------------------------------|-------------|-----------|-----------------|
| base       | train_cat_roberta_wavlm.py               | conv        | frozen    | weighted CE     |
| ftall      | train_cat_roberta_wavlm_ftall.py         | conv (.2)   | trainable | weighted CE     |
| large      | train_cat_roberta_wavlm_large.py         | transformer | frozen    | focal γ3 dyn-α  |
| cka        | train_cat_roberta_wavlm_large_cka.py     | trf + gates | frozen    | CE + CKA        |
| ckainv     | train_cat_roberta_wavlm_large_ckainv.py  | trf + gates | frozen    | CE + (1-CKA)    |
| small_cka  | train_cat_roberta_wavlm_small_cka.py     | trf + gates | frozen    | CE + CKA        |

(``small_cka`` is byte-identical to ``cka`` in the reference — only the
config it is launched with differs.)

Semantics preserved from the reference scripts:

- class weights N/(C·n_c) on the Train split; base/ftall score the dev loss
  with those TRAIN weights (train_cat_roberta_wavlm.py:359), large/cka with
  weights recomputed on the DEV split (…_large.py:427).
- balanced batches: per-sample inverse-frequency ``WeightedRandomSampler``
  with replacement (…:175-199). NOTE the ftall script passes the 8-entry
  CLASS weight vector as per-sample weights (…_ftall.py:178-186), so torch
  only ever samples utterances 0-7 — a latent reference bug. We implement
  the evident intent (per-sample weights w_c = 1/√n_c of the sample's
  class); the bug is documented here rather than replicated.
- ftall trains the encoders with their own AdamW(1e-6, wd=0.1) optimizers
  (…_ftall.py:271-272) and additionally saves ``final_text_model.pt`` /
  ``final_ssl.pt``; everyone saves the head as ``final_ser.pt``.
- large/cka step a cosine-annealed lr (eta_min 1e-6) per optimizer update
  with T_max = epochs · ceil(N/batch_size) (…_large.py:341-353).
- dev evaluation runs at batch size 1 in the reference (…:169); here it is
  batched with masks, which is numerically identical (tested).

Scale-out: both engines are data-parallel over a device mesh (GSPMD jit —
rows sharded, params/opt state replicated, grad all-reduce by XLA). Rows
are padded to a mesh multiple with ``sample_mask`` 0; every loss term —
including the batch-global CKA — is masked, so the step is shard-count
invariant. One chip degrades to the plain single-device path.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..baseline import data as bdata
from ..models.convert_hf import roberta_flax_to_hf, speech_flax_to_hf
from ..models.joint import (
    ConvJointHead,
    TransformerJointHead,
    conv_joint_flax_to_torch,
    conv_joint_torch_to_flax,
    transformer_joint_flax_to_torch,
    transformer_joint_torch_to_flax,
)
from ..utils import ptio
from ..utils.labels import CLASSES
from ..utils.metrics import LogManager
from ..utils.seeding import numpy_generator
from . import losses


@dataclasses.dataclass
class JointOptions:
    head: str = "conv"  # 'conv' | 'transformer'
    finetune_encoders: bool = False  # ftall
    gated: bool = False  # CKA variants return gated features
    cka: str = "none"  # 'none' | 'plain' | 'inverse'
    loss: str = "wce"  # 'wce' | 'focal3' | 'ce_cka'
    scheduler: str = "none"  # 'none' | 'cosine_step'
    dev_weights: str = "train"  # 'train' | 'val'
    masked: bool = True  # False = reference unmasked batched pooling
    conv_dropout: float = 0.5
    input_dropout: bool = True
    classifier_layernorm: bool = True
    save_encoders: bool = False


VARIANTS: Dict[str, JointOptions] = {
    "base": JointOptions(),
    "ftall": JointOptions(
        finetune_encoders=True, conv_dropout=0.2, input_dropout=False,
        classifier_layernorm=False, save_encoders=True,
    ),
    "large": JointOptions(
        head="transformer", loss="focal3", scheduler="cosine_step", dev_weights="val",
    ),
    "cka": JointOptions(
        head="transformer", gated=True, cka="plain", loss="ce_cka",
        scheduler="cosine_step", dev_weights="val",
    ),
    "ckainv": JointOptions(
        head="transformer", gated=True, cka="inverse", loss="ce_cka",
        scheduler="cosine_step", dev_weights="val",
    ),
}
VARIANTS["small_cka"] = VARIANTS["cka"]


class JointEngine:
    """Frozen-or-finetuned speech+text encoders + a trainable fusion head."""

    def __init__(
        self,
        ssl_type: str,
        text_type: str,
        tokenize: Callable[[List[str]], Dict[str, np.ndarray]],
        options: JointOptions,
        head_dim: int = 512,
        seed: int = 7,
        dtype: str = "float32",
        n_devices: Optional[int] = None,
    ):
        from ..models.loader import build_roberta, build_speech_encoder
        from ..parallel.mesh import make_mesh

        self.opts = options
        self.tokenize = tokenize
        # data-parallel over the mesh (same GSPMD recipe as FusionEngine /
        # BaselineEngine): batches sharded along rows padded to a mesh
        # multiple with sample_mask 0 — the batch-global CKA statistic is
        # masked, so the loss is shard-count invariant
        self.mesh = make_mesh(n_devices)
        self.n_data = self.mesh.shape["data"]
        self.ssl_model, ssl_params, self.ssl_cfg, _ = build_speech_encoder(
            ssl_type, dtype=dtype
        )
        self.txt_model, txt_params, self.txt_cfg = build_roberta(text_type, dtype=dtype)
        self.head_dim = head_dim
        wav_dim, txt_dim = self.ssl_cfg.hidden_size, self.txt_cfg.hidden_size
        if options.head == "conv":
            self.head = ConvJointHead(
                wav_dim, txt_dim, head_dim,
                dropout=options.conv_dropout,
                input_dropout=options.input_dropout,
                classifier_layernorm=options.classifier_layernorm,
                masked=options.masked,
            )
        else:
            self.head = TransformerJointHead(
                wav_dim, txt_dim, head_dim, gated=options.gated, masked=options.masked
            )
        self.rng = numpy_generator(seed)
        self.key = jax.random.PRNGKey(seed)
        self.key, hk = jax.random.split(self.key)
        head_params = self.head.init(
            hk,
            jnp.zeros((1, 4, wav_dim), jnp.float32),
            jnp.zeros((1, 3, txt_dim), jnp.float32),
            jnp.ones((1, 4), jnp.float32),
            jnp.ones((1, 3), jnp.float32),
        )["params"]
        self.params = {"ssl": ssl_params, "txt": txt_params, "head": head_params}

    # -- forward -------------------------------------------------------------

    def _apply(self, params, wav, wav_mask, txt_ids, txt_mask, deterministic, dkey=None):
        opts = self.opts
        ssl_out = self.ssl_model.apply({"params": params["ssl"]}, wav, wav_mask)
        feats = ssl_out["last_hidden_state"]
        frame_mask = ssl_out["frame_mask"]
        txt_out = self.txt_model.apply({"params": params["txt"]}, txt_ids, txt_mask)
        txt_feats = txt_out["last_hidden_state"]
        if not opts.finetune_encoders:
            feats = jax.lax.stop_gradient(feats)
            txt_feats = jax.lax.stop_gradient(txt_feats)
        rngs = None if deterministic else {"dropout": dkey}
        return self.head.apply(
            {"params": params["head"]}, feats, txt_feats,
            frame_mask, txt_mask.astype(jnp.float32),
            deterministic=deterministic, rngs=rngs,
        )

    def _loss(self, out, y, sample_mask, class_weights):
        opts = self.opts
        logits = out[0] if opts.gated else out
        if opts.loss == "wce":
            main = losses.weighted_cross_entropy(logits, y, class_weights, sample_mask)
        elif opts.loss == "focal3":
            main = losses.focal_loss(
                logits, y, alpha=1.0, gamma=3.0, dynamic_alpha=True,
                sample_mask=sample_mask,
            )
        elif opts.loss == "ce_cka":
            main = losses.weighted_cross_entropy(logits, y, None, sample_mask)
        else:
            raise ValueError(opts.loss)
        if opts.cka != "none":
            _, wav_x, rob_x = out
            # sample_mask: padded rows (static shapes / mesh multiples)
            # must not leak into the batch-global CKA statistic
            cka = losses.cka_loss(wav_x, rob_x, sample_mask)
            if opts.cka == "inverse":
                cka = 1.0 - cka
            return main + cka, (main, cka)
        return main, (main, jnp.zeros(()))

    # -- training ------------------------------------------------------------

    def fit(
        self,
        label_path: str,
        audio_path: str,
        txt_path: str,
        model_path: str,
        batch_size: int = 32,
        accumulation_steps: int = 1,
        epochs: int = 10,
        lr: float = 1e-4,
        weight_decay: float = 1e-6,
        use_balanced_batch: bool = False,
        normalize_wav: bool = True,
        use_timbre_perturb: bool = False,
        tp_prob: float = 0.0,
        log=print,
    ) -> Dict:
        import pandas as pd

        from ..baseline.podcast import load_cat_emo_label

        opts = self.opts
        os.makedirs(model_path, exist_ok=True)
        label_df = pd.read_csv(label_path)
        text_df = pd.read_csv(txt_path)
        df = label_df.merge(text_df, on="FileName", how="left")
        train_df = df[df["Split_Set"] == "Train"]

        freq = train_df[CLASSES].sum().to_numpy(np.float64)
        n_train = len(train_df)
        train_w = np.where(freq != 0, n_train / (len(CLASSES) * np.maximum(freq, 1)), 0.0)
        class_weights = jnp.asarray(train_w, jnp.float32)
        if opts.dev_weights == "val":
            vdf = df[df["Split_Set"] == "Development"]
            vfreq = vdf[CLASSES].sum().to_numpy(np.float64)
            vw = np.where(vfreq != 0, len(vdf) / (len(CLASSES) * np.maximum(vfreq, 1)), 0.0)
            dev_weights = jnp.asarray(vw, jnp.float32)
        else:
            dev_weights = class_weights

        augment_fn = None
        if use_timbre_perturb:
            from .information_encoder import fixed_timbre_perturb

            aug_rng = numpy_generator(int(self.rng.integers(1 << 31)))

            def augment_fn(w):
                # reference WavSet augmentation (dataset.py:176-179)
                if aug_rng.random() < tp_prob:
                    return fixed_timbre_perturb(w, sr=16000, rng=aug_rng)
                return w

        sets = {}
        loaders_txt = {}
        for dtype_ in ("train", "dev"):
            utts, labs = load_cat_emo_label(label_path, dtype_)
            wavs = bdata.load_audio(audio_path, utts)
            if dtype_ == "train":
                ws = bdata.WavDataset(wavs, labs, utts, normalize_wav=normalize_wav)
                ws.augment_fn = augment_fn
                ws.save_norm_stat(os.path.join(model_path, "train_norm_stat.pkl"))
                texts = train_df["transcription"].tolist()
            else:
                ws = bdata.WavDataset(
                    wavs, labs, utts,
                    wav_mean=sets["train"].wav_mean, wav_std=sets["train"].wav_std,
                    normalize_wav=normalize_wav,
                )
                texts = df[df["Split_Set"] == "Development"]["transcription"].tolist()
            sets[dtype_] = ws
            loaders_txt[dtype_] = bdata.TxtDataset(texts, self.tokenize)

        # optimizers: head AdamW(lr, wd); ftall adds encoder AdamW(1e-6, 0.1)
        labels_tree = {
            "ssl": jax.tree.map(lambda _: "enc", self.params["ssl"]),
            "txt": jax.tree.map(lambda _: "enc", self.params["txt"]),
            "head": jax.tree.map(lambda _: "head", self.params["head"]),
        }
        if opts.scheduler == "cosine_step":
            t_max = epochs * math.ceil(n_train / batch_size)
            head_lr = optax.cosine_decay_schedule(lr - 1e-6, t_max, alpha=0.0)
            head_sched = lambda count: head_lr(jnp.minimum(count, t_max)) + 1e-6
            head_tx = optax.adamw(head_sched, weight_decay=weight_decay)
        else:
            head_tx = optax.adamw(lr, weight_decay=weight_decay)
        enc_tx = (
            optax.adamw(1e-6, weight_decay=1e-1)
            if opts.finetune_encoders
            else optax.set_to_zero()
        )
        from ..parallel.mesh import replicate, shard_batch

        tx = optax.multi_transform({"head": head_tx, "enc": enc_tx}, labels_tree)
        opt_state = replicate(self.mesh, tx.init(self.params))
        micro_bs = batch_size // accumulation_steps
        micro_rows = -(-micro_bs // self.n_data) * self.n_data

        def grad_step(params, wav, wmask, tids, tmask, y, smask, dkey):
            def loss_fn(p):
                out = self._apply(p, wav, wmask, tids, tmask, False, dkey)
                total, (main, cka) = self._loss(out, y, smask, class_weights)
                return total, (main, cka)

            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return total, aux, grads

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
        n = len(sets["train"])
        lengths = np.asarray([len(w) for w in sets["train"].wav_list])

        if use_balanced_batch:
            # per-sample inverse-frequency weights, normalized (reference
            # …:177-188); sampling WITH replacement like WeightedRandomSampler
            from ..baseline.data import inverse_freq_sample_weights

            sample_w = inverse_freq_sample_weights(sets["train"].labels)

        for epoch in range(epochs):
            log(f"Epoch: {epoch}")
            lm.init_stat()
            if use_balanced_batch:
                order = self.rng.choice(n, size=n, replace=True, p=sample_w)
                batches = [
                    list(order[i : i + micro_bs]) for i in range(0, n, micro_bs)
                ]
            else:
                batches = bdata.epoch_batches(n, micro_bs, self.rng, True, lengths)
            accum, n_micro = None, 0
            for i, idxs in enumerate(batches):
                wb, tids, tmask = bdata.collate_txt_wav(
                    sets["train"], loaders_txt["train"], idxs, micro_rows
                )
                y = np.argmax(wb.labels, axis=1)
                sig = (wb.wav.shape, tids.shape)
                if sig not in grad_jit:
                    grad_jit[sig] = jax.jit(grad_step)
                self.key, dkey = jax.random.split(self.key)
                batch_d = shard_batch(
                    self.mesh, (wb.wav, wb.mask, tids, tmask, y, wb.sample_mask)
                )
                total, (main, cka), grads = grad_jit[sig](
                    params, *batch_d, replicate(self.mesh, dkey),
                )
                accum = grads if accum is None else add(accum, grads)
                n_micro += 1
                if (i + 1) % accumulation_steps == 0 or (i + 1) == len(batches):
                    params, opt_state = apply_jit(params, opt_state, accum, float(n_micro))
                    accum, n_micro = None, 0
                lm.add_stat("train_loss", float(main))
                if (i + 2) % 200 == 0:
                    log(f"Epoch ({epoch + 1}/{epochs})| step = {i}: loss = {float(main)}")

            self.params = params
            dev = self.evaluate(sets["dev"], loaders_txt["dev"], dev_weights)
            lm.add_stat("dev_loss", dev["loss"])
            lm.print_stat()
            msg = f"|VALIDATION| Epoch ({epoch + 1}/{epochs}): eval_loss = {dev['loss']}"
            if opts.cka != "none":
                msg += f" eval_cka = {dev['cka']}"
            log(msg)
            if dev["loss"] < best["loss"]:
                best = {"epoch": epoch, "loss": dev["loss"]}
                log(f"New best model at epoch {epoch + 1}")
                self.save_checkpoints(model_path)
        return best

    # -- evaluation ------------------------------------------------------------

    def predict(self, wav_set, txt_set, batch_size: int = 8):
        opts = self.opts
        n = len(wav_set)
        order = np.argsort([len(w) for w in wav_set.wav_list], kind="stable")
        logits = np.zeros((n, 8), np.float32)
        feats_w = np.zeros((n, self.head_dim), np.float32) if opts.gated else None
        feats_r = np.zeros((n, self.head_dim), np.float32) if opts.gated else None
        # cached across calls: fit() evaluates every epoch
        eval_jit: Dict = self.__dict__.setdefault("_eval_jit", {})
        from ..parallel.mesh import replicate, shard_batch

        rows = -(-batch_size // self.n_data) * self.n_data
        params = replicate(self.mesh, self.params)
        for s in range(0, n, batch_size):
            idxs = order[s : s + batch_size].tolist()
            wb, tids, tmask = bdata.collate_txt_wav(wav_set, txt_set, idxs, rows)
            sig = (wb.wav.shape, tids.shape)
            if sig not in eval_jit:
                eval_jit[sig] = jax.jit(
                    lambda p, w, wm, ti, tm: self._apply(p, w, wm, ti, tm, True)
                )
            batch_d = shard_batch(self.mesh, (wb.wav, wb.mask, tids, tmask))
            out = eval_jit[sig](params, *batch_d)
            if opts.gated:
                lg, wx, rx = out
                feats_w[idxs] = np.asarray(wx)[: len(idxs)]
                feats_r[idxs] = np.asarray(rx)[: len(idxs)]
            else:
                lg = out
            logits[idxs] = np.asarray(lg)[: len(idxs)]
        return logits, feats_w, feats_r

    def evaluate(self, wav_set, txt_set, class_weights) -> Dict:
        from .engine import _host_weighted_ce

        logits, fw, fr = self.predict(wav_set, txt_set)
        y = np.argmax(np.asarray(wav_set.labels), axis=1)
        loss = _host_weighted_ce(logits, y, np.asarray(class_weights))
        out = {"loss": loss, "logits": logits, "y": y}
        if self.opts.cka != "none":
            cka = float(losses.cka_loss(jnp.asarray(fw), jnp.asarray(fr)))
            if self.opts.cka == "inverse":
                cka = 1.0 - cka
            out["cka"] = cka
        return out

    # -- checkpoints ------------------------------------------------------------

    def save_checkpoints(self, model_path: str) -> None:
        head = jax.tree.map(np.asarray, self.params["head"])
        if self.opts.head == "conv":
            sd = conv_joint_flax_to_torch(head, self.opts.classifier_layernorm)
        else:
            sd = transformer_joint_flax_to_torch(head, gated=self.opts.gated)
        ptio.save_state_dict(sd, os.path.join(model_path, "final_ser.pt"))
        if self.opts.save_encoders:
            ptio.save_state_dict(
                roberta_flax_to_hf(jax.tree.map(np.asarray, self.params["txt"]), self.txt_cfg),
                os.path.join(model_path, "final_text_model.pt"),
            )
            ptio.save_state_dict(
                speech_flax_to_hf(jax.tree.map(np.asarray, self.params["ssl"]), self.ssl_cfg),
                os.path.join(model_path, "final_ssl.pt"),
            )

    def load_head(self, model_path: str) -> None:
        sd = ptio.load_state_dict(os.path.join(model_path, "final_ser.pt"))
        if self.opts.head == "conv":
            self.params["head"] = conv_joint_torch_to_flax(
                sd, self.opts.classifier_layernorm
            )
        else:
            self.params["head"] = transformer_joint_torch_to_flax(
                sd, gated=self.opts.gated
            )


# ---------------------------------------------------------------------------
# Text-only trainer (reference bin/old/train_cat_roberta.py)
# ---------------------------------------------------------------------------


class TextOnlyEngine:
    """RobertaForSequenceClassification fine-tune on transcripts.

    Reference: bin/old/train_cat_roberta.py — full-model AdamW(lr, wd=0.1),
    weighted CE (+ focal γ3 dynamic-α when ``use_focalloss``), dev loss with
    train class weights + accuracy, saves ``text_ser.pt``.
    """

    def __init__(
        self,
        text_type: str,
        tokenize: Callable[[List[str]], Dict[str, np.ndarray]],
        seed: int = 7,
        dtype: str = "float32",
        n_devices: Optional[int] = None,
    ):
        from ..models.joint import RobertaClassificationHead
        from ..models.loader import build_roberta
        from ..parallel.mesh import make_mesh

        self.tokenize = tokenize
        self.mesh = make_mesh(n_devices)
        self.n_data = self.mesh.shape["data"]
        self.txt_model, txt_params, self.txt_cfg = build_roberta(text_type, dtype=dtype)
        self.cls_head = RobertaClassificationHead(self.txt_cfg.hidden_size, 8)
        self.rng = numpy_generator(seed)
        self.key = jax.random.PRNGKey(seed)
        self.key, hk = jax.random.split(self.key)
        head_params = self.cls_head.init(
            hk, jnp.zeros((1, 3, self.txt_cfg.hidden_size), jnp.float32)
        )["params"]
        self.params = {"txt": txt_params, "head": head_params}

    def _apply(self, params, tids, tmask, deterministic, dkey=None):
        out = self.txt_model.apply({"params": params["txt"]}, tids, tmask)
        rngs = None if deterministic else {"dropout": dkey}
        return self.cls_head.apply(
            {"params": params["head"]}, out["last_hidden_state"],
            deterministic=deterministic, rngs=rngs,
        )

    def fit(
        self,
        label_path: str,
        txt_path: str,
        model_path: str,
        batch_size: int = 32,
        accumulation_steps: int = 1,
        epochs: int = 5,
        lr: float = 1e-5,
        use_focalloss: bool = False,
        use_balanced_batch: bool = False,
        log=print,
    ) -> Dict:
        import pandas as pd

        from ..utils.metrics import accuracy

        os.makedirs(model_path, exist_ok=True)
        label_df = pd.read_csv(label_path)
        text_df = pd.read_csv(txt_path)
        df = label_df.merge(text_df, on="FileName", how="left")
        splits = {}
        for name, key in (("train", "Train"), ("dev", "Development")):
            sdf = df[df["Split_Set"] == key]
            texts = [t if isinstance(t, str) else "" for t in sdf["transcription"]]
            toks = self.tokenize(texts)
            splits[name] = {
                "ids": np.asarray(toks["input_ids"]),
                "mask": np.asarray(toks["attention_mask"]),
                "y": np.argmax(sdf[CLASSES].to_numpy(np.float32), axis=1),
            }
        freq = df[df["Split_Set"] == "Train"][CLASSES].sum().to_numpy(np.float64)
        n = len(splits["train"]["y"])
        w = np.where(freq != 0, n / (len(CLASSES) * np.maximum(freq, 1)), 0.0)
        class_weights = jnp.asarray(w, jnp.float32)

        from ..parallel.mesh import replicate, shard_batch

        tx = optax.adamw(lr, weight_decay=1e-1)
        opt_state = replicate(self.mesh, tx.init(self.params))
        micro_bs = batch_size  # reference uses batch_size directly
        rows = -(-micro_bs // self.n_data) * self.n_data

        def grad_step(params, tids, tmask, y, smask, dkey):
            def loss_fn(p):
                logits = self._apply(p, tids, tmask, False, dkey)
                loss = losses.weighted_cross_entropy(logits, y, class_weights, smask)
                if use_focalloss:
                    loss = loss + losses.focal_loss(
                        logits, y, alpha=1.0, gamma=3.0, dynamic_alpha=True,
                        sample_mask=smask,
                    )
                return loss

            return jax.value_and_grad(loss_fn)(params)

        grad_jit: Dict = {}
        apply_jit = jax.jit(
            lambda p, s, g, m: (
                lambda upd_state: (optax.apply_updates(p, upd_state[0]), upd_state[1])
            )(tx.update(jax.tree.map(lambda x: x / m, g), s, p)),
            donate_argnums=(0, 1, 2),
        )
        add = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b), donate_argnums=(0,))

        if use_balanced_batch:
            cw = {c: 1.0 / f if f else 0.0 for c, f in zip(CLASSES, freq)}
            factor = len(cw) / sum(cw.values())
            sample_w = np.asarray(
                [cw[CLASSES[i]] * factor for i in splits["train"]["y"]]
            )
            sample_w = sample_w / sample_w.sum()

        params = replicate(self.mesh, self.params)
        best = {"epoch": -1, "loss": float("inf")}
        for epoch in range(epochs):
            log(f"Epoch: {epoch}")
            if use_balanced_batch:
                order = self.rng.choice(n, size=n, replace=True, p=sample_w)
            else:
                order = self.rng.permutation(n)
            accum, n_micro = None, 0
            batches = [order[i : i + micro_bs] for i in range(0, n, micro_bs)]
            for i, idxs in enumerate(batches):
                B = rows
                ids = np.zeros((B,) + splits["train"]["ids"].shape[1:], np.int64)
                mask = np.zeros_like(ids)
                y = np.zeros((B,), np.int64)
                smask = np.zeros((B,), np.float32)
                ids[: len(idxs)] = splits["train"]["ids"][idxs]
                mask[: len(idxs)] = splits["train"]["mask"][idxs]
                y[: len(idxs)] = splits["train"]["y"][idxs]
                smask[: len(idxs)] = 1.0
                sig = ids.shape
                if sig not in grad_jit:
                    grad_jit[sig] = jax.jit(grad_step)
                self.key, dkey = jax.random.split(self.key)
                batch_d = shard_batch(self.mesh, (ids, mask, y, smask))
                loss, grads = grad_jit[sig](
                    params, *batch_d, replicate(self.mesh, dkey),
                )
                accum = grads if accum is None else add(accum, grads)
                n_micro += 1
                if (i + 1) % accumulation_steps == 0 or (i + 1) == len(batches):
                    params, opt_state = apply_jit(params, opt_state, accum, float(n_micro))
                    accum, n_micro = None, 0

            self.params = params
            logits = self.predict(splits["dev"]["ids"], splits["dev"]["mask"])
            from .engine import _host_weighted_ce

            dev_loss = _host_weighted_ce(logits, splits["dev"]["y"], np.asarray(w))
            acc = accuracy(splits["dev"]["y"], np.argmax(logits, axis=1))
            log(
                f"|VALIDATION| Epoch ({epoch + 1}/{epochs}): "
                f"eval_loss = {dev_loss} eval acc = {acc}"
            )
            if dev_loss < best["loss"]:
                best = {"epoch": epoch, "loss": dev_loss, "acc": acc}
                log(f"New best model at epoch {epoch + 1}")
                self.save_checkpoint(model_path)
        return best

    def predict(self, ids: np.ndarray, mask: np.ndarray, batch_size: int = 16):
        from ..parallel.mesh import replicate, shard_batch

        n = len(ids)
        logits = np.zeros((n, 8), np.float32)
        # cached across calls: fit() evaluates every epoch
        if not hasattr(self, "_eval_fwd"):
            self._eval_fwd = jax.jit(lambda p, i, m: self._apply(p, i, m, True))
        fwd = self._eval_fwd
        rows = -(-batch_size // self.n_data) * self.n_data
        params = replicate(self.mesh, self.params)
        for s in range(0, n, batch_size):
            i_ = ids[s : s + batch_size]
            m_ = mask[s : s + batch_size]
            got = len(i_)
            pad = rows - got
            if pad:
                i_ = np.concatenate([i_, np.repeat(i_[-1:], pad, 0)])
                m_ = np.concatenate([m_, np.repeat(m_[-1:], pad, 0)])
            i_d, m_d = shard_batch(self.mesh, (i_, m_))
            out = np.asarray(fwd(params, i_d, m_d))
            logits[s : s + got] = out[:got]
        return logits

    def save_checkpoint(self, model_path: str) -> None:
        sd = {
            f"roberta.{k}": v
            for k, v in roberta_flax_to_hf(
                jax.tree.map(np.asarray, self.params["txt"]), self.txt_cfg
            ).items()
        }
        head = jax.tree.map(np.asarray, self.params["head"])
        sd["classifier.dense.weight"] = head["dense"]["kernel"].T
        sd["classifier.dense.bias"] = head["dense"]["bias"]
        sd["classifier.out_proj.weight"] = head["out_proj"]["kernel"].T
        sd["classifier.out_proj.bias"] = head["out_proj"]["bias"]
        ptio.save_state_dict(sd, os.path.join(model_path, "text_ser.pt"))
