"""Angular-prototypical style-embedding trainer.

Capability port of reference bin/old/train_cat_wavlm_lazy_protoangularloss*.py:
class-balanced batches (PerfectBatchSampler over emotion classes), an
embedding network over cached wavlm features, and ``AngleProtoLoss`` on
embeddings grouped [n_classes, n_utter_per_class, D] (optionally +
softmax CE: the SoftmaxAngleProto variant).
"""

from __future__ import annotations

import math
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import attention_pool
from ..ops.gru import BiGRU
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..utils.seeding import numpy_generator
from . import losses
from .data import LazyFeatureDataset
from .samplers import PerfectBatchSampler


def _divisible_mesh(n_devices: Optional[int], *batch_sizes: int):
    """Largest data mesh whose size divides every fixed batch size.

    The proto trainers use drop_last samplers with FIXED batch sizes
    (C·U train, C·U_val val, val_batch_size CE-eval) and batch-global
    losses (angle-proto groups, BatchNorm moments), so rows are never
    padded — instead the mesh shrinks to the largest divisor. GSPMD then
    shards rows and all-gathers the small [B, D] embeddings for the
    grouped loss; BatchNorm moments become global (sync-BN), so the step
    is exactly shard-count invariant (tested).
    """
    base = make_mesh(n_devices)
    n = base.shape["data"]
    want = max(d for d in range(1, n + 1) if all(b % d == 0 for b in batch_sizes))
    return base if want == n else make_mesh(want)


class StyleEmbeddingNet(nn.Module):
    """proj → BiGRU → attention pooling → embedding (+ optional class head)."""

    feat_dim: int
    hidden_dim: int = 256
    embedding_dim: int = 256
    num_classes: int = 0  # >0 adds the softmax head (SoftmaxAngleProto)

    @nn.compact
    def __call__(self, feats, mask=None):
        h = nn.Dense(self.hidden_dim, name="projection")(feats)
        h = BiGRU(self.hidden_dim, name="gru")(h, mask)
        scores = nn.Dense(1, name="pool_attn")(h)
        pooled = attention_pool(h, scores, mask)
        emb = nn.Dense(self.embedding_dim, name="embedding")(pooled)
        if self.num_classes > 0:
            return emb, nn.Dense(self.num_classes, name="classifier")(emb)
        return emb


class ProtoAngularEngine:
    """Train a style embedder with angular-prototypical batches."""

    def __init__(
        self,
        feat_dim: int,
        num_classes: int = 8,
        utter_per_class: int = 4,
        embedding_dim: int = 256,
        use_softmax_proto: bool = False,
        seed: int = 7,
        n_devices: Optional[int] = None,
    ):
        self.model = StyleEmbeddingNet(
            feat_dim, embedding_dim=embedding_dim,
            num_classes=num_classes if use_softmax_proto else 0,
        )
        self.num_classes = num_classes
        self.utter_per_class = utter_per_class
        self.use_softmax_proto = use_softmax_proto
        # data-parallel: rows sharded, params replicated, XLA all-gathers
        # the [B, D] embeddings for the grouped angle-proto loss
        self.mesh = _divisible_mesh(n_devices, num_classes * utter_per_class)
        self.n_data = self.mesh.shape["data"]
        self.rng = numpy_generator(seed)
        self.key = jax.random.PRNGKey(seed)
        self.params = None
        self._step = None

    def fit(
        self,
        dataset: LazyFeatureDataset,
        class_ids: np.ndarray,
        epochs: int = 5,
        lr: float = 1e-4,
        log=print,
    ):
        import optax

        C, U = self.num_classes, self.utter_per_class
        batch_size = C * U
        feats0 = dataset.collate(list(range(min(2, len(dataset)))), 2)
        if self.params is None:
            self.key, k = jax.random.split(self.key)
            self.params = self.model.init(
                k, jnp.asarray(feats0.feats[0]), jnp.asarray(feats0.masks[0])
            )["params"]
        tx = optax.adamw(lr, weight_decay=1e-6)
        self.params = replicate(self.mesh, self.params)
        opt_state = replicate(self.mesh, tx.init(self.params))
        # learnable (w, b) of the angular-proto scaling (reference losses.py:131-136)
        wb = replicate(self.mesh, {"w": jnp.asarray(10.0), "b": jnp.asarray(-5.0)})
        wb_state = replicate(self.mesh, optax.adamw(lr).init(wb))

        def step(params, wb, opt_state, wb_state, feats, mask, y):
            def loss_fn(p, wb):
                out = self.model.apply({"params": p}, feats, mask)
                if self.use_softmax_proto:
                    emb, logits = out
                    ce = losses.weighted_cross_entropy(logits, y)
                else:
                    emb, ce = out, 0.0
                grouped = emb.reshape(C, U, -1)
                ap = losses.angle_proto_loss(grouped, wb["w"], wb["b"])
                return ap + ce, ap

            (total, ap), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, wb
            )
            updates, opt_state = tx.update(grads[0], opt_state, params)
            params = optax.apply_updates(params, updates)
            wb_updates, wb_state = optax.adamw(lr).update(grads[1], wb_state, wb)
            wb = optax.apply_updates(wb, wb_updates)
            return params, wb, opt_state, wb_state, total, ap

        step_jit: Dict = {}
        for epoch in range(epochs):
            sampler = PerfectBatchSampler(
                class_ids, range(C), batch_size, shuffle=True, drop_last=True,
                seed=int(self.rng.integers(0, 2 ** 31)),
            )
            last = None
            for idxs in sampler:
                batch = dataset.collate(list(idxs), batch_size)
                y = np.argmax(batch.labels, axis=1)
                sig = batch.feats[0].shape
                if sig not in step_jit:
                    step_jit[sig] = jax.jit(step, donate_argnums=(0, 1, 2, 3))
                feats_d, mask_d, y_d = shard_batch(
                    self.mesh, (batch.feats[0], batch.masks[0], y)
                )
                self.params, wb, opt_state, wb_state, total, ap = step_jit[sig](
                    self.params, wb, opt_state, wb_state, feats_d, mask_d, y_d,
                )
                last = (float(total), float(ap))
            if last:
                log(f"epoch {epoch}: loss={last[0]:.4f} angle_proto={last[1]:.4f}")
        return self.params

    def embed(self, dataset: LazyFeatureDataset, batch_size: int = 16) -> np.ndarray:
        out = []
        fwd: Dict = {}
        # rows padded to a mesh multiple; padded rows (zero feats/mask)
        # embed to finite junk and are sliced off below
        rows = -(-batch_size // self.n_data) * self.n_data
        params = replicate(self.mesh, self.params)
        for s in range(0, len(dataset), batch_size):
            idxs = list(range(s, min(s + batch_size, len(dataset))))
            b = dataset.collate(idxs, rows)
            sig = b.feats[0].shape
            if sig not in fwd:
                fwd[sig] = jax.jit(
                    lambda p, f, m: self.model.apply({"params": p}, f, m)
                )
            feats_d, mask_d = shard_batch(self.mesh, (b.feats[0], b.masks[0]))
            o = fwd[sig](params, feats_d, mask_d)
            emb = o[0] if self.use_softmax_proto else o
            out.append(np.asarray(emb)[: len(idxs)])
        return np.concatenate(out)


# ---------------------------------------------------------------------------
# The "_only" proto-angular family (4 legacy scripts): reference-architecture
# nets, RAdam + per-step cosine, angle-proto-only training with the
# class-major regrouping quirk, min-val-angle model selection → angle_ser.pt.
# ---------------------------------------------------------------------------


class ProtoSERNet(nn.Module):
    """Reference ``WavLMSERClassifier`` of the proto-angular trainers.

    input dropout(0.5) → Dense(hidden) → self-MHA(heads, dropout 0.5) →
    LN residual → Conv1d(k3, p1) → LN → softmax attention pooling →
    embeddings [B, hidden]; ``num_classes>0`` adds the (unused-in-"_only")
    classifier head. Attention and pooling are UNMASKED, as in the reference
    (bin/old/train_cat_wavlm_lazy_protoangularloss_only.py:355-433).
    """

    feat_dim: int
    hidden_dim: int = 512
    num_classes: int = 8
    num_heads: int = 1

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):
        from ..ops.attention import TorchMultiheadAttention

        h = nn.Dropout(0.5)(feats, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim, name="wav_proj")(h)
        attn = TorchMultiheadAttention(
            self.hidden_dim, self.num_heads, dropout=0.5, name="multihead_attn"
        )(h, h, h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="attn_norm")(attn + h)
        c = nn.Conv(self.hidden_dim, (3,), padding=[(1, 1)], name="conv1d")(h)
        c = nn.LayerNorm(epsilon=1e-5, name="conv_norm")(c)
        scores = nn.Dense(1, name="attn_pooling")(c)
        weights = jax.nn.softmax(scores, axis=1)
        emb = jnp.sum(c * weights, axis=1)  # [B, hidden]
        if self.num_classes > 0:
            x = nn.Dense(self.hidden_dim, name="classifier_fc1")(emb)
            x = nn.relu(x)
            x = nn.Dropout(0.2)(x, deterministic=deterministic)
            logits = nn.Dense(self.num_classes, name="classifier_fc2")(x)
            return emb, logits
        return emb


class BidirectionalReferenceEncoder(nn.Module):
    """Prosody/style embedder over mel spectrograms.

    6× Conv2d(3×3, stride 2, pad 1) + BatchNorm + ReLU over [B, T, mel, 1],
    reshape to [B, T', C·H'], bidirectional GRU, concat of the two final
    hidden states → [B, embedding_dim]
    (reference: bin/old/train_cat_melspec_lazy_protoangularloss_only_gender
    .py:376-445).
    """

    num_mel: int = 80
    embedding_dim: int = 256

    @nn.compact
    def __call__(self, mel, deterministic: bool = True):
        B = mel.shape[0]
        x = mel[:, :, :, None]  # NHWC: [B, T, mel, 1]
        filters = (32, 32, 64, 64, 128, 128)
        for i, f in enumerate(filters):
            x = nn.Conv(
                f, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        # torch layout: [B, C, T', H'] → transpose(1,2) → view [B, T', C*H']
        # (C-major flatten); from NHWC that is transpose to [B,T',C,H'] first
        x = x.transpose(0, 1, 3, 2)  # [B, T', C, H']
        x = x.reshape(B, x.shape[1], -1)
        seq = BiGRU(self.embedding_dim // 2, name="recurrence")(x, None)
        H = self.embedding_dim // 2
        # final hidden states: forward at T-1, backward at 0
        return jnp.concatenate([seq[:, -1, :H], seq[:, 0, H:]], axis=-1)


def _regroup_class_major(n_utter: int, n_classes: int) -> np.ndarray:
    """The reference's regroup quirk, documented: its coqui-style sampler
    yields class-interleaved rows [c0 c1 … c0 c1 …] which the scripts
    regroup class-major via ``transpose(x.view(U, C, -1), 0, 1)``
    (…_protoangularloss_only.py:493-499). Returns that row permutation.
    NOT applied by ProtoOnlyEngine: this repo's PerfectBatchSampler emits
    class-major batches directly, so the net effect (class-major groups
    entering the angle-proto loss) is achieved with no permutation."""
    idx = np.arange(n_utter * n_classes).reshape(n_utter, n_classes)
    return idx.T.reshape(-1)


class MelspecProtoDataset:
    """wav dir → on-the-fly torchaudio-semantics log-mel [T, 80].

    ``perturb_prob>0`` applies the fixed timbre perturbation before the
    melspec with that probability (…_melspec_lazy_protoangularloss_only
    .py:274-277; the gender variant disables it).
    """

    def __init__(
        self,
        names,
        labels: np.ndarray,
        wav_dir: str,
        mel_sample_rate: int = 1600,  # reference bug: 1600 for 16 kHz audio
        perturb_prob: float = 0.0,
        seed: int = 7,
    ):
        from ..ops.melspec_ta import TorchaudioMelSpectrogram

        self.names = list(names)
        self.labels = np.asarray(labels)
        self.wav_dir = wav_dir
        self.mel = TorchaudioMelSpectrogram(sample_rate=mel_sample_rate)
        self.perturb_prob = perturb_prob
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.names)

    def features(self, idx: int) -> np.ndarray:
        import os

        from ..utils.audio import load_wav

        path = os.path.join(self.wav_dir, self.names[idx])
        wav, _ = load_wav(path, target_sr=16000)
        if self.perturb_prob > 0 and self.rng.random() < self.perturb_prob:
            from .information_encoder import fixed_timbre_perturb

            wav = fixed_timbre_perturb(
                wav, sr=16000, segment_size=16000 // 2, formant_rate=1.4,
                pitch_steps=0.01, pitch_floor=75, pitch_ceil=600,
            )
        return self.mel(wav)


class LazyProtoDataset:
    """Cached .pt features, reference lazy layout (<utt>.pt per FileName)."""

    def __init__(self, names, labels: np.ndarray, lazy_dir: str):
        self.names = list(names)
        self.labels = np.asarray(labels)
        self.lazy_dir = lazy_dir

    def __len__(self):
        return len(self.names)

    def features(self, idx: int) -> np.ndarray:
        import os

        from ..utils import ptio

        path = os.path.join(
            self.lazy_dir, self.names[idx].replace(".wav", ".pt")
        )
        return np.asarray(ptio.load_tensor(path), np.float32)


class ProtoOnlyEngine:
    """Angle-proto-only trainer for the legacy "_only" scripts.

    Semantics (reference …_protoangularloss_only*.py):
    - PerfectBatchSampler over the target classes, train shuffle / val
      fixed order, both drop_last;
    - class-major regrouping of every batch (the transpose quirk);
    - loss = AngleProtoLoss ONLY, with its (w, b) scale FIXED at (10, −5) —
      the reference optimizer collects only model params, so the loss's own
      learnables never train;
    - RAdam(lr, betas=(0.9, 0.999), eps=1e-8), per-STEP cosine annealing to
      0 over epochs·steps_per_epoch;
    - model selection: min mean val angle loss → MODEL_PATH/angle_ser.pt
      (flat torch state-dict names).
    """

    def __init__(
        self,
        net: nn.Module,
        num_classes_in_batch: int,
        num_utter_per_class: int,
        num_utter_per_class_val: int,
        seed: int = 7,
        bucket_quantum: int = 16,
        has_batch_stats: bool = False,
        ce_mode: bool = False,
        val_batch_size: int = 32,
        n_devices: Optional[int] = None,
    ):
        # ce_mode = the base (non-"_only") protoangular trainer
        # (reference bin/old/train_cat_wavlm_lazy_protoangularloss.py):
        # train loss = unweighted CE + angle (same class-major regroup),
        # dev = plain batches scored with val-weighted CE + macro-F1,
        # model selection min dev CE -> ser.pt.
        self.ce_mode = ce_mode
        self.val_batch_size = val_batch_size
        # data-parallel: one mesh sized to divide every fixed batch the
        # trainer sees (train C·U, val C·U_val, CE-eval val_batch_size) —
        # rows are never padded because the batch-global angle-proto
        # groups and BatchNorm moments make padded rows non-free
        sizes = [num_classes_in_batch * num_utter_per_class,
                 num_classes_in_batch * num_utter_per_class_val]
        if ce_mode:
            sizes.append(val_batch_size)
        self.mesh = _divisible_mesh(n_devices, *sizes)
        self.n_data = self.mesh.shape["data"]
        self.net = net
        self.C = num_classes_in_batch
        self.U = num_utter_per_class
        self.U_val = num_utter_per_class_val
        self.rng = numpy_generator(seed)
        self.key = jax.random.PRNGKey(seed)
        self.bucket_quantum = bucket_quantum
        self.has_batch_stats = has_batch_stats
        self.variables = None

    def _collate(self, dataset, idxs, n_utter: int) -> np.ndarray:
        # NO permutation here: the reference's class-major regroup
        # (_regroup_class_major) exists because its coqui-style sampler
        # yields class-INTERLEAVED rows; this repo's PerfectBatchSampler
        # already emits class-major batches (samplers.py: batch.extend per
        # class), so applying the transpose would scramble the angle-proto
        # groups (caught in review; tested in TestProtoCollate).
        feats = [dataset.features(i) for i in idxs]
        t_max = max(f.shape[0] for f in feats)
        q = self.bucket_quantum
        t_pad = ((t_max + q - 1) // q) * q
        out = np.zeros((len(feats), t_pad, feats[0].shape[1]), np.float32)
        for i, f in enumerate(feats):
            out[i, : f.shape[0]] = f
        y = np.asarray([dataset.labels[i] for i in idxs], np.int64)
        return out, y

    def _embed(self, variables, feats, train: bool, dkey=None):
        kwargs = dict(deterministic=not train)
        rngs = {"dropout": dkey} if train and dkey is not None else None
        if self.has_batch_stats and train:
            out, updates = self.net.apply(
                variables, feats, mutable=["batch_stats"], rngs=rngs, **kwargs
            )
            return out, updates
        out = self.net.apply(variables, feats, rngs=rngs, **kwargs)
        return out, {}

    @staticmethod
    def _emb_of(out):
        return out[0] if isinstance(out, tuple) else out

    def fit(self, train_ds, val_ds, epochs: int, lr: float, model_path: str = None,
            log=print):
        import optax

        self.key, k = jax.random.split(self.key)
        probe, _ = self._collate(train_ds, list(range(self.C * self.U)), self.U)
        if self.variables is None:
            self.variables = self.net.init(k, jnp.asarray(probe[:2]))

        train_sampler_labels = np.asarray(train_ds.labels)
        val_sampler_labels = np.asarray(val_ds.labels)
        steps_per_epoch = math.ceil(len(train_ds) / (self.C * self.U))
        schedule = optax.cosine_decay_schedule(lr, epochs * steps_per_epoch)
        tx = optax.radam(schedule, b1=0.9, b2=0.999, eps=1e-8)
        params = replicate(self.mesh, self.variables["params"])
        opt_state = replicate(self.mesh, tx.init(params))
        extra = replicate(
            self.mesh, {k_: v for k_, v in self.variables.items() if k_ != "params"}
        )

        C, U, U_val = self.C, self.U, self.U_val

        def train_step(params, extra, opt_state, feats, y, dkey):
            def loss_fn(p):
                out, updates = self._embed({"params": p, **extra}, feats, True, dkey)
                emb = self._emb_of(out)
                grouped = emb.reshape(C, emb.shape[0] // C, -1)
                loss = losses.angle_proto_loss(grouped, 10.0, -5.0)
                if self.ce_mode:
                    loss = loss + losses.weighted_cross_entropy(out[1], y)
                return loss, updates

            (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            new_updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, new_updates)
            return params, opt_state, loss, updates

        def val_step(params, extra, feats):
            out, _ = self._embed({"params": params, **extra}, feats, False)
            emb = self._emb_of(out)
            grouped = emb.reshape(C, emb.shape[0] // C, -1)
            return losses.angle_proto_loss(grouped, 10.0, -5.0)

        train_jit: Dict = {}
        val_jit: Dict = {}
        best = {"epoch": -1, "val_angle": float("inf")}
        for epoch in range(epochs):
            sampler = PerfectBatchSampler(
                train_sampler_labels, range(self.C), C * U, shuffle=True,
                drop_last=True, seed=int(self.rng.integers(0, 2 ** 31)),
            )
            last = None
            for idxs in sampler:
                feats, y = self._collate(train_ds, list(idxs), U)
                self.key, dkey = jax.random.split(self.key)
                sig = feats.shape
                if sig not in train_jit:
                    train_jit[sig] = jax.jit(train_step, donate_argnums=(0, 2))
                feats_d, y_d = shard_batch(self.mesh, (feats, y))
                params, opt_state, loss, updates = train_jit[sig](
                    params, extra, opt_state, feats_d, y_d,
                    replicate(self.mesh, dkey),
                )
                if updates:
                    extra = dict(updates)
                last = float(loss)

            if self.ce_mode:
                v, f1 = self._eval_ce(params, extra, val_ds, val_jit)
                log(f"epoch {epoch + 1}/{epochs}: train loss={last:.4f} "
                    f"dev CE={v:.4f} dev f1={f1:.4f}")
                ckpt_name = "ser.pt"
            else:
                val_sampler = PerfectBatchSampler(
                    val_sampler_labels, range(self.C), C * U_val, shuffle=False,
                    drop_last=True,
                )
                v_losses = []
                for idxs in val_sampler:
                    feats, _ = self._collate(val_ds, list(idxs), U_val)
                    sig = feats.shape
                    if sig not in val_jit:
                        val_jit[sig] = jax.jit(val_step)
                    (feats_d,) = shard_batch(self.mesh, (feats,))
                    v_losses.append(float(val_jit[sig](params, extra, feats_d)))
                v = float(np.mean(v_losses)) if v_losses else float("nan")
                log(f"epoch {epoch + 1}/{epochs}: train angle={last:.4f} val angle={v:.4f}")
                ckpt_name = "angle_ser.pt"
            if v < best["val_angle"]:
                best = {"epoch": epoch, "val_angle": v}
                self.variables = {"params": params, **extra}
                if model_path:
                    self.save_torch_checkpoint(
                        os.path.join(model_path, ckpt_name)
                    )
        self.variables = {"params": params, **extra}
        return best

    def _eval_ce(self, params, extra, val_ds, fwd_jit):
        from ..utils.metrics import macro_f1

        logits_all, y_all = [], []
        bs = self.val_batch_size
        for s0 in range(0, len(val_ds) - len(val_ds) % bs, bs):
            # plain sequential (un-regrouped) batches, reference val loop
            idxs = list(range(s0, s0 + bs))
            feats_list = [val_ds.features(i) for i in idxs]
            t_max = max(f.shape[0] for f in feats_list)
            q = self.bucket_quantum
            t_pad = ((t_max + q - 1) // q) * q
            fb = np.zeros((bs, t_pad, feats_list[0].shape[1]), np.float32)
            for i, f in enumerate(feats_list):
                fb[i, : f.shape[0]] = f
            y = np.asarray([val_ds.labels[i] for i in idxs], np.int64)
            sig = ("ce", fb.shape)
            if sig not in fwd_jit:
                fwd_jit[sig] = jax.jit(
                    lambda p, e, x: self._embed({"params": p, **e}, x, False)[0]
                )
            (fb_d,) = shard_batch(self.mesh, (fb,))
            out = fwd_jit[sig](params, extra, fb_d)
            logits_all.append(np.asarray(out[1]))
            y_all.append(y)
        logits = np.concatenate(logits_all)
        y = np.concatenate(y_all)
        classes, counts = np.unique(y, return_counts=True)
        n_cls = logits.shape[1]
        w = np.zeros(n_cls, np.float32)
        total = len(y)
        for c, cnt in zip(classes, counts):
            w[c] = total / (n_cls * cnt)
        z = logits - logits.max(1, keepdims=True)
        logp = z - np.log(np.exp(z).sum(1, keepdims=True))
        nll = -logp[np.arange(len(y)), y]
        ce = float((nll * w[y]).sum() / w[y].sum())
        f1 = macro_f1(y, logits.argmax(1), n_cls)
        return ce, f1

    def save_torch_checkpoint(self, path: str):
        """Flat torch state-dict with the reference module names."""
        from ..utils import ptio

        params = jax.tree.map(np.asarray, self.variables["params"])
        bstats = self.variables.get("batch_stats")
        sd = {}
        if "wav_proj" in params:  # ProtoSERNet family
            sd["wav_proj.weight"] = params["wav_proj"]["kernel"].T
            sd["wav_proj.bias"] = params["wav_proj"]["bias"]
            mha = params["multihead_attn"]
            sd["multihead_attn.in_proj_weight"] = mha["in_proj_kernel"].T
            sd["multihead_attn.in_proj_bias"] = mha["in_proj_bias"]
            sd["multihead_attn.out_proj.weight"] = mha["out_kernel"].T
            sd["multihead_attn.out_proj.bias"] = mha["out_bias"]
            sd["attn_norm.weight"] = params["attn_norm"]["scale"]
            sd["attn_norm.bias"] = params["attn_norm"]["bias"]
            sd["conv1d.weight"] = params["conv1d"]["kernel"].transpose(2, 1, 0)
            sd["conv1d.bias"] = params["conv1d"]["bias"]
            sd["conv_norm.weight"] = params["conv_norm"]["scale"]
            sd["conv_norm.bias"] = params["conv_norm"]["bias"]
            sd["attn_pooling.weight"] = params["attn_pooling"]["kernel"].T
            sd["attn_pooling.bias"] = params["attn_pooling"]["bias"]
            if "classifier_fc1" in params:
                sd["classifier.0.weight"] = params["classifier_fc1"]["kernel"].T
                sd["classifier.0.bias"] = params["classifier_fc1"]["bias"]
                sd["classifier.3.weight"] = params["classifier_fc2"]["kernel"].T
                sd["classifier.3.bias"] = params["classifier_fc2"]["bias"]
        else:  # BidirectionalReferenceEncoder
            for i in range(6):
                conv = params[f"conv{i}"]
                sd[f"convs.{i}.weight"] = conv["kernel"].transpose(3, 2, 0, 1)
                sd[f"convs.{i}.bias"] = conv["bias"]
                bn, bs = params[f"bn{i}"], bstats[f"bn{i}"]
                sd[f"bns.{i}.weight"] = bn["scale"]
                sd[f"bns.{i}.bias"] = bn["bias"]
                sd[f"bns.{i}.running_mean"] = bs["mean"]
                sd[f"bns.{i}.running_var"] = bs["var"]
            gru = params["recurrence"]
            for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
                sd[f"recurrence.weight_ih_l0{suffix}"] = gru[f"w_ih_{d}"].T
                sd[f"recurrence.weight_hh_l0{suffix}"] = gru[f"w_hh_{d}"].T
                sd[f"recurrence.bias_ih_l0{suffix}"] = gru[f"b_ih_{d}"]
                sd[f"recurrence.bias_hh_l0{suffix}"] = gru[f"b_hh_{d}"]
        ptio.save_state_dict(sd, path)


_PROTO_VARIANTS = {
    # script → (net builder, target, C, U, U_val, data, perturb, mel_sr)
    "wavlm_only": dict(
        net=lambda cfg: ProtoSERNet(cfg.get("feat1_dim", 1024), 512, 8, 1),
        target="emotion", C=8, U=10, U_val=5, data="lazy",
    ),
    # base (non-"_only") variant: CE + angle, dev CE/F1 selection → ser.pt
    "wavlm_ce": dict(
        net=lambda cfg: ProtoSERNet(cfg.get("feat1_dim", 1024), 512, 8, 1),
        target="emotion", C=8, U=10, U_val=5, data="lazy", ce=True,
    ),
    "melspec_only": dict(
        net=lambda cfg: ProtoSERNet(80, 128, 8, 1),
        target="emotion", C=8, U=10, U_val=5, data="melspec",
        perturb=0.5, mel_sr=1600,  # reference passes sample_rate=1600
    ),
    "melspec_only_gender": dict(
        net=lambda cfg: BidirectionalReferenceEncoder(80, 256),
        target="gender", C=2, U=32, U_val=32, data="melspec",
        perturb=0.0, mel_sr=16000, batch_stats=True,
    ),
    "wavlm_only_gender": dict(
        net=lambda cfg: ProtoSERNet(cfg["hidden_dim"], 512, 0, 4),
        target="gender", C=2, U=32, U_val=32, data="lazy",
    ),
}


def proto_main(variant: str, argv=None) -> dict:
    """CLI for the proto-angular "_only" trainers (reference flags:
    --seed, --config_path; config keys: audio_lazy_dir/wav_dir, label_path,
    epochs, lr, model_path [+hidden_dim for the wavlm gender variant])."""
    import argparse
    import json

    import pandas as pd

    from ..utils import labels as L
    from ..utils.seeding import set_deterministic
    from .engine import setup_run_logging

    spec = _PROTO_VARIANTS[variant]
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--config_path", type=str, default="./configs/config_cat.json")
    ap.add_argument("--gender_labels_csv", type=str,
                    default=os.environ.get("GENDER_LABELS_CSV"))
    args = ap.parse_args(argv)
    set_deterministic(seed=args.seed)
    cfg = json.load(open(args.config_path))
    logger = setup_run_logging(cfg["model_path"])

    df = pd.read_csv(cfg["label_path"])
    if spec["target"] == "gender":
        if "Gender" not in df.columns:
            gdf = pd.read_csv(args.gender_labels_csv)
            df = df.merge(gdf[["FileName", "Gender"]], on="FileName", how="left")
        df["target"] = df["Gender"].map({"Female": 0, "Male": 1})
        df = df[df["target"].notna()]
    else:
        df["target"] = np.argmax(df[L.CLASSES].values, axis=1)

    def build(ds_df, seed):
        names = ds_df["FileName"].tolist()
        y = ds_df["target"].values.astype(np.int64)
        if spec["data"] == "melspec":
            return MelspecProtoDataset(
                names, y, cfg.get("audio_lazy_dir", cfg.get("wav_dir")),
                mel_sample_rate=spec.get("mel_sr", 16000),
                perturb_prob=spec.get("perturb", 0.0), seed=seed,
            )
        return LazyProtoDataset(names, y, cfg["audio_lazy_dir"])

    train_ds = build(df[df.Split_Set == "Train"], args.seed)
    val_ds = build(df[df.Split_Set == "Development"], args.seed + 1)
    engine = ProtoOnlyEngine(
        spec["net"](cfg), spec["C"], spec["U"], spec["U_val"], seed=args.seed,
        has_batch_stats=spec.get("batch_stats", False),
        ce_mode=spec.get("ce", False),
        val_batch_size=int(cfg.get("batch_size", 32)),
    )
    best = engine.fit(
        train_ds, val_ds, epochs=cfg["epochs"], lr=cfg["lr"],
        model_path=cfg["model_path"], log=logger.info,
    )
    logger.info(
        f"Best epoch {best['epoch'] + 1}: val angle loss = {best['val_angle']:.6f}"
    )
    return best
