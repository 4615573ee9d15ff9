"""Fusion training / eval / scoring engine (jit + data-parallel mesh).

One shared engine replaces the reference's 13 copy-pasted ``bin/`` scripts
(SURVEY.md §2.2): the scripts differ only in {n_modalities, neutral head,
sampler, loss}, all of which are flags here.

Reference semantics preserved (citations → bin/train_cat_bimodal_lazy_1head.py
unless noted):
- AdamW(lr, wd=1e-6) (L379), per-epoch cosine annealing to eta_min=1e-6
  (L26-44, L387-391, L440; epoch e uses lr = eta_min + (lr0-eta_min)
  (1+cos(pi·e/EPOCHS))/2).
- loss: weighted CE with inverse-freq train weights, or unweighted CE under
  balanced batches (L416-419); focal loss replaces CE in the backward pass
  when ``use_focalloss`` (L421-427, dynamic-alpha for trimodal,
  train_cat_trimodal_lazy_1head.py:431); ranking adds SoftMarginLoss on the
  neutral head (…_ranking.py:431-439).
- model selection: dev macro-F1 per epoch; best → ``multimodal_ser.pt``
  (L476-492) in torch state-dict format via ``convert_fusion``.
- per-epoch dev weighted CE with dev-set inverse-freq weights (L164-175,
  L475).

Deliberate divergence (documented, better-than-reference): gradient
accumulation averages micro-batch gradients before the optimizer step. The
reference zeroes gradients every batch (L413) which silently discards all
but the last micro-batch; all active configs use accum_step=1 where the two
coincide.

TPU mapping: statically shaped masked batches (train/data.py), a jitted
train step per (T1,T2[,T3]) bucket signature with batch sharded over the
mesh 'data' axis and replicated params — XLA inserts the grad all-reduce
over ICI.
"""

from __future__ import annotations

import logging
import math
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from ..models.convert_fusion import flax_to_torch, torch_to_flax
from ..models.fusion import MultiModalEmotionClassifier
from ..ops.gru import gru_kernel_mesh
from ..parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from ..utils import labels as L
from ..utils import ptio
from ..utils.config import FusionConfig
from ..utils.metrics import macro_f1
from ..utils.seeding import numpy_generator
from . import losses
from .data import Batch, LazyFeatureDataset, PrefetchLoader, epoch_batches


def cosine_epoch_lr(lr0: float, epoch: int, total_epochs: int, eta_min: float = 1e-6) -> float:
    """Reference CosineAnnealingScheduler.get_lr for epoch index (L41-44)."""
    return eta_min + (lr0 - eta_min) * (1 + math.cos(math.pi * epoch / total_epochs)) / 2


def setup_run_logging(model_path: str) -> logging.Logger:
    """File+stream logging into MODEL_PATH, as the reference does (L104-114)."""
    os.makedirs(model_path, exist_ok=True)
    handlers = [
        logging.FileHandler(os.path.join(model_path, "loggingtxt-%d.log" % time.time())),
        logging.StreamHandler(),
    ]
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        handlers=handlers,
        force=True,
    )
    return logging.getLogger()


@dataclass
class EngineOptions:
    ranking: bool = False
    focal_dynamic_alpha: bool = False  # True for the trimodal trainers
    masked: bool = True
    bucket_window: int = 8
    bucket_quantum: int = 64
    log_every: int = 200
    n_devices: Optional[int] = None
    # --- legacy bin/old capability surface (SURVEY.md §2.2) ---
    task: str = "cat"  # 'cat' | 'dim' (train_dim_bimodal_lazy*: CCC regression)
    loss_type: Optional[str] = None  # None→cfg flags; 'ce'|'focal'|'labelsmooth'|'hierarchical'|'f1'
    label_smoothing: float = 0.1
    cka_weight: float = 0.0  # couple speech/text pooled reps (…_cka.py)
    # 'grl' | 'aux' | 'svm' (…_grlgender.py / …_gender.py / …_gender_svm.py)
    gender_mode: Optional[str] = None
    gender_weight: float = 1.0
    mse_weight: float = 0.0  # dim-task MSE auxiliary (train_dim…: ×10 variant)
    model_variant: str = "fusion"  # 'fusion' | 'moe' (…_moe.py) | 'single'
    num_experts: int = 4
    dim_columns: Optional[Sequence[str]] = None  # per-attribute dim trainers
    focal_gamma: float = 2.0  # …_focaloss_gamma3.py
    unweighted_ce: bool = False  # …_nowce.py
    add_ce_to_f1: bool = False  # …_f1loss_wce.py
    attention_heads: Optional[int] = None  # pre-1head legacy head counts
    # …_fromcat.py: warm-start from a cat-trained checkpoint, keeping only
    # name+shape matches (the 3-dim head differs from the 8-emotion head)
    init_from_pretrained: bool = False
    gated_pool: bool = False  # …_fiona.py: sigmoid gates on pooled reps
    modality_norm: bool = True  # False: …_gender_svm.py drops the proj LNs


class FusionEngine:
    """Train/eval/score the lazy-fusion classifier on a TPU mesh."""

    def __init__(self, cfg: FusionConfig, seed: int = 7, options: Optional[EngineOptions] = None):
        self.cfg = cfg
        self.seed = seed
        self.opt = options or EngineOptions()
        self.mesh = make_mesh(self.opt.n_devices)
        self.n_data = self.mesh.shape["data"]
        if self.opt.task == "dim":
            num_out = len(self.opt.dim_columns or ("EmoAct", "EmoDom", "EmoVal"))
        else:
            num_out = cfg.num_emotions
        if self.opt.model_variant == "single":
            # wavlm-only lazy classifier (bin/old/train_cat_wavlm_lazy.py)
            from ..models.fusion_variants import SingleModalitySERClassifier

            self.model = SingleModalitySERClassifier(
                feat_dim=cfg.feat1_dim,
                hidden_dim=cfg.fusion_hidden_dim,
                num_categories=num_out,
                # every single-modality reference script instantiates the
                # classifier with num_attention_heads=1 (train_cat_wavlm_lazy
                # .py:314, train_cat_wavlmbaseplussv_lazy.py:291)
                num_heads=self.opt.attention_heads or 1,
            )
        elif self.opt.model_variant == "moe":
            from ..models.fusion_variants import MoEEmotionClassifier

            self.model = MoEEmotionClassifier(
                feat_dims=cfg.feat_dims,
                fusion_hidden_dim=cfg.fusion_hidden_dim,
                num_emotions=num_out,
                num_experts=self.opt.num_experts,
                dropout=cfg.dropout,
            )
        else:
            # the svm variant's gender head is the plain (no-GRL) aux head
            gender_head = self.opt.gender_mode
            if gender_head == "svm":
                gender_head = "aux"
            self.model = MultiModalEmotionClassifier(
                feat_dims=cfg.feat_dims,
                fusion_hidden_dim=cfg.fusion_hidden_dim,
                num_emotions=num_out,
                dropout=cfg.dropout,
                neutral_head=self.opt.ranking,
                gender_head=gender_head,
                attention_heads=self.opt.attention_heads,
                masked=self.opt.masked,
                gated_pool=self.opt.gated_pool,
                modality_norm=self.opt.modality_norm,
            )
        self.rng = numpy_generator(seed)
        self.key = jax.random.PRNGKey(seed)
        self.params = None
        self._train_step_cache: Dict = {}
        self._eval_step_cache: Dict = {}
        self.logger = logging.getLogger()

    # -- params ------------------------------------------------------------

    def init_params(self):
        self.key, init_key = jax.random.split(self.key)
        if self.opt.model_variant == "single":
            variables = self.model.init(
                init_key, jnp.zeros((2, 64, self.cfg.feat1_dim), jnp.float32),
                jnp.ones((2, 64), jnp.float32), deterministic=True,
            )
        else:
            feats = [jnp.zeros((2, 8, d), jnp.float32) for d in self.cfg.feat_dims]
            masks = [jnp.ones((2, 8), jnp.float32) for _ in self.cfg.feat_dims]
            variables = self.model.init(
                init_key, feats, masks=masks, deterministic=True
            )
        self.params = replicate(self.mesh, variables["params"])
        return self.params

    def load_torch_checkpoint(self, path: str, strict: bool = True):
        """Load a reference-format ``multimodal_ser.pt`` state dict.

        ``strict=False`` mirrors the reference eval loads
        (eval_cat_bimodal_lazy_1head.py:304): missing keys keep their
        initialized values.
        """
        sd = ptio.load_state_dict(path)
        n_mod = len(self.cfg.feat_dims)
        loaded = torch_to_flax(sd, n_mod)
        if self.params is None:
            self.init_params()
        host = jax.tree.map(np.asarray, self.params)

        def merge(base, new, prefix=""):
            for k, v in new.items():
                if isinstance(v, dict):
                    merge(base[k], v, f"{prefix}{k}.")
                else:
                    if base[k].shape != v.shape:
                        # torch raises on size mismatch even with
                        # strict=False (load_state_dict semantics)
                        raise ValueError(
                            f"size mismatch for {prefix}{k}: checkpoint "
                            f"{v.shape} vs model {base[k].shape}"
                        )
                    base[k] = v.astype(base[k].dtype)

        merge(host, loaded)
        self.params = replicate(self.mesh, host)

    def load_torch_checkpoint_filtered(self, path: str):
        """Warm-start load keeping only name+shape matches.

        Mirrors bin/old/train_dim_bimodal_lazy_fromcat.py:342-352: the cat
        checkpoint's 8-way head is silently skipped when this engine's head
        (e.g. 3-dim regression) has a different shape.
        """
        sd = ptio.load_state_dict(path)
        loaded = torch_to_flax(sd, len(self.cfg.feat_dims))
        if self.params is None:
            self.init_params()
        host = jax.tree.map(np.asarray, self.params)

        def merge(base, new):
            for k, v in new.items():
                if k not in base:
                    continue
                if isinstance(v, dict):
                    merge(base[k], v)
                elif base[k].shape == v.shape:
                    base[k] = v.astype(base[k].dtype)

        merge(host, loaded)
        self.params = replicate(self.mesh, host)

    def save_torch_checkpoint(self, path: str):
        host = jax.tree.map(np.asarray, self.params)
        if self.opt.model_variant != "fusion" or self.opt.gender_mode is not None:
            # variants without a reference naming contract: flat path keys
            sd = {}

            def rec(node, prefix):
                for k, v in node.items():
                    if isinstance(v, dict):
                        rec(v, f"{prefix}{k}.")
                    else:
                        sd[f"{prefix}{k}"] = v

            rec(host, "")
            ptio.save_state_dict(sd, path)
            return
        sd = flax_to_torch(host, len(self.cfg.feat_dims))
        ptio.save_state_dict(sd, path)

    # -- jitted steps --------------------------------------------------------

    def _apply_model(self, params, feats, masks, deterministic, dropout_key,
                     use_gru_kernel=False):
        rngs = None if deterministic else {"dropout": dropout_key}
        if self.opt.model_variant == "single":
            logits = self.model.apply(
                {"params": params}, feats[0], masks[0] if masks else None,
                deterministic=deterministic, rngs=rngs,
            )
            return {"logits": logits, "neutral": None, "gender": None,
                    "pooled": None, "fused": None}
        if self.opt.model_variant == "moe":
            logits = self.model.apply(
                {"params": params}, feats, masks=masks,
                deterministic=deterministic, rngs=rngs,
            )
            return {"logits": logits, "neutral": None, "gender": None,
                    "pooled": None, "fused": None}
        return self.model.apply(
            {"params": params}, feats, masks=masks,
            deterministic=deterministic, output_dict=True, rngs=rngs,
            use_gru_kernel=use_gru_kernel,
        )

    def make_tx(self):
        """The production optimizer recipe (reference: AdamW, wd 1e-6).

        Single source of truth — `fit()` and `parallel/audit.py`'s
        train-step lowering must build the SAME optimizer, or the audit
        asserts on a different program than production."""
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=self.cfg.lr, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=1e-6,
        )

    def _use_gru_kernel(self, training: bool = False) -> bool:
        # Fused GRU kernel (ops/pallas/gru_kernel.py). EVAL: single device,
        # or per-shard under the eval step's shard_map wrap below — both
        # places the Pallas call is plain local compute. TRAINING: the
        # kernel pair (sequential-grid forward + reverse-grid Pallas
        # backward via custom_vjp) measured 25.99 vs 29.72 ms/step (1.14x)
        # at production bs64 (scripts/exp_gru_train.py r03c — the earlier
        # 31.0 ms "negative" was kernel-fwd + hand-SCAN-bwd; the Pallas
        # backward itself had never compiled until its scoped-VMEM limit
        # was raised). On multi-device meshes the GSPMD train step can't
        # partition a Pallas custom call directly, so the train-step trace
        # activates ops.gru.gru_kernel_mesh and BiGRU wraps the kernel in
        # a nested shard_map over the data axis (exact + differentiable;
        # tests/test_e2e_fusion.py::TestKernelDataParallel).
        # SER_TPU_GRU_KERNEL=1/0 forces the decision (1 uses Pallas
        # interpret mode off-TPU — for tests; 0 restores the lax.scan).
        # TRAINING on a >1-device mesh additionally requires the train batch
        # (padded to exactly cfg.batch_size) to divide the mesh — the nested
        # shard_map otherwise raises on uneven shards. predict() rounds its
        # batch up to a mesh multiple, so eval is always safe.
        if (
            training
            and self.mesh.size > 1
            and self.cfg.batch_size % self.mesh.size != 0
        ):
            return False
        env = os.environ.get("SER_TPU_GRU_KERNEL")
        if env is not None:
            return env == "1"
        return jax.default_backend() == "tpu"

    def _loss_terms(self, params, batch_dev, dropout_key, class_w, deterministic,
                    use_gru_kernel=False):
        feats, masks, labels, sample_mask, aux_y = batch_dev
        out = self._apply_model(params, feats, masks, deterministic, dropout_key,
                                use_gru_kernel=use_gru_kernel)
        logits = out["logits"]
        opt = self.opt

        if opt.task == "dim":
            # 1-CCC regression (bin/old/train_dim_bimodal_lazy.py:379-390)
            backward = losses.ccc_loss(logits, labels, sample_mask)
            if opt.mse_weight > 0:
                backward = backward + opt.mse_weight * losses.mse_emotion(
                    logits, labels, sample_mask
                )
            return backward, (backward, logits)

        y = jnp.argmax(labels, axis=1)
        if opt.unweighted_ce:
            class_w = None
        ce = losses.weighted_cross_entropy(logits, y, class_w, sample_mask)
        loss_type = opt.loss_type or ("focal" if self.cfg.use_focalloss else "ce")
        if opt.unweighted_ce:
            class_w = None  # …_nowce.py: plain CE regardless of balancing
        if loss_type == "focal":
            backward = losses.focal_loss(
                logits, y, alpha=1.0, gamma=opt.focal_gamma,
                dynamic_alpha=opt.focal_dynamic_alpha, sample_mask=sample_mask,
            )
        elif loss_type == "labelsmooth":
            backward = losses.smoothed_cross_entropy(
                logits, y, smoothing=opt.label_smoothing,
                class_weights=class_w, sample_mask=sample_mask,
            )
        elif loss_type == "hierarchical":
            backward = losses.hierarchical_loss(logits, y, class_w, sample_mask=sample_mask)
        elif loss_type == "f1":
            backward = losses.diff_f1_loss(logits, labels)
            if opt.add_ce_to_f1:  # …_f1loss_wce.py: diff-F1 + weighted CE
                backward = backward + ce
        else:
            backward = ce

        if opt.ranking:
            y_neutral = (2 * labels[:, -1] - 1)[:, None]
            backward = backward + losses.soft_margin_loss(
                out["neutral"], y_neutral, sample_mask
            )
        if opt.cka_weight > 0 and out["pooled"] is not None:
            backward = backward + opt.cka_weight * losses.cka_loss(
                out["pooled"][0], out["pooled"][1]
            )
        if opt.gender_mode == "svm" and aux_y is not None:
            # …_gender_svm.py:446-467: hinge ranking on the gender head ×0.01.
            # QUIRK preserved: the non-focal branch computes its CE on the
            # GENDER logits (L455), so the emotion head trains only under
            # use_focalloss — replicating the reference bug faithfully.
            svm = losses.svm_ranking_loss(
                out["gender"], aux_y.astype(jnp.int32), sample_mask=sample_mask
            )
            if loss_type != "focal":
                backward = losses.weighted_cross_entropy(
                    out["gender"], aux_y.astype(jnp.int32), None, sample_mask
                )
            backward = backward + 0.01 * svm
        elif opt.gender_mode is not None and aux_y is not None:
            backward = backward + opt.gender_weight * losses.weighted_cross_entropy(
                out["gender"], aux_y.astype(jnp.int32), None, sample_mask
            )
        return backward, (ce, logits)

    def _get_train_step(self, shape_sig, use_class_weights: bool):
        key = (shape_sig, use_class_weights)
        if key in self._train_step_cache:
            return self._train_step_cache[key]

        use_gru_kernel = self._use_gru_kernel(training=True)

        def step(params, opt_state, feats, masks, labels, sample_mask, aux_y, class_w, lr, dkey):
            def loss_fn(p):
                return self._loss_terms(
                    p, (feats, masks, labels, sample_mask, aux_y), dkey, class_w, False,
                    use_gru_kernel=use_gru_kernel,
                )

            # trace-time context: on a >1-device mesh, BiGRU's kernel path
            # nests a shard_map over 'data' so the Pallas call partitions
            # while the loss/optimizer math stays GSPMD-global.
            with gru_kernel_mesh(self.mesh if use_gru_kernel else None):
                (backward, (ce, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, backward, ce

        fn = jax.jit(step, donate_argnums=(0, 1))
        self._train_step_cache[key] = fn
        return fn

    def _get_eval_step(self, shape_sig):
        if shape_sig in self._eval_step_cache:
            return self._eval_step_cache[shape_sig]

        use_gru_kernel = self._use_gru_kernel()

        def step(params, feats, masks):
            return self._apply_model(
                params, feats, masks, True, None, use_gru_kernel=use_gru_kernel
            )["logits"]

        if self.mesh.size > 1:
            # per-shard eval (rows per batch are always a multiple of
            # n_data — predict() pads via collate): Pallas kernels stay
            # usable on multi-device eval, same rationale as
            # extract/pipeline._forward's shard_map DP leg
            from jax.sharding import PartitionSpec as P

            fn = jax.jit(
                jax.shard_map(
                    step, mesh=self.mesh,
                    in_specs=(P(), P("data"), P("data")),
                    out_specs=P("data"), check_vma=False,
                )
            )
        else:
            fn = jax.jit(step)
        self._eval_step_cache[shape_sig] = fn
        return fn

    def _device_batch(self, batch: Batch):
        tree = (batch.feats, batch.masks, batch.labels, batch.sample_mask)
        feats, masks, labels, smask = shard_batch(self.mesh, tree)
        aux = None if batch.aux is None else shard_batch(self.mesh, batch.aux)
        return feats, masks, labels, smask, aux

    @staticmethod
    def _sig(batch: Batch) -> Tuple:
        return tuple(f.shape for f in batch.feats)

    # -- training ------------------------------------------------------------

    def fit(
        self,
        train_df: pd.DataFrame,
        val_df: pd.DataFrame,
        log: Optional[logging.Logger] = None,
        resume: bool = False,
        stop_after_epoch: Optional[int] = None,
    ) -> Dict[str, float]:
        cfg = self.cfg
        logger = log or self.logger
        opt = self.opt
        os.makedirs(cfg.model_path, exist_ok=True)

        if opt.task == "dim":
            label_cols = list(opt.dim_columns or ("EmoAct", "EmoDom", "EmoVal"))
        else:
            label_cols = L.CLASSES
        lazy_dirs, feat_dims = cfg.lazy_dirs, cfg.feat_dims
        if opt.model_variant == "single":
            lazy_dirs, feat_dims = (cfg.lazy_dir1,), (cfg.feat1_dim,)
        aux_cols = None
        if opt.gender_mode is not None:
            # gender targets from the merged label frame (…_grlgender.py:143-149)
            aux_cols = train_df["target_gender"].values.astype(np.int64)
        train_ds = LazyFeatureDataset(
            train_df["FileName"].tolist(), train_df[label_cols].values,
            lazy_dirs, feat_dims, aux_labels=aux_cols,
        )
        val_ds = LazyFeatureDataset(
            val_df["FileName"].tolist(), val_df[label_cols].values,
            lazy_dirs, feat_dims,
        )

        if opt.task == "dim":
            train_w, val_w, sample_weights = None, None, None
            use_cw = False
            class_w = None
        else:
            train_w = jnp.asarray(L.class_weights(train_df))
            val_w = L.class_weights(val_df)

            if opt.ranking:
                sample_weights = L.neutral_balanced_sample_weights(train_df)
            elif cfg.use_balanced_batch:
                sample_weights = L.balanced_sample_weights(train_df)
            else:
                sample_weights = None
            # balanced batches → unweighted CE (reference L416-419); ranking
            # always uses the train-weights CE (…_ranking.py keeps both paths).
            use_cw = not cfg.use_balanced_batch
            class_w = train_w if use_cw else None

        self.tx = self.make_tx()
        if self.params is None:
            self.init_params()
        opt_state = replicate(self.mesh, self.tx.init(self.params))

        if cfg.accum_step != 1:
            logger.info(
                "accum_step=%d: using mean-gradient accumulation (reference "
                "zero_grad-per-batch behavior is a bug; see engine docstring)",
                cfg.accum_step,
            )

        best = {"epoch": -1, "macro_f1": 0.0, "dev_loss": float("inf")}
        params = self.params
        global_step = 0
        start_epoch = 0

        from . import checkpointing

        if resume:
            state = checkpointing.load_train_state(cfg.model_path, params, opt_state)
            if state is not None:
                params, opt_state, done_epoch, best, np_state, jax_key = state
                params = replicate(self.mesh, params)
                opt_state = replicate(self.mesh, opt_state)
                self.rng.bit_generator.state = np_state
                self.key = jnp.asarray(jax_key)
                start_epoch = done_epoch + 1
                logger.info(f"Resumed from epoch {done_epoch} (best: {best})")

        for epoch in range(start_epoch, cfg.epochs):
            lr_e = cosine_epoch_lr(cfg.lr, epoch, cfg.epochs)
            batches = epoch_batches(
                train_ds, cfg.batch_size, self.rng,
                shuffle=True, sample_weights=sample_weights,
                bucket_window=opt.bucket_window,
            )
            loader = PrefetchLoader(train_ds, batches, cfg.batch_size, opt.bucket_quantum)

            if cfg.accum_step == 1:
                for i, batch in enumerate(loader):
                    step_fn = self._get_train_step(self._sig(batch), use_cw)
                    feats, masks, labels, smask, aux = self._device_batch(batch)
                    self.key, dkey = jax.random.split(self.key)
                    params, opt_state, backward, ce = step_fn(
                        params, opt_state, feats, masks, labels, smask, aux,
                        class_w, lr_e, dkey,
                    )
                    global_step += 1
                    if (i + 2) % opt.log_every == 0:
                        logger.info(
                            f"Epoch ({epoch+1}/{cfg.epochs})| step = {i+1}: "
                            f"loss = {float(ce):.6f} current lr = {lr_e:.8g}"
                        )
            else:
                params, opt_state, global_step = self._fit_epoch_accum(
                    loader, params, opt_state, class_w, lr_e, epoch,
                    global_step, logger, use_cw,
                )

            self.params = params
            dev = self.evaluate(val_ds, val_weights=val_w)
            if opt.task == "dim":
                logger.info(
                    f"|VALIDATION| Epoch ({epoch+1}/{cfg.epochs}): "
                    f"eval_loss = {dev['loss']:.6f} ccc = {dev['ccc']}"
                )
                improved = dev["loss"] < best["dev_loss"]
            else:
                logger.info(
                    f"|VALIDATION| Epoch ({epoch+1}/{cfg.epochs}): "
                    f"eval_loss = {dev['loss']:.6f} eval f1 = {dev['macro_f1']:.6f}"
                )
                improved = dev["macro_f1"] > best["macro_f1"]
            if improved:
                logger.info(f"New best model at epoch {epoch+1}")
                best = {
                    "epoch": epoch,
                    "macro_f1": dev.get("macro_f1", 0.0),
                    "dev_loss": dev["loss"],
                }
                self.save_torch_checkpoint(
                    os.path.join(cfg.model_path, "multimodal_ser.pt")
                )
            checkpointing.save_train_state(
                cfg.model_path, params, opt_state, epoch, best, self.rng, self.key
            )
            if stop_after_epoch is not None and epoch >= stop_after_epoch:
                logger.info(f"Stopping after epoch {epoch} (stop_after_epoch)")
                break
        return best

    def _fit_epoch_accum(
        self, loader, params, opt_state, class_w, lr_e, epoch, global_step, logger, use_cw
    ):
        """Mean-gradient accumulation path (accum_step > 1)."""
        cfg, opt = self.cfg, self.opt
        accum = None
        n_micro = 0

        use_gru_kernel = self._use_gru_kernel(training=True)

        def grad_step(params, feats, masks, labels, smask, aux_y, cw, dkey):
            def loss_fn(p):
                return self._loss_terms(
                    p, (feats, masks, labels, smask, aux_y), dkey, cw, False,
                    use_gru_kernel=use_gru_kernel,
                )

            with gru_kernel_mesh(self.mesh if use_gru_kernel else None):
                (backward, (ce, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads, backward, ce

        def apply_step(params, opt_state, grads, lr, scale):
            grads = jax.tree.map(lambda g: g / scale, grads)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        grad_jit: Dict = {}
        apply_jit = jax.jit(apply_step, donate_argnums=(0, 1, 2))
        add_jit = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b), donate_argnums=(0,))
        n_batches = len(loader)

        for i, batch in enumerate(loader):
            sig = self._sig(batch)
            if sig not in grad_jit:
                grad_jit[sig] = jax.jit(grad_step)
            feats, masks, labels, smask, aux = self._device_batch(batch)
            self.key, dkey = jax.random.split(self.key)
            grads, backward, ce = grad_jit[sig](
                params, feats, masks, labels, smask, aux, class_w, dkey
            )
            accum = grads if accum is None else add_jit(accum, grads)
            n_micro += 1
            if (i + 1) % cfg.accum_step == 0 or (i + 1) == n_batches:
                params, opt_state = apply_jit(
                    params, opt_state, accum, lr_e, float(n_micro)
                )
                accum, n_micro = None, 0
            global_step += 1
            if (i + 2) % opt.log_every == 0:
                logger.info(
                    f"Epoch ({epoch+1}/{cfg.epochs})| step = {i+1}: "
                    f"loss = {float(ce):.6f} current lr = {lr_e:.8g}"
                )
        return params, opt_state, global_step

    # -- evaluation / scoring -------------------------------------------------

    def predict(self, dataset: LazyFeatureDataset, batch_size: Optional[int] = None):
        """Logits for every sample, order-preserving (masked batched == batch-1)."""
        bs = batch_size or max(self.cfg.batch_size, self.n_data)
        bs = ((bs + self.n_data - 1) // self.n_data) * self.n_data
        n = len(dataset)
        order = np.argsort(_lengths_for_sort(dataset), kind="stable")
        if self.opt.task == "dim":
            out_dim = len(self.opt.dim_columns or ("EmoAct", "EmoDom", "EmoVal"))
        else:
            out_dim = self.cfg.num_emotions
        logits_out = np.zeros((n, out_dim), np.float32)
        for start in range(0, n, bs):
            idxs = order[start : start + bs].tolist()
            batch = dataset.collate(idxs, bs, self.opt.bucket_quantum)
            step_fn = self._get_eval_step(self._sig(batch))
            feats, masks, _, _, _ = self._device_batch(batch)
            logits = np.asarray(step_fn(self.params, feats, masks))
            logits_out[idxs] = logits[: len(idxs)]
        return logits_out

    def evaluate(
        self, dataset: LazyFeatureDataset, val_weights: Optional[np.ndarray] = None
    ) -> Dict[str, float]:
        logits = self.predict(dataset)
        if self.opt.task == "dim":
            from ..utils.metrics import concordance_ccc

            labels = np.asarray(dataset.labels, np.float32)
            n_attr = logits.shape[1]
            cccs = [concordance_ccc(logits[:, i], labels[:, i]) for i in range(n_attr)]
            return {"loss": float(n_attr) - sum(cccs), "ccc": cccs, "logits": logits}
        y = np.argmax(dataset.labels, axis=1)
        preds = np.argmax(logits, axis=1)
        f1 = macro_f1(y, preds, self.cfg.num_emotions)
        loss = _host_weighted_ce(logits, y, val_weights)
        return {"macro_f1": f1, "loss": loss, "logits": logits, "preds": preds, "y": y}


def _host_weighted_ce(logits: np.ndarray, y: np.ndarray, class_w: Optional[np.ndarray]):
    z = logits - logits.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    nll = -logp[np.arange(len(y)), y]
    w = np.ones_like(nll) if class_w is None else np.asarray(class_w)[y]
    return float((nll * w).sum() / w.sum())


def _lengths_for_sort(dataset: LazyFeatureDataset) -> np.ndarray:
    from .data import _primary_lengths

    return _primary_lengths(dataset)


def save_predictions_with_probs(
    logits: np.ndarray,
    utts: Sequence[str],
    model_path: str,
    dtype: str = "dev",
    filename_header: str = "Filename",
) -> str:
    """Write results/{dev,test,train}.csv in the reference's exact format.

    Raw logits at 4 decimals; 'Filename' header for dev/train, 'FileName'
    for test (reference eval…1head.py:369 vs test…stacking.py:351 quirk).
    """
    import csv as _csv

    os.makedirs(os.path.join(model_path, "results"), exist_ok=True)
    out = os.path.join(model_path, "results", f"{dtype}.csv")
    num_classes = logits.shape[1]
    headers = [filename_header, "Prediction"] + [
        f"class_{i}_prob" for i in range(num_classes)
    ]
    with open(out, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(headers)
        for utt, row in zip(utts, logits):
            pred = L.INDEX_TO_LETTER[int(np.argmax(row))]
            w.writerow([utt, pred] + [f"{p:.4f}" for p in row])
    return out
