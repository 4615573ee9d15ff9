"""HLO-level collective audit: the multi-chip paths must COMMUNICATE.

The multichip value-equality tests (1-dev == N-dev trajectories,
tests/test_multichip.py, tests/test_e2e_fusion.py) cannot distinguish a
genuinely communicating mesh program from a silently fully-replicated one —
both produce identical numbers. These tests compile the production steps
over the virtual 8-device CPU mesh and assert the optimized HLO contains
the collectives the sharding story promises, with the volumes it promises:

  (a) the GSPMD data-parallel fusion train step all-reduces AT LEAST the
      full gradient volume (every parameter's grad crosses shards once);
  (b) the tp=2 extraction leg actually partitions the megatron FFN matmuls
      (per-device FFN kernel parameter shapes are halved; the row-parallel
      partial products are all-reduced);
  (c) the nested-shard_map GRU kernel site emits the transpose psum for
      the replicated w_hh/b_hh cotangents (the all-reduce volume accounts
      for every GRU parameter).

Reference context: SURVEY.md §2.9 — the reference is single-GPU; the DP
grad all-reduce over ICI is the distributed story being proven here.
"""

import re
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interspeech_ser_tpu.parallel.audit import (
    collective_audit,
    lower_fusion_train_step,
    param_elements,
)
from interspeech_ser_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


class TestDataParallelCollectives:
    def test_train_step_allreduces_full_grad_volume(self, monkeypatch):
        """The jitted DP train step must all-reduce >= one full grad set."""
        from interspeech_ser_tpu.train.engine import EngineOptions, FusionEngine
        from interspeech_ser_tpu.utils.config import FusionConfig

        monkeypatch.setenv("SER_TPU_GRU_KERNEL", "0")  # plain GSPMD scan path
        cfg = FusionConfig(
            wav_dir="", txt_dir="", lazy_dir1="", lazy_dir2="", label_path="",
            feat1_dim=24, feat2_dim=16, epochs=1, lr=1e-4,
            model_path=tempfile.mkdtemp(), batch_size=16, accum_step=1,
            fusion_hidden_dim=16,
        )
        eng = FusionEngine(cfg, options=EngineOptions(n_devices=8))
        txt = lower_fusion_train_step(eng)
        audit = collective_audit(txt)
        n_params = param_elements(eng.params)
        assert audit["all-reduce"]["count"] >= 1, "DP step emitted NO all-reduce"
        # every parameter's gradient must cross the mesh at least once
        # (measured: ~2.7x — XLA also all-reduces some backward intermediates)
        assert audit["all-reduce"]["elements"] >= n_params, (
            f"all-reduce volume {audit['all-reduce']['elements']} < "
            f"param count {n_params}: grads are not being averaged over 'data'"
        )

    def test_gru_kernel_step_also_allreduces(self, monkeypatch):
        """Same audit with the fused-GRU kernel pair forced on (the TPU
        multi-device training default): the nested-shard_map wrap must not
        swallow the grad all-reduce."""
        from interspeech_ser_tpu.train.engine import EngineOptions, FusionEngine
        from interspeech_ser_tpu.utils.config import FusionConfig

        monkeypatch.setenv("SER_TPU_GRU_KERNEL", "1")
        cfg = FusionConfig(
            wav_dir="", txt_dir="", lazy_dir1="", lazy_dir2="", label_path="",
            feat1_dim=24, feat2_dim=16, epochs=1, lr=1e-4,
            model_path=tempfile.mkdtemp(), batch_size=16, accum_step=1,
            fusion_hidden_dim=16,
        )
        eng = FusionEngine(cfg, options=EngineOptions(n_devices=8))
        txt = lower_fusion_train_step(eng)
        audit = collective_audit(txt)
        n_params = param_elements(eng.params)
        assert audit["all-reduce"]["elements"] >= n_params


class TestTensorParallelCollectives:
    def test_tp2_extraction_partitions_ffn_matmuls(self):
        """tp=2 must shard the megatron FFN kernels per-device (halved
        parameter shapes, full shapes absent) and all-reduce the
        row-parallel partial products."""
        from interspeech_ser_tpu.extract.pipeline import SpeechExtractionPipeline
        from interspeech_ser_tpu.models.speech import SpeechConfig, SpeechEncoderModel

        # conv_dim 24 (not 16) so feature_projection's kernel is [24,32] —
        # with conv_dim 16 it was [16,32], identical to the row-sharded
        # out_proj shape, making that assert vacuously true even if
        # out_proj sharded the WRONG axis (review-found). Every asserted
        # shape below is now unique to one parameter.
        scfg = SpeechConfig(
            hidden_size=32, num_layers=2, num_heads=4, intermediate_size=128,
            conv_dim=(24, 24), conv_kernel=(10, 3), conv_stride=(5, 2),
            conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
            attention_type="wavlm", num_buckets=32, max_distance=64,
            num_conv_pos_embeddings=16, conv_pos_groups=4,
        )
        enc = SpeechEncoderModel(scfg)
        params = enc.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 4000), jnp.float32),
            jnp.ones((1, 4000), jnp.float32),
        )["params"]
        pipe = SpeechExtractionPipeline(
            enc, params, scfg, n_devices=8, model_parallel=2
        )
        fn = pipe._forward((8, 4000), -1)
        rng = np.random.default_rng(0)
        wav = jax.device_put(
            rng.normal(size=(8, 4000)).astype(np.float32),
            batch_sharding(pipe.mesh, 2),
        )
        mask = jax.device_put(
            np.ones((8, 4000), np.float32), batch_sharding(pipe.mesh, 2)
        )
        txt = fn.lower(pipe.params, wav, mask).compile().as_text()

        pshapes = set(re.findall(r"f32\[([0-9,]+)\][^ ]* parameter\(", txt))
        # intermediate_dense kernel [32,128] → column-sharded [32,64];
        # output_dense kernel [128,32] → row-sharded [64,32]
        assert "32,64" in pshapes and "64,32" in pshapes, (
            f"FFN kernels not halved per-device: {sorted(pshapes)}"
        )
        assert "32,128" not in pshapes and "128,32" not in pshapes, (
            "full (unsharded) FFN kernel shapes present — tp=2 is replicating"
        )
        # attention q/k/v kernels [32,32] → column-sharded [32,16] (2 whole
        # heads per device); out_proj [32,32] → row-sharded [16,32]; the
        # full [32,32] shape must be ABSENT. With conv_dim=24 these
        # per-device shapes belong ONLY to the attention kernels
        # (feature_projection is [24,32]), so a wrong partition axis on
        # either side cannot slip through on a shape collision.
        assert "32,16" in pshapes and "16,32" in pshapes, (
            f"attention kernels not halved per-device: {sorted(pshapes)}"
        )
        assert "32,32" not in pshapes, (
            "full (unsharded) attention kernel shapes present — the "
            "megatron attention sharding is replicating"
        )
        audit = collective_audit(txt)
        total = sum(rec["count"] for rec in audit.values())
        assert total >= 1, "tp=2 forward emitted NO collectives"
        assert audit["all-reduce"]["count"] >= 1, (
            "no all-reduce: row-parallel FFN partial sums are not combined"
        )


class TestNestedShardMapPsum:
    def test_gru_kernel_wrap_emits_transpose_psum(self, monkeypatch):
        """The nested-shard_map GRU kernel site must psum the replicated
        w_hh/b_hh cotangents; total all-reduce volume must account for
        EVERY GRU parameter's gradient."""
        from interspeech_ser_tpu.ops.gru import BiGRU, gru_kernel_mesh

        monkeypatch.setenv("SER_TPU_GRU_KERNEL", "1")
        mesh = make_mesh(8)
        model = BiGRU(hidden_dim=8)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(16, 10, 12)).astype(np.float32))
        m = jnp.ones((16, 10), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, m)["params"]

        def step(p, x, m):
            def loss(p):
                out = model.apply({"params": p}, x, m, use_kernel=True)
                return jnp.sum(out * out)

            with gru_kernel_mesh(mesh):
                return jax.value_and_grad(loss)(p)

        xs, ms = shard_batch(mesh, (x, m))
        ps = replicate(mesh, params)
        txt = jax.jit(step).lower(ps, xs, ms).compile().as_text()

        audit = collective_audit(txt)
        n_params = param_elements(params)
        # grads of w_ih/b_ih arrive via the GSPMD all-reduce, w_hh2/b_hh2
        # via shard_map's transpose psum; XLA may combine them into one
        # variadic all-reduce — the total volume is the invariant.
        # (measured: exactly n_params + 1 — the +1 is the scalar loss.)
        assert audit["all-reduce"]["elements"] >= n_params, (
            f"all-reduce volume {audit['all-reduce']['elements']} < GRU "
            f"param count {n_params}: the kernel wrap dropped a cotangent"
        )
        # the shard_map transpose psum is visible in instruction metadata
        assert any(
            "psum" in line and "all-reduce" in line for line in txt.splitlines()
        ), "no psum-attributed all-reduce: shard_map transpose missing"


class TestLoRACollectives:
    def test_lora_dp_step_allreduces_only_trainable(self, tmp_path):
        """The LoRA fine-tune DP step must all-reduce the TRAINABLE grad
        volume (lora + head) — and must NOT also be averaging frozen-base
        gradients (volume stays below trainable + base).

        Measured on the virtual mesh: trainable 18,434 / base 23,160 /
        all-reduce 22,020 elems — frozen-base grads never cross."""
        import optax
        import torch
        from transformers import WavLMConfig, WavLMModel

        from interspeech_ser_tpu.ops.kernel_context import kernel_mesh
        from interspeech_ser_tpu.train import losses
        from interspeech_ser_tpu.train.lora_engine import LoRAFTEngine

        torch.manual_seed(6)
        cfg = WavLMConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
            conv_stride=[5, 2], num_feat_extract_layers=2,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            num_buckets=32, max_bucket_distance=64, do_stable_layer_norm=True,
            feat_extract_norm="layer", conv_bias=True, layerdrop=0.0,
        )
        WavLMModel(cfg).save_pretrained(str(tmp_path / "hf"))

        eng = LoRAFTEngine(str(tmp_path / "hf"), rank=2, num_emotions=2, n_devices=8)
        tx = optax.adamw(1e-4)
        trainable = replicate(eng.mesh, {"lora": eng.lora, "head": eng.head_params})
        opt_state = replicate(eng.mesh, tx.init(trainable))
        base = replicate(eng.mesh, eng.base_params)
        rng = np.random.default_rng(0)
        B, L = 8, 3200
        wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
        mask = jnp.ones((B, L), jnp.float32)
        y = jnp.asarray(rng.integers(0, 2, B))
        smask = jnp.ones((B,), jnp.float32)

        def step(base, trainable, opt_state, wav, mask, y, smask, dkey):
            def loss_fn(t):
                logits = eng._forward(base, t["lora"], t["head"], wav, mask, False, dkey)
                return losses.weighted_cross_entropy(logits, y, None, smask)

            with kernel_mesh(eng.mesh):
                loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            import optax as _o
            return _o.apply_updates(trainable, updates), opt_state, loss

        args = shard_batch(eng.mesh, (wav, mask, y, smask))
        txt = (
            jax.jit(step, donate_argnums=(1, 2))
            .lower(base, trainable, opt_state, *args, jax.random.PRNGKey(0))
            .compile()
            .as_text()
        )
        audit = collective_audit(txt)
        n_train = param_elements(trainable)
        n_base = param_elements(eng.base_params)
        ar = audit["all-reduce"]["elements"]
        assert ar >= n_train, (
            f"all-reduce {ar} < trainable {n_train}: LoRA/head grads not averaged"
        )
        assert ar < n_train + n_base, (
            f"all-reduce {ar} >= trainable+base {n_train + n_base}: "
            "frozen-base gradients are crossing the mesh"
        )


class TestProtoCollectives:
    def test_proto_step_gathers_embeddings_and_reduces_grads(self):
        """The angular-proto DP step shards rows but computes a
        batch-GLOBAL grouped loss: the compiled step must all-gather the
        [B, D] embeddings and all-reduce >= the full grad volume."""
        import optax

        from interspeech_ser_tpu.train import losses
        from interspeech_ser_tpu.train.proto_engine import ProtoAngularEngine

        eng = ProtoAngularEngine(
            feat_dim=12, num_classes=8, utter_per_class=4, n_devices=8
        )
        C, U = 8, 4
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(C * U, 10, 12)).astype(np.float32))
        mask = jnp.ones((C * U, 10), jnp.float32)
        params = eng.model.init(jax.random.PRNGKey(0), feats, mask)["params"]
        tx = optax.adamw(1e-4)
        params_r = replicate(eng.mesh, params)
        opt_state = replicate(eng.mesh, tx.init(params_r))
        wb = replicate(eng.mesh, {"w": jnp.asarray(10.0), "b": jnp.asarray(-5.0)})

        def step(params, wb, opt_state, feats, mask):
            def loss_fn(p, wb):
                emb = eng.model.apply({"params": p}, feats, mask)
                return losses.angle_proto_loss(emb.reshape(C, U, -1), wb["w"], wb["b"])

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, wb)
            updates, opt_state = tx.update(grads[0], opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        feats_d, mask_d = shard_batch(eng.mesh, (feats, mask))
        txt = (
            jax.jit(step, donate_argnums=(0, 2))
            .lower(params_r, wb, opt_state, feats_d, mask_d)
            .compile()
            .as_text()
        )
        audit = collective_audit(txt)
        n_params = param_elements(params)
        assert audit["all-reduce"]["elements"] >= n_params, (
            "proto grads not averaged over 'data'"
        )
        assert audit["all-gather"]["count"] >= 1, (
            "no all-gather: the batch-global grouped loss is not collecting "
            "embeddings across shards — rows may be silently replicated"
        )


class TestXVectorSyncBN:
    def test_xvector_step_syncs_bn_moments_and_grads(self):
        """XVector DP training relies on GSPMD turning BatchNorm's batch
        moments into GLOBAL moments (sync-BN). The compiled step's
        all-reduce volume must exceed the grad volume by the moment
        vectors (measured: +10,645 elems over 4,245,084 grads, 11
        separate all-reduces)."""
        import optax

        from interspeech_ser_tpu.baseline.xvector_engine import XVectorEngine
        from interspeech_ser_tpu.train import losses

        eng = XVectorEngine(head_dim=64, n_devices=8)
        rng = np.random.default_rng(0)
        B, L = 8, 3200
        wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
        lengths = jnp.full((B,), L, jnp.float32)
        y = jnp.asarray(rng.integers(0, 8, B))
        tx = optax.adamw(1e-4)
        trainable = replicate(eng.mesh, {"xv": eng.xv_params, "head": eng.head_params})
        stats = replicate(eng.mesh, eng.xv_stats)
        opt_state = replicate(eng.mesh, tx.init(trainable))

        def step(trainable, stats, opt_state, wav, lengths, y, dkey):
            def loss_fn(t):
                pred, new_stats = eng._apply(
                    t["xv"], stats, t["head"], wav, lengths, True, dkey
                )
                return losses.weighted_cross_entropy(pred, y), new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable
            )
            updates, opt_state = tx.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), new_stats, opt_state, loss

        wav_d, len_d, y_d = shard_batch(eng.mesh, (wav, lengths, y))
        txt = (
            jax.jit(step, donate_argnums=(0, 2))
            .lower(trainable, stats, opt_state, wav_d, len_d, y_d,
                   jax.random.PRNGKey(0))
            .compile()
            .as_text()
        )
        audit = collective_audit(txt)
        n_train = param_elements(trainable)
        ar = audit["all-reduce"]["elements"]
        assert ar >= n_train, "xvector grads not averaged over 'data'"
        assert ar >= n_train + 1024, (
            f"all-reduce volume {ar} barely covers the grads ({n_train}): "
            "BatchNorm batch moments are not being synced across shards"
        )
        assert audit["all-reduce"]["count"] >= 2, (
            "a single combined all-reduce cannot carry forward BN moment "
            "syncs (they happen before the backward)"
        )


class TestAuditParser:
    """Pin collective_audit's parsing against canned HLO forms so a
    format drift fails loudly here, not vacuously in the volume asserts."""

    def test_sync_and_variadic_forms(self):
        txt = "\n".join([
            "  %all-reduce = f32[8,16]{1,0} all-reduce(%dot.1), channel_id=1",
            "  %ar2 = (f32[4,4]{1,0}, f32[16]{0}) all-reduce(%a, %b), to_apply=%add",
            "  %ag = f32[64,8]{1,0} all-gather(%x), dimensions={0}",
            "  %done = f32[8,16]{1,0} all-reduce-done(%start)",  # ignored
        ])
        audit = collective_audit(txt)
        assert audit["all-reduce"]["count"] == 2
        assert audit["all-reduce"]["elements"] == 128 + 16 + 16
        assert audit["all-gather"]["count"] == 1
        assert audit["all-gather"]["elements"] == 512

    def test_async_start_counts_output_only(self):
        txt = (
            "  %ags = (f32[8,16]{1,0}, f32[64,16]{1,0}, u32[], u32[]) "
            "all-gather-start(%x), dimensions={0}"
        )
        audit = collective_audit(txt)
        assert audit["all-gather"]["count"] == 1
        # operand alias (128) and u32 contexts dropped; output (1024) kept
        assert audit["all-gather"]["elements"] == 1024

    def test_all_to_all_counted(self):
        """XLA:TPU may lower a sharded contraction to all-to-all ONLY —
        the audit must not report 'NONE' there (ADVICE r04). Sync and
        async-start forms both count."""
        txt = "\n".join([
            "  %a2a = f32[8,32]{1,0} all-to-all(%x), dimensions={1}",
            "  %a2as = (f32[4,8]{1,0}, f32[4,8]{1,0}) "
            "all-to-all-start(%y), dimensions={0}",
            "  %a2ad = f32[4,8]{1,0} all-to-all-done(%a2as)",  # ignored
        ])
        audit = collective_audit(txt)
        assert audit["all-to-all"]["count"] == 2
        assert audit["all-to-all"]["elements"] == 256 + 32

    def test_combined_all_reduce_start_counts_all_results(self):
        """XLA's AsyncCollectiveCreator gives all-reduce-start the
        RESULT shape directly (tuple of N results when combined — no
        operand aliases, unlike all-gather-start): every data shape must
        be counted. Halving here under-reported combined all-reduce
        volume ~2× and made `elements >= n_params` receipts spuriously
        fail (review-found)."""
        txt = (
            "  %ars = (f32[8,16]{1,0}, f32[64]{0}) "
            "all-reduce-start(%a, %b), to_apply=%add"
        )
        audit = collective_audit(txt)
        assert audit["all-reduce"]["count"] == 1
        assert audit["all-reduce"]["elements"] == 128 + 64

    def test_reduce_scatter_start_counts_result_half(self):
        """Non-all-reduce async starts keep the (operand half, result
        half, contexts) tuple form — trailing data half counted."""
        txt = (
            "  %rss = (f32[64]{0}, f32[8]{0}, u32[], u32[]) "
            "reduce-scatter-start(%x), dimensions={0}"
        )
        audit = collective_audit(txt)
        assert audit["reduce-scatter"]["count"] == 1
        assert audit["reduce-scatter"]["elements"] == 8

    def test_negative_control_single_device(self):
        """A step compiled WITHOUT sharding must audit to zero collectives
        — guards against the parser over-matching."""
        def loss(w, x):
            return jnp.sum((x @ w) ** 2)

        g = jax.jit(jax.grad(loss))
        w = jnp.ones((16, 8), jnp.float32)
        x = jnp.ones((32, 16), jnp.float32)
        txt = g.lower(w, x).compile().as_text()
        audit = collective_audit(txt)
        assert all(rec["count"] == 0 for rec in audit.values()), audit
