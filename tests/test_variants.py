"""Legacy bin/old capability surface: dim/MoE/GRL/loss variants + samplers."""

import json
import os
import sys

import numpy as np
import pandas as pd
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.ops.grl import gradient_reversal
from interspeech_ser_tpu.train.samplers import (
    BucketBatchSampler,
    PerfectBatchSampler,
    SortedSampler,
    SubsetSampler,
)

RNG = np.random.default_rng(14)


class TestGRL:
    def test_identity_forward_reversed_backward(self):
        x = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(gradient_reversal(x, 2.0)), np.asarray(x))
        g = jax.grad(lambda x: jnp.sum(gradient_reversal(x, 2.0) ** 2))(x)
        expected = -2.0 * 2.0 * np.asarray(x)
        np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)


class TestSamplers:
    def test_subset(self):
        s = SubsetSampler([3, 1, 4])
        assert list(s) == [3, 1, 4] and len(s) == 3

    def test_perfect_batch_balanced(self):
        labels = np.repeat(np.arange(4), 25)
        s = PerfectBatchSampler(labels, range(4), batch_size=8, shuffle=True, drop_last=True)
        batches = list(s)
        assert all(len(b) == 8 for b in batches)
        for b in batches:
            counts = np.bincount(labels[b], minlength=4)
            assert (counts == 2).all()

    def test_perfect_batch_shard_divisibility(self):
        with pytest.raises(AssertionError):
            PerfectBatchSampler(np.zeros(10), range(4), batch_size=10, num_shards=4)

    def test_sorted(self):
        lengths = [5, 2, 9]
        assert list(SortedSampler(lengths)) == [2, 0, 1]

    def test_bucket_batch(self):
        lengths = RNG.integers(1, 100, 64)
        s = BucketBatchSampler(lengths, batch_size=8, bucket_size_multiplier=2)
        batches = list(s)
        assert sum(len(b) for b in batches) == 64
        # within a batch, lengths should be clustered (bucketed)
        spreads = [np.ptp(lengths[b]) for b in batches if len(b) == 8]
        assert np.mean(spreads) < np.ptp(lengths)


@pytest.fixture(scope="module")
def variant_fixture(tmp_path_factory):
    """Synthetic lazy dataset with dim labels + gender column."""
    from interspeech_ser_tpu.utils import labels as L

    root = tmp_path_factory.mktemp("variants")
    rng = np.random.default_rng(7)
    (root / "lazy1").mkdir()
    (root / "lazy2").mkdir()
    rows, names = [], []
    means = rng.normal(scale=2.0, size=(8, 20))
    for i in range(40):
        cls = i % 8
        name = f"u{i:03d}.wav"
        names.append(name)
        t1, t2 = int(rng.integers(15, 60)), int(rng.integers(5, 20))
        torch.save(
            torch.from_numpy((rng.normal(size=(t1, 20)) + means[cls]).astype(np.float32)),
            str(root / "lazy1" / f"u{i:03d}.pt"),
        )
        torch.save(
            torch.from_numpy(rng.normal(size=(t2, 12)).astype(np.float32)),
            str(root / "lazy2" / f"u{i:03d}.pt"),
        )
        onehot = [0.0] * 8
        onehot[cls] = 1.0
        adv = [0.1 * cls, 0.05 * cls, 0.5 - 0.05 * cls]
        split = "Train" if i < 28 else "Development"
        rows.append([name] + onehot + adv + [i % 2, split])
    cols = ["FileName"] + L.CLASSES + ["EmoAct", "EmoDom", "EmoVal", "target_gender", "Split_Set"]
    pd.DataFrame(rows, columns=cols).to_csv(root / "labels.csv", index=False)
    pd.DataFrame({"FileName": names, "transcription": ["x"] * 40}).to_csv(
        root / "tx.csv", index=False
    )
    cfg = {
        "wav_dir": str(root), "txt_dir": str(root / "tx.csv"),
        "lazy_dir1": str(root / "lazy1"), "lazy_dir2": str(root / "lazy2"),
        "label_path": str(root / "labels.csv"), "feat1_dim": 20, "feat2_dim": 12,
        "epochs": 2, "lr": 5e-3, "model_path": str(root / "exp"),
        "batch_size": 8, "accum_step": 1, "fusion_hidden_dim": 12,
    }
    json.dump(cfg, open(root / "config.json", "w"))
    return root


def _fit(root, tmp_name, **overrides):
    from interspeech_ser_tpu.train.engine import EngineOptions, FusionEngine
    from interspeech_ser_tpu.utils import labels as L
    from interspeech_ser_tpu.utils.config import load_fusion_config

    raw = json.load(open(root / "config.json"))
    raw["model_path"] = str(root / tmp_name)
    p = root / f"{tmp_name}.json"
    p.write_text(json.dumps(raw))
    cfg = load_fusion_config(str(p))
    df = L.load_merged(cfg.label_path, cfg.txt_dir)
    engine = FusionEngine(cfg, seed=7, options=EngineOptions(bucket_window=2, **overrides))
    engine.init_params()
    best = engine.fit(df[df.Split_Set == "Train"], df[df.Split_Set == "Development"])
    return engine, best


class TestDimFusion:
    def test_ccc_training_improves(self, variant_fixture):
        engine, best = _fit(variant_fixture, "dim", task="dim")
        assert best["dev_loss"] < 3.0  # better than zero-CCC
        assert os.path.exists(variant_fixture / "dim" / "multimodal_ser.pt")


class TestMoE:
    def test_moe_trains(self, variant_fixture):
        engine, best = _fit(variant_fixture, "moe", model_variant="moe", num_experts=2)
        assert best["macro_f1"] > 0.2


class TestGenderAdversary:
    def test_grl_gender_trains(self, variant_fixture):
        engine, best = _fit(variant_fixture, "grl", gender_mode="grl")
        assert best["macro_f1"] > 0.2
        # gender head exists in params
        assert "gender_classifier" in jax.tree.map(np.asarray, engine.params)


class TestLossVariants:
    @pytest.mark.parametrize("loss_type", ["labelsmooth", "hierarchical", "f1"])
    def test_loss_variants_train(self, variant_fixture, loss_type):
        engine, best = _fit(variant_fixture, f"loss_{loss_type}", loss_type=loss_type)
        assert best["macro_f1"] > 0.2

    def test_cka_coupling(self, variant_fixture):
        engine, best = _fit(variant_fixture, "cka", cka_weight=0.1)
        assert best["macro_f1"] > 0.2


class TestSingleModality:
    def test_wavlm_ser_classifier_runs(self):
        from interspeech_ser_tpu.models.fusion_variants import SingleModalitySERClassifier

        model = SingleModalitySERClassifier(feat_dim=20, hidden_dim=16)
        x = jnp.asarray(RNG.normal(size=(2, 70, 20)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        out = model.apply({"params": params}, x)
        assert out.shape == (2, 8)
        assert np.all(np.isfinite(np.asarray(out)))


class TestSingleModalityVariant:
    def test_single_variant_trains(self, variant_fixture):
        # the maxpool-32 single-modality head needs a few more epochs on
        # the tiny fixture (verified: reaches ~0.6 F1 at epochs=6, lr=1e-2)
        from interspeech_ser_tpu.train.engine import EngineOptions, FusionEngine
        from interspeech_ser_tpu.utils import labels as L
        from interspeech_ser_tpu.utils.config import load_fusion_config

        root = variant_fixture
        raw = json.load(open(root / "config.json"))
        raw.update({"model_path": str(root / "single"), "epochs": 6, "lr": 1e-2,
                    "fusion_hidden_dim": 16})
        p = root / "single.json"
        p.write_text(json.dumps(raw))
        cfg = load_fusion_config(str(p))
        df = L.load_merged(cfg.label_path, cfg.txt_dir)
        engine = FusionEngine(
            cfg, seed=7,
            options=EngineOptions(bucket_window=2, model_variant="single"),
        )
        engine.init_params()
        best = engine.fit(df[df.Split_Set == "Train"], df[df.Split_Set == "Development"])
        assert best["macro_f1"] > 0.3


class TestLegacyParameterizations:
    def test_dim_single_attribute(self, variant_fixture):
        engine, best = _fit(
            variant_fixture, "dim_aro", task="dim", dim_columns=("EmoAct",)
        )
        assert best["dev_loss"] < 1.0  # 1 - CCC for a near-linear target

    def test_focal_gamma3_and_nowce(self, variant_fixture):
        _, best = _fit(
            variant_fixture, "gamma3", loss_type="focal", focal_gamma=3.0,
            unweighted_ce=True,
        )
        assert best["macro_f1"] > 0.2

    def test_f1_plus_ce(self, variant_fixture):
        _, best = _fit(variant_fixture, "f1ce", loss_type="f1", add_ce_to_f1=True)
        assert best["macro_f1"] > 0.2

    def test_attention_heads_override(self, variant_fixture):
        _, best = _fit(variant_fixture, "heads4", attention_heads=4)
        assert best["macro_f1"] > 0.2


class TestFromCat:
    def test_warm_start_filtered_load(self, variant_fixture):
        """fromcat: cat checkpoint warm-starts the dim engine, 8-way head
        skipped for the fresh 3-dim head (ref …_fromcat.py:342-352)."""
        cat_engine, _ = _fit(variant_fixture, "fromcat_cat")
        ckpt = str(variant_fixture / "fromcat_cat" / "pre.pt")
        cat_engine.save_torch_checkpoint(ckpt)

        from interspeech_ser_tpu.train.engine import EngineOptions, FusionEngine
        from interspeech_ser_tpu.utils.config import load_fusion_config

        cfg = load_fusion_config(str(variant_fixture / "fromcat_cat.json"))
        dim = FusionEngine(
            cfg, seed=11, options=EngineOptions(bucket_window=2, task="dim")
        )
        dim.init_params()
        before = np.asarray(
            jax.tree.map(np.asarray, dim.params)["classifier_fc2"]["kernel"]
        ).copy()
        dim.load_torch_checkpoint_filtered(ckpt)
        host = jax.tree.map(np.asarray, dim.params)
        cat_host = jax.tree.map(np.asarray, cat_engine.params)
        # shared trunk adopted from the cat checkpoint
        np.testing.assert_allclose(
            host["speech_encoder"]["projection"]["kernel"],
            cat_host["speech_encoder"]["projection"]["kernel"], rtol=1e-6,
        )
        # mismatched head kept at its fresh init (8-way vs 3-dim)
        np.testing.assert_array_equal(host["classifier_fc2"]["kernel"], before)

    def test_strict_load_still_raises_on_mismatch(self, variant_fixture):
        from interspeech_ser_tpu.train.engine import EngineOptions, FusionEngine
        from interspeech_ser_tpu.utils.config import load_fusion_config

        cfg = load_fusion_config(str(variant_fixture / "fromcat_cat.json"))
        dim = FusionEngine(
            cfg, seed=11, options=EngineOptions(bucket_window=2, task="dim")
        )
        dim.init_params()
        with pytest.raises(ValueError):
            dim.load_torch_checkpoint(
                str(variant_fixture / "fromcat_cat" / "pre.pt")
            )


class TestFiona:
    def test_gated_pool_trains_and_roundtrips(self, variant_fixture):
        """fiona: gated pooled reps + 8-head attn + always-on CKA; the
        checkpoint roundtrips through the torch naming contract incl. gates."""
        engine, best = _fit(
            variant_fixture, "fiona", gated_pool=True, attention_heads=4,
            cka_weight=1.0, focal_dynamic_alpha=True,
        )
        assert best["macro_f1"] > 0.2
        ckpt = str(variant_fixture / "fiona" / "m.pt")
        engine.save_torch_checkpoint(ckpt)
        sd = torch.load(ckpt, weights_only=True)
        assert "speech_gate.weight" in sd and "text_gate.weight" in sd
        # reload through the converter and match params exactly
        from interspeech_ser_tpu.models.convert_fusion import torch_to_flax
        loaded = torch_to_flax({k: v.numpy() for k, v in sd.items()}, 2)
        host = jax.tree.map(np.asarray, engine.params)
        np.testing.assert_allclose(
            loaded["speech_gate"]["kernel"], host["speech_gate"]["kernel"], rtol=1e-6
        )


class TestGenderSVM:
    def test_svm_ranking_loss_values(self):
        from interspeech_ser_tpu.train.losses import svm_ranking_loss

        logits = jnp.asarray([[0.0, 2.0], [3.0, 0.5]])  # (female, male)
        y = jnp.asarray([1, 0])
        # t=+1: clamp(1 - (2-0)) = 0 ; t=-1: clamp(1 + (0.5-3)) = 0
        assert float(svm_ranking_loss(logits, y)) == 0.0
        y2 = jnp.asarray([0, 1])
        # t=-1: clamp(1 + 2) = 3 ; t=+1: clamp(1 - (0.5-3)) = 3.5
        np.testing.assert_allclose(float(svm_ranking_loss(logits, y2)), 3.25)

    def test_gender_svm_variant_trains(self, variant_fixture):
        engine, best = _fit(
            variant_fixture, "gsvm", gender_mode="svm", attention_heads=4,
            modality_norm=False, focal_dynamic_alpha=True,
        )
        # no post-projection LayerNorm params in this variant
        host = jax.tree.map(np.asarray, engine.params)
        assert "norm" not in host["speech_encoder"]
        assert "gender_classifier" in host
