"""Proto-angular "_only" family: melspec frontend, nets, engine, CLI.

Torch-parity references are re-implementations of the reference models
(bin/old/train_cat_*_protoangularloss_only*.py) built here from the cited
architecture, not copies.
"""

import json
import os
import sys
import wave as wave_mod

import numpy as np
import pandas as pd
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RNG = np.random.default_rng(3)


class TestMelspecTA:
    def test_power_spectrogram_matches_torch_stft(self):
        from interspeech_ser_tpu.ops.melspec_ta import TorchaudioMelSpectrogram

        wav = RNG.normal(size=4000).astype(np.float32) * 0.3
        m = TorchaudioMelSpectrogram(sample_rate=16000)
        ours = m.power_spectrogram(wav)
        # torch.stft with the exact torchaudio Spectrogram arguments
        win = torch.hann_window(400, periodic=True)
        spec = torch.stft(
            torch.from_numpy(wav), n_fft=800, hop_length=160, win_length=400,
            window=win, center=True, pad_mode="reflect", normalized=False,
            onesided=True, return_complex=True,
        )
        ref = spec.abs().pow(2.0).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)

    def test_sr1600_bug_changes_mel_warping(self):
        """sample_rate=1600 (reference bug): all_freqs spans [0, 800] 'Hz'
        over the same 401 bins, so the HTK warp is computed on frequencies
        10x too low — filters are far closer to linear-spaced than the
        correct 16 kHz bank. Both banks cover the full bin axis."""
        from interspeech_ser_tpu.ops.melspec_ta import melscale_fbanks

        fb_bug = melscale_fbanks(401, 0.0, 800.0, 80, 1600)
        fb_ok = melscale_fbanks(401, 0.0, 8000.0, 80, 16000)
        assert fb_bug.shape == fb_ok.shape == (401, 80)
        # filter-0 peak: nearly linear spacing puts it far higher up the bin
        # axis under the bug than under true 16 kHz HTK warping
        peak_bug = int(np.argmax(fb_bug[:, 0]))
        peak_ok = int(np.argmax(fb_ok[:, 0]))
        assert peak_bug > peak_ok
        # both banks still tile the whole axis (every filter nonzero)
        assert (fb_bug.sum(0) > 0).all() and (fb_ok.sum(0) > 0).all()

    def test_log_clamp(self):
        from interspeech_ser_tpu.ops.melspec_ta import TorchaudioMelSpectrogram

        m = TorchaudioMelSpectrogram(sample_rate=16000)
        out = m(np.zeros(2000, np.float32))
        assert np.all(out == 10.0 * np.log10(1e-10))
        assert out.shape[1] == 80


def _torch_proto_ser(feat_dim, hidden, n_cls, heads):
    """Reference WavLMSERClassifier rebuilt from the cited architecture."""
    import torch.nn as nn

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.wav_proj = nn.Linear(feat_dim, hidden)
            self.multihead_attn = nn.MultiheadAttention(
                hidden, heads, dropout=0.5, batch_first=True
            )
            self.attn_norm = nn.LayerNorm(hidden)
            self.conv1d = nn.Conv1d(hidden, hidden, 3, padding=1)
            self.conv_norm = nn.LayerNorm(hidden)
            self.attn_pooling = nn.Linear(hidden, 1)
            if n_cls:
                self.classifier = nn.Sequential(
                    nn.Linear(hidden, hidden), nn.ReLU(), nn.Dropout(0.2),
                    nn.Linear(hidden, n_cls),
                )

        def forward(self, x):
            x = self.wav_proj(x)
            a, _ = self.multihead_attn(x, x, x)
            x = self.attn_norm(a + x)
            c = self.conv1d(x.transpose(1, 2))
            c = self.conv_norm(c.transpose(1, 2))
            w = F.softmax(self.attn_pooling(c), dim=1)
            emb = (c * w).sum(1)
            if n_cls:
                return emb, self.classifier(emb)
            return emb

    return Net()


class TestProtoSERNetParity:
    @pytest.mark.parametrize("n_cls,heads", [(8, 1), (0, 4)])
    def test_matches_torch(self, tmp_path, n_cls, heads):
        from interspeech_ser_tpu.train.proto_engine import ProtoOnlyEngine, ProtoSERNet

        net = ProtoSERNet(24, 16, n_cls, heads)
        x = RNG.normal(size=(3, 11, 24)).astype(np.float32)
        variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
        engine = ProtoOnlyEngine(net, 2, 2, 2)
        engine.variables = variables
        ckpt = str(tmp_path / "angle_ser.pt")
        engine.save_torch_checkpoint(ckpt)

        tnet = _torch_proto_ser(24, 16, n_cls, heads)
        missing, unexpected = tnet.load_state_dict(
            torch.load(ckpt, weights_only=True), strict=True
        )
        tnet.eval()
        with torch.no_grad():
            tout = tnet(torch.from_numpy(x))
        jout = net.apply(variables, jnp.asarray(x), deterministic=True)
        if n_cls:
            np.testing.assert_allclose(
                np.asarray(jout[0]), tout[0].numpy(), atol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(jout[1]), tout[1].numpy(), atol=2e-5
            )
        else:
            np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=2e-5)


class TestBidirRefEncoderParity:
    def test_matches_torch(self, tmp_path):
        import torch.nn as nn

        from interspeech_ser_tpu.train.proto_engine import (
            BidirectionalReferenceEncoder,
            ProtoOnlyEngine,
        )

        jnet = BidirectionalReferenceEncoder(num_mel=16, embedding_dim=8)
        mel = RNG.normal(size=(2, 33, 16)).astype(np.float32)
        variables = jnet.init(jax.random.PRNGKey(1), jnp.asarray(mel))
        engine = ProtoOnlyEngine(jnet, 2, 2, 2, has_batch_stats=True)
        engine.variables = variables
        ckpt = str(tmp_path / "bidir.pt")
        engine.save_torch_checkpoint(ckpt)

        class TNet(nn.Module):
            def __init__(self):
                super().__init__()
                filters = [1, 32, 32, 64, 64, 128, 128]
                self.convs = nn.ModuleList(
                    nn.Conv2d(filters[i], filters[i + 1], 3, 2, 1)
                    for i in range(6)
                )
                self.bns = nn.ModuleList(
                    nn.BatchNorm2d(f) for f in filters[1:]
                )
                h = 16
                for _ in range(6):
                    h = (h - 3 + 2) // 2 + 1
                self.recurrence = nn.GRU(128 * h, 4, batch_first=True,
                                         bidirectional=True)

            def forward(self, x):
                x = x.unsqueeze(1)
                for conv, bn in zip(self.convs, self.bns):
                    x = F.relu(bn(conv(x)))
                x = x.transpose(1, 2)
                x = x.contiguous().view(x.size(0), x.size(1), -1)
                _, out = self.recurrence(x)
                return torch.cat([out[0], out[1]], dim=1)

        tnet = TNet()
        tnet.load_state_dict(torch.load(ckpt, weights_only=True), strict=True)
        tnet.eval()
        with torch.no_grad():
            tout = tnet(torch.from_numpy(mel))
        jout = jnet.apply(variables, jnp.asarray(mel), deterministic=True)
        np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=3e-5)


class TestRegroup:
    def test_class_major_permutation(self):
        from interspeech_ser_tpu.train.proto_engine import _regroup_class_major

        # U=3, C=2: interleaved [a0 b0 a1 b1 a2 b2] → [a0 a1 a2 b0 b1 b2]
        perm = _regroup_class_major(3, 2)
        np.testing.assert_array_equal(perm, [0, 2, 4, 1, 3, 5])
        # matches torch.transpose(x.view(U, C), 0, 1).reshape(-1)
        x = torch.arange(6)
        np.testing.assert_array_equal(
            torch.transpose(x.view(3, 2), 0, 1).reshape(-1).numpy(), perm
        )


@pytest.fixture(scope="module")
def proto_fixture(tmp_path_factory):
    """Tiny lazy .pt features (4 classes) + tiny wavs + labels CSV."""
    from interspeech_ser_tpu.utils import labels as L

    root = tmp_path_factory.mktemp("proto")
    (root / "lazy").mkdir()
    (root / "wavs").mkdir()
    rng = np.random.default_rng(5)
    means = rng.normal(scale=3.0, size=(4, 12))
    rows = []
    for i in range(64):
        cls = i % 4
        name = f"p{i:03d}.wav"
        t = int(rng.integers(8, 20))
        torch.save(
            torch.from_numpy((rng.normal(size=(t, 12)) + means[cls]).astype(np.float32)),
            str(root / "lazy" / f"p{i:03d}.pt"),
        )
        n = int(16000 * 0.3)
        tone = 0.3 * np.sin(2 * np.pi * (200 + 100 * cls) * np.arange(n) / 16000)
        pcm = (tone * 32767).astype("<i2")
        with wave_mod.open(str(root / "wavs" / name), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        onehot = [0.0] * 8
        onehot[cls] = 1.0
        rows.append(
            [name] + onehot + ["Male" if cls % 2 else "Female",
                               "Train" if i < 48 else "Development"]
        )
    pd.DataFrame(
        rows, columns=["FileName"] + L.CLASSES + ["Gender", "Split_Set"]
    ).to_csv(root / "labels.csv", index=False)
    return root


class TestProtoOnlyEngine:
    def test_angle_only_training_improves(self, proto_fixture, tmp_path):
        from interspeech_ser_tpu.train.proto_engine import (
            LazyProtoDataset,
            ProtoOnlyEngine,
            ProtoSERNet,
        )

        df = pd.read_csv(proto_fixture / "labels.csv")
        y = np.argmax(df[[c for c in df.columns][1:9]].values, axis=1)
        tr = df.Split_Set == "Train"
        train_ds = LazyProtoDataset(
            df[tr].FileName.tolist(), y[tr.values], str(proto_fixture / "lazy")
        )
        val_ds = LazyProtoDataset(
            df[~tr].FileName.tolist(), y[~tr.values], str(proto_fixture / "lazy")
        )
        engine = ProtoOnlyEngine(ProtoSERNet(12, 16, 8, 1), 4, 3, 2, seed=3)
        logs = []
        best = engine.fit(train_ds, val_ds, epochs=4, lr=5e-3,
                          model_path=str(tmp_path), log=logs.append)
        first_val = float(logs[0].split("val angle=")[1])
        assert best["val_angle"] < first_val  # angle-only objective improves
        sd = torch.load(str(tmp_path / "angle_ser.pt"), weights_only=True)
        assert "wav_proj.weight" in sd and "classifier.3.weight" in sd


class TestProtoCLI:
    def test_melspec_gender_cli(self, proto_fixture, tmp_path, monkeypatch):
        from interspeech_ser_tpu.train import proto_engine as pe

        # shrink the gender variant for the fixture (2 cls × 4 utts)
        spec = dict(pe._PROTO_VARIANTS["melspec_only_gender"])
        spec.update(C=2, U=4, U_val=4)
        monkeypatch.setitem(pe._PROTO_VARIANTS, "melspec_only_gender", spec)
        cfg = {
            "wav_dir": str(proto_fixture / "wavs"),
            "audio_lazy_dir": str(proto_fixture / "wavs"),
            "label_path": str(proto_fixture / "labels.csv"),
            "epochs": 1, "lr": 1e-3, "model_path": str(tmp_path / "exp"),
        }
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps(cfg))
        best = pe.proto_main("melspec_only_gender", argv=["--config_path", str(p)])
        assert np.isfinite(best["val_angle"])
        assert os.path.exists(tmp_path / "exp" / "angle_ser.pt")


class TestProtoCEMode:
    def test_base_variant_ce_plus_angle(self, proto_fixture, tmp_path):
        """Base (non-_only) protoangular: CE+angle training, dev CE/F1
        selection, ser.pt checkpoint (ref …_protoangularloss.py)."""
        from interspeech_ser_tpu.train.proto_engine import (
            LazyProtoDataset,
            ProtoOnlyEngine,
            ProtoSERNet,
        )

        df = pd.read_csv(proto_fixture / "labels.csv")
        y = np.argmax(df[[c for c in df.columns][1:9]].values, axis=1)
        tr = df.Split_Set == "Train"
        train_ds = LazyProtoDataset(
            df[tr].FileName.tolist(), y[tr.values], str(proto_fixture / "lazy")
        )
        val_ds = LazyProtoDataset(
            df[~tr].FileName.tolist(), y[~tr.values], str(proto_fixture / "lazy")
        )
        engine = ProtoOnlyEngine(
            ProtoSERNet(12, 16, 4, 1), 4, 3, 2, seed=3, ce_mode=True,
            val_batch_size=8,
        )
        logs = []
        best = engine.fit(train_ds, val_ds, epochs=4, lr=5e-3,
                          model_path=str(tmp_path), log=logs.append)
        assert "dev CE=" in logs[0] and "dev f1=" in logs[0]
        first_ce = float(logs[0].split("dev CE=")[1].split()[0])
        assert best["val_angle"] <= first_ce  # dev CE is the selection metric
        sd = torch.load(str(tmp_path / "ser.pt"), weights_only=True)
        assert "classifier.3.weight" in sd


class TestProtoDataParallel:
    def test_fit_dp_matches_single_device(self, proto_fixture, tmp_path):
        """Proto training is GSPMD data-parallel with a divisibility-
        shrunk mesh (train batch 12 / val batch 8 → 4 of the 8 virtual
        devices); the 1-device and multi-device trajectories must be
        identical (rows sharded, grouped angle-proto loss all-gathered)."""
        import jax

        from interspeech_ser_tpu.train.proto_engine import (
            LazyProtoDataset,
            ProtoOnlyEngine,
            ProtoSERNet,
        )

        df = pd.read_csv(proto_fixture / "labels.csv")
        y = np.argmax(df[[c for c in df.columns][1:9]].values, axis=1)
        tr = df.Split_Set == "Train"
        train_ds = LazyProtoDataset(
            df[tr].FileName.tolist(), y[tr.values], str(proto_fixture / "lazy")
        )
        val_ds = LazyProtoDataset(
            df[~tr].FileName.tolist(), y[~tr.values], str(proto_fixture / "lazy")
        )

        def run(nd):
            engine = ProtoOnlyEngine(
                ProtoSERNet(12, 16, 8, 1), 4, 3, 2, seed=3, n_devices=nd
            )
            engine.fit(train_ds, val_ds, epochs=2, lr=5e-3, log=lambda *_: None)
            return engine, jax.tree.map(np.asarray, engine.variables["params"])

        e1, p1 = run(1)
        e8, p8 = run(None)
        assert e1.n_data == 1 and e8.n_data == 4  # gcd(12, 8) on 8 devices
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=3e-5, rtol=1e-4),
            p1, p8,
        )


class TestProtoCollate:
    def test_collate_is_class_major_without_permutation(self, proto_fixture):
        """This repo's PerfectBatchSampler emits class-major batches, so
        _collate must NOT apply the reference's interleave->class-major
        regroup (doing so scrambles the angle-proto groups; caught in
        review)."""
        from interspeech_ser_tpu.train.proto_engine import (
            LazyProtoDataset,
            ProtoOnlyEngine,
            ProtoSERNet,
        )
        from interspeech_ser_tpu.train.samplers import PerfectBatchSampler

        df = pd.read_csv(proto_fixture / "labels.csv")
        y = np.argmax(df[[c for c in df.columns][1:9]].values, axis=1)
        ds = LazyProtoDataset(df.FileName.tolist(), y, str(proto_fixture / "lazy"))
        C, U = 4, 3
        sampler = PerfectBatchSampler(y, range(C), C * U, shuffle=True,
                                      drop_last=True, seed=0)
        engine = ProtoOnlyEngine(ProtoSERNet(12, 16, 4, 1), C, U, U)
        idxs = list(next(iter(sampler)))
        _, yb = engine._collate(ds, idxs, U)
        groups = yb.reshape(C, U)
        # every angle-proto group must be a single class
        assert (groups == groups[:, :1]).all(), groups
