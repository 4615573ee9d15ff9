"""End-to-end fusion-classifier parity vs a torch model with reference naming.

Builds the reference architecture (bin/train_cat_bimodal_lazy_1head.py:236-334
and the trimodal/ranking variants) out of torch primitives, converts its
state dict with ``convert_fusion.torch_to_flax``, and checks logits match in
eval mode — plus the checkpoint round-trip through the ``.pt`` contract.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from interspeech_ser_tpu.models.convert_fusion import flax_to_torch, torch_to_flax
from interspeech_ser_tpu.models.fusion import MultiModalEmotionClassifier
from interspeech_ser_tpu.utils import ptio

RNG = np.random.default_rng(2)


def build_torch_fusion(feat_dims, hidden=32, num_emotions=8, neutral_head=False):
    """Reference-named torch module tree + functional forward."""
    mods = ["speech", "text", "prosody"][: len(feat_dims)]
    m = torch.nn.Module()
    for name, d in zip(mods, feat_dims):
        m.add_module(f"{name}_projection", torch.nn.Linear(d, hidden))
        m.add_module(f"{name}_norm", torch.nn.LayerNorm(hidden))
        m.add_module(
            f"{name}_gru", torch.nn.GRU(hidden, hidden, batch_first=True, bidirectional=True)
        )
        heads = 2 if (len(feat_dims) == 3 and name == "prosody") else 1
        m.add_module(
            f"{name}_attention",
            torch.nn.MultiheadAttention(hidden * 2, heads, dropout=0.5, batch_first=True),
        )
        m.add_module(f"{name}_attn", torch.nn.Linear(hidden * 2, 1))
    cat_dim = 2 * hidden * len(feat_dims)
    m.add_module("layer_norm", torch.nn.LayerNorm(cat_dim))
    m.add_module(
        "classifier",
        torch.nn.Sequential(
            torch.nn.Linear(cat_dim, hidden),
            torch.nn.ReLU(),
            torch.nn.Dropout(0.5),
            torch.nn.Linear(hidden, num_emotions),
        ),
    )
    if neutral_head:
        m.add_module(
            "neutral_classifier",
            torch.nn.Sequential(
                torch.nn.Linear(cat_dim, hidden),
                torch.nn.ReLU(),
                torch.nn.Dropout(0.5),
                torch.nn.Linear(hidden, 1),
            ),
        )

    def forward(feats):
        hs = []
        for name, x in zip(mods, feats):
            h = getattr(m, f"{name}_norm")(getattr(m, f"{name}_projection")(x))
            h, _ = getattr(m, f"{name}_gru")(h)
            hs.append(h)
        finals = []
        for i, name in enumerate(mods):
            att = getattr(m, f"{name}_attention")
            total = hs[i]
            for j in range(len(mods)):
                if j != i:
                    a, _ = att(hs[i], hs[j], hs[j])
                    total = total + a
            w = F.softmax(getattr(m, f"{name}_attn")(total), dim=1)
            finals.append((total * w).sum(dim=1))
        normalized = m.layer_norm(torch.cat(finals, dim=-1))
        logits = m.classifier(normalized)
        if neutral_head:
            return logits, m.neutral_classifier(normalized)
        return logits

    return m, forward


def _feats(feat_dims, B=3, T=(14, 9, 11)):
    return [RNG.normal(size=(B, t, d)).astype(np.float32) for t, d in zip(T, feat_dims)]


class TestBimodalParity:
    def test_logits_match(self):
        feat_dims = (20, 12)
        torch.manual_seed(11)
        tm, fwd = build_torch_fusion(feat_dims)
        tm.eval()
        feats = _feats(feat_dims)
        with torch.no_grad():
            ref = fwd([torch.tensor(f) for f in feats])
        params = torch_to_flax({k: v.numpy() for k, v in tm.state_dict().items()}, 2)
        model = MultiModalEmotionClassifier(feat_dims=feat_dims, fusion_hidden_dim=32)
        ours = model.apply({"params": params}, [jnp.asarray(f) for f in feats])
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=5e-5)

    def test_masked_batched_equals_single(self):
        """Padded batched masked eval == per-utterance eval (ref batch-1)."""
        feat_dims = (20, 12)
        torch.manual_seed(12)
        tm, _ = build_torch_fusion(feat_dims)
        params = torch_to_flax({k: v.numpy() for k, v in tm.state_dict().items()}, 2)
        model = MultiModalEmotionClassifier(feat_dims=feat_dims, fusion_hidden_dim=32)

        lengths = [(5, 3), (12, 7)]
        T1, T2 = 16, 8
        singles, x1, x2 = [], np.zeros((2, T1, 20), np.float32), np.zeros((2, T2, 12), np.float32)
        m1, m2 = np.zeros((2, T1), np.float32), np.zeros((2, T2), np.float32)
        for i, (l1, l2) in enumerate(lengths):
            f1 = RNG.normal(size=(l1, 20)).astype(np.float32)
            f2 = RNG.normal(size=(l2, 12)).astype(np.float32)
            x1[i, :l1], x2[i, :l2] = f1, f2
            m1[i, :l1], m2[i, :l2] = 1, 1
            singles.append(
                np.asarray(
                    model.apply({"params": params}, [jnp.asarray(f1[None]), jnp.asarray(f2[None])])
                )[0]
            )
        batched = np.asarray(
            model.apply(
                {"params": params},
                [jnp.asarray(x1), jnp.asarray(x2)],
                masks=[jnp.asarray(m1), jnp.asarray(m2)],
            )
        )
        np.testing.assert_allclose(batched, np.stack(singles), atol=5e-5)


class TestTrimodalParity:
    def test_logits_match(self):
        feat_dims = (20, 12, 16)
        torch.manual_seed(13)
        tm, fwd = build_torch_fusion(feat_dims)
        tm.eval()
        feats = _feats(feat_dims)
        with torch.no_grad():
            ref = fwd([torch.tensor(f) for f in feats])
        params = torch_to_flax({k: v.numpy() for k, v in tm.state_dict().items()}, 3)
        model = MultiModalEmotionClassifier(feat_dims=feat_dims, fusion_hidden_dim=32)
        ours = model.apply({"params": params}, [jnp.asarray(f) for f in feats])
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=5e-5)


class TestRankingHeadParity:
    def test_both_heads_match(self):
        feat_dims = (20, 12)
        torch.manual_seed(14)
        tm, fwd = build_torch_fusion(feat_dims, neutral_head=True)
        tm.eval()
        feats = _feats(feat_dims)
        with torch.no_grad():
            ref_logits, ref_neutral = fwd([torch.tensor(f) for f in feats])
        params = torch_to_flax({k: v.numpy() for k, v in tm.state_dict().items()}, 2)
        model = MultiModalEmotionClassifier(
            feat_dims=feat_dims, fusion_hidden_dim=32, neutral_head=True
        )
        logits, neutral = model.apply({"params": params}, [jnp.asarray(f) for f in feats])
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(neutral), ref_neutral.numpy(), atol=5e-5)


class TestCheckpointRoundTrip:
    def test_pt_roundtrip(self, tmp_path):
        feat_dims = (20, 12)
        model = MultiModalEmotionClassifier(feat_dims=feat_dims, fusion_hidden_dim=32)
        feats = [jnp.asarray(f) for f in _feats(feat_dims)]
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        sd = flax_to_torch(jax.tree.map(np.asarray, params), 2)
        path = str(tmp_path / "multimodal_ser.pt")
        ptio.save_state_dict(sd, path)
        params2 = torch_to_flax(ptio.load_state_dict(path), 2)
        out1 = model.apply({"params": params}, feats)
        out2 = model.apply({"params": params2}, feats)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
