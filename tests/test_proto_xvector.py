"""Proto-angular style trainer + x-vector model (legacy capability)."""

import os
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.models.xvector import XVector, xvector_from_speechbrain
from interspeech_ser_tpu.train.data import LazyFeatureDataset
from interspeech_ser_tpu.train.proto_engine import ProtoAngularEngine

RNG = np.random.default_rng(18)


class TestXVector:
    def test_forward_and_masked_pooling(self):
        model = XVector(in_feats=24, lin_neurons=64)
        x = jnp.asarray(RNG.normal(size=(2, 50, 24)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, 64)
        # masked pooling equals truncated input (padding region zeroed so
        # the TDNN boundary matches conv zero-padding exactly)
        xz = np.asarray(x).copy()
        xz[0, 30:] = 0
        lengths = jnp.asarray([30, 50])
        m = model.apply(variables, jnp.asarray(xz), lengths)
        t = model.apply(variables, jnp.asarray(xz[:1, :30]))
        np.testing.assert_allclose(np.asarray(m)[0], np.asarray(t)[0], atol=1e-4)

    def test_speechbrain_converter_shapes(self):
        # synthetic speechbrain-style state dict
        sd = {}
        chans = [24, 512, 512, 512, 512]
        outs = [512, 512, 512, 512, 1500]
        ks = [5, 3, 3, 1, 1]
        for i in range(5):
            sd[f"blocks.{2*i}.conv.weight"] = RNG.normal(size=(outs[i], chans[i], ks[i])).astype(np.float32)
            sd[f"blocks.{2*i}.conv.bias"] = np.zeros(outs[i], np.float32)
            sd[f"blocks.{2*i+1}.norm.weight"] = np.ones(outs[i], np.float32)
            sd[f"blocks.{2*i+1}.norm.bias"] = np.zeros(outs[i], np.float32)
            sd[f"blocks.{2*i+1}.norm.running_mean"] = np.zeros(outs[i], np.float32)
            sd[f"blocks.{2*i+1}.norm.running_var"] = np.ones(outs[i], np.float32)
        sd["blocks.11.w.weight"] = RNG.normal(size=(512, 3000)).astype(np.float32)
        sd["blocks.11.w.bias"] = np.zeros(512, np.float32)
        variables = xvector_from_speechbrain(sd)
        model = XVector(in_feats=24, lin_neurons=512)
        x = jnp.asarray(RNG.normal(size=(1, 40, 24)).astype(np.float32))
        out = model.apply(variables, x)
        assert out.shape == (1, 512)
        assert np.isfinite(np.asarray(out)).all()


class TestProtoAngular:
    def test_trains_and_separates(self, tmp_path):
        C, U, D = 4, 2, 16
        lazy = tmp_path / "lazy"
        lazy.mkdir()
        rng = np.random.default_rng(5)
        means = rng.normal(scale=3.0, size=(C, D))
        names, labels, cls_ids = [], [], []
        for i in range(40):
            c = i % C
            t = int(rng.integers(10, 30))
            torch.save(
                torch.from_numpy((rng.normal(size=(t, D)) + means[c]).astype(np.float32)),
                str(lazy / f"u{i:03d}.pt"),
            )
            names.append(f"u{i:03d}.wav")
            onehot = np.zeros(C)
            onehot[c] = 1
            labels.append(onehot)
            cls_ids.append(c)
        ds = LazyFeatureDataset(names, np.asarray(labels), [str(lazy)], [D])
        engine = ProtoAngularEngine(D, num_classes=C, utter_per_class=U, embedding_dim=8)
        engine.fit(ds, np.asarray(cls_ids), epochs=2, lr=1e-3, log=lambda *_: None)
        emb = engine.embed(ds)
        assert emb.shape == (40, 8)
        # same-class embeddings closer than cross-class on average
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sim = emb_n @ emb_n.T
        same = np.asarray([[a == b for b in cls_ids] for a in cls_ids])
        np.fill_diagonal(same, False)
        diff_mask = ~same
        np.fill_diagonal(diff_mask, False)
        assert sim[same].mean() > sim[diff_mask].mean()
