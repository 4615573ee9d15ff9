"""Training-math parity: gradients + AdamW updates vs torch on the fusion model.

Same weights, same batch, weighted-CE loss: compares (1) parameter
gradients and (2) the post-AdamW-step forward between our jitted training
math and torch autograd/optim — covering the whole backward pass through
attention pooling, cross-attention, the bidirectional GRU, and the
projections (dropout off both sides).
"""

import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_fusion_parity import build_torch_fusion

from interspeech_ser_tpu.models.convert_fusion import torch_to_flax
from interspeech_ser_tpu.models.fusion import MultiModalEmotionClassifier
from interspeech_ser_tpu.train.losses import weighted_cross_entropy

RNG = np.random.default_rng(21)


def _setup(hidden=16, feat_dims=(12, 8), B=6, T=(9, 5)):
    torch.manual_seed(21)
    tm, fwd = build_torch_fusion(feat_dims, hidden=hidden)
    tm.train()  # dropout modules exist but we run the functional fwd in eval
    tm.eval()
    feats = [RNG.normal(size=(B, t, d)).astype(np.float32) for t, d in zip(T, feat_dims)]
    y = RNG.integers(0, 8, B)
    w = RNG.uniform(0.5, 2.0, 8).astype(np.float32)
    # deep-copy: the converter's arrays are VIEWS of torch storage, and the
    # AdamW test steps torch in-place before the jax side runs
    params = jax.tree.map(
        np.array,
        torch_to_flax({k: v.detach().numpy() for k, v in tm.state_dict().items()}, 2),
    )
    model = MultiModalEmotionClassifier(feat_dims=feat_dims, fusion_hidden_dim=hidden)
    return tm, fwd, model, params, feats, y, w


class TestGradParity:
    def test_gradients_match_torch(self):
        tm, fwd, model, params, feats, y, w = _setup()

        # torch backward
        logits = fwd([torch.tensor(f) for f in feats])
        loss = F.cross_entropy(logits, torch.tensor(y), weight=torch.tensor(w))
        loss.backward()
        tgrad = {k: v.grad.detach().numpy() for k, v in tm.named_parameters()
                 if v.grad is not None}

        # jax backward
        def loss_fn(p):
            logits = model.apply({"params": p}, [jnp.asarray(f) for f in feats])
            return weighted_cross_entropy(logits, jnp.asarray(y), jnp.asarray(w))

        jloss, jgrad = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(jloss), float(loss), rtol=1e-5)

        checks = [
            ("speech_projection.weight", lambda g: np.asarray(
                g["speech_encoder"]["projection"]["kernel"]).T),
            ("speech_gru.weight_hh_l0", lambda g: np.asarray(
                g["speech_encoder"]["gru"]["w_hh_fwd"]).T),
            ("speech_gru.weight_ih_l0_reverse", lambda g: np.asarray(
                g["speech_encoder"]["gru"]["w_ih_bwd"]).T),
            ("text_attention.in_proj_weight", lambda g: np.asarray(
                g["text_attention"]["in_proj_kernel"]).T),
            ("classifier.0.weight", lambda g: np.asarray(
                g["classifier_fc1"]["kernel"]).T),
            ("layer_norm.weight", lambda g: np.asarray(g["fusion_norm"]["scale"])),
            ("speech_attn.weight", lambda g: np.asarray(
                g["speech_pool_attn"]["kernel"]).T),
        ]
        for tname, getter in checks:
            ours = getter(jgrad)
            ref = tgrad[tname]
            np.testing.assert_allclose(
                ours, ref, atol=5e-5,
                err_msg=f"gradient mismatch for {tname}",
            )

    def test_adamw_step_matches_torch(self):
        tm, fwd, model, params, feats, y, w = _setup()
        lr, wd = 1e-3, 1e-6

        # torch: one AdamW step
        opt = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=wd)
        logits = fwd([torch.tensor(f) for f in feats])
        loss = F.cross_entropy(logits, torch.tensor(y), weight=torch.tensor(w))
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            ref_logits = fwd([torch.tensor(f) for f in feats]).numpy()

        # jax: one optax.adamw step (torch-default betas/eps)
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
        params_j = jax.tree.map(jnp.asarray, params)
        state = tx.init(params_j)

        def loss_fn(p):
            logits = model.apply({"params": p}, [jnp.asarray(f) for f in feats])
            return weighted_cross_entropy(logits, jnp.asarray(y), jnp.asarray(w))

        grads = jax.grad(loss_fn)(params_j)
        updates, state = tx.update(grads, state, params_j)
        params_j = optax.apply_updates(params_j, updates)
        our_logits = np.asarray(
            model.apply({"params": params_j}, [jnp.asarray(f) for f in feats])
        )
        np.testing.assert_allclose(our_logits, ref_logits, atol=1e-4)
