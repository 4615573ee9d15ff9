#!/usr/bin/env python
"""Full-SIZE converter/encoder parity on random weights.

The golden-parity tests run at toy dims (48-d, 2-3 layers); with a
zero-egress image no real checkpoint can be fetched, so this audit
de-risks scale-dependent converter bugs instead: build each encoder at
its PRODUCTION architecture (card dims) with random torch weights, save
an HF checkpoint to /tmp, run our converter + forward, and compare
against the torch forward on the same input.

Run:  python scripts/fullsize_parity.py [--families wavlm,whisper,roberta,deberta,hubert,w2v2]
(w2v2 = XLS-R-2B at 1920-d/48-layer: ~30 min CPU-side; excluded from the
default set.) When real weights become reachable, run
scripts/parity_check.py against microsoft/wavlm-large etc. instead.
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def report(name, ours, ref):
    ours = np.asarray(ours, np.float64).ravel()
    ref = np.asarray(ref, np.float64).ravel()
    cos = float(ours @ ref / (np.linalg.norm(ours) * np.linalg.norm(ref) + 1e-12))
    mad = float(np.abs(ours - ref).max())
    print(f"{name}: cosine={cos:.8f} max_abs={mad:.3e}")
    return cos


def check_speech(family: str):
    import torch
    from transformers import AutoConfig, AutoModel

    card = {
        "wavlm": ("wavlm", dict(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, conv_bias=True, feat_extract_norm="layer",
            do_stable_layer_norm=True,
        )),
        "hubert": ("hubert", dict(
            hidden_size=1280, num_hidden_layers=48, num_attention_heads=16,
            intermediate_size=5120, conv_bias=True, feat_extract_norm="layer",
            do_stable_layer_norm=True,
        )),
        "w2v2": ("wav2vec2", dict(
            hidden_size=1920, num_hidden_layers=48, num_attention_heads=16,
            intermediate_size=7680, conv_bias=True, feat_extract_norm="layer",
            do_stable_layer_norm=True,
        )),
    }[family]
    model_type, kw = card
    cfg = AutoConfig.for_model(model_type, **kw)
    torch.manual_seed(0)
    model = AutoModel.from_config(cfg).eval()
    d = tempfile.mkdtemp(prefix=f"fullsize_{family}_")
    model.save_pretrained(d, safe_serialization=True)

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(1, 16000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = model(
            torch.from_numpy(wav), output_hidden_states=True
        ).last_hidden_state.numpy()

    from interspeech_ser_tpu.models.loader import build_speech_encoder
    import jax.numpy as jnp

    jmodel, params, jcfg, _ = build_speech_encoder(d)
    out = jmodel.apply(
        {"params": params}, jnp.asarray(wav), jnp.ones_like(jnp.asarray(wav))
    )["last_hidden_state"]
    return report(f"{family} ({kw['hidden_size']}d/{kw['num_hidden_layers']}L)", out, ref)


def check_whisper():
    import torch
    from transformers import WhisperConfig, WhisperModel

    # production d_model/layers/heads (what converter bugs depend on);
    # max_source_positions shortened 1500 -> 376 so the torch CPU forward
    # finishes in minutes instead of tens of minutes
    cfg = WhisperConfig(
        d_model=1280, encoder_layers=32, encoder_attention_heads=20,
        encoder_ffn_dim=5120, decoder_layers=2, decoder_attention_heads=20,
        decoder_ffn_dim=5120, num_mel_bins=128, max_source_positions=376,
    )
    torch.manual_seed(0)
    model = WhisperModel(cfg).eval()
    d = tempfile.mkdtemp(prefix="fullsize_whisper_")
    model.save_pretrained(d, safe_serialization=True)

    rng = np.random.default_rng(0)
    mel = (rng.normal(size=(1, 128, 752)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()

    from interspeech_ser_tpu.models.loader import build_whisper_encoder
    import jax.numpy as jnp

    jmodel, params, jcfg = build_whisper_encoder(d)
    out = jmodel.apply({"params": params}, jnp.asarray(mel))["last_hidden_state"]
    return report("whisper-encoder (1280d/32L)", out, ref)


def check_text(family: str):
    import torch

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 1000, size=(1, 40))
    if family == "roberta":
        from transformers import RobertaConfig, RobertaModel

        cfg = RobertaConfig(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, vocab_size=50265, max_position_embeddings=514,
        )
        torch.manual_seed(0)
        model = RobertaModel(cfg).eval()
        builder_name = "build_roberta"
    else:
        from transformers import DebertaV2Config, DebertaV2Model

        # microsoft/deberta-v2-xxlarge card values — the HF defaults differ
        # in share_att_key / position_biased_input, which select a DIFFERENT
        # attention variant this port deliberately does not implement
        cfg = DebertaV2Config(
            hidden_size=1536, num_hidden_layers=48, num_attention_heads=24,
            intermediate_size=6144, vocab_size=128100,
            relative_attention=True, max_relative_positions=-1,
            pos_att_type=["p2c", "c2p"], position_buckets=256,
            norm_rel_ebd="layer_norm", share_att_key=True,
            position_biased_input=False, conv_kernel_size=3, conv_act="gelu",
            layer_norm_eps=1e-7, max_position_embeddings=512,
        )
        torch.manual_seed(0)
        model = DebertaV2Model(cfg).eval()
        builder_name = "build_deberta_v2"
    d = tempfile.mkdtemp(prefix=f"fullsize_{family}_")
    model.save_pretrained(d, safe_serialization=True)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    from interspeech_ser_tpu.models import loader
    import jax.numpy as jnp

    jmodel, params, jcfg = getattr(loader, builder_name)(d)
    out = jmodel.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask.astype(np.float32))
    )["last_hidden_state"]
    label = "roberta (1024d/24L)" if family == "roberta" else "deberta-v2 (1536d/48L)"
    return report(label, out, ref)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="wavlm,whisper,roberta,deberta,hubert")
    args = ap.parse_args()
    fams = args.families.split(",")
    results = {}
    for f in fams:
        if f in ("wavlm", "hubert", "w2v2"):
            results[f] = check_speech(f)
        elif f == "whisper":
            results[f] = check_whisper()
        elif f in ("roberta", "deberta"):
            results[f] = check_text(f)
    worst = min(results.values())
    print(f"worst cosine: {worst:.8f}  ({'PASS' if worst >= 0.999 else 'FAIL'})")


if __name__ == "__main__":
    main()
