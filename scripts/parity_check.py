#!/usr/bin/env python
"""Embedding-parity checker (the BASELINE.json cosine ≥ 0.999 harness).

Compares our TPU extraction dumps against torch/HF reference computation
per utterance: cosine similarity and max-abs deviation, over any of the
speech / whisper / text extractors.

Usage:
    python scripts/parity_check.py speech --model <hf-dir> --wav_dir <dir> \
        --ours <save_path-from-preprocess_speech> [--use_average]
    python scripts/parity_check.py whisper --model <hf-dir> --wav_dir ... --ours ...
    python scripts/parity_check.py text --model <hf-dir> --df_path tx.csv --ours ...

The torch side runs on CPU (exact reference math); pass --limit N for a
sampled audit on large sets.
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _report(name, ours, ref):
    ours = np.asarray(ours, np.float64).ravel()
    ref = np.asarray(ref, np.float64).ravel()
    cos = float(ours @ ref / (np.linalg.norm(ours) * np.linalg.norm(ref) + 1e-12))
    mad = float(np.abs(ours - ref).max())
    return cos, mad


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["speech", "whisper", "text"])
    p.add_argument("--model", required=True)
    p.add_argument("--wav_dir")
    p.add_argument("--df_path")
    p.add_argument("--ours", required=True, help="dir of our .pt dumps")
    p.add_argument("--n_layer", type=int, default=-1)
    p.add_argument("--use_average", action="store_true")
    p.add_argument("--limit", type=int, default=50)
    p.add_argument("--threshold", type=float, default=0.999)
    args = p.parse_args(argv)

    import torch

    from interspeech_ser_tpu.utils import ptio
    from interspeech_ser_tpu.utils.audio import load_wav, normalize_waveform

    results = []

    if args.mode == "speech":
        from transformers import AutoModel

        model = AutoModel.from_pretrained(args.model)
        model.eval()
        names = sorted(os.listdir(args.wav_dir))[: args.limit]
        for n in names:
            ours = ptio.load_tensor(os.path.join(args.ours, n.replace(".wav", ".pt")))
            y, _ = load_wav(os.path.join(args.wav_dir, n))
            x = normalize_waveform(y)
            with torch.no_grad():
                out = model(torch.tensor(x[None]), output_hidden_states=True)
            if args.use_average:
                ref = torch.stack(out.hidden_states[-4:]).mean(0)[0].numpy()
            else:
                ref = out.hidden_states[args.n_layer][0].numpy()
            results.append((n, *_report(n, ours, ref)))

    elif args.mode == "whisper":
        from transformers import WhisperModel

        import jax.numpy as jnp

        from interspeech_ser_tpu.ops.mel import whisper_log_mel

        model = WhisperModel.from_pretrained(args.model).encoder
        model.eval()
        names = sorted(os.listdir(args.wav_dir))[: args.limit]
        for n in names:
            ours = ptio.load_tensor(os.path.join(args.ours, n.replace(".wav", ".pt")))
            y, _ = load_wav(os.path.join(args.wav_dir, n))
            padded = np.zeros((1, 480000), np.float32)
            padded[0, : min(len(y), 480000)] = y[:480000]
            mel = np.asarray(
                whisper_log_mel(jnp.asarray(padded), num_mels=model.config.num_mel_bins)
            )
            with torch.no_grad():
                out = model(torch.tensor(mel), output_hidden_states=True)
            hs = out.hidden_states
            ref = (
                torch.stack(hs[-4:]).mean(0)[0] if args.use_average else hs[args.n_layer][0]
            ).numpy()
            n_frames = math.ceil(len(y) / 320)
            results.append((n, *_report(n, ours, ref[:n_frames])))

    else:  # text
        import pandas as pd
        from transformers import AutoModel, AutoTokenizer

        model = AutoModel.from_pretrained(args.model)
        model.eval()
        tok = AutoTokenizer.from_pretrained(args.model)
        df = pd.read_csv(args.df_path).head(args.limit)
        for _, row in df.iterrows():
            n = row["FileName"]
            ours = ptio.load_tensor(os.path.join(args.ours, n.replace(".wav", ".pt")))
            text = row["transcription"] if isinstance(row["transcription"], str) else ""
            enc = tok(text, padding="max_length", max_length=ours.shape[0],
                      truncation=True, return_tensors="pt")
            with torch.no_grad():
                out = model(**enc, output_hidden_states=True)
            hs = out.hidden_states
            ref = (
                torch.stack(hs[-4:]).mean(0)[0] if args.use_average else hs[args.n_layer][0]
            ).numpy()
            results.append((n, *_report(n, ours, ref)))

    cosines = np.asarray([c for _, c, _ in results])
    mads = np.asarray([m for _, _, m in results])
    n_fail = int((cosines < args.threshold).sum())
    print(f"checked {len(results)} utterances")
    print(f"cosine: min={cosines.min():.6f} mean={cosines.mean():.6f}")
    print(f"max-abs dev: max={mads.max():.2e} mean={mads.mean():.2e}")
    print(f"below threshold ({args.threshold}): {n_fail}")
    for n, c, m in sorted(results, key=lambda r: r[1])[:5]:
        print(f"  worst: {n} cos={c:.6f} mad={m:.2e}")
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
