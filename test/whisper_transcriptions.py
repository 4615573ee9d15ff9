#!/usr/bin/env python
"""Batched Whisper transcription → whisper_transcript.csv.

Scripted, TPU-native version of the reference's ``test/Whisper
transcriptions.ipynb`` (cells 10,15): batched greedy generation over every
wav in a directory, written as a ``FileName,transcription`` CSV consumed by
the fusion configs' ``txt_dir``.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help="HF whisper model dir/name")
    p.add_argument("--wav_dir", required=True)
    p.add_argument("--out_csv", default="whisper_transcript.csv")
    # B sweep on v5e (scripts/bench_whisper_decode.py, cached greedy,
    # bf16): B=4 670 -> B=8 821 -> B=16 999.8 tok/s; B=32 OOMs the 16 GB
    # HBM (cross-K/V caches at T=1500). 16 is the measured optimum.
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_new_tokens", type=int, default=200)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import pandas as pd
    from transformers import AutoConfig, AutoTokenizer

    from interspeech_ser_tpu.models.loader import _resolve_dir, build_whisper_encoder, load_hf_state_dict
    from interspeech_ser_tpu.models.whisper_decoder import (
        WhisperDecoderConfig,
        WhisperDecoderModel,
        greedy_decode_cached,
        whisper_decoder_hf_to_flax,
    )
    from interspeech_ser_tpu.ops.mel import whisper_log_mel
    from interspeech_ser_tpu.utils.audio import load_wav

    enc_model, enc_params, enc_cfg = build_whisper_encoder(args.model, dtype=args.dtype)
    hf_cfg = AutoConfig.from_pretrained(_resolve_dir(args.model))
    dec_cfg = WhisperDecoderConfig.from_hf(hf_cfg, dtype=args.dtype)
    dec_model = WhisperDecoderModel(dec_cfg)
    dec_params = whisper_decoder_hf_to_flax(load_hf_state_dict(args.model), dec_cfg)
    tokenizer = AutoTokenizer.from_pretrained(_resolve_dir(args.model))

    # sot sequence + suppress list from the shipped generation config
    import json as _json

    gen_path = os.path.join(_resolve_dir(args.model), "generation_config.json")
    prompt_ids = None
    suppress = None
    eot = hf_cfg.eos_token_id
    if os.path.exists(gen_path):
        gen = _json.load(open(gen_path))
        if "forced_decoder_ids" in gen and gen["forced_decoder_ids"]:
            prompt_ids = [hf_cfg.decoder_start_token_id] + [
                t for _, t in gen["forced_decoder_ids"]
            ]
        suppress = np.asarray(gen.get("suppress_tokens", []) or [], np.int32)
        eot = gen.get("eos_token_id", eot)
    if prompt_ids is None:
        prompt_ids = [hf_cfg.decoder_start_token_id]

    import jax

    def transcribe_batch(wavs):
        mel = whisper_log_mel(jnp.asarray(wavs), num_mels=enc_cfg.num_mel_bins)
        enc_out = enc_model.apply({"params": enc_params}, mel)["last_hidden_state"]
        # KV-cached greedy: identical tokens to the recompute path,
        # measured ~9x faster at transcription shapes (see STATUS)
        tokens = greedy_decode_cached(
            dec_model, dec_params, enc_out, np.asarray(prompt_ids), eot,
            max_new_tokens=args.max_new_tokens,
            suppress_ids=suppress if suppress is not None and len(suppress) else None,
        )
        return np.asarray(tokens)

    names = sorted(os.listdir(args.wav_dir))
    rows = []
    bs = args.batch_size
    for s in range(0, len(names), bs):
        chunk = names[s : s + bs]
        wavs = np.zeros((bs, 480000), np.float32)
        for i, n in enumerate(chunk):
            y, _ = load_wav(os.path.join(args.wav_dir, n))
            wavs[i, : min(len(y), 480000)] = y[:480000]
        tokens = transcribe_batch(wavs)
        for i, n in enumerate(chunk):
            ids = tokens[i].tolist()
            if eot in ids[len(prompt_ids):]:
                ids = ids[: len(prompt_ids) + ids[len(prompt_ids):].index(eot)]
            text = tokenizer.decode(ids, skip_special_tokens=True).strip()
            rows.append([n, text])
        print(f"{min(s + bs, len(names))}/{len(names)}")

    pd.DataFrame(rows, columns=["FileName", "transcription"]).to_csv(
        args.out_csv, index=False
    )
    print(f"wrote {args.out_csv}")


if __name__ == "__main__":
    main()
