"""Shared runners for the ``preprocessing/`` extraction CLIs.

Flag surface matches the reference scripts exactly
(reference: preprocessing/preprocess_speech.py:13-21,
preprocess_whisper.py:15-21, preprocess_roberta.py:14-20): same names,
same defaults, same missing-file audit before running.
"""

from __future__ import annotations

import argparse
import os


def _speech_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--ssl_type", type=str, default="wavlm-large")
    p.add_argument("--save_path", type=str, default="./")
    p.add_argument("--wav_dir", type=str, default="./")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--n_layer", type=int, default=-1)
    p.add_argument("--use_average", type=str, default="n")
    # framework extensions
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--matmul_precision", type=str, default="default",
                   choices=["default", "high", "highest"],
                   help="'highest' = strict f32 matmuls for bit-level parity "
                        "audits (slower; TPU default runs f32 via bf16 passes)")
    p.add_argument("--replicate_dir_count_bug", action="store_true",
                   help="bit-exact reproduction of the reference's "
                        "hidden_states[len(os.listdir(save_path))] quirk")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="megatron FFN sharding over a 'model' mesh axis "
                        "(for XLS-R-2B-scale encoders)")
    return p


def _audit_wavs(wav_dir: str):
    """Missing-file audit (reference preprocess_speech.py:84-104)."""
    wav_names = sorted(os.listdir(wav_dir))
    print(f"{len(wav_names)} file are going to be processed...")
    missing = [w for w in wav_names if not os.path.isfile(os.path.join(wav_dir, w))]
    if missing:
        print("Missing files:")
        for m in missing:
            print(f" - {m}")
        return None
    return wav_names


def _set_precision(args):
    if getattr(args, "matmul_precision", "default") != "default":
        import jax

        jax.config.update("jax_default_matmul_precision", args.matmul_precision)


def speech_main(argv=None):
    args = _speech_parser().parse_args(argv)
    _set_precision(args)
    average = args.use_average == "y"
    print(f"Using average = {average}")

    wav_names = _audit_wavs(args.wav_dir)
    if wav_names is None:
        print("Something went wrong, make sure everything is correct before running again!")
        return None

    from .extract.pipeline import SpeechExtractionPipeline
    from .models.loader import build_speech_encoder

    print(f"Extracting features using {args.ssl_type}")
    model, params, cfg, do_normalize = build_speech_encoder(args.ssl_type, dtype=args.dtype)
    pipe = SpeechExtractionPipeline(
        model, params, cfg,
        n_layer=args.n_layer, use_average=average, do_normalize=do_normalize,
        num_workers=args.num_workers,
        replicate_dir_count_bug=args.replicate_dir_count_bug,
        model_parallel=args.model_parallel,
    )
    stats = pipe.run(args.wav_dir, args.save_path, wav_names)
    print(
        f"extracted {stats.n_utts} utts ({stats.audio_seconds:.1f} audio-s) in "
        f"{stats.wall_seconds:.1f}s = {stats.utts_per_sec:.1f} utt/s; "
        f"{stats.n_failed} failed"
    )
    return stats


def whisper_main(argv=None):
    args = _speech_parser().parse_args(argv)
    _set_precision(args)
    average = args.use_average == "y"
    print(f"Using average = {average}")
    wav_names = _audit_wavs(args.wav_dir)
    if wav_names is None:
        return None

    from .extract.pipeline import WhisperExtractionPipeline
    from .models.loader import build_whisper_encoder

    print(f"Extracting features using {args.ssl_type}")
    model, params, cfg = build_whisper_encoder(args.ssl_type, dtype=args.dtype)
    pipe = WhisperExtractionPipeline(
        model, params, cfg,
        n_layer=args.n_layer, use_average=average, num_workers=args.num_workers,
    )
    stats = pipe.run(args.wav_dir, args.save_path, wav_names)
    print(
        f"extracted {stats.n_utts} utts ({stats.audio_seconds:.1f} audio-s) in "
        f"{stats.wall_seconds:.1f}s = {stats.utts_per_sec:.1f} utt/s"
    )
    return stats


def _text_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--roberta_type", type=str, default="roberta")
    p.add_argument("--df_path", type=str, default="./")
    p.add_argument("--save_path", type=str, default="./")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--max_len", type=int, default=80)
    p.add_argument("--use_average", type=str, default="n")
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    return p


def _text_main(argv, family: str):
    import pandas as pd

    args = _text_parser().parse_args(argv)
    average = args.use_average == "y"
    print(f"Using average = {average}")
    df = pd.read_csv(args.df_path)

    from .extract.pipeline import TextExtractionPipeline
    from .utils.spm import auto_tokenizer

    if family == "roberta":
        from .models.loader import build_roberta as build
    else:
        from .models.loader import build_deberta_v2 as build

    model, params, cfg = build(args.roberta_type, dtype=args.dtype)
    # auto_tokenizer: HF AutoTokenizer where the stack can load it, else
    # the pure-Python SentencePiece unigram fallback (utils/spm.py) — the
    # deberta leg must run even without the sentencepiece wheel
    tokenizer = auto_tokenizer(args.roberta_type)

    def tokenize(texts):
        return tokenizer(
            texts, padding="max_length", max_length=args.max_len, truncation=True,
            return_tensors="np",
        )

    # Batch size per on-chip sweep (scripts/bench_zoo.py, 80-tok seqs):
    # deberta-v2-xxl peaks at B=32 (387 vs 344 seq/s at B=64 — the 48L
    # stack's activations thrash at 64); roberta is flat 64-128.
    pipe = TextExtractionPipeline(
        model, params, tokenize,
        use_average=average, max_length=args.max_len, num_workers=args.num_workers,
        batch_size=32 if family == "deberta" else 64,
    )
    stats = pipe.run(
        df["FileName"].tolist(), df["transcription"].tolist(), args.save_path
    )
    print(f"extracted {stats.n_utts} texts in {stats.wall_seconds:.1f}s")
    return stats


def roberta_main(argv=None):
    return _text_main(argv, "roberta")


def deroberta_main(argv=None):
    return _text_main(argv, "deberta")


def _pretrained_parser():
    p = _speech_parser()
    # reference hardcodes the checkpoint path (preprocess_speech_pretrained.py:173);
    # exposed as a flag with the same default semantics
    p.add_argument("--lora_ckpt", type=str, default="whisper_lora_ser.pt")
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--lora_alpha", type=float, default=16.0)
    return p


def speech_pretrained_main(argv=None):
    """LoRA-fine-tuned WavLM extraction (preprocess_speech_pretrained.py).

    The reference extracts with the peft-wrapped model (adapters active,
    L170-176); merging W+(α/r)AB is the identical forward with dropout off.
    """
    args = _pretrained_parser().parse_args(argv)
    average = args.use_average == "y"
    print(f"Using average = {average}")
    wav_names = _audit_wavs(args.wav_dir)
    if wav_names is None:
        return None

    from .extract.pipeline import SpeechExtractionPipeline
    from .models import lora as lora_lib
    from .models.loader import build_speech_encoder
    from .utils import ptio

    print(f"Extracting features using {args.ssl_type} + LoRA {args.lora_ckpt}")
    model, params, cfg, do_normalize = build_speech_encoder(args.ssl_type, dtype=args.dtype)
    sd = ptio.load_state_dict(args.lora_ckpt)
    if any(".lora_A.default." in k for k in sd):
        lora = lora_lib.lora_from_peft_state_dict(sd)
    else:
        lora = lora_lib.lora_from_state_dict(sd)
    params = lora_lib.merge_lora(params, lora, args.lora_alpha, args.lora_rank)

    pipe = SpeechExtractionPipeline(
        model, params, cfg, n_layer=args.n_layer, use_average=average,
        do_normalize=do_normalize, num_workers=args.num_workers,
    )
    stats = pipe.run(args.wav_dir, args.save_path, wav_names)
    print(f"extracted {stats.n_utts} utts in {stats.wall_seconds:.1f}s")
    return stats


def whisper_pretrained_main(argv=None):
    """LoRA-fine-tuned Whisper-encoder extraction (preprocess_whisper_pretrained.py)."""
    args = _pretrained_parser().parse_args(argv)
    average = args.use_average == "y"
    print(f"Using average = {average}")
    wav_names = _audit_wavs(args.wav_dir)
    if wav_names is None:
        return None

    from .extract.pipeline import WhisperExtractionPipeline
    from .models import lora as lora_lib
    from .models.loader import build_whisper_encoder
    from .utils import ptio

    print(f"Extracting features using {args.ssl_type} + LoRA {args.lora_ckpt}")
    model, params, cfg = build_whisper_encoder(args.ssl_type, dtype=args.dtype)
    sd = ptio.load_state_dict(args.lora_ckpt)
    if any(".lora_A.default." in k for k in sd):
        lora = lora_lib.lora_from_peft_state_dict(sd)
    else:
        lora = lora_lib.lora_from_state_dict(sd)
    params = lora_lib.merge_lora(params, lora, args.lora_alpha, args.lora_rank)

    pipe = WhisperExtractionPipeline(
        model, params, cfg, n_layer=args.n_layer, use_average=average,
        num_workers=args.num_workers,
    )
    stats = pipe.run(args.wav_dir, args.save_path, wav_names)
    print(f"extracted {stats.n_utts} utts in {stats.wall_seconds:.1f}s")
    return stats


def _ns3_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--save_path", type=str, default="./")
    p.add_argument("--wav_dir", type=str, default="./")
    p.add_argument("--num_workers", type=int, default=4)
    # reference hardcodes these paths (preprocess_ns3_prosody.py:124-130)
    p.add_argument("--encoder_ckpt", type=str,
                   default="./pretrained_models/ns3/ns3_facodec_encoder_v2.bin")
    p.add_argument("--decoder_ckpt", type=str,
                   default="./pretrained_models/ns3/ns3_facodec_decoder_v2.bin")
    p.add_argument("--batch_size", type=int, default=16)
    # legacy …_prosodycodes variant: save VQ code indices instead of embeddings
    p.add_argument("--codes", action="store_true")
    return p


def ns3_prosody_main(speaker: bool = False, argv=None):
    """FACodec prosody (256-d) / prosody+speaker (512-d) extraction.

    Reference semantics (preprocess_ns3_prosody[_speaker].py:41-62): wav
    zero-padded to %200, per-utterance batch-1 forward, save [T, D].
    Batched here with host reflect-padded mel input + frame masks, which
    reproduces the batch-1 outputs (models/ns3/facodec.py docstring).
    """
    import concurrent.futures as cf
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    args = _ns3_parser().parse_args(argv)
    wav_names = _audit_wavs(args.wav_dir)
    if wav_names is None:
        return None
    os.makedirs(args.save_path, exist_ok=True)

    from .models.ns3 import (
        ProsodyExtractor,
        ns3_decoder_prosody_params_from_torch,
        ns3_encoder_params_from_torch,
    )
    from .utils import ptio
    from .utils.audio import load_wav

    dec_sd = ptio.load_state_dict(args.decoder_ckpt)
    params = ns3_decoder_prosody_params_from_torch(dec_sd, with_speaker=speaker)
    if speaker:
        enc_sd = ptio.load_state_dict(args.encoder_ckpt)
        params["encoder"] = ns3_encoder_params_from_torch(enc_sd)
    extractor = ProsodyExtractor(params, with_speaker=speaker)

    t0 = time.perf_counter()
    pool = cf.ThreadPoolExecutor(max_workers=args.num_workers)

    def load(name):
        try:
            y, _ = load_wav(os.path.join(args.wav_dir, name), target_sr=16000)
            return np.pad(y, (0, 200 - len(y) % 200))  # reference pad-to-%200
        except Exception as e:
            print(f"Failed to process {name}: {e}")
            return None

    waves = list(pool.map(load, wav_names))
    ok = sorted(
        [(n, w) for n, w in zip(wav_names, waves) if w is not None],
        key=lambda kv: len(kv[1]),
    )
    writer = cf.ThreadPoolExecutor(max_workers=args.num_workers)
    pending = []
    fwd_cache = {}
    bs = args.batch_size
    n_done = 0
    for s in range(0, len(ok), bs):
        chunk = ok[s : s + bs]
        Lb = ((max(len(w) for _, w in chunk) + 3199) // 3200) * 3200
        Tb = Lb // 200
        wav = np.zeros((bs, Lb), np.float32)
        refl = np.zeros((bs, Lb + 824), np.float32)
        fmask = np.zeros((bs, Tb), np.float32)
        for i, (_, w) in enumerate(chunk):
            wav[i, : len(w)] = w
            refl[i, : len(w) + 824] = np.pad(w, (412, 412), mode="reflect")
            fmask[i, : len(w) // 200] = 1
        sig = wav.shape
        if sig not in fwd_cache:
            if args.codes:
                fwd_cache[sig] = jax.jit(extractor.codes)
            else:
                fwd_cache[sig] = jax.jit(extractor.extract_batched)
        if args.codes:
            feats = np.asarray(fwd_cache[sig](jnp.asarray(wav)))
        else:
            feats = np.asarray(
                fwd_cache[sig](jnp.asarray(wav), jnp.asarray(refl), jnp.asarray(fmask))
            )
        for i, (name, w) in enumerate(chunk):
            stem = os.path.splitext(os.path.basename(name))[0]
            out = os.path.join(args.save_path, f"{stem}.pt")
            pending.append(
                writer.submit(ptio.save_tensor, feats[i, : len(w) // 200].copy(), out)
            )
            n_done += 1
    for f in pending:
        f.result()
    dt = time.perf_counter() - t0
    print(f"extracted {n_done} utts in {dt:.1f}s")
    return n_done
