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
    p.add_argument("--replicate_dir_count_bug", action="store_true",
                   help="bit-exact reproduction of the reference's "
                        "hidden_states[len(os.listdir(save_path))] quirk")
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


def speech_main(argv=None):
    args = _speech_parser().parse_args(argv)
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

    from transformers import AutoTokenizer

    from .extract.pipeline import TextExtractionPipeline

    if family == "roberta":
        from .models.loader import build_roberta as build
    else:
        from .models.loader import build_deberta_v2 as build

    model, params, cfg = build(args.roberta_type, dtype=args.dtype)
    tokenizer = AutoTokenizer.from_pretrained(args.roberta_type)

    def tokenize(texts):
        return tokenizer(
            texts, padding="max_length", max_length=args.max_len, truncation=True,
            return_tensors="np",
        )

    pipe = TextExtractionPipeline(
        model, params, tokenize,
        use_average=average, max_length=args.max_len, num_workers=args.num_workers,
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
