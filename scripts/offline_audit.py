#!/usr/bin/env python
"""One-command offline real-checkpoint quality audit.

The zero-egress build image cannot fetch real HF weights, so end-to-end
quality parity (dev macro-F1 0.3785 — BASELINE.md, reference
``test/[EVAL] Bimodal ensemble categorical stacking 1 head -
VFINAL.ipynb`` cell 42) has never been provable here. This harness makes
it a single command the moment checkpoints (and data) are mountable:

  1. convert — load each HF checkpoint from --ckpt_dir, run our
     converter + flax forward, report cosine vs the torch forward
     (threshold 0.999, BASELINE.json contract)
  2. extract — features for EVERY mounted encoder the VFINAL ensemble
     uses (whisper / wavlm / hubert / w2v2 audio dumps; whisper
     transcription unless --transcripts is given; roberta / deberta
     text dumps)
  3. train   — the reference's five VFINAL bimodal 1-head experiments
     (hubert+roberta, whisper+roberta, wavlm+roberta, whisper+deberta,
     whisper+hubert — VFINAL notebook cell 2), each once per --seeds
     entry; experiments whose features are missing are skipped with a
     log line
  4. stack   — results/{train,dev}.csv logits across all trained
     experiment models → RF stacking (test/stacking.py) → dev macro-F1
     vs 0.3785

Real run (only the mounts are new):
  python scripts/offline_audit.py \
      --ckpt_dir /mnt/hf --wav_dir /mnt/msp/Audios \
      --label_path /mnt/msp/processed_labels.csv --seeds 7 8 9 10 11
  # ckpt_dir must contain whisper-large-v3/ and roberta-large/ HF dirs
  # (tokenizer files included); any of wavlm-large/ hubert-xlarge/
  # w2v2-xls-r-2b/ deberta-v2-xxl/ present are convert-audited too.

Dry run (no mounts; random tiny checkpoints + synthetic wavs/labels —
exercises every stage so only the mounts are missing from a real audit):
  python scripts/offline_audit.py --dryrun
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

COSINE_THRESHOLD = 0.999
REFERENCE_F1 = 0.3785  # BASELINE.md: VFINAL notebook cell 42

# ckpt_dir subdir name → (family, audit kind)
KNOWN_CHECKPOINTS = {
    "whisper-large-v3": "whisper",
    "roberta-large": "roberta",
    "wavlm-large": "speech",
    "hubert-xlarge": "speech",
    "w2v2-xls-r-2b": "speech",
    "deberta-v2-xxl": "deberta",
}


def _cosine(a, b) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


# ---------------------------------------------------------------- stage 1
def stage_convert(ckpt_dir: str) -> dict:
    """Converter forward-parity per checkpoint found under ckpt_dir."""
    import torch

    import jax

    from interspeech_ser_tpu.models import loader

    rng = np.random.default_rng(0)
    report = {}
    for name, kind in KNOWN_CHECKPOINTS.items():
        d = os.path.join(ckpt_dir, name)
        if not os.path.isdir(d):
            continue
        print(f"[convert] {name} ({kind}) ...")
        if kind == "speech":
            from transformers import AutoModel

            model, params, cfg, _ = loader.build_speech_encoder(d)
            wav = rng.normal(size=(1, 16000)).astype(np.float32)
            ours = model.apply(
                {"params": params}, wav, np.ones_like(wav)
            )["hidden_states"][-1]
            tm = AutoModel.from_pretrained(d).eval()
            with torch.no_grad():
                ref = tm(torch.tensor(wav), output_hidden_states=True).hidden_states[-1]
        elif kind == "whisper":
            from transformers import WhisperModel

            from interspeech_ser_tpu.ops.mel import whisper_log_mel

            model, params, cfg = loader.build_whisper_encoder(d)
            wav = rng.normal(size=(16000 * 30,)).astype(np.float32) * 0.1
            mel = whisper_log_mel(wav[None], num_mels=cfg.num_mel_bins)
            ours = model.apply({"params": params}, mel)
            tm = WhisperModel.from_pretrained(d).eval()
            with torch.no_grad():
                ref = tm.encoder(torch.tensor(np.asarray(mel))).last_hidden_state
        else:  # roberta / deberta
            from transformers import AutoModel

            from interspeech_ser_tpu.utils.spm import auto_tokenizer

            build = (
                loader.build_roberta if kind == "roberta" else loader.build_deberta_v2
            )
            model, params, cfg = build(d)
            # pure-Python SPM fallback when the sentencepiece wheel is
            # absent (deberta); model parity itself is tokenizer-agnostic
            tok = auto_tokenizer(d)
            enc = tok(["an offline parity audit sentence"], padding="max_length",
                      max_length=32, truncation=True, return_tensors="np")
            ours = model.apply(
                {"params": params}, enc["input_ids"], enc["attention_mask"]
            )
            tm = AutoModel.from_pretrained(d).eval()
            with torch.no_grad():
                ref = tm(
                    torch.tensor(enc["input_ids"]),
                    attention_mask=torch.tensor(enc["attention_mask"]),
                ).last_hidden_state
        if isinstance(ours, dict):
            ours = ours.get("last_hidden_state", ours)
        cos = _cosine(np.asarray(jax.device_get(ours)), ref.numpy())
        ok = cos >= COSINE_THRESHOLD
        print(f"[convert] {name}: cosine={cos:.6f} {'OK' if ok else 'FAIL'}")
        report[name] = {"cosine": cos, "ok": ok}
    if not report:
        raise SystemExit(f"no known checkpoint subdirs under {ckpt_dir} "
                         f"(expected any of {sorted(KNOWN_CHECKPOINTS)})")
    return report


# The reference's final VFINAL ensemble stacks exactly these five bimodal
# 1-head experiments (test/[EVAL] … VFINAL.ipynb cell 2; SURVEY.md §2.7):
VFINAL_EXPERIMENTS = [
    ("hubert_roberta", "hubert-xlarge", "roberta-large"),
    ("whisper_roberta", "whisper-large-v3", "roberta-large"),
    ("wavlm_roberta", "wavlm-large", "roberta-large"),
    ("whisper_deberta", "whisper-large-v3", "deberta-v2-xxl"),
    ("whisper_hubert", "whisper-large-v3", "hubert-xlarge"),
]


# ---------------------------------------------------------------- stage 2
def stage_extract(args, workdir: str) -> dict:
    """Features for EVERY mounted encoder the VFINAL ensemble uses
    (+ whisper transcription when no transcript CSV is given). Encoders
    absent from ckpt_dir are skipped with a log line; stage 3 then trains
    whichever of the five experiments have both feature dirs. The deberta
    leg no longer needs the sentencepiece wheel — utils/spm.py's
    pure-Python unigram tokenizer loads the checkpoint's spm.model when
    transformers can't."""
    from interspeech_ser_tpu import preprocess_cli

    feats: dict = {}

    def featdir(family: str) -> str:
        return os.path.join(workdir, "data_tmp", family.replace("-", "_"))

    whisper_dir = os.path.join(args.ckpt_dir, "whisper-large-v3")
    if os.path.isdir(whisper_dir):
        print("[extract] whisper encoder features ...")
        preprocess_cli.whisper_main([
            "--ssl_type", whisper_dir, "--wav_dir", args.wav_dir,
            "--save_path", featdir("whisper-large-v3"), "--dtype", args.dtype,
        ])
        feats["whisper-large-v3"] = featdir("whisper-large-v3")

    for family in ("wavlm-large", "hubert-xlarge", "w2v2-xls-r-2b"):
        d = os.path.join(args.ckpt_dir, family)
        if not os.path.isdir(d):
            continue
        print(f"[extract] {family} features ...")
        preprocess_cli.speech_main([
            "--ssl_type", d, "--wav_dir", args.wav_dir,
            "--save_path", featdir(family), "--dtype", args.dtype,
        ])
        feats[family] = featdir(family)

    txt_csv = args.transcripts
    if txt_csv is None and "whisper-large-v3" in feats:
        print("[extract] whisper transcription ...")
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "test"))
        import whisper_transcriptions

        txt_csv = os.path.join(workdir, "whisper_transcripts.csv")
        whisper_transcriptions.main([
            "--model", whisper_dir, "--wav_dir", args.wav_dir,
            "--out_csv", txt_csv, "--dtype", args.dtype,
        ])

    for family, flag, fn in (
        ("roberta-large", "--roberta_type", preprocess_cli.roberta_main),
        ("deberta-v2-xxl", "--roberta_type", preprocess_cli.deroberta_main),
    ):
        d = os.path.join(args.ckpt_dir, family)
        if not os.path.isdir(d) or txt_csv is None:
            continue
        print(f"[extract] {family} text features ...")
        try:
            fn([flag, d, "--df_path", txt_csv,
                "--save_path", featdir(family), "--dtype", args.dtype])
            feats[family] = featdir(family)
        except Exception as e:  # malformed checkpoint/tokenizer files
            print(f"[extract] {family} SKIPPED: {type(e).__name__}: {e}")

    return {"feat_dirs": feats, "txt_csv": txt_csv}


# ---------------------------------------------------------------- stage 3+4
def _feat_dim(ckpt_dir: str, family: str) -> int:
    from transformers import AutoConfig

    c = AutoConfig.from_pretrained(os.path.join(ckpt_dir, family))
    return c.d_model if family == "whisper-large-v3" else c.hidden_size


def stage_train_and_stack(args, workdir: str, dirs: dict) -> dict:
    import pandas as pd

    from interspeech_ser_tpu import cli
    from interspeech_ser_tpu.utils import labels as L

    feats = dirs["feat_dirs"]
    avail = [
        (name, f1, f2)
        for name, f1, f2 in VFINAL_EXPERIMENTS
        if f1 in feats and f2 in feats
    ]
    if not avail:
        raise SystemExit(f"no VFINAL experiment has both feature dirs "
                         f"(extracted: {sorted(feats)})")
    skipped = [n for n, f1, f2 in VFINAL_EXPERIMENTS
               if (n, f1, f2) not in avail]
    if skipped:
        print(f"[train] experiments skipped (features missing): {skipped}")

    experiments = []
    per_exp = {}
    for name, fam1, fam2 in avail:
        for seed in args.seeds:
            model_path = os.path.join(workdir, f"experiments/{name}_seed{seed}")
            cfg = {
                "wav_dir": args.wav_dir,
                "txt_dir": dirs["txt_csv"],
                "lazy_dir1": feats[fam1],
                "lazy_dir2": feats[fam2],
                "label_path": args.label_path,
                "feat1_dim": _feat_dim(args.ckpt_dir, fam1),
                "feat2_dim": _feat_dim(args.ckpt_dir, fam2),
                "use_balanced_batch": False,
                "use_focalloss": False,
                "epochs": args.epochs,
                "lr": 1e-05,
                "model_path": model_path,
                "batch_size": args.batch_size,
                "accum_step": 1,
            }
            cfg_path = os.path.join(workdir, f"{name}_seed{seed}.json")
            with open(cfg_path, "w") as f:
                json.dump(cfg, f, indent=1)

            print(f"[train] {name}, seed {seed} ...")
            best = cli.train_main(
                argv=["--seed", str(seed), "--config_path", cfg_path]
            )
            print(f"[train] {name} seed {seed}: "
                  f"best dev macro-F1 = {best['macro_f1']:.4f}")
            per_exp[f"{name}_seed{seed}"] = float(best["macro_f1"])

            print(f"[score] dev + train-stacking logits, {name} seed {seed} ...")
            cli.eval_main(argv=["--seed", str(seed), "--config_path", cfg_path])
            cli.extract_train_main(argv=[
                "--seed", str(seed), "--config_path", cfg_path,
                "--train_df", _stacking_df(args, workdir),
            ])
            experiments.append(model_path)

    # stacking labels: FileName + EmoClass letters (+ Gender if present)
    label_df = pd.read_csv(args.label_path)
    letters = [L.INDEX_TO_LETTER[i] for i in np.argmax(label_df[L.CLASSES].values, 1)]
    stack_labels = label_df[["FileName"]].copy()
    stack_labels["EmoClass"] = letters
    if "Gender" in label_df.columns:
        stack_labels["Gender"] = label_df["Gender"]
    stack_label_path = os.path.join(workdir, "stacking_labels.csv")
    stack_labels.to_csv(stack_label_path, index=False)

    print(f"[stack] RF stacking over {len(experiments)} experiment models ...")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "test"))
    import stacking

    macro = stacking.train_main([
        "--experiments", *experiments, "--label_path", stack_label_path,
        "--out_dir", os.path.join(workdir, "stacking_models"),
        "--k", str(args.stacking_folds),
    ])
    return {
        "dev_macro_f1": float(macro),
        "reference_f1": REFERENCE_F1,
        "per_experiment_dev_f1": per_exp,
        "experiments_skipped": skipped,
    }


def _stacking_df(args, workdir: str) -> str:
    """Stratified train subset for stacking-model fitting.

    Mirrors the reference's ``test/train_stacking_sample.csv`` (560/class;
    reference VFINAL notebook cells 12-14); regenerated from the label CSV
    so the harness has no artifact dependency.
    """
    import pandas as pd

    out = os.path.join(workdir, "train_stacking.csv")
    if os.path.exists(out):
        return out
    from interspeech_ser_tpu.utils import labels as L

    df = pd.read_csv(args.label_path)
    train = df[df["Split_Set"] == "Train"]
    cls = np.argmax(train[L.CLASSES].values, 1)
    parts = []
    rng = np.random.default_rng(42)
    for c in range(len(L.CLASSES)):
        rows = train[cls == c]
        n = min(args.stacking_per_class, len(rows))
        if n:
            parts.append(rows.iloc[rng.permutation(len(rows))[:n]])
    pd.concat(parts).to_csv(out, index=False)
    return out


# ---------------------------------------------------------------- dryrun
def _write_wav(path: str, x: np.ndarray, sr: int = 16000) -> None:
    import wave

    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes())


def make_dryrun_fixtures(workdir: str) -> argparse.Namespace:
    """Random tiny checkpoints + synthetic wavs/labels (no mounts)."""
    make = os.makedirs
    ckpt_dir = os.path.join(workdir, "ckpts")
    wav_dir = os.path.join(workdir, "Audios")
    make(ckpt_dir, exist_ok=True)
    make(wav_dir, exist_ok=True)

    import torch
    from transformers import AutoConfig, AutoModel

    torch.manual_seed(0)

    # --- whisper-large-v3 stand-in (tiny dims, real architecture) ---
    from transformers import WhisperConfig, WhisperModel

    wcfg = WhisperConfig(
        d_model=64, encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_ffn_dim=128, num_mel_bins=128, vocab_size=384,
        max_source_positions=1500, max_target_positions=448,
        # defaults point at the real 51k vocab; keep ids inside the tiny one
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=[], begin_suppress_tokens=[],
    )
    WhisperModel(wcfg).eval().save_pretrained(
        os.path.join(ckpt_dir, "whisper-large-v3"))

    # --- roberta-large stand-in + a byte-level tokenizer it can load ---
    rdir = os.path.join(ckpt_dir, "roberta-large")
    rcfg = AutoConfig.for_model(
        "roberta", hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, vocab_size=300, max_position_embeddings=130,
    )
    AutoModel.from_config(rcfg).eval().save_pretrained(rdir)
    _write_byte_level_tokenizer(rdir)

    # --- deberta-v2-xxl stand-in + a hand-built tiny spm.model: the
    # pure-Python unigram tokenizer (utils/spm.py auto_tokenizer fallback)
    # runs this leg WITHOUT the sentencepiece wheel → all 5/5 VFINAL
    # ensemble experiments exercise end-to-end in this image ---
    ddir = os.path.join(ckpt_dir, "deberta-v2-xxl")
    dcfg = AutoConfig.for_model(
        "deberta-v2", hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, vocab_size=64,
        max_position_embeddings=130, relative_attention=True,
        position_buckets=32, max_relative_positions=64,
        pos_att_type=["c2p", "p2c"], norm_rel_ebd="layer_norm",
        share_att_key=True, position_biased_input=False,
    )
    AutoModel.from_config(dcfg).eval().save_pretrained(ddir)
    _write_tiny_spm(ddir)

    # --- wavlm-large stand-in (convert-stage coverage for speech) ---
    scfg = AutoConfig.for_model(
        "wavlm", hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, conv_dim=(16,) * 7, conv_bias=True,
        feat_extract_norm="layer", do_stable_layer_norm=True, num_buckets=32,
        max_bucket_distance=80, classifier_proj_size=8,
    )
    AutoModel.from_config(scfg).eval().save_pretrained(
        os.path.join(ckpt_dir, "wavlm-large"))

    # --- hubert-xlarge stand-in (speech leg of hubert+roberta and
    # whisper+hubert) ---
    hcfg = AutoConfig.for_model(
        "hubert", hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, conv_dim=(16,) * 7, conv_bias=True,
        feat_extract_norm="layer", do_stable_layer_norm=True,
    )
    AutoModel.from_config(hcfg).eval().save_pretrained(
        os.path.join(ckpt_dir, "hubert-xlarge"))

    # --- synthetic wavs + labels: 8 classes × (3 train + 2 dev) ---
    from interspeech_ser_tpu.utils import labels as L

    rng = np.random.default_rng(7)
    rows = []
    i = 0
    for c, cls in enumerate(L.CLASSES):
        for j in range(5):
            name = f"MSP-SYN_{i:04d}.wav"
            wav = (rng.normal(size=16000) * 0.1).astype(np.float32)
            _write_wav(os.path.join(wav_dir, name), wav)
            onehot = [1.0 if k == c else 0.0 for k in range(len(L.CLASSES))]
            rows.append([name] + onehot + ["Train" if j < 3 else "Development"])
            i += 1
    import pandas as pd

    label_path = os.path.join(workdir, "processed_labels.csv")
    pd.DataFrame(
        rows, columns=["FileName"] + L.CLASSES + ["Split_Set"]
    ).to_csv(label_path, index=True)

    # transcripts CSV (skips the whisper-decode stage: random weights
    # produce garbage tokens; the decode path has its own tests)
    txt = os.path.join(workdir, "transcripts.csv")
    pd.DataFrame(
        {"FileName": [r[0] for r in rows],
         "transcription": ["a synthetic dryrun utterance"] * len(rows)}
    ).to_csv(txt, index=False)

    return argparse.Namespace(
        ckpt_dir=ckpt_dir, wav_dir=wav_dir, label_path=label_path,
        transcripts=txt,
    )


def _write_tiny_spm(d: str) -> None:
    """Hand-built unigram spm.model (utils/spm.serialize_spm_model) whose
    ids stay inside the tiny deberta vocab: specials 0-3 + ASCII letter
    pieces + a few words from the dryrun transcript."""
    from interspeech_ser_tpu.utils.spm import (
        CONTROL, NORMAL, UNKNOWN, serialize_spm_model,
    )

    pieces = [
        ("[PAD]", 0.0, CONTROL), ("[CLS]", 0.0, CONTROL),
        ("[SEP]", 0.0, CONTROL), ("[UNK]", 0.0, UNKNOWN),
        ("▁", -2.0, NORMAL),
    ]
    for w in ("a", "synthetic", "dryrun", "utterance"):
        pieces.append(("▁" + w, -1.0, NORMAL))
    for ch in "abcdefghijklmnopqrstuvwxyz":
        pieces.append((ch, -5.0, NORMAL))
    with open(os.path.join(d, "spm.model"), "wb") as f:
        f.write(serialize_spm_model(pieces))


def _write_byte_level_tokenizer(d: str) -> None:
    """Minimal GPT2-style byte-level BPE files (no merges) for a toy
    RobertaTokenizer: 256 byte symbols + specials, ids < vocab_size."""
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    specials = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    vocab = {tok: i for i, tok in enumerate(specials)}
    for b, u in sorted(bytes_to_unicode().items()):
        vocab[u] = len(vocab)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "RobertaTokenizer", "model_max_length": 130}, f)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", help="dir of HF checkpoint subdirs")
    p.add_argument("--wav_dir", help="MSP-Podcast Audios dir")
    p.add_argument("--label_path", help="processed one-hot labels CSV "
                   "(benchmark/process_labels_for_categorical.py output)")
    p.add_argument("--transcripts", default=None,
                   help="existing FileName,transcription CSV (else whisper "
                   "transcription runs)")
    p.add_argument("--seeds", type=int, nargs="+", default=[7],
                   help="one trained model per seed; the reference VFINAL "
                   "ensemble stacks 5")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--stacking_per_class", type=int, default=560)
    p.add_argument("--stacking_folds", type=int, default=5)
    p.add_argument("--workdir", default="./offline_audit")
    p.add_argument("--stages", default="convert,extract,train",
                   help="comma subset of convert,extract,train")
    p.add_argument("--dryrun", action="store_true",
                   help="random tiny checkpoints + synthetic data; "
                   "validates the full chain with no mounts")
    args = p.parse_args(argv)

    if args.dryrun:
        args.workdir = os.path.join(args.workdir, "dryrun")
        shutil.rmtree(args.workdir, ignore_errors=True)
        os.makedirs(args.workdir, exist_ok=True)
        fx = make_dryrun_fixtures(args.workdir)
        args.ckpt_dir, args.wav_dir = fx.ckpt_dir, fx.wav_dir
        args.label_path, args.transcripts = fx.label_path, fx.transcripts
        args.epochs, args.batch_size = 2, 8
        args.stacking_per_class, args.stacking_folds = 3, 2
    elif not (args.ckpt_dir and args.wav_dir and args.label_path):
        p.error("--ckpt_dir, --wav_dir and --label_path are required "
                "(or use --dryrun)")
    os.makedirs(args.workdir, exist_ok=True)

    stages = args.stages.split(",")
    summary = {}
    if "convert" in stages:
        summary["convert"] = stage_convert(args.ckpt_dir)
    if "extract" in stages:
        summary["extract_dirs"] = stage_extract(args, args.workdir)
    if "train" in stages:
        dirs = summary.get("extract_dirs")
        if not dirs:
            # resume mode (--stages train): pick up previously extracted dirs
            base = os.path.join(args.workdir, "data_tmp")
            feat_dirs = {
                fam: os.path.join(base, fam.replace("-", "_"))
                for fam in (
                    "whisper-large-v3", "roberta-large", "wavlm-large",
                    "hubert-xlarge", "w2v2-xls-r-2b", "deberta-v2-xxl",
                )
                if os.path.isdir(os.path.join(base, fam.replace("-", "_")))
            }
            dirs = {"feat_dirs": feat_dirs, "txt_csv": args.transcripts}
        summary["quality"] = stage_train_and_stack(args, args.workdir, dirs)
        f1 = summary["quality"]["dev_macro_f1"]
        print(f"\n=== dev macro-F1 {f1:.4f} vs reference {REFERENCE_F1} "
              f"({'dryrun — number is meaningless, chain is what was tested' if args.dryrun else 'PARITY' if f1 >= REFERENCE_F1 - 0.005 else 'BELOW'}) ===")

    out = os.path.join(args.workdir, "offline_audit_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1, default=str)
    print(f"summary → {out}")
    return summary


if __name__ == "__main__":
    main()
