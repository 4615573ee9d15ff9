#!/usr/bin/env python
"""Generate configs/old/ — launchable equivalents of the reference's 116
legacy configs (reference configs/old/*.json).

Each file keeps the reference schema and hyperparameters verbatim; the only
transformation is path normalization: the reference hardcodes its cluster
prefix (/workspace/lucas.ueda/interspeech_ser/...) which is rewritten to a
repo-relative ./ so every mapped bin/old wrapper can be launched with its
canonical config unchanged.

Run with the reference checkout available (used once at build time; the
generated JSONs are committed):
    python scripts/gen_legacy_configs.py --reference /root/reference
"""

import argparse
import json
import os

CLUSTER_PREFIXES = (
    "/workspace/lucas.ueda/interspeech_ser/",
    "/workspace/lucas.ueda/interspeech_ser",
    "/l/disk1/awstebas/lhueda/github/2024/challenge/interspeech_ser/",
)


def normalize(value):
    if isinstance(value, str):
        for p in CLUSTER_PREFIXES:
            if value.startswith(p):
                rest = value[len(p):].lstrip("/")
                return "./" + rest if rest else "./"
    return value


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "configs", "old"))
    args = ap.parse_args()

    src = os.path.join(args.reference, "configs", "old")
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(src)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(src, name)) as f:
            cfg = json.load(f)
        cfg = {k: normalize(v) for k, v in cfg.items()}
        with open(os.path.join(args.out, name), "w") as f:
            json.dump(cfg, f, indent=4)
            f.write("\n")
        n += 1
    print(f"wrote {n} configs to {args.out}")


if __name__ == "__main__":
    main()
