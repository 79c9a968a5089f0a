"""Extract OpenCLIP vocab/merges text files from a HF tokenizer.json.

Equivalent of the reference's tokenizer/convert.py:9-17: reads
model.vocab (ordered token -> id map) and model.merges from the fast-
tokenizer JSON and writes the line-per-entry vocab.txt / merges.txt the
OpenClipTokenizer loads.

Usage:
  python -m sdxl_tpu.cli.extract_tokenizer tokenizer.json --output-dir tokenizer/open_clip
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Extract vocab/merges from tokenizer.json")
    p.add_argument("config_file", type=str)
    p.add_argument("--output-dir", type=str, default=".")
    p.add_argument(
        "--vendor",
        action="store_true",
        help="also write the single gzipped merge table the package vendors "
        "(sdxl_tpu/tokenizer/data/bpe_merges.txt.gz layout) to "
        "OUTPUT_DIR/bpe_merges.txt.gz",
    )
    args = p.parse_args(argv)

    with open(args.config_file, "r", encoding="utf-8") as f:
        data = json.load(f)

    vocab = data["model"]["vocab"]
    merges = data["model"]["merges"]

    # vocab may be a dict token->id (HF fast tokenizers); order by id
    if isinstance(vocab, dict):
        vocab = [tok for tok, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
    # merges entries may be "a b" strings or [a, b] pairs
    merges = [m if isinstance(m, str) else " ".join(m) for m in merges]

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "vocab.txt"), "w", encoding="utf-8") as f:
        f.writelines(f"{t}\n" for t in vocab)
    with open(os.path.join(args.output_dir, "merges.txt"), "w", encoding="utf-8") as f:
        f.writelines(f"{m}\n" for m in merges)
    print(f"wrote {len(vocab)} vocab entries, {len(merges)} merges -> {args.output_dir}")

    if args.vendor:
        import gzip

        path = os.path.join(args.output_dir, "bpe_merges.txt.gz")
        with gzip.GzipFile(path, "wb", mtime=0) as gz:  # mtime=0: reproducible
            gz.write("\n".join(merges).encode("utf-8"))
        print(f"wrote vendored table ({len(merges)} merges) -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
