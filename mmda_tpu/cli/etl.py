"""Offline ETL CLI - the `create_dataset.py` equivalent
(reference src/create_dataset.py), producing the framework's fixed-shape
.npz splits + vocab + GloVe matrix once.

Usage:
  python -m mmda_tpu.cli.etl --data mosei --data_dir /data/multimodal \
      --sdk_dir /data/CMU-MultimodalSDK \
      --word_emb_path /data/glove.840B.300d.txt \
      --bert_vocab /data/bert-base-uncased/vocab.txt
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description="mmda_tpu offline ETL")
    ap.add_argument("--data", required=True,
                    choices=["mosi", "mosei", "mosei_unaligned", "ur_funny"])
    ap.add_argument("--data_dir", default="./datasets")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--sdk_dir", default=None)
    ap.add_argument("--word_emb_path", default=None)
    ap.add_argument("--bert_vocab", default=None)
    ap.add_argument("--max_len", type=int, default=64)
    args = ap.parse_args(argv)

    from mmda_tpu.data.etl.datasets import build_dataset

    splits = build_dataset(
        args.data, args.data_dir, out_dir=args.out_dir, sdk_dir=args.sdk_dir,
        word_emb_path=args.word_emb_path, bert_vocab_path=args.bert_vocab,
        max_len=args.max_len,
    )
    for name, arrays in splits.items():
        print(f"{name}: {len(arrays['lengths'])} segments, "
              f"visual={arrays['visual'].shape[-1]}d, "
              f"acoustic={arrays['acoustic'].shape[-1]}d")


if __name__ == "__main__":
    main()
