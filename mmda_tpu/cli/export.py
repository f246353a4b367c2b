"""Export a trained checkpoint as self-contained StableHLO serving
artifacts: python -m mmda_tpu.cli.export --ckpt_dir ... --export_dir out/

Net-new production surface (the reference's inference.py is a TODO stub,
src/inference.py:1).  See mmda_tpu/serving_export.py for the format.
"""

from __future__ import annotations

import jax


def main(argv=None):
    from mmda_tpu.cli.train import load_data
    from mmda_tpu.config import get_config
    from mmda_tpu.models import get_model
    from mmda_tpu.models.bert import bert_config_for
    from mmda_tpu.serving_export import export_model
    from mmda_tpu.train import checkpoint as ckpt

    cfg = get_config(argv=argv)
    if cfg.device != "tpu":
        jax.config.update("jax_platforms", cfg.device)
    if not cfg.export_dir:
        raise SystemExit("--export_dir is required")

    data, pretrained_emb = load_data(cfg)
    split = data["test"]
    init_fn, _ = get_model(cfg.model)
    bert_cfg = bert_config_for(cfg)
    template = init_fn(
        jax.random.PRNGKey(0), cfg,
        visual_size=split["visual"].shape[-1],
        acoustic_size=split["acoustic"].shape[-1],
        vocab_size=int(split["text"].max()) + 1,
        bert_cfg=bert_cfg,
        pretrained_emb=pretrained_emb,
    )
    name = ckpt.best_model_name(cfg)
    if not ckpt.checkpoint_exists(cfg.ckpt_dir, name):
        raise SystemExit(f"no checkpoint {name!r} under {cfg.ckpt_dir}")
    params = ckpt.load_checkpoint(cfg.ckpt_dir, name, template)

    # bake the tokenizer + word2id into the artifact so the standalone host
    # serves raw text (round 4): WordPiece vocab from --vocab_file, GloVe
    # word2id from the ETL's vocab.tsv next to the splits
    tokenizer = None
    if cfg.vocab_file:
        from mmda_tpu.data.etl.tokenizer import WordPieceTokenizer

        tokenizer = WordPieceTokenizer.from_vocab_file(cfg.vocab_file)
    word2id = None
    if cfg.data != "synthetic":
        import os

        from mmda_tpu.data.etl.vocab import Vocab

        w2_path = os.path.join(cfg.data_dir, cfg.data.upper(), "vocab.tsv")
        if os.path.exists(w2_path):
            word2id = Vocab.load(w2_path).word2id

    manifest = export_model(
        cfg, params, cfg.export_dir, bert_cfg=bert_cfg,
        visual_size=split["visual"].shape[-1],
        acoustic_size=split["acoustic"].shape[-1],
        max_batch=cfg.batch_size,
        tokenizer=tokenizer, word2id=word2id,
        weights_dtype=cfg.export_weights_dtype,
    )
    print(f"exported {manifest['model']} -> {cfg.export_dir} "
          f"(buckets {manifest['bucket_sizes']}, max_batch "
          f"{manifest['max_batch']})")


if __name__ == "__main__":
    main()
