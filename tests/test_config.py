"""Config system tests: CLI parsing, reference-knob surface, presets,
validation, hidden save/load."""

import numpy as np
import pytest

from mmda_tpu.config import (
    Config, DATASET_HP, MOSEI_HP, build_parser, get_config, str2bool)


def test_str2bool_reference_spellings():
    for v in ("yes", "true", "t", "y", "1", "True", "YES"):
        assert str2bool(v) is True
    for v in ("no", "false", "f", "n", "0", "False"):
        assert str2bool(v) is False
    import argparse

    with pytest.raises(argparse.ArgumentTypeError):
        str2bool("maybe")


def test_cli_parses_reference_flags():
    cfg = get_config(argv=[
        "--data", "mosei", "--use_confidNet", "True", "--eval_mode", "micro",
        "--learning_rate", "1e-5", "--dropout", "0.7", "--use_bert", "False",
        "--diff_weight", "0.5", "--threshold", "0.4", "--rnncell", "gru",
    ])
    assert cfg.use_confidNet is True
    assert cfg.eval_mode == "micro"
    assert np.isclose(cfg.learning_rate, 1e-5)
    assert np.isclose(cfg.dropout, 0.7)
    assert cfg.use_bert is False
    assert cfg.rnncell == "gru"


def test_reference_defaults_preserved():
    cfg = Config()
    # every default from src/config.py:109-158
    assert cfg.num_classes == 6
    assert cfg.batch_size == 64
    assert cfg.eval_batch_size == 10
    assert cfg.n_epoch == 40
    assert cfg.patience == 6
    assert np.isclose(cfg.diff_weight, 0.3)
    assert np.isclose(cfg.sim_weight, 0.7)
    assert np.isclose(cfg.sp_weight, 0.0)
    assert np.isclose(cfg.recon_weight, 0.7)
    assert np.isclose(cfg.conf_weight, 0.3)
    assert np.isclose(cfg.learning_rate, 1e-4)
    assert cfg.optimizer == "Adam"
    assert np.isclose(cfg.clip, 1.0)
    assert np.isclose(cfg.weight_decay, 0.1)
    assert cfg.rnncell == "lstm"
    assert cfg.embedding_size == 300
    assert cfg.hidden_size == 128
    assert np.isclose(cfg.dropout, 0.1)
    assert np.isclose(cfg.reverse_grad_weight, 1.0)
    assert cfg.activation == "leakyrelu"
    assert np.isclose(cfg.threshold, 0.35)
    assert cfg.model == "MISA"
    assert cfg.use_bert and cfg.use_cmd_sim and not cfg.use_confidNet


def test_dataset_hp_preset_applies():
    cfg = get_config(argv=["--data", "mosei", "--apply_dataset_hp", "True"])
    assert cfg.batch_size == MOSEI_HP["batch_size"]
    assert cfg.activation == "leakyrelu"
    assert "mosi" in DATASET_HP


def test_validation_errors():
    with pytest.raises(ValueError):
        Config(activation="swish")
    with pytest.raises(ValueError):
        Config(eval_mode="median")
    with pytest.raises(ValueError):
        Config(lr_schedule="cyclical")
    with pytest.raises(ValueError):
        Config(missing_modality="text")


def test_config_frozen_and_replace():
    cfg = Config()
    with pytest.raises(Exception):
        cfg.batch_size = 1  # frozen dataclass
    cfg2 = cfg.replace(batch_size=8)
    assert cfg2.batch_size == 8 and cfg.batch_size == 64


def test_save_load_hidden(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mmda_tpu.train.checkpoint import load_hidden, save_hidden

    cfg = Config(use_confidNet=True)
    h = np.arange(12.0).reshape(3, 4)
    path = save_hidden(cfg, h)
    assert "MISA_C_mosei" in path
    got = load_hidden(cfg)
    np.testing.assert_array_equal(got, h)


def test_config_json_roundtrip(tmp_path):
    """Trainer writes <name>_config.json; --config_json reloads it as base
    values with explicit CLI flags still winning."""
    import json

    from mmda_tpu.config import get_config
    from mmda_tpu.data.synthetic import SyntheticSpec, make_split
    from mmda_tpu.train.loop import Trainer

    split = make_split(SyntheticSpec(
        num_examples=8, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64))
    data = {"train": split, "dev": split, "test": split}
    cfg = get_config(argv=[
        "--data", "synthetic", "--use_bert", "False", "--hidden_size", "16",
        "--batch_size", "8", "--n_epoch", "1", "--dropout", "0.37",
        "--name", "cfgdump", "--ckpt_dir", str(tmp_path), "--device", "cpu"])
    Trainer(cfg, data, use_mesh=False)   # build writes the artifact

    path = tmp_path / "cfgdump_config.json"
    assert path.exists()
    saved = json.loads(path.read_text())
    assert saved["dropout"] == 0.37 and saved["hidden_size"] == 16

    # reload: file provides base values...
    cfg2 = get_config(argv=["--config_json", str(path)])
    assert cfg2.dropout == 0.37
    assert cfg2.hidden_size == 16
    assert cfg2.use_bert is False
    # ...but an explicit flag wins over the file
    cfg3 = get_config(argv=["--config_json", str(path),
                            "--dropout", "0.5"])
    assert cfg3.dropout == 0.5
    assert cfg3.hidden_size == 16


def test_attn_impl_auto_resolution():
    """attn_impl='auto' (the default) selects flash only where it measured
    faster on v5e (benchmarks/RESULTS.md long-seq tables): training at
    S>=256 (crossover moved down from 512 by the round-5 bf16+ragged
    kernels, bench_flash_r5.log), inference at S>1024; XLA everywhere
    else."""
    from mmda_tpu.config import Config

    cfg = Config()
    assert cfg.attn_impl == "auto"
    # headline shape: S=50 training stays on XLA's fused attention
    # (S=48 probe: flash 29.34 vs XLA 18.25 ms even with the new kernels)
    assert cfg.resolved_attn_impl(training=True, seq_len=50) == "xla"
    assert cfg.resolved_attn_impl(training=False, seq_len=50) == "xla"
    # long-seq training: flash (139.09 vs 143.71 full step at T=256/B=64)
    assert cfg.resolved_attn_impl(training=True, seq_len=256) == "flash"
    assert cfg.resolved_attn_impl(training=True, seq_len=255) == "xla"
    assert cfg.resolved_attn_impl(training=True, seq_len=512) == "flash"
    assert cfg.resolved_attn_impl(training=True, seq_len=1024) == "flash"
    # inference: XLA through S=1024 (ties there), flash beyond
    assert cfg.resolved_attn_impl(training=False, seq_len=1024) == "xla"
    assert cfg.resolved_attn_impl(training=False, seq_len=2048) == "flash"
    # seq_len defaults to max_seq_len
    assert cfg.replace(max_seq_len=512).resolved_attn_impl(training=True) == "flash"
    # explicit choices are never overridden
    assert cfg.replace(attn_impl="xla").resolved_attn_impl(
        training=True, seq_len=1024) == "xla"
    assert cfg.replace(attn_impl="flash").resolved_attn_impl(
        training=False, seq_len=50) == "flash"
    # back-compat alias forces flash under auto too
    assert cfg.replace(use_flash_attention=True).resolved_attn_impl(
        training=False, seq_len=50) == "flash"


def test_attn_impl_validation_includes_auto():
    import pytest
    from mmda_tpu.config import Config

    with pytest.raises(ValueError):
        Config(attn_impl="flashy")
    Config(attn_impl="auto")  # accepted
