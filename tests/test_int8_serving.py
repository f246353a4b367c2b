"""Weight-only int8 serving for the BERT tower
(models/bert.py::quantize_bert_int8, Predictor(bert_weights_dtype='int8')).

Round-4 serving-perf feature: per-output-channel symmetric int8 kernels
halve the tower's weight HBM traffic vs the bf16 storage default (the
serving forward at MOSEI shapes is weight-traffic-bound).  These tests pin
the quantization error bound, the end-to-end Predictor accuracy, and the
TP composition of the quantized layout."""

import numpy as np

import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.models import get_model
from mmda_tpu.models.bert import (BertConfig, _apply_dense, bert_encode,
                                  init_bert_params, quantize_bert_int8)


def test_quantized_dense_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.array(rng.normal(size=(64, 48)).astype(np.float32) * 0.05)
    b = jnp.array(rng.normal(size=48).astype(np.float32) * 0.01)
    x = jnp.array(rng.normal(size=(16, 64)).astype(np.float32))
    exact = _apply_dense({"kernel": w, "bias": b}, x, jnp.float32)
    q = quantize_bert_int8({"layers": [{"q": {"kernel": w, "bias": b}}]})
    qd = q["layers"][0]["q"]
    assert qd["kernel_q"].dtype == jnp.int8
    got = _apply_dense(qd, x, jnp.float32)
    # per-channel int8: worst-case weight error is s/2 = max|w|/254 per
    # element; the matmul accumulates ~sqrt(K) of it
    err = np.abs(np.asarray(got - exact))
    ref = np.abs(np.asarray(exact)).max()
    assert err.max() < 0.02 * max(ref, 1.0), (err.max(), ref)


def test_bert_encode_int8_close_to_f32():
    cfg = BertConfig.tiny()
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_bert_int8(params)
    rng = np.random.default_rng(1)
    ids = jnp.array(rng.integers(5, cfg.vocab_size, size=(4, 12)), jnp.int32)
    mask = jnp.ones((4, 12), jnp.int32)
    full = np.asarray(bert_encode(params, cfg, ids, mask, deterministic=True,
                                  compute_dtype=jnp.float32))
    quant = np.asarray(bert_encode(qparams, cfg, ids, mask,
                                   deterministic=True,
                                   compute_dtype=jnp.float32))
    # cosine similarity per token vector stays ~1 through 2 layers of
    # accumulated quantization noise
    cos = (full * quant).sum(-1) / (
        np.linalg.norm(full, axis=-1) * np.linalg.norm(quant, axis=-1) + 1e-9)
    assert cos.min() > 0.999, cos.min()


def _bert_serving_setup():
    cfg = Config(hidden_size=16, visual_size=5, acoustic_size=6,
                 vocab_size=64, embedding_size=8, compute_dtype="float32",
                 use_bert=True, batch_size=8, bucket_sizes=(4, 8),
                 max_seq_len=8, log_sinks=())
    bert_cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    rng = np.random.default_rng(3)

    def req(L):
        return {
            "text": rng.integers(2, 64, size=L).astype(np.int32),
            "visual": rng.normal(size=(L, 5)).astype(np.float32),
            "acoustic": rng.normal(size=(L, 6)).astype(np.float32),
            "bert_ids": rng.integers(3, 64, size=L + 2).astype(np.int32),
            "bert_type": np.zeros(L + 2, np.int32),
            "bert_mask": np.ones(L + 2, np.int32),
        }

    return cfg, bert_cfg, params, [req(3), req(7), req(2), req(5)]


def test_predictor_int8_matches_f32_closely():
    from mmda_tpu.serving import Predictor

    cfg, bert_cfg, params, reqs = _bert_serving_setup()
    full = Predictor(cfg, params=params, bert_cfg=bert_cfg, max_batch=8,
                     bert_weights_dtype=None)
    q = Predictor(cfg, params=params, bert_cfg=bert_cfg, max_batch=8,
                  bert_weights_dtype="int8")
    # the quantized representation actually landed
    assert q.params["bert"]["layers"][0]["q"]["kernel_q"].dtype == jnp.int8
    want, got = full(reqs), q(reqs)
    np.testing.assert_allclose(got["scores"], want["scores"],
                               rtol=0.02, atol=0.005)
    assert np.isfinite(got["scores"]).all()


def test_predictor_int8_composes_with_tp_mesh():
    from mmda_tpu.parallel import mesh as pmesh
    from mmda_tpu.serving import Predictor

    cfg, bert_cfg, params, reqs = _bert_serving_setup()
    single = Predictor(cfg, params=params, bert_cfg=bert_cfg, max_batch=8,
                       bert_weights_dtype="int8")
    want = single(reqs)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = Predictor(cfg, params=params, bert_cfg=bert_cfg, max_batch=8,
                        bert_weights_dtype="int8", mesh=mesh)
    got = sharded(reqs)
    np.testing.assert_allclose(got["scores"], want["scores"],
                               rtol=2e-5, atol=2e-5)


def test_int8_export_artifact(tmp_path):
    """export_model(weights_dtype='int8') bakes quantized kernels into the
    StableHLO artifact: smaller on disk than the f32 export, scores close,
    manifest records the dtype."""
    import os

    from mmda_tpu.serving_export import ExportedPredictor, export_model

    cfg, bert_cfg, params, reqs = _bert_serving_setup()
    f32_dir, q_dir = tmp_path / "f32", tmp_path / "int8"
    export_model(cfg, params, str(f32_dir), bert_cfg=bert_cfg, max_batch=8)
    m = export_model(cfg, params, str(q_dir), bert_cfg=bert_cfg, max_batch=8,
                     weights_dtype="int8")
    assert m["weights_dtype"] == "int8"

    def tree_size(d):
        return sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
                   if f.endswith(".stablehlo"))

    # at this test's tiny dims the BERT kernels are a small share of the
    # artifact (MISA tower + program bytes dominate), so assert strictly
    # smaller here and pin the 4x kernel-level shrink directly: at bert-base
    # the kernels ARE the artifact and the ~4x carries through
    assert tree_size(str(q_dir)) < tree_size(str(f32_dir))
    ql = quantize_bert_int8(
        {"layers": [{"q": {"kernel": jnp.zeros((768, 768)),
                           "bias": jnp.zeros(768)}}]})["layers"][0]["q"]
    assert ql["kernel_q"].nbytes * 4 == 768 * 768 * 4

    want = ExportedPredictor(str(f32_dir))(reqs)
    got = ExportedPredictor(str(q_dir))(reqs)
    np.testing.assert_allclose(got["scores"], want["scores"],
                               rtol=0.02, atol=0.005)
