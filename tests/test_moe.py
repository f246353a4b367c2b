"""Switch-MoE FFN (ops/moe.py) + expert parallelism (parallel/expert.py).

Net-new capability vs the dense reference (SoyeonHH/MMDA has no MoE);
coverage: exact dense equivalence at E=1, capacity-overflow semantics,
aux-loss threading through bert_encode -> model forward -> objective,
EP sharded-vs-unsharded equivalence on the faked 8-device mesh, Trainer
validation rules, and HF sparse upcycling."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmda_tpu.config import Config
from mmda_tpu.data.synthetic import SyntheticSpec, make_split
from mmda_tpu.models import Batch, get_model
from mmda_tpu.models import bert as jbert
from mmda_tpu.ops.moe import init_moe_ffn_params, switch_ffn
from mmda_tpu.parallel import mesh as pmesh

RNG = np.random.default_rng(7)


def _tokens(n=16, h=8):
    return jnp.asarray(RNG.normal(size=(n, h)), jnp.float32)


def _dense_ffn(w_in, b_in, w_out, b_out, x):
    h = jax.nn.gelu(x @ w_in + b_in, approximate=False)
    return h @ w_out + b_out


def test_e1_matches_dense_ffn():
    """One expert with capacity >= N routes every token with gate prob 1.0:
    switch_ffn must equal the plain dense FFN bit-for-bit (f32 compute)."""
    x = _tokens()
    p = init_moe_ffn_params(jax.random.PRNGKey(0), 8, 16, num_experts=1)
    y, aux = switch_ffn(p, x, capacity_factor=1.0,
                        compute_dtype=jnp.float32)
    want = _dense_ffn(p["w_in"][0], p["b_in"][0], p["w_out"][0],
                      p["b_out"][0], x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # softmax over a single logit is exactly 1 -> perfect "balance"
    np.testing.assert_allclose(float(aux["balance"]), 1.0, atol=1e-6)


def test_capacity_overflow_drops_to_zero():
    """Tokens past an expert's capacity C fall out of the FFN (all-zero
    dispatch row); the residual connection upstream keeps them alive."""
    x = _tokens(n=8)
    p = init_moe_ffn_params(jax.random.PRNGKey(1), 8, 16, num_experts=1)
    # capacity_factor 0.5 with E=1 -> C=4: tokens 4..7 are dropped
    y, _ = switch_ffn(p, x, capacity_factor=0.5, compute_dtype=jnp.float32)
    y = np.asarray(y)
    assert np.abs(y[:4]).sum() > 0
    np.testing.assert_array_equal(y[4:], np.zeros_like(y[4:]))


def test_identical_experts_match_dense_any_routing():
    """Sparse-upcycling invariant: when every expert IS the dense FFN and
    capacity covers all tokens, routing cannot change the output beyond the
    Switch gate-prob scaling (y = gate_p * dense(x) — the prob factor is the
    router's only gradient path)."""
    E, H, F, N = 4, 8, 16, 16
    p = init_moe_ffn_params(jax.random.PRNGKey(2), H, F, num_experts=E)
    for k in ("w_in", "b_in", "w_out", "b_out"):
        p[k] = jnp.tile(p[k][:1], (E,) + (1,) * (p[k].ndim - 1))
    x = _tokens(n=N, h=H)
    y, _ = switch_ffn(p, x, capacity_factor=float(E),
                      compute_dtype=jnp.float32)
    gate_p = jnp.max(jax.nn.softmax(x @ p["gate"]["kernel"], axis=-1),
                     axis=-1)
    want = gate_p[:, None] * _dense_ffn(p["w_in"][0], p["b_in"][0],
                                        p["w_out"][0], p["b_out"][0], x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grouped_dispatch_matches_ungrouped_at_ample_capacity():
    """Routing decisions are per-token and identical under grouping; with
    capacity ample enough that neither variant drops, outputs must match
    exactly (grouping only changes the dispatch-einsum shape/FLOPs)."""
    E, H, N, G = 2, 8, 16, 4
    p = init_moe_ffn_params(jax.random.PRNGKey(4), H, 16, num_experts=E)
    x = _tokens(n=N, h=H)
    y1, aux1 = switch_ffn(p, x, capacity_factor=float(E),
                          compute_dtype=jnp.float32, groups=1)
    yg, auxg = switch_ffn(p, x, capacity_factor=float(E),
                          compute_dtype=jnp.float32, groups=G)
    np.testing.assert_allclose(np.asarray(yg), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(auxg["balance"]),
                               float(aux1["balance"]), rtol=1e-6)


def test_grouped_capacity_is_per_group():
    """With G groups, each group gets its own C slots per expert: a token
    distribution that overflows globally can fit per-group and vice versa."""
    E, H = 1, 8
    p = init_moe_ffn_params(jax.random.PRNGKey(5), H, 16, num_experts=E)
    x = _tokens(n=8, h=H)
    # E=1: every token routes to expert 0.  capacity_factor=0.5 ->
    # ungrouped C=4 (tokens 4..7 dropped); G=4 -> per-group C=1 (token 0 of
    # each group kept: global indices 0, 2, 4, 6)
    yu, _ = switch_ffn(p, x, capacity_factor=0.5,
                       compute_dtype=jnp.float32, groups=1)
    yg, _ = switch_ffn(p, x, capacity_factor=0.5,
                       compute_dtype=jnp.float32, groups=4)
    yu, yg = np.asarray(yu), np.asarray(yg)
    assert np.abs(yu[:4]).sum() > 0 and np.abs(yu[4:]).sum() == 0
    kept = np.abs(yg).sum(axis=1) > 0
    np.testing.assert_array_equal(kept, [True, False] * 4)


def test_top2_with_two_experts_is_softmax_mixture():
    """GShard top-2 with E=2 routes every token to BOTH experts; normalized
    gates reduce to the softmax probs themselves, so at ample capacity
    y = p0 * f0(x) + p1 * f1(x) exactly."""
    E, H, N = 2, 8, 12
    p = init_moe_ffn_params(jax.random.PRNGKey(7), H, 16, num_experts=E)
    x = _tokens(n=N, h=H)
    y, _ = switch_ffn(p, x, capacity_factor=float(E),
                      compute_dtype=jnp.float32, top_k=2)
    probs = jax.nn.softmax(x @ p["gate"]["kernel"], axis=-1)     # (N, 2)
    want = (probs[:, :1] * _dense_ffn(p["w_in"][0], p["b_in"][0],
                                      p["w_out"][0], p["b_out"][0], x)
            + probs[:, 1:] * _dense_ffn(p["w_in"][1], p["b_in"][1],
                                        p["w_out"][1], p["b_out"][1], x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_top2_second_choice_queues_after_first():
    """Second-choice tokens must not steal first-choice capacity slots: with
    E=2, N=4 and C sized for the first choices only, every token still gets
    its top-1 expert while the second choices overflow."""
    E, H, N = 2, 8, 4
    p = init_moe_ffn_params(jax.random.PRNGKey(8), H, 16, num_experts=E)
    x = _tokens(n=N, h=H)
    y1, _ = switch_ffn(p, x, capacity_factor=float(E),
                       compute_dtype=jnp.float32, top_k=1)
    # top_k=2 with capacity_factor chosen so C == N: all first choices fit
    # (each expert gets at most N top-1 tokens), second choices beyond C drop
    y2, _ = switch_ffn(p, x, capacity_factor=float(E) / 2,
                       compute_dtype=jnp.float32, top_k=2)
    # C equals N in both calls above -> the top-1 contribution survives in
    # full; y2 differs from y1 only by gate normalization + whatever second
    # choices fit.  Sanity: both finite, not equal (second choices engaged).
    assert np.isfinite(np.asarray(y2)).all()
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_top_k_validation():
    p = init_moe_ffn_params(jax.random.PRNGKey(9), 8, 16, num_experts=2)
    with pytest.raises(ValueError, match="top_k"):
        switch_ffn(p, _tokens(n=8), top_k=3)


def test_groups_must_divide_tokens():
    p = init_moe_ffn_params(jax.random.PRNGKey(6), 8, 16, num_experts=2)
    with pytest.raises(ValueError, match="divide"):
        switch_ffn(p, _tokens(n=10), groups=4)


def _moe_bert_cfg(**kw):
    return dataclasses.replace(
        jbert.BertConfig(vocab_size=64, hidden_size=16, num_layers=2,
                         num_heads=2, intermediate_size=32,
                         max_position_embeddings=32),
        moe_experts=2, **kw)


def test_bert_encode_returns_hidden_and_aux():
    cfg = _moe_bert_cfg()
    params = jbert.init_bert_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(RNG.integers(0, 64, size=(4, 10)), jnp.int32)
    mask = jnp.ones((4, 10), jnp.int32)
    hidden, aux = jax.jit(
        lambda p: jbert.bert_encode(p, cfg, ids, mask,
                                    compute_dtype=jnp.float32))(params)
    assert hidden.shape == (4, 10, 16)
    assert set(aux) == {"balance", "router_z", "drop_frac"}
    assert np.isfinite(float(aux["balance"]))
    assert float(aux["balance"]) >= 1.0 - 1e-5  # 1.0 is the uniform minimum


def test_misa_train_step_with_moe_updates_router():
    """Full MISA step with a MoE tower: finite losses, 'moe' term present,
    and the router gate receives gradient (it only trains through the
    gate-prob scaling — the Switch path — so this guards that wiring)."""
    from mmda_tpu.train.state import create_train_state, make_optimizer
    from mmda_tpu.train.step import make_train_step

    cfg = Config(use_bert=True, batch_size=8, compute_dtype="float32",
                 hidden_size=16, visual_size=5, acoustic_size=6,
                 moe_experts=2)
    bert_cfg = _moe_bert_cfg()
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg, bert_cfg=bert_cfg)
    assert "moe" in params["bert"]["layers"][0]
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, params, jax.random.PRNGKey(1))
    split = make_split(SyntheticSpec(
        num_examples=8, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64))
    batch = Batch(**split)

    step = make_train_step(cfg, tx, fwd_fn, bert_cfg, donate=False)
    new_state, losses = step(state, batch)
    assert np.isfinite(float(losses["total"]))
    assert np.isfinite(float(losses["moe"])) and float(losses["moe"]) != 0.0
    g0 = np.asarray(state.params["bert"]["layers"][0]["moe"]["gate"]["kernel"])
    g1 = np.asarray(
        new_state.params["bert"]["layers"][0]["moe"]["gate"]["kernel"])
    assert not np.array_equal(g0, g1)


def test_expert_parallel_equivalence():
    """EP over the 'model' axis: bert_encode with E-sharded expert weights +
    the dispatched-block constraint matches the unsharded forward."""
    from mmda_tpu.parallel.expert import expert_sharded_moe

    cfg = _moe_bert_cfg()
    params = jbert.init_bert_params(jax.random.PRNGKey(3), cfg)
    ids = jnp.asarray(RNG.integers(0, 64, size=(8, 12)), jnp.int32)
    mask = jnp.ones((8, 12), jnp.int32)

    def fwd(p, ids, mask):
        return jbert.bert_encode(p, cfg, ids, mask,
                                 compute_dtype=jnp.float32)

    want_h, want_aux = jax.jit(fwd)(params, ids, mask)

    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = pmesh.shard_params({"bert": params}, mesh, tp=True)["bert"]
    s_ids = jax.device_put(ids, pmesh.batch_sharding(mesh))
    s_mask = jax.device_put(mask, pmesh.batch_sharding(mesh))
    with expert_sharded_moe(mesh):
        got_h, got_aux = jax.jit(fwd)(sharded, s_ids, s_mask)

    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(got_aux["balance"]),
                               float(want_aux["balance"]), rtol=1e-4)


def test_trainer_rejects_bad_moe_configs():
    from mmda_tpu.train.loop import Trainer

    split = make_split(SyntheticSpec(
        num_examples=8, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64))
    data = {"train": split, "dev": split, "test": split}
    base = dict(use_bert=True, batch_size=8, compute_dtype="float32",
                hidden_size=16, visual_size=5, acoustic_size=6)
    with pytest.raises(ValueError, match="use_bert"):
        Trainer(Config(**{**base, "use_bert": False}, moe_experts=2), data,
                use_mesh=False)
    with pytest.raises(ValueError, match="pp_size"):
        Trainer(Config(**base, moe_experts=2, pp_size=2), data,
                use_mesh=False)
    with pytest.raises(ValueError, match="divisible"):
        Trainer(Config(**base, moe_experts=3, tp_size=2), data,
                use_mesh=False)


def test_moe_checkpoint_serves(tmp_path):
    """Train->serve seam for MoE: a Trainer-saved MoE checkpoint loads into
    a Predictor built from the same Config (bert_config_for applies the MoE
    knobs) and returns finite scores."""
    from mmda_tpu.serving import Predictor
    from mmda_tpu.train.loop import Trainer

    split = make_split(SyntheticSpec(
        num_examples=8, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64, seed=1))
    data = {"train": split, "dev": split, "test": split}
    cfg = Config(use_bert=True, batch_size=8, n_epoch=1,
                 compute_dtype="float32", hidden_size=16, visual_size=5,
                 acoustic_size=6, moe_experts=2, name="moe_serve",
                 ckpt_dir=str(tmp_path), bucket_sizes=(8,))
    bert_cfg = _moe_bert_cfg()
    tr = Trainer(cfg, data, bert_cfg=bert_cfg, use_mesh=False)
    tr.train()

    pred = Predictor(cfg, bert_cfg=bert_cfg, visual_size=5, acoustic_size=6,
                     vocab_size=64, max_batch=8)
    L = 5
    req = {"text": RNG.integers(1, 64, size=L).astype(np.int32),
           "visual": RNG.normal(size=(L, 5)).astype(np.float32),
           "acoustic": RNG.normal(size=(L, 6)).astype(np.float32),
           "bert_ids": RNG.integers(3, 64, size=L + 2).astype(np.int32),
           "bert_type": np.zeros(L + 2, np.int32),
           "bert_mask": np.ones(L + 2, np.int32)}
    out = pred([req, req])
    scores = np.asarray(out["scores"][:2])
    assert np.isfinite(scores).all()


def test_trainer_moe_with_tp_mesh(tmp_path):
    """Trainer-level EP integration: tp_size=2 + moe_experts=2 builds the
    (4,2) mesh, installs the expert constraint, E-shards the expert weights,
    and trains one epoch with finite losses."""
    from mmda_tpu.ops import moe as jmoe
    from mmda_tpu.train.loop import Trainer

    split = make_split(SyntheticSpec(
        num_examples=16, max_len=8, visual_size=5, acoustic_size=6,
        vocab_size=64, bert_vocab_size=64, seed=2))
    data = {"train": split, "dev": split, "test": split}
    cfg = Config(use_bert=True, batch_size=16, n_epoch=1,
                 compute_dtype="float32", hidden_size=16, visual_size=5,
                 acoustic_size=6, moe_experts=2, tp_size=2,
                 name="moe_tp", ckpt_dir=str(tmp_path), bucket_sizes=(8,))
    bert_cfg = _moe_bert_cfg()
    try:
        tr = Trainer(cfg, data, bert_cfg=bert_cfg)
        assert tr.mesh is not None and tr.mesh.shape["model"] == 2
        assert jmoe._EXPERT_CONSTRAINT is not None
        w_in = tr.state.params["bert"]["layers"][0]["moe"]["w_in"]
        # expert axis sharded over 'model': each shard holds E/tp experts
        assert w_in.sharding.spec[0] == "model"
        summary = tr.train()
        assert np.isfinite(summary["best_valid_loss"])
    finally:
        jmoe.set_expert_constraint(None)


def test_hf_sparse_upcycling(tmp_path):
    """load_hf_weights with moe_experts > 0 tiles the dense checkpoint FFN
    into every expert (Komatsuzaki et al. sparse upcycling)."""
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    import torch

    torch.manual_seed(5)
    model = transformers.BertModel(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = dataclasses.replace(jbert.BertConfig.tiny(), moe_experts=2)
    params = jbert.load_hf_weights(str(tmp_path), cfg)
    lp = params["layers"][0]
    assert "ffn_in" not in lp and "moe" in lp
    dense_w = model.encoder.layer[0].intermediate.dense.weight.detach().numpy().T
    for e in range(2):
        np.testing.assert_allclose(np.asarray(lp["moe"]["w_in"][e]), dense_w,
                                   rtol=1e-6)
    assert lp["moe"]["gate"]["kernel"].shape == (32, 2)
