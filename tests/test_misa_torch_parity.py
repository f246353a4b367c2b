"""FULL-MODEL parity: the complete MISA forward (GloVe tower config) vs a
torch re-derivation of the reference computation (src/models.py:163-250) with
identical weights.  This is the SURVEY.md §4.2 "model parity test" - every
stage in one shot: embedding -> packed bi-LSTM towers -> projections ->
shared/private -> sp-disc -> recon -> 6-token transformer fusion -> heads.
"""

import numpy as np
import torch
import torch.nn as nn
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

import jax
import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.models import Batch, get_model

RNG = np.random.default_rng(21)

B, T, H = 4, 7, 8          # hidden_size 8 (2 heads x 4)
DV, DA, EMB, VOCAB, C = 3, 5, 6, 40, 6


def _torch_tower(d):
    return (nn.LSTM(d, d, bidirectional=True),
            nn.LSTM(2 * d, d, bidirectional=True),
            nn.LayerNorm(2 * d))


def _torch_extract(x, lengths, rnn1, rnn2, ln):
    packed = pack_padded_sequence(x, lengths, enforce_sorted=False)
    o1, (h1, _) = rnn1(packed)
    p1, _ = pad_packed_sequence(o1)
    packed2 = pack_padded_sequence(ln(p1), lengths, enforce_sorted=False)
    _, (h2, _) = rnn2(packed2)
    b = x.shape[1]
    return torch.cat((h1, h2), dim=2).permute(1, 0, 2).reshape(b, -1)


def _copy_rnn(rnn):
    out = {}
    for name, suffix in (("fwd", ""), ("bwd", "_reverse")):
        out[name] = {
            "w_ih": jnp.array(getattr(rnn, f"weight_ih_l0{suffix}").detach().numpy()),
            "w_hh": jnp.array(getattr(rnn, f"weight_hh_l0{suffix}").detach().numpy()),
            "b_ih": jnp.array(getattr(rnn, f"bias_ih_l0{suffix}").detach().numpy()),
            "b_hh": jnp.array(getattr(rnn, f"bias_hh_l0{suffix}").detach().numpy()),
        }
    return out


def _copy_linear(lin):
    return {"kernel": jnp.array(lin.weight.detach().numpy().T),
            "bias": jnp.array(lin.bias.detach().numpy())}


def _copy_ln(ln):
    return {"scale": jnp.array(ln.weight.detach().numpy()),
            "bias": jnp.array(ln.bias.detach().numpy())}


def test_full_misa_forward_matches_torch():
    torch.manual_seed(0)

    # ---- torch reference-equivalent modules ----
    embed = nn.Embedding(VOCAB, EMB)
    trnn1, trnn2, tln = _torch_tower(EMB)
    vrnn1, vrnn2, vln = _torch_tower(DV)
    arnn1, arnn2, aln = _torch_tower(DA)
    act = nn.LeakyReLU()
    proj_t = nn.Sequential(nn.Linear(4 * EMB, H), act, nn.LayerNorm(H))
    proj_v = nn.Sequential(nn.Linear(4 * DV, H), act, nn.LayerNorm(H))
    proj_a = nn.Sequential(nn.Linear(4 * DA, H), act, nn.LayerNorm(H))
    priv = [nn.Sequential(nn.Linear(H, H), nn.Sigmoid()) for _ in range(3)]
    shared = nn.Sequential(nn.Linear(H, H), nn.Sigmoid())
    recon = [nn.Linear(H, H) for _ in range(3)]
    sp_disc = nn.Linear(H, 4)
    enc_layer = nn.TransformerEncoderLayer(d_model=H, nhead=2)
    fusion = nn.TransformerEncoder(enc_layer, num_layers=1)
    confidence = nn.Sequential(nn.Linear(6 * H, C), nn.Sigmoid())
    classifier = nn.Sequential(nn.Linear(6 * H, C), nn.Dropout(0.1), nn.Sigmoid())
    for m in (embed, trnn1, trnn2, tln, vrnn1, vrnn2, vln, arnn1, arnn2, aln,
              proj_t, proj_v, proj_a, shared, sp_disc, fusion, confidence,
              classifier, *priv, *recon):
        m.eval()

    # ---- inputs ----
    lengths = np.array([7, 3, 5, 2])
    text = RNG.integers(2, VOCAB, size=(B, T)).astype(np.int64)
    visual = RNG.normal(size=(B, T, DV)).astype(np.float32)
    acoustic = RNG.normal(size=(B, T, DA)).astype(np.float32)
    for i, L in enumerate(lengths):
        text[i, L:] = 1
        visual[i, L:] = 0
        acoustic[i, L:] = 0

    # ---- torch forward (reference computation, src/models.py:182-250) ----
    with torch.no_grad():
        lt = torch.tensor(lengths)
        emb = embed(torch.tensor(text)).permute(1, 0, 2)
        ut = _torch_extract(emb, lt, trnn1, trnn2, tln)
        uv = _torch_extract(torch.tensor(visual).permute(1, 0, 2), lt, vrnn1, vrnn2, vln)
        ua = _torch_extract(torch.tensor(acoustic).permute(1, 0, 2), lt, arnn1, arnn2, aln)
        pt, pv, pa = proj_t(ut), proj_v(uv), proj_a(ua)
        prt, prv, pra = priv[0](pt), priv[1](pv), priv[2](pa)
        sht, shv, sha = shared(pt), shared(pv), shared(pa)
        rect = recon[0](prt + sht)
        sp_s = sp_disc((sht + shv + sha) / 3.0)
        seq = torch.stack((prt, prv, pra, sht, shv, sha), dim=0)
        fused = fusion(seq)
        flat = torch.cat([fused[i] for i in range(6)], dim=1)
        tcp_t = confidence(flat)
        scores_t = classifier(flat)

    # ---- port weights into our param tree ----
    cfg = Config(use_bert=False, hidden_size=H, num_classes=C, visual_size=DV,
                 acoustic_size=DA, vocab_size=VOCAB, embedding_size=EMB,
                 compute_dtype="float32", threshold=0.35)
    init_fn, fwd_fn = get_model("MISA")
    params = init_fn(jax.random.PRNGKey(0), cfg)

    params["embed"] = jnp.array(embed.weight.detach().numpy())
    for name, (r1, r2, ln) in (
        ("text_extractor", (trnn1, trnn2, tln)),
        ("visual_extractor", (vrnn1, vrnn2, vln)),
        ("acoustic_extractor", (arnn1, arnn2, aln)),
    ):
        params[name] = {"rnn1": _copy_rnn(r1), "rnn2": _copy_rnn(r2),
                        "ln": _copy_ln(ln)}
    for name, mod in (("project_t", proj_t), ("project_v", proj_v),
                      ("project_a", proj_a)):
        params[name] = {"linear": _copy_linear(mod[0]), "ln": _copy_ln(mod[2])}
    params["private_t"] = _copy_linear(priv[0][0])
    params["private_v"] = _copy_linear(priv[1][0])
    params["private_a"] = _copy_linear(priv[2][0])
    params["shared"] = _copy_linear(shared[0])
    params["recon_t"] = _copy_linear(recon[0])
    params["recon_v"] = _copy_linear(recon[1])
    params["recon_a"] = _copy_linear(recon[2])
    params["sp_discriminator"] = _copy_linear(sp_disc)
    params["confidence"] = _copy_linear(confidence[0])
    params["classifier"] = _copy_linear(classifier[0])

    tl = fusion.layers[0]
    params["fusion"] = {
        "in_proj": {"kernel": jnp.array(tl.self_attn.in_proj_weight.detach().numpy().T),
                    "bias": jnp.array(tl.self_attn.in_proj_bias.detach().numpy())},
        "out_proj": _copy_linear(tl.self_attn.out_proj),
        "ln1": _copy_ln(tl.norm1),
        "ln2": _copy_ln(tl.norm2),
        "ffn1": _copy_linear(tl.linear1),
        "ffn2": _copy_linear(tl.linear2),
    }

    batch = Batch(
        text=jnp.array(text.astype(np.int32)),
        visual=jnp.array(visual),
        acoustic=jnp.array(acoustic),
        lengths=jnp.array(lengths),
        bert_ids=jnp.zeros((B, T + 2), jnp.int32),
        bert_type=jnp.zeros((B, T + 2), jnp.int32),
        bert_mask=jnp.ones((B, T + 2), jnp.int32),
        sentiment=jnp.zeros(B),
        emo_label=jnp.zeros((B, C)),
        sample_weight=jnp.ones(B),
    )
    out = fwd_fn(params, cfg, batch, deterministic=True)

    tol = dict(rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.orig_t), pt.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(out.private_v), prv.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(out.shared_a), sha.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(out.recon_t), rect.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(out.sp_s), sp_s.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(out.tcp), tcp_t.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(out.scores), scores_t.numpy(), **tol)
    np.testing.assert_array_equal(
        np.asarray(out.labels), (scores_t.numpy() > cfg.threshold).astype(np.float32))
