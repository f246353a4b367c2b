"""Measure the PyTorch-CPU baseline for the MOSEI training step.

The reference publishes no numbers (BASELINE.md), so we measure an equivalent
torch training step ourselves: same computation as the reference hot loop
(BERT-base text tower + 2x bi-LSTM visual/acoustic towers + shared/private +
losses + Adam, reference src/solver.py:139-193) on synthetic MOSEI-shaped data.
This is a fresh implementation of the same math (not reference code), used ONLY
as the measurement stick for bench.py's vs_baseline.

Run:  python benchmarks/torch_baseline.py [--steps 8] [--batch 64]
Writes benchmarks/baseline_torch_cpu.json.
"""

import argparse
import json
import os
import time

import numpy as np
import torch
import torch.nn as nn
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence


class TowerLSTM(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.rnn1 = nn.LSTM(d, d, bidirectional=True)
        self.rnn2 = nn.LSTM(2 * d, d, bidirectional=True)
        self.ln = nn.LayerNorm(2 * d)

    def forward(self, x, lengths):  # x: (T, B, D)
        packed = pack_padded_sequence(x, lengths, enforce_sorted=False)
        o1, (h1, _) = self.rnn1(packed)
        p1, _ = pad_packed_sequence(o1)
        packed2 = pack_padded_sequence(self.ln(p1), lengths, enforce_sorted=False)
        _, (h2, _) = self.rnn2(packed2)
        b = x.shape[1]
        return torch.cat((h1, h2), dim=2).permute(1, 0, 2).reshape(b, -1)


class TorchMISA(nn.Module):
    def __init__(self, dv=35, da=74, hidden=128, classes=6):
        super().__init__()
        from transformers import BertConfig, BertModel

        self.bert = BertModel(BertConfig())  # bert-base, random init (offline)
        self.vis = TowerLSTM(dv)
        self.aco = TowerLSTM(da)
        act = nn.LeakyReLU()
        self.proj_t = nn.Sequential(nn.Linear(768, hidden), act, nn.LayerNorm(hidden))
        self.proj_v = nn.Sequential(nn.Linear(4 * dv, hidden), act, nn.LayerNorm(hidden))
        self.proj_a = nn.Sequential(nn.Linear(4 * da, hidden), act, nn.LayerNorm(hidden))
        self.private = nn.ModuleList(
            [nn.Sequential(nn.Linear(hidden, hidden), nn.Sigmoid()) for _ in range(3)])
        self.shared = nn.Sequential(nn.Linear(hidden, hidden), nn.Sigmoid())
        self.recon = nn.ModuleList([nn.Linear(hidden, hidden) for _ in range(3)])
        enc = nn.TransformerEncoderLayer(d_model=hidden, nhead=2)
        self.fusion = nn.TransformerEncoder(enc, num_layers=1)
        self.confidence = nn.Sequential(nn.Linear(hidden * 6, classes), nn.Sigmoid())
        self.classifier = nn.Sequential(
            nn.Linear(hidden * 6, classes), nn.Dropout(0.1), nn.Sigmoid())

    def forward(self, bert_ids, bert_mask, vis, aco, lengths):
        h = self.bert(input_ids=bert_ids, attention_mask=bert_mask).last_hidden_state
        m = bert_mask.unsqueeze(2).float()
        ut = (h * m).sum(1) / m.sum(1)
        uv = self.vis(vis, lengths)
        ua = self.aco(aco, lengths)
        pt, pv, pa = self.proj_t(ut), self.proj_v(uv), self.proj_a(ua)
        priv = [self.private[i](x) for i, x in enumerate((pt, pv, pa))]
        shar = [self.shared(x) for x in (pt, pv, pa)]
        rec = [self.recon[i](priv[i] + shar[i]) for i in range(3)]
        seq = torch.stack(priv + shar, dim=0)
        fused = self.fusion(seq)
        flat = torch.cat([fused[i] for i in range(6)], dim=1)
        tcp = self.confidence(flat)
        scores = self.classifier(flat)
        return scores, tcp, priv, shar, rec, (pt, pv, pa)


def cmd(x1, x2, n=5):
    m1, m2 = x1.mean(0), x2.mean(0)
    s1, s2 = x1 - m1, x2 - m2
    out = ((m1 - m2).pow(2).sum()) ** 0.5
    for k in range(2, n + 1):
        out = out + ((s1.pow(k).mean(0) - s2.pow(k).mean(0)).pow(2).sum()) ** 0.5
    return out


def diff(a, b):
    a = a - a.mean(0, keepdim=True)
    b = b - b.mean(0, keepdim=True)
    a = a / (a.norm(dim=1, keepdim=True).detach() + 1e-6)
    b = b / (b.norm(dim=1, keepdim=True).detach() + 1e-6)
    return (a.t() @ b).pow(2).mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=48)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                  "baseline_torch_cpu.json"))
    args = ap.parse_args()

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    rng = np.random.default_rng(0)
    B, T = args.batch, args.seq
    model = TorchMISA()
    # freeze BERT layers <= 8 like the reference (src/solver.py:69-73)
    for name, p in model.named_parameters():
        if "bert.encoder.layer" in name:
            if int(name.split("encoder.layer.")[-1].split(".")[0]) <= 8:
                p.requires_grad = False
    opt = torch.optim.Adam(
        [p for p in model.parameters() if p.requires_grad], lr=1e-4)
    bce = nn.BCELoss()

    bert_ids = torch.tensor(rng.integers(1000, 30000, size=(B, T + 2)))
    bert_mask = torch.ones(B, T + 2, dtype=torch.long)
    vis = torch.tensor(rng.normal(size=(T, B, 35)).astype(np.float32))
    aco = torch.tensor(rng.normal(size=(T, B, 74)).astype(np.float32))
    lengths = torch.full((B,), T, dtype=torch.long)
    emo = torch.tensor((rng.uniform(size=(B, 6)) > 0.7).astype(np.float32))

    def step():
        opt.zero_grad()
        scores, tcp, priv, shar, rec, orig = model(bert_ids, bert_mask, vis, aco, lengths)
        cls = sum(bce(scores[:, i], emo[:, i]) for i in range(6))
        sim = (cmd(shar[0], shar[1]) + cmd(shar[0], shar[2]) + cmd(shar[2], shar[1])) / 3
        df = (diff(priv[0], shar[0]) + diff(priv[1], shar[1]) + diff(priv[2], shar[2])
              + diff(priv[2], priv[0]) + diff(priv[2], priv[1]) + diff(priv[0], priv[1]))
        rc = sum(nn.functional.mse_loss(rec[i], orig[i]) for i in range(3)) / 3
        loss = cls + 0.3 * df + 0.7 * sim + 0.7 * rc
        loss.backward()
        torch.nn.utils.clip_grad_value_(
            [p for p in model.parameters() if p.requires_grad], 1.0)
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0
    per_step = dt / args.steps
    utt_per_sec = B / per_step

    result = {
        "metric": "mosei_train_utterances_per_sec",
        "value": utt_per_sec,
        "unit": "utterances/s",
        "hardware": f"cpu x{torch.get_num_threads()} threads",
        "batch": B,
        "seq": T,
        "per_step_s": per_step,
        "framework": "torch-cpu (reference-equivalent computation)",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
