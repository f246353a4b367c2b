"""The training objective: exact reference loss composition (SURVEY.md §2.2).

loss = cls
     + diff_weight * diff
     + sim_weight  * (cmd if use_cmd_sim else domain)
     + recon_weight * recon
     [+ conf_weight * conf   when use_confidNet]

Reference: src/solver.py:163-181 with defaults diff=0.3, sim=0.7, recon=0.7,
conf=0.3 (src/config.py:134-138).  Note sp_weight exists but the sp loss is
never added in the reference (src/solver.py:175-181) - reproduced (we compute
sp logits but no sp loss term).  conf is computed every step even when unused,
like the reference (src/solver.py:168,193), for logging parity.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from mmda_tpu.config import Config
from mmda_tpu.models.misa import Batch, MISAOutput
from mmda_tpu.ops import losses as L


def compute_losses(cfg: Config, out: MISAOutput, batch: Batch) -> Dict[str, jnp.ndarray]:
    emo = batch.emo_label.astype(jnp.float32)

    task = cfg.resolved_task()
    if task == "regression":
        # L1 sentiment regression (reference criterion_dict 'mosi': L1Loss)
        cls_loss = jnp.mean(jnp.abs(out.scores[:, 0] - batch.sentiment))
    else:
        cls_loss = L.bce_sum_over_classes(out.scores, emo)
    if out.shared_t is None:
        # model without shared/private factorization (e.g. EF_LSTM):
        # only the classification objective applies
        diff = sim = recon = jnp.zeros(())
    else:
        diff = L.diff_loss_total(
            out.private_t, out.private_v, out.private_a,
            out.shared_t, out.shared_v, out.shared_a,
        )
        recon = L.recon_loss_total(
            out.recon_t, out.orig_t, out.recon_v, out.orig_v,
            out.recon_a, out.orig_a
        )
        if cfg.use_cmd_sim:
            sim = L.cmd_loss_total(out.shared_t, out.shared_v, out.shared_a)
        else:
            sim = L.domain_loss(out.domain_t, out.domain_v, out.domain_a)

    if task == "regression":
        conf = jnp.zeros(())   # ConfidNet targets are class confidences
    else:
        conf = L.conf_loss(out.scores, emo, out.tcp, fix=cfg.fix_conf_loss)

    total = (
        cls_loss
        + cfg.diff_weight * diff
        + cfg.sim_weight * sim
        + cfg.recon_weight * recon
    )
    if cfg.use_confidNet:
        total = total + cfg.conf_weight * conf

    # Switch-MoE router losses (net-new vs the reference — dense everywhere):
    # load balance keeps experts uniformly utilized, z-loss bounds router
    # logit drift (ops/moe.py).  Zero when the tower is dense so the loss-dict
    # keys stay identical across configurations.
    moe_aux = getattr(out, "moe_aux", None)
    if moe_aux is not None:
        moe = (cfg.moe_aux_weight * moe_aux["balance"]
               + cfg.moe_z_weight * moe_aux["router_z"])
        total = total + moe
        moe_drop = moe_aux.get("drop_frac", jnp.zeros(()))
    else:
        moe = jnp.zeros(())
        moe_drop = jnp.zeros(())

    # model-family-specific auxiliary objective (MISAOutput.model_aux),
    # pre-weighted by the model under 'total' — e.g. MMIM's MI terms
    # (models/mmim.py).  Zero key kept for loss-dict consistency.
    model_aux = getattr(out, "model_aux", None)
    if model_aux is not None:
        aux = model_aux["total"]
        total = total + aux
    else:
        aux = jnp.zeros(())

    return {
        "total": total,
        "cls": cls_loss,
        "diff": diff,
        "sim": sim,
        "recon": recon,
        "conf": conf,
        "moe": moe,
        "moe_drop": moe_drop,   # overflow fraction (observability, no grad)
        "model_aux": aux,
    }
