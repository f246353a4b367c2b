"""Round-3 regression tests for VERDICT/ADVICE round-2 findings:

  * dryrun_multichip FAILS LOUDLY when the backend cannot provision
    n devices (VERDICT weak #2: the round-2 degrade path would have let the
    driver record ok=true having tested nothing multichip);
  * lr_schedule cosine/exponential without steps_per_epoch raises instead of
    silently running a constant lr (ADVICE low).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_raises_when_backend_preinitialized():
    """Simulate the driver importing jax (1-device CPU backend) BEFORE calling
    dryrun_multichip(8): the call must raise, not degrade to a 1x1 mesh."""
    code = (
        "import os, sys\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ.pop('XLA_FLAGS', None)\n"
        "sys.path.insert(0, %r)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"  # backend now locked
        "import __graft_entry__ as g\n"
        "try:\n"
        "    g.dryrun_multichip(8)\n"
        "except RuntimeError as e:\n"
        "    assert 'Refusing to degrade' in str(e), e\n"
        "    print('RAISED_AS_EXPECTED')\n"
        "else:\n"
        "    print('SILENT_PASS')\n"
        "    sys.exit(1)\n"
    ) % REPO
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # keep the axon site off the path so this subprocess stays CPU-only and
    # cannot grab the TPU tunnel from under a concurrently running job
    env["PYTHONPATH"] = REPO
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=300)
    assert "RAISED_AS_EXPECTED" in out.stdout, (out.stdout, out.stderr)
    assert out.returncode == 0, (out.stdout, out.stderr)


def test_cosine_without_steps_per_epoch_raises():
    from mmda_tpu.config import Config
    from mmda_tpu.train.state import make_optimizer

    for sched in ("cosine", "exponential"):
        cfg = Config(lr_schedule=sched)
        with pytest.raises(ValueError, match="steps_per_epoch"):
            make_optimizer(cfg)
        make_optimizer(cfg, steps_per_epoch=10)  # and this must not raise


def test_dropout_recompute_and_remat_grad_equivalence():
    """BertConfig.dropout_recompute (mask regenerated in bwd from the key)
    and BertConfig.remat (per-layer checkpoint) must be NUMERICALLY IDENTICAL
    to the baseline - same loss, same grads (same keys -> same masks)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mmda_tpu.models.bert import BertConfig, bert_encode, init_bert_params

    base = BertConfig.tiny()
    params = init_bert_params(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    ids = jnp.array(rng.integers(5, 128, size=(4, 10)), jnp.int32)
    mask = jnp.ones((4, 10), jnp.int32)
    key = jax.random.PRNGKey(7)

    def loss(p, cfg):
        out = bert_encode(p, cfg, ids, mask, deterministic=False,
                          dropout_rng=key, compute_dtype=jnp.float32)
        return jnp.sum(out ** 2)

    import dataclasses

    l0, g0 = jax.value_and_grad(loss)(params, base)
    for variant in (
        dataclasses.replace(base, dropout_recompute=True),
        dataclasses.replace(base, remat=True),
        dataclasses.replace(base, dropout_recompute=True, remat=True),
    ):
        l1, g1 = jax.value_and_grad(loss)(params, variant)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)


def test_dropout_u8_semantics():
    """dropout_bits=8: keep rate ~= 1-rate, scaling unbiased (E[out]==x), and
    the recompute variant is bit-identical to the non-recompute one (same key
    -> same mask) including its gradient."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from mmda_tpu.models.bert import BertConfig, _make_dropout

    rate = 0.1
    key = jax.random.PRNGKey(3)
    x = jnp.ones((256, 257), jnp.float32)

    drop8 = _make_dropout(dataclasses.replace(BertConfig.tiny(),
                                              dropout_bits=8))
    y = drop8(key, x, rate, False)
    kept = float(jnp.mean(y > 0))
    assert abs(kept - 0.9) < 0.01                      # ~k/256 keep rate
    assert abs(float(jnp.mean(y)) - 1.0) < 0.02       # unbiased scaling
    # exact scale: 256/k for k = round(0.9*256) = 230
    nz = np.unique(np.asarray(y)[np.asarray(y) > 0])
    np.testing.assert_allclose(nz, [256.0 / 230], rtol=1e-6)

    drop8r = _make_dropout(dataclasses.replace(
        BertConfig.tiny(), dropout_bits=8, dropout_recompute=True))

    def f(fn, x):
        return jnp.sum(fn(key, x, rate, False) ** 2)

    v0, g0 = jax.value_and_grad(lambda x: f(drop8, x))(x)
    v1, g1 = jax.value_and_grad(lambda x: f(drop8r, x))(x)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))
