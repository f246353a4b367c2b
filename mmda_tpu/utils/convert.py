"""Host<->device transfer helpers - the `to_gpu`/`to_cpu` equivalents
(reference src/utils/convert.py, which re-parses argparse on every call,
src/utils/convert.py:8-10; here transfers are explicit and config-free).

In the TPU framework these are rarely needed: the input pipeline device_puts
batches onto their sharded layout (data/loader.py) and metrics come back via
np.asarray once per epoch.  Provided for API completeness and ad-hoc use.
"""

from __future__ import annotations

import jax
import numpy as np


def to_device(tree, sharding=None):
    """Pytree of host arrays -> device (optionally with a Sharding)."""
    if sharding is None:
        return jax.tree_util.tree_map(jax.device_put, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def to_host(tree):
    """Pytree of device arrays -> numpy (blocks until ready)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
