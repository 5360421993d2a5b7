"""Device->host transfer helper for networked TPUs.

On the axon tunnel, `jax.device_get` over a LIST of arrays serializes
pathologically (measured 24 s for 13 x 21 KB arrays), while issuing
`copy_to_host_async` on every array first and then materializing lets
the copies overlap (37 ms for the same batch). Use `fetch` for every
multi-array download."""

from __future__ import annotations

import numpy as np


def fetch(tree):
    """Materialize a pytree of jax arrays on host with overlapped
    transfers. Returns the same structure with numpy leaves."""
    import jax

    leaves = jax.tree.leaves(tree)
    for x in leaves:
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    return jax.tree.map(np.asarray, tree)
