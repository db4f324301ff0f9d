"""Device-mesh data parallelism.

Replaces the reference's torch.nn.DataParallel (ref: §2.4 of SURVEY —
model, discriminator, and even loss modules were DP-wrapped,
train_s2.py:94-164). Here parallelism is declarative: one jitted train step,
batch sharded over the 'data' mesh axis, parameters replicated; XLA inserts
the psum for gradient/metric reduction over ICI. No replicated-loss-module
workaround — rendering losses live inside the step and shard with the batch.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_step(
    step_fn: Callable, mesh: Mesh, axis: str = "data",
    extra_arg_specs: tuple = (),
) -> Callable:
    """Wrap step_fn(state, batch, rng, *extra) with DP shardings.

    State/rng replicated, batch sharded on the leading dim. jit + sharding
    annotations let the XLA SPMD partitioner place the gradient psum on ICI.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    in_shardings = (repl, shard, repl) + tuple(
        repl if s == "replicated" else shard for s in extra_arg_specs
    )
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=(repl, repl),
    )
