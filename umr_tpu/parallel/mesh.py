"""Device-mesh data and tensor parallelism.

Replaces the reference's torch.nn.DataParallel (ref: §2.4 of SURVEY —
model, discriminator, and even loss modules were DP-wrapped,
train_s2.py:94-164). Here parallelism is declarative: one jitted train step,
batch sharded over the 'data' mesh axis, parameters replicated; XLA inserts
the psum for gradient/metric reduction over ICI. No replicated-loss-module
workaround — rendering losses live inside the step and shard with the batch.

Beyond the reference (which has no model parallelism at all), a second
'model' mesh axis shards the large weight matrices Megatron-style —
dominated by the texture head's 8192x8192 fc (67M params, 268 MB f32,
~72% of the model; models/heads.py TexturePredictorUV). Weight shardings
are derived from a pure shape rule (`param_partition_specs`); the GSPMD
partitioner propagates them through the step and places the resulting
all-gathers/reduce-scatters on ICI. Adam moments shard identically to
their parameters (same shapes), so optimizer memory scales down 1/tp too.
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


def make_mesh_2d(
    n_data: int, n_model: int, axes: tuple = ("data", "model")
) -> Mesh:
    """2-D mesh: batch shards over axes[0], big weights over axes[1]."""
    devices = jax.devices()[: n_data * n_model]
    if len(devices) < n_data * n_model:
        raise ValueError(
            f"need {n_data * n_model} devices, have {len(devices)}"
        )
    return Mesh(np.array(devices).reshape(n_data, n_model), axes)


def param_partition_specs(
    tree: Any,
    mesh: Mesh,
    model_axis: str = "model",
    min_size: int = 1 << 22,
) -> Any:
    """PartitionSpec pytree for a TrainState (or any array pytree).

    Shape rule: an array with >= min_size elements is sharded along its
    largest dim divisible by the mesh's model-axis size (ties -> the
    later dim, i.e. Dense kernels [in, out] of equal dims go
    column-parallel); everything else is replicated. Applied to the whole
    TrainState this automatically covers the Adam mu/nu moments (same
    shapes as their params). The default min_size (4M elements) catches
    exactly the texture-head fc weights at production shapes.
    """
    n = mesh.shape[model_axis] if model_axis in mesh.shape else 1

    def spec(x):
        if n <= 1 or not hasattr(x, "shape") or x.ndim == 0:
            return P()
        if x.size < min_size:
            return P()
        best = None
        for d in range(x.ndim):
            if x.shape[d] % n == 0 and (
                best is None or x.shape[d] >= x.shape[best]
            ):
                best = d
        if best is None:
            return P()
        parts = [None] * x.ndim
        parts[best] = model_axis
        return P(*parts)

    return jax.tree.map(spec, tree)


def shard_state(
    state: Any, mesh: Mesh, specs: Any = None, **spec_kwargs
) -> tuple:
    """device_put a TrainState onto the mesh per param_partition_specs.

    Returns (sharded_state, specs) so the specs can be reused as the
    step's in/out shardings (tensor_parallel_step)."""
    if specs is None:
        specs = param_partition_specs(state, mesh, **spec_kwargs)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )
    return sharded, specs


def tensor_parallel_step(
    step_fn: Callable, mesh: Mesh, state_specs: Any, data_axis: str = "data"
) -> Callable:
    """jit step_fn(state, batch, rng) with dp x tp shardings pinned.

    State in/out per state_specs (big weights + their Adam moments on the
    model axis), batch on the data axis (replicated across model), rng and
    scalars replicated. GSPMD inserts the collectives."""
    state_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), state_specs)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
    )


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
