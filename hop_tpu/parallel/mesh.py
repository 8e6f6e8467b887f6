"""Device mesh construction and sharding placement.

The reference scales with HF Accelerate DDP + DeepSpeed ZeRO-2 over NCCL
(reference run_ted.py:110-112,363-364); the TPU-native equivalent is a
jax.sharding.Mesh with a 'data' axis (batch sharded over ICI, gradients
all-reduced by XLA-inserted psums inside the jitted train step) and an
optional 'model' axis for tensor-parallel placement of the frozen LLM
backbone (its QKV/FFN kernels carry PartitionSpecs via nn.with_partitioning,
see models/bert.py). No explicit collectives appear in model code — layouts
are declared, XLA chooses the ICI collectives.
"""

from __future__ import annotations

import warnings
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import flax.linen as nn
from flax.core import meta as flax_meta


def create_mesh(n_data: int | None = None, n_model: int = 1,
                devices=None, n_dcn: int = 1) -> Mesh:
    """(data, model) mesh over the available devices.

    n_dcn > 1 adds an outer 'dcn' axis for multi-slice deployments
    (SURVEY §5.8): the batch is sharded over (dcn, data) jointly, the
    'data'/'model' axes stay within one ICI domain, and only
    data-parallel gradient all-reduce traffic crosses the DCN axis —
    XLA's hierarchical collectives split the psum into an in-slice
    reduce-scatter, a small cross-slice all-reduce, and an in-slice
    all-gather on real multi-slice topologies. ZeRO-2 moment sharding
    (zero2_spec) stays on 'data' so the optimizer-state all-gather
    rides ICI, never DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_dcn)
    n_used = n_dcn * n_data * n_model
    assert n_used <= len(devices), (n_dcn, n_data, n_model, len(devices))
    if n_dcn > 1:
        grid = np.array(devices[:n_used]).reshape(n_dcn, n_data, n_model)
        return Mesh(grid, ("dcn", "data", "model"))
    grid = np.array(devices[:n_used]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


# jax has no public accessor for the `with mesh:` context; resolve the
# private handle ONCE at import and complain loudly if a jax upgrade moves
# it — silently returning None here would no-op every sharding constraint
# and quietly reintroduce the MULTICHIP_r03 rematerialization regression.
try:
    from jax._src.mesh import thread_resources as _thread_resources
except Exception:  # pragma: no cover - only fires on a jax API break
    _thread_resources = None
    warnings.warn(
        "jax._src.mesh.thread_resources unavailable in this jax version: "
        "ambient_mesh() always returns None, so constrain_batch/"
        "distributed-eval sharding constraints are DISABLED (multichip "
        "perf regression). Update hop_tpu.parallel.mesh.ambient_mesh.",
        RuntimeWarning, stacklevel=2)


def ambient_mesh() -> Mesh | None:
    """The mesh entered via `with mesh:` around the current trace, if any.

    Model code uses this to make sharding constraints self-disabling on
    single-device paths (tests, CPU runs) where no mesh context exists."""
    if _thread_resources is None:
        return None
    m = _thread_resources.env.physical_mesh
    return None if m.empty else m


def constrain_batch(x, axis: int = 0):
    """with_sharding_constraint pinning `axis` to the batch mesh axes
    ('dcn','data') and every other axis REPLICATED; no-op without an
    ambient mesh.

    Purpose: stop XLA's sharding propagation from leaking the 'model'
    axis into recurrent heads. Without it the partitioner sharded the
    GRU scan's (D,B,H) gate tensors over 'model' and fell back to
    involuntary full rematerialization collective-permutes every step
    (MULTICHIP_r03 tail; the dbh,dhg->dbg dot_generals in HOPModel.head
    and ConvDiscriminator)."""
    m = ambient_mesh()
    if m is None:
        return x
    batch = tuple(a for a in ("dcn", "data") if a in m.axis_names)
    if not batch:
        return x
    spec = [None] * x.ndim
    spec[axis] = batch if len(batch) > 1 else batch[0]
    return jax.lax.with_sharding_constraint(x, P(*spec))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data' (and 'dcn' if present)."""
    if "dcn" in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn", "data")))
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def _leaf_spec(leaf: Any) -> P:
    if isinstance(leaf, flax_meta.Partitioned):
        return P(*leaf.names)
    return P()


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a train state / variable tree.

    Parameters annotated with nn.with_partitioning keep their axes (mapped
    onto the mesh's 'model' axis); everything else — optimizer moments for
    unannotated params, batch stats, step counters — is replicated.

    Note: flax boxes annotated params as meta.Partitioned, which is itself a
    pytree node; tree_map with is_leaf picks the box so the annotation is
    visible here, and the returned tree matches the *unboxed* leaf layout.
    """
    def to_sharding(leaf):
        return NamedSharding(mesh, _leaf_spec(leaf))

    return jax.tree_util.tree_map(
        to_sharding, state,
        is_leaf=lambda x: isinstance(x, flax_meta.Partitioned))


def zero2_spec(shape, n_data: int) -> P:
    """PartitionSpec sharding the first 'data'-divisible axis of an
    optimizer-moment tensor (ZeRO-2: each data rank owns 1/N of the Adam
    mu/nu state; the reference configures exactly this through its
    DeepSpeed ZeRO-2 plugin, run_ted.py:110-112)."""
    for ax, d in enumerate(shape):
        if d >= n_data and d % n_data == 0:
            return P(*([None] * ax), "data")
    return P()


def shard_opt_state(opt_state: Any, mesh: Mesh) -> Any:
    """Place optimizer state with moments sharded over the 'data' axis."""
    n_data = mesh.shape["data"]

    def place(leaf):
        import numpy as _np
        shape = _np.shape(leaf)
        return jax.device_put(
            leaf, NamedSharding(mesh, zero2_spec(shape, n_data)))

    return jax.tree_util.tree_map(place, opt_state)


def shard_state(state: Any, mesh: Mesh, zero2: bool = False) -> Any:
    """Place a state tree on the mesh per its annotations.

    zero2=True additionally shards the optimizer moments over the 'data'
    axis (the ZeRO-2 analog): parameters stay replicated, gradients are
    all-reduced by XLA as usual, and each data rank stores + updates a
    1/N slice of the Adam state; XLA inserts the update all-gather."""
    def place(leaf):
        if isinstance(leaf, flax_meta.Partitioned):
            sh = NamedSharding(mesh, P(*leaf.names))
            return leaf.replace_boxed(jax.device_put(leaf.unbox(), sh))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    placed = jax.tree_util.tree_map(
        place, state,
        is_leaf=lambda x: isinstance(x, flax_meta.Partitioned))
    if zero2 and mesh.shape["data"] > 1:
        for field in ("opt_state", "gen_opt_state", "dis_opt_state"):
            if hasattr(placed, field):
                placed = placed.replace(**{
                    field: shard_opt_state(getattr(placed, field), mesh)})
    return placed
