"""jax.sharding mesh utilities: data/tensor-parallel placement."""

from hop_tpu.parallel.mesh import (  # noqa: F401
    ambient_mesh, constrain_batch, create_mesh, batch_sharding,
    state_shardings, shard_batch, shard_state, shard_opt_state, zero2_spec)
