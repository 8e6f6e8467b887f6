"""Microbench: v2 time-grid GRU (projections in XLA) vs v3 fully-fused
GRU (projections in-kernel) at the HOP head shape, fwd and fwd+bwd.

Run on the real TPU:  python benchmarks/bench_gru_kernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hop_tpu.ops.gru import GRU

# IN=992 is the real HOP head gru_input_size (reference model/HOP.py:148)
# so layer 0 exercises the large-I weight-staging path; layers 1-3 see
# I=2H=700. (Earlier rounds benched IN=434; v3 numbers at that shape:
# fwd 1.06 / fwd+bwd 3.93 ms.)
B, T, IN, H, LAYERS = 256, 34, 992, 350, 4


def timed(step, v, x, iters=50):
    """Device ms/iter through the axon relay: chain `iters` data-dependent
    applications of `step(v, x) -> scalar` inside ONE jit and fetch one
    scalar (block_until_ready returns at dispatch here, and single-digit
    -ms kernels drown in the ~30 ms fetch round-trip, so per-iteration
    host timing is hopeless). Two chain lengths subtract the constant
    dispatch/fetch overhead."""
    def chain(n):
        @jax.jit
        def f(v, x):
            def body(i, acc):
                # 0-valued data dependency serialises the iterations
                return acc + step(v, x + acc * 0.0)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return f

    f_long, f_short = chain(iters), chain(iters // 5)
    float(f_long(v, x)), float(f_short(v, x))   # warm compiles

    def best(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(v, x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(f_long) - best(f_short)) / (iters - iters // 5) * 1e3


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, IN)).astype(np.float32))
    gru = GRU(hidden_size=H, num_layers=LAYERS, bidirectional=True,
              dropout_rate=0.0)

    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else \
        ["0", "1", "fused"]
    results = {}
    for mode in modes:
        os.environ["HOP_TPU_PALLAS_GRU"] = mode
        variables = gru.init(jax.random.PRNGKey(0), x)

        def fwd(v, x):
            return jnp.sum(gru.apply(v, x)[0])

        def fwdbwd(v, x):
            def loss(v):
                return jnp.sum(gru.apply(v, x)[0] ** 2)
            g = jax.grad(loss)(v)
            return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(g))

        f = timed(fwd, variables, x)
        fb = timed(fwdbwd, variables, x)
        results[mode] = (f, fb)
        print(f"mode={mode:6s}  fwd {f:7.2f} ms   fwd+bwd {fb:7.2f} ms")

    # numeric check: fused vs scan on the same params (TPU numerics)
    os.environ["HOP_TPU_PALLAS_GRU"] = "0"
    v0 = gru.init(jax.random.PRNGKey(0), x)
    y_scan = jax.jit(lambda v, x: gru.apply(v, x)[0])(v0, x)
    os.environ["HOP_TPU_PALLAS_GRU"] = "fused"
    y_fused = jax.jit(lambda v, x: gru.apply(v, x)[0])(v0, x)
    err = float(jnp.max(jnp.abs(y_scan - y_fused)))
    print(f"max |scan - fused| on TPU: {err:.3e}")


if __name__ == "__main__":
    main()
