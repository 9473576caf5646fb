#!/usr/bin/env python3
"""Dump the compiled headline-step HLO + XLA cost analysis.

Writes the optimized HLO text to /tmp/bench_step_hlo.txt and prints the
FLOP count and bytes-accessed from XLA's cost model — the inputs to the
bench's MFU figure.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    import bench

    state, raw_step = bench.build(mixed16=True)
    step = jax.jit(raw_step, donate_argnums=(0,))
    x = jax.random.uniform(
        jax.random.PRNGKey(3), (bench.BATCH, bench.FULL_RES, bench.FULL_RES, 3),
        minval=-1, maxval=1,
    )
    alpha = jnp.float32(0.0)
    key = jax.random.PRNGKey(10)

    lowered = step.lower(state, x, alpha, key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    for k in sorted(cost):
        if k in ("flops", "bytes accessed", "transcendentals", "optimal_seconds") or "bytes" in k:
            print(f"{k}: {cost[k]:.4g}")

    txt = compiled.as_text()
    out = "/tmp/bench_step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"HLO -> {out} ({len(txt)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
