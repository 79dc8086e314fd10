"""Benchmark entry: prints ONE JSON line for the driver.

Current headline metric (until the SlowFast feature-extraction path
lands): SRL train-step throughput on the attached accelerator.
``vs_baseline`` is 0.0 — the reference repo publishes no in-repo
throughput numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time


def bench_srl_train(bs: int = 32, iters: int = 20) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _setup

    cfg, model, variables, batch = _setup(bs=bs)
    optimizer = optax.adam(1e-4, b1=0.9, b2=0.99)
    params = variables["params"]
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            return model.apply({"params": p}, batch)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    # warmup + compile
    params, opt_state, loss = step(params, opt_state, dev_batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, dev_batch)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    sps = bs * iters / dt
    return {
        "metric": "srl_train_throughput",
        "value": round(sps, 2),
        "unit": "samples/sec",
        "vs_baseline": 0.0,
    }


if __name__ == "__main__":
    print(json.dumps(bench_srl_train()))
