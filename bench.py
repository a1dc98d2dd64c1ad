"""Benchmark entry point (driver contract: prints ONE JSON line).

Current benchmark: fusion-training throughput (samples/sec) of the fully
jitted epoch-scan trainer on one chip, vs a simulated reference execution
model (per-batch dispatch with host->device transfer each step, which is how
``MERBench/main-release.py:31-66`` executes). As the encoder stack lands this
will switch to the BASELINE.json north-star metric (feature-extraction
clips/sec/chip).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mertools_tpu.core.config import Args
    from mertools_tpu.data.dataset import epoch_plan
    from mertools_tpu.models import get_model
    from mertools_tpu.train.loop import create_state, train_epoch_jit

    n, batch_size, epochs = 4096, 32, 10
    rng = np.random.default_rng(0)
    data_np = {
        "audios": rng.normal(size=(n, 1024)).astype(np.float32),
        "texts": rng.normal(size=(n, 768)).astype(np.float32),
        "videos": rng.normal(size=(n, 768)).astype(np.float32),
        "emos": rng.integers(0, 6, size=n).astype(np.int32),
        "vals": rng.normal(size=n).astype(np.float32),
    }
    args = Args(model="attention", hidden_dim=256, dropout=0.3, feat_type="utt",
                output_dim1=6, output_dim2=1)
    model = get_model(args)
    idx0, _ = epoch_plan(np.arange(n), batch_size)
    sample = {k: v[idx0[0]] for k, v in data_np.items()}
    state = create_state(model, sample, jax.random.PRNGKey(0), lr=1e-3)
    data = {k: jnp.asarray(v) for k, v in data_np.items()}

    # --- ours: one jitted scan per epoch, data resident in HBM ---
    rng_np = np.random.default_rng(1)
    def one_epoch(state, seed):
        idx, mask = epoch_plan(np.arange(n), batch_size, rng_np)
        return train_epoch_jit(state, data, jnp.asarray(idx), jnp.asarray(mask),
                               jax.random.PRNGKey(seed), True, True)

    state, *_ = one_epoch(state, 0)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for e in range(epochs):
        state, losses, _, _ = one_epoch(state, e + 1)
    jax.block_until_ready(state.params)
    ours = n * epochs / (time.perf_counter() - t0)

    # --- reference execution model: per-batch host slice + device_put + step ---
    from functools import partial

    @partial(jax.jit, donate_argnames=("st",))
    def one_step(st, batch, mask, key):
        from mertools_tpu.train.loop import _compute_loss

        def loss_fn(p):
            return _compute_loss(st.apply_fn, p, batch, mask, key, True, True, True)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        return st.apply_gradients(grads=grads), loss

    state2 = create_state(model, sample, jax.random.PRNGKey(0), lr=1e-3)
    idx, mask = epoch_plan(np.arange(n), batch_size)
    b0 = {k: v[idx[0]] for k, v in data_np.items()}
    state2, _ = one_step(state2, b0, mask[0], jax.random.PRNGKey(0))  # compile
    jax.block_until_ready(state2.params)
    t0 = time.perf_counter()
    steps = 0
    for e in range(2):
        idx, mask = epoch_plan(np.arange(n), batch_size, rng_np)
        for i in range(idx.shape[0]):
            batch = {k: jax.device_put(v[idx[i]]) for k, v in data_np.items()}
            state2, _ = one_step(state2, batch, mask[i], jax.random.PRNGKey(steps))
            steps += 1
    jax.block_until_ready(state2.params)
    ref = steps * batch_size / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "fusion_train_samples_per_sec",
        "value": round(ours, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(ours / ref, 2),
    }))


if __name__ == "__main__":
    main()
