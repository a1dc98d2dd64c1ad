"""Verify drive (real TPU): batched admission in the continuous batcher.

Correctness: engine results (batched admission) == per-request generate.
Perf: batched vs serial admission wall-clock on a decode-light workload
(long prompts, short outputs — the OV-extraction shape where prefill
dominates). Run from /root/repo.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from mertools_tpu.mllm.generate import generate
from mertools_tpu.mllm.llm import LLM, LLMConfig
from mertools_tpu.mllm.serve import ContinuousBatcher

cfg = LLMConfig(vocab_size=4096, hidden_size=1024, num_layers=8,
                num_heads=8, num_kv_heads=8, intermediate_size=2816)
model = LLM(cfg)


def both(mdl, embeds, ids):
    mdl.embed(ids)
    return mdl(embeds)


params = model.init(jax.random.PRNGKey(0),
                    np.zeros((1, 4, cfg.hidden_size), np.float32),
                    np.zeros((1, 1), np.int32), method=both)["params"]
params = jax.device_put(jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params))
eos = 2
rng = np.random.default_rng(0)

N = 32
lens = rng.integers(180, 250, size=N)
prompts = [rng.normal(size=(int(n), cfg.hidden_size)).astype(np.float32) * 0.02
           for n in lens]

# correctness on a small subset vs generate
eng = ContinuousBatcher(cfg, params, n_slots=8, max_len=512,
                        eos_token_id=eos, max_new_tokens=8,
                        prefill_buckets=(64, 128, 256))
rids = [eng.submit(p) for p in prompts[:8]]
out = eng.run()
for rid, p in zip(rids, prompts[:8]):
    ref = np.asarray(generate(cfg, params, jnp.asarray(p[None]),
                              jnp.ones((1, len(p)), jnp.int32),
                              max_new_tokens=8, eos_token_id=eos))[0]
    stop = np.nonzero(ref == eos)[0]
    ref = ref[: stop[0]].tolist() if len(stop) else ref.tolist()
    assert out[rid] == ref, (rid, out[rid], ref)
print("correctness: engine == generate on 8/8 requests")


def run_mode(admit_batched, reps=2):
    best = float("inf")
    for _ in range(reps):
        eng = ContinuousBatcher(cfg, params, n_slots=8, max_len=512,
                                eos_token_id=eos, max_new_tokens=8,
                                prefill_buckets=(64, 128, 256),
                                admit_batched=admit_batched)
        for p in prompts:
            eng.submit(p)
        t0 = time.time()
        res = eng.run()
        dt = time.time() - t0
        assert len(res) == N
        best = min(best, dt)
    return best


# warm both modes' compiles first
run_mode(True, reps=1)
run_mode(False, reps=1)
tb = run_mode(True)
ts = run_mode(False)
print(f"batched admission: {tb:.2f}s  serial admission: {ts:.2f}s  "
      f"speedup {ts / tb:.2f}x  ({N} reqs, ~200-tok prompts, 8 new tokens)")
print("OK")
