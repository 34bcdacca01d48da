"""Profile one bench-style forward; print device-side op durations."""

import glob
import gzip
import json
import time
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
from spokennlp_tpu.models.topic_seg import TopicSegModel

enc = EncoderConfig(
    vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
    intermediate_size=3072, max_position_embeddings=512, add_pooler=False,
    attention_impl="fused", softmax_in_compute_dtype=True, quantize="w8a8",
)
model = TopicSegModel(enc, TopicSegConfig(), dtype=jnp.bfloat16)
B, L = 128, 512
rng = np.random.default_rng(0)
params = model.init(jax.random.PRNGKey(0), jnp.ones((B, L), jnp.int32),
                    attention_mask=jnp.ones((B, L), jnp.int32), deterministic=True)["params"]
ids = jnp.asarray(rng.integers(1000, 30000, (B, L)).astype(np.int32))
mask = jnp.ones((B, L), jnp.int32)


@jax.jit
def fwd(params, ids, mask):
    def body(i, c):
        out = model.apply({"params": params}, ids, attention_mask=mask, deterministic=True)
        return c + jnp.argmax(out["token_logits"], -1).astype(jnp.int32).sum()
    return jax.lax.fori_loop(0, 4, body, jnp.zeros((), jnp.int32))


_ = int(fwd(params, ids, mask))  # compile
with jax.profiler.trace("/tmp/prof"):
    _ = int(fwd(params, ids, mask))
time.sleep(2)

paths = sorted(glob.glob("/tmp/prof/**/*.trace.json.gz", recursive=True))
print("trace files:", paths[-1] if paths else None)
with gzip.open(paths[-1], "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
# find TPU device pid
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
dev_pids = [p for p, n in pids.items() if "TPU" in n and "pjrt" not in n.lower()]
agg = {}
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        name = e.get("name", "")
        agg.setdefault(name, [0, 0.0])
        agg[name][0] += 1
        agg[name][1] += e.get("dur", 0) / 1e3  # ms
tot = sum(v[1] for v in agg.values())
print(f"total device time: {tot:.1f} ms over {len(agg)} op kinds (4 forwards)")
for name, (cnt, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:25]:
    print(f"{dur:8.2f} ms  x{cnt:4d}  {name[:110]}")
