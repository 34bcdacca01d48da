"""Profile the PoNet encoder forward at (B=8, L=4096); print device ops."""

import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.ponet import PoNetEncoder

B, L = 8, 4096
cfg = EncoderConfig(
    vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
    intermediate_size=3072, max_position_embeddings=L, add_pooler=False,
)
model = PoNetEncoder(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(1000, 30000, (B, L)).astype(np.int32))
mask = jnp.ones((B, L), jnp.int32)
segs = jnp.asarray(np.minimum(np.arange(L) // 64, 255)[None].repeat(B, 0).astype(np.int32))
params = model.init(jax.random.PRNGKey(0), ids, attention_mask=mask,
                    segment_ids=segs, deterministic=True)["params"]


@jax.jit
def fwd(params, ids, mask, segs):
    def body(i, c):
        out = model.apply({"params": params}, ids, attention_mask=mask,
                          segment_ids=segs, deterministic=True)
        return c + out.last_hidden_state[0, 0, 0].astype(jnp.float32)
    return jax.lax.fori_loop(0, 4, body, 0.0)


_ = float(fwd(params, ids, mask, segs))
with jax.profiler.trace("/tmp/prof_ponet"):
    _ = float(fwd(params, ids, mask, segs))
time.sleep(2)

paths = sorted(glob.glob("/tmp/prof_ponet/**/*.trace.json.gz", recursive=True))
print("trace:", paths[-1] if paths else None)
with gzip.open(paths[-1], "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
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
        agg[name][1] += e.get("dur", 0) / 1e3
tot = sum(v[1] for v in agg.values())
print(f"total device time: {tot:.1f} ms over {len(agg)} op kinds (4 forwards)")
for name, (cnt, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:25]:
    print(f"{dur:8.2f} ms  x{cnt:4d}  {name[:110]}")
