"""User-facing scan engine vs bench.py on the same workload (BERT-base W8A8,
24 x 128 x 512 windows): wall-clock windows/s including H2D, D2H and host
aggregation. VERDICT round-2 weak #7: engine must reach >=95% of bench."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.configs import EncoderConfig, TopicSegConfig
from spokennlp_tpu.models.topic_seg import TopicSegModel
from spokennlp_tpu.data import windowing as W
from spokennlp_tpu.eval.inference import predict_windows_scanned

B, L, NB, K = 128, 512, 24, 64
N = B * NB
enc = EncoderConfig(
    vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
    intermediate_size=3072, max_position_embeddings=L, add_pooler=False,
    attention_impl="auto", softmax_in_compute_dtype=True, quantize="w8a8",
)
model = TopicSegModel(enc, TopicSegConfig(), dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
params = model.init(
    jax.random.PRNGKey(0), jnp.ones((B, L), jnp.int32),
    attention_mask=jnp.ones((B, L), jnp.int32), deterministic=True,
)["params"]

# synthetic stacked windows mimicking the real featurizer's output shapes
batch = {
    "input_ids": rng.integers(1000, 30000, size=(N, L)).astype(np.int32),
    "attention_mask": np.ones((N, L), np.int32),
    "token_type_ids": np.zeros((N, L), np.int32),
    "labels": np.full((N, L), -100, np.int32),
    "sent_positions": np.sort(
        rng.integers(1, L, size=(N, K)).astype(np.int32), axis=1
    ),
    "sent_labels": rng.integers(0, 2, size=(N, K)).astype(np.int32),
    "example_id": np.arange(N, dtype=np.int32) // 48,
}

for gather in (False, True):
    # warmup/compile
    _ = predict_windows_scanned(model, params, batch, B, gather_sents=gather)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        scores = predict_windows_scanned(
            model, params, batch, B, gather_sents=gather
        )
        if gather:
            per_doc = W.aggregate_gathered_predictions(
                batch["example_id"], batch["sent_labels"], scores
            )
        else:
            per_doc = W.aggregate_window_predictions(
                batch["example_id"], batch["labels"], scores
            )
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"gather_sents={gather}: {N / best:.1f} windows/s "
        f"(best {best*1e3:.0f} ms, times {[f'{t*1e3:.0f}' for t in times]})",
        flush=True,
    )
