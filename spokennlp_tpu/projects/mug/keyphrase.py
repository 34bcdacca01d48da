"""MUG Track 4: keyphrase extraction via BERT-CRF BIO tagging.

The reference delegates this track to the external AdaSeq Bert-CRF recipe
(reference: alimeeting4mug/src/keyphrase_extraction/README.md:13-23). This
module provides the equivalent natively: Encoder emissions -> linear-chain
CRF (ops/crf.py) over BIO tags -> span decoding -> frequency-ranked
keyphrase list for the @10/@15/@20 challenge metric.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spokennlp_tpu.configs import EncoderConfig
from spokennlp_tpu.models.encoder import Encoder
from spokennlp_tpu.ops.crf import crf_log_likelihood, crf_viterbi_decode

Array = jax.Array

TAG_O, TAG_B, TAG_I = 0, 1, 2
NUM_TAGS = 3


class BertCrfTagger(nn.Module):
    """Encoder + emission head + CRF transition matrix."""

    enc_cfg: EncoderConfig
    num_tags: int = NUM_TAGS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Array,
        tags: Array = None,
        deterministic: bool = True,
    ):
        out = Encoder(self.enc_cfg, dtype=self.dtype, name="encoder")(
            input_ids, attention_mask=attention_mask, deterministic=deterministic
        )
        emissions = nn.Dense(self.num_tags, dtype=jnp.float32, name="emissions")(
            out.last_hidden_state
        )
        transitions = self.param(
            "transitions", nn.initializers.zeros, (self.num_tags, self.num_tags)
        )
        result = {"emissions": emissions, "transitions": transitions}
        if tags is not None:
            result["loss"] = -crf_log_likelihood(
                emissions, tags, attention_mask, transitions
            )
        return result


def decode_tags(model, params, input_ids, attention_mask) -> np.ndarray:
    out = model.apply(
        {"params": params},
        jnp.asarray(input_ids),
        jnp.asarray(attention_mask),
        deterministic=True,
    )
    tags, _ = crf_viterbi_decode(
        out["emissions"], jnp.asarray(attention_mask), out["transitions"]
    )
    return np.asarray(tags)


def spans_from_bio(tags: Sequence[int], mask: Sequence[int]) -> List[Tuple[int, int]]:
    """BIO tag sequence -> [start, end) spans."""
    spans = []
    start = None
    for i, (t, m) in enumerate(zip(tags, mask)):
        if not m:
            break
        if t == TAG_B:
            if start is not None:
                spans.append((start, i))
            start = i
        elif t == TAG_I:
            if start is None:
                start = i  # tolerate I without B
        else:
            if start is not None:
                spans.append((start, i))
                start = None
    if start is not None:
        spans.append((start, int(np.sum(mask))))
    return spans


def bio_tags_from_keyphrases(
    tokens: Sequence[str], keyphrases: Sequence[Sequence[str]]
) -> List[int]:
    """Label token sequence with BIO tags via exact sub-sequence match."""
    tags = [TAG_O] * len(tokens)
    for kp in keyphrases:
        k = len(kp)
        if k == 0:
            continue
        for i in range(len(tokens) - k + 1):
            if tokens[i : i + k] == list(kp):
                tags[i] = TAG_B
                for j in range(i + 1, i + k):
                    tags[j] = TAG_I
    return tags


def extract_keyphrases(
    token_lists: Sequence[Sequence[str]],
    tag_lists: Sequence[Sequence[int]],
    mask_lists: Sequence[Sequence[int]],
    top_k: int = 20,
) -> List[str]:
    """Collect tagged spans across a meeting and rank by frequency
    (the AdaSeq recipe's aggregation for the @k metric)."""
    counter: collections.Counter = collections.Counter()
    for tokens, tags, mask in zip(token_lists, tag_lists, mask_lists):
        for s, e in spans_from_bio(tags, mask):
            phrase = "".join(tokens[s:e])
            if phrase:
                counter[phrase] += 1
    return [p for p, _ in counter.most_common(top_k)]
