"""Dump per-layer token feature vectors from an encoder checkpoint.

Counterpart of the reference's vendored BERT feature extractor
(action-item-detection/script/extract_features.py:319-412): reads a text
file (one example per line, ``text_a ||| text_b`` for pairs), runs the
trunk with all hidden states, and writes the same JSONL schema —
``{"linex_index": i, "features": [{"token": t, "layers": [{"index": -1,
"values": [...]}, ...]}, ...]}`` — so downstream consumers of the
reference's dumps work unchanged.

TPU-native shape: one jitted forward at a static (batch, seq) shape per
call instead of a TPUEstimator input pipeline; padding rows are dropped on
the host when writing.
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import List, Optional, Tuple

import numpy as np


def read_examples(path: str) -> List[Tuple[str, Optional[str]]]:
    """Reference read_examples (extract_features.py:319-340): ``a ||| b``."""
    examples = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            m = re.match(r"^(.*) \|\|\| (.*)$", line)
            if m is None:
                examples.append((line, None))
            else:
                examples.append((m.group(1), m.group(2)))
    return examples


def truncate_seq_pair(tokens_a: List[str], tokens_b: List[str], max_length: int):
    """Pop from the longer side (extract_features.py:302-316)."""
    while len(tokens_a) + len(tokens_b) > max_length:
        if len(tokens_a) > len(tokens_b):
            tokens_a.pop()
        else:
            tokens_b.pop()


def convert_example(
    text_a: str,
    text_b: Optional[str],
    tokenize,
    to_ids,
    seq_length: int,
    cls: str = "[CLS]",
    sep: str = "[SEP]",
):
    """-> (tokens, input_ids, input_mask, type_ids), reference :210-299."""
    tokens_a = tokenize(text_a)
    tokens_b = tokenize(text_b) if text_b else None
    if tokens_b is not None:
        truncate_seq_pair(tokens_a, tokens_b, seq_length - 3)
    else:
        tokens_a = tokens_a[: seq_length - 2]
    tokens = [cls] + tokens_a + [sep]
    type_ids = [0] * len(tokens)
    if tokens_b is not None:
        tokens += tokens_b + [sep]
        type_ids += [1] * (len(tokens_b) + 1)
    ids = to_ids(tokens)
    mask = [1] * len(ids)
    pad = seq_length - len(ids)
    return tokens, ids + [0] * pad, mask + [0] * pad, type_ids + [0] * pad


def _resolve_string_tokenizer(args):
    """(tokenize -> List[str], to_ids -> List[int]) with token strings kept
    (the JSONL schema emits per-token text, so id-only tokenizers don't do)."""
    if args.model_name_or_path and os.path.isdir(args.model_name_or_path):
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model_name_or_path)
            return tok.tokenize, tok.convert_tokens_to_ids
        except Exception:
            pass
    if args.vocab_file:
        from spokennlp_tpu.utils.tokenization import FullTokenizer

        tok = FullTokenizer.from_vocab_file(args.vocab_file)
        return tok.tokenize, tok.convert_tokens_to_ids
    # hash fallback (smoke tests without vocab assets): whitespace tokens
    V = 30522

    def tokenize(s: str) -> List[str]:
        return s.split()

    def to_ids(tokens: List[str]) -> List[int]:
        return [hash(t) % (V - 10) + 10 for t in tokens]

    return tokenize, to_ids


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_file", required=True)
    p.add_argument("--output_file", required=True)
    p.add_argument("--layers", default="-1,-2,-3,-4",
                   help="comma-separated encoder-layer indices (-1 = last)")
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--model_name_or_path", default=None)
    p.add_argument("--vocab_file", default=None)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_hidden_layers", type=int, default=12)
    p.add_argument("--num_attention_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from spokennlp_tpu.cli import common
    from spokennlp_tpu.configs import EncoderConfig
    from spokennlp_tpu.models.encoder import Encoder

    layer_indexes = [int(x) for x in args.layers.split(",")]
    tokenize, to_ids = _resolve_string_tokenizer(args)

    enc_cfg = EncoderConfig(
        vocab_size=30522,
        hidden_size=args.hidden_size,
        num_layers=args.num_hidden_layers,
        num_heads=args.num_attention_heads,
        intermediate_size=args.intermediate_size,
        add_pooler=False,
    )
    loaded = common.maybe_load_pretrained(args, enc_cfg)
    if loaded is not None:
        import dataclasses

        enc_cfg, params = loaded
        if "encoder" in params:  # full task checkpoint: use its trunk
            params = params["encoder"]
        params = dict(params)
        params.pop("pooler", None)  # feature dump never touches the pooler
        enc_cfg = dataclasses.replace(enc_cfg, add_pooler=False)
    else:
        params = None

    model = Encoder(
        enc_cfg, dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    )
    B, L = args.batch_size, args.max_seq_length
    if params is None:
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((B, L), jnp.int32),
            attention_mask=jnp.ones((B, L), jnp.int32),
        )["params"]

    @jax.jit
    def forward(params, input_ids, mask, type_ids):
        out = model.apply(
            {"params": params},
            input_ids,
            attention_mask=mask,
            token_type_ids=type_ids,
            output_hidden_states=True,
        )
        # hidden_states[0] is the embedding output; encoder layers follow
        # (reference indexes model.get_all_encoder_layers(), layers only)
        layers = jnp.stack(out.hidden_states[1:], axis=0)  # (NL, B, L, H)
        return layers

    examples = read_examples(args.input_file)
    feats = [
        convert_example(a, b, tokenize, to_ids, L) for a, b in examples
    ]

    os.makedirs(os.path.dirname(os.path.abspath(args.output_file)), exist_ok=True)
    with open(args.output_file, "w", encoding="utf-8") as writer:
        for start in range(0, len(feats), B):
            chunk = feats[start : start + B]
            pad_n = B - len(chunk)
            ids = np.array([c[1] for c in chunk] + [[0] * L] * pad_n, np.int32)
            mask = np.array([c[2] for c in chunk] + [[0] * L] * pad_n, np.int32)
            types = np.array([c[3] for c in chunk] + [[0] * L] * pad_n, np.int32)
            layers = np.asarray(
                forward(params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types)),
                dtype=np.float32,
            )
            for bi, (tokens, _, _, _) in enumerate(chunk):
                all_features = []
                for ti, token in enumerate(tokens):
                    all_layers = [
                        {
                            "index": li,
                            "values": [
                                round(float(x), 6) for x in layers[li, bi, ti]
                            ],
                        }
                        for li in layer_indexes
                    ]
                    all_features.append({"token": token, "layers": all_layers})
                writer.write(
                    json.dumps(
                        {"linex_index": start + bi, "features": all_features},
                        ensure_ascii=False,
                    )
                    + "\n"
                )
    print(f"wrote {len(feats)} examples to {args.output_file}")
    return len(feats)


if __name__ == "__main__":
    main()
