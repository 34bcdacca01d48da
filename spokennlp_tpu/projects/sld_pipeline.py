"""SLD host-side pipeline: manifests, k-means quantization, speech-token BPE.

Rebuilds the reference's 8-stage shell pipeline (reference: sld/run.sh:
51-280) as library functions:

  stage 1  audio manifests (fairseq wav2vec style tsv)        -> make_manifest
  stage 2  frozen-encoder feature dumping (WavLM layer-k)     -> dump_features
           (host-side, via the installed transformers torch WavLM; the
           TPU-native training path consumes only the discrete tokens)
  stage 3  MiniBatchKMeans over sampled features              -> learn_kmeans
  stage 4  nearest-centroid speech tokens                     -> apply_kmeans
  stage 6  subword vocab over space-joined speech tokens      -> train_bpe
           (sentencepiece is not in this image; a standard BPE trainer over
           whitespace-separated symbols replaces it)
"""

from __future__ import annotations

import collections
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np


# ------------------------------------------------------------------ manifests


def make_manifest(
    root: str, ext: str = "flac", valid_percent: float = 0.01, seed: int = 42
) -> Dict[str, List[str]]:
    """Walk ``root`` for audio files -> {"train": [...], "valid": [...]} tsv
    lines "relpath\tnum_frames" with the root dir as line 0 (fairseq
    wav2vec_manifest format; reference: fairseq/examples/wav2vec/
    wav2vec_manifest.py)."""
    rng = np.random.default_rng(seed)
    rows = []
    for dirpath, _, files in sorted(os.walk(root)):
        for fname in sorted(files):
            if fname.endswith("." + ext):
                path = os.path.relpath(os.path.join(dirpath, fname), root)
                rows.append(f"{path}\t0")
    train, valid = [root], [root]
    for r in rows:
        (valid if rng.random() < valid_percent else train).append(r)
    return {"train": train, "valid": valid}


# -------------------------------------------------------------------- kmeans


def learn_kmeans(
    features: np.ndarray,
    n_clusters: int = 2000,
    seed: int = 0,
    batch_size: int = 10000,
    max_iter: int = 100,
    percent: float = 1.0,
):
    """MiniBatchKMeans over (optionally sampled) features
    (reference: simple_kmeans/learn_kmeans.py:25-112)."""
    from sklearn.cluster import MiniBatchKMeans

    if percent < 1.0:
        rng = np.random.default_rng(seed)
        n = int(len(features) * percent)
        idx = rng.choice(len(features), size=n, replace=False)
        features = features[idx]
    km = MiniBatchKMeans(
        n_clusters=n_clusters,
        random_state=seed,
        batch_size=batch_size,
        max_iter=max_iter,
        n_init="auto",
        compute_labels=False,
    )
    km.fit(features)
    return km


def apply_kmeans(km, features: np.ndarray) -> np.ndarray:
    """Nearest-centroid tokens (reference: dump_km.py). Vectorized
    ||x - c||^2 = |x|^2 - 2 x.c + |c|^2 argmin."""
    C = km.cluster_centers_.astype(np.float32)
    x = features.astype(np.float32)
    d = (
        (x**2).sum(-1, keepdims=True)
        - 2.0 * x @ C.T
        + (C**2).sum(-1)[None, :]
    )
    return np.argmin(d, axis=-1)


def speed_perturb(waveform: np.ndarray, factor: float) -> np.ndarray:
    """Speed perturbation by resampling (reference: sld/run.sh:106-118 dumps
    features at speeds 0.9/1.0/1.1 via torchaudio Resample).

    factor > 1 speeds up (shorter output), < 1 slows down. Band-limited
    linear interpolation over the time axis — adequate for the k-means
    feature path, no torch dependency.
    """
    if factor == 1.0:
        return np.asarray(waveform)
    w = np.asarray(waveform, np.float32)
    n = w.shape[-1]
    m = max(int(round(n / factor)), 1)
    src = np.linspace(0.0, n - 1, m)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n - 1)
    frac = (src - lo).astype(np.float32)
    return w[..., lo] * (1.0 - frac) + w[..., hi] * frac


def dedupe_runs(tokens: Sequence[int]) -> List[int]:
    """Collapse consecutive repeats (speech-token convention)."""
    out: List[int] = []
    for t in tokens:
        if not out or out[-1] != t:
            out.append(int(t))
    return out


# ---------------------------------------------------------------------- BPE


def train_bpe(
    corpus_lines: Iterable[str], vocab_size: int = 6000
) -> List[Tuple[str, str]]:
    """Byte-pair-encoding merges over whitespace-separated symbol sequences.

    Operates at the line level (a line = one utterance of space-joined speech
    tokens). Returns the ordered merge list.
    """
    seqs = [tuple(line.split()) for line in corpus_lines if line.strip()]
    base_vocab = {s for seq in seqs for s in seq}
    merges: List[Tuple[str, str]] = []
    counts = collections.Counter(seqs)

    while len(base_vocab) + len(merges) < vocab_size:
        pair_counts: collections.Counter = collections.Counter()
        for seq, c in counts.items():
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        (a, b), freq = pair_counts.most_common(1)[0]
        if freq < 2:
            break
        merges.append((a, b))
        merged = a + "▁" + b  # joiner marker
        new_counts: collections.Counter = collections.Counter()
        for seq, c in counts.items():
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_counts[tuple(out)] += c
        counts = new_counts
    return merges


def bpe_encode(tokens: Sequence[str], merges: Sequence[Tuple[str, str]]) -> List[str]:
    """Apply merges greedily in training order."""
    seq = list(tokens)
    rank = {pair: i for i, pair in enumerate(merges)}
    while len(seq) > 1:
        best = None
        best_rank = None
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = rank.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        a, b = seq[best], seq[best + 1]
        seq[best : best + 2] = [a + "▁" + b]
    return seq


# ------------------------------------------------------- feature extraction


def dump_wavlm_features(
    wav_arrays: Sequence[np.ndarray],
    layer: int = 23,
    model_name: str = "microsoft/wavlm-large",
    device: str = "tpu",
    max_chunk: int = 1_600_000,
) -> List[np.ndarray]:
    """Frozen WavLM layer-k features (reference: simple_kmeans/
    dump_wavlm_feature.py:38-112).

    device="tpu" (default) runs the Flax WavLM (models/wavlm.py,
    weight-converted from the HF checkpoint, parity-tested) through JAX —
    the reference fans this stage out over GPUs; here one jitted program
    streams max_chunk windows per utterance. device="torch" keeps the
    host-torch fallback. Either way the checkpoint must be locally staged
    (zero-egress environment)."""
    if device == "torch":
        import torch
        from transformers import WavLMModel as HFWavLM

        model = HFWavLM.from_pretrained(model_name).to("cpu").eval()
        feats = []
        with torch.no_grad():
            for wav in wav_arrays:
                x = torch.tensor(wav, dtype=torch.float32)[None, :]
                chunks = []
                for start in range(0, x.shape[1], max_chunk):
                    out = model(
                        x[:, start : start + max_chunk], output_hidden_states=True
                    )
                    chunks.append(out.hidden_states[layer][0].cpu().numpy())
                feats.append(np.concatenate(chunks, axis=0))
        return feats

    from transformers import WavLMModel as HFWavLM

    from spokennlp_tpu.models.wavlm import (
        WavLMModel,
        extract_wavlm_features,
        hf_wavlm_config_to_config,
        hf_wavlm_to_params,
    )

    hf = HFWavLM.from_pretrained(model_name)
    cfg = hf_wavlm_config_to_config(hf.config)
    params = hf_wavlm_to_params(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, cfg
    )
    del hf
    model = WavLMModel(cfg)
    return [
        extract_wavlm_features(
            model, params, np.asarray(wav, np.float32)[None, :], layer,
            chunk_samples=max_chunk,
        )[0]
        for wav in wav_arrays
    ]
