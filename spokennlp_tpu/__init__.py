"""spokennlp_tpu — a TPU-native (JAX/Flax/Pallas) spoken-language-NLP framework.

A from-scratch rebuild of the capabilities of alibaba-damo-academy/SpokenNLP
(reference mounted at /root/reference) as ONE framework instead of seven
research scripts:

- ``models``      — encoder zoo (BERT/ELECTRA/Longformer/PoNet/GPT-2) as Flax
                    modules with a shared trunk and pluggable token mixers.
- ``ops``         — TPU compute primitives: masked losses, segment pooling,
                    sliding-window attention (XLA reference + Pallas kernels).
- ``objectives``  — task losses: topic-segmentation CE/focal, CSSL contrastive,
                    TSSP sentence-pair objectives, smoothed-label KL (SLD).
- ``data``        — host-side featurizers: sentence windowing, topic-level data
                    augmentation, corpus adapters (pure, unit-testable).
- ``parallel``    — mesh construction and sharding rules (dp/tp axes).
- ``train``       — jitted train-step factory, optax optimizers, checkpointing.
- ``eval``        — segmentation metrics (P/R/F1, Pk, WinDiff), windowed
                    inference engine, example-level re-aggregation.
"""

__version__ = "0.1.0"
