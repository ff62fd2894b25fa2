"""mkg_analogy_tpu — a TPU-native framework for multimodal analogical reasoning
over knowledge graphs (MarKG / MARS), built on JAX / Flax / pjit / Pallas.

Capability parity target: zjunlp/MKG_Analogy (ICLR 2023), re-designed TPU-first:

- ``models``   — Flax vision-language transformers (MKGformer/UniMo, VisualBERT,
                 ViLBERT, ViLT, FLAVA) with masked-entity analogy heads.
- ``kge``      — vectorized KG-embedding scorers (TransE, ANALOGY, ComplEx) with
                 IKRL / TransAE / RSME multimodal fusion variants.
- ``data``     — MarKG/MARS readers, prompt builder, static-shape batching.
- ``text``     — self-contained WordPiece tokenizer (offline-first).
- ``ops``      — vectorized analogy masks, ranking metrics, losses.
- ``native``   — C++ negative sampler / filtered evaluator (OpenKE C API parity).
- ``parallel`` — mesh + sharding rules (DP / TP over ICI).
- ``train``    — pjit training loop, evaluator, optimizer factory, checkpointing.
"""

__version__ = "0.1.0"
