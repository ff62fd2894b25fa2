"""Synthetic tiny KG/MARS fixtures (<=20 entities) for hermetic tests."""

from __future__ import annotations

import json
import os
import random

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu "
    "xi omicron pi rho sigma tau upsilon"
).split()


def make_tiny_dataset(root: str, n_ent: int = 16, n_rel: int = 4, n_triples: int = 40,
                      n_analogy: int = 24, seed: int = 0):
    rng = random.Random(seed)
    markg_dir = os.path.join(root, "MarKG")
    mars_dir = os.path.join(root, "MARS")
    os.makedirs(markg_dir, exist_ok=True)
    os.makedirs(mars_dir, exist_ok=True)

    ents = [f"Q{i}" for i in range(n_ent)]
    rels = [f"P{i}" for i in range(n_rel)]
    with open(os.path.join(markg_dir, "entity2text.txt"), "w") as f:
        for i, e in enumerate(ents):
            words = " ".join(rng.choices(WORDS, k=rng.randint(2, 6)))
            f.write(f"{e}\tentity {i} {words}\n")
    with open(os.path.join(markg_dir, "relation2text.txt"), "w") as f:
        for i, r in enumerate(rels):
            f.write(f"{r}\trelation {WORDS[i]}\n")
    triples = [
        (rng.choice(ents), rng.choice(rels), rng.choice(ents))
        for _ in range(n_triples)
    ]
    with open(os.path.join(markg_dir, "wiki_tuple_ids.txt"), "w") as f:
        for h, r, t in triples:
            f.write(f"{h}\t{r}\t{t}\n")

    analogy_ents = ents[: n_ent // 2]
    analogy_rels = rels[: max(1, n_rel // 2)]
    with open(os.path.join(mars_dir, "analogy_entities.txt"), "w") as f:
        f.write("\n".join(analogy_ents) + "\n")
    with open(os.path.join(mars_dir, "analogy_relations.txt"), "w") as f:
        f.write("\n".join(analogy_rels) + "\n")

    def write_split(name, n):
        with open(os.path.join(mars_dir, f"{name}.json"), "w") as f:
            for i in range(n):
                d = dict(
                    example=[rng.choice(ents), rng.choice(ents)],
                    question=rng.choice(ents),
                    answer=rng.choice(analogy_ents),
                    relation=rng.choice(analogy_rels),
                    mode=i % 3,
                )
                f.write(json.dumps(d) + "\n")

    write_split("train", n_analogy)
    write_split("dev", max(6, n_analogy // 4))
    write_split("test", max(6, n_analogy // 4))
    return markg_dir, mars_dir


def tiny_unimo_config(vocab_size: int):
    from mkg_analogy_tpu.models.unimo import TextConfig, UnimoConfig, VisionConfig

    return UnimoConfig(
        text=TextConfig(
            vocab_size=vocab_size,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            max_position_embeddings=64,
        ),
        vision=VisionConfig(
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            image_size=16,
            patch_size=8,
        ),
        fusion_start=1,
        dtype="float32",
    )


def build_tiny(root, max_seq_length=64):
    from mkg_analogy_tpu.data.readers import MarKG, MARS
    from mkg_analogy_tpu.data.vocab import KGVocab, build_tokenizer

    markg_dir, mars_dir = make_tiny_dataset(root)
    markg = MarKG(markg_dir)
    mars = MARS(mars_dir, markg)
    tok = build_tokenizer(markg, vocab_size=256)
    vocab = KGVocab(tok, markg, mars)
    return markg, mars, vocab
