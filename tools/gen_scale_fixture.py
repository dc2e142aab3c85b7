"""Generate the large-scale smoke fixture (~10× sf0.1 documents, 60×
embeddings) under .scratch/sfscale/ — deterministic, schema-identical
to the driver's testdata tables, with planted duplicate structure so
the dedup operators have real work:

- documents (50 000): word-soup text over a fixture-like vocabulary;
  ~8% exact duplicates (pairs, never mega-clusters — a single text
  repeated thousands of times would be a bucket-skew pathology, not a
  scale test) and ~5% near-duplicates (2 word substitutions).
- embeddings (120 000): 64-dim float32 with WEAK cluster structure
  (cluster-mate cosine ≈ 0.12, far under the 0.4 dup threshold, so
  true-pair count stays sane) and 600 planted near-dup pairs at
  cos ≈ 0.995. 120 K deliberately exceeds EMBEDDING_BROADCAST_CAP so
  the exact baseline's guard must trip.

Writes only under /root/repo/.scratch — never touches /root/testdata.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = "/root/repo/.scratch/sfscale"
N_DOCS = 50_000
N_VECS = 120_000
DIM = 64
N_CENTERS = 16
N_PLANTED_PAIRS = 600
SEED = 20260813

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch "
    "spark line sort window join shuffle filter map reduce column "
    "index cache spill codegen stage task executor driver plan tree "
    "broadcast sample split pack token vector text image band pixel "
    "tile layer store sink source stream state event time range the "
    "a of to in and for with query data file block page byte"
).split()


def gen_documents(rng: np.random.Generator) -> pa.Table:
    lens = rng.integers(20, 200, N_DOCS)
    flat = rng.choice(np.array(VOCAB), size=int(lens.sum()))
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(flat, bounds)]
    # exact duplicates: doc i copies doc i - stride (pairs/triples only)
    exact_ids = rng.choice(N_DOCS // 2, size=int(N_DOCS * 0.08), replace=False)
    for i in exact_ids:
        texts[i + N_DOCS // 2] = texts[i]
    # near-duplicates: copy + 2 word substitutions
    near_ids = rng.choice(N_DOCS // 4, size=int(N_DOCS * 0.05), replace=False)
    for i in near_ids:
        words = texts[i].split()
        for j in rng.integers(0, len(words), 2):
            words[j] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        texts[i + N_DOCS // 4 * 3 - len(near_ids)] = " ".join(words)
    langs = rng.choice(np.array(["en", "de", "fr", "es"]), size=N_DOCS)
    sources = np.array([f"src{i % 10}" for i in rng.integers(0, 10, N_DOCS)])
    return pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator) -> pa.Table:
    centers = rng.normal(size=(N_CENTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_CENTERS, N_VECS)
    noise = rng.normal(size=(N_VECS, DIM))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    vecs = 0.35 * centers[labels] + 0.937 * noise
    # planted near-dup pairs at cos ≈ 0.995: the signal LSH must find
    src = rng.choice(N_VECS - N_PLANTED_PAIRS, size=N_PLANTED_PAIRS, replace=False)
    jitter = rng.normal(size=(N_PLANTED_PAIRS, DIM))
    jitter /= np.linalg.norm(jitter, axis=1, keepdims=True)
    dst = np.arange(N_VECS - N_PLANTED_PAIRS, N_VECS)
    vecs[dst] = vecs[src] + 0.1 * jitter
    labels[dst] = labels[src]
    return pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [row for row in vecs.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def main() -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    docs = gen_documents(rng)
    # Many row groups, NOT one: Spark assigns parquet splits per row
    # group, so a single-group file pins every scan (and the CPU-heavy
    # tokenize/shingle stages fused above it) to ONE task no matter how
    # many cores exist — a degenerate layout no 100 TB table has. The
    # original single-group write made every doc query look ~20×
    # super-linear in the smoke when the real cause was scan
    # parallelism 1.
    pq.write_table(
        docs, os.path.join(OUT_DIR, "documents.parquet"), row_group_size=1_500
    )
    emb = gen_embeddings(rng)
    pq.write_table(
        emb, os.path.join(OUT_DIR, "embeddings.parquet"), row_group_size=4_000
    )
    import sys

    # stderr: scale_smoke's stdout contract is one JSON line
    print(
        f"wrote {docs.num_rows} documents, {emb.num_rows} embeddings -> {OUT_DIR}",
        file=sys.stderr,
    )
    return OUT_DIR


if __name__ == "__main__":
    main()
