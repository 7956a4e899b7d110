"""Generate a LARGER synthetic fixture statistically matched to the driver's
sf0.1 tables, for the 10× scale probe (VERDICT r5 task 5).

The driver fixtures are read-only and stop at sf0.1; every 100 TB claim so
far is argued from plan shape.  This writes ``documents.parquet`` and
``embeddings.parquet`` (the two tables the flagship dedup/contamination/ANN
families read) at an arbitrary multiple of the sf0.1 row counts, matching
the observed generation statistics so LSH bucket distributions and shuffle
volumes scale the way a real corpus would, not the way naive row
replication would (10× copies of each doc = a 100× candidate-pair
explosion that measures nothing):

- documents: 31-word vocabulary (the fixture's actual vocab), uniform
  10-100 words/doc, lang mix ~(en 41%, de/es/fr/zh ~15%), 20 sources,
  ~0.16% exact-duplicate rows (8 per 5000, as observed);
- embeddings: unit-normalized 64-dim gaussian float32, labels 0-9.

Usage: python -m tools.gen_scale_fixture OUT_DIR [multiplier] [vocab_size] [n_files]
(multiplier default 10; vocab_size default = the 31-word fixture vocab;
pass a vocab_size to generate the OPEN-vocabulary variant for Heaps-law
scale experiments — scale it ~ n_docs^0.6 across rungs)
Deterministic (seed 43); ~7 MB parquet at 10×, regenerate at will — the
output is intentionally NOT committed.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _zipf_vocab(size: int) -> tuple[np.ndarray, np.ndarray]:
    """Synthetic open vocabulary: ``size`` words with a Zipf-Mandelbrot
    frequency law p(r) ∝ 1/(r + 2.7) — the realistic shape where head
    words stay hot (so hot LSH buckets don't vanish by construction) while
    the tail keeps the shingle space growing with the corpus."""
    words = np.array([f"w{i:05d}" for i in range(size)])
    w = 1.0 / (np.arange(size) + 2.7)
    return words, w / w.sum()


def gen_documents(
    n_docs: int, rng: np.random.Generator, vocab_size: int | None = None
) -> pa.Table:
    """``vocab_size=None`` reproduces the original 31-word saturated-vocab
    fixture bit-for-bit (same RNG call sequence).  A vocab_size opens the
    vocabulary (Heaps-law experiments: scale it ~ n_docs^0.6 across rungs
    so the shingle space grows the way a real crawl's does)."""
    lengths = rng.integers(10, 101, n_docs)
    if vocab_size is None:
        vocab = np.array(VOCAB)
        texts = [
            " ".join(vocab[rng.integers(0, len(vocab), k)]) for k in lengths
        ]
    else:
        words, p = _zipf_vocab(vocab_size)
        texts = [
            " ".join(words[rng.choice(vocab_size, k, p=p)]) for k in lengths
        ]
    # exact-dup rate as observed at sf0.1: 8 dup pairs per 5000 docs
    n_dups = max(1, round(n_docs * 8 / 5000))
    src_idx = rng.integers(0, n_docs, n_dups)
    dst_idx = rng.integers(0, n_docs, n_dups)
    for s, d in zip(src_idx, dst_idx):
        if s != d:
            texts[d] = texts[s]
    langs = rng.choice(LANGS, n_docs, p=LANG_P)
    sources = np.char.add("src", rng.integers(0, 20, n_docs).astype(str))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


def gen_embeddings(n_vecs: int, rng: np.random.Generator) -> pa.Table:
    v = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, n_vecs).astype(np.int32)
            ),
        }
    )


def _write(table, path: str, n_files: int) -> None:
    """Single parquet file (the canonical ladder shape), or a directory of
    ``n_files`` part files — the production shape where ``fan_out``'s
    single-file guard is its documented no-op.  The r11 experiment measured
    the guard at ~10% of dedup_lsh_verified's and ~34% of the ingest
    composite's canonical sf10 probe bytes (DEVNOTES r11); the canonical
    ladder stays single-file for round-over-round comparability, and this
    knob makes the artifact bound reproducible."""
    if n_files <= 1:
        pq.write_table(table, path)
        return
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        pq.write_table(table.slice(lo, hi - lo), f"{path}/part-{i:05d}.parquet")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    # vocab_size "0" (or "-") keeps the default 31-word saturated vocab —
    # needed to reach the positional n_files without opening the vocabulary.
    vocab_size = (
        int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3] not in ("0", "-")
        else None
    )
    n_files = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(43)
    docs = gen_documents(int(5000 * mult), rng, vocab_size)
    _write(docs, f"{out}/documents.parquet", n_files)
    emb = gen_embeddings(int(2000 * mult), rng)
    _write(emb, f"{out}/embeddings.parquet", n_files)
    print(
        f"wrote {docs.num_rows} docs, {emb.num_rows} embeddings -> {out}"
        + (f" ({n_files} part files/table)" if n_files > 1 else "")
    )


if __name__ == "__main__":
    main()
