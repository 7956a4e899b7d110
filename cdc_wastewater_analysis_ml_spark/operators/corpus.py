"""Corpus-hygiene operators for training-data pipelines: benchmark
contamination detection, PII redaction, intra-document repetition signals.

These generalize the reference's data-cleaning intent (codes.py:96
drop_duplicates, codes.py:28-60 feature hygiene) to the document corpus a
large-scale training pipeline curates:

- **contamination**: n-gram overlap between the training corpus and a held
  -out evaluation set — the standard train/test-leak check for LLM corpora
  (cf. the n-gram-overlap decontamination described in public LM dataset
  reports, e.g. GPT-2/GPT-3 and The Pile papers).  Shape: explode distinct
  shingles, equi-join on a 128-bit shingle digest (the shuffle carries a
  32-char hex key, never the n-gram text), aggregate per train doc.
- **PII redaction**: JVM-side ``regexp_replace`` / ``regexp_count`` chains —
  whole-stage-codegen eligible, no Python in the hot path.  Patterns are
  deliberately restricted to the Java∩RE2 common syntax (no lookaround, no
  backreferences) so the same pattern string runs on Spark executors and in
  the DuckDB oracle.
- **repetition**: duplicate word-n-gram fraction per document (the
  Gopher-style "repetitious text" quality signal from public dataset-quality
  literature) as pure Catalyst array expressions.

All operators are linear scans or digest-keyed equi-joins: no all-pairs
stage, nothing that breaks at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.readers import fan_out
from .text import tokenize, token_count, word_shingles

#: Redaction patterns — Java regex ∩ RE2 (portable to the DuckDB oracle).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def contamination_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Per-train-document n-gram contamination against an eval corpus.

    Returns ``(id_col, n_shared, n_shingles, overlap_frac)`` for train docs
    sharing ≥1 distinct word ``n``-gram with ANY eval document.

    Scale shape: the eval side collapses to a distinct digest set (tiny next
    to the corpus — eval suites are fixed-size); the train side explodes to
    (doc, digest) pairs.  The equi-join shuffles 32-char md5 digests, not
    n-gram strings, and the per-doc aggregate is map-side combinable.  With
    a small eval suite the digest set is broadcast-able; Catalyst/AQE picks
    that up from sizes, so the plan degrades gracefully if the eval side
    grows.
    """
    # ONE scan of the train corpus: shingle each doc once, take both the
    # per-doc total (size) and the exploded digests from that single
    # projection.  n_shingles rides along the exploded rows as a small int —
    # cheap next to the digest — which also removes the hits⋈totals join the
    # first version paid (and its second full shingle pass, the r4 ADVICE
    # finding).
    doc_sh = fan_out(train).select(
        F.col(id_col),
        F.array_distinct(word_shingles(text_col, n)).alias("__shs"),
    )
    # explode_outer, NOT explode: for a plain explode Catalyst's
    # InferFiltersFromGenerate injects `size(<generator input>) > 0` and
    # substitutes the FULL shingle expression into a Filter and the scan's
    # DataFilters — i.e. every row pays the shingle computation twice more
    # (measured 1.7× on this query at sf0.1).  The outer variant skips the
    # inference; its only semantic delta is a null row for null/absent
    # text, which cannot survive the inner digest join below.
    tr = doc_sh.select(
        F.col(id_col),
        F.size("__shs").alias("n_shingles"),
        F.explode_outer("__shs").alias("__sh"),
    ).select(id_col, "n_shingles", F.md5("__sh").alias("__h"))
    ev = (
        fan_out(eval_df)
        .select(
            F.explode_outer(
                F.array_distinct(word_shingles(text_col, n))
            ).alias("__sh")
        )
        .select(F.md5("__sh").alias("__h"))
        .distinct()
    )
    hits = tr.join(ev, "__h").groupBy(id_col, "n_shingles").agg(
        F.count("*").alias("n_shared")
    )
    # floor(x·1e6 + 0.5)/1e6: the house cross-engine rounding (see DEVNOTES)
    frac = F.col("n_shared") / F.col("n_shingles")
    return hits.select(
        id_col,
        "n_shared",
        "n_shingles",
        (F.floor(frac * 1e6 + F.lit(0.5)) / 1e6).alias("overlap_frac"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    standard pre-tokenization packing step of an LLM data pipeline
    (context-length windows with ``chunk_tokens − stride`` tokens of
    overlap).

    Returns ``(id_col, chunk_id, chunk_text, n_chunk_tokens)`` with 0-based
    ``chunk_id``; the tail chunk may be shorter.  A doc with ≤ chunk_tokens
    tokens yields exactly one chunk.

    Pure Catalyst: tokenize once, build chunk start offsets with
    ``sequence``, slice+join per start with ``transform``, ``posexplode``
    to rows.  No shuffle, no Python — chunking pipelines inside the scan
    stage, which is the only shape that survives a 100 TB corpus (one task
    per input split, output fan-out proportional to tokens/stride).
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        # The overlapping-window contract (docstring, tests, property suite)
        # assumes every token lands in ≥1 chunk; stride > chunk_tokens would
        # silently skip tokens between windows and can push the tail start
        # past the token count (empty chunk_text, negative n_chunk_tokens) —
        # ADVICE r5 #1.
        raise ValueError(
            f"stride ({stride}) must be <= chunk_tokens ({chunk_tokens}): "
            "windows must cover every token"
        )
    toks = tokenize(text_col)
    n = F.size(toks)
    # chunks after the first: ceil((n - chunk)/stride), floored at 0
    extra = F.greatest(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)), F.lit(0)
    ).cast("int")
    starts = F.sequence(F.lit(1), F.lit(1) + extra * stride, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(toks, s, chunk_tokens), " ").alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - s + 1).cast("int").alias(
                "n_chunk_tokens"
            ),
        ),
    )
    # posexplode_outer: suppress InferFiltersFromGenerate re-computing the
    # whole chunk array in an inferred size()>0 filter (see
    # contamination_overlap); the array is never empty (≥1 chunk) and a
    # null-text row surfaces as one null chunk either way.
    return df.select(
        F.col(id_col), F.posexplode_outer(chunks).alias("chunk_id", "__c")
    ).select(
        id_col,
        "chunk_id",
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


def pii_redact(
    df: DataFrame, text_col: str, out_col: str = "redacted"
) -> DataFrame:
    """Append redaction-count columns + the redacted text.

    One linear scan; every expression is a JVM regexp inside whole-stage
    codegen.  Emails are replaced before phones/IPs so an address like
    ``user@10.0.0.1`` counts once as an email, never again as an IP —
    the count columns are computed on the ORIGINAL text (observability:
    "how much PII did this doc contain"), the redaction chain on the text
    itself.
    """
    c = F.col(text_col)
    red = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    return df.withColumns(
        {
            "n_email": F.regexp_count(c, F.lit(PII_EMAIL)),
            "n_phone": F.regexp_count(c, F.lit(PII_PHONE)),
            "n_ip": F.regexp_count(c, F.lit(PII_IPV4)),
            out_col: red,
        }
    )


def dup_fraction(sh: Column) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier one
    (cross-engine floor-rounded to 1e-6)."""
    frac = (F.size(sh) - F.size(F.array_distinct(sh))) / F.size(sh)
    return F.floor(frac * 1e6 + F.lit(0.5)) / 1e6


_dup_frac = dup_fraction  # backward-compat internal alias


def repetition_signals(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document repetition quality signals: token count + duplicate
    2-gram / 3-gram fractions (Gopher-style repetitious-text filters).

    Pure Catalyst array expressions over one scan — no shuffle, no Python.
    A natural-language doc scores near 0; boilerplate/looped text scores
    high and is what a quality-filter stage drops.
    """
    sh2 = word_shingles(text_col, 2)
    sh3 = word_shingles(text_col, 3)
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        _dup_frac(sh2).alias("dup_2gram_frac"),
        _dup_frac(sh3).alias("dup_3gram_frac"),
    )
