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

from pyspark.sql import Column, DataFrame, Window
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
    (doc, digest) pairs.  The equi-join shuffles 64-bit ``xxhash64``
    digests (r12; previously 32-char md5 hex — the digest was most of the
    dominant exchange's row width), and the per-doc aggregate is map-side
    combinable.  With
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
    # 64-bit xxhash64 digests, not 32-char md5 hex (r12 — the r11
    # ngram/kgram narrowing applied here): the exploded train relation is
    # this query's dominant exchange (sf10 profile: 971 of 1285 MB) and the
    # digest is most of the row.  Shared-count semantics are preserved
    # exactly unless two distinct shingles collide in 64 bits (~m²/2⁶⁵ —
    # negligible; the failure mode is one n_shared nudged up, not a wrong
    # join).  NULL-preserving guard is load-bearing: xxhash64 SKIPS null
    # args (returns the bare seed hash), and explode_outer emits NULL
    # shingles for null/empty-text docs — unguarded, every such train row
    # would share one digest with every null eval shingle instead of
    # never joining (md5(null) was null; the when() keeps that invariant).
    digest = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(), F.xxhash64(F.col(c))
    )
    tr = doc_sh.select(
        F.col(id_col),
        F.size("__shs").alias("n_shingles"),
        F.explode_outer("__shs").alias("__sh"),
    ).select(id_col, "n_shingles", digest("__sh").alias("__h"))
    ev = (
        fan_out(eval_df)
        .select(
            F.explode_outer(
                F.array_distinct(word_shingles(text_col, n))
            ).alias("__sh")
        )
        .select(digest("__sh").alias("__h"))
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


def _doc_term_freq(
    df: DataFrame, text_col: str, id_col: str, term_alias: str, tf_alias: str
) -> DataFrame:
    """The shared per-(doc, token) term-frequency relation behind
    :func:`unigram_logprob` and :func:`tfidf_top_terms` — ONE place owns
    the tokenize/explode_outer/null-filter semantics their oracles mirror.
    Returned PERSISTED; callers transfer release to their result via
    ``scoped_persist``."""
    return (
        fan_out(df)
        .select(
            F.col(id_col), F.explode_outer(tokenize(text_col)).alias(term_alias)
        )
        .filter(F.col(term_alias).isNotNull())
        .groupBy(id_col, term_alias)
        .agg(F.count(F.lit(1)).alias(tf_alias))
        .persist()
    )


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the cheap perplexity proxy public pipelines (CCNet-style)
    use to rank documents by "naturalness" before an expensive model-based
    quality pass.  A doc of common words scores near the corpus mode; rare
    -token noise (boilerplate IDs, mojibake) scores far below it.

    Returns ``(id_col, n_tokens, avg_logprob)`` where ``avg_logprob`` =
    Σ tf·ln(count(tok)/total) / Σ tf, floor-rounded 1e-6 (house rule).

    Scale shape (all linear, no all-pairs): one tokenize+explode collapsed
    immediately to per-(doc, token) term frequencies (shuffle 1 — map-side
    combinable, and the relation every later stage reuses, persisted with
    result-scoped lifetime); vocabulary counts aggregate FROM the tf
    relation (shuffle 2, input already one row per (doc,token)); the
    corpus-total is a 1-row scalar broadcast (the allowlisted 1-row BNLJ);
    scoring re-joins tf⋈vocab on the token (shuffle 3) and aggregates per
    doc (shuffle 4).  At 100 TB the vocab relation is Heaps-law sublinear
    in the corpus, and AQE broadcasts it when it fits.
    """
    from .caching import scoped_persist

    doc_tf = _doc_term_freq(df, text_col, id_col, "__tok", "__tf")
    vocab = doc_tf.groupBy("__tok").agg(F.sum("__tf").alias("__cnt"))
    # r15 (opt): the corpus total sums the PERSISTED tf relation directly —
    # Σ_tok Σ_doc tf ≡ Σ_(doc,tok) tf exactly (bigint, order-free), but the
    # vocab-derived form re-computed the whole vocab aggregate a second
    # time (plan showed two identical __tok exchanges — AQE materialized
    # them as separate serial stages) just to add its rows up.  A global
    # sum over the cached tf rows is one map-side partial agg with no
    # keyed exchange, and the total stage no longer waits on vocab.
    total = doc_tf.agg(F.sum("__tf").alias("__total"))
    vocab_lp = vocab.crossJoin(F.broadcast(total)).select(
        "__tok", F.log(F.col("__cnt") / F.col("__total")).alias("__lp")
    )
    avg = F.sum(F.col("__tf") * F.col("__lp")) / F.sum("__tf")
    result = (
        doc_tf.join(vocab_lp, "__tok")
        .groupBy(id_col)
        .agg(
            F.sum("__tf").cast("bigint").alias("n_tokens"),
            (F.floor(avg * 1e6 + F.lit(0.5)) / 1e6).alias("avg_logprob"),
        )
    )
    return scoped_persist(result, doc_tf)


def pack_token_stream(
    df: DataFrame,
    text_col: str,
    id_col: str,
    context_len: int = 512,
) -> DataFrame:
    """Concat-and-split sequence packing: lay every document's tokens on one
    global stream (ordered by ``id_col``) and cut it into fixed
    ``context_len`` windows — the GPT-style packing step that turns a
    curated corpus into training rows with zero padding.

    Returns one row per (document, pack) span:
    ``(pack_id, id_col, n_doc_tokens, n_tokens_in_pack, begins_in_pack)``
    — a doc longer than a window spans several packs; a window holds spans
    of several docs.  Integer-exact (no floats anywhere).

    Scale shape: per-doc token counts are a linear scan; the global token
    offset uses the two-phase partition-offset prefix sum
    (:func:`~.prefix.global_prefix_sum`) — range shuffle + per-partition
    window + broadcast offsets, NEVER a single-task global window; the
    pack explosion is a per-row ``sequence`` fan-out proportional to
    tokens/context_len.  One range shuffle total.
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    # fan_out BEFORE the count projection: the tokenize runs in the scan
    # stage, and an under-split input (single-row-group local parquet)
    # would otherwise put the whole corpus's tokenization on ONE task —
    # measured 12 s of a 45 s wall at the 100× probe fixture.
    toks = fan_out(df).select(
        F.col(id_col), token_count(text_col).alias("__n")
    )
    return pack_token_counts(toks, "__n", id_col, context_len=context_len)


def pack_token_counts(
    df: DataFrame,
    count_col: str,
    id_col: str,
    context_len: int = 512,
) -> DataFrame:
    """:func:`pack_token_stream` over PRE-COMPUTED per-doc token counts —
    the text-free packing tail (r15).

    Identical spans for identical ``(id, count)`` inputs: the stream layout
    is a pure function of the ordered counts, so a caller whose pipeline
    already tokenized (a quality gate, a curation chain) can ship
    ``(id_col, count_col)`` rows here and the corpus text never reaches the
    packing shuffle — at 100 TB that is a whole corpus pass (tokenize) and
    a full-width exchange removed.  Rows with a non-positive count are
    dropped, exactly as the text form drops empty docs.  No fan_out: the
    input is a narrow count relation, not compute-bound text.
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    from .prefix import global_prefix_sum

    L = F.lit(context_len)
    toks = df.select(
        F.col(id_col), F.col(count_col).alias("__n")
    ).filter(F.col("__n") > 0)
    laid = global_prefix_sum(
        toks, [id_col], "__n", out="__start", exclusive=True
    )
    first = F.floor(F.col("__start") / L).cast("bigint")
    last = F.floor((F.col("__start") + F.col("__n") - 1) / L).cast("bigint")
    end = F.col("__start") + F.col("__n")
    return (
        laid.select(
            F.col(id_col),
            F.col("__n"),
            F.col("__start"),
            F.explode(F.sequence(first, last)).alias("pack_id"),
        )
        .select(
            "pack_id",
            id_col,
            F.col("__n").cast("bigint").alias("n_doc_tokens"),
            (
                F.least((F.col("pack_id") + 1) * L, end)
                - F.greatest(F.col("pack_id") * L, F.col("__start"))
            ).cast("bigint").alias("n_tokens_in_pack"),
            (F.col("__start") >= F.col("pack_id") * L).alias("begins_in_pack"),
        )
    )


def greedy_pack_by_key(
    df: DataFrame,
    text_col: str,
    id_col: str,
    key_col: str,
    context_len: int = 512,
) -> DataFrame:
    """No-split greedy bin packing within each ``key_col`` group: walk the
    group's documents in ``id_col`` order and close the current pack when
    the next document would overflow ``context_len`` — the packing variant
    for pipelines that must NOT split documents across training rows
    (contrast :func:`pack_token_stream`).  A document longer than
    ``context_len`` gets a pack of its own (downstream truncation policy).

    Returns ``(key_col, id_col, n_doc_tokens, pack_id, pack_fill)`` with
    0-based per-key ``pack_id`` and ``pack_fill`` = tokens in the pack
    after placing this doc.

    Scale shape: greedy packing is inherently sequential — but only WITHIN
    a key (source/shard), which is exactly how production pipelines shard
    the decision.  ``applyInPandas`` gives each key's walk to one task
    (Arrow-batched, one shuffle on the key); keys are independent, so the
    stage parallelizes across the key space.  The Python per group is a
    vectorized-enough O(n) walk over two int arrays, not per-row UDF calls.
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    import pandas as pd  # noqa: F401 — applyInPandas contract

    counted = fan_out(df).select(
        F.col(key_col), F.col(id_col), token_count(text_col).alias("n_doc_tokens")
    ).filter(F.col("n_doc_tokens") > 0)

    # derive key/id types from the input — the operator is generic over
    # int/string keys, not pinned to the one registry call shape
    key_t = counted.schema[key_col].dataType.simpleString()
    id_t = counted.schema[id_col].dataType.simpleString()
    schema = (
        f"{key_col} {key_t}, {id_col} {id_t}, n_doc_tokens long, "
        "pack_id long, pack_fill long"
    )

    def pack_group(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        packs, fills = [], []
        pack, fill = -1, 0
        for n in pdf["n_doc_tokens"]:
            if pack < 0 or fill + n > context_len:
                pack += 1
                fill = int(n)
            else:
                fill += int(n)
            packs.append(pack)
            fills.append(fill)
        pdf["pack_id"] = packs
        pdf["pack_fill"] = fills
        return pdf[[key_col, id_col, "n_doc_tokens", "pack_id", "pack_fill"]]

    return counted.groupBy(key_col).applyInPandas(pack_group, schema=schema)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the classic keyword-extraction
    signal (and the document representation behind sparse retrieval /
    cluster labeling over a curated corpus).

    ``tfidf = tf · ln(N / df)`` with N = #docs containing ≥1 token and
    df = #docs containing the term, floor-rounded 1e-6 (house rule)
    BEFORE ranking: ordering must be on values both engines reproduce
    exactly — ranking the raw double would let a 1-ulp ``ln`` difference
    between engines flip which term survives the top-k cut (two terms
    with mathematically equal scores via different expressions, e.g.
    1·ln 9 vs 2·ln 3, need not land on the same double).  Ranking is
    (rounded tfidf DESC, term ASC) via ``row_number``.

    Scale shape: same backbone as :func:`unigram_logprob` — ONE
    tokenize+explode collapsed to the per-(doc, term) tf relation
    (persisted, scope-released with the result) feeds both the
    document-frequency aggregate and the scoring join; N is a 1-row scalar
    broadcast; the final window partitions by doc (millions of small
    partitions — never a global window).  The df relation is Heaps-law
    sublinear in the corpus and broadcast when it fits.
    """
    from .caching import scoped_persist

    doc_tf = _doc_term_freq(df, text_col, id_col, "term", "tf")
    dfreq = doc_tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = doc_tf.agg(F.countDistinct(id_col).alias("__n"))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    out = (
        doc_tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.floor(
                F.col("tf") * F.log(F.col("__n") / F.col("__df")) * 1e6
                + F.lit(0.5)
            )
            / 1e6,
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col(id_col),
            "rank",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            "tfidf",
        )
    )
    return scoped_persist(out, doc_tf)
