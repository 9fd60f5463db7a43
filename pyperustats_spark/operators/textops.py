"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language ID, fingerprinting, n-gram stats.

These are the LLM-training-pipeline text ops the brief requires; the
reference's text handling (whitespace cleanup, substring search, slug
naming — metadata.py/_clean_text, organizer.py/slugify) provides the
normalization primitives in ``functions.text``.

All pure column expressions — whole-stage codegen, zero Python — so a
100 TB corpus is one scan + (for n-gram stats) one partial-aggregated
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyperustats_spark.functions.text import (
    STOPWORDS,
    digit_ratio,
    let,
    normalize,
    punct_ratio,
    token_count,
    tokens,
    word_ngrams,
)


def token_counts(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Whitespace/punct-regex token count + char count per doc.
    ``sort=False`` when composing — the presentation sort is wasted by
    any downstream shuffle."""
    out = documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return out.orderBy("doc_id") if sort else out


def quality_score_col(text_col) -> "F.Column":
    """The composite quality score of :func:`quality_score` as ONE
    row-local Column — for wider projections that must keep their
    payload columns (the release chain filters on this instead of
    computing scores in a second frame and self-joining on doc_id,
    which would double-execute the whole upstream plan; see
    api.incremental_release). Tokenization and mean word length are
    let-bound so each evaluates once per row."""
    def sc(toks):
        n_toks = F.size(toks)
        char_sum = F.aggregate(toks, F.lit(0).cast("bigint"),
                               lambda acc, t: acc + F.length(t))

        def sc_inner(mwl):
            sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
            hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
            sw_density = F.when(n_toks > 0, hits / n_toks).otherwise(
                F.lit(0.0))
            return (
                F.when((n_toks >= 10) & (n_toks <= 100000),
                       F.lit(0.25)).otherwise(F.lit(0.0))
                + F.when((mwl >= 2.0) & (mwl <= 12.0),
                         F.lit(0.25)).otherwise(F.lit(0.0))
                + F.when(punct_ratio(text_col) <= 0.2,
                         F.lit(0.25)).otherwise(F.lit(0.0))
                + F.when(sw_density >= 0.02,
                         F.lit(0.25)).otherwise(F.lit(0.0))
            )

        mwl_expr = F.when(n_toks > 0, char_sum / n_toks).otherwise(
            F.lit(0.0))
        return let(mwl_expr, sc_inner)

    return let(tokens(text_col), sc)


def quality_score(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Heuristic quality features + composite score.

    Features follow the standard pretraining-filter recipe (length,
    mean word length, punctuation/digit ratios, stopword density)."""
    # let-bind the token array: every feature reads it instead of
    # re-tokenizing (tokens() is the expensive subtree here)
    def feats(toks):
        n_toks = F.size(toks)
        # integer char-sum then a single division: exact cross-engine parity
        mean_word_len = F.when(
            n_toks > 0,
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
            / n_toks,
        ).otherwise(F.lit(0.0))
        sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        sw_density = F.when(n_toks > 0, hits / n_toks).otherwise(F.lit(0.0))
        return F.struct(
            n_toks.alias("n_tokens"),
            mean_word_len.alias("mean_word_len"),
            sw_density.alias("stopword_density"),
        )

    pr = punct_ratio(F.col("text"))
    dr = digit_ratio(F.col("text"))
    base = documents.select(
        "doc_id",
        let(tokens(F.col("text")), feats).alias("f"),
        pr.alias("punct_ratio"),
        dr.alias("digit_ratio"),
    ).select(
        "doc_id",
        F.col("f.n_tokens").alias("n_tokens"),
        F.col("f.mean_word_len").alias("mean_word_len"),
        "punct_ratio",
        "digit_ratio",
        F.col("f.stopword_density").alias("stopword_density"),
    )
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((F.col("mean_word_len") >= 2.0) & (F.col("mean_word_len") <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("punct_ratio") <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("stopword_density") >= 0.02, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    out = base.withColumn("quality_score", score)
    return out.orderBy("doc_id") if sort else out


def lang_id(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Stopword-hit language ID over en/es/de/fr + CJK-ratio shortcut.

    Picks the language with the most stopword hits; 'zh' when CJK
    characters dominate; 'und' when nothing matches."""
    cjk = F.length(F.regexp_replace(F.col("text"), r"[^一-鿿]", ""))

    # tokenize once (let-bound), count stopword hits per language
    def hit_struct(toks):
        cols = []
        for lang in ("en", "es", "de", "fr"):
            sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
            cols.append(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias(lang)
            )
        return F.struct(*cols)

    base = documents.select(
        "doc_id",
        F.col("text"),
        let(tokens(F.col("text")), hit_struct).alias("h"),
        (cjk / F.greatest(F.length("text"), F.lit(1))).alias("cjk_ratio"),
    )
    hits = {lang: F.col(f"h.{lang}") for lang in ("en", "es", "de", "fr")}
    best_hits = F.greatest(*hits.values())
    # ties resolve in fixed lang order (deterministic, matches oracle)
    cond = F.when(F.col("cjk_ratio") > 0.2, F.lit("zh"))
    for lang in ("en", "es", "de", "fr"):
        cond = cond.when((best_hits > 0) & (hits[lang] == best_hits), F.lit(lang))
    out = base.select(
        "doc_id",
        *[hits[lang].alias(f"hits_{lang}") for lang in ("en", "es", "de", "fr")],
        cond.otherwise(F.lit("und")).alias("lang_pred"),
    )
    return out.orderBy("doc_id") if sort else out


def fingerprint(documents: DataFrame, sort: bool = True) -> DataFrame:
    """md5 fingerprint of the normalized text (reference: SHA-256 file
    dedup key, organizer.py:207-231). Stable across engines."""
    out = documents.select(
        "doc_id", F.md5(normalize(F.col("text"))).alias("fingerprint")
    )
    return out.orderBy("doc_id") if sort else out


def repetition_metrics(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition features per document: repetitive text
    (boilerplate, keyword stuffing, templated spam) is a standard
    pretraining-quality drop signal alongside :func:`quality_score`.

    All from ONE let-bound tokenization, pure array expressions in
    codegen, no shuffle:

    - ``dup_token_frac``  — 1 − distinct/total tokens;
    - ``top_token_frac``  — share of the single most frequent token
      (counts via distinct×total array scan: O(d·n) per row on
      double-digit token counts, never a shuffle);
    - ``dup_2gram_frac``  — 1 − distinct/total word 2-grams.

    Ratios divide the same bigint pair in the same order in the DuckDB
    oracle, so the doubles are bit-identical (midpoint rule: never
    round derived ratios)."""
    def feats(toks):
        n_tok = F.size(toks)
        n_dis = F.size(F.array_distinct(toks))
        top = F.array_max(F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda t: t == d)),
        ))
        return F.struct(
            n_tok.cast("bigint").alias("n_tokens"),  # bigint: oracle schema parity
            (F.lit(1.0) - F.try_divide(n_dis, n_tok)).alias("dup_token_frac"),
            F.try_divide(top, n_tok).alias("top_token_frac"),
        )

    def gram_feats(grams):
        return (F.lit(1.0) - F.try_divide(
            F.size(F.array_distinct(grams)), F.size(grams)))

    return documents.select(
        "doc_id",
        let(tokens(F.col("text")), feats).alias("f"),
        let(word_ngrams(F.col("text"), 2), gram_feats).alias("dup_2gram_frac"),
    ).select(
        "doc_id",
        F.col("f.n_tokens").alias("n_tokens"),
        F.col("f.dup_token_frac").alias("dup_token_frac"),
        F.col("f.top_token_frac").alias("top_token_frac"),
        "dup_2gram_frac",
    ).orderBy("doc_id")


def ngram_topk(documents: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Global top-K word n-grams: explode → partial-agg count → top-K.

    The explode multiplies rows but the count aggregation combines
    map-side, so the shuffle carries only distinct n-grams."""
    return (
        documents.select(F.explode(word_ngrams(F.col("text"), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "ngram")
        .limit(k)
    )


def rolling_hash_fingerprint(documents: DataFrame, base: int = 31,
                             mod: int = 2147483647) -> DataFrame:
    """Polynomial rolling-hash fingerprint of the normalized text:
    ``h = (h*base + codepoint) % mod`` folded over the characters.

    The brief's "document fingerprinting (rolling hash)" — unlike the
    md5 fingerprint this is incrementally updatable (sliding windows /
    chunk re-hash). Pure aggregate over a char array, JVM-side; the
    DuckDB oracle reproduces it with list_reduce, so it is value-checked
    cross-engine."""
    codes = F.transform(
        F.split(normalize(F.col("text")), ""), lambda c: F.ascii(c).cast("bigint")
    )
    h = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * F.lit(base) + c) % F.lit(mod),
    )
    return documents.select("doc_id", h.alias("rhash")).orderBy("doc_id")


def lang_confusion(documents: DataFrame) -> DataFrame:
    """Language-ID evaluation: confusion counts of labeled ``lang`` vs
    the heuristic's ``lang_pred`` (reference-quality check for the
    pipeline's language filter). One extra shuffle over lang_id."""
    pred = lang_id(documents, sort=False).select("doc_id", "lang_pred")
    return (
        documents.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


# ORDER MATTERS: the phone pattern is the greediest digit-run matcher,
# so cards and IPv4 must redact first or phone eats them
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
)


def pii_scrub(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Redact common PII shapes (emails, phone numbers, card-like digit
    runs, IPv4) — the standard pre-training scrub pass. A fixed chain
    of regexp_replace, fully JVM-side; pattern order is load-bearing
    (see PII_PATTERNS). Returns original id, scrubbed text, and a flag."""
    scrubbed = F.col("text")
    for pattern, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    out = documents.select(
        "doc_id",
        scrubbed.alias("text_scrubbed"),
        (scrubbed != F.col("text")).alias("was_scrubbed"),
    )
    return out.orderBy("doc_id") if sort else out


def chunk_windows(documents: DataFrame, chunk_tokens: int = 50,
                  overlap: int = 10, sort: bool = True) -> DataFrame:
    """Split each document into overlapping token windows — the
    standard pre-embedding/pre-training chunker (window = chunk_tokens,
    stride = chunk_tokens - overlap; the final window may be shorter;
    empty docs yield no chunks).

    The token array is let-bound (computed once per row), windows come
    from sequence+filter+transform generators inside codegen, and the
    operator is embarrassingly parallel — one narrow stage, no shuffle,
    so it runs at scan speed on any corpus size."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    def body(toks):
        n = F.size(toks)
        starts = F.filter(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
            lambda s: s < n,
        )
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_id"),
                F.least(F.lit(chunk_tokens), n - s).alias("chunk_len"),
                F.concat_ws(
                    " ", F.slice(toks, s + 1, chunk_tokens)).alias("chunk_text"),
            ),
        )

    chunks = let(tokens(F.col("text")), body)
    out = (
        documents.select("doc_id", F.explode(chunks).alias("_c"))
        .select("doc_id", "_c.chunk_id", "_c.chunk_len", "_c.chunk_text")
    )
    # presentation sort only — pass sort=False when composing
    return out.orderBy("doc_id", "chunk_id") if sort else out


def pack_sequences(documents: DataFrame, budget: int = 256,
                   sort: bool = True) -> DataFrame:
    """Concat-and-split sequence packing: documents are laid out
    end-to-end in doc_id order and cut into fixed *budget* token
    contexts — each doc reports its global start offset and the first/
    last context window it lands in (GPT-style packing where documents
    may straddle window boundaries).

    The global layout offset is an exclusive running sum of token
    counts over the doc_id ordering — computed scale-safely with
    :func:`~pyperustats_spark.operators.relational.global_running_sum`
    (range-partitioned, no partition-less window), so packing a
    trillion-token corpus never funnels through one task."""
    from pyperustats_spark.operators.relational import global_running_sum

    # persisted: global_running_sum references its input twice
    # (range-partitioned sum + physical-partition offset table) and
    # each reference re-ran the corpus tokenize (optimization r11:
    # 6 -> 1 documents scans). Narrow (doc_id, n_tokens) integer
    # rows — text never caches; the cache also pins both references
    # to identical bits (the global_ntile identical-subtree
    # condition).
    with_counts = documents.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")).persist()
    laid_out = global_running_sum(
        with_counts, [F.col("doc_id").asc()], "n_tokens",
        out_col="start_offset", exclusive=True)
    out = laid_out.select(
        "doc_id", "n_tokens",
        F.col("start_offset").cast("bigint").alias("start_offset"),
        F.floor(F.col("start_offset") / budget).alias("bin_start"),
        F.floor(
            (F.col("start_offset")
             + F.greatest(F.col("n_tokens") - 1, F.lit(0))) / budget
        ).alias("bin_end"),
    )
    return out.orderBy("doc_id") if sort else out


def contamination_flags(documents: DataFrame, eval_df: DataFrame,
                        n: int = 5, text_col: str = "text",
                        sort: bool = True) -> DataFrame:
    """Benchmark decontamination: flag every document that shares at
    least one *n*-token word n-gram with an eval/benchmark set — the
    standard pretraining hygiene step before training on a scraped
    corpus (exact n-gram overlap, the GPT-3/Llama-style recipe).

    Scale: the eval side is a BENCHMARK (thousands of rows, bounded) —
    its distinct grams stay small, so AQE broadcasts the semi-join and
    the corpus side streams through without shuffling its grams; the
    only shuffle is the distinct over contaminated 8-byte doc_ids.
    Grams are compared as strings (md5-free) because the broadcast
    means they never ride a shuffle; the semi-join is unhinted — if an
    eval set ever IS huge, AQE falls back to a shuffled semi-join
    instead of OOMing the driver. Returns (doc_id, is_contaminated)
    for every input document."""
    doc_grams = documents.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), n))).alias("gram"),
    )
    eval_grams = eval_df.select(
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram")
    ).distinct()
    hits = (
        doc_grams.join(eval_grams, "gram", "left_semi")
        .select("doc_id").distinct()
        .withColumn("_hit", F.lit(True))
    )
    out = (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select("doc_id",
                F.coalesce(F.col("_hit"), F.lit(False)).alias("is_contaminated"))
    )
    return out.orderBy("doc_id") if sort else out


def contamination_flags_bloom(documents: DataFrame, eval_df: DataFrame,
                              n: int = 5, text_col: str = "text",
                              m_bits: int = 1 << 16, k: int = 3,
                              sort: bool = True) -> DataFrame:
    """:func:`contamination_flags` with corpus grams Bloom-prefiltered
    before the semi-join — same flags, row for row.

    When the eval side is genuinely benchmark-sized, AQE broadcasts the
    semi-join and the plain form is already shuffle-free on the corpus
    side — use that one. This variant is for the 100 TB posture where
    the eval side ISN'T broadcastable (every benchmark ever published,
    unioned — tens of millions of distinct grams): the semi-join then
    shuffles EVERY corpus gram. Here the eval grams aggregate into a
    Bloom bitmap (one agg over the eval side, O(m/32) driver collect),
    and each corpus gram is tested row-locally at the explode — only
    grams that might match (plus fp_rate ≈ occupancy^k) enter the
    semi-join exchange, cutting it from corpus-gram-proportional to
    hit-proportional. No false negatives → no contaminated doc is ever
    missed; false positives are discarded by the confirming semi-join
    → no clean doc is ever flagged. Result provably identical, so the
    oracle is the PLAIN contamination_flags SQL.

    bloom_build is an action: the eval side is scanned twice (bitmap,
    then lazily into the semi-join) — it is the small side by premise."""
    from pyperustats_spark.functions.bloom import bloom_build, bloom_member

    eval_grams = eval_df.select(
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram")
    ).distinct()
    bitmap = bloom_build(eval_grams, "gram", m_bits=m_bits, k=k)
    doc_grams = (
        documents.select(
            "doc_id",
            F.explode(F.array_distinct(word_ngrams(F.col("text"), n))).alias("gram"))
        .where(bloom_member(F.col("gram"), bitmap, m_bits=m_bits, k=k))
    )
    hits = (
        doc_grams.join(eval_grams, "gram", "left_semi")
        .select("doc_id").distinct()
        .withColumn("_hit", F.lit(True))
    )
    out = (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select("doc_id",
                F.coalesce(F.col("_hit"), F.lit(False)).alias("is_contaminated"))
    )
    return out.orderBy("doc_id") if sort else out


def decontaminate(documents: DataFrame, eval_df: DataFrame, n: int = 5,
                  text_col: str = "text", sort: bool = True) -> DataFrame:
    """APPLY decontamination: the corpus minus contaminated documents
    (see :func:`contamination_flags`). Anti-join on 8-byte doc_ids,
    AQE-decided — same scale posture as the dedup apply family."""
    bad = contamination_flags(documents, eval_df, n=n, text_col=text_col,
                              sort=False).where(F.col("is_contaminated"))
    out = documents.join(bad.select("doc_id"), "doc_id", "left_anti")
    return out.orderBy("doc_id") if sort else out


def sample_source_mix(documents: DataFrame, fractions: dict[str, float],
                      salt: str = "mix", sort: bool = True) -> DataFrame:
    """Deterministic per-source downsampling to target mixture weights —
    the data-mixture step of a pretraining pipeline (e.g. keep 100% of
    curated sources, 10% of crawl). A doc survives iff its salted
    md5(doc_id) bucket (mod 10000) falls under fraction[source]×10000;
    sources absent from *fractions* keep weight 0.

    Same hash-cut family as ``train_val_split``: membership is a pure
    row-local expression — zero shuffles at any corpus size, stable
    under resharding, and appends land in stable sample membership
    without re-drawing old rows. md5 keeps it oracle-checkable."""
    pairs = []
    for src, frac in fractions.items():
        if not (0.0 <= frac <= 1.0):
            raise ValueError(f"fraction for {src!r} must be in [0, 1]")
        pairs += [F.lit(src), F.lit(int(round(frac * 10000)))]
    cut = F.coalesce(F.create_map(*pairs)[F.col("source")], F.lit(0))
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt),
                                      F.col("doc_id").cast("string"))), 1, 4),
        16, 10).cast("int") % 10000
    out = documents.where(bucket < cut)
    return out.orderBy("doc_id") if sort else out


def vocab_top_terms(documents: DataFrame, n: int = 100) -> DataFrame:
    """Corpus vocabulary: the top-*n* tokens by total frequency, ties
    broken by token text so the cut is deterministic cross-engine —
    the vocabulary-building step of a tokenizer-training pipeline.

    Scale: one explode + one partially-aggregated count shuffle (only
    (token, count) pairs ride it); the top-n itself compiles to Spark's
    TakeOrderedAndProject (per-partition heap, driver merges P heads of
    n rows), never a full global sort — so building a vocab over a
    100 TB corpus is one scan + one count shuffle + an O(P·n) merge."""
    freqs = (
        documents.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    )
    return freqs.orderBy(F.desc("freq"), F.asc("token")).limit(n)


def readability(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Flesch reading-ease and Flesch–Kincaid grade per document from
    three pure-regexp counts — words (the shared tokenizer), sentences
    (``[.!?]+`` runs, floored at 1), and syllables (vowel-group runs
    ``[aeiouy]+`` in the lowercased text, the standard heuristic) — a
    quality-filter feature for training corpora (OCR garbage and
    boilerplate score far off the natural-text band).

    Determinism: the two ratios are int/int IEEE divisions (bit-
    identical cross-engine, ship RAW per the CLAUDE.md rule) and the
    Flesch formulas are literal-coefficient arithmetic on those bits
    in oracle-mirrored order. One narrow scan, zero shuffles, all
    whole-stage codegen."""
    n_words = F.size(tokens(F.col("text")))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)),
        F.lit(1))
    n_syll = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0))
    base = documents.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syll.cast("bigint").alias("n_syllables"),
    )
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.greatest(F.col("n_words"), F.lit(1))
    out = base.select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        wps.alias("words_per_sentence"),
        spw.alias("syllables_per_word"),
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
        .alias("flesch"),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
        .alias("fk_grade"),
    )
    return out.orderBy("doc_id") if sort else out


def zipf_fit(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Per-language Zipf's-law fit: OLS of ln(freq) on ln(rank) over
    the language's vocabulary — slope ≈ −1 for natural text, so
    deviations flag template/boilerplate floods (flatter head) or
    over-aggressive dedup (truncated tail): a corpus health check run
    before tokenizer training.

    Determinism (CLAUDE.md ln rule + the fixed-point OLS core): each
    ln is rounded to the 1e-6 grid → integer MICROS (bigint), so every
    regression sum is exact and the fit is bit-identical cross-engine;
    slope/intercept/r2 ship RAW.

    Scale: vocab = one explode + partially-aggregated count shuffle.
    Ranks are derived from VALUES, not one language-sized window: a
    prefix-count side table over the bounded distinct-frequency space
    plus row_number within (lang, freq) — the histogram-rank idiom of
    ``layout.histogram_ntile``. The largest single task is the hapax
    bucket (freq = 1, roughly half the vocab of one language), already
    far smaller than a whole-language rank window."""
    from pyperustats_spark.functions.stats import ols_exact

    freqs = (
        documents.select("lang", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("freq"))
        # referenced by the frequency histogram AND the ranked join —
        # persist the vocab so the corpus explode+count runs once
        .persist()
    )
    counts = freqs.groupBy("lang", "freq").agg(F.count(F.lit(1)).alias("_cnt"))
    wf = Window.partitionBy("lang").orderBy(F.desc("freq"))
    side = counts.select(
        "lang", "freq",
        F.coalesce(
            F.sum("_cnt").over(wf.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("_off"),
    )
    wr = Window.partitionBy("lang", "freq").orderBy("token")
    micro = (
        freqs.withColumn("_pos", F.row_number().over(wr))
        .join(F.broadcast(side), ["lang", "freq"])
        .select(
            "lang",
            F.round(F.log((F.col("_off") + F.col("_pos")).cast("double"))
                    * 1e6).cast("bigint").alias("_x"),
            F.round(F.log(F.col("freq").cast("double"))
                    * 1e6).cast("bigint").alias("_y"),
        )
    )
    fit = ols_exact(micro, ["lang"], x="_x", y="_y",
                    x_scale=1e6, y_scale=1e6)
    out = fit.select("lang", F.col("n_obs").alias("n_types"),
                     "slope", "intercept", "r2")
    return out.orderBy("lang") if sort else out


def oov_rate(documents: DataFrame, n: int = 100,
             sort: bool = True) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-*n*
    vocabulary (see :func:`vocab_top_terms`) — the coverage check run
    before freezing a tokenizer vocab.

    Scale: the vocab side is n rows by construction, so it is hinted
    broadcast (bounded by a user parameter, same audited class as the
    IVF centroid table); the corpus side explodes once and aggregates
    back on 8-byte doc_ids. Empty documents survive via explode_outer
    (n_tokens 0, rate NULL via try_divide)."""
    vocab = (vocab_top_terms(documents, n)
             .select("token", F.lit(1).alias("_in_vocab")))
    toks = documents.select(
        "doc_id", F.explode_outer(tokens(F.col("text"))).alias("token"))
    out = (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("token").alias("n_tokens"),
            F.sum(F.when(F.col("token").isNotNull()
                         & F.col("_in_vocab").isNull(), 1)
                  .otherwise(0)).cast("bigint").alias("n_oov"),
        )
        # raw double, not round-6: an int/int ratio is a correctly-
        # rounded IEEE division, bit-identical cross-engine, while
        # round-6 of e.g. p/128 lands on exact midpoints where engines
        # disagree (see CLAUDE.md derived-doubles rule)
        .withColumn("oov_rate",
                    F.try_divide(F.col("n_oov"), F.col("n_tokens")))
    )
    return out.orderBy("doc_id") if sort else out


def boilerplate_segments(documents: DataFrame, seg_tokens: int = 8,
                         min_df: int = 2, sort: bool = True) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate detection: cut each document
    into consecutive *seg_tokens*-token segments, hash each segment,
    and flag segments whose corpus-wide DOCUMENT frequency reaches
    *min_df* (nav bars, cookie banners, license headers — text repeated
    across many pages). Returns per-doc segment totals and the
    boilerplate share, the signal a cleaning pass filters on.

    Scale: segments ride shuffles only as md5 keys + 8-byte doc_ids
    (never the segment text); document frequency is a two-phase
    distinct+count on the hash; the flag join is plain AQE (the
    frequent-segment side is usually small but is NOT hinted — a
    pathological corpus where most segments repeat degrades to a
    shuffle join instead of OOMing). Empty docs are preserved with
    n_segments 0 / share NULL."""
    if seg_tokens < 1:
        raise ValueError("seg_tokens must be >= 1")
    seg_expr = let(tokens(F.col("text")), lambda tk: F.when(
        F.size(tk) > 0,
        F.transform(
            F.sequence(
                F.lit(0),
                F.ceil(F.size(tk) / seg_tokens).cast("int") - 1),
            lambda i: F.concat_ws(
                " ", F.slice(tk, i * seg_tokens + 1, seg_tokens))),
    ).otherwise(F.array().cast("array<string>")))
    segs = documents.select(
        "doc_id", F.explode(seg_expr).alias("seg")
    ).select("doc_id", F.md5("seg").alias("seg_key"))
    # aggregate per (doc_id, seg_key) FIRST so the map-side combiner
    # collapses within-doc repeats before anything shuffles. Document
    # frequency and the per-doc rollup each re-derive this subtree from
    # the scan (Catalyst prunes the branches differently, so the
    # exchange is not reusable): a bounded 2x segment compute, chosen
    # deliberately over a seg_key count-window (a corpus-wide
    # boilerplate segment would funnel its whole doc set through one
    # task) and over persisting a corpus-scale intermediate
    occ = segs.groupBy("doc_id", "seg_key").agg(
        F.count(F.lit(1)).alias("_n_occ"))
    dfreq = occ.groupBy("seg_key").agg(F.count(F.lit(1)).alias("_df"))
    boiler = dfreq.where(F.col("_df") >= min_df).select(
        "seg_key", F.lit(1).alias("_boiler"))
    per_doc = (
        occ.join(boiler, "seg_key", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("_n_occ").cast("bigint").alias("n_segments"),
            F.sum(F.when(F.col("_boiler").isNotNull(), F.col("_n_occ"))
                  .otherwise(0)).cast("bigint").alias("n_boilerplate"),
        )
    )
    out = (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_segments"), F.lit(0))
            .cast("bigint").alias("n_segments"),
            F.coalesce(F.col("n_boilerplate"), F.lit(0))
            .cast("bigint").alias("n_boilerplate"),
            # raw double (int/int division is bit-identical cross-
            # engine; round-6 would split engines on exact midpoints)
            F.try_divide(F.col("n_boilerplate"), F.col("n_segments"))
            .alias("boilerplate_share"),
        )
    )
    return out.orderBy("doc_id") if sort else out


def boilerplate_apply(documents: DataFrame, seg_tokens: int = 8,
                      min_df: int = 2, sort: bool = True) -> DataFrame:
    """APPLY variant of :func:`boilerplate_segments`: rewrite each
    document with its boilerplate segments removed (the cleaning pass
    itself, not just the flags). Returns (doc_id, text_clean) for every
    input document — empty string when everything was boilerplate or
    the doc was empty.

    Scale: this op REWRITES the corpus, so segment text must ride one
    shuffle (the reassembly groupBy) — that is the floor for any
    rewrite; flags are still joined on md5 keys only, and the flag side
    stays an unhinted AQE join exactly as in the flag op. Segment order
    is restored via sort_array over (pos, seg) structs inside the
    aggregate, not a window."""
    if seg_tokens < 1:
        raise ValueError("seg_tokens must be >= 1")
    seg_expr = let(tokens(F.col("text")), lambda tk: F.when(
        F.size(tk) > 0,
        F.transform(
            F.sequence(
                F.lit(0),
                F.ceil(F.size(tk) / seg_tokens).cast("int") - 1),
            lambda i: F.concat_ws(
                " ", F.slice(tk, i * seg_tokens + 1, seg_tokens))),
    ).otherwise(F.array().cast("array<string>")))
    segs = documents.select(
        "doc_id", F.posexplode(seg_expr).alias("pos", "seg")
    ).withColumn("seg_key", F.md5("seg"))
    dfreq = (
        segs.select("doc_id", "seg_key").distinct()
        .groupBy("seg_key").agg(F.count(F.lit(1)).alias("_df"))
    )
    boiler = dfreq.where(F.col("_df") >= min_df).select(
        "seg_key", F.lit(1).alias("_boiler"))
    kept = (
        segs.join(boiler, "seg_key", "left")
        .where(F.col("_boiler").isNull())
        .groupBy("doc_id")
        .agg(F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"]),
            " ").alias("text_clean"))
    )
    out = (
        documents.select("doc_id")
        .join(kept, "doc_id", "left")
        .select("doc_id",
                F.coalesce(F.col("text_clean"), F.lit(""))
                .alias("text_clean"))
    )
    return out.orderBy("doc_id") if sort else out


def corpus_summary(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Data-card rollup: per (source, lang) document counts, token
    totals, mean doc length, and each cell's share of all corpus
    tokens — the summary table a dataset release publishes.

    Scale: one partially-aggregated groupBy; the grand total is a
    1-row aggregate hinted broadcast into the share join (same audited
    1-row pattern as q_market_share). Shares are raw bigint/bigint
    doubles — bit-identical cross-engine, no rounding."""
    per = documents.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("bigint")
        .alias("total_tokens"),
    )
    total = per.agg(
        F.sum("total_tokens").cast("bigint").alias("_corpus_tokens"))
    out = (
        per.join(F.broadcast(total))
        .select(
            "source", "lang", "n_docs", "total_tokens",
            F.try_divide(F.col("total_tokens"), F.col("n_docs"))
            .alias("mean_tokens_per_doc"),
            F.try_divide(F.col("total_tokens"), F.col("_corpus_tokens"))
            .alias("token_share"),
        )
    )
    return out.orderBy("source", "lang") if sort else out


def quality_filter(documents: DataFrame, min_score: float = 0.75,
                   sort: bool = True) -> DataFrame:
    """APPLY variant of :func:`quality_score`: keep documents whose
    composite quality score reaches *min_score* (the Gopher-rule
    cleaning cut).

    Shape (A/B-measured at sf10bd): the keep-set derives from its OWN
    scan of (doc_id, text) — score evaluated ONCE inside whole-stage
    codegen — and semi-joins back onto a text-free (doc_id, lang,
    source) scan, so the heavy text column is read exactly once and
    only narrow (doc_id, score) pairs shuffle. The single-reference
    rule does NOT apply here because the upstream is a LEAF scan: a
    second differently-pruned parquet scan is cheap, unlike
    re-executing a computed stage. The two single-scan alternatives
    both lose: `select(score).where(score >= x)` gets the expression
    substituted into the predicate (2× evaluation, ~24s); explode-of-
    conditional-array evaluates once but inside GenerateExec, OUTSIDE
    whole-stage codegen (interpreted scoring, 13.9s vs 11.7s) — that
    form is still right mid-chain where upstream re-execution is the
    bigger cost (api.incremental_release)."""
    scored = quality_score(documents, sort=False)
    keep = scored.where(F.col("quality_score") >= min_score) \
                 .select("doc_id", "quality_score")
    out = documents.join(keep, "doc_id").select(
        "doc_id", "lang", "source", "quality_score")
    return out.orderBy("doc_id") if sort else out


def unigram_logprob(documents: DataFrame, k: float = 0.5,
                    sort: bool = True) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    add-k-smoothed unigram model — the cheap perplexity-style quality
    signal (very low mean log-prob = gibberish / wrong-language /
    boilerplate relative to the corpus).

    Scale: one explode + one token-count shuffle for the model; the
    scoring join streams doc tokens against the (token, count) table
    (AQE-decided — a real vocab is small, a pathological one still
    shuffle-joins); corpus totals N and V are a 1-row aggregate
    (audited BNLJ/SINGLE_PART, q_market_share pattern).

    Cross-engine determinism: ln() differs by ulps between engines, so
    each token's log-prob is rounded to the 1e-6 grid first; the
    per-doc SUM (error ~1e-12) is rounded back onto that grid, and the
    mean divides the grid value by the token count raw — every output
    bit then matches the oracle without midpoint exposure."""
    toks = documents.select(
        "doc_id", F.explode_outer(tokens(F.col("text"))).alias("token"))
    # persisted: the totals aggregate AND the scoring join both
    # reference the vocab table, and each reference re-ran the full
    # corpus tokenize (optimization r11: 3 -> 2 tokenize passes; the
    # textops vocab-persist precedent, vocab-bounded rows)
    uni = toks.where(F.col("token").isNotNull()) \
              .groupBy("token").agg(F.count(F.lit(1)).alias("_c")) \
              .persist()
    totals = uni.agg(
        F.sum("_c").cast("bigint").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("_v"))
    lp = F.round(
        F.log((F.col("_c") + F.lit(k))
              / (F.col("_n") + F.lit(k) * F.col("_v"))), 6)
    out = (
        toks.join(uni, "token", "left")
        .join(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("token").alias("n_tokens"),
            F.round(F.sum(lp), 6).alias("sum_logprob"),
        )
        .withColumn("avg_logprob",
                    F.try_divide(F.col("sum_logprob"), F.col("n_tokens")))
    )
    return out.orderBy("doc_id") if sort else out


def tfidf_top_terms(documents: DataFrame, top: int = 3,
                    sort: bool = True) -> DataFrame:
    """Top-*top* TF-IDF terms per document (tf × ln(N_docs/df), the
    classic salience ranking) — what a catalogue search surfaces as
    per-document keywords.

    Scale: document frequency is a count window over the (doc_id,
    token) tf grain PARTITIONED by token — ONE tokenize pass; the
    ranking window is PARTITIONED by doc_id (per-doc top-k, no global
    funnel). idf is rounded to the 1e-6 grid so tf×idf is a
    bit-identical int×grid-double product cross-engine; ties break on
    the term text.

    Why a window and not the tf→df_tbl groupBy+join (r12): tf is
    referenced twice in that shape (df build + scoring join) and
    Catalyst re-executes the tokenize+aggregate per reference — and
    persisting tf is the REJECTED r11 A/B (corpus-sized string rows,
    23 → 88 s at 100×). The count window reads the tf stream once:
    measured 15–59 s → 9 s at 100× (the 59 s tail was the df join
    flipping to a shuffle join on the 100×-vocab table). Straggler
    honesty: the window partition for a token holds one row per
    DISTINCT DOC containing it — bounded by corpus breadth, not by
    occurrences. On a corpus with ~10⁹ docs the stopword partition is
    the straggler and the two-pass groupBy+join form (tokenize twice,
    tiny vocab shuffle) becomes the right trade again; at any depth
    and moderate breadth the single-pass window wins."""
    toks = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("_nd"))
    idf = F.round(F.log(F.col("_nd") / F.col("_df")), 6)
    scored = (
        tf.withColumn("_df", F.count(F.lit(1)).over(
            Window.partitionBy("token")))
        .join(F.broadcast(n_docs))
        .select("doc_id", "token", "tf",
                (F.col("tf") * idf).alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top)
    )
    return out.orderBy("doc_id", "rank") if sort else out


def bigram_logprob(documents: DataFrame, k: float = 0.5,
                   sort: bool = True) -> DataFrame:
    """Per-document mean conditional bigram log-probability under the
    corpus's own add-k model, P(w2|w1) = (c(w1 w2)+k)/(c(w1)+k·V) —
    the step up from :func:`unigram_logprob`: word-ORDER violations
    (shuffled text, concatenation artifacts, wrong-language spans)
    score low even when every unigram is common.

    Scale: ONE tokenize pass builds the model — each token emits
    (w1 = token, w2 = successor-or-null), so the (w1, w2) count table
    carries BOTH grams: bigram counts are the w2-non-null rows and
    unigram counts the per-w1 sums (every token appears exactly once
    as w1, the last token of a doc with w2 = null). That table is
    vocab-bounded and persisted (the textops vocab-persist precedent)
    because v/c1/c2 all derive from it; unpersisted/two-branch, the
    corpus was tokenized 4x (optimization r11: 9 -> 3 scans). Scoring
    joins doc pairs against the model on the raw (w1, w2) strings —
    tokens are short, so hashing the key would not slim the shuffle.
    Same cross-engine grid recipe as unigram_logprob: per-pair ln
    rounded to the 1e-6 grid, per-doc sum rounded back, mean raw."""
    # F.get (0-based, null past the end) rather than element_at: ANSI
    # element_at errors on index == size + 1
    succ_expr = let(tokens(F.col("text")), lambda tk: F.transform(
        tk, lambda x, i: F.struct(
            x.alias("w1"), F.get(tk, i + F.lit(1)).alias("w2"))))
    base = documents.select(
        "doc_id", F.explode(succ_expr).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c12 = base.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_c")).persist()
    c1 = c12.groupBy("w1").agg(F.sum("_c").alias("_c1"))
    v = c1.agg(F.count(F.lit(1)).cast("bigint").alias("_v"))
    c2 = (c12.where(F.col("w2").isNotNull())
          .select("w1", "w2", F.col("_c").alias("_c2")))
    model = (
        c2.join(c1, "w1")
        .join(F.broadcast(v))
        .select("w1", "w2", F.round(
            F.log((F.col("_c2") + F.lit(k))
                  / (F.col("_c1") + F.lit(k) * F.col("_v"))), 6)
            .alias("_lp"))
    )
    per = (
        base.where(F.col("w2").isNotNull())
        .join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.sum("_lp"), 6).alias("sum_logprob"),
        )
    )
    out = (
        documents.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("bigint").alias("n_bigrams"),
            "sum_logprob",
            F.try_divide(F.col("sum_logprob"), F.col("n_bigrams"))
            .alias("avg_logprob"),
        )
    )
    return out.orderBy("doc_id") if sort else out


def length_histogram(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Document-length histogram on decimal-digit buckets (bucket =
    number of digits in n_chars: 2 → tens, 3 → hundreds, ...) with
    per-bucket count and exact min/max/mean length. Digit-count
    bucketing is integer-exact in every engine — no log() ulp risk at
    bucket boundaries (ln/log2 of an exact power can round either way;
    string length of the integer cannot).

    One partial-aggregated shuffle carrying ≤ 20 bucket rows; the mean
    is avg of bigint (sum/count of exact ints → identical IEEE division
    cross-engine)."""
    bucket = F.length(F.col("n_chars").cast("string"))
    out = (
        documents.groupBy(bucket.alias("len_digits"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            # explicit exact-int sum / count instead of avg(): both
            # engines then perform the SAME single IEEE division
            (F.sum("n_chars") / F.count(F.lit(1))).alias("mean_chars"),
        )
    )
    return out.orderBy("len_digits") if sort else out


def drop_short_tail(documents: DataFrame, p: float = 0.10,
                    sort: bool = True) -> DataFrame:
    """Adaptive per-language length cut: drop the shortest *p* fraction
    of each language's documents by (n_chars, doc_id) rank — the
    data-driven alternative to a fixed min-length filter when length
    distributions differ by language.

    Rank-based (discrete) on purpose: a continuous quantile threshold
    interpolates between order statistics and the interpolation
    arithmetic is engine-specific, while "keep rank > floor(p·n)" is
    pure integer comparison — deterministic and oracle-exact. The
    window partitions by lang, so the sort is per-language-partition;
    at 100 TB swap the exact rank for an approx_percentile threshold
    exactly as in stats_profile."""
    w = Window.partitionBy("lang")
    rk = F.row_number().over(w.orderBy("n_chars", "doc_id"))
    n = F.count(F.lit(1)).over(w)
    out = (
        documents.select("doc_id", "lang", "source", "n_chars")
        .withColumn("_rk", rk)
        .withColumn("_n", n)
        .where(F.col("_rk") > F.floor(F.lit(p) * F.col("_n")))
        .drop("_rk", "_n")
    )
    return out.orderBy("doc_id") if sort else out


def drop_short_tail_approx(documents: DataFrame, p: float = 0.10,
                           accuracy: int = 10_000,
                           sort: bool = True) -> DataFrame:
    """GK twin of :func:`drop_short_tail` — the 100 TB shape its
    docstring names: per-language p-quantile length thresholds from
    ``approx_percentile`` (Greenwald–Khanna quantile
    summary — mergeable map-side partial sketches, NO per-language
    sort task holding corpus/|langs| rows), broadcast back as an
    O(|langs|)-row table, and the keep test becomes a row-local
    ``n_chars >= threshold`` comparison.

    Semantics differ from the exact twin at the boundary ON PURPOSE:
    the rank form drops exactly floor(p·n) docs with (n_chars, doc_id)
    tiebreaks inside a tied length, while a threshold keeps or drops a
    tied length as a block (± the GK ε·n rank error) — so this is
    rows-only, pinned by property tests (keep rate within ε+tie-mass
    of 1−p; every kept doc at least as long as every dropped doc of
    its language). Like the other GK twins this is NOT a local[32]
    wall win — the exact form's per-lang sort is cheap on 32 threads —
    it exists for the 1000-executor shape where one language holds a
    data-sized partition (CLAUDE.md: don't "optimize" it away on
    local numbers)."""
    thr = documents.groupBy("lang").agg(
        F.approx_percentile("n_chars", F.lit(float(p)),
                            F.lit(accuracy)).alias("_thr"))
    out = (
        documents.select("doc_id", "lang", "source", "n_chars")
        .join(F.broadcast(thr), "lang")
        .where(F.col("n_chars") >= F.col("_thr"))
        .select("doc_id", "lang", "source", "n_chars")
    )
    return out.orderBy("doc_id") if sort else out


def token_budget_sample(documents: DataFrame, budget: int = 2000,
                        salt: str = "budget",
                        sort: bool = True) -> DataFrame:
    """Per-source token-budget sampling: walk each source's documents
    in salted-md5 order (uniform, reproducible, append-stable) and
    keep documents while the source's cumulative token count stays
    within *budget* — how a mixture recipe expressed in TOKENS (the
    unit training actually consumes) gets materialized, where
    fraction-based sampling (:func:`sample_source_mix`) would over- or
    under-shoot on sources with skewed document lengths.

    One shuffle on source; the running sum is a per-source ordered
    window over integers — deterministic cross-engine, linear per
    partition. The first document that would cross the budget is
    EXCLUDED (strict ≤ budget semantics)."""
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col("doc_id").cast("string")))
    base = documents.select(
        "doc_id", "source",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        h.alias("_h"),
    )
    w = (Window.partitionBy("source").orderBy("_h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    out = (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= budget)
        .drop("_h")
    )
    return out.orderBy("doc_id") if sort else out


def quality_by_source(documents: DataFrame, cut: float = 0.75,
                      sort: bool = True) -> DataFrame:
    """Per-source quality data-card: document count, mean composite
    quality score, and the count/share of documents under the *cut* —
    the rollup that decides which sources need cleaning before a
    release.

    The composite score is a sum of 0.25 steps (exact dyadic doubles:
    sums are order-independent and bit-identical in any engine), so
    mean = raw sum/count needs no rounding; the low share is a raw
    int/int quotient. One AQE-decided join (score frame back to its
    source label) + one rollup shuffle."""
    scored = quality_score(documents, sort=False).select(
        "doc_id", "quality_score")
    j = documents.select("doc_id", "source").join(scored, "doc_id")
    out = (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("quality_score") / F.count(F.lit(1))).alias("mean_score"),
            F.sum((F.col("quality_score") < cut).cast("bigint"))
            .alias("n_below"),
        )
        .withColumn("low_share", F.col("n_below") / F.col("n_docs"))
    )
    return out.orderBy("source") if sort else out


def char_entropy(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Per-document Shannon entropy (bits) of the character
    distribution — near-zero entropy flags degenerate/repetitive text
    (aaaa..., padding), abnormally high entropy flags binary-ish noise;
    both are standard pretraining drop signals complementing
    :func:`quality_score` and :func:`repetition_metrics`.

    Pure per-row array math in codegen: split to chars, count each
    distinct char with an in-array scan (O(d·n) per row on bounded
    alphabets), fold -Σ p·log2(p). Rows-only: log() differs by ulps
    between engines (working-notes rule), so accuracy is pinned by a
    pytest property test against a plain-Python reference instead of a
    SQL oracle."""
    def ent(chars):
        n = F.size(chars)
        probs = F.transform(
            F.array_distinct(chars),
            lambda d: F.size(F.filter(chars, lambda c: c == d)) / n,
        )
        h = -F.aggregate(
            probs, F.lit(0.0),
            lambda acc, p: acc + p * F.log2(p),
        )
        return F.struct(
            n.cast("bigint").alias("n_chars_counted"),
            F.when(n > 0, h).otherwise(F.lit(0.0)).alias("entropy_bits"),
        )

    out = documents.select(
        "doc_id",
        let(F.split(F.coalesce(F.col("text"), F.lit("")), ""), ent).alias("e"),
    ).select("doc_id", "e.n_chars_counted", "e.entropy_bits")
    return out.orderBy("doc_id") if sort else out


def lang_purity_by_source(documents: DataFrame,
                          sort: bool = True) -> DataFrame:
    """Per-source language purity: share of documents whose predicted
    language (:func:`lang_id`) agrees with the labeled ``lang`` column
    — the mislabeling data-card that decides whether a source's lang
    metadata can be trusted for routing/splitting.

    Reuses the sort=False lang_id pass; one AQE-decided id join and a
    count rollup; shares are raw int/int quotients."""
    pred = lang_id(documents, sort=False).select("doc_id", "lang_pred")
    j = documents.select("doc_id", "source", "lang").join(pred, "doc_id")
    out = (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("lang_pred") == F.col("lang")).cast("bigint"))
            .alias("n_match"),
        )
        .withColumn("purity", F.col("n_match") / F.col("n_docs"))
    )
    return out.orderBy("source") if sort else out


def source_unigram_jsd(documents: DataFrame,
                       sort: bool = True) -> DataFrame:
    """Per-source corpus-drift data card: Jensen–Shannon divergence
    between each source's unigram distribution and the whole-corpus
    distribution — the statistic a mixture pipeline watches to catch a
    source whose content has drifted (or was swapped) before it
    poisons a training run. Returns (source, n_tokens, jsd); JSD is in
    nats, 0 = identical, ln 2 = disjoint.

    JSD(P‖G) = ½·Σₜ p·ln(p/m) + ½·Σₜ g·ln(g/m), m = (p+g)/2, summed
    over the GLOBAL vocabulary per source (a token the source lacks
    still contributes g·ln 2 mass on the G side — dropping those rows
    would understate drift for small sources), via a
    |sources| × |vocab| spine — bounded by vocabulary size, never by
    corpus rows; token counting is the one corpus-sized pass.

    Determinism ladder (CLAUDE.md ln recipe): p and g are raw int/int
    divisions of exact counts (bit-identical); each ln is snapped to
    the 1e-6 grid before multiplying by the raw probability; the
    per-source sum runs through an ORDERED cumulative window over the
    token spine (plain double groupBy sums are merge-order-
    nondeterministic), and the ½-weights combine raw."""
    tok = documents.select(
        "source", F.explode(tokens(F.col("text"))).alias("t"))
    # persisted: src_tot, the global vocab rollup and the spine join
    # all reference this frame, and each reference re-ran the corpus
    # tokenize (optimization r11: 7 -> 1 documents scans). Bounded
    # |sources| x |vocab| integer rows — the textops vocab-persist
    # precedent.
    per_src = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).alias("c")).persist()
    src_tot = per_src.groupBy("source").agg(
        F.sum("c").alias("n_tokens"))
    vocab = per_src.groupBy("t").agg(F.sum("c").alias("gc"))
    g_tot = vocab.agg(F.sum("gc").alias("gt"))
    spine = (
        src_tot.crossJoin(F.broadcast(vocab.crossJoin(g_tot)))
        .join(per_src, ["source", "t"], "left")
        .select(
            "source", "t", "n_tokens",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            "gc", "gt",
        )
    )
    p = F.col("c") / F.col("n_tokens")
    g = F.col("gc") / F.col("gt")
    m = (p + g) / 2
    terms = spine.select(
        "source", "t", "n_tokens",
        F.when(F.col("c") > 0,
               p * F.round(F.log(p / m), 6)).otherwise(F.lit(0.0))
        .alias("_pt"),
        (g * F.round(F.log(g / m), 6)).alias("_gt"),
    )
    w = Window.partitionBy("source").orderBy("t") \
        .rowsBetween(Window.unboundedPreceding, 0)
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("t")))
    out = (
        terms.select(
            "source", "n_tokens",
            F.sum("_pt").over(w).alias("_sp"),
            F.sum("_gt").over(w).alias("_sg"),
            rk.alias("_rk"))
        .where(F.col("_rk") == 1)
        .select("source", "n_tokens",
                (F.lit(0.5) * F.col("_sp") + F.lit(0.5) * F.col("_sg"))
                .alias("jsd"))
    )
    return out.orderBy("source") if sort else out


def pmi_collocations(documents: DataFrame, min_count: int = 5,
                     k: int = 20) -> DataFrame:
    """Top-*k* adjacent-token collocations by pointwise mutual
    information — the phrase-mining primitive (Church & Hanks 1990):
    PMI(w1,w2) = ln P(w1,w2) − ln P(w1) − ln P(w2) over the corpus's
    own unigram/bigram counts, so multiword units ("new york") rank
    above frequent-but-independent pairs ("of the"). The corpus-card
    companion of :func:`bigram_logprob` (same count shuffles, opposite
    consumer: model quality there, vocabulary discovery here).
    Returns (w1, w2, n_pair, pmi), PMI descending.

    Cross-engine determinism (CLAUDE.md ln-recipe): every ln() is of
    an INTEGER count, rounded onto the 1e-6 grid before the signed
    sum — ln ulp differences vanish at the grid, the five-term sum of
    grid values is bit-identical in both engines, and the (pmi desc,
    w1, w2) rank is therefore total and stable. PMI is computed from
    counts as ln c₁₂ + ln N·ln... precisely: round6(ln c12) +
    2·round6(ln N) − round6(ln B) − round6(ln c1) − round6(ln c2)
    with N = total tokens, B = total bigrams — no integer products
    that could overflow at corpus scale.

    Scale: ONE tokenize pass — each token emits (w1 = token,
    w2 = successor-or-null), so the persisted (w1, w2) count table
    carries BOTH grams (the bigram_logprob r11 one-pass idiom):
    unigram counts are per-w1 sums, N their total, B the sum of the
    w2-non-null rows, and the *min_count* filter prunes the bigram
    table BEFORE its two unigram joins. Unpersisted/two-branch, the
    corpus was tokenized 4x (optimization r11: 10 -> 1 scans). N/B
    stay 1-row aggregates (audited crossJoin class),
    TakeOrderedAndProject for the top-k — no global sort."""
    succ_expr = let(tokens(F.col("text")), lambda tk: F.transform(
        tk, lambda x, i: F.struct(
            x.alias("w1"), F.get(tk, i + F.lit(1)).alias("w2"))))
    base = documents.select(F.explode(succ_expr).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c12 = base.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_c")).persist()
    c1 = c12.groupBy("w1").agg(F.sum("_c").alias("_c1")) \
        .withColumnRenamed("w1", "w")
    totals = c1.agg(F.sum("_c1").cast("bigint").alias("_n"))
    pairs_only = c12.where(F.col("w2").isNotNull())
    btot = pairs_only.agg(F.sum("_c").cast("bigint").alias("_b"))
    c2 = (pairs_only.select("w1", "w2", F.col("_c").alias("n_pair"))
          .where(F.col("n_pair") >= min_count))
    scored = (
        c2.join(c1.select(F.col("w").alias("w1"),
                          F.col("_c1").alias("_ca")), "w1")
        .join(c1.select(F.col("w").alias("w2"),
                        F.col("_c1").alias("_cb")), "w2")
        .join(F.broadcast(totals))
        .join(F.broadcast(btot))
        .select(
            "w1", "w2", F.col("n_pair").cast("bigint").alias("n_pair"),
            (F.round(F.log("n_pair"), 6)
             + 2 * F.round(F.log("_n"), 6)
             - F.round(F.log("_b"), 6)
             - F.round(F.log("_ca"), 6)
             - F.round(F.log("_cb"), 6)).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(k)


def temperature_mixture_sample(documents: DataFrame,
                               token_budget: int = 100_000,
                               salt: str = "tmix",
                               sort: bool = True) -> DataFrame:
    """Temperature-smoothed source mixing at α = 1/2 (the pretraining
    mixture-reweighting primitive: sample source s with probability
    ∝ n_s^α instead of ∝ n_s, so giant sources stop drowning small
    ones — the multilingual/multi-domain smoothing rule of mBERT/
    mT5-style pipelines): per-source token totals n_s give weights
    w_s = √n_s / Σ√n_t, per-source keep rates
    min(1, token_budget · w_s / n_s), and a deterministic salted-md5
    basis-point cut keeps each document row-locally. Returns the kept
    documents (doc_id, source, doc_tokens), ALL-INTEGER output.

    α is pinned to 1/2 deliberately: n^α for arbitrary α needs
    exp/pow, which differ by ulps between engines — but IEEE sqrt is
    CORRECTLY ROUNDED, so √n_s is bit-identical cross-engine, the
    denominator is a running cumsum in source order (the CLAUDE.md
    deterministic-double-sum recipe; groupBy sums of doubles are
    merge-order-nondeterministic) read back via max(), and every
    subsequent multiply/divide/floor runs on identical bits. The
    keep decision is integer basis points vs md5 (split_train_val's
    engine-reproducible cut).

    Scale: tokenization is row-local; totals are one partial-
    aggregated shuffle; the rate table is #sources rows (the
    source-count-bounded window is the audited ev_power_users class);
    the keep filter joins rates back on source (broadcast-sized) —
    the corpus itself never shuffles."""
    toks = documents.select(
        "doc_id", "source",
        F.size(tokens(F.col("text"))).cast("bigint").alias("doc_tokens"))
    tot = toks.groupBy("source").agg(
        F.sum("doc_tokens").cast("bigint").alias("_ns"))
    wc = (Window.orderBy("source")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    csum = tot.select(
        "source", "_ns",
        F.sum(F.sqrt(F.col("_ns").cast("double"))).over(wc).alias("_cs"))
    den = csum.agg(F.max("_cs").alias("_denom"))
    rates = (
        csum.crossJoin(F.broadcast(den))
        .select(
            "source",
            F.least(
                F.lit(10_000),
                F.floor(F.lit(10_000) * F.lit(float(token_budget))
                        * F.sqrt(F.col("_ns").cast("double"))
                        / F.col("_denom") / F.col("_ns")))
            .cast("bigint").alias("_keep_bp"),
        )
    )
    # 8 hex digits (2^32 states) before the modulus, the layout_zorder
    # idiom: 4 digits (65536 % 10000 = 6: values 0..5535 occur 7/65536
    # vs 6/65536) ran realized keep rates ~9% above nominal at low
    # thresholds (ADVICE r8); with 32 bits the residual non-uniformity
    # is 2^32 % 10000 = 7296 parts in 4.3e9 (~2e-6 relative) — below
    # any observable rate error
    bp = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt),
                                      F.col("doc_id").cast("string"))),
                    1, 8),
        16, 10).cast("bigint") % 10_000
    out = (
        toks.join(F.broadcast(rates), "source")
        .where(bp < F.col("_keep_bp"))
        .select("doc_id", "source", "doc_tokens")
    )
    return out.orderBy("doc_id") if sort else out


def tokenizer_fertility(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Tokenizer-fertility / compression card per (lang, source): how
    many characters and UTF-8 bytes one token "costs" in each corpus
    slice — the standard pre-tokenizer audit before budgeting a
    multilingual mixture (a slice whose bytes-per-token is 2× the
    corpus mean eats 2× the storage/compute per training token).

    All bigint sums in one partial-aggregated shuffle over a bounded
    (lang, source) key space; the ratios are raw int/int divisions
    (IEEE division of identical ints is bit-identical cross-engine —
    the oov_rate rule, CLAUDE.md)."""
    base = documents.select(
        "lang", "source",
        F.length("text").cast("bigint").alias("_chars"),
        F.octet_length("text").cast("bigint").alias("_bytes"),
        token_count(F.col("text")).cast("bigint").alias("_toks"),
    )
    out = base.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_toks").cast("bigint").alias("n_tokens"),
        F.sum("_chars").cast("bigint").alias("n_chars"),
        F.sum("_bytes").cast("bigint").alias("n_bytes"),
    ).select(
        "lang", "source", "n_docs", "n_tokens", "n_chars", "n_bytes",
        F.try_divide(F.col("n_chars"), F.col("n_tokens"))
        .alias("chars_per_token"),
        F.try_divide(F.col("n_bytes"), F.col("n_tokens"))
        .alias("bytes_per_token"),
        F.try_divide(F.col("n_bytes"), F.col("n_chars"))
        .alias("bytes_per_char"),
        F.try_divide(F.col("n_tokens"), F.col("n_docs"))
        .alias("tokens_per_doc"),
    )
    return out.orderBy("lang", "source") if sort else out


def perplexity_buckets(documents: DataFrame, k: float = 0.5,
                       n_buckets: int = 3,
                       sort: bool = True) -> DataFrame:
    """CCNet-style per-language perplexity bucketing: score every doc
    by mean unigram log-prob under the corpus's own add-k model (the
    :func:`unigram_logprob` recipe), then split each language into
    *n_buckets* equal-count tiles by score — head (most fluent),
    middle, tail. CCNet keeps head+middle per language and drops the
    tail; downstream mixture ops consume the bucket label.

    Docs with zero tokens are excluded (they have no perplexity).

    Scale: the per-lang rank is NOT a per-lang global window (a
    language is a data-sized group — the GROUP_SIZE_WINDOW straggler
    class). Rank = row_number within (lang, score-bucket) + the
    broadcast prefix count of better buckets in the same lang — the
    histogram_rank decomposition with a compound bucket; the bucket
    alphabet is bounded (score is a mean log-prob, floor(score·16)
    spans a few hundred cells), so the side table is never data-sized
    and the largest single task is one (lang, cell). Honest local
    A/B (sf10bd, 206k-row dominant lang): the naive per-lang window
    measured 5.7 s vs 6.3 s here — groups that small don't straggle
    on 32 threads and the decomposition pays two extra bounded
    joins. Like the GK twins, this shape exists for the real corpus
    (one language IS most of a crawl; a 10B-doc 'en' group on one
    rank task is a non-starter), not for the local wall clock.

    Cross-engine: avg_logprob bits are identical by the ln-grid
    recipe; tiles are integer math on (rank, n) with (score DESC,
    doc_id) a total order; the oracle uses the plain per-lang
    row_number formulation — same rank by construction."""
    toks = documents.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("token"))
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("_c"))
    totals = uni.agg(
        F.sum("_c").cast("bigint").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("_v"))
    lp = F.round(
        F.log((F.col("_c") + F.lit(k))
              / (F.col("_n") + F.lit(k) * F.col("_v"))), 6)
    per = (
        toks.join(uni, "token")
        .join(F.broadcast(totals))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.sum(lp), 6).alias("_slp"),
        )
        .withColumn("avg_logprob",
                    F.try_divide(F.col("_slp"), F.col("n_tokens")))
    )
    # negate the cell index so ascending cell order == descending score
    # persist: counts + ranked both reference this frame, and Catalyst
    # re-executes the whole scoring subtree (explode + unigram join +
    # per-doc agg) per reference (the histogram_ntile persist rule);
    # ccnet_filter inherits the single execution.
    # LIFETIME: the handle lives until session clearCache/LRU — the
    # returned frame is lazy, so unpersisting here would defeat the
    # point, and a restructure can't work (ranking JOINS the side
    # table, so side must exist before rank — the references are
    # inherently two). Callers that score repeatedly in one session
    # (bench best-of-N does) should spark.catalog.clearCache()
    # between calls; bench.py already does per query.
    scored = per.withColumn(
        "_vb", (-F.floor(F.col("avg_logprob") * 16)).cast("bigint")
    ).persist()
    counts = scored.groupBy("lang", "_vb").agg(
        F.count(F.lit(1)).alias("_cnt"))
    ws = Window.partitionBy("lang").orderBy("_vb")
    side = counts.select(
        "lang", "_vb",
        F.coalesce(
            F.sum("_cnt").over(
                ws.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("_off"),
        F.sum("_cnt").over(
            ws.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)).alias("_nl"),
    )
    wp = Window.partitionBy("lang", "_vb").orderBy(
        F.desc("avg_logprob"), F.asc("doc_id"))
    ranked = (
        scored.withColumn("_pos", F.row_number().over(wp))
        .join(F.broadcast(side), ["lang", "_vb"])
        .withColumn("_rnk", F.col("_off") + F.col("_pos"))
    )
    idx = (F.lit(1) + F.expr(
        f"({n_buckets} * (_rnk - 1)) div _nl")).cast("bigint")
    label = (
        F.when(F.lit(n_buckets) == 3,
               F.element_at(F.array(F.lit("head"), F.lit("middle"),
                                    F.lit("tail")), idx.cast("int")))
        .otherwise(F.concat(F.lit("b"), idx.cast("string")))
    )
    out = ranked.select(
        "doc_id", "lang", "n_tokens", "avg_logprob",
        idx.alias("bucket"), label.alias("ppl_bucket"))
    return out.orderBy("doc_id") if sort else out


def quality_logit(documents: DataFrame,
                  sort: bool = True) -> DataFrame:
    """Frozen linear quality classifier (the fastText-style scoring
    step of a pretraining filter, run with pinned weights): integer
    basis-point features × integer micro-unit weights → an exact
    bigint margin, keep = margin ≥ 0. Where :func:`quality_score` is
    a 4-rule checklist, this is the weighted-margin form a trained
    linear model produces — the weights here are frozen illustrative
    values calibrated on the synthetic corpus (a real deployment
    swaps in its trained vector; the plumbing — feature extraction,
    fixed-point margin, thresholding — is the operator).

    Every feature is integer floor-division fixed-point (mean word
    length in centi-chars, punct/digit/stopword rates in basis
    points), so the margin is exact bigint arithmetic — bit-identical
    cross-engine at any scale, no double midpoints anywhere. One
    row-local projection inside whole-stage codegen; zero shuffles."""
    def feats(toks):
        n_toks = F.size(toks).cast("bigint")
        char_sum = F.aggregate(toks, F.lit(0).cast("bigint"),
                               lambda acc, t: acc + F.length(t))
        sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        hits = F.size(F.filter(
            toks, lambda t: F.array_contains(sw, t))).cast("bigint")
        return F.struct(
            n_toks.alias("n_tokens"),
            char_sum.alias("char_sum"),
            hits.alias("sw_hits"),
        )

    n_chars = F.length("text").cast("bigint")
    punct_chars = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), r"[^\w\s]", ""))
    ).cast("bigint")
    digit_chars = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), r"[0-9]", ""))
    ).cast("bigint")
    base = documents.select(
        "doc_id",
        let(tokens(F.col("text")), feats).alias("f"),
        n_chars.alias("_nc"),
        punct_chars.alias("_pc"),
        digit_chars.alias("_dc"),
    ).select(
        "doc_id",
        F.col("f.n_tokens").alias("n_tokens"),
        F.when(F.col("f.n_tokens") > 0,
               F.expr("(100 * f.char_sum) div f.n_tokens"))
        .otherwise(F.lit(0)).cast("bigint").alias("mwl_c"),
        F.expr("(10000 * _pc) div greatest(_nc, 1)")
        .cast("bigint").alias("punct_bp"),
        F.expr("(10000 * _dc) div greatest(_nc, 1)")
        .cast("bigint").alias("digit_bp"),
        F.when(F.col("f.n_tokens") > 0,
               F.expr("(10000 * f.sw_hits) div f.n_tokens"))
        .otherwise(F.lit(0)).cast("bigint").alias("sw_bp"),
    )
    margin = (
        F.lit(-500_000).cast("bigint")
        + F.lit(150) * F.least(F.col("n_tokens"), F.lit(2000))
        + F.lit(800) * F.least(F.col("sw_bp"), F.lit(3000))
        - F.lit(900) * F.col("punct_bp")
        - F.lit(700) * F.col("digit_bp")
        + F.when((F.col("mwl_c") >= 200) & (F.col("mwl_c") <= 1200),
                 F.lit(400_000)).otherwise(F.lit(0))
    ).cast("bigint")
    out = base.select(
        "doc_id", "n_tokens", "mwl_c", "punct_bp", "digit_bp", "sw_bp",
        margin.alias("margin_micro"),
        (margin >= 0).alias("keep"),
    )
    return out.orderBy("doc_id") if sort else out


def heaps_curve(documents: DataFrame, checkpoints: int = 10,
                sort: bool = True) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: split the corpus into
    *checkpoints* equal-count prefixes in ingestion (doc_id) order and
    report, at each checkpoint, cumulative docs, cumulative token
    occurrences N, cumulative distinct vocabulary V, plus grid-rounded
    ln(N) and ln(V) ready for an OLS fit of Heaps' V ≈ k·N^β (compose
    with ts_ols_trend on (ln_tokens, ln_vocab); β ≈ 0.4-0.6 for
    natural language — a β near 1 flags ID-like/gibberish token
    streams, near 0 flags templated text).

    Scale: tile assignment is layout.histogram_ntile over the
    min/max-scaled doc_id BUCKET (the fileplan_linear idiom, ≤2^bits
    cells — raw doc_id as the bucket would make histogram_rank's side
    table one row per document, the data-sized-broadcast class the
    primitive's contract bans; the bucket is monotone in doc_id so
    tile math is unchanged); V per tile is "tokens whose FIRST tile
    is t" — one min-aggregate over the (token) shuffle — so the
    cumulative curve is a window over *checkpoints* rows, never data.
    Oracle: ntile(k) OVER (ORDER BY doc_id) is the exact same integer
    tile math (histogram_ntile's contract); ln values land on the
    1e-6 grid in both engines."""
    from pyperustats_spark.operators.layout import (
        _bounds, _bucket, histogram_ntile)

    base = documents.select("doc_id", "text")
    b = base.crossJoin(F.broadcast(_bounds(base, ["doc_id"])))
    z = b.select(
        "doc_id", "text",
        _bucket(F.col("doc_id"), F.col("_lo_doc_id"),
                F.col("_hi_doc_id"), 8).alias("_db"))
    tiled = histogram_ntile(
        z, F.col("_db"), [F.col("doc_id")], checkpoints,
        out_col="_tile").drop("_db")
    toks = tiled.select(
        "_tile", F.explode(tokens(F.col("text"))).alias("token"))
    # docs and token occurrences in ONE per-tile pass: size(tokens())
    # equals the exploded row count per doc, so the separate explode
    # branch for occurrences (a third execution of the tiled subtree
    # and a second full tokenize) collapses into this aggregate
    # (optimization r11: 11 -> 7 documents scans in the plan)
    docs_per = tiled.groupBy("_tile").agg(
        F.count(F.lit(1)).cast("bigint").alias("_docs"),
        F.sum(F.coalesce(F.size(tokens(F.col("text"))), F.lit(0)))
        .cast("bigint").alias("_occ"))
    first = toks.groupBy("token").agg(F.min("_tile").alias("_tile"))
    new_per = first.groupBy("_tile").agg(
        F.count(F.lit(1)).cast("bigint").alias("_new"))
    wc = Window.orderBy("_tile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    out = (
        docs_per
        .join(new_per, "_tile", "left")
        .select(
            F.col("_tile").cast("bigint").alias("checkpoint"),
            F.sum("_docs").over(wc).cast("bigint").alias("n_docs"),
            F.sum(F.coalesce(F.col("_occ"), F.lit(0)))
            .over(wc).cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce(F.col("_new"), F.lit(0)))
            .over(wc).cast("bigint").alias("vocab"),
        )
        .select(
            "checkpoint", "n_docs", "n_tokens", "vocab",
            F.when(F.col("n_tokens") > 0,
                   F.round(F.log("n_tokens"), 6)).alias("ln_tokens"),
            F.when(F.col("vocab") > 0,
                   F.round(F.log("vocab"), 6)).alias("ln_vocab"),
        )
    )
    return out.orderBy("checkpoint") if sort else out


def dsir_importance_sample(documents: DataFrame, target_lang: str = "en",
                           n_feat: int = 1024, k: float = 0.5,
                           top: int = 200) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023, arXiv:2302.03169): score every document by how much more
    likely its hashed-unigram features are under a TARGET slice's
    bag-of-words distribution than under the RAW corpus distribution,
    and keep the top scorers. Here the target slice is
    ``lang = target_lang`` (a real pipeline points it at a trusted
    high-quality subset); features are md5-hashed unigrams in
    *n_feat* buckets, per-bucket weight
    w[b] = ln p̂_target(b) − ln p̂_raw(b) (add-k smoothed), per-doc
    importance = mean token weight, selection = top-*top* by
    (importance DESC, doc_id).

    Scale: both distributions are ONE token→bucket count shuffle off
    the same exploded frame; the weight table is n_feat rows —
    broadcast back, so scoring is a map-side join; top-k is the
    standard funnel. Cross-engine: the md5 bucket is exact; each
    ln is grid-rounded and the two-ln difference stays on the grid,
    the per-doc sum is rounded back (fp error ≪ grid), the mean
    divides the grid value by the int count raw (unigram_logprob
    recipe)."""
    toks = documents.select(
        "doc_id", "lang",
        F.explode(tokens(F.col("text"))).alias("token"),
    ).withColumn(
        "_b",
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10)
        .cast("bigint") % n_feat)
    # persisted: the totals aggregate and the weight table both
    # reference this frame, and each reference re-ran the corpus
    # tokenize (optimization r11: 3 -> 2 tokenize passes). Bounded
    # n_feat integer rows.
    raw = toks.groupBy("_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_cr"),
        F.sum(F.when(F.col("lang") == target_lang, 1).otherwise(0))
        .cast("bigint").alias("_ct"),
    ).persist()
    tot = raw.agg(
        F.sum("_cr").cast("bigint").alias("_nr"),
        F.sum("_ct").cast("bigint").alias("_nt"))
    w = raw.crossJoin(F.broadcast(tot)).select(
        "_b",
        (F.round(F.log((F.col("_ct") + F.lit(k))
                       / (F.col("_nt") + F.lit(k) * F.lit(n_feat))), 6)
         - F.round(F.log((F.col("_cr") + F.lit(k))
                         / (F.col("_nr") + F.lit(k) * F.lit(n_feat))), 6)
         ).alias("_w"),
    )
    per = (
        toks.join(F.broadcast(w), "_b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.sum("_w"), 6).alias("sum_logratio"),
        )
        .withColumn("importance",
                    F.try_divide(F.col("sum_logratio"),
                                 F.col("n_tokens")))
    )
    return (per.select("doc_id", "lang", "n_tokens", "importance")
            .orderBy(F.desc("importance"), "doc_id").limit(top))


def ccnet_filter(documents: DataFrame, k: float = 0.5,
                 keep_buckets: int = 2, sort: bool = True) -> DataFrame:
    """The CCNet keep rule applied: score + bucket every doc with
    :func:`perplexity_buckets` and keep the *keep_buckets* most fluent
    tiles per language (default head+middle, dropping the tail third —
    CCNet's published recipe). Returns the kept docs with their
    (lang, source, n_tokens, avg_logprob, ppl_bucket) so the next
    mixture stage can weight by bucket.

    Composition note: source comes from a second PRUNED leaf scan of
    documents joined on doc_id — the keep-set semi-join-back idiom
    (the scored frame derives from the tokens branch; flagging rows
    in-branch would drag the whole scoring subtree into a second
    reference, which Catalyst re-executes per reference)."""
    scored = perplexity_buckets(documents, k=k, n_buckets=3, sort=False)
    kept = scored.where(F.col("bucket") <= keep_buckets)
    src = documents.select("doc_id", "source")
    out = kept.join(src, "doc_id").select(
        "doc_id", "lang", "source", "n_tokens", "avg_logprob",
        "ppl_bucket")
    return out.orderBy("doc_id") if sort else out


def length_drift_by_source(documents: DataFrame,
                           sort: bool = True) -> DataFrame:
    """Distribution-drift card: for every source, the KS-style L∞
    distance between ITS document-length distribution and the rest of
    the corpus — the standard "did this crawl/source shift?" monitor
    (a new boilerplate template or truncation bug shows up as a length
    distribution jump long before eyeballing text does).

    Lengths are bucketed to two significant decimal digits (bucket =
    digits·100 + leading-two-digits — pure integer math, log-spaced,
    ≤ ~90 cells per decade), so the statistic is the exact L∞ gap of
    the bucketed ECDFs: max over cells |F_s − F_rest|. The docstring
    calls it KS-style deliberately: it is the KS statistic OF THE
    BUCKETED distribution (the honest bounded-grid form — an exact
    per-value ECDF needs the full distinct-length universe, which is
    data-sized; two-digit cells keep the grid ≤ sources × ~700 rows
    at ANY corpus size).

    Cross-engine: cumulative counts are exact bigints on a dense
    (source × cell) grid; the two ECDFs are int/int divisions
    (bit-identical), the max of identical doubles is deterministic.

    Scale: one (source, cell) count shuffle + two bounded side
    aggregates; the window cumsum runs over the bounded grid, never
    over data."""
    # leading-two-digits via the decimal string, NOT n div pow(10, d-2):
    # pow is not correctly rounded IEEE (CLAUDE.md), and an off-by-ulp
    # 10^k truncated to bigint silently shifts every cell boundary
    b_digits = F.length(F.col("n_chars").cast("string")).cast("bigint")
    f2 = F.expr("cast(substring(cast(n_chars as string), 1, 2) as bigint)")
    cell = F.when(b_digits >= 2, b_digits * 100 + f2) \
            .otherwise(F.lit(100) + F.col("n_chars")).cast("bigint")
    base = documents.select("source", cell.alias("_cell"))
    # four downstream branches reference this frame and each re-runs
    # the scan — but the scan is column-pruned to ONE int (n_chars),
    # so persisting the grid was A/B'd SLOWER at sf0.1 (1.26 -> 1.57 s)
    # and flat at the 100x depth set (r11): the materialization
    # barrier costs more than four integer-column scans. Left lazy.
    counts = base.groupBy("source", "_cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"))
    src_tot = counts.groupBy("source").agg(
        F.sum("_c").cast("bigint").alias("_ns"))
    cells = counts.select("_cell").distinct()
    tot = src_tot.agg(F.sum("_ns").cast("bigint").alias("_n"))
    grid = (
        src_tot.select("source", "_ns").crossJoin(F.broadcast(cells))
        .join(counts, ["source", "_cell"], "left")
        .select("source", "_ns", "_cell",
                F.coalesce(F.col("_c"), F.lit(0)).alias("_c"))
    )
    wc = Window.partitionBy("source").orderBy("_cell").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = grid.select(
        "source", "_ns", "_cell",
        F.sum("_c").over(wc).cast("bigint").alias("_cum"))
    gcum_w = Window.orderBy("_cell").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    gcum = (
        counts.groupBy("_cell").agg(F.sum("_c").cast("bigint").alias("_g"))
        .select("_cell", F.sum("_g").over(gcum_w).cast("bigint")
                .alias("_gcum"))
    )
    d = (
        cum.join(F.broadcast(gcum), "_cell")
        .join(F.broadcast(tot))
        .select(
            "source", "_ns",
            F.abs(
                (F.col("_cum") / F.col("_ns"))
                - F.try_divide(F.col("_gcum") - F.col("_cum"),
                               F.col("_n") - F.col("_ns"))
            ).alias("_d"))
        .groupBy("source")
        .agg(F.max("_ns").alias("n_docs"), F.max("_d").alias("ks_stat"))
    )
    out = d.select("source", F.col("n_docs").cast("bigint").alias("n_docs"),
                   "ks_stat")
    return out.orderBy("source") if sort else out


def filter_funnel(documents: DataFrame) -> DataFrame:
    """Per-rule attribution funnel for the Gopher-style quality filter
    cascade: for each rule, how many docs fail IT (marginal) and how
    many are dropped by the cascade up to and including it
    (cumulative) — the card a curation run publishes so a rule that
    silently eats a corpus slice is visible BEFORE training (the
    "which filter did the damage" question quality_filter's single
    score cannot answer).

    Seven row-local rules reusing the quality/repetition features
    (length bounds, mean word length, punctuation, stopword density,
    Gopher dup-token and top-token fractions). One scan, one 1-row
    aggregate (audited q_market_share class), stacked to 7 rows.
    All-integer output; ratio comparisons happen on bit-identical
    int/int doubles in both engines, so every fail flag matches."""
    def flags(toks):
        n = F.size(toks).cast("bigint")
        char_sum = F.aggregate(toks, F.lit(0).cast("bigint"),
                               lambda acc, t: acc + F.length(t))
        mwl = F.try_divide(char_sum, n)
        sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        swd = F.try_divide(hits, n)
        dis = F.size(F.array_distinct(toks)).cast("bigint")
        dup = F.lit(1.0) - F.try_divide(dis, n)
        top = F.try_divide(
            F.array_max(F.transform(
                F.array_distinct(toks),
                lambda d: F.size(F.filter(toks, lambda t: t == d)))), n)
        pr = punct_ratio(F.col("text"))
        return F.struct(
            (n < 10).cast("bigint").alias("f1"),
            (n > 100000).cast("bigint").alias("f2"),
            ((n > 0) & ((mwl < 2.0) | (mwl > 12.0)))
            .cast("bigint").alias("f3"),
            (pr > 0.2).cast("bigint").alias("f4"),
            ((n > 0) & (swd < 0.02)).cast("bigint").alias("f5"),
            (dup > 0.3).cast("bigint").alias("f6"),
            (top > 0.2).cast("bigint").alias("f7"),
        )

    RULES = ("min_tokens", "max_tokens", "mean_word_len",
             "punct_ratio", "stopword_density", "dup_token_frac",
             "top_token_frac")
    base = documents.select(let(tokens(F.col("text")), flags).alias("f"))
    cums = []
    acc = None
    for i in range(1, 8):
        fi = F.col(f"f.f{i}")
        acc = fi if acc is None else F.greatest(acc, fi)
        cums.append(acc.alias(f"c{i}"))
    per = base.select("f", *cums)
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[F.coalesce(F.sum(f"f.f{i}"), F.lit(0)).cast("bigint")
          .alias(f"m{i}") for i in range(1, 8)],
        *[F.coalesce(F.sum(f"c{i}"), F.lit(0)).cast("bigint")
          .alias(f"s{i}") for i in range(1, 8)],
    )
    rows = F.array(*[
        F.struct(
            F.lit(i).cast("bigint").alias("rule_no"),
            F.lit(RULES[i - 1]).alias("rule"),
            F.col(f"m{i}").alias("n_fail"),
            F.col(f"s{i}").alias("n_dropped_cum"),
            (F.col("n_docs") - F.col(f"s{i}")).alias("n_pass_cum"),
        )
        for i in range(1, 8)
    ])
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.rule_no", "r.rule", "r.n_fail", "r.n_dropped_cum",
                "r.n_pass_cum")
        .orderBy("rule_no")
    )


def script_mix(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Unicode script-class profile per document: counts of Latin,
    Cyrillic, CJK, Arabic and digit characters (regexp class sweeps —
    one JVM pass each, no tokenization) plus the dominant script
    label. The cheap precursor to :func:`lang_id`: a mixed-script doc
    (spam, encoding damage, code-switching) is flagged before any
    stopword model runs, and script shares feed multilingual mixture
    planning.

    Counts are exact ints (length minus length-after-removal — the
    punct_ratio idiom); shares are raw int/int doubles. Dominant
    label ties resolve in fixed class order. Zero shuffles."""
    def cnt(cls):
        return (F.length("text")
                - F.length(F.regexp_replace(F.col("text"),
                                            f"[{cls}]", ""))).cast("bigint")

    classes = [
        ("latin", "A-Za-z"),
        ("cyrillic", "Ѐ-ӿ"),
        ("cjk", "一-鿿"),
        ("arabic", "؀-ۿ"),
        ("digit", "0-9"),
    ]
    base = documents.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        *[cnt(cls).alias(f"n_{name}") for name, cls in classes],
    )
    best = F.greatest(*[F.col(f"n_{name}") for name, _ in classes[:4]])
    label = F.when(best == 0, F.lit("none"))
    for name, _ in classes[:4]:
        label = label.when(F.col(f"n_{name}") == best, F.lit(name))
    out = base.select(
        "doc_id", "n_chars",
        *[f"n_{name}" for name, _ in classes],
        label.alias("dominant_script"),
        F.try_divide(
            F.col("n_latin") + F.col("n_cyrillic") + F.col("n_cjk")
            + F.col("n_arabic"),
            F.col("n_chars")).alias("letter_share"),
    )
    return out.orderBy("doc_id") if sort else out


def simpson_diversity(documents: DataFrame, sort: bool = True) -> DataFrame:
    """Simpson diversity card per language: the probability that two
    tokens drawn WITHOUT replacement from the language's corpus are
    the same type —  D = Σ c(c−1) / (N(N−1))  — plus its inverse
    (the "effective vocabulary size"). The unbiased finite-sample
    companion of :func:`~pyperustats_spark.operators.events.
    user_entropy`-style Shannon cards: a template-spam language slice
    (one type dominating) pushes D toward 1 and 1/D toward 1, a
    healthy natural-language slice keeps 1/D in the hundreds —
    complementary to Zipf/Heaps fits for mixture QA.

    Exactness: token counts are integers; Σ c(c−1) and N(N−1)
    accumulate in DECIMAL(38,0) (c² would overflow bigint on a
    boilerplate token near c ~ 3·10⁹), and D is one exact-int-cast
    double division — bit-identical cross-engine, no ln anywhere.
    Slices with N ≤ 1 yield NULLs via the same guard.

    Scale shape: one explode + one (lang, token) partial-aggregated
    shuffle, then a per-lang rollup — the unigram-model class; no
    windows, nothing data-sized on one task."""
    toks = documents.select(
        "lang", F.explode_outer(tokens(F.col("text"))).alias("_t"))
    tc = toks.where(F.col("_t").isNotNull()) \
        .groupBy("lang", "_t") \
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))

    def dec(c):
        return c.cast("decimal(38,0)")

    per = tc.groupBy("lang").agg(
        F.sum("_c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(dec(F.col("_c")) * (F.col("_c") - 1)).alias("_s2"),
    )
    d = (F.col("_s2").cast("double")
         / (dec(F.col("n_tokens")) * (F.col("n_tokens") - 1))
         .cast("double"))
    out = per.select(
        "lang", "n_tokens", "vocab_size",
        F.when(F.col("n_tokens") > 1, d).alias("simpson"),
        F.when((F.col("n_tokens") > 1) & (F.col("_s2") > 0),
               F.lit(1.0) / d).alias("inv_simpson"),
    )
    return out.orderBy("lang") if sort else out


def log_odds_terms(documents: DataFrame, k: int = 10,
                   min_count: int = 3, sort: bool = True) -> DataFrame:
    """"Fightin' Words" keyword extraction per language — Monroe,
    Colaresi & Quinn's smoothed log-odds-ratio (Political Analysis
    16(4), 2008) with a symmetric +1 Dirichlet prior: for each
    language slice vs the REST of the corpus,

        delta_w = ln[(y+1)/(n+V−y−1)] − ln[(y'+1)/(n'+V−y'−1)]
        z_w = delta_w / sqrt(1/(y+1) + 1/(y'+1))

    and the top-*k* terms by delta are the words that mark the slice.
    Unlike tf-idf (which rewards rarity anywhere), log-odds
    explicitly contrasts against the complement with
    variance-stabilized smoothing — the standard corpus-comparison
    tool for mixture QA ("what vocabulary does this source/language
    over-contribute?").

    Cross-engine determinism: with the +1 prior every odds ratio is
    a ratio of EXACT INTEGERS, so each ln((y+1)/(den)) divides
    identical bits and snaps to the 1e-6 grid; delta is then an
    exact INTEGER difference of micro-lns (ranking and tiebreaks are
    pure integer+string comparisons), and z divides the de-scaled
    delta by a sqrt-of-sums tree — correctly rounded ops on
    identical bits throughout. min_count prunes the long tail BEFORE
    ranking in both engines.

    Scale shape: one explode into the (lang, token) count grid
    (persisted — the token-marginal groupBy and the per-lang join
    both reference it; the textops vocab-persist precedent), a
    token-marginal join keyed on token, broadcast lang totals, then
    a top-k window over the pruned vocab-bounded candidate set."""
    tc = documents.select(
        "lang", F.explode(tokens(F.col("text"))).alias("_t")) \
        .groupBy("lang", "_t") \
        .agg(F.count(F.lit(1)).cast("bigint").alias("_y")) \
        .persist()
    tot_w = tc.groupBy("_t").agg(
        F.sum("_y").cast("bigint").alias("_tw"))
    tot_l = tc.groupBy("lang").agg(
        F.sum("_y").cast("bigint").alias("_nl"))
    glob = tc.agg(
        F.sum("_y").cast("bigint").alias("_n"),
        F.countDistinct("_t").cast("bigint").alias("_v"))
    cand = tc.where(F.col("_y") >= min_count) \
        .join(tot_w, "_t") \
        .join(F.broadcast(tot_l), "lang") \
        .crossJoin(F.broadcast(glob))
    yr = F.col("_tw") - F.col("_y")
    nr = F.col("_n") - F.col("_nl")
    ln_micro = (
        F.round(F.log((F.col("_y") + 1).cast("double")
                      / (F.col("_nl") + F.col("_v") - F.col("_y") - 1)
                      .cast("double")) * 1e6).cast("bigint")
        - F.round(F.log((yr + 1).cast("double")
                        / (nr + F.col("_v") - yr - 1).cast("double"))
                  * 1e6).cast("bigint"))
    scored = cand.select(
        "lang", F.col("_t").alias("term"),
        F.col("_y").alias("lang_count"),
        yr.alias("rest_count"),
        ln_micro.alias("_dm"),
        (F.lit(1.0) / (F.col("_y") + 1).cast("double")
         + F.lit(1.0) / (yr + 1).cast("double")).alias("_var"))
    wr = Window.partitionBy("lang").orderBy(
        F.desc("_dm"), F.col("term").asc())
    out = scored.withColumn("rank", F.row_number().over(wr)) \
        .where(F.col("rank") <= k) \
        .select(
            "lang", F.col("rank").cast("bigint").alias("rank"),
            "term", "lang_count", "rest_count",
            (F.col("_dm").cast("double") / F.lit(1e6))
            .alias("log_odds"),
            ((F.col("_dm").cast("double") / F.lit(1e6))
             / F.sqrt(F.col("_var"))).alias("z_score"))
    return out.orderBy("lang", "rank") if sort else out
