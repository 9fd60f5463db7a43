"""Persistent corpus ledger: ledger-backed release runs must equal the
raw-corpus operators row-for-row, and the ledger side of every
recurring join must plan with ZERO exchanges (the whole point — a
release run's shuffle volume is batch-proportional, never
corpus-proportional)."""

import pytest
from pyspark.sql import functions as F

import pyperustats_spark.plans as P
from pyperustats_spark.operators.dedup import (
    dedup_incremental, exact_substring_decontaminate)
from pyperustats_spark.sources.ledger import CorpusLedger


@pytest.fixture(scope="module")
def split_docs(spark, tables):
    """documents split into two 'releases' + a 'batch' that overlaps
    both (batch rows ARE corpus rows, so dedup/decontamination have
    real hits to find)."""
    docs = tables["documents"]
    rel_a = docs.where(F.col("doc_id") % 3 == 0)
    rel_b = docs.where(F.col("doc_id") % 3 == 1)
    batch = docs.where(F.col("doc_id") % 2 == 0)  # overlaps rel_a AND rel_b
    return rel_a, rel_b, batch


@pytest.fixture(scope="module")
def ledger(spark, split_docs):
    rel_a, rel_b, _ = split_docs
    led = CorpusLedger(spark, "test_corpus_ledger", num_buckets=8)
    led.drop()
    led.append_release(rel_a)
    led.append_release(rel_b)  # second append: the incremental path
    yield led
    led.drop()


def test_ledger_keys_stay_globally_distinct(spark, ledger, split_docs):
    rel_a, rel_b, _ = split_docs
    n = ledger.seen_keys().count()
    assert n == ledger.seen_keys().select("fp").distinct().count()
    # and they equal the rescan-derived set over the union
    from pyperustats_spark.operators.dedup import content_key
    expect = (rel_a.unionByName(rel_b)
              .select(content_key().alias("fp")).distinct().count())
    assert n == expect


def test_ledger_dedup_equals_rescan(spark, ledger, split_docs):
    rel_a, rel_b, batch = split_docs
    corpus = rel_a.unionByName(rel_b)
    expect = sorted(map(tuple, dedup_incremental(batch, corpus).collect()))
    got = sorted(map(tuple, ledger.dedup_incremental(batch).collect()))
    assert got == expect
    assert len(got) > 0  # the split leaves genuinely new batch rows


def test_ledger_decontaminate_equals_rescan(spark, ledger, split_docs):
    rel_a, rel_b, batch = split_docs
    corpus = rel_a.unionByName(rel_b)
    expect = sorted(map(tuple, exact_substring_decontaminate(
        batch, corpus).collect()))
    got = sorted(map(tuple, ledger.decontaminate(batch).collect()))
    assert got == expect


def test_ledger_novelty_equals_rescan(spark, ledger, split_docs):
    from pyperustats_spark.operators.dedup import substring_novelty_profile
    rel_a, rel_b, batch = split_docs
    corpus = rel_a.unionByName(rel_b)
    expect = sorted(map(tuple, substring_novelty_profile(
        batch, corpus).collect()))
    got = sorted(map(tuple, ledger.novelty_profile(batch).collect()))
    assert got == expect
    # the split plants real overlap: some doc must be non-novel
    assert any(r[2] > 0 for r in got)


def test_ledger_backed_release_chain_equals_corpus_form(spark, ledger,
                                                        split_docs):
    """incremental_release(corpus_keys=ledger.seen_keys()) must equal
    the corpus-DataFrame form row-for-row, with no more exchanges."""
    import pyperustats_spark.plans as P
    from pyperustats_spark.api import incremental_release
    rel_a, rel_b, batch = split_docs
    corpus = rel_a.unionByName(rel_b)
    eval_df = batch.limit(0)  # empty eval set: decontamination no-op
    expect = sorted(map(tuple, incremental_release(
        batch, corpus, eval_df).collect()))
    got = sorted(map(tuple, incremental_release(
        batch, None, eval_df,
        corpus_keys=ledger.seen_keys()).collect()))
    assert got == expect and len(got) > 0
    led_n = P.count_exchanges(incremental_release(
        batch, None, eval_df, corpus_keys=ledger.seen_keys(),
        sort=False))
    raw_n = P.count_exchanges(incremental_release(
        batch, corpus, eval_df, sort=False))
    assert led_n <= raw_n, (led_n, raw_n)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        incremental_release(batch, corpus, eval_df,
                            corpus_keys=ledger.seen_keys())


def test_ledger_dedup_single_batch_side_exchange(spark, ledger,
                                                 split_docs):
    """The recurring join's contract: ONE exchange total (the batch
    shuffling into the ledger's bucket layout) — the ledger side
    streams from bucket files with no exchange, and the within-batch
    keep reuses the join's fp partitioning. The raw-corpus form pays
    corpus-side exchanges on the same data (asserted strictly more)."""
    _, _, batch = split_docs
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        led_plan = ledger.dedup_incremental(batch, sort=False)
        assert P.count_exchanges(led_plan) == 1, P.explain_str(led_plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ledger_decontaminate_corpus_side_exchange_free(spark, ledger,
                                                        split_docs):
    """Decontamination: exchanges exist only on batch-derived frames
    (fingerprints into the bucket layout + the per-doc rollup/anti-
    join); the ledger's fingerprint table contributes none. Pinned as
    strictly fewer exchanges than the raw-corpus form on identical
    inputs."""
    rel_a, rel_b, batch = split_docs
    corpus = rel_a.unionByName(rel_b)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        led_n = P.count_exchanges(ledger.decontaminate(batch, sort=False))
        raw_n = P.count_exchanges(exact_substring_decontaminate(
            batch, corpus, sort=False))
        assert led_n < raw_n, (led_n, raw_n)
        # and the ledger plan never aggregates the ledger scan (the
        # distinct() that the raw form pays corpus-side is pre-paid at
        # write time)
        txt = P.explain_str(ledger.decontaminate(batch, sort=False))
        assert "test_corpus_ledger_fps" in txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ledger_paragraph_dedup_equals_rescan(spark, ledger, split_docs):
    """Row-for-row equality contract for the r11 paragraph ledger:
    dedup_paragraphs against the appended paragraph-key table equals
    paragraph_dedup_incremental re-deriving the keys from corpus
    text."""
    from pyperustats_spark.operators.dedup import (
        paragraph_dedup_incremental)

    rel_a, rel_b, batch = split_docs
    corpus = rel_a.unionByName(rel_b)
    led = ledger.dedup_paragraphs(batch).collect()
    raw = paragraph_dedup_incremental(batch, corpus).collect()
    assert led == raw
    assert any(r["n_dropped"] > 0 for r in raw)   # real hits exercised


def test_ledger_paragraph_keys_globally_distinct(spark, ledger,
                                                 split_docs):
    rel_a, rel_b, _ = split_docs
    from pyperustats_spark.operators.dedup import _paragraph_list
    n = ledger.seen_paragraphs().count()
    assert n == ledger.seen_paragraphs().distinct().count()
    want = (rel_a.unionByName(rel_b)
            .select(F.explode(_paragraph_list(r"\n\s*\n")).alias("p"))
            .select(F.md5("p")).distinct().count())
    assert n == want


def test_ledger_paragraph_dedup_corpus_side_exchange_free(
        spark, ledger, split_docs):
    """The paragraph release path inherits the ledger contract:
    exchanges only on batch-derived frames (paragraph explode into
    the key join + the per-doc reassembly); the bucketed _paras table
    contributes none and is never re-aggregated. Pinned as strictly
    fewer exchanges than the rescan form on identical inputs."""
    from pyperustats_spark.operators.dedup import (
        paragraph_dedup_incremental)

    rel_a, rel_b, batch = split_docs
    corpus = rel_a.unionByName(rel_b)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        led_n = P.count_exchanges(
            ledger.dedup_paragraphs(batch, sort=False))
        raw_n = P.count_exchanges(
            paragraph_dedup_incremental(batch, corpus, sort=False))
        assert led_n < raw_n, (led_n, raw_n)
        txt = P.explain_str(ledger.dedup_paragraphs(batch, sort=False))
        assert "test_corpus_ledger_paras" in txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ledger_cdc_novelty_equals_rescan(spark, ledger, split_docs):
    """Row-for-row equality contract for the r11 CDC chunk ledger:
    cdc_novelty against the appended chunk-key table equals
    cdc_dedup_incremental re-deriving the keys from corpus text."""
    from pyperustats_spark.operators.dedup import cdc_dedup_incremental

    rel_a, rel_b, batch = split_docs
    corpus = rel_a.unionByName(rel_b)
    led = ledger.cdc_novelty(batch).collect()
    raw = cdc_dedup_incremental(batch, corpus).collect()
    assert led == raw
    assert any(r["n_known_chunks"] > 0 for r in raw)  # real hits


def test_ledger_cdc_chunk_keys_globally_distinct(spark, ledger,
                                                 split_docs):
    rel_a, rel_b, _ = split_docs
    from pyperustats_spark.operators.dedup import _cdc_chunk_rows
    n = ledger.seen_chunks().count()
    assert n == ledger.seen_chunks().distinct().count()
    want = (_cdc_chunk_rows(rel_a.unionByName(rel_b))
            .select("ck").distinct().count())
    assert n == want
