"""Persistent IVF-PQ index: the write-once ANN layout the similarity
operators are designed around, made an actual on-disk artifact.

``ivf_pq_index_write`` stores the corpus as (vec_id, embedding, codes)
parquet PARTITIONED BY the IVF cell, plus a JSON sidecar with the
centroids and PQ codebooks (O(n_centroids·dim + m·k·dim/m) floats —
driver-sized by construction). ``ivf_pq_index_search`` then answers a
query batch by reading ONLY the probed cell partitions — the scan
carries an explicit ``cell IN (...)`` partition filter, so at 100 TB a
search touches nprobe/n_centroids of the files (plan-asserted in
tests), ADC-scores the codes against broadcast per-(query, cell)
distance tables, and exact-reranks the shortlist from the same pruned
partitions.

Reference analog: the reference persists fetched frames to parquet and
re-reads them by key (``/root/reference/perustats/BCRP/cache.py``);
this is the ANN equivalent — persist once, prune on read.

Determinism: centroids/codebooks are the same deterministic
seed-stride (+ optional Lloyd) artifacts the in-memory operators use,
and they ride the sidecar, so a search against the index returns
bit-for-bit the same rows as :func:`ann_ivf_pq` over the raw corpus
with the same parameters (pinned in tests/test_operators.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyperustats_spark.functions.layout import ensure_parallelism
from pyperustats_spark.operators.similarity import (
    _adc_flat_table,
    _adc_join_dist,
    ivf_assign,
    kmeans_refine_centroids,
    pq_codebooks,
    pq_encode,
    py_probe_cells,
    seed_centroids,
)


def ivf_pq_index_write(embeddings: DataFrame, path: str,
                       n_centroids: int = 16, m: int = 8,
                       n_codewords: int = 16, dim: int = 64,
                       kmeans_iters: int = 0,
                       mode: str = "overwrite") -> dict:
    """Build and persist the IVF-PQ index; returns the metadata dict.

    One pass over the corpus: cell assignment + PQ encoding are
    row-local expressions in a single projection, and the write is
    ``partitionBy("cell")`` — the layout that makes every later probe
    a partition-pruned read. Embeddings are stored alongside the codes
    so the exact re-rank stays inside the pruned partitions (storage
    trade documented: dim·4 bytes/vector on top of the m-byte codes;
    drop the column for an ADC-only index)."""
    cents = seed_centroids(embeddings, n_centroids)
    if kmeans_iters > 0:
        cents = kmeans_refine_centroids(embeddings, cents,
                                        iterations=kmeans_iters)
    base = ensure_parallelism(embeddings).select(
        "vec_id", "embedding",
        F.element_at(ivf_assign(F.col("embedding"), cents, nprobe=1),
                     1).alias("cell"))
    books = pq_codebooks(base, m=m, k=n_codewords, dim=dim,
                         kmeans_iters=kmeans_iters)
    coded = pq_encode(base, books, keep=("cell", "embedding"))
    coded.write.mode(mode).partitionBy("cell").parquet(
        os.path.join(path, "data"))
    meta = {
        "n_centroids": n_centroids, "m": m,
        "n_codewords": n_codewords, "dim": dim,
        "kmeans_iters": kmeans_iters,
        "centroids": [[int(cid), [float(x) for x in c]]
                      for cid, c in cents],
        "codebooks": [[[float(x) for x in cw] for cw in book]
                      for book in books],
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_pq_index_append(embeddings: DataFrame, path: str) -> None:
    """Incremental index maintenance: encode a NEW vector batch
    against the index's FROZEN sidecar artifacts (centroids +
    codebooks) and append it into the existing cell partitions — no
    rebuild, no retraining. This is the standard IVF maintenance
    contract: quantizers stay fixed so already-written partitions
    remain valid and a search sees old and new vectors through one
    consistent geometry; quantizer staleness under distribution shift
    is a MONITORED quantity, not an append-time concern
    (operators/similarity.py centroid_drift — emb_centroid_drift —
    is the companion card that tells you when a rebuild is due).

    Scale shape: one row-local assign+encode projection over the
    batch, one ``append``-mode partitioned write touching only the
    cells the batch lands in — batch-proportional work, never
    corpus-proportional (the CorpusLedger append rule applied to the
    ANN layout). Path-based parquet reads list files per search, so
    no relation-cache refresh is needed on any session."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    cents = [(int(cid), c) for cid, c in meta["centroids"]]
    books = meta["codebooks"]
    base = ensure_parallelism(embeddings).select(
        "vec_id", "embedding",
        F.element_at(ivf_assign(F.col("embedding"), cents, nprobe=1),
                     1).alias("cell"))
    coded = pq_encode(base, books, keep=("cell", "embedding"))
    coded.write.mode("append").partitionBy("cell").parquet(
        os.path.join(path, "data"))


def ivf_pq_index_delete(vec_ids: DataFrame, path: str) -> None:
    """Logical delete (the third index lifecycle verb, after write and
    append): append the ids to a tombstone table — O(batch) work, no
    index read, no partition rewrite. Searches anti-join the
    tombstones after partition pruning (the tombstone set is
    deletion-sized — tiny next to the corpus — so the anti-join rides
    an AQE broadcast on the already-pruned scan), so a deleted vector
    disappears from results immediately; the bytes are reclaimed
    lazily by :func:`ivf_pq_index_compact`. Duplicate deletes and
    ids the index never held are harmless (anti-join semantics)."""
    vec_ids.select("vec_id").write.mode("append").parquet(
        os.path.join(path, "tombstones"))


def _tombstones(spark: SparkSession, path: str):
    tdir = os.path.join(path, "tombstones")
    if not os.path.isdir(tdir) or not any(
            f.endswith(".parquet") for f in os.listdir(tdir)):
        return None
    return spark.read.parquet(tdir).select("vec_id").distinct()


def ivf_pq_index_compact(spark: SparkSession, path: str) -> int:
    """Physically reclaim tombstoned rows; returns the number of cell
    partitions rewritten. SELECTIVE by construction: a semi-join of
    the (column-pruned) index against the tombstone set finds the
    affected cells, only those partitions are rewritten (staged to a
    sibling directory, then swapped per cell — rewriting through the
    same path Spark is reading is an overwrite-source error), and a
    cell left empty by its deletes is removed outright. Untouched
    cells keep their files byte-for-byte (pinned in tests), so
    compaction cost is proportional to the DELETED data's cell
    footprint, never the corpus. The directory swap is the local-fs
    stand-in for an object-store deployment's commit protocol /
    catalog partition swap. Tombstones are cleared afterwards;
    delete-then-search and compact-then-search are row-for-row equal
    (pinned)."""
    import shutil

    tomb = _tombstones(spark, path)
    if tomb is None:
        return 0
    data_dir = os.path.join(path, "data")
    data = spark.read.parquet(data_dir)
    affected = sorted(
        r["cell"] for r in data.join(tomb, "vec_id", "left_semi")
        .select("cell").distinct().collect())
    if affected:
        staging = os.path.join(path, "data_compact_tmp")
        keep = (data.where(F.col("cell").isin(list(affected)))
                .join(tomb, "vec_id", "left_anti"))
        keep.write.mode("overwrite").partitionBy("cell").parquet(staging)
        for cell in affected:
            old = os.path.join(data_dir, f"cell={cell}")
            new = os.path.join(staging, f"cell={cell}")
            shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(new):          # absent = cell fully deleted
                shutil.move(new, old)
        shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(os.path.join(path, "tombstones"), ignore_errors=True)
    return len(affected)


def ivf_pq_index_search(spark: SparkSession, path: str,
                        queries: DataFrame, k: int = 5,
                        nprobe: int = 4,
                        shortlist: int = 50) -> DataFrame:
    """Search a persisted index: returns (query_id, vec_id, dist,
    rank) — exact re-ranked squared L2, top-k ascending, identical to
    :func:`~pyperustats_spark.operators.similarity.ann_ivf_pq` with
    the index's parameters.

    Plan shape: probed cells are computed driver-side from the sidecar
    centroids (same fold as the in-plan assignment), the data read is
    filtered ``cell IN (probed)`` — a PARTITION filter, so only
    nprobe·|queries| cell directories are listed and scanned — ADC
    tables ride a broadcast relation joined on cell (the adc_join
    form; plan size flat in query count), and the shortlist joins the
    same pruned scan back for exact distances."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    m, n_codewords = meta["m"], meta["n_codewords"]
    d = meta["dim"] // m
    cents = [(int(cid), c) for cid, c in meta["centroids"]]
    books = meta["codebooks"]

    qrows = queries.select("query_id", "q_embedding").collect()
    probes = {int(r["query_id"]):
              py_probe_cells([float(x) for x in r["q_embedding"]],
                             cents, nprobe)
              for r in qrows}
    qadc = spark.createDataFrame(
        [(qid, cid,
          _adc_flat_table([float(x) for x in r["q_embedding"]],
                          books, m, d))
         for r in qrows
         for qid in [int(r["query_id"])]
         for cid in probes[qid]],
        "query_id long, cell long, adc array<double>")
    all_cells = sorted({c for cs in probes.values() for c in cs})

    data = (spark.read.parquet(os.path.join(path, "data"))
            .where(F.col("cell").isin(all_cells)))
    tomb = _tombstones(spark, path)
    if tomb is not None:
        # logical deletes: anti-join AFTER partition pruning — the
        # tombstone side is deletion-sized, AQE broadcasts it
        data = data.join(tomb, "vec_id", "left_anti")
    scored = (
        data.select("vec_id", "cell", "codes")
        .join(F.broadcast(qadc), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                _adc_join_dist(F.col("codes"), F.col("adc"),
                               m, n_codewords).alias("approx_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.col("vec_id").asc())
    cand = (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= shortlist)
            .select("query_id", "vec_id"))
    qv = queries.select("query_id", "q_embedding")
    exact = (
        cand.join(data.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "vec_id",
            F.aggregate(
                F.zip_with(F.col("embedding"), F.col("q_embedding"),
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, v: acc + v).alias("dist"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.col("vec_id").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
