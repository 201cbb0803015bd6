"""Deduplication operators for web-text corpora.

- exact_dedup:      md5-hash groupBy (exact duplicates)
- minhash_pairs:    MinHash + LSH banding candidate pairs
- simhash:          16-bit SimHash signature
- ngram_jaccard:    exact Jaccard between doc pairs via token explode
- embedding pairs:  see osm_spark.operators.similarity

All hashing is cross-engine-reproducible: token → int via the first 8
hex chars of md5 (Spark ``conv(substr(md5(t),1,8),16,10)``; DuckDB
``('0x'||substr(md5(t),1,8))::BIGINT``), then affine permutations mod
the Mersenne prime 2^31-1 in exact int64 arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE = 2_147_483_647  # 2^31 - 1
# deterministic affine permutation constants (a_j, b_j), a_j < 2^30
MINHASH_PERMS = [
    (976369, 1982627), (403133, 402137), (921023, 1189181), (488801, 6121),
    (683003, 903649), (266083, 1303021), (727369, 202121), (133723, 77377),
]


def token_hash(col: Column) -> Column:
    """token → int64 via md5 prefix (identical in the DuckDB oracle)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_dedup(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_md5, canonical_id, n_dups)."""
    return (
        df.groupBy(F.md5(F.col(text)).alias("text_md5"))
        .agg(F.min(key).alias("canonical_id"), F.count("*").alias("n_dups"))
    )


def tokens(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Distinct whitespace tokens per doc."""
    return df.select(
        key, F.explode(F.split(F.col(text), " ")).alias("tok")
    ).filter(F.col("tok") != "").distinct()


def minhash_signatures(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-doc MinHash signature, one column per permutation."""
    toks = tokens(df, key, text).withColumn(
        "h", token_hash(F.col("tok")) % F.lit(MERSENNE)
    )
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE)).alias(f"mh{j}")
        for j, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return toks.groupBy(key).agg(*aggs)


def minhash_pairs(df: DataFrame, key: str = "doc_id", text: str = "text",
                  rows_per_band: int = 2) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the signature.

    Bands of ``rows_per_band`` consecutive minhashes; pairs (a < b),
    distinct.  The classic shingle→minhash→band→bucket-join pipeline.
    """
    sig = minhash_signatures(df, key, text)
    n_bands = len(MINHASH_PERMS) // rows_per_band
    bands = sig.select(
        key,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "_",
                        *[F.col(f"mh{b * rows_per_band + r}").cast("string")
                          for r in range(rows_per_band)],
                    ).alias("bkey"),
                )
                for b in range(n_bands)
            ])
        ).alias("bb"),
    ).select(key, "bb.band", "bb.bkey")
    left = bands.withColumnRenamed(key, "id_a")
    right = bands.withColumnRenamed(key, "id_b")
    return (
        left.join(right, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash16(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """16-bit SimHash from token hashes: bit i set iff
    sum(+1/-1 over tokens by bit i of token hash) > 0."""
    toks = tokens(df, key, text).withColumn("h", token_hash(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(16)
    ]
    agg = toks.groupBy(key).agg(*bit_sums)
    sim = None
    for i in range(16):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select(key, sim.cast("long").alias("simhash"))


def ngram_jaccard_consecutive(df: DataFrame, key: str = "doc_id",
                              text: str = "text") -> DataFrame:
    """Exact token-set Jaccard between each doc and its successor id —
    a bounded, deterministic probe of the Jaccard kernel."""
    toks = tokens(df, key, text)
    t1 = toks.withColumnRenamed(key, "id_a").withColumn("id_b", F.col("id_a") + 1)
    t2 = toks.withColumnRenamed(key, "id_b")
    inter = (
        t1.join(t2, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = toks.groupBy(key).agg(F.count("*").alias("n"))
    sa = sizes.withColumnRenamed(key, "id_a").withColumnRenamed("n", "n_a")
    sb = sizes.withColumnRenamed(key, "id_b").withColumnRenamed("n", "n_b")
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .select("id_a", "id_b", "n_inter", "jaccard")
    )


def minhash_dedup_groups(df: DataFrame, key: str = "doc_id", text: str = "text",
                         verify_threshold: float = 0.7) -> DataFrame:
    """End-to-end near-dup: LSH candidates verified by exact Jaccard,
    keep pairs above threshold."""
    cand = minhash_pairs(df, key, text)
    toks = tokens(df, key, text)
    ta = toks.withColumnRenamed(key, "id_a")
    tb = toks.withColumnRenamed(key, "id_b")
    inter = (
        cand.join(ta, "id_a").join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter"))
    )
    sizes = toks.groupBy(key).agg(F.count("*").alias("n"))
    out = (
        inter.join(sizes.withColumnRenamed(key, "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed(key, "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= verify_threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


def connected_components(nodes: DataFrame, edges: DataFrame,
                         key: str = "doc_id",
                         src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 30) -> DataFrame:
    """Dedup clusters: connected components of the near-dup pair graph
    by iterative min-label propagation (each round: label = min(own,
    neighbours') over the symmetrized edge set; localCheckpoint cuts
    lineage per round; stops at fixpoint).

    Rounds needed = graph diameter — near-dup clusters are shallow
    (pairs of a group all share LSH buckets), so this converges in a
    handful of joins; for adversarially long chains switch to the
    large-star/small-star variant (same loop shape, log D rounds).
    Returns (key, comp) with comp = min member id of the component.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = nodes.select(F.col(key).alias("a"), F.col(key).alias("comp"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("a", "b")
                     .withColumnRenamed("comp", "nc"), "b")
            .groupBy("a").agg(F.min("nc").alias("nmin"))
        )
        new = (
            labels.join(nbr_min, "a", "left")
            .select("a", F.least("comp", F.coalesce("nmin", "comp")).alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new.join(labels.withColumnRenamed("comp", "old"), "a")
            .filter(F.col("comp") != F.col("old")).count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("a").alias(key), "comp")
