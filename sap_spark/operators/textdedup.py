"""Training-data dedup + similarity-search operators.

Each operator is a distributed composition of the primitives in
functions/similarity.py, designed for the 100 TB shape:

- candidate generation always goes through an LSH bucket join (band hash /
  simhash chunk / hyperplane bucket) — never an all-pairs cross join;
- the only all-pairs work happens WITHIN a bucket, and buckets are bounded
  by construction (band collisions at the tuned threshold);
- verification (exact Jaccard / hamming / cosine) runs only on candidate
  pairs.

Duplicate-group resolution uses min-id propagation to a fixed point
(parallel connected components via iterated min-neighbor exchange — the
classic "hash-to-min" scheme; converges in O(log n) rounds on real dup
clusters, which are tiny and star-shaped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sap_spark.functions.similarity import (
    char_shingles,
    cosine_sim,
    hamming64,
    hyperplane_signature,
    jaccard,
    lsh_bands,
    minhash_signature,
    simhash64,
    simhash_chunks,
    word_ngrams,
)
from sap_spark.functions.text import normalize_text


def dedup_exact(df: DataFrame, id_col: str, text_col: str, normalized: bool = True) -> DataFrame:
    """Exact dedup via hash-groupBy. Returns (hash, keep_id, n_copies,
    dup_ids). Map-side partial agg makes this skew-tolerant."""
    basis = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    return (
        df.groupBy(F.sha2(basis, 256).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
    )


def _resolve_groups(pairs: DataFrame, all_ids: DataFrame, id_col: str) -> DataFrame:
    """Min-id connected components over an undirected pair list.

    pairs: (a, b) candidate-verified duplicate pairs. Returns
    (id, group_id) for every id in all_ids (singletons map to themselves).
    Iterates min-neighbor propagation until no label changes (bounded loop;
    dup clusters are small so this converges in a few rounds).
    """
    edges = pairs.select("a", "b").union(pairs.select(F.col("b"), F.col("a"))).distinct()
    labels = all_ids.select(F.col(id_col).alias("a"), F.col(id_col).alias("group_id"))
    for _ in range(16):  # log2 bound on cluster diameter; real clusters are stars
        neighbor_min = (
            edges.join(labels, on="a")
            .groupBy(F.col("b").alias("a"))
            .agg(F.min("group_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, on="a", how="left")
            .select(
                "a",
                F.least(F.col("group_id"), F.coalesce("nbr_min", "group_id")).alias(
                    "group_id"
                ),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="a")
            .where(F.col("n.group_id") != F.col("o.group_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("a").alias(id_col), "group_id")


def dedup_minhash_lsh(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """MinHash + LSH near-dup detection.

    shingle → minhash signature → band → bucket self-join → exact-Jaccard
    verify (on the true shingle sets) → min-id group resolution.
    Returns (id, group_id); rows with group_id != id are near-duplicates of
    the group representative. 16 bands × 4 rows gives the S-curve knee near
    s ≈ (1/b)^(1/r) ≈ 0.5; the exact-Jaccard verify enforces `threshold`.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col),
        char_shingles(F.col(text_col), shingle_k).alias("__sh"),
    ).withColumn("__sig", minhash_signature(F.col("__sh"), num_hashes))

    banded = base.select(
        id_col,
        "__sh",
        F.explode(lsh_bands(F.col("__sig"), bands, rows_per_band)).alias("__b"),
    ).select(id_col, "__sh", F.col("__b.band").alias("band"), F.col("__b.band_hash").alias("bh"))

    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.col("l.__sh").alias("sh_a"),
            F.col("r.__sh").alias("sh_b"),
        )
        .dropDuplicates(["a", "b"])
    )
    verified = candidates.where(jaccard(F.col("sh_a"), F.col("sh_b")) >= threshold)
    return _resolve_groups(verified, df.select(id_col), id_col)


def dedup_ngram_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    ngram_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Word-n-gram Jaccard dedup: same LSH pipeline over word n-grams
    instead of character shingles (catches paraphrase-level copies where
    char shingles are too strict)."""
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col), word_ngrams(F.col(text_col), ngram_n).alias("__sh")
    ).withColumn("__sig", minhash_signature(F.col("__sh"), num_hashes))
    banded = base.select(
        id_col,
        "__sh",
        F.explode(lsh_bands(F.col("__sig"), bands, rows_per_band)).alias("__b"),
    ).select(id_col, "__sh", F.col("__b.band").alias("band"), F.col("__b.band_hash").alias("bh"))
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.col("l.__sh").alias("sh_a"),
            F.col("r.__sh").alias("sh_b"),
        )
        .dropDuplicates(["a", "b"])
    )
    verified = cand.where(jaccard(F.col("sh_a"), F.col("sh_b")) >= threshold)
    return _resolve_groups(verified, df.select(id_col), id_col)


def dedup_simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup: 64-bit fingerprints, pigeonhole chunk join.

    Fingerprints within hamming distance ≤ max_hamming share at least one
    of (max_hamming+1) exact 64/(h+1)-bit chunks, so an equi-join on chunks
    finds every candidate pair; hamming verify filters false positives.
    Returns (id, group_id).
    """
    n_chunks = max_hamming + 1
    base = df.select(
        F.col(id_col), simhash64(normalize_text(F.col(text_col))).alias("__fp")
    )
    chunked = base.select(
        id_col, "__fp", F.explode(simhash_chunks(F.col("__fp"), n_chunks)).alias("__c")
    ).select(
        id_col, "__fp", F.col("__c.chunk").alias("chunk"), F.col("__c.value").alias("cv")
    )
    l, r = chunked.alias("l"), chunked.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.col("l.__fp").alias("fp_a"),
            F.col("r.__fp").alias("fp_b"),
        )
        .dropDuplicates(["a", "b"])
    )
    verified = cand.where(hamming64(F.col("fp_a"), F.col("fp_b")) <= max_hamming)
    return _resolve_groups(verified, df.select(id_col), id_col)


def dedup_embedding_cosine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
) -> DataFrame:
    """Embedding near-dup: hyperplane-LSH bucket join + cosine verify.

    Docs whose vectors land in the same n_planes-bit hyperplane bucket are
    candidates (collision prob = (1 - angle/π)^n_planes); exact cosine ≥
    threshold verifies. Returns (id, group_id).
    """
    base = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        hyperplane_signature(F.col(vec_col), dim, n_planes).alias("__sig"),
    )
    l, r = base.alias("l"), base.alias("r")
    cand = l.join(
        r,
        (F.col("l.__sig") == F.col("r.__sig"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("a"),
        F.col(f"r.{id_col}").alias("b"),
        F.col("l.__v").alias("va"),
        F.col("r.__v").alias("vb"),
    )
    verified = cand.where(cosine_sim(F.col("va"), F.col("vb")) >= threshold)
    return _resolve_groups(verified, df.select(id_col), id_col)


def ann_brute_force(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors of a query vector (the ANN baseline).
    One scan + TakeOrderedAndProject — no shuffle of the vectors."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col), cosine_sim(F.col(vec_col), q).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ann_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    max_probe_hamming: int = 2,
) -> DataFrame:
    """LSH-bucketed ANN (the scale path): score only vectors whose
    hyperplane signature is within `max_probe_hamming` bits of the query's
    (multi-probe). Returns approximate top-k; recall rises with probes.
    At 100 TB the bucket join prunes ~(1 - coverage) of the corpus scan.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sigs = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        hyperplane_signature(F.col(vec_col), dim, n_planes).alias("__sig"),
    )
    qsig = hyperplane_signature(q, dim, n_planes)
    probed = sigs.where(
        F.bit_count(F.col("__sig").bitwiseXOR(qsig)) <= max_probe_hamming
    )
    return (
        probed.select(F.col(id_col), cosine_sim(F.col("__v"), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
