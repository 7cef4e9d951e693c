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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sap_spark.functions.similarity import (
    char_shingles,
    cosine_sim,
    dot as _dot,
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


def dedup_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    normalized: bool = True,
    max_members: int = 100,
) -> DataFrame:
    """Exact dedup via hash-groupBy. Returns (hash, keep_id, n_copies,
    member_ids).

    ``n_copies`` is always exact; ``member_ids`` lists at most
    ``max_members`` ids (the smallest ones — ``keep_id`` is always first).
    One pathological hash — the empty/boilerplate file repeated across
    10^8 repos — must not materialize a multi-GB array row, so the cap is
    enforced INSIDE the aggregation: a row_number() over (hash, id) marks
    the first ``max_members`` candidates and ``collect_list`` only ever
    buffers those (collect_list skips nulls), instead of slicing an
    already-huge array after the fact. The window and the groupBy share
    the content_hash partitioning, so this costs one shuffle + a
    per-partition sort — no second exchange.
    """
    basis = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    hashed = df.select(F.sha2(basis, 256).alias("content_hash"), F.col(id_col))
    w = Window.partitionBy("content_hash").orderBy(id_col)
    ranked = hashed.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy("content_hash").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.sort_array(
            F.collect_list(F.when(F.col("__rn") <= max_members, F.col(id_col)))
        ).alias("member_ids"),
    )


def _resolve_groups(
    pairs: DataFrame, all_ids: DataFrame, id_col: str, max_rounds: int = 16
) -> DataFrame:
    """Min-id connected components over an undirected pair list.

    pairs: (a, b) candidate-verified duplicate pairs. Returns
    (id, group_id) for every id in all_ids (singletons map to themselves).

    Scale shape: each round is (neighbor-min propagation) + (one pointer
    jump, i.e. group_id := group_id_of(group_id)), so the label horizon
    doubles per round — a chain of diameter d converges in O(log d) rounds,
    not O(d). Every round ends in ``localCheckpoint(eager=True)``: the
    logical plan is truncated to the materialized RDD, so round k never
    re-executes rounds 1..k-1 (the unpersisted-lineage loop was O(k²)
    recompute with a 16-deep plan) and plan depth stays constant no matter
    how many rounds run. Convergence is detected from a flag computed in
    the same pass — no extra comparison join.
    """
    edges = (
        pairs.select("a", "b")
        .union(pairs.select(F.col("b"), F.col("a")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round; scan once
    )
    labels = all_ids.select(
        F.col(id_col).alias("a"), F.col(id_col).alias("group_id")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, on="a")
            .groupBy(F.col("b").alias("a"))
            .agg(F.min("group_id").alias("nbr_min"))
        )
        stepped = labels.join(neighbor_min, on="a", how="left").select(
            "a",
            F.col("group_id").alias("__old"),
            F.least(F.col("group_id"), F.coalesce("nbr_min", "group_id")).alias(
                "group_id"
            ),
        )
        # pointer jump: follow the label one hop (group_id := its group_id)
        mapping = labels.select(
            F.col("a").alias("group_id"), F.col("group_id").alias("__g2")
        )
        jumped = stepped.join(mapping, on="group_id", how="left").select(
            "a",
            F.least(F.col("group_id"), F.coalesce("__g2", "group_id")).alias("group_id"),
            (F.col("group_id") != F.col("__old"))
            | (F.coalesce(F.col("__g2"), F.col("group_id")) < F.col("group_id")),
        )
        new_labels = jumped.toDF("a", "group_id", "__chg").localCheckpoint(eager=True)
        changed = new_labels.where(F.col("__chg")).limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels.select(F.col("a").alias(id_col), "group_id")


def _minhash_verified_pairs(
    base: DataFrame,
    id_col: str,
    threshold: float,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """Shared MinHash-LSH candidate pipeline over ``base`` = (id, __sh).

    Scale shape (the two properties that survive a 100× corpus):

    - **Empty shingle sets never enter banding.** An empty set gets the
      sentinel signature, identical in every band — millions of boilerplate
      /empty web docs would form one O(n²) bucket. They can never verify
      (Jaccard vs anything is 0.0), so they are filtered before the
      explode; they still appear downstream as singletons via all_ids.
    - **The band join ships ids only.** ``banded`` carries (id, band, hash)
      ≈ 20 B/row through the 16-way explode and the self-join shuffle; the
      shingle arrays (≈ the corpus itself) cross a shuffle exactly once,
      joined back onto the *distinct candidate pairs* for the exact-Jaccard
      verify. The old plan shipped the full shingle set through the band
      explode twice — O(bands × corpus bytes) over the wire.
    """
    rows_per_band = num_hashes // bands
    nonempty = base.where(F.size("__sh") > 0)
    banded = (
        nonempty.withColumn("__sig", minhash_signature(F.col("__sh"), num_hashes))
        .select(
            id_col,
            F.explode(lsh_bands(F.col("__sig"), bands, rows_per_band)).alias("__b"),
        )
        .select(
            id_col,
            F.col("__b.band").alias("band"),
            F.col("__b.band_hash").alias("bh"),
        )
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    shingles = nonempty.select(F.col(id_col).alias("__sid"), "__sh")
    verified = (
        cand.join(shingles.withColumnRenamed("__sh", "sh_a"), cand.a == F.col("__sid"))
        .drop("__sid")
        .join(shingles.withColumnRenamed("__sh", "sh_b"), cand.b == F.col("__sid"))
        .drop("__sid")
        .where(jaccard(F.col("sh_a"), F.col("sh_b")) >= threshold)
        .select("a", "b")
    )
    return verified


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

    shingle → minhash signature → band → bucket self-join (ids only) →
    exact-Jaccard verify (true shingle sets joined back onto candidate
    pairs) → min-id group resolution.
    Returns (id, group_id); rows with group_id != id are near-duplicates of
    the group representative. 16 bands × 4 rows gives the S-curve knee near
    s ≈ (1/b)^(1/r) ≈ 0.5; the exact-Jaccard verify enforces `threshold`.
    """
    base = df.select(
        F.col(id_col), char_shingles(F.col(text_col), shingle_k).alias("__sh")
    ).persist()  # shingle build runs once; banding + both verify sides reuse
    try:
        verified = _minhash_verified_pairs(base, id_col, threshold, num_hashes, bands)
        # _resolve_groups materializes eagerly (per-round localCheckpoint),
        # so base is fully consumed before the unpersist below
        return _resolve_groups(verified, df.select(id_col), id_col)
    finally:
        base.unpersist()


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
    base = df.select(
        F.col(id_col), word_ngrams(F.col(text_col), ngram_n).alias("__sh")
    ).persist()
    try:
        verified = _minhash_verified_pairs(base, id_col, threshold, num_hashes, bands)
        return _resolve_groups(verified, df.select(id_col), id_col)
    finally:
        base.unpersist()


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
    # persist: the simhash UDF (the expensive pass) would otherwise run
    # once per self-join side; consumed eagerly inside _resolve_groups
    base = df.select(
        F.col(id_col), simhash64(normalize_text(F.col(text_col))).alias("__fp")
    ).persist()
    try:
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
    finally:
        base.unpersist()


def dedup_embedding_cosine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 1,
) -> DataFrame:
    """Embedding near-dup: hyperplane-LSH bucket join + cosine verify.

    Docs whose vectors land in the same n_planes-bit hyperplane bucket
    in ANY of ``n_bands`` independent plane families are candidates —
    per-pair detection probability 1-(1-p^r)^b with p = 1-angle/π, r =
    n_planes, b = n_bands (the minhash-banding recall lift applied to
    hyperplane LSH; 8 bands of 6 planes catch a cosine-0.999 pair with
    P(miss) ≈ 3e-11 where one 12-plane signature misses ~9%). Exact
    cosine ≥ threshold verifies. Returns (id, group_id).

    Shuffle shape at scale: each vector emits n_bands (band, sig, id)
    rows — id-only — into the bucket self-join; pairs are deduplicated
    across bands BEFORE the verify joins fetch the two vectors, so a
    pair colliding in k bands is verified once, and vectors cross a
    shuffle O(1) times regardless of b.
    """
    if n_bands < 1 or n_planes < 1:
        # range(0) would silently emit zero signatures -> zero candidate
        # pairs -> all-singleton groups, i.e. dedup quietly disabled
        raise ValueError(
            f"n_bands and n_planes must be >= 1, got {n_bands}/{n_planes}"
        )
    # Norms are computed once per vector BEFORE the self-join: inside the
    # verify each vector participates in ~bucket_size pairs, and cosine_sim
    # would redo the self-dot (dim multiply-adds) per pair per side.
    base = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("__n"),
        F.array(
            *[
                hyperplane_signature(
                    F.col(vec_col), dim, n_planes, plane_seed=band
                )
                for band in range(n_bands)
            ]
        ).alias("__sigs"),
    ).persist()  # signature pass (b x n_planes x dim MACs) runs once
    sigs = base.select(
        F.col(id_col), F.posexplode("__sigs").alias("__band", "__sig")
    )
    l, r = sigs.alias("l"), sigs.alias("r")
    cand_ids = (
        l.join(
            r,
            (F.col("l.__band") == F.col("r.__band"))
            & (F.col("l.__sig") == F.col("r.__sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .distinct()  # a pair colliding in k bands verifies once
    )
    va = base.select(
        F.col(id_col).alias("a"), F.col("__v").alias("va"), F.col("__n").alias("na")
    )
    vb = base.select(
        F.col(id_col).alias("b"), F.col("__v").alias("vb"), F.col("__n").alias("nb")
    )
    cand = cand_ids.join(va, on="a").join(vb, on="b").withColumn(
        "__nn", F.col("na") * F.col("nb")
    )
    cos = F.when(
        F.col("__nn") > 0, _dot(F.col("va"), F.col("vb")) / F.col("__nn")
    ).otherwise(F.lit(0.0))
    verified = cand.where(cos >= threshold)
    try:
        return _resolve_groups(verified, df.select(id_col), id_col)
    finally:
        base.unpersist()


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


def build_ann_index(
    df: DataFrame, id_col: str, vec_col: str, dim: int, n_planes: int = 12
) -> DataFrame:
    """ANN index-build step: the signature table (id, __v, __sig).

    This is the expensive pass — n_planes × dim multiply-adds per vector —
    and it must run ONCE, not per query: persist the result (or write it as
    a parquet/Lake table partitioned by __sig) and hand it to ``ann_lsh``.
    Probes then filter/equi-join on ``__sig`` without touching the raw
    vectors of non-candidate rows; with the index written sorted/bucketed
    by __sig, signature predicates push into the scan.
    """
    return df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        hyperplane_signature(F.col(vec_col), dim, n_planes).alias("__sig"),
    )


def build_ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 64,
    seed: int = 7,
    max_iter: int = 10,
):
    """IVF (inverted-file) ANN index build: k-means coarse quantizer over
    L2-normalized vectors (cosine ≈ euclidean on the unit sphere), every
    vector assigned to its nearest centroid.

    Returns (assigned, centroids): ``assigned`` = df columns + ``__cluster``
    int — persist it, or write it partitioned by ``__cluster`` so probes
    become partition-pruned scans; ``centroids`` = small driver-side list
    of (cluster_id, unit_vector) — index metadata, O(n_centroids × dim).

    Scale shape: the build is one ML fit (sampled iterations) + one
    assignment pass; a probe then touches only nprobe/n_centroids of the
    corpus — a true index, unlike signature-filter LSH which still scans
    every row's signature.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import Normalizer
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn("__raw", array_to_vector(F.col(vec_col)))
    feats = Normalizer(inputCol="__raw", outputCol="__features", p=2.0).transform(
        feats
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="__features",
        predictionCol="__cluster",
    ).fit(feats)
    assigned = model.transform(feats).drop("__features", "__raw")
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return assigned, centroids


def ann_ivf(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 8,
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query (driver-side —
    n_centroids is tiny), scan only the ``nprobe`` nearest inverted lists,
    exact-cosine re-rank within them. Recall rises with nprobe; with the
    assigned table written partitioned by ``__cluster``, the isin filter
    prunes partitions and the probe reads nprobe/n_centroids of the data
    (plan-proven: tests/test_text_similarity.py asserts the physical
    scan's selectedPartitions is exactly nprobe of n_centroids).
    """
    import math

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q_unit = [x / qn for x in query_vec]

    def cos(c):
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(q_unit, c)) / cn

    probe = [
        cid for cid, _ in sorted(centroids, key=lambda t: -cos(t[1]))[:nprobe]
    ]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.where(F.col("__cluster").isin(probe))
        .select(F.col(id_col), cosine_sim(F.col(vec_col), q).alias("cosine"))
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
    index: DataFrame | None = None,
) -> DataFrame:
    """LSH ANN: score only vectors whose hyperplane signature is within
    ``max_probe_hamming`` bits of the query's (multi-probe). Approximate
    top-k; recall rises with probes.

    Pass ``index`` (from :func:`build_ann_index`, persisted or re-read from
    its materialized form) for the scale path: the probe is then a filter
    on a precomputed signature column — no per-query signature recompute
    over the corpus. Without ``index`` this degrades honestly to one-shot
    mode: signatures are computed in the same scan as the probe, which
    prunes the *cosine work* (only ~coverage of rows are scored) but still
    reads every row — fine for a single ad-hoc query, wrong for a query
    workload.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sigs = (
        index
        if index is not None
        else build_ann_index(df, id_col, vec_col, dim, n_planes)
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
