"""Similarity primitives: shingles, MinHash, SimHash, Jaccard, cosine.

Everything except SimHash is native Spark expressions (JVM, codegen).
SimHash aggregates per-bit weights over tokens — a 64-wide bit fold that is
cleanest as an Arrow-batched pandas UDF over numpy (still no per-row Python
UDF; one vectorized batch call per Arrow chunk).

Determinism: every hash is seeded xxhash64 (Spark) or sha256 (numpy side),
so signatures are reproducible across runs and cluster sizes. SimHash uses
sha256 specifically because the DuckDB oracle mirrors the fingerprint
bit-for-bit in SQL (`substr(sha256(tok), 1, 16)::UBIGINT`), which lets the
driver hash-check simhash dedup output end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_spark.functions.text import normalize_text, tokens


def char_shingles(text: Column, k: int = 5) -> Column:
    """Array of k-character shingles of the normalized text (distinct)."""
    t = normalize_text(text)
    n = F.length(t) - (k - 1)
    # guard: sequence(1, n) DESCENDS for n < 1 — short docs would emit
    # bogus indices instead of an empty shingle set
    return F.when(n < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(t, i, F.lit(k)))
        )
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Array of word n-grams (distinct), for n-gram Jaccard dedup."""
    toks = tokens(normalize_text(text))
    cnt = F.size(toks) - (n - 1)
    return F.when(cnt < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for seed i, min over shingles of xxhash64(s, i).

    array<long> of length num_hashes; E[fraction of equal positions] =
    Jaccard(a, b). Empty shingle sets get a sentinel signature of
    Long.MaxValue (never collides with real text; at corpus scale callers
    must still exclude empty docs from banding — see operators/textdedup).

    Shape note: this is ONE ``aggregate`` over the shingle array (fold of
    per-shingle 64-hash rows with elementwise min), not a 64-seed outer
    loop re-reading the shingles. The distinction matters because Catalyst
    inlines a single-reference projected column into its consumer
    (CollapseProject): with the seed-outer form, a pipeline that projects
    ``char_shingles(text)`` straight into the signature evaluates the
    whole shingle build once *per seed* per row after inlining — observed
    as a 64× blowup that turned a seconds-long stage into minutes. Here
    the shingle expression sits in the aggregate's input slot and is
    evaluated once per row under any inlining.
    """
    init = F.array_repeat(F.lit(2**63 - 1).cast("long"), num_hashes)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(seeds, lambda i: F.xxhash64(s, i)),
            lambda a, b: F.least(a, b),
        ),
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature for LSH: array of (band_idx, band_hash) structs.

    Two docs collide in band j iff their signature rows j*r..(j+1)*r-1 all
    match; P[collide in ≥1 band] = 1 - (1 - s^r)^b for Jaccard s — the
    standard S-curve (Leskovec et al., Mining of Massive Datasets, ch. 3).
    """
    idx = F.array(*[F.lit(j) for j in range(bands)])
    return F.transform(
        idx,
        lambda j: F.struct(
            j.cast("int").alias("band"),
            F.xxhash64(
                F.concat_ws(",", F.transform(
                    F.slice(signature, j * rows_per_band + 1, rows_per_band),
                    lambda v: v.cast("string"),
                )),
                j,
            ).alias("band_hash"),
        ),
    )


_SIMHASH_BITS = 64


@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens of the normalized text.

    Per token: sha256-derived 64-bit hash (first 8 digest bytes, big-endian
    — portable: DuckDB computes the identical value from the hex digest);
    each bit votes ±1; the sign of each bit-position sum forms the
    fingerprint (Charikar 2002). Near-dup docs differ in few bits →
    hamming-distance dedup (operators/textdedup).
    """

    def one(s) -> int:
        if s is None:
            return 0
        toks = str(s).lower().split()
        if not toks:
            return 0
        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "big")
                for t in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(toks)  # (+1/-1 votes summed)
        fp = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            fp |= np.uint64(1) << np.uint64(b)
        return int(fp.astype(np.int64))  # two's complement into LongType

    return text.map(one)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_chunks(fp: Column, n_chunks: int = 4) -> Column:
    """Split a 64-bit fingerprint into n equal chunks for pigeonhole LSH:
    two fingerprints within hamming distance < n_chunks share ≥1 exact
    chunk, so exact-match joins on chunks find all candidates."""
    width = _SIMHASH_BITS // n_chunks
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("chunk"),
                F.shiftrightunsigned(fp, j * width)
                .bitwiseAND(F.lit(mask))
                .alias("value"),
            )
            for j in range(n_chunks)
        ]
    )


def dot(x: Column, y: Column) -> Column:
    """Dot product of two float arrays (zip_with + left-fold, JVM)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays (zip_with + left-fold, JVM).

    Note for join verifies: this recomputes both self-dots per call — when
    a vector appears in many pairs, precompute sqrt(dot(v, v)) per side
    before the join (see operators/textdedup.dedup_embedding_cosine)."""
    denom = F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def hyperplane_signature(
    vec: Column, dim: int, n_planes: int = 16, plane_seed: int = 0
) -> Column:
    """Random-hyperplane LSH bit signature for cosine similarity: bit i =
    sign(<v, h_i>) with h_i a deterministic ±1 plane derived from seeded
    xxhash64 — P[bits differ] = angle/π (Charikar 2002). Returns a long.

    ``plane_seed`` selects an independent plane family — the banding
    primitive (operators/textdedup.dedup_embedding_cosine n_bands): b
    independent r-plane signatures detect a pair when ANY band collides,
    lifting recall from p^r to 1-(1-p^r)^b. Seed 0 is the original
    (i, j)-hashed family, so existing signatures are unchanged."""
    bits = []
    for i in range(n_planes):
        # h_i[j] = ±1 from hash([seed,] i, j): computed inline, no stored
        # planes; the seedless form is kept bit-identical to pre-banding
        def sign_of(j, i=i):
            h = (
                F.xxhash64(F.lit(i), j)
                if plane_seed == 0
                else F.xxhash64(F.lit(plane_seed), F.lit(i), j)
            )
            return F.when(F.pmod(h, 2) == 0, 1.0).otherwise(-1.0)

        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, j: v * sign_of(j),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**i))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")
