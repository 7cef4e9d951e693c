"""Deterministic sampling (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from sap_spark.operators.sampling import split_train_eval, stratified_sample


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_uniform_rate_and_determinism(spark, docs):
    s1 = {r["doc_id"] for r in stratified_sample(docs, ["doc_id"], 0.3).collect()}
    s2 = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(7), ["doc_id"], 0.3
        ).collect()
    }
    assert s1 == s2  # identity-hash membership: partitioning-independent
    n = docs.count()
    assert 0.2 * n < len(s1) < 0.4 * n


def test_threshold_nesting(spark, docs):
    small = {r["doc_id"] for r in stratified_sample(docs, ["doc_id"], 0.2).collect()}
    big = {r["doc_id"] for r in stratified_sample(docs, ["doc_id"], 0.5).collect()}
    assert small <= big  # growing the rate never drops kept rows


def test_stratified_rates_per_group(spark, docs):
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    rates = {langs[0]: 1.0, langs[1]: 0.0}
    out = stratified_sample(
        docs, ["doc_id"], rates, strata_col="lang", default_rate=0.5
    )
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got[langs[0]] == full[langs[0]]  # rate 1.0 keeps everything
    assert langs[1] not in got  # rate 0.0 drops the stratum
    for other in langs[2:]:
        assert 0.25 * full[other] < got.get(other, 0) < 0.75 * full[other]


def test_split_train_eval_stable_and_disjoint(spark, docs):
    tagged = split_train_eval(docs, ["doc_id"], 0.1)
    counts = {
        r["split"]: r["n"]
        for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = docs.count()
    assert counts["eval"] + counts["train"] == n
    assert 0.05 * n < counts["eval"] < 0.15 * n
    # incremental growth: tagging a subset agrees with tagging the whole
    sub = split_train_eval(docs.where(F.col("doc_id") % 2 == 0), ["doc_id"], 0.1)
    whole = {r["doc_id"]: r["split"] for r in tagged.collect()}
    for r in sub.collect():
        assert whole[r["doc_id"]] == r["split"]


def test_sample_then_split_composition(spark, docs):
    """Domain separation: splitting a sampled corpus at DEFAULT seeds must
    still yield ~eval_fraction eval rows — without per-operator hash
    domains the eval split would be a fixed prefix of the sample (0.1 of
    a 0.5 sample would tag 20% eval, and of a 0.2 sample 50%)."""
    sampled = stratified_sample(docs, ["doc_id"], 0.5)
    tagged = split_train_eval(sampled, ["doc_id"], 0.1)
    counts = {
        r["split"]: r["n"]
        for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = sampled.count()
    assert 0.04 * n < counts.get("eval", 0) < 0.18 * n


def test_rates_map_requires_strata_col(spark, docs):
    with pytest.raises(ValueError, match="strata_col"):
        stratified_sample(docs, ["doc_id"], {"en": 0.5})


def test_md5_hash_variant_shares_all_properties(spark):
    """hash_fn='md5' (the portable/oracle-checkable bucket) keeps the
    operator laws: deterministic, nested (threshold sampling), composes
    with the split without range-sharing; unknown hash_fn fails fast."""
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s20 = {r["doc_id"] for r in
           stratified_sample(df, ["doc_id"], 0.2, hash_fn="md5").collect()}
    s50 = {r["doc_id"] for r in
           stratified_sample(df, ["doc_id"], 0.5, hash_fn="md5").collect()}
    assert s20 < s50  # strict nesting
    assert 0.15 < len(s20) / 2000 < 0.25
    assert 0.45 < len(s50) / 2000 < 0.55
    again = {r["doc_id"] for r in
             stratified_sample(df, ["doc_id"], 0.5, hash_fn="md5").collect()}
    assert s50 == again  # deterministic
    # different hash, different (valid) sample — the two are not aliases
    xx = {r["doc_id"] for r in
          stratified_sample(df, ["doc_id"], 0.5).collect()}
    assert xx != s50
    # domain separation holds for md5 too: eval fraction of the sample
    # stays ~10%, not a fixed prefix of the sample range
    tagged = split_train_eval(
        stratified_sample(df, ["doc_id"], 0.5, hash_fn="md5"),
        ["doc_id"], 0.1, hash_fn="md5",
    ).collect()
    frac = sum(r["split"] == "eval" for r in tagged) / len(tagged)
    assert 0.05 < frac < 0.15
    with pytest.raises(ValueError, match="hash_fn"):
        stratified_sample(df, ["doc_id"], 0.5, hash_fn="sha9000").collect()


def test_md5_key_encoding_is_prefix_free(spark):
    """The md5 bucket key must be injective over multi-column identities:
    (NULL,'x') vs ('x',NULL) and a value containing a would-be separator
    must all land in distinct key strings (a concat_ws key collides on
    both)."""
    from sap_spark.operators.sampling import _bucket

    rows = [
        (None, "x"),
        ("x", None),
        ("a\x1fb", None),  # separator-injection attempt vs ('a','b')
        ("a", "b"),
        ("V2:a", "b"),  # tag-injection attempt
        ("a", "bV1:c"),
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    buckets = [
        r["bkt"]
        for r in df.select(
            _bucket(["a", "b"], 0, "sample", hash_fn="md5").alias("bkt")
        ).collect()
    ]
    assert len(set(buckets)) == len(rows)  # all distinct identities, distinct keys
