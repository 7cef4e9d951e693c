"""Generator invariants: determinism, schema, skew, rocancel scoping, dups."""

import pyspark.sql.functions as F

from sap_spark.sources.datagen import gen_change_events, gen_repos


def test_repos_deterministic_and_shaped(spark):
    a = gen_repos(spark, n_keys=300).orderBy("repo", "path").collect()
    b = gen_repos(spark, n_keys=300).orderBy("repo", "path").collect()
    assert a == b
    assert len(a) == 300
    row = a[0]
    assert set(row.asDict()) == {"repo", "path", "commit", "lang", "content"}
    assert len(row["commit"]) == 40  # sha1-style hex
    assert row["content"].startswith("// ")
    assert 100 <= max(len(r["content"]) for r in a) <= 4200


def test_change_events_deterministic(spark):
    a = gen_change_events(spark, n_events=2000, n_keys=400, events_per_token=500)
    b = gen_change_events(spark, n_events=2000, n_keys=400, events_per_token=500)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_change_events_envelope(spark):
    df = gen_change_events(spark, n_events=3000, n_keys=400, events_per_token=1000)
    pdf = df.toPandas()
    base = pdf.drop_duplicates("event_seq")
    assert len(base) == 3000
    # ~1% duplicate deliveries, re-emitted in a LATER token
    dups = pdf[pdf.duplicated("event_seq", keep=False)]
    assert len(dups) > 0
    for seq, grp in dups.groupby("event_seq"):
        toks = sorted(grp["delta_token"].unique())
        assert len(toks) == 2, "dup must be re-emitted in a different token"
        payload = grp[["op", "repo", "path", "commit", "content"]].drop_duplicates()
        assert len(payload) == 1, "dup payload must be identical"
    # op mix roughly 60/30/10
    mix = base["op"].value_counts(normalize=True)
    assert 0.5 < mix["I"] < 0.7 and 0.2 < mix["U"] < 0.4 and 0.05 < mix["D"] < 0.15
    # rocancel targets an earlier event in the SAME token
    rc = base[base["rocancel"]]
    assert len(rc) > 0
    by_seq = base.set_index("event_seq")["delta_token"]
    for row in rc.itertuples():
        assert row.cancel_seq < row.event_seq
        assert by_seq.loc[int(row.cancel_seq)] == row.delta_token
    # content null exactly for deletes
    assert base.loc[base["op"] == "D", "content"].isna().all()
    assert base.loc[base["op"] != "D", "content"].notna().all()


def test_hot_repo_skew(spark):
    df = gen_change_events(spark, n_events=20000, n_keys=4000, events_per_token=5000)
    counts = (
        df.groupBy("repo").count().orderBy(F.desc("count")).limit(1).collect()
    )
    top = counts[0]["count"]
    # 20 repos; uniform would be ~1000 per repo — skew must concentrate much more
    assert top > 4000, f"expected hot-repo skew, top repo has {top} events"
