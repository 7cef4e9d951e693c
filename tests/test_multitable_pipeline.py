"""Multi-table CDC routing: one change log → N lake tables with
per-table exactly-once (streaming/multitable.py). Models SAP SLT's
mass-transfer delta queue — one ordered stream carrying many tables'
events — which the reference can only consume one-entity-set-per-
pipeline (SapODataConfig.java:66-69 resourcePath)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from sap_spark.config import ConfigError, EngineConfig
from sap_spark.plans.lake import LakeTable
from sap_spark.sources.datagen import gen_change_events, write_change_log
from sap_spark.streaming.multitable import MultiTableCdcPipeline, TableTarget
from sap_spark.streaming.pipeline import ingest_batch

from tests.oracle import fold_to_frame

REPOS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)
# second target: different (narrower) payload — no content column
META_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

REPOS_CFG = EngineConfig().validate()
META_CFG = EngineConfig(payload_columns=("commit", "lang")).validate()


def _two_table_log(spark, n_events=4000, n_keys=300):
    """One log carrying two tables' events: 'repos' (full payload) and
    'meta' (no content; keys disjoint via the m/ prefix). A delta token
    spans both tables — SLT's transaction-spans-tables shape."""
    ev = gen_change_events(
        spark, n_events=n_events, n_keys=n_keys, events_per_token=1000
    ).cache()
    a = ev.withColumn("table_name", F.lit("repos"))
    b = (
        ev.withColumn("table_name", F.lit("meta"))
        .withColumn("repo", F.concat(F.lit("m/"), F.col("repo")))
        .drop("content")
    )
    return ev, a.unionByName(b, allowMissingColumns=True)


def _targets(spark, tmpdir_path):
    t_repos = LakeTable.create(
        spark, f"{tmpdir_path}/repos", REPOS_SCHEMA,
        key_columns=["repo", "path"], num_buckets=8,
    )
    t_meta = LakeTable.create(
        spark, f"{tmpdir_path}/meta", META_SCHEMA,
        key_columns=["repo", "path"], num_buckets=4,
    )
    return {
        "repos": TableTarget(t_repos, REPOS_CFG),
        "meta": TableTarget(t_meta, META_CFG),
    }


def _expected(ev_pdf, prefix=None, drop_content=False):
    pdf = ev_pdf.copy()
    if prefix:
        pdf["repo"] = prefix + pdf["repo"]
    out = fold_to_frame(pdf)
    return out.drop(columns=["content"]) if drop_content else out


def test_multitable_replay_resume_and_lineage(spark, tmpdir_path):
    ev, log = _two_table_log(spark)
    log_dir = f"{tmpdir_path}/log"
    write_change_log(log, log_dir)
    targets = _targets(spark, tmpdir_path)

    pipe = MultiTableCdcPipeline(
        spark, targets, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt",
        max_files_per_trigger=2,      # 2 whole delta tokens per micro-batch
        pipeline_id="mt-e2e",
    )
    pipe.run_available_now(timeout_sec=300)

    ev_pdf = ev.toPandas()
    got_repos = (
        LakeTable(spark, targets["repos"].table.path).read()
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    assert got_repos.equals(_expected(ev_pdf))
    got_meta = (
        LakeTable(spark, targets["meta"].table.path).read()
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    assert got_meta.equals(_expected(ev_pdf, prefix="m/", drop_content=True))

    # pipeline-level lineage: per-epoch per-table summaries; both tables
    # saw every event of the shared log
    epochs = [r for r in pipe.lineage() if r.get("tables")]
    assert len(epochs) >= 2  # maxFilesPerTrigger honored
    n_total = log.count() // 2  # events per table
    for name in ("repos", "meta"):
        assert (
            sum(r["tables"][name]["n_events"] for r in epochs if name in r["tables"])
            == n_total
        )
        # table-local lineage (single-table record shape, tagged)
        recs = pipe.table_lineage(name)
        assert recs and all(r["table"] == name for r in recs)
        assert sum(r["n_events"] for r in recs if r["applied"]) == n_total
        # per-partition offsets survive the fan-out
        assert pipe.bucket_high_water(name)

    # exactly-once per table: replaying a committed epoch is a no-op for
    # EVERY target
    v_repos = targets["repos"].table.version
    v_meta = targets["meta"].table.version
    batch0 = spark.read.option("basePath", log_dir).schema(
        pipe.stream_schema
    ).parquet(log_dir)
    pipe._process_batch(batch0, epoch_id=0)
    assert targets["repos"].table.version == v_repos
    assert targets["meta"].table.version == v_meta


def test_multitable_partial_apply_crash_resume(spark, tmpdir_path):
    """Driver crash BETWEEN tables of one epoch: table 'meta' merged,
    'repos' did not. The replayed epoch must no-op on meta's commit
    marker and still apply repos — per-table exactly-once."""
    ev, log = _two_table_log(spark, n_events=2000, n_keys=200)
    log_dir = f"{tmpdir_path}/log"
    write_change_log(log, log_dir)
    targets = _targets(spark, tmpdir_path)

    pipe = MultiTableCdcPipeline(
        spark, targets, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt",
        pipeline_id="mt-crash",       # single epoch: no trigger cap
    )
    # simulate the half-applied epoch 0: meta's slice merged under the
    # exact batch id the pipeline will use, then the "crash"
    meta_slice = (
        spark.read.option("basePath", log_dir)
        .schema(pipe.stream_schema).parquet(log_dir)
        .where(F.col("table_name") == "meta")
        .select(
            "repo", "path", "event_seq", "delta_token", "op",
            "rocancel", "cancel_seq", "commit", "lang",
        )
    )
    assert ingest_batch(
        meta_slice, targets["meta"].table, META_CFG,
        batch_id="mt-crash-epoch-0-t-meta",
    )
    v_meta_after_crash = targets["meta"].table.version

    pipe.run_available_now(timeout_sec=300)

    # meta did not re-apply; repos applied; both final states exact
    assert targets["meta"].table.version == v_meta_after_crash
    ev_pdf = ev.toPandas()
    got_repos = (
        LakeTable(spark, targets["repos"].table.path).read()
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    assert got_repos.equals(_expected(ev_pdf))
    got_meta = (
        LakeTable(spark, targets["meta"].table.path).read()
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    assert got_meta.equals(_expected(ev_pdf, prefix="m/", drop_content=True))
    # the epoch summary records meta as replayed-no-op
    (epoch,) = [r for r in pipe.lineage() if r.get("tables")]
    assert epoch["tables"]["meta"]["applied"] is False
    assert epoch["tables"]["repos"]["applied"] is True


def _ghost_log(spark):
    ev, log = _two_table_log(spark, n_events=2000, n_keys=200)
    ghosts = (
        ev.limit(7)
        .withColumn("table_name", F.lit("ghost"))
        .withColumn("repo", F.concat(F.lit("g/"), F.col("repo")))
    )
    return ev, log.unionByName(ghosts, allowMissingColumns=True), 7


def test_multitable_unrouted_error(spark, tmpdir_path):
    _, log, _ = _ghost_log(spark)
    log_dir = f"{tmpdir_path}/log"
    write_change_log(log, log_dir)
    pipe = MultiTableCdcPipeline(
        spark, _targets(spark, tmpdir_path), log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt", pipeline_id="mt-err",
    )
    with pytest.raises(Exception, match="unknown tables"):
        pipe.run_available_now(timeout_sec=300)


def test_multitable_unrouted_ignore_counts(spark, tmpdir_path):
    ev, log, n_ghost = _ghost_log(spark)
    log_dir = f"{tmpdir_path}/log"
    write_change_log(log, log_dir)
    targets = _targets(spark, tmpdir_path)
    pipe = MultiTableCdcPipeline(
        spark, targets, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt", pipeline_id="mt-ign",
        on_unrouted="ignore",
    )
    pipe.run_available_now(timeout_sec=300)
    assert sum(r.get("unrouted", 0) for r in pipe.lineage()) == n_ghost
    got = (
        LakeTable(spark, targets["repos"].table.path).read()
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    assert got.equals(_expected(ev.toPandas()))


def test_multitable_unrouted_quarantine(spark, tmpdir_path):
    ev, log, n_ghost = _ghost_log(spark)
    log_dir = f"{tmpdir_path}/log"
    write_change_log(log, log_dir)
    targets = _targets(spark, tmpdir_path)
    pipe = MultiTableCdcPipeline(
        spark, targets, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt", pipeline_id="mt-dlq",
        on_unrouted="quarantine",
        dead_letter_dir=f"{tmpdir_path}/dlq",
    )
    pipe.run_available_now(timeout_sec=300)
    dead = pipe.dead_letters()
    assert dead.count() == n_ghost
    assert dead.where(
        F.col("dlq_reasons").contains("unrouted_table")
    ).count() == n_ghost
    # quarantined events never reach any table
    got = (
        LakeTable(spark, targets["repos"].table.path).read()
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    assert got.equals(_expected(ev.toPandas()))
    assert sum(
        r.get("quarantined", 0) for r in pipe.lineage()
    ) == n_ghost


def test_multitable_config_validation(spark, tmpdir_path):
    targets = _targets(spark, tmpdir_path)
    # envelope columns must agree across targets
    bad = dict(targets)
    bad["meta"] = TableTarget(
        targets["meta"].table,
        EngineConfig(
            payload_columns=("commit", "lang"), order_column="other_seq"
        ),
    )
    with pytest.raises(ConfigError, match="order_column"):
        MultiTableCdcPipeline(
            spark, bad, f"{tmpdir_path}/log", f"{tmpdir_path}/c1"
        )
    # quarantine policy needs a dead-letter sink
    with pytest.raises(ConfigError, match="dead_letter_dir"):
        MultiTableCdcPipeline(
            spark, targets, f"{tmpdir_path}/log", f"{tmpdir_path}/c2",
            on_unrouted="quarantine",
        )
    # one log = one schema: same column at two types is a config error
    t_conflict = LakeTable.create(
        spark, f"{tmpdir_path}/conflict",
        T.StructType(
            [
                T.StructField("repo", T.StringType(), False),
                T.StructField("path", T.StringType(), False),
                T.StructField("commit", T.LongType(), True),  # clashes
            ]
        ),
        key_columns=["repo", "path"], num_buckets=2,
    )
    bad2 = dict(targets)
    bad2["conflict"] = TableTarget(
        t_conflict, EngineConfig(payload_columns=("commit",))
    )
    with pytest.raises(ConfigError, match="one log has one schema"):
        MultiTableCdcPipeline(
            spark, bad2, f"{tmpdir_path}/log", f"{tmpdir_path}/c3"
        )
    # a routing column colliding with a payload column is rejected
    with pytest.raises(ConfigError, match="routing column"):
        MultiTableCdcPipeline(
            spark, targets, f"{tmpdir_path}/log", f"{tmpdir_path}/c4",
            table_column="commit",
        )


def test_multitable_heterogeneous_keys_dlq_scoped(spark, tmpdir_path):
    """Targets with DIFFERENT key columns + a dead-letter sink: the
    null-key quarantine rules must be scoped per table. The union log
    legitimately carries NULL in OTHER tables' key columns — an
    unscoped rule set (the single-table cfg's key_columns) would
    quarantine every 'docs' row for its null repo/path and miss a
    'docs' row whose OWN key (doc_id) is null."""
    docs_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("val", T.StringType(), True),
        ]
    )
    t_repos = LakeTable.create(
        spark, f"{tmpdir_path}/repos", REPOS_SCHEMA,
        key_columns=["repo", "path"], num_buckets=4,
    )
    t_docs = LakeTable.create(
        spark, f"{tmpdir_path}/docs", docs_schema,
        key_columns=["doc_id"], num_buckets=2,
    )
    targets = {
        "repos": TableTarget(t_repos, REPOS_CFG),
        "docs": TableTarget(
            t_docs,
            EngineConfig(
                key_columns=("doc_id",), payload_columns=("val",)
            ).validate(),
        ),
    }
    cols = (
        "delta_token", "event_seq", "op", "rocancel", "cancel_seq",
        "table_name", "repo", "path", "commit", "lang", "content",
        "doc_id", "val",
    )
    rows = [
        # three repos inserts: doc_id/val are null (docs' columns)
        *[
            ("t0", i, "I", False, None, "repos",
             "r1", f"p{i}", f"c{i}", "py", f"body{i}", None, None)
            for i in range(3)
        ],
        # three docs inserts: repo/path are null (repos' keys)
        *[
            ("t0", 10 + i, "I", False, None, "docs",
             None, None, None, None, None, f"d{i}", f"v{i}")
            for i in range(3)
        ],
        # poison: a docs event with ITS OWN key null → quarantine
        ("t0", 20, "I", False, None, "docs",
         None, None, None, None, None, None, "bad"),
    ]
    ddl = (
        "delta_token string, event_seq long, op string, rocancel boolean,"
        " cancel_seq long, table_name string, repo string, path string,"
        " commit string, lang string, content string, doc_id string,"
        " val string"
    )
    assert [f.strip().split(" ")[0] for f in ddl.split(",")] == list(cols)
    log = spark.createDataFrame(rows, schema=ddl)
    log_dir = f"{tmpdir_path}/log"
    write_change_log(log, log_dir)
    pipe = MultiTableCdcPipeline(
        spark, targets, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt", pipeline_id="mt-het",
        dead_letter_dir=f"{tmpdir_path}/dlq",
    )
    pipe.run_available_now(timeout_sec=300)
    # every valid row of BOTH tables applied
    assert LakeTable(spark, t_repos.path).read().count() == 3
    got_docs = LakeTable(spark, t_docs.path).read().orderBy("doc_id")
    assert [r["doc_id"] for r in got_docs.collect()] == ["d0", "d1", "d2"]
    # exactly the poison row quarantined, under its scoped reason
    dead = pipe.dead_letters()
    assert dead.count() == 1
    assert dead.first()["dlq_reasons"] == "null_key:doc_id@docs"


def test_multitable_rejects_pipeline_level_auto_compact(spark, tmpdir_path):
    """auto_compact_delta_files is per-target in the multi-table API;
    passing the single-table kwarg must fail with a pointer to
    TableTarget, not an AttributeError on table=None."""
    with pytest.raises(ValueError, match="TableTarget"):
        MultiTableCdcPipeline(
            spark, _targets(spark, tmpdir_path), f"{tmpdir_path}/log",
            f"{tmpdir_path}/ckpt", auto_compact_delta_files=4,
        )


def test_multitable_null_route_with_null_keys_not_vanished(spark, tmpdir_path):
    """A garbage row with a NULL routing value AND null key columns —
    the common shape of upstream corruption — must be owned by the
    unrouted policy, with the dead-letter sink configured. Pre-fix the
    scoped null-key rule evaluated (NULL == table) & TRUE = NULL, which
    failed BOTH sides of the quarantine split: the row vanished, the
    'error' policy never fired, and 'ignore' counted nothing."""
    ev, log = _two_table_log(spark, n_events=1000, n_keys=100)
    ghosts = (
        ev.limit(5)
        .withColumn("table_name", F.lit(None).cast("string"))
        .withColumn("path", F.lit(None).cast("string"))
    )
    log = log.unionByName(ghosts, allowMissingColumns=True)
    log_dir = f"{tmpdir_path}/log"
    write_change_log(log, log_dir)

    targets = _targets(spark, tmpdir_path)
    pipe = MultiTableCdcPipeline(
        spark, targets, log_dir,
        checkpoint_dir=f"{tmpdir_path}/ckpt", pipeline_id="mt-nullroute",
        on_unrouted="ignore",
        dead_letter_dir=f"{tmpdir_path}/dlq",
    )
    pipe.run_available_now(timeout_sec=300)
    recs = pipe.lineage()
    assert sum(r.get("unrouted", 0) for r in recs) == 5
    assert sum(r.get("quarantined", 0) for r in recs) == 0
    got = (
        LakeTable(spark, targets["repos"].table.path).read()
        .orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    assert got.equals(_expected(ev.toPandas()))
