"""Sequence packing (operators/packing.py): greedy offset chunking."""

import pytest
from pyspark.sql import functions as F

from sap_spark.operators.packing import pack_sequences


def test_pack_basic_chunking(spark):
    rows = [(1, 100), (2, 200), (3, 300), (4, 50), (5, 600), (6, 10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {
        r["doc_id"]: (r["pack_offset"], r["pack_id"])
        for r in pack_sequences(df, "n_tokens", 512, ["doc_id"]).collect()
    }
    # offsets: 0, 100, 300, 600, 650, 1250 → bins at /512
    assert out == {
        1: (0, 0), 2: (100, 0), 3: (300, 0),
        4: (600, 1), 5: (650, 1), 6: (1250, 2),
    }


def test_pack_overlong_doc_and_empty(spark):
    rows = [(1, 2000), (2, 0), (3, 100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(df, "n_tokens", 512, ["doc_id"]).collect()
    }
    # the 2000-token doc starts bin 0; followers start at offset 2000 → bin 3
    assert out == {1: 0, 2: 3, 3: 3}


def test_pack_sharded_matches_per_shard_global(spark):
    """The scale path: partition_cols shards pack independently and each
    shard's assignment equals packing that shard alone."""
    import numpy as np

    rng = np.random.RandomState(5)
    rows = [
        (int(i), int(i) % 4, int(rng.randint(1, 400))) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard int, n_tokens long")
    sharded = pack_sequences(
        df, "n_tokens", 512, ["doc_id"], partition_cols=["shard"]
    )
    got = {
        (r["shard"], r["doc_id"]): r["pack_id"] for r in sharded.collect()
    }
    for s in range(4):
        alone = pack_sequences(
            df.where(F.col("shard") == s), "n_tokens", 512, ["doc_id"]
        )
        for r in alone.collect():
            assert got[(s, r["doc_id"])] == r["pack_id"]
    # no shard's window saw another shard's rows: bins restart per shard
    assert min(r["pack_id"] for r in sharded.collect()) == 0


def test_pack_bounded_overflow(spark):
    """A bin's token total may overflow max_tokens by at most one document
    (the greedy-offset guarantee)."""
    import numpy as np

    rng = np.random.RandomState(9)
    rows = [(int(i), int(rng.randint(1, 300))) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, "n_tokens", 512, ["doc_id"])
    per_bin = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("total"), F.max("n_tokens").alias("biggest"))
        .collect()
    )
    assert all(r["total"] <= 512 + r["biggest"] for r in per_bin)
    # and bins are contiguous 0..max
    ids = sorted(r["pack_id"] for r in per_bin)
    assert ids == list(range(len(ids)))


def test_pack_rejects_bad_max(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(df, "n_tokens", 0, ["doc_id"])
