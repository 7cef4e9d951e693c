"""spark-submit CLI: packaging + local end-to-end ingest."""

import json
import os
import zipfile

from sap_spark.cli import main, package_pyfiles
from sap_spark.sources.datagen import gen_change_events, write_change_log


def test_package_pyfiles(tmp_path):
    out = package_pyfiles(str(tmp_path / "sap_spark.zip"))
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "sap_spark/cli.py" in names
    assert "sap_spark/streaming/pipeline.py" in names
    assert not any("__pycache__" in n for n in names)


def test_cli_ingest_end_to_end(spark, tmp_path, capsys):
    log_dir = str(tmp_path / "log")
    events = gen_change_events(spark, n_events=2000, n_keys=200, events_per_token=500)
    write_change_log(events, log_dir)

    main([
        "ingest",
        "--log", log_dir,
        "--table", str(tmp_path / "repos"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--max-files-per-trigger", "2",
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["epochs_applied"] >= 2
    assert summary["events"] >= 2000
    assert summary["table_version"] >= 1

    # resumability: a second run over the same checkpoint is a no-op
    main([
        "ingest",
        "--log", log_dir,
        "--table", str(tmp_path / "repos"),
        "--checkpoint", str(tmp_path / "ckpt"),
    ])
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["table_version"] == summary["table_version"]
