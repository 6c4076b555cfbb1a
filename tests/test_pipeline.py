"""Config-driven pipeline lifecycle (pipeline.py + cli.py): selection
correctness against an independent spelling, manifest determinism, and
idempotent re-run via the done-log anti join."""

import json
import subprocess
import sys
import tempfile

import pyspark.sql.functions as F

from glaciersgee_spark.pipeline import (
    SceneQueryConfig,
    build_manifest,
    pending_downloads,
    run_pipeline,
    select_scenes,
)
from glaciersgee_spark.tables import load_table
from tests.conftest import SF_SMOKE

CFG = SceneQueryConfig(
    date_start="2024-01-05 00:00:00",
    date_end="2024-01-20 00:00:00",
    max_quality=120.0,
    event_types=("click", "view", "purchase"),
)


def test_select_scenes_matches_independent_spelling(spark):
    got = {r.event_id for r in select_scenes(spark, SF_SMOKE, CFG).collect()}
    ev = load_table(spark, SF_SMOKE, "events")
    base = ev.where(
        (F.col("ts") >= F.lit(CFG.date_start).cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(CFG.date_end).cast("timestamp_ntz"))
        & (F.col("value") <= CFG.max_quality)
        & F.col("event_type").isin(*CFG.event_types)
    ).withColumn("day", F.date_trunc("day", "ts"))
    # independent best-per-cell: min (value, event_id) pair per group
    best = (
        base.groupBy("user_id", "day")
        .agg(F.min(F.struct("value", "event_id")).alias("m"))
        .select(F.col("m.event_id").alias("event_id"))
    )
    want = {r.event_id for r in best.collect()}
    assert got == want and len(got) > 0


def test_manifest_paths_deterministic(spark):
    m1 = {r.event_id: r.export_url for r in
          build_manifest(select_scenes(spark, SF_SMOKE, CFG)).collect()}
    m2 = {r.event_id: r.export_url for r in
          build_manifest(select_scenes(spark, SF_SMOKE, CFG)).collect()}
    assert m1 == m2
    assert all(u.startswith("s3://landsat-archive/cell_") for u in m1.values())


def test_run_pipeline_idempotent_with_done_log(spark):
    out1 = tempfile.mkdtemp(prefix="ggee_pipe1_")
    s1 = run_pipeline(spark, SF_SMOKE, CFG, out1)
    assert s1["selected"] == s1["pending"] > 0

    # second run: everything already downloaded → pending drops to 0
    out2 = tempfile.mkdtemp(prefix="ggee_pipe2_")
    s2 = run_pipeline(spark, SF_SMOKE, CFG, out2, done_log_path=out1)
    assert s2["selected"] == s1["selected"]
    assert s2["pending"] == 0


def test_partial_done_log_yields_difference(spark):
    manifest = build_manifest(select_scenes(spark, SF_SMOKE, CFG))
    done = manifest.limit(3).select("event_id")
    left = pending_downloads(manifest, done)
    assert left.count() == manifest.count() - 3


def test_cli_end_to_end():
    cfg = {
        "date_start": "2024-01-05 00:00:00",
        "date_end": "2024-01-20 00:00:00",
        "max_quality": 120.0,
    }
    out = tempfile.mkdtemp(prefix="ggee_cli_")
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "glaciersgee_spark.cli",
            json.dumps(cfg),
            "--sf-dir",
            SF_SMOKE,
            "--out",
            out,
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["pending"] > 0 and summary["output_dir"] == out


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    from glaciersgee_spark.pipeline import CorpusCleanConfig, run_corpus_pipeline
    from glaciersgee_spark.tables import load_table

    out = str(tmp_path / "shards")
    cfg = CorpusCleanConfig(min_tokens=5, max_tokens=500, min_distinct_ratio=0.1)
    summary = run_corpus_pipeline(spark, SF_SMOKE, cfg, out)
    assert 0 < summary["kept_docs"] <= summary["input_docs"]
    assert set(summary["by_split"]) <= {"train", "val", "test"}
    back = spark.read.parquet(out)
    assert back.count() == summary["kept_docs"]
    # split column travels via the partition directories
    assert "split" in back.columns
    # rerun is deterministic: same kept set, same split assignment
    again = run_corpus_pipeline(spark, SF_SMOKE, cfg, str(tmp_path / "shards2"))
    assert again["by_split"] == summary["by_split"]


def test_report_mode_writes_all_tables(spark, tmp_path):
    from glaciersgee_spark.pipeline import run_report
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "report")
    summary = run_report(spark, SF_SMOKE, out)
    assert set(summary) == {"output_dir", "cards", "dup_sizes", "len_buckets", "funnel"}
    for k in ("cards", "dup_sizes", "len_buckets", "funnel"):
        assert summary[k] > 0
        assert spark.read.parquet(f"{out}/{k}").count() == summary[k]
