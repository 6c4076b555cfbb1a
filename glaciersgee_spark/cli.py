"""CLI entry: `python -m glaciersgee_spark.cli CONFIG [--sf-dir D] [--out O]`.

Mirrors the reference's `run.py <target>` shape (SURVEY.md §3.1):
one JSON config in, one manifest directory out, summary JSON on
stdout. CONFIG may be a path or an inline JSON string.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "config",
        nargs="?",
        default=None,
        help="JSON config path or inline JSON (optional for --report "
        "and --corpus, required for the scene pipeline)",
    )
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    p.add_argument("--out", default=None, help="manifest output dir")
    p.add_argument("--done-log", default=None, help="parquet of done event_ids")
    p.add_argument(
        "--report",
        action="store_true",
        help="write the curation report (per-source dataset cards, dup-size "
        "histogram, length budget, curation funnel) as parquet tables",
    )
    p.add_argument(
        "--corpus",
        action="store_true",
        help="run the corpus-cleaning pipeline (quality filter -> dedup -> "
        "train/val/test split -> split-partitioned shards) instead of the "
        "scene ETL",
    )
    args = p.parse_args(argv)
    if args.config is None:
        if not (args.report or args.corpus):
            p.error("config is required for the scene pipeline "
                    "(only --report/--corpus have full defaults)")
        args.config = "{}"

    from glaciersgee_spark.pipeline import (
        CorpusCleanConfig,
        SceneQueryConfig,
        run_corpus_pipeline,
        run_pipeline,
    )
    from glaciersgee_spark.session import get_spark

    if args.report:
        from glaciersgee_spark.pipeline import run_report

        out = args.out or tempfile.mkdtemp(prefix="ggee_report_")
        summary = run_report(get_spark(), args.sf_dir, out)
        json.dump(summary, sys.stdout)
        print()
        return 0

    if args.corpus:
        ccfg = CorpusCleanConfig.from_json(args.config)
        out = args.out or tempfile.mkdtemp(prefix="ggee_corpus_")
        summary = run_corpus_pipeline(get_spark(), args.sf_dir, ccfg, out)
        json.dump(summary, sys.stdout)
        print()
        return 0

    cfg = SceneQueryConfig.from_json(args.config)
    out = args.out or tempfile.mkdtemp(prefix="ggee_manifest_")
    summary = run_pipeline(get_spark(), args.sf_dir, cfg, out, args.done_log)
    json.dump(summary, sys.stdout)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
