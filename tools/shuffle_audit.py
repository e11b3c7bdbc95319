"""Per-query shuffle/input accounting: the quantitative side of the
"minimize shuffles" doctrine.

Runs each (headline, by default) query once with the Spark UI's REST API
enabled, diffs the application's stage metrics before/after, and records
input bytes, shuffle write bytes, shuffle read bytes and task count per
query into SHUFFLE_r05.json. A query whose shuffle volume is a large
multiple of its input is the one to re-plan; the recorded ratios are the
honest evidence for the plan-shape claims in tools/explain_audit.py.

Usage:
    python tools/shuffle_audit.py                  # headline queries, sf0.1
    python tools/shuffle_audit.py NAME ...         # subset
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(REPO, "SHUFFLE_r05.json")
UI_PORT = 4049


def _stages(app_base: str) -> list[dict]:
    with urllib.request.urlopen(f"{app_base}/stages?status=complete", timeout=10) as r:
        return json.load(r)


def _totals(stages: list[dict]) -> dict[str, int]:
    t = {"input_bytes": 0, "shuffle_write_bytes": 0, "shuffle_read_bytes": 0, "tasks": 0}
    for s in stages:
        t["input_bytes"] += s.get("inputBytes", 0)
        t["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        t["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        t["tasks"] += s.get("numCompleteTasks", 0)
    return t


def main() -> int:
    from bench import HEADLINE
    from sarpro_spark import frames
    from sarpro_spark.queries import spark_queries
    from sarpro_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        "sarpro_shuffle_audit",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[-1]}/api/v1/applications/{app_id}"

    qs = spark_queries()
    names = [n for n in (sys.argv[1:] or HEADLINE) if n in qs]
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    out: dict[str, dict] = {}
    for name in names:
        spark.catalog.clearCache()
        frames._BAND_FRAME_CACHE.clear()
        frames.band_frame(spark, sf_dir).count()
        before = _totals(_stages(base))
        t0 = time.time()
        n_rows = qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        after = _totals(_stages(base))
        rec = {k: after[k] - before[k] for k in before}
        rec["rows"] = n_rows
        rec["sec"] = round(dt, 3)
        rec["shuffle_write_mb"] = round(rec.pop("shuffle_write_bytes") / 1048576, 2)
        rec["shuffle_read_mb"] = round(rec.pop("shuffle_read_bytes") / 1048576, 2)
        rec["input_mb"] = round(rec.pop("input_bytes") / 1048576, 2)
        # shuffle amplification: bytes shuffled per byte scanned (the number
        # that must stay bounded as the corpus grows)
        rec["shuffle_per_input"] = (
            round(rec["shuffle_write_mb"] / rec["input_mb"], 2) if rec["input_mb"] else None
        )
        out[name] = rec
        print(f"# {name}: in {rec['input_mb']} MB, shuffle w {rec['shuffle_write_mb']} MB "
              f"(x{rec['shuffle_per_input']}), {rec['tasks']} tasks, {rec['sec']}s",
              file=sys.stderr)

    doc = {
        "sf_dir": sf_dir,
        "note": "per-query deltas of completed-stage totals from the Spark "
        "REST status API; cache re-warm excluded from the diff only for "
        "timing, included in stage counts when stages complete inside the "
        "window — treat small values as approximate",
        "queries": out,
    }
    with open(OUT_JSON, "w") as fh:
        json.dump(doc, fh, indent=2)
    worst = sorted(
        ((k, v["shuffle_per_input"]) for k, v in out.items() if v["shuffle_per_input"]),
        key=lambda kv: -kv[1],
    )[:5]
    print(json.dumps({"n": len(out), "worst_shuffle_per_input": worst}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
