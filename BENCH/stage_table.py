#!/usr/bin/env python
"""Render the per-stage wall/rows table for a pipeline checkpoint dir
(round-4 VERDICT item 5): every `run_stage` writes `wall_sec`, `rows_out`
and `rows_in` into its `_manifest.json`, so a full-pipeline run already
carries its own stage-level timing — this just collects it as markdown.

Usage: python BENCH/stage_table.py /tmp/spark_graft_pipe_cache_<ver>/n2000000
"""

from __future__ import annotations

import json
import os
import sys


def stage_rows(ckpt_dir: str) -> list[dict]:
    rows = []
    for stage in sorted(os.listdir(ckpt_dir)):
        mpath = os.path.join(ckpt_dir, stage, "_manifest.json")
        if not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            m = json.load(f)
        rows.append(
            {
                "stage": stage,
                "wall_sec": m.get("wall_sec"),
                "rows_out": m.get("rows_out"),
                "rows_in": m.get("rows_in"),
                "written_at": m.get("written_at"),
                "metrics": m.get("metrics") or {},
            }
        )
    # pipeline order = write order
    rows.sort(key=lambda r: r["written_at"] or 0)
    return rows


def markdown(rows: list[dict]) -> str:
    out = ["| stage | wall (s) | rows out | rows/s |", "| --- | --- | --- | --- |"]
    total = 0.0
    for r in rows:
        w = r["wall_sec"] or 0.0
        total += w
        n = r["rows_out"]
        rps = f"{n / w:,.0f}" if w and n else "-"
        out.append(
            f"| {r['stage']} | {w:.2f} | {format(n, ',') if n is not None else '-'} | {rps} |"
        )
    out.append(f"| **total (sum of stages)** | **{total:.2f}** | | |")
    return "\n".join(out)


if __name__ == "__main__":
    print(markdown(stage_rows(sys.argv[1])))
