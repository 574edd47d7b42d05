#!/usr/bin/env python3
"""Extract one query's formatted plan from a PLANS.md-style dump into
plans/<round>/<query>_<suffix>.txt (the judge-reviewable before/after plan
artifacts). Usage: extract_plan.py <plans_md> <round> <suffix> <query> [...]"""
import re
import sys
import pathlib

src, rnd, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
txt = pathlib.Path(src).read_text()
out_dir = pathlib.Path(__file__).resolve().parent.parent / "plans" / rnd
out_dir.mkdir(parents=True, exist_ok=True)
for q in sys.argv[4:]:
    m = re.search(rf"\n## {re.escape(q)}\n\n```\n(.*?)```", txt, re.S)
    if not m:
        sys.exit(f"plan for {q} not found in {src}")
    (out_dir / f"{q}_{suffix}.txt").write_text(m.group(1))
    print(f"wrote {q}_{suffix}.txt ({len(m.group(1))} chars)")
