#!/usr/bin/env python3
"""Extract one query's formatted plan from a PLANS.md-style dump into
plans/r17/<query>_<suffix>.txt (the judge-reviewable before/after plan
artifacts). Usage: extract_plan.py <plans_md> <suffix> <query> [...]"""
import re
import sys
import pathlib

src, suffix = sys.argv[1], sys.argv[2]
txt = pathlib.Path(src).read_text()
out_dir = pathlib.Path(__file__).resolve().parent.parent / "plans" / "r17"
out_dir.mkdir(parents=True, exist_ok=True)
for q in sys.argv[3:]:
    m = re.search(rf"\n## {re.escape(q)}\n\n```\n(.*?)```", txt, re.S)
    if not m:
        sys.exit(f"plan for {q} not found in {src}")
    (out_dir / f"{q}_{suffix}.txt").write_text(m.group(1))
    print(f"wrote {q}_{suffix}.txt ({len(m.group(1))} chars)")
