#!/usr/bin/env python3
"""Extract one query's formatted-plan section from a PLANS.md dump.
Usage: extract_plan.py PLANS.md <query> <outfile>"""
import sys, re
src, q, out = sys.argv[1], sys.argv[2], sys.argv[3]
text = open(src).read()
m = re.search(r"^## %s\n\n```\n(.*?)```\n" % re.escape(q), text, re.S | re.M)
if not m:
    sys.exit(f"no section for {q} in {src}")
open(out, "w").write(m.group(1))
print(f"wrote {out} ({len(m.group(1))} bytes)")
