"""Regenerate BENCH.md's query-suite snapshot numbers from a bench.py JSON
artifact, so the prose can never disagree with the artifact it describes
(round-3 verdict #7: the r03 section said "130 headline queries" while the
committed HEADLINE and BENCH_r03.json both held 128).

Usage: python tools/bench_md_snapshot.py <bench.json> [--round N]

Writes a markdown block between <!--SUITE_SNAPSHOT_BEGIN--> and
<!--SUITE_SNAPSHOT_END--> in BENCH.md (replacing any existing block, else
appending); every number in the block is computed from the JSON.
tests/test_invariants.py asserts the stated headline count equals
len(bench.HEADLINE).
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!--SUITE_SNAPSHOT_BEGIN-->", "<!--SUITE_SNAPSHOT_END-->"


def render(bench: dict, round_label: str) -> str:
    sys.path.insert(0, REPO)
    import bench as B

    qs = bench["queries"]
    missing = [n for n in B.HEADLINE if n not in qs]
    slow = sorted(qs.items(), key=lambda kv: -kv[1])[:5]
    attempts = bench.get("query_attempts", {})
    n_third = sum(1 for a in attempts.values() if len(a) > 2)
    lines = [
        BEGIN,
        f"## Round-{round_label} query-suite snapshot (bench.py, "
        f"sf {bench.get('sf', '?')}, local[{bench.get('cpus', '?')}])",
        "",
        f"{len(qs)} headline queries (HEADLINE lists {len(B.HEADLINE)}; "
        f"{'all timed' if not missing else 'missing: ' + ', '.join(missing)}) "
        f"in {bench.get('total_sec', 0):.1f}s total (best-of-attempts per "
        "query: two interleaved sweeps"
        + (f", {n_third} queries took a tie-break third attempt" if attempts
           else "") + ").",
        f"Flagship warm rate: {bench.get('value')} urls/s "
        f"({bench.get('flagship_urls')} urls in {bench.get('flagship_sec')}s).",
        "Slowest five: "
        + ", ".join(f"{n} {t:.1f}s" for n, t in slow) + ".",
        END,
    ]
    return "\n".join(lines)


def main() -> None:
    path = sys.argv[1]
    rnd = "4"
    if "--round" in sys.argv:
        rnd = sys.argv[sys.argv.index("--round") + 1]
    bench = json.loads(open(path).read().strip().splitlines()[-1])
    block = render(bench, rnd)
    md_path = os.path.join(REPO, "BENCH.md")
    txt = open(md_path).read()
    if BEGIN in txt:
        txt = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), block,
                     txt, flags=re.S)
    else:
        txt = txt.rstrip() + "\n\n" + block + "\n"
    open(md_path, "w").write(txt)
    print(f"wrote snapshot block ({len(bench['queries'])} queries) to BENCH.md")


if __name__ == "__main__":
    main()
