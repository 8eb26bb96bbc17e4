#!/usr/bin/env python3
"""Frozen core-subset bench trend (round 14, VERDICT r13 next #1).

The full-inventory bench total stopped being comparable to the 79-query
round-1 baseline once the inventory tripled: r13's naive total read
2.11x while the judge's hand-computed shared-query ratio was 0.98x.
This script makes that subset comparison a standing artifact:

  * The core set is the 120 ids benched every round since round 3,
    FROZEN in src/main/resources/core_queries.txt (graft.Bench emits
    their per-run sum as "core_sec" in the same JSON line from round
    14 on). Never edit the list; it is only meaningful frozen.
  * Backfill walks bench_logs/, extracts every per-query timing map it
    can find (per-run {"queries": {...}} files, {"minima": {...}} /
    minima-format {"metric":"minima","queries":{...}} files, and
    sbt-prefixed .jsonl detail lines), groups by round, and reports the
    per-round CORE sum-of-minima -- identical query set, every round.

Usage:
    python3 scripts/core_bench.py            # table to stdout
    python3 scripts/core_bench.py --json     # also rewrite bench_logs/core_trend.json
    python3 scripts/core_bench.py --check BENCH.json
        # exit 1 if the file's core subset is incomplete (gate helper)
"""
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CORE_FILE = REPO / "src/main/resources/core_queries.txt"
LOGS = REPO / "bench_logs"


def core_ids():
    ids = {l.strip() for l in CORE_FILE.read_text().splitlines() if l.strip()}
    assert len(ids) == 120, f"frozen core list must stay at 120 ids, got {len(ids)}"
    return ids


def maps_from_obj(d):
    """Yield per-query {id: sec} maps from one parsed JSON object."""
    q = d.get("queries")
    if isinstance(q, dict) and q:
        # minima-format files carry per-query minima; per-run files carry
        # one run -- either way it's one map (min() below is a no-op for
        # a single map, correct for several)
        yield {k: v for k, v in q.items() if isinstance(v, (int, float)) and v >= 0}
    m = d.get("minima")
    if isinstance(m, dict) and m:
        yield {k: v for k, v in m.items() if isinstance(v, (int, float)) and v >= 0}


def maps_from_file(path):
    text = path.read_text()
    # whole-file JSON first (pretty-printed minima files span lines)
    try:
        yield from maps_from_obj(json.loads(text))
        return
    except json.JSONDecodeError:
        pass
    # else line-oriented: sbt capture prefixes lines with "[info] ",
    # and .jsonl / multi-line files carry one JSON object per line
    for line in text.splitlines():
        line = re.sub(r"^\[\w+\]\s*", "", line.strip())
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        # detail lines carry per-query maps; total lines carry none, so
        # yielding from both never double-counts
        yield from maps_from_obj(d)


def collect():
    """round -> list of per-query maps."""
    rounds = defaultdict(list)
    for p in sorted(LOGS.iterdir()):
        m = re.match(r"bench_r(\d+)", p.name)
        if not m:
            continue
        # the trend is the LOCAL-master minima protocol; multi-JVM
        # datapoints (bench_r*_cluster_*.json) are a different config
        # and live in their own BASELINE.md row
        if "cluster" in p.name:
            continue
        rounds[int(m.group(1))].extend(maps_from_file(p))
    return rounds


def trend():
    ids = core_ids()
    rows = []
    rounds = collect()
    for rnd in sorted(rounds):
        maps = rounds[rnd]
        minima = {}
        for mp in maps:
            for k, v in mp.items():
                if k not in minima or v < minima[k]:
                    minima[k] = v
        covered = ids & set(minima)
        full_ids = set(minima)
        rows.append({
            "round": rnd,
            "n_maps": len(maps),
            "core_covered": len(covered),
            "core_sum_of_minima_sec": round(sum(minima[k] for k in covered), 1),
            "full_n_queries": len(full_ids),
            "full_sum_of_minima_sec": round(sum(minima.values()), 1),
        })
    return rows


def main():
    if "--check" in sys.argv:
        path = Path(sys.argv[sys.argv.index("--check") + 1])
        ids = core_ids()
        mp = {}
        for m in maps_from_file(path):
            mp.update(m)
        missing = ids - set(mp)
        core = sum(v for k, v in mp.items() if k in ids and v >= 0)
        print(json.dumps({"core_sec": round(core, 1),
                          "core_covered": len(ids) - len(missing),
                          "missing": sorted(missing)}))
        sys.exit(1 if missing else 0)

    rows = trend()
    print("| round | runs | core ids | core sum-of-minima (s) | full n | full sum-of-minima (s) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| r{r['round']} | {r['n_maps']} | {r['core_covered']}/120 "
              f"| {r['core_sum_of_minima_sec']} | {r['full_n_queries']} "
              f"| {r['full_sum_of_minima_sec']} |")
    if "--json" in sys.argv:
        out = LOGS / "core_trend.json"
        out.write_text(json.dumps(rows, indent=1) + "\n")
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
