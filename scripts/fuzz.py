#!/usr/bin/env python3
"""Differential fuzz sweep vs DuckDB (VERDICT r10 next #1).

Drives graft.Fuzz (Spark side of the seeded QueryGen set, run inside a
GraftExtensions session) and then compares every result against DuckDB
with check_driver.py's driver-faithful pandas-hash compare — same
column-sort, dtype, row-count, and hash gates as the round's
correctness sweep, applied to query shapes nobody declared.

Usage:
    python3 scripts/fuzz.py <sfDir> [seed] [count] [tvfCount] [--skip-spark]

`tvfCount` (default 100) seeded graft_fetch* TVF draws ride along in
the same sweep (round 14 — TvfGen puts the SQL-text store surface
under the same differential pressure).

The round checklist runs (next to check_driver.py):
    python3 scripts/fuzz.py /root/testdata/sf0.001 11 500
"""
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
import check_driver  # noqa: E402


def main(argv):
    sf_dir = argv[1]
    seed = argv[2] if len(argv) > 2 and not argv[2].startswith("-") else "11"
    count = argv[3] if len(argv) > 3 and not argv[3].startswith("-") else "500"
    tvf = argv[4] if len(argv) > 4 and not argv[4].startswith("-") else "100"
    out_dir = f"/tmp/graft_fuzz_{Path(sf_dir).name}_{seed}_{count}_{tvf}"
    if "--skip-spark" not in argv:
        rc = subprocess.call(
            ["sbt",
             f"runMain graft.Fuzz {sf_dir} {out_dir} {seed} {count} {tvf}"],
            cwd=str(Path(__file__).parent.parent))
        if rc != 0:
            print(f"FUZZ: spark side failed (rc={rc})")
            return rc
    return check_driver.main(sf_dir, out_dir, set())


if __name__ == "__main__":
    sys.exit(main(sys.argv))
