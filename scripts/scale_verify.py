#!/usr/bin/env python3
"""At-scale differential correctness sweep (round 12, VERDICT r11 next #1).

Builds a transformed replica corpus with graft.ScaleVerify (mag-sum /
mag-moment / rows N — see its scaladoc for what each arm stresses),
dumps every declared query over it with graft.Verify, then runs the
driver-faithful DuckDB compare (check_driver.py) against the SAME
replica. One JSON summary line per arm goes to stdout; per-query
results print as the compare runs.

Usage:
    python3 scripts/scale_verify.py <srcSfDir> <arm> [factor]
        [--skip-build] [--skip-spark] [--only q1 q2 ...]
        [--preset events|small]

`--preset` resolves a documented query subset mechanically (see
scripts/scale_subsets.py) instead of a hand-passed --only list.

Round protocol: run the magnitude and row arms from sf0.1, the
series-length arm from sf0.01 (its events table grows by the factor;
per-row outputs stay compare-sized from the smaller base) —
    python3 scripts/scale_verify.py /root/testdata/sf0.1 mag-sum
    python3 scripts/scale_verify.py /root/testdata/sf0.1 mag-moment
    python3 scripts/scale_verify.py /root/testdata/sf0.1 rows 10
    python3 scripts/scale_verify.py /root/testdata/sf0.1 rows 26 --preset small
    python3 scripts/scale_verify.py /root/testdata/sf0.01 len 12 --preset events
    python3 scripts/scale_verify.py /root/testdata/sf0.1 rows-mag 10
    python3 scripts/scale_verify.py /root/testdata/sf0.1 mag-sum --wide

`--wide` re-runs the Spark dump with spark.graft.wideMoments=true (the
section-7.4 magnitude escape hatch): the mag-sum arm's 8 documented
loud exclusions are expected to go N/N under it.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
import check_driver  # noqa: E402

REPO = Path(__file__).parent.parent

# Tables ScaleVerify TRANSFORMS that carry a timestamp column. Spark
# embeds its own schema (TIMESTAMP_NTZ) in the parquet footer and
# trusts it over inference on read-back, so every session's
# inferTimestampNTZ=false would be bypassed and unix_micros(ts) fail
# to resolve. Rewriting through DuckDB strips the Spark metadata and
# writes plain naive-µs TIMESTAMP — the exact shape the driver
# testdata has. Tables without timestamps round-trip fine as written.
TS_TABLES = {
    "mag-sum": ["events", "lineitem"],
    "mag-moment": ["events"],
    "rows": ["events", "lineitem", "orders"],
    "rows-mag": ["events", "lineitem", "orders"],
    "len": ["events"],
}


def strip_spark_ts_metadata(data_dir, arm):
    import duckdb
    con = duckdb.connect()
    for t in TS_TABLES[arm]:
        f = f"{data_dir}/{t}.parquet"
        tmp = f + ".ddb.parquet"
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{f}')) TO '{tmp}' (FORMAT PARQUET)")
        os.replace(tmp, f)
    con.close()


def sbt(task, extra_env=None):
    env = dict(os.environ, **(extra_env or {}))
    return subprocess.call(["sbt", task], cwd=str(REPO), env=env)


def parse_args(rest):
    """Positional-flag parse: --only collects names up to the NEXT flag
    (so '--only q1 --preset small' can never swallow 'small' into the
    query-name set), --preset takes exactly one value (bounds-checked),
    unknown tokens fail loudly."""
    factor, only, preset, flags = "10", set(), None, set()
    i = 0
    if rest and rest[0].isdigit():
        factor, i = rest[0], 1
    while i < len(rest):
        a = rest[i]
        if a == "--preset":
            if i + 1 >= len(rest) or rest[i + 1].startswith("--"):
                raise SystemExit(
                    "SCALE_VERIFY: --preset needs a value (events | small)")
            preset, i = rest[i + 1], i + 2
        elif a == "--only":
            i += 1
            start = i
            while i < len(rest) and not rest[i].startswith("--"):
                only.add(rest[i])
                i += 1
            if i == start:
                raise SystemExit(
                    "SCALE_VERIFY: --only given but no query names followed")
        elif a in ("--skip-build", "--skip-spark", "--wide"):
            flags.add(a)
            i += 1
        else:
            raise SystemExit(f"SCALE_VERIFY: unknown argument '{a}'")
    return factor, only, preset, flags


def main(argv):
    src = argv[1]
    arm = argv[2]
    rest = argv[3:]
    factor, only, preset, flags = parse_args(rest)
    # Preset ids are EXACT full ids — they bypass the prefix expansion
    # below, so a deliberate preset exclusion (e.g. the embeddings
    # oracle-cost cut) can never be silently re-included by a future id
    # that happens to have an included id as a prefix (q_source_json →
    # q_source_jsonl was exactly that collision).
    preset_ids = set()
    if preset is not None:
        import scale_subsets
        ids = scale_subsets.subset(preset)
        if not ids:
            print(f"SCALE_VERIFY: preset '{preset}' resolved to zero ids")
            return 2
        print(f"SCALE_VERIFY: preset '{preset}' -> {len(ids)} ids")
        preset_ids = set(ids)
    # --wide: run the Spark dump with spark.graft.wideMoments=true (the
    # §7.4 magnitude escape hatch) — same replica corpus, separate out
    # dir; the oracles are magnitude-unbounded (HUGEINT-first products)
    # so the compare expects N/N where the default mag-sum arm
    # documents its 8 loud exclusions.
    wide = "--wide" in flags
    tag = f"{arm}{factor}" if arm in ("rows", "rows-mag", "len") else arm
    data = f"/tmp/graft_sv_{tag}"
    out = f"/tmp/graft_sv_out_{tag}" + ("_wide" if wide else "")
    if "--skip-build" not in flags and "--skip-spark" not in flags:
        rc = sbt(f"runMain graft.ScaleVerify {src} {data} {arm} {factor}")
        if rc != 0:
            print(f"SCALE_VERIFY: corpus build failed (rc={rc})")
            return rc
        strip_spark_ts_metadata(data, arm)
    if "--skip-spark" not in flags:
        names = sorted(only | preset_ids)
        filt = " " + " ".join(names) if names else ""
        rc = sbt(f"runMain graft.Verify {data} {out}{filt}",
                 {"SPARK_GRAFT_WIDE_MOMENTS": "true"} if wide else None)
        if rc != 0:
            print(f"SCALE_VERIFY: spark dump failed (rc={rc})")
            return rc
    # graft.Verify treats filter entries as PREFIX filters while
    # check_driver requires exact id membership. Hand-passed --only
    # entries are expanded against the dumped oracle ids so both halves
    # see the same set, failing LOUDLY if an entry matches nothing (a
    # typo'd or renamed id must not produce a vacuous 0/0 green gate)
    # and LOGGING every id the expansion ADDS (so prefix collisions
    # like q_source_json → q_source_jsonl are visible, never silent).
    # Preset ids skip expansion entirely: they are exact by
    # construction, and widening them would reopen the preset's
    # documented exclusions.
    compare = set(preset_ids)
    if only:
        with open(f"{out}/oracle_sql.json") as fh:
            oracle_ids = set(json.load(fh))
        unmatched = sorted(o for o in only
                           if not any(n.startswith(o) for n in oracle_ids))
        if unmatched:
            print(f"SCALE_VERIFY: --only entries match no oracle ids: {unmatched}")
            return 2
        expanded = {n for n in oracle_ids
                    if any(n.startswith(o) for o in only)}
        added = sorted(expanded - only)
        if added:
            print(f"SCALE_VERIFY: prefix expansion added {len(added)} ids: "
                  f"{added}")
        compare |= expanded
    rc = check_driver.main(data, out, compare)
    print(json.dumps({"metric": "scale_verify", "arm": arm,
                      "src": src, "factor": int(factor), "wide": wide,
                      "all_match": rc == 0}))
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv))
