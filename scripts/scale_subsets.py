#!/usr/bin/env python3
"""Mechanically reconstruct the scale_verify `--only` subsets (round 12).

CORRECTNESS_SCALE.md's rows-26 and len-N arms run on SUBSETS of the
declared inventory (the compare-sized families / the events-derived
families). This module defines those subsets as PREDICATES over two
repo artifacts — no hand-maintained id lists:

  events — oracled ids whose oracle SQL references the `events` table
           (every store/TVF oracle derives from it too, so the match is
           textual on the SQL). The `len N` arm transforms ONLY events;
           queries that never read it would compare a byte-identical
           copy — true but vacuous.
  small  — oracled ids whose sf0.01 output stayed <= 1000 rows, per the
           latest CORRECTNESS_r*.json in the repo root, MINUS ids whose
           oracle reads the embeddings table. The rows-26 arm
           replicates the corpus 260x over the per-round gate; the
           large-output dumps (full-table scans, per-row projections)
           are already covered by the rows-10 full sweep, and this
           subset keeps the 26x compare bounded. The embeddings
           exclusion is an ORACLE-cost bound, not a coverage hole: the
           pairwise-cosine oracles are DuckDB list-lambda self-joins
           (quadratic — q_dedup_embed alone ran >18 min at 26x before
           being cut), the family's arithmetic is float dot products
           with NO integer group-extent overflow class (the class
           rows arms exist to catch), and all of them hash-matched in
           the rows-10 FULL sweep.

Oracle SQL comes from `sbt "runMain graft.OracleDump <json>"` (pure
JVM, no Spark session); pass --oracle to reuse an existing dump.

Usage:
    python3 scripts/scale_subsets.py events [--oracle oracle_sql.json]
    python3 scripts/scale_subsets.py small

Prints the subset as one space-separated line (feed to scale_verify's
--only / graft.Verify's prefix args; full ids are their own prefixes).
"""
import json
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).parent.parent


def latest_correctness():
    # Numeric round sort: lexical sorting breaks at r100 (or any
    # non-zero-padded round name), silently resolving presets against
    # a stale round's row counts.
    cands = sorted(REPO.glob("CORRECTNESS_r*.json"),
                   key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    if not cands:
        raise SystemExit("scale_subsets: no CORRECTNESS_r*.json in repo root")
    return cands[-1]


FROM_STOP = re.compile(
    r"(where|group|order|having|window|limit|qualify|"
    r"union|intersect|except)\b", re.IGNORECASE)


def from_list_items(sql):
    """Yield the top-level items of every FROM list in `sql`: the span
    from each FROM to the next clause keyword or unbalanced ')' at
    paren depth 0, with paren innards blanked (so only FROM-list commas
    split) and split additionally on JOIN boundaries. Subquery FROMs
    get their own iteration of the outer finditer."""
    for m in re.finditer(r"\bfrom\b", sql, re.IGNORECASE):
        tail, depth, out = sql[m.end():], 0, []
        i = 0
        while i < len(tail):
            c = tail[i]
            if c == "(":
                depth += 1
                out.append(" ")
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
                out.append(" ")
            elif depth == 0:
                if FROM_STOP.match(tail, i) and (i == 0 or not tail[i - 1].isalnum()):
                    break
                out.append(c)
            else:
                out.append(" ")
            i += 1
        for item in re.split(r",|\bjoin\b", "".join(out), flags=re.IGNORECASE):
            yield item.strip()


def reads_table(sql, table):
    """True iff `sql` READS `table`: either a view reference — the
    table name as a FROM-list item or JOIN target (the oracles read
    the driver's registered DuckDB views by bare name) — or a
    read_*() file-source call whose quoted path has a segment named
    after the table (the interchange fixtures — e.g.
    read_csv('/tmp/graft_csv/<sf>/events/*.csv.gz') — are exported
    FROM that table by the Spark side, so both engines read
    table-derived data). An incidental mention in a string literal,
    select-list item, alias, or comment does not classify the query
    (ADVICE r13 #4: the old any-comma branch matched select-list
    items like "count(*), events")."""
    if re.search(rf"\bjoin\s+{table}\b", sql, re.IGNORECASE):
        return True
    t = table.lower()
    for item in from_list_items(sql):
        toks = item.split()
        if toks and toks[0].lower() == t:
            return True
    return re.search(rf"read_\w+\('[^']*/{table}[/.]", sql) is not None


def oracle_sql(path=None):
    if path is None:
        path = Path(tempfile.gettempdir()) / "graft_oracle_sql.json"
        rc = subprocess.call(["sbt", f"runMain graft.OracleDump {path}"],
                             cwd=str(REPO), stdout=subprocess.DEVNULL)
        if rc != 0:
            raise SystemExit(f"scale_subsets: OracleDump failed (rc={rc})")
    with open(path) as fh:
        return json.load(fh)


def subset(preset, oracle_path=None):
    with open(latest_correctness()) as fh:
        corr = json.load(fh)
    oracled = {k for k, v in corr.items() if not v.get("err")}
    if preset == "events":
        sql = oracle_sql(oracle_path)
        return sorted(k for k in oracled
                      if reads_table(sql.get(k, ""), "events"))
    if preset == "small":
        sql = oracle_sql(oracle_path)
        return sorted(k for k in oracled
                      if (corr[k].get("spark_rows") or 0) <= 1000
                      and not reads_table(sql.get(k, ""), "embeddings"))
    raise SystemExit(f"scale_subsets: unknown preset '{preset}' (events | small)")


def main(argv):
    preset = argv[1]
    oracle_path = None
    if "--oracle" in argv:
        oracle_path = argv[argv.index("--oracle") + 1]
    ids = subset(preset, oracle_path)
    print(" ".join(ids))
    print(f"scale_subsets: {preset} -> {len(ids)} ids", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
