#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [only1,only2,...]

Runs after `graft.Verify` has dumped each query result to
<verifyOutDir>/<name>/ (parquet) and the oracle SQL to oracle_sql.json.
Registers every parquet table from <sfDir> as a DuckDB view, replays the
oracle SQL, and compares row multisets (columns sorted by name, values
rendered to strings).

The Spark side is read with pyarrow (type-preserving: DECIMAL stays
Decimal, renders "137431.00") while the oracle side goes through
DuckDB→pandas (DECIMAL becomes float64, renders "137431.0") — matching
the driver's asymmetric readers. A shared-reader normalization would
erase exactly the rendering differences the driver hashes (ADVICE r1).
"""
import datetime
import json
import sys

import duckdb
import pyarrow.dataset as pads


def render(v):
    # DATE columns: pyarrow renders datetime.date ("2024-01-01") while
    # DuckDB→pandas promotes to midnight datetime64 ("2024-01-01 00:00:00").
    # The driver's r1 gate passed date outputs (cdc_typemap), so this is a
    # replica-only asymmetry — normalize it away on both sides. Type-gated
    # (ADVICE r2): a string that happens to end in " 00:00:00" must not be
    # rewritten, and a genuine midnight TIMESTAMP-vs-DATE schema mismatch
    # between Spark and oracle should still surface. pd.Timestamp subclasses
    # datetime.datetime, so the isinstance covers both readers.
    if isinstance(v, datetime.datetime) and v.time() == datetime.time(0) \
            and v.tzinfo is None:
        return str(v.date())
    return str(v)


def norm_duck(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    rows = sorted(tuple(render(v) for v in row)
                  for row in df.itertuples(index=False))
    return cols, rows


def norm_spark(path):
    tbl = pads.dataset(path, format="parquet").to_table()
    cols = sorted(tbl.column_names)
    pydict = {c: tbl.column(c).to_pandas() for c in cols}
    n = tbl.num_rows
    rows = sorted(tuple(render(pydict[c][i]) for c in cols)
                  for i in range(n))
    return cols, rows


# Injected-state oracles (r16, verdict task 4): entries whose engine
# step has no SQL replay but IS reproducible outside the JVM. The one
# member is text_compressibility: java.util.zip.Deflater(6, nowrap)
# and Python zlib raw deflate (level 6, wbits=-15, memLevel 8, default
# strategy) produce byte-identical streams (probed: 0 size mismatches
# over all sf0.01 docs; both are zlib-derived deflate at the same
# parameters), so this replica computes per-doc compressed sizes with
# zlib, injects them as a DuckDB temp table, and oracles the
# downstream SQL (ratio, flag) exactly. The DRIVER's gate cannot run
# Python inside its DuckDB session, so the entry stays out of
# SparkEntry.oracleSql (rows-only there) — this check is the stronger
# local/judge-replay gate. If a zlib build ever diverges from the JVM
# deflater, this FAILS loudly instead of the divergence hiding behind
# the rows-only pin.
def inject_compressibility(con, sf_dir):
    import zlib
    docs = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchall()
    rows = []
    for doc_id, text in docs:
        raw = text.encode("utf-8")
        if not raw:
            rows.append((doc_id, 0, 0, 1.0))
        else:
            co = zlib.compressobj(6, zlib.DEFLATED, -15, 8,
                                  zlib.Z_DEFAULT_STRATEGY)
            comp = co.compress(raw) + co.flush()
            # math.rint replica: Python round() on a float is IEEE
            # round-half-even over the SAME double n/raw*1e4 the JVM
            # computes (DuckDB's round() is half-away — kept out of
            # the value path on purpose)
            ratio = round(len(comp) / len(raw) * 1e4) / 1e4
            rows.append((doc_id, len(raw), len(comp), ratio))
    con.execute("CREATE OR REPLACE TEMP TABLE zlib_sizes "
                "(doc_id BIGINT, n_bytes INT, n_compressed INT, "
                " ratio DOUBLE)")
    con.executemany("INSERT INTO zlib_sizes VALUES (?, ?, ?, ?)", rows)


# Mirrors graft.llm.TextOps.textCompressibility downstream of the
# injected deflate sizes + exact-in-IEEE ratio; empty docs pin ratio
# 1.0 unflagged.
INJECTED_ORACLES = {
    "text_compressibility": """
        SELECT doc_id, n_bytes, n_compressed, ratio,
          n_bytes > 0 AND ratio < 0.4 AS high_redundancy
        FROM zlib_sizes
    """,
}


def zlib_probe_ok(out_dir):
    """Precondition probe for the injected zlib oracle (r17, verdict
    task 5): graft.Verify dumps the JVM Deflater(6, nowrap) stream of a
    FIXED fixture (compressed in Verify's main, NOT through the
    operator) to zlib_probe.json. Byte-compare it against Python zlib
    raw deflate of the same fixture: equal → the injected oracle's
    premise holds; unequal → a foreign zlib build diverged from the JVM
    deflater, so the caller degrades text_compressibility to a
    rows-only check with this NAMED cause instead of surfacing a
    mystery hash mismatch (which would read as an operator bug)."""
    import base64
    import os
    import zlib
    p = f"{out_dir}/zlib_probe.json"
    if not os.path.exists(p):
        print("WARN zlib_probe.json missing (pre-r17 dump) — injected "
              "zlib oracle runs unprobed")
        return True
    probe = json.load(open(p))
    fixture = ("graft zlib probe: the quick brown fox jumps over the "
               "lazy dog 0123456789 ") * probe["fixture_repeat"]
    co = zlib.compressobj(6, zlib.DEFLATED, -15, 8, zlib.Z_DEFAULT_STRATEGY)
    comp = co.compress(fixture.encode("utf-8")) + co.flush()
    if base64.b64encode(comp).decode("ascii") == probe["deflate_b64"]:
        return True
    print("ZLIB DIVERGENCE: Python zlib raw deflate != JVM "
          "Deflater(6, nowrap) on the fixed probe fixture — this zlib "
          "build cannot replay the injected text_compressibility "
          "oracle; degrading that entry to rows-only. The OPERATOR is "
          "not implicated (the probe bypasses it).")
    return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # the injected oracles exist precisely BECAUSE their entries have no
    # driver-exported SQL; an overlap means someone added a weaker
    # oracle_sql entry that would silently shadow (or be shadowed by)
    # the stronger injected one — conflict loudly instead (ADVICE r16)
    overlap = sorted(INJECTED_ORACLES.keys() & oracle.keys())
    if overlap:
        sys.exit(f"CONFLICT: {overlap} present in BOTH oracle_sql.json "
                 "and INJECTED_ORACLES — an injected-oracle entry must "
                 "stay out of SparkEntry.oracleSql; resolve before "
                 "trusting this gate")
    inject_compressibility(con, sf_dir)
    rows_only = set() if zlib_probe_ok(out_dir) else {"text_compressibility"}
    oracle = {**INJECTED_ORACLES, **oracle}
    # optional third arg mirrors Verify's subset mode: re-check only the
    # just-touched entries (the driver always runs everything)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_cols, got = norm_spark(f"{out_dir}/{name}")
            exp_cols, exp = norm_duck(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif name in rows_only:
            if len(got) == len(exp):
                n_pass += 1
                print(f"PASS {name} ({len(got)} rows, ROWS-ONLY: zlib "
                      "divergence recorded above)")
            else:
                n_fail += 1
                print(f"FAIL {name}: rows spark={len(got)} "
                      f"oracle={len(exp)} (rows-only mode)")
        elif got != exp:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            diff_g = [r for r in got if r not in set(exp)][:3]
            diff_e = [r for r in exp if r not in set(got)][:3]
            print(f"  spark-only: {diff_g}")
            print(f"  oracle-only: {diff_e}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()


