#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have run
     (or runs it with --run)
  2. registers each testdata parquet as a DuckDB view
  3. runs every oracle_sql.json entry and compares with the Spark parquet
     output: schema (column names sorted), row count, and cell values
     (rows compared in order; queries are required to end in a total
     ORDER BY).
"""
import sys, os, json, math, subprocess, zlib
import duckdb

# --- Python-computed oracles (round-11): queries whose semantics are
# deterministic but not SQL-expressible. q255's DEFLATE length: CPython
# zlib.compress(data, 6) was measured BYTE-IDENTICAL (length and sha256
# of the full stream) to java.util.zip.Deflater(6) on 124 payloads
# drawn from all three SFs plus adversarial cases (empty, 1-byte,
# 100k-run, 50k-repeat) — both link madler zlib (1.2.13 here); the
# fixed-level, default-strategy DEFLATE encode is deterministic for a
# given zlib lineage. Evidence recorded in DESIGN.md ("q255 oracle").
def _q255_oracle(con, sf):
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()
    out = []
    for doc_id, text in rows:
        raw = text.encode("utf-8")
        n = len(zlib.compress(raw, 6))
        ratio = 10000 * n // max(len(raw), 1)
        keep = 1 if 2000 <= ratio <= 9500 else 0
        out.append((doc_id, len(raw), n, ratio, keep))
    return ["doc_id", "raw_bytes", "zip_bytes", "ratio_bp", "keep"], out

PY_ORACLES = {"q255_compression_gate": _q255_oracle}

# Lineage canary: the q255 oracle's validity rests on this Python's
# zlib emitting the SAME streams as the JVM Deflater — true for madler
# zlib (both wrap it), NOT guaranteed for a zlib-ng-linked CPython.
# Rather than spuriously failing the gate in such an environment,
# demote q255 to the rows-only check with a loud WARN when a fixed
# canary payload stops matching the digest measured on the swept stack
# (zlib 1.2.13 / OpenJDK 17.0.20 — byte-identical on 124 payloads).
import hashlib
_CANARY = (b"graft zlib lineage canary \x00\x01\x02" + b"ab" * 4096 +
           bytes(range(256)))
_CANARY_SHA = "2a8a62d9a2349ed739a1c7abdebe63c74fa718274caabcfb302d9cab88ccfb3d"
if hashlib.sha256(zlib.compress(_CANARY, 6)).hexdigest() != _CANARY_SHA:
    print("WARN zlib lineage differs from the swept stack (zlib-ng?): "
          "q255's python oracle would diverge from the JVM Deflater — "
          "demoting q255 to the rows-only check")
    PY_ORACLES = {}

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

if "--run" in sys.argv:
    r = subprocess.run(["sbt", f'runMain graft.Verify {SF} {OUT}'], cwd="/root/repo",
                       capture_output=True, text=True)
    print(r.stdout[-3000:], r.stderr[-2000:])

# The kmeans/LSH vector oracles (q66/q118/q257-q263) replay Lloyd
# iterations with DuckDB's unordered parallel sum() while Spark
# accumulates fixed-order; equality rests on argmin margins being O(1)
# against O(ulp) sum-order drift — validated empirically on THIS DuckDB
# version (round-9 advisor ask). A different version may partition its
# parallel sums differently; if the gate ever fails one of those
# queries with a bit-drift signature after an upgrade, check the margin
# audit in VectorOpsSpec ("assignment margins dwarf cross-engine
# drift") before suspecting the operators.
SWEPT_DUCKDB = "1.0.0"
if duckdb.__version__ != SWEPT_DUCKDB:
    print(f"WARN duckdb {duckdb.__version__} != swept {SWEPT_DUCKDB}: "
          f"vector-oracle equality was validated on {SWEPT_DUCKDB}; "
          f"near-tie kmeans cells could flip spuriously (see "
          f"VectorOpsSpec margin audit)")

con = duckdb.connect()
for t in TABLES:
    # driver testdata ships flat files; Spark-written scale-up dirs
    # (graft.ScaleUp) are directories of part files — glob those
    pat = (f"{SF}/{t}.parquet/*.parquet"
           if os.path.isdir(f"{SF}/{t}.parquet") else f"{SF}/{t}.parquet")
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
if "--only-present" in sys.argv:
    # subset iteration: check only the queries this Verify run dumped
    # (graft.Verify <sf> <out> [names...] writes a partial outdir)
    oracle = {k: v for k, v in oracle.items() if os.path.isdir(f"{OUT}/{k}")}
def norm(v):
    # exact comparison, floats included: verified bit-clean across the
    # whole suite, so any ULP drift is a real regression signal
    if isinstance(v, float) and math.isnan(v): return "NaN"
    return v

# --- Type audit (always on): the driver's hash is TYPE-sensitive even when
# values match (q173 round-7 incident: DuckDB windowed sum(BIGINT) -> HUGEINT
# propagated through `//`, hashing differently from Spark's BIGINT). DESCRIBE
# compiles each oracle without running it and fails the gate on any type the
# Spark side never emits: wide integers, and DECIMAL (the repo convention
# casts ratios to DOUBLE — a DECIMAL column would hash as Python Decimal
# against Spark's float). Round-8 sweep: the whole catalog emits only
# BIGINT/INTEGER/DOUBLE/VARCHAR/TIMESTAMP/DATE/BOOLEAN.
WIDE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")
n_type_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
    except Exception as e:
        print(f"TYPEFAIL {name}: describe error {str(e)[:200]}")
        n_type_fail += 1
        continue
    for col, typ, *_ in desc:
        if any(w in typ.upper() for w in WIDE_TYPES):
            print(f"TYPEFAIL {name}: column {col} is {typ} "
                  f"(cast it in the oracle SQL — Spark cannot emit this type)")
            n_type_fail += 1

n_pass = n_fail = 0

def compare(name, exp_cols, exp_rows, tag=""):
    """One comparison policy for BOTH oracle tiers (SQL and python):
    schema by sorted column names, row count, then cell values with
    columns aligned by sorted name (the driver sorts by name before
    hashing). Returns True on PASS and does its own accounting prints.
    """
    try:
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        got_cols = list(got.columns)
        got_rows = got.fetchall()
    except Exception as e:
        print(f"FAIL {name}: error {str(e)[:200]}")
        return False
    if sorted(exp_cols) != sorted(got_cols):
        print(f"FAIL {name}: cols exp={sorted(exp_cols)} got={sorted(got_cols)}")
        return False
    if len(exp_rows) != len(got_rows):
        print(f"FAIL {name}: rows exp={len(exp_rows)} got={len(got_rows)}")
        return False
    ei = [exp_cols.index(c) for c in sorted(exp_cols)]
    gi = [got_cols.index(c) for c in sorted(got_cols)]
    for rn, (er, gr) in enumerate(zip(exp_rows, got_rows)):
        e = [norm(er[i]) for i in ei]; g = [norm(gr[i]) for i in gi]
        if e != g:
            print(f"FAIL {name}: row {rn} exp={e} got={g}")
            return False
    print(f"PASS {name} ({len(exp_rows)} rows{tag})")
    return True

py_checked = {name: PY_ORACLES[name] for name in sorted(PY_ORACLES)
              if os.path.isdir(f"{OUT}/{name}")}
for name, fn in py_checked.items():
    try:
        exp_cols, exp_rows = fn(con, SF)
    except Exception as e:
        print(f"FAIL {name}: py-oracle error {str(e)[:200]}")
        n_fail += 1
        continue
    if compare(name, exp_cols, exp_rows, tag=", python oracle"):
        n_pass += 1
    else:
        n_fail += 1
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql)
        exp_cols = list(exp.columns)
        exp_rows = exp.fetchall()
    except Exception as e:
        print(f"FAIL {name}: error {str(e)[:200]}")
        n_fail += 1
        continue
    if compare(name, exp_cols, exp_rows):
        n_pass += 1
    else:
        n_fail += 1

# queries without oracle => rows-only check
for q in sorted(os.listdir(OUT)):
    p = os.path.join(OUT, q)
    if os.path.isdir(p) and q not in oracle and q not in PY_ORACLES:
        n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
        print(f"INFO {q}: no oracle, {n} rows")

print(f"\n{n_pass} passed, {n_fail} failed, "
      f"{len(oracle) + len(py_checked)} total oracles, "
      f"{n_type_fail} type-audit failures")
sys.exit(1 if (n_fail or n_type_fail) else 0)
