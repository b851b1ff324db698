#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [query...]
Positionals are classified by shape: path-like args (containing '/') bind
SF then OUT in order; everything else is a query-name filter — so
`check.py --skip-verify q135` and `check.py q135` both do what they say.
Runs graft.Verify, then for each query compares the Spark parquet result with
the DuckDB oracle result: schema (normalized), row count, and exact values
(columns sorted by name, rows sorted).

INCREMENTAL MODE: when query-name filters are given, they are forwarded to
graft.Verify, which executes ONLY those queries (minutes → seconds for
mid-round iteration). The filtered run's outdir then holds a SUBSET
manifest — use a distinct outdir per subset, and keep the full
three-SF, no-filter sweep as the round-closing gate. Pass --full-verify
to run the whole suite while comparing only the named queries.
"""
import json, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd
import numpy as np

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
_paths = [a for a in _pos if "/" in a]
SF = _paths[0] if len(_paths) > 0 else "/root/testdata/sf0.01"
OUT = _paths[1] if len(_paths) > 1 else "/tmp/graft_verify"
ONLY = [a for a in _pos if a not in _paths]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    # incremental mode: forward the name filter so Verify runs only those
    # queries (graft.Verify validates names and fails loudly on a typo)
    extra = "" if ("--full-verify" in sys.argv or not ONLY) else " " + " ".join(ONLY)
    r = subprocess.run(["sbt", "-batch", f"runMain graft.Verify {SF} {OUT}{extra}"],
                       capture_output=True, text=True, cwd="/root/repo")
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)
    if r.returncode != 0:
        print("VERIFY FAILED rc", r.returncode)
        print(r.stdout[-3000:])
        sys.exit(1)

con = duckdb.connect()
# out-of-core for the synthetic-scale oracles: without a temp_directory
# DuckDB cannot spill and the q148/q153 restatements ABORT (bad alloc,
# then SIGSEGV) at the x100 corpus; with it they run — slowly, which is
# fine for an oracle
con.execute("SET temp_directory='/tmp/duckdb_spill'")
# default derives from host RAM: min(48GB, half of physical) — a flat
# 48GB on a 16-32GB host would RAISE the cap past physical memory and
# invite the OOM-kill this setting exists to prevent (DuckDB's own
# default is ~80% of RAM). The q153 DSIR restatement at x100 needs
# ~100GB (GRAFT_DUCKDB_MEM=100GB) run alone on the 128G host.
import os as _os
_mem = _os.environ.get("GRAFT_DUCKDB_MEM")
if _mem is None:
    _total_gb = _os.sysconf("SC_PAGE_SIZE") * _os.sysconf("SC_PHYS_PAGES") / (1 << 30)
    _mem = f"{min(48, max(1, int(_total_gb / 2)))}GB"
con.execute(f"SET memory_limit='{_mem}'")
for t in TABLES:
    # a table may be one file (driver testdata) or a directory of part
    # files (tools/scaleup.py synth corpora) — glob the directory form
    src = f"{SF}/{t}.parquet"
    if Path(src).is_dir():
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

# --- ledger shrink-proofing (round-6 incident: 27 queries VANISHED from the
# driver ledger when the events loader broke — no err rows, no gate trip).
# The manifest is the full registered-query roll call, written by Verify
# BEFORE any query runs; every name in it must produce a compared row here,
# and a shrink (missing manifest, missing output, orphan oracle) is fatal.
# Manifest FIRST: Verify writes oracle_sql.json only after every query ran,
# so a crash mid-suite leaves a manifest without an oracle file — that case
# must reach the shrink diagnostics, not die in an unguarded read.
manifest_path = Path(f"{OUT}/manifest.json")
if not manifest_path.exists():
    print("FATAL: no manifest.json — Verify predates shrink-proofing or crashed at init")
    sys.exit(1)
manifest = json.loads(manifest_path.read_text())
oracle_path = Path(f"{OUT}/oracle_sql.json")
if not oracle_path.exists():
    print(f"FATAL: manifest lists {len(manifest)} queries but oracle_sql.json is missing"
          " — Verify crashed mid-suite; output dirs present: "
          + str(sorted(p.name for p in Path(OUT).iterdir() if p.is_dir())[:10]) + "...")
    sys.exit(1)
oracle = json.loads(oracle_path.read_text())
errors_path = Path(f"{OUT}/errors.json")
verify_errors = json.loads(errors_path.read_text()) if errors_path.exists() else {}
orphan_oracles = sorted(set(oracle) - set(manifest))
if orphan_oracles:
    print(f"FATAL: oracle entries with no registered query: {orphan_oracles}")
    sys.exit(1)

def unsortable_cols(df: pd.DataFrame):
    """Columns the DRIVER comparator cannot sort (it sort_values the raw
    frame; ndarray/list/dict cells are unhashable there). Our canon() used
    to silently stringify these, which hid q135's driver failure — now any
    such column fails the local gate too."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            # sample a prefix, not just the first cell: a mixed-type column
            # whose early rows are scalar would otherwise pass the gate and
            # still crash the driver comparator
            sample = df[c].dropna().head(20)
            if len(sample) and sample.map(
                    lambda v: isinstance(v, (np.ndarray, list, dict))).any():
                bad.append(c)
    return bad

def canon(df: pd.DataFrame) -> pd.DataFrame:
    import decimal
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], decimal.Decimal):
                df[c] = df[c].astype(float)
            else:
                df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)

fails = []
names = ONLY or sorted(manifest)
for name in names:
    spark_dir = Path(OUT) / name
    if not spark_dir.exists():
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    try:
        sdf = pd.concat([pd.read_parquet(p) for p in sorted(spark_dir.glob("*.parquet"))],
                        ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: spark read: {e}"); fails.append(name); continue
    if "__graft_error" in sdf.columns:
        msg = sdf["__graft_error"].iloc[0] if len(sdf) else "?"
        print(f"FAIL {name}: query threw in Verify: {msg}"); fails.append(name); continue
    ns = unsortable_cols(sdf)
    if ns:
        print(f"FAIL {name}: non-sortable output cols {ns} (driver comparator would crash)")
        fails.append(name); continue
    if name not in oracle:
        # ledger policy: EVERY registered query is oracle-gated (the driver
        # records a weaker rows-only check otherwise). Losing an oracle —
        # typo'd name, dropped entry — must fail here, not quietly degrade.
        # Pass --allow-rows-only when registering a deliberately
        # non-SQL-expressible op.
        if "--allow-rows-only" in sys.argv:
            print(f"OK?  {name}: rows-only ({len(sdf)} rows)"); continue
        print(f"FAIL {name}: no oracle entry (rows-only would weaken the gate)")
        fails.append(name); continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails.append(name); continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}"); fails.append(name); continue
    if sorted(sdf.columns) != sorted(odf.columns):
        print(f"FAIL {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        fails.append(name); continue
    s, o = canon(sdf), canon(odf)
    bad = []
    # int-vs-float dtype drift (e.g. DuckDB HUGEINT -> float64) passes a
    # tolerant value compare but breaks the driver's stringified hash.
    for c in s.columns:
        si = np.issubdtype(sdf[c].dtype, np.integer) if c in sdf else False
        oi = np.issubdtype(odf[c].dtype, np.integer) if c in odf else False
        sf_ = np.issubdtype(sdf[c].dtype, np.floating) if c in sdf else False
        of_ = np.issubdtype(odf[c].dtype, np.floating) if c in odf else False
        if (si and of_) or (sf_ and oi):
            bad.append(f"{c}: dtype drift spark={sdf[c].dtype} oracle={odf[c].dtype}")
    for c in s.columns:
        sv, ov = s[c], o[c]
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            sa, oa = sv.astype(float).values, ov.astype(float).values
            both_nan = np.isnan(sa) & np.isnan(oa)
            eq = (sa == oa) | both_nan
            if not eq.all():
                d = np.nanmax(np.abs(sa - oa))
                bad.append(f"{c}: {int((~eq).sum())} diffs, maxabs={d:.3e}")
        else:
            eq = (sv.values == ov.values) | (sv.isna().values & ov.isna().values)
            if not eq.all():
                i = int(np.argmax(~eq))
                bad.append(f"{c}: {int((~eq).sum())} diffs, e.g. {sv.values[i]!r} vs {ov.values[i]!r}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad)); fails.append(name)
    else:
        print(f"PASS {name} ({len(sdf)} rows)")

compared = len(names)
print(f"\n{compared - len(fails)}/{compared} pass"
      + (f" ({len(manifest)} registered)" if not ONLY else ""))
if verify_errors:
    print(f"VERIFY ERRORS ({len(verify_errors)}): "
          + "; ".join(f"{k}: {v[:120]}" for k, v in verify_errors.items()))
if not ONLY and compared != len(manifest):
    # unreachable by construction (names == manifest) but kept as a tripwire
    # against future edits reintroducing the oracle-keys iteration
    print(f"FATAL: compared {compared} != registered {len(manifest)}")
    sys.exit(1)
# verify_errors gates the exit too: if the poison-row write ITSELF failed
# and a stale output dir from a prior run survived, the compare could pass
# on stale data — an errors.json entry must fail the run regardless.
sys.exit(1 if (fails or verify_errors) else 0)
