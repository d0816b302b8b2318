#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query,query,...]

For each query: load Spark's parquet result, run the oracle SQL in DuckDB
over the same sf dir, sort columns by name, sort rows, compare values.

The optional third argument restricts the run to a comma-separated list of
query-name PREFIXES — the same filter contract Verify.scala applies
(startsWith), so x100_gate.sh can pass one $QUERIES string to both stages.
oracle_sql.json always carries the FULL catalog, so a filtered Verify run
would otherwise stamp every unrequested query MISSING_RESULT and fail the
gate even when all targeted queries hash-match. A prefix that selects a
result dir without an oracle entry grades ROWS_ONLY (exactly as an
unfiltered run would); a prefix matching neither an oracle key nor a
result dir is a typo and fails loudly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def cell_eq(a, b) -> bool:
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    if (a is None or a != a) and (b is None or b != b):  # both null/NaN
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if af != af and bf != bf:
            return True
        return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return str(a) == str(b)


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Optional resource caps for big minted dirs (x10/x100): the heavy
    # oracle replays can exhaust threads/memory when run next to Spark
    # JVMs. No effect on results — identical SQL, bounded resources.
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    # Injection hygiene only (quote/newline), NOT a format whitelist:
    # DuckDB accepts size literals, '80%', plain byte counts and '-1' —
    # rejecting those would regression-break working configurations; a
    # malformed value still fails loudly in DuckDB's own SET parser.
    for var in ("GRAFT_DUCKDB_MEMLIMIT", "GRAFT_DUCKDB_TMP"):
        val = os.environ.get(var)
        if val and ("'" in val or "\n" in val):
            sys.exit(f"{var} contains a quote/newline — refusing to "
                     "interpolate it into SET")
    if os.environ.get("GRAFT_DUCKDB_MEMLIMIT"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEMLIMIT']}'")
    if os.environ.get("GRAFT_DUCKDB_TMP"):
        con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TMP']}'")
    for t in TABLES:
        # Driver fixtures are single files; MintScale output dirs hold
        # part files — accept both.
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # Parsed ONCE; every later filter decision reads these prefixes.
    prefixes = None
    if len(sys.argv) > 3 and sys.argv[3].strip():
        prefixes = [q.strip() for q in sys.argv[3].split(",") if q.strip()]

    def selected(name):
        return prefixes is None or any(name.startswith(p) for p in prefixes)

    if prefixes is not None:
        # Prefixes are validated against CATALOG NAMES, not stale result
        # dirs: Verify dumps queries_all.json (every catalog query name,
        # including rows-only ones with no oracle entry), so a typo'd
        # prefix fails loudly even when outdir still holds result dirs
        # from a prior broader run (r11 ADVICE — a stale dir used to
        # launder a typo into a silent ROWS_ONLY grade). Result dirs are
        # the fallback only when the manifest predates this contract.
        manifest_path = os.path.join(outdir, "queries_all.json")
        if os.path.exists(manifest_path):
            known = set(json.load(open(manifest_path))) | set(oracle)
        else:
            known = set(oracle) | {n for n in os.listdir(outdir)
                                   if os.path.isdir(os.path.join(outdir, n))}
        unknown = [p for p in prefixes
                   if not any(k.startswith(p) for k in known)]
        if unknown:
            sys.exit(f"query filter prefixes match nothing: {unknown} "
                     "(no catalog query name starts with them)")
        oracle = {k: v for k, v in oracle.items() if selected(k)}
    # Transcendental self-check (see Verify.scala / graft.ml.Gsdmm): the
    # GSDMM oracles assume JVM Math.log/exp == DuckDB libm bit-for-bit on
    # the exercised range. Replay Verify's pinned probe grid with EXACT
    # float64 parameters and bit-compare, so a rounding divergence is
    # named here instead of surfacing as a full GSDMM output mismatch.
    probe_path = os.path.join(outdir, "transcendental_probe.json")
    if os.path.exists(probe_path):
        probes = json.load(open(probe_path))
        bad_probes = []
        for p in probes:
            if p["fn"] not in ("ln", "exp"):
                sys.exit(f"transcendental probe: unexpected fn {p['fn']!r} "
                         "— refusing to interpolate it into SQL")
            x = np.int64(int(p["x_bits"])).view(np.float64)
            duck = con.execute(f"SELECT {p['fn']}(?::DOUBLE)",
                               [float(x)]).fetchone()[0]
            duck_bits = np.float64(duck).view(np.int64)
            if str(duck_bits) != p["bits"]:
                jvm = np.int64(int(p["bits"])).view(np.float64)
                bad_probes.append(f"{p['fn']}({x!r}): jvm={jvm!r} "
                                  f"duck={duck!r}")
        if bad_probes:
            print(f"⚠ TRANSCENDENTAL DIVERGENCE: {len(bad_probes)} of "
                  f"{len(probes)} ln/exp probes differ between the JVM and "
                  "DuckDB's libm — any ml_gsdmm_* mismatch below is "
                  "rounding, not replay logic (graft/ml/Gsdmm.scala):")
            for b in bad_probes[:8]:
                print(f"    {b}")
        else:
            print(f"transcendental probe: {len(probes)}/{len(probes)} "
                  "ln/exp bit-exact JVM≡DuckDB")
    results = {}
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        # progress marker (stderr): heavy oracle replays on big minted
        # dirs can die on allocation mid-loop — without this the
        # traceback names pandas, not the query whose oracle blew the
        # memory budget moments earlier.
        print(f"[check] {name}", file=sys.stderr, flush=True)
        # Under a query filter, result dirs from a broader Verify run are
        # out of scope — don't grade them as ROWS_ONLY. (Prefix match, so
        # an in-scope rows-only dir with no oracle entry IS graded.)
        if not selected(name):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}" + ("  ⚠ EMPTY" if len(got) == 0 else "")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(e)}"
            continue
        bad = None
        for ci, c in enumerate(g.columns):
            gv, ev = g[c].tolist(), e[c].tolist()
            for ri in range(len(gv)):
                if not cell_eq(gv[ri], ev[ri]):
                    bad = f"VALUE_MISMATCH col={c} row={ri} spark={gv[ri]!r} duck={ev[ri]!r}"
                    break
            if bad:
                break
        results[name] = bad or f"OK rows={len(g)}"
    # A query whose Spark run threw writes no result dir at all — surface
    # those instead of silently shrinking the denominator.
    for name in oracle:
        if name not in results:
            results[name] = "MISSING_RESULT (Spark-side failure — see verify stderr)"
    # A prefix that names a real catalog query can still grade NOTHING
    # when this check run and the Verify run used different filters: a
    # rows-only query (no oracle entry) with no result dir leaves no
    # trace above, and "0 OK ... of 0" would exit 0 (r12 ADVICE). Every
    # prefix must select at least one graded name, and a filtered run
    # must grade something.
    if prefixes is not None:
        ungraded = [p for p in prefixes
                    if not any(n.startswith(p) for n in results)]
        if ungraded or not results:
            sys.exit("query filter selected nothing gradable: prefixes "
                     f"{ungraded or prefixes} selected no graded result "
                     "(no oracle entry and no result dir matched — a typo'd "
                     "prefix, or a Verify invocation that used a different "
                     "filter)")
    # Optional machine-readable dump (GRAFT_CHECK_JSON=path): the scale
    # gates (x10/x100 protocol scripts) commit these as CORRECTNESS_*
    # artifacts instead of re-parsing the human lines.
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    # An EMPTY rows-only result is a failure: a crashed run that still wrote
    # an empty dir (or a query that degenerated to 0 rows) must not pass.
    n_rows_only = sum(1 for v in results.values()
                      if v.startswith("ROWS_ONLY") and "EMPTY" not in v)
    passed = n_ok + n_rows_only == len(results)
    # Machine-readable dump carries the SAME pass criterion as the exit
    # code (n_ok + non-empty rows-only == total) as an explicit boolean —
    # a consumer gating on n_ok == n_total alone would disagree with the
    # exit code whenever rows-only queries are in scope (r11 ADVICE).
    if os.environ.get("GRAFT_CHECK_JSON"):
        with open(os.environ["GRAFT_CHECK_JSON"], "w") as f:
            json.dump({"sf_dir": sfdir, "queries": results,
                       "n_ok": n_ok, "n_rows_only": n_rows_only,
                       "n_total": len(results), "passed": passed},
                      f, indent=1)
    for k, v in results.items():
        mark = "✓" if v.startswith("OK") else (
            "·" if v.startswith("ROWS_ONLY") and "EMPTY" not in v else "✗")
        print(f"{mark} {k}: {v}")
    print(f"\n{n_ok} OK, {n_rows_only} rows-only, "
          f"{len(results) - n_ok - n_rows_only} FAILED of {len(results)}")
    sys.exit(0 if passed else 1)


if __name__ == "__main__":
    main()
