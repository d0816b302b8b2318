#!/usr/bin/env bash
# FULL-CATALOG x10 result-parity gate: mint the x10 dir, run every
# SparkEntry query through Verify, replay every oracle in DuckDB
# (alone, capped). The heavy-family subset lives in CORRECTNESS_X10.json
# (r7-r10 protocol); this is the whole-surface decade-up proof —
# 233/233 expected. Artifact: CORRECTNESS_X10_FULL.json.
# Usage: scripts/x10_gate.sh [mint_dir] (default /tmp/sf1)
set -euo pipefail
cd "$(dirname "$0")/.."
DIR="${1:-/tmp/sf1}"
OUT=/tmp/x10_gate_out

# Mint completeness sentinel: embeddings is the LAST table MintScale
# writes (Tables order), so its _SUCCESS proves the whole mint landed —
# a documents-only check would accept an interrupted mint and grade the
# gate against partial data. A NON-EMPTY dir without the sentinel could
# also be a hand-provisioned dataset (no Spark _SUCCESS markers) —
# re-minting would destroy it, so that case needs GRAFT_REMINT_OK=1
# (r11 ADVICE; same guard as x100_gate.sh).
if [ ! -f "$DIR/embeddings.parquet/_SUCCESS" ]; then
  if [ -d "$DIR" ] && [ -n "$(ls -A "$DIR" 2>/dev/null)" ] \
     && [ "${GRAFT_REMINT_OK:-}" != "1" ]; then
    echo "[x10] $DIR exists non-empty without the mint sentinel" >&2
    echo "[x10] (embeddings.parquet/_SUCCESS) — interrupted mint or" >&2
    echo "[x10] hand-provisioned data. Re-run with GRAFT_REMINT_OK=1" >&2
    echo "[x10] to overwrite." >&2
    exit 3
  fi
  echo "[x10] minting $DIR from /root/testdata/sf0.1 (x10)"
  scripts/run_main.sh graft.MintScale /root/testdata/sf0.1 "$DIR" 10
fi

echo "[x10] Spark side: full catalog"
rm -rf "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  scripts/run_main.sh graft.Verify "$DIR" "$OUT"

echo "[x10] DuckDB replay (run this ALONE — no Spark JVMs alive)"
GRAFT_DUCKDB_THREADS="${GRAFT_DUCKDB_THREADS:-4}" \
GRAFT_DUCKDB_MEMLIMIT="${GRAFT_DUCKDB_MEMLIMIT:-100GB}" \
GRAFT_DUCKDB_TMP="${GRAFT_DUCKDB_TMP:-/tmp/ducktmp}" \
GRAFT_CHECK_JSON="${GRAFT_CHECK_JSON:-/tmp/x10_full_check.json}" \
  python3 scripts/check.py "$OUT" "$DIR"
