#!/usr/bin/env bash
# x100 result-parity protocol (CORRECTNESS_X100_SLICE.json):
# mint the x100 dir, run the slice twins + the RangeWindow rewrites
# through Verify, replay their oracles in DuckDB (alone, capped).
# Usage: scripts/x100_gate.sh [mint_dir] (default /tmp/sf100)
set -euo pipefail
cd "$(dirname "$0")/.."
DIR="${1:-/tmp/sf100}"
OUT=/tmp/x100_gate_out
# r14: the slice list gains the r13/r14 additions whose oracles are
# scale-bounded or corpus-replayable at x100 — full ORACLE parity at
# the top scale point, not just execution coverage (the cold sweeps
# already execute all 242 there).
# GRAFT_X100_QUERIES overrides the default slice (r14) — used for the
# one-off heavy-corpus parity runs without growing the per-round gate.
QUERIES="${GRAFT_X100_QUERIES:-dedup_minhash_slice,dedup_winnowing_slice,dedup_containment_slice,ml_linkpred_slice,pipe_zorder_layout,window_rfm_scores,window_pareto_abc,pipe_web_curation,pipe_quota_sample,sim_rerank_blend,text_unicode_fix,src_html_outlinks}"

# Mint completeness sentinel: embeddings is the LAST table MintScale
# writes (Tables order), so its _SUCCESS proves the whole mint landed —
# a documents-only check would accept an interrupted mint and grade the
# gate against partial data. A NON-EMPTY dir without the sentinel is
# ambiguous — an interrupted mint (safe to overwrite) or a
# hand-provisioned dataset without Spark _SUCCESS markers (re-minting
# would destroy it) — so it requires an explicit opt-in instead of a
# silent mode(overwrite) (r11 ADVICE).
if [ ! -f "$DIR/embeddings.parquet/_SUCCESS" ]; then
  if [ -d "$DIR" ] && [ -n "$(ls -A "$DIR" 2>/dev/null)" ] \
     && [ "${GRAFT_REMINT_OK:-}" != "1" ]; then
    echo "[x100] $DIR exists non-empty but has no mint sentinel" >&2
    echo "[x100] (embeddings.parquet/_SUCCESS). If it is an interrupted" >&2
    echo "[x100] mint, re-run with GRAFT_REMINT_OK=1 to overwrite it;" >&2
    echo "[x100] if it is a hand-provisioned dataset, refusing to" >&2
    echo "[x100] destroy it." >&2
    exit 3
  fi
  echo "[x100] minting $DIR from /root/testdata/sf0.1 (x100)"
  scripts/run_main.sh graft.MintScale /root/testdata/sf0.1 "$DIR" 100
fi

echo "[x100] Spark side: $QUERIES"
rm -rf "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  scripts/run_main.sh graft.Verify "$DIR" "$OUT" "$QUERIES"

echo "[x100] DuckDB replay (run this ALONE — no Spark JVMs alive)"
# check.py gets the SAME query filter as Verify: oracle_sql.json always
# carries the full catalog, and without the filter every unrequested
# query would stamp MISSING_RESULT and force exit 1 even on a clean run
# (r10 ADVICE). No grep masking — the real exit code is the gate.
GRAFT_DUCKDB_THREADS="${GRAFT_DUCKDB_THREADS:-4}" \
GRAFT_DUCKDB_MEMLIMIT="${GRAFT_DUCKDB_MEMLIMIT:-100GB}" \
GRAFT_DUCKDB_TMP="${GRAFT_DUCKDB_TMP:-/tmp/ducktmp}" \
  python3 scripts/check.py "$OUT" "$DIR" "$QUERIES"
