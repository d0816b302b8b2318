package graft.queries

/** DuckDB face of [[graft.ml.DbscanCC.epsComponents]] — emits the CTE
  * chain that replays the LSH blocking, probe cap, exact cosine verify
  * and the component closure bit-for-bit (integer hyperplanes and
  * integer dots, so every sign/threshold test is exact in both engines).
  * The two MUST change in lockstep: band/bit/cap/salt/threshold here are
  * the same constants the Spark plan embeds as literals.
  */
object DbscanSql {

  /** CTE chain `<p>bkt`, `<p>cand`, `<p>edges0`, `<p>edges`, `<p>cc`
    * (no leading/trailing comma). Expects an existing CTE `srcCte` with
    * columns (`idCol`, `vecCol` BIGINT list of length `dims`, `s2Col`
    * BIGINT squared norm). `<p>cc` yields (`id`, `comp`) for every vertex
    * with ≥ 1 surviving eps-edge, `comp` = min id of the component —
    * exactly DbscanCC.epsComponents' contract.
    *
    * `cosineSql` is the threshold as a SQL literal (e.g. "0.9999") so the
    * text matches the Spark literal digit-for-digit. */
  def ccSql(p: String, srcCte: String, idCol: String, vecCol: String,
      s2Col: String, dims: Int, bands: Int, bits: Int, cap: Int,
      salt: String, cosineSql: String, requireDotPos: Boolean): String = {
    val dotPos = if (requireDotPos) "dot > 0 AND " else ""
    s"""${p}bkt AS (
      SELECT id, bd, bkey FROM (
        SELECT $idCol AS id, bd,
               CAST(list_sum([CASE WHEN list_sum([$vecCol[d+1] *
                   (CAST(concat('0x', substr(md5('$salt' ||
                      CAST(bd*$bits+j AS VARCHAR) || '_' ||
                      CAST(d AS VARCHAR)), 1, 15)) AS BIGINT)
                    % 2001 - 1000)
                   FOR d IN range(0, $dims)]) > 0
                 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END
                 FOR j IN range(0, $bits)]) AS BIGINT) AS bkey
        FROM $srcCte CROSS JOIN (SELECT unnest(range(0, $bands)) AS bd) t
        WHERE $s2Col > 0)
      QUALIFY row_number() OVER (PARTITION BY bd, bkey ORDER BY id) <= $cap),
    ${p}cand AS (
      SELECT DISTINCT a.id AS src, b.id AS dst
      FROM ${p}bkt a JOIN ${p}bkt b
        ON a.bd = b.bd AND a.bkey = b.bkey AND a.id < b.id),
    ${p}edges0 AS (
      SELECT src, dst FROM (
        SELECT c.src, c.dst,
               list_aggregate(list_transform(list_zip(x.$vecCol, y.$vecCol),
                 pr -> pr[1] * pr[2]), 'sum') AS dot,
               x.$s2Col AS sa, y.$s2Col AS sb
        FROM ${p}cand c
          JOIN $srcCte x ON x.$idCol = c.src
          JOIN $srcCte y ON y.$idCol = c.dst)
      WHERE ${dotPos}CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)
            >= $cosineSql * $cosineSql * CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)),
    ${p}edges AS (SELECT src, dst FROM ${p}edges0
                  UNION ALL SELECT dst, src FROM ${p}edges0),
    ${p}cc AS (
      WITH RECURSIVE reach(id, r) AS (
        SELECT DISTINCT src AS id, src AS r FROM ${p}edges
        UNION
        SELECT rc.id, e.dst FROM reach rc JOIN ${p}edges e ON e.src = rc.r)
      SELECT id, min(r) AS comp FROM reach GROUP BY id)"""
  }
}
