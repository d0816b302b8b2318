package graft.queries

/** Generator for a murmur3_x86_32 implementation in DuckDB SQL — the
  * independent oracle for the engine's `murmur3_seeded` Catalyst
  * expression (P4). Works on FIXED-length ASCII string columns: the
  * per-4-byte-block mix rounds unroll at SQL-generation time (generic
  * length would need a recursive CTE; every fixture column hashed by an
  * oracle has a fixed layout, so unrolling keeps the SQL readable).
  *
  * Algorithm constants are the public murmur3 ones (Austin Appleby,
  * public domain): c1=0xcc9e2d51, c2=0x1b873593, rotl15/13, h*5+0xe6546b64,
  * fmix 16/13/16 with 0x85ebca6b / 0xc2b2ae35. HUGEINT intermediates make
  * the modular multiplies exact; the result folds to signed int32 like
  * mmh3's default signed output.
  */
object Mm3Sql {

  /** Emit CTEs `<p>_cb, <p>_r0.., <p>_fin` where `<p>_fin` = (k, hash):
    * murmur3(seed) of the fixed `n`-byte ASCII column `strCol`, keyed by
    * `keyCol`, reading from CTE/table `src` (NULL strings excluded). */
  def chain(src: String, keyCol: String, strCol: String, n: Int,
      seed: Long, p: String): String = {
    require(n >= 1, "empty-string chain not needed")
    val nb = n / 4
    val nt = n % 4
    val mixK =
      """CAST((CAST(%IN% AS HUGEINT) * 3432918353) %% 4294967296 AS BIGINT) AS k1,
              ((k1 * 32768) %% 4294967296) | (k1 // 131072) AS k2,
              CAST((CAST(k2 AS HUGEINT) * 461845907) %% 4294967296 AS BIGINT) AS k3"""
        .replace("%%", "%")
    val round = (i: Int) => s"""
        ${p}_r$i AS (
          SELECT k, ks, tl, hout AS h FROM (
            SELECT k, ks, tl,
              ${mixK.replace("%IN%", s"ks[$i]")},
              xor(h, k3) AS hx,
              ((hx * 8192) % 4294967296) | (hx // 524288) AS hr,
              CAST((CAST(hr AS HUGEINT) * 5 + 3864292196) % 4294967296 AS BIGINT) AS hout
            FROM ${p}_r${i - 1}))"""
    val tailExpr = nt match {
      case 0 => "0"
      case 1 => s"b[${4 * nb + 1}]"
      case 2 => s"b[${4 * nb + 1}] + b[${4 * nb + 2}]*256"
      case _ => s"b[${4 * nb + 1}] + b[${4 * nb + 2}]*256 + b[${4 * nb + 3}]*65536"
    }
    // h ^= mixK(tail) only when tail bytes exist, then fmix.
    val tailMix =
      if (nt == 0) "0 AS k3_unused, h AS htl"
      else s"""${mixK.replace("%IN%", "tl")},
              xor(h, k3) AS htl"""
    s"""
        ${p}_cb AS (
          SELECT $keyCol AS k,
                 [unicode(substr($strCol, i, 1)) FOR i IN range(1, ${n + 1})] AS b
          FROM $src WHERE $strCol IS NOT NULL),
        ${p}_r0 AS (
          SELECT k,
            [b[4*j+1] + b[4*j+2]*256 + b[4*j+3]*65536 + b[4*j+4]*16777216
             FOR j IN range(0, $nb)] AS ks,
            $tailExpr AS tl, ${seed}::BIGINT AS h
          FROM ${p}_cb),${(1 to nb).map(round).mkString(",")},
        ${p}_fin AS (
          SELECT k, hash FROM (
            SELECT k,
              $tailMix,
              xor(htl, $n) AS f0,
              xor(f0, f0 // 65536) AS f1,
              CAST((CAST(f1 AS HUGEINT) * 2246822507) % 4294967296 AS BIGINT) AS f2,
              xor(f2, f2 // 8192) AS f3,
              CAST((CAST(f3 AS HUGEINT) * 3266489909) % 4294967296 AS BIGINT) AS f4,
              xor(f4, f4 // 65536) AS f5,
              CASE WHEN f5 >= 2147483648 THEN f5 - 4294967296 ELSE f5 END AS hash
            FROM ${p}_r$nb))"""
  }
}
