package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.TextOps

/** Deduplication operators over the documents table — the LLM-training-
  * data extension family. Three tiers:
  *
  *  - exact:      hash-groupBy (one shuffle on the digest; at 100 TB this
  *                is the only full-data shuffle and it carries 16-byte
  *                digests, not documents)
  *  - brute near: all-pairs Jaccard with an integer size-ratio prefilter —
  *                the CORRECTNESS baseline, quadratic, small-data only
  *  - MinHash-LSH: banded signatures -> equi-join on band keys -> verify.
  *                The 100 TB path: candidate generation is a hash join on
  *                (band, bh); cost scales with actual collisions, not n².
  *  - SimHash:    32-bit signature + hamming<=3 pairing.
  *
  * All hashing is md5-derived so the DuckDB oracle computes bit-identical
  * signatures (see TextOps.portableHash64Sql).
  */
object DedupQueries {

  /** Shared oracle SQL fragments (must stay in lockstep with TextOps). */
  private val wordsSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"
  private val shinglesCte =
    s"""t AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS s
       |  FROM t WHERE len(w) >= 3)""".stripMargin
  private def duckHash(salt: String, v: String): String =
    s"('0x' || substr(md5(CAST($salt AS VARCHAR) || ':' || $v), 1, 15))::BIGINT"

  val dedupExact: QueryDef = QueryDef.sql("dedup_exact",
    """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .orderBy(col("keep_id"))
  }

  /** Quadratic baseline: integer size-ratio prefilter (4*max <= 5*min
    * <=> min/max >= 0.8, a necessary condition for J >= 0.8), then exact
    * Jaccard on 3-word shingle sets.
    */
  val dedupNgramJaccard: QueryDef = QueryDef.sql("dedup_ngram_jaccard",
    s"""WITH $shinglesCte
       |SELECT a.doc_id AS i, b.doc_id AS j,
       |  round(len(list_intersect(a.s, b.s))::DOUBLE /
       |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS sim
       |FROM sh a JOIN sh b
       |  ON a.doc_id < b.doc_id
       | AND 4 * greatest(len(a.s), len(b.s)) <= 5 * least(len(a.s), len(b.s))
       |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
       |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8
       |ORDER BY i, j""".stripMargin) { (s, dir) =>
    val sh = TextOps.docShingles(Tables.documents(s, dir))
    val a = sh.select(col("doc_id").as("i"), col("sh").as("sa"))
    val b = sh.select(col("doc_id").as("j"), col("sh").as("sb"))
    a.join(broadcast(b), col("i") < col("j") &&
        lit(4) * greatest(size(col("sa")), size(col("sb"))) <=
          lit(5) * least(size(col("sa")), size(col("sb"))))
      .withColumn("sim", TextOps.jaccard(col("sa"), col("sb")))
      .where(col("sim") >= 0.8)
      .select(col("i"), col("j"), col("sim"))
      .orderBy(col("i"), col("j"))
  }

  /** Scale path: k=24 minhashes, 8 bands x 3 rows; candidates from an
    * equi-join on (band, band-hash); exact-Jaccard verify >= 0.8.
    */
  val dedupMinhashLsh: QueryDef = {
    val (k, bands, r) = (24, 8, 3)
    val duckSig =
      s"[list_min([${duckHash("i", "s2")} for s2 in s]) for i in range(0, $k)]"
    val duckSlice = (1 to r).map(o => s"sig[$r * b + $o]").mkString(" || ',' || ")
    QueryDef.sql("dedup_minhash_lsh",
      s"""WITH $shinglesCte,
         |sig AS (SELECT doc_id, s, $duckSig AS sig FROM sh),
         |bands AS (SELECT doc_id, b, md5(CAST(b AS VARCHAR) || ':' || $duckSlice) AS bh
         |          FROM sig CROSS JOIN range(0, $bands) r1(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |         FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |ver AS (SELECT c.i, c.j,
         |  round(len(list_intersect(x.s, y.s))::DOUBLE /
         |        (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))), 6) AS sim
         |  FROM cand c JOIN sh x ON x.doc_id = c.i JOIN sh y ON y.doc_id = c.j)
         |SELECT i, j, sim FROM ver WHERE sim >= 0.8 ORDER BY i, j""".stripMargin) { (s, dir) =>
      val sh = TextOps.docShingles(Tables.documents(s, dir))
      // signature evaluated once per doc (optimizer barrier, see TextOps)
      val sig = TextOps.barrier(
        sh.select(col("doc_id"), TextOps.minhashSig(k).as("sig")), "doc_id")
      val bandRows = sig
        .select(col("doc_id"), explode(TextOps.bandKeys(bands, r)).as("bd"))
        .select(col("doc_id"), col("bd.band").as("band"), col("bd.bh").as("bh"))
      val cand = bandRows.as("a")
        .join(bandRows.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("i"), col("sh").as("sa")), "i")
        .join(sh.select(col("doc_id").as("j"), col("sh").as("sb")), "j")
        .withColumn("sim", TextOps.jaccard(col("sa"), col("sb")))
        .where(col("sim") >= 0.8)
        .select(col("i"), col("j"), col("sim"))
        .orderBy(col("i"), col("j"))
    }
  }

  /** 32-bit SimHash near-dup pairs at hamming distance <= 3. */
  val dedupSimhash: QueryDef = {
    val duckWh = s"[${duckHash("'sh'", "s2")} for s2 in s]"
    val duckSig =
      s"""CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END for h in wh]) >= 0
         |  THEN (1::BIGINT << i) ELSE 0::BIGINT END for i in range(0, 32)]) AS BIGINT)""".stripMargin
    QueryDef.sql("dedup_simhash",
      s"""WITH $shinglesCte,
         |wh AS (SELECT doc_id, $duckWh AS wh FROM sh),
         |sg AS (SELECT doc_id, $duckSig AS sig FROM wh)
         |SELECT a.doc_id AS i, b.doc_id AS j,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS dist
         |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY i, j""".stripMargin) { (s, dir) =>
      val sh = TextOps.docShingles(Tables.documents(s, dir))
      // hash shingles once per doc, then fold bits once per doc
      val wh = TextOps.barrier(sh.select(col("doc_id"), expr(
        s"transform(sh, s2 -> ${TextOps.portableHash64Sql("'sh'", "s2")})").as("__wh")), "doc_id")
      val sg = TextOps.barrier(
        wh.select(col("doc_id"), TextOps.simhash32.as("sig")), "doc_id")
      sg.as("a").join(broadcast(sg.as("b")), col("a.doc_id") < col("b.doc_id"))
        .withColumn("dist", bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long"))
        .where(col("dist") <= 3)
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"), col("dist"))
        .orderBy(col("i"), col("j"))
    }
  }

  val all: Seq[QueryDef] = Seq(dedupExact, dedupNgramJaccard, dedupMinhashLsh, dedupSimhash)
}
