package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Layout, Scratch}

/** Z-order layout laws: the Morton interleave law (bit j of child i at
  * position j·k+i, clamp, null poisoning; interpreted eval == codegen),
  * and the layout's PURPOSE — on a two-predicate box query, the
  * z-clustered layout leaves strictly fewer files with overlapping
  * min/max boxes than the single-column sort, while both layouts answer
  * the census identically.
  */
class ZOrderSpec extends SparkSpec {

  /** reference interleave (plain Scala) — the ZOrder64 contract. */
  private def ref(vals: Seq[Long]): Long = {
    val k = vals.size
    val nb = 63 / k
    val maxV = (1L << nb) - 1
    var z = 0L
    for (i <- vals.indices) {
      val c = math.min(math.max(vals(i), 0L), maxV)
      for (j <- 0 until nb) z |= ((c >> j) & 1L) << (j * k + i)
    }
    z
  }

  test("interleave law: planted values, clamp, null poisoning, codegen == reference") {
    import spark.implicits._
    val df = Seq(
      (3L, 0L), (0L, 3L), (1L, 1L), (-5L, 2L), (Long.MaxValue, 7L)
    ).toDF("a", "b")
    val got = df.select(Layout.zorder(col("a"), col("b"))).collect().map(_.getLong(0))
    val want = Seq(Seq(3L, 0L), Seq(0L, 3L), Seq(1L, 1L), Seq(-5L, 2L),
      Seq(Long.MaxValue, 7L)).map(ref)
    assert(got.toSeq === want)
    assert(got(0) === 5L && got(1) === 10L && got(2) === 3L) // hand values
    val withNull = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(Layout.zorder(col("a"), col("b"))).collect()(0)
    assert(withNull.isNullAt(0))
    // 3-column variant
    val got3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(Layout.zorder(col("a"), col("b"), col("c"))).collect()(0).getLong(0)
    assert(got3 === 7L && got3 === ref(Seq(1L, 1L, 1L)))
  }

  /** files whose per-file (min,max) boxes overlap the query box. */
  private def overlapping(path: String, xlo: Long, xhi: Long, ylo: Long, yhi: Long): Long =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"))
      .where(col("x1") >= xlo && col("x0") <= xhi &&
        col("y1") >= ylo && col("y0") <= yhi)
      .count()

  test("two-predicate box: z-order layout prunes more files than the x-sort layout") {
    val n = 65536L
    val df = spark.range(n).select(
      col("id"),
      pmod(expr("xxhash64(id, 1)"), lit(1024L)).as("x"),
      pmod(expr("xxhash64(id, 2)"), lit(1024L)).as("y"))
    val cap = 512L // -> ~128 files per layout
    val xDir = Scratch.dir("zspec_xsort")
    df.withColumn("__k", col("x"))
      .repartitionByRange(128, col("__k")).sortWithinPartitions(col("__k")).drop("__k")
      .write.mode("overwrite").option("maxRecordsPerFile", cap).parquet(xDir)
    val zDir = Scratch.dir("zspec_zorder")
    Layout.zorderedParquet(df, zDir, Layout.zorder(col("x"), col("y")), 128, cap)

    // both layouts answer the census identically (layout-independence)
    def census(p: String) = spark.read.parquet(p)
      .where(col("x").between(128, 255) && col("y").between(128, 255))
      .agg(count(lit(1)), coalesce(sum(col("id")), lit(0L))).collect()(0)
    assert(census(xDir) === census(zDir))

    // the aligned 128-box: the x-sort can prune on x only (≈1/8 of the
    // files survive); the z-layout's boxes are tight in BOTH dims, so
    // the survivor set tracks the box AREA (≈1/64)
    val ox = overlapping(xDir, 128, 255, 128, 255)
    val oz = overlapping(zDir, 128, 255, 128, 255)
    info(s"x-sort overlapping files: $ox; z-order: $oz")
    assert(oz < ox, s"z-order ($oz files) did not beat x-sort ($ox files)")
    assert(oz * 2 <= ox, s"expected at least 2x fewer overlapping files: z=$oz x=$ox")
  }
}
