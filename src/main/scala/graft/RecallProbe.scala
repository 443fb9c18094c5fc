package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity
import graft.queries.EmbedQueries

/** ANN bucket-budget probe: recall@5 and candidate cost of the
  * random-hyperplane LSH tier (Similarity.hyperplaneBucket) at several
  * bit counts over the real embeddings table, with the axis-aligned
  * sign bucket at 8 bits as the comparison row. This is the measurement
  * behind the `bits` knob's sizing guidance: recall falls and candidate
  * cost shrinks as bits grow (2^bits buckets over n vectors), so at
  * corpus scale bits is chosen to hold n²/2^bits — the per-bucket pair
  * count — near a target, then recall is re-measured before trusting
  * the index (embed_lsh_recall / embed_hyperplane_recall are the
  * oracle-checked single points; this sweeps the curve).
  *
  * Usage: runMain graft.RecallProbe [sfDir]
  * Prints one JSON line per configuration:
  *   {"tier":…,"bits":…,"buckets":…,"mean_recall":…,"cand_per_query":…}
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def probe(tier: String, bits: Int, bucket: org.apache.spark.sql.Column): Unit = {
      val r = EmbedQueries.recallAt5(spark, sfDir, bucket)
        .agg(avg(col("recall")).as("mr")).head().getDouble(0)
      val b = Similarity.vectors(Tables.embeddings(spark, sfDir))
        .withColumn("bucket", bucket)
      val q = b.where(col("vec_id") < 10).select(col("bucket"))
      val cand = b.where(col("vec_id") >= 10)
        .join(broadcast(q), "bucket").count() / math.max(1L, q.count())
      println(s"""{"tier":"$tier","bits":$bits,"buckets":${1L << bits},""" +
        s""""mean_recall":${math.rint(r * 1e6) / 1e6},"cand_per_query":$cand}""")
    }

    probe("sign", 8, Similarity.signBucket("v"))
    Seq(4, 6, 8, 10, 12).foreach(bits =>
      probe("hyperplane", bits, Similarity.hyperplaneBucket("v", bits, seed = 7, dim = 64)))
    spark.stop()
  }
}
