package graft

import org.apache.spark.sql.functions._
import graft.ops.{IvfIndex, Scratch}

/** Persisted-index append laws: with centroids held fixed, appending a
  * batch must equal a full rebuild — cell assignments, probe results,
  * and file layout (append adds files, never rewrites the base).
  */
class IvfIndexSpec extends SparkSpec {

  private val dim = 8

  /** 4 planted clusters at scaled unit corners; base ids 0..199,
    * batch ids 200..249 drawn from the same clusters.
    */
  private def planted(n: Int, idBase: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(idBase + 5)
    (0 until n).map { k =>
      val c = rnd.nextInt(4)
      val v = Array.tabulate(dim)(i =>
        (if (i == c) 10.0 else 0.0) + rnd.nextInt(100) / 1000.0)
      (idBase + k, v.toSeq)
    }.toDF("vec_id", "v")
  }

  test("append == rebuild: assignments and probe agree with assign-all on fixed centroids") {
    val base = planted(200, 0L)
    val batch = planted(50, 200L)
    val root = Scratch.dir("spec_ivf_append")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.append(spark, batch, root)

    val got = IvfIndex.assignments(spark, root)
      .select(col("vec_id"), col("cl")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.ml.KMeans.assign(
        base.unionByName(batch), IvfIndex.centroids(spark, root))
      .select(col("vec_id"), col("cl")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.size === 250)

    // probe over the appended index == probe over a rebuilt index
    val rebuiltRoot = Scratch.dir("spec_ivf_rebuild")
    IvfIndex.build(base, k = 4, iters = 2, rebuiltRoot)
    graft.ml.KMeans.assign(base.unionByName(batch), IvfIndex.centroids(spark, rebuiltRoot))
      .select(col("vec_id"), col("v"), col("cl"))
      .write.mode("overwrite").partitionBy("cl").parquet(s"$rebuiltRoot/assignments")
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    def res(r: String) = IvfIndex.probe(spark, q, r, nprobe = 2, topk = 3,
        cand = _.where(col("vec_id") >= 5)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    assert(res(root) === res(rebuiltRoot))
  }

  test("append only ADDS files under the cell partitions (base never rewritten)") {
    val base = planted(200, 0L)
    val batch = planted(50, 200L)
    val root = Scratch.dir("spec_ivf_files")
    IvfIndex.build(base, k = 4, iters = 2, root)
    // identity = (path, CONTENT hash): mtime granularity is 1 s on some
    // filesystems, so a same-length rewrite within one tick would have
    // slipped past an (mtime, length) check (r11 advice)
    def files = {
      val fs = new java.io.File(s"$root/assignments")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      walk(fs).filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          (f.getAbsolutePath, md.digest(bytes).map("%02x".format(_)).mkString)
        }.toSet
    }
    val before = files
    IvfIndex.append(spark, batch, root)
    val after = files
    assert(before.subsetOf(after), "append rewrote or dropped base files")
    assert(after.size > before.size, "append added no files")
  }

  test("delete + compact == rebuild on the surviving set (fixed centroids)") {
    val base = planted(200, 0L)
    val batch = planted(50, 200L)
    val root = Scratch.dir("spec_ivf_delete")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.append(spark, batch, root)
    val doomed = base.unionByName(batch).where(col("vec_id") % 5 === 0)
    IvfIndex.delete(spark, doomed, root)
    val compacted = IvfIndex.compact(spark, root, minRatio = 0.1)
    assert(compacted.nonEmpty, "ratio 0.1 should compact at least one cell (20% deleted)")

    val got = IvfIndex.liveAssignments(spark, root)
      .select(col("vec_id"), col("cl")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.ml.KMeans.assign(
        base.unionByName(batch).where(col("vec_id") % 5 =!= 0),
        IvfIndex.centroids(spark, root))
      .select(col("vec_id"), col("cl")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(!got.exists(_._1 % 5 == 0), "a tombstoned vector survived")

    // probe over the compacted index == probe over a survivor-only rebuild
    val rebuiltRoot = Scratch.dir("spec_ivf_delete_rebuild")
    IvfIndex.build(base, k = 4, iters = 2, rebuiltRoot)
    graft.ml.KMeans.assign(
        base.unionByName(batch).where(col("vec_id") % 5 =!= 0),
        IvfIndex.centroids(spark, rebuiltRoot))
      .select(col("vec_id"), col("v"), col("cl"))
      .write.mode("overwrite").partitionBy("cl").parquet(s"$rebuiltRoot/assignments")
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    def res(r: String) = IvfIndex.probe(spark, q, r, nprobe = 2, topk = 3,
        cand = _.where(col("vec_id") >= 5)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    assert(res(root) === res(rebuiltRoot))
  }

  test("compaction rewrites ONLY cells above the tombstone ratio (file-diff law)") {
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivf_compact_files")
    IvfIndex.build(base, k = 4, iters = 2, root)
    // tombstone ~half of ONE cell's members; other cells get nothing
    val asg = IvfIndex.assignments(spark, root)
    val targetCell = asg.groupBy(col("cl")).count()
      .orderBy(col("count").desc, col("cl")).head().getLong(0)
    val doomed = asg.where(col("cl") === targetCell && col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("v"))
    IvfIndex.delete(spark, doomed, root)
    def files(cell: Long) = {
      val dir = new java.io.File(s"$root/assignments/cl=$cell")
      val md = java.security.MessageDigest.getInstance("SHA-256")
      if (!dir.isDirectory) Set.empty[(String, String)]
      else dir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        (f.getAbsolutePath,
          md.digest(java.nio.file.Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString)
      }.toSet
    }
    val cells = asg.select(col("cl")).distinct().collect().map(_.getLong(0)).toSeq
    val before = cells.map(c => c -> files(c)).toMap
    val compacted = IvfIndex.compact(spark, root, minRatio = 0.25)
    assert(compacted === Seq(targetCell), s"compacted $compacted, expected $targetCell only")
    val after = cells.map(c => c -> files(c)).toMap
    for (c <- cells if c != targetCell)
      assert(after(c) === before(c), s"untouched cell $c was rewritten")
    assert(after(targetCell) !== before(targetCell), "target cell files unchanged")
    // applied tombstones left the tombstone table
    assert(IvfIndex.tombstones(spark, root).count() === 0L)
    // physical rows of the target cell are survivors only
    val live = spark.read.parquet(s"$root/assignments/cl=$targetCell")
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(live.forall(_ % 2 != 0))
  }

  test("appendPq == re-encode of base + batch at fixed books (PQ halves stay in lockstep)") {
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(200, 0L)
    val batch = planted(50, 200L)
    val all = base.unionByName(batch)
    val root = Scratch.dir("spec_ivfpq_append")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPq(spark, base, m, dsub, codes, iters = 2, root)
    IvfIndex.append(spark, batch, root)
    IvfIndex.appendPq(spark, batch, m, dsub, root)
    val got = IvfIndex.codes(spark, root).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    // reference: encode base ∪ batch against the PERSISTED books + cells
    val ss = graft.queries.EmbedQueries.pqSubSlices(all, "vec_id", m, dsub)
      .select(col("vec_id"), col("sub"), col("svec").as("v"))
    val want = graft.ml.KMeans.assignGrouped(ss, IvfIndex.codebooks(spark, root),
        idCol = "vec_id", grpCol = "sub")
      .select(col("vec_id"), col("sub"), col("cl").as("code"))
      .join(graft.ml.KMeans.assign(all, IvfIndex.centroids(spark, root))
        .select(col("vec_id"), col("cl")), "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
  }

  test("compaction rewrites the CODES half in lockstep: drained tombstones cannot resurrect") {
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivfpq_compact")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPq(spark, base, m, dsub, codes, iters = 2, root)
    val doomed = base.where(col("vec_id") % 5 === 0).select(col("vec_id"), col("v"))
    IvfIndex.delete(spark, doomed, root)
    val compacted = IvfIndex.compact(spark, root, minRatio = 0.1)
    assert(compacted.nonEmpty)
    // the applied tombstones are DRAINED — if codes kept the dead rows
    // they would reappear at the next ADC probe
    assert(IvfIndex.tombstones(spark, root).count() === 0L)
    val deadInCodes = IvfIndex.codes(spark, root)
      .where(col("vec_id") % 5 === 0).count()
    assert(deadInCodes === 0L, s"$deadInCodes dead code rows survived compaction")
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val probed = IvfIndex.probePq(spark, q, root, m, dsub, nprobe = 2, topk = 3,
      cand = _.where(col("vec_id") >= 5)).collect().map(_.getLong(1))
    assert(probed.forall(_ % 5 != 0), "a deleted vector resurfaced in the ADC probe")
  }

  test("SQ8 half: append == re-quantize of base + batch; compaction drains it in lockstep; refine never resurrects") {
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(200, 0L)
    val batch = planted(50, 200L)
    val root = Scratch.dir("spec_ivf_sq8")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, root)
    IvfIndex.buildSq8(spark, root)
    IvfIndex.append(spark, batch, root)
    IvfIndex.appendSq8(spark, batch, root)
    // append ≡ re-quantize of base ∪ batch at the persisted centroids
    def sq8Rows = IvfIndex.sq8(spark, root).collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Byte](2).toList, r.getLong(3))).toSet
    val all = base.unionByName(batch)
    val want = graft.ml.KMeans.assign(all, IvfIndex.centroids(spark, root))
      .withColumn("qs", lit(127.0) /
        greatest(expr("array_max(transform(v, x -> abs(x)))"), lit(1e-12)))
      .select(col("vec_id"), col("qs"),
        expr("transform(v, x -> CAST(floor(x * qs + CAST(0.5 AS DOUBLE)) AS TINYINT))").as("q"),
        col("cl"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Byte](2).toList, r.getLong(3))).toSet
    assert(sq8Rows === want, "appendSq8 drifted from a full re-quantize")
    // dequantization error is bounded by half a step: |x - q/qs| <= 0.5/qs
    val maxErr = IvfIndex.liveSq8(spark, root)
      .join(all.select(col("vec_id"), col("v").as("raw")), "vec_id")
      .select(expr("array_max(transform(zip_with(v, raw, (a, b) -> abs(a - b)), x -> x))").as("e"),
        (lit(0.5) * greatest(expr("array_max(transform(raw, x -> abs(x)))"), lit(1e-12)) / 127.0).as("bound"))
      .where(col("e") > col("bound") + lit(1e-12)).count()
    assert(maxErr === 0L, "dequantization error exceeds half an int8 step")
    // delete + compact: the sq8 half rewrites in lockstep, and the
    // sq8-armed refine never serves a drained tombstone
    val doomed = all.where(col("vec_id") % 5 === 0).select(col("vec_id"), col("v"))
    IvfIndex.delete(spark, doomed, root)
    assert(IvfIndex.compact(spark, root, minRatio = 0.1).nonEmpty)
    assert(IvfIndex.tombstones(spark, root).count() === 0L)
    assert(IvfIndex.sq8(spark, root).where(col("vec_id") % 5 === 0).count() === 0L,
      "dead sq8 rows survived compaction")
    val q = all.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val probed = IvfIndex.probeRefine(spark, q, root, m, dsub, nprobe = 2,
        shortlist = 12, topk = 3, cand = _.where(col("vec_id") >= 5), fromSq8 = true)
      .collect().map(_.getLong(1))
    assert(probed.nonEmpty && probed.forall(_ % 5 != 0),
      "a deleted vector resurfaced in the sq8 refine")
  }

  test("an append that skipped appendSq8 fails fast at the NEXT mutation (sq8 lockstep guard)") {
    // r15 advice: appendSq8 is call discipline; probeRefine(fromSq8)
    // inner-joins the shortlist against liveSq8, so a missed appendSq8
    // would silently drop the missing vectors from the re-rank forever.
    // The guard converts the silent degradation into a loud require at
    // the next append.
    val root = Scratch.dir("spec_ivf_sq8_lockstep")
    IvfIndex.build(planted(60, 0L), k = 2, iters = 2, root)
    IvfIndex.buildSq8(spark, root)
    IvfIndex.append(spark, planted(10, 100L), root) // lockstep held (60==60)
    // ... but its appendSq8 is SKIPPED — the next append must refuse
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, planted(5, 200L), root)
    }
    assert(e.getMessage.contains("lockstep"),
      s"wrong lockstep message: ${e.getMessage}")
    // healing the drift (the missing appendSq8) re-opens the path
    IvfIndex.appendSq8(spark, planted(10, 100L), root)
    IvfIndex.append(spark, planted(5, 200L), root)
    IvfIndex.appendSq8(spark, planted(5, 200L), root)
    assert(IvfIndex.assignments(spark, root).count() === 75L)
    assert(IvfIndex.sq8(spark, root).count() === 75L)
  }

  test("STREAMED append (file-source micro-batches, SHUFFLED chunk order) == batch append") {
    // the streaming_ivf_append_replay parity law, deliberately harder
    // than the gate row: chunks interleave ids (range key = vec_id % 7),
    // so arrival order differs from id order — with centroids held
    // fixed, appends commute and the streamed index must read back
    // identical to the one-shot batch append, probes included
    val base = planted(200, 0L)
    val batch = planted(60, 200L)
    val rootS = Scratch.dir("spec_ivf_streamed")
    val rootB = Scratch.dir("spec_ivf_streamed_batch")
    IvfIndex.build(base, k = 4, iters = 2, rootS)
    IvfIndex.build(base, k = 4, iters = 2, rootB)
    IvfIndex.append(spark, batch, rootB)
    val shuffled = batch.withColumn("__o", col("vec_id") % 7)
    val (watched, staged) = graft.queries.StreamingReplays.stageOrderedFiles(
      shuffled, 3, Seq(col("__o")))
    try {
      val stream = spark.readStream.schema(shuffled.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched)
      val appendBatch: (org.apache.spark.sql.DataFrame, Long) => Unit =
        (b, _) => IvfIndex.append(spark, b.select(col("vec_id"), col("v")), rootS)
      val query = stream.writeStream.outputMode("append")
        .foreachBatch(appendBatch).start()
      try query.processAllAvailable() finally query.stop()
    } finally graft.queries.StreamingReplays.rmTree(staged)
    def asg(r: String) = IvfIndex.assignments(spark, r)
      .select(col("vec_id"), col("cl")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(asg(rootS) === asg(rootB))
    assert(asg(rootS).size === 260)
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    def res(r: String) = IvfIndex.probe(spark, q, r, nprobe = 2, topk = 3,
        cand = _.where(col("vec_id") >= 5)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    assert(res(rootS) === res(rootB))
  }

  test("STREAMED deletes with IN-STREAM threshold compaction == one-shot delete ∘ compact") {
    // the streaming_ivf_delete_replay parity law, extended with the r13
    // verdict's maintenance-loop policy: every micro-batch follows its
    // tombstone append with a threshold compact — compaction MUST fire
    // mid-stream (counted below) while later retraction chunks keep
    // arriving, and the final serving set must still equal the one-shot
    // batch delete ∘ compact (retraction chunks streamed in NON-id
    // order: tombstone appends commute, compaction never changes what a
    // probe sees)
    val base = planted(200, 0L)
    val rootS = Scratch.dir("spec_ivf_sdel")
    val rootB = Scratch.dir("spec_ivf_sdel_batch")
    IvfIndex.build(base, k = 4, iters = 2, rootS)
    IvfIndex.build(base, k = 4, iters = 2, rootB)
    val doomed = base.where(col("vec_id") % 5 === 0).select(col("vec_id"))
    IvfIndex.delete(spark, doomed, rootB)
    val midCompacted = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuffled = doomed.withColumn("__o", col("vec_id") % 3)
    val (watched, staged) = graft.queries.StreamingReplays.stageOrderedFiles(
      shuffled, 3, Seq(col("__o")))
    try {
      val stream = spark.readStream.schema(shuffled.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched)
      val deleteBatch: (org.apache.spark.sql.DataFrame, Long) => Unit =
        (b, _) => {
          IvfIndex.delete(spark, b.select(col("vec_id")), rootS)
          midCompacted.addAndGet(
            IvfIndex.compact(spark, rootS, minRatio = 0.1).size.toLong): Unit
        }
      val query = stream.writeStream.outputMode("append")
        .foreachBatch(deleteBatch).start()
      try query.processAllAvailable() finally query.stop()
    } finally graft.queries.StreamingReplays.rmTree(staged)
    assert(midCompacted.get() > 0L,
      "no cell crossed the threshold mid-stream — the policy was never exercised")
    def live(r: String) = IvfIndex.liveAssignments(spark, r)
      .select(col("vec_id"), col("cl")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    def res(r: String) = IvfIndex.probe(spark, q, r, nprobe = 2, topk = 3,
        cand = _.where(col("vec_id") >= 5)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    assert(live(rootS) === live(rootB))
    assert(!live(rootS).exists(_._1 % 5 == 0), "a streamed tombstone failed to mask")
    val preCompact = res(rootS)
    assert(preCompact === res(rootB))
    // batch side compacts once; streamed side already compacted in-stream
    IvfIndex.compact(spark, rootB, minRatio = 0.1): Unit
    IvfIndex.compact(spark, rootS, minRatio = 0.1): Unit
    assert(res(rootS) === preCompact, "compaction changed the probe answer")
    assert(res(rootB) === preCompact)
    assert(live(rootS) === live(rootB))
  }

  test("appendPqResidual == residual re-encode of base + batch at fixed books (lockstep law)") {
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(200, 0L)
    val batch = planted(50, 200L)
    val all = base.unionByName(batch)
    val root = Scratch.dir("spec_ivfadc_append")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, root)
    IvfIndex.append(spark, batch, root)
    IvfIndex.appendPqResidual(spark, batch, m, dsub, root)
    val got = IvfIndex.codes(spark, root).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    // reference: residuals of base ∪ batch against the PERSISTED cells,
    // encoded against the PERSISTED books
    val cents = IvfIndex.centroids(spark, root)
    val asg = graft.ml.KMeans.assign(all, cents)
      .select(col("vec_id"), col("v"), col("cl"))
    val res = asg.join(broadcast(cents.select(col("cl"), col("cv"))), "cl")
      .select(col("vec_id"), expr("zip_with(v, cv, (a, b) -> a - b)").as("v"), col("cl"))
    val ss = graft.queries.EmbedQueries.pqSubSlices(res, "vec_id", m, dsub)
      .select(col("vec_id"), col("sub"), col("svec").as("v"))
    val want = graft.ml.KMeans.assignGrouped(ss, IvfIndex.codebooks(spark, root),
        idCol = "vec_id", grpCol = "sub")
      .select(col("vec_id"), col("sub"), col("cl").as("code"))
      .join(res.select(col("vec_id"), col("cl")), "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
    assert(got.size === 250 * m)
  }

  test("residual codes compact in lockstep and the residual ADC probe never resurrects deletes") {
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivfadc_compact")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, root)
    val doomed = base.where(col("vec_id") % 5 === 0).select(col("vec_id"), col("v"))
    IvfIndex.delete(spark, doomed, root)
    val compacted = IvfIndex.compact(spark, root, minRatio = 0.1)
    assert(compacted.nonEmpty)
    assert(IvfIndex.tombstones(spark, root).count() === 0L)
    val deadInCodes = IvfIndex.codes(spark, root)
      .where(col("vec_id") % 5 === 0).count()
    assert(deadInCodes === 0L, s"$deadInCodes dead residual code rows survived compaction")
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val probed = IvfIndex.probePqResidual(spark, q, root, m, dsub, nprobe = 2, topk = 3,
      cand = _.where(col("vec_id") >= 5)).collect().map(_.getLong(1))
    assert(probed.forall(_ % 5 != 0), "a deleted vector resurfaced in the residual ADC probe")
    // the refine stage fetches raw vectors through liveAssignments, so
    // the same law must hold one stage later: no deleted id may survive
    // the shortlist's exact re-rank either
    val refined = IvfIndex.probeRefine(spark, q, root, m, dsub, nprobe = 2,
      shortlist = 10, topk = 3, cand = _.where(col("vec_id") >= 5))
      .collect().map(_.getLong(1))
    assert(refined.forall(_ % 5 != 0), "a deleted vector resurfaced in the refine re-rank")
  }

  test("attribute columns survive the lifecycle; a fully-retired attr index still answers filtered probes") {
    import spark.implicits._
    val base = planted(100, 0L)
      .withColumn("label", (col("vec_id") % 3).cast("int"))
    val root = Scratch.dir("spec_ivf_attr")
    IvfIndex.build(base, k = 4, iters = 2, root)
    // the attr rides build → read-back → compaction rewrite
    assert(IvfIndex.assignments(spark, root).columns.contains("label"))
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 2 === 0).select(col("vec_id")), root)
    assert(IvfIndex.compact(spark, root, minRatio = 0.1).nonEmpty)
    val af = IvfIndex.liveAssignments(spark, root)
      .where(col("label") === 1).select(col("vec_id")).collect().map(_.getLong(0))
    assert(af.nonEmpty && af.forall(i => i % 3 == 1 && i % 2 != 0),
      "attr filter wrong after the compaction rewrite")
    // full retraction: EVERY file retired — the CLEAN-empty read-back
    // must still carry the attr column (schema sidecar; r14 review), so
    // a filtered probe returns zero rows instead of throwing on an
    // unresolved column
    IvfIndex.delete(spark, base.select(col("vec_id")), root)
    assert(IvfIndex.compact(spark, root, minRatio = 0.1).nonEmpty)
    val empty = IvfIndex.assignments(spark, root)
    assert(empty.columns.contains("label"),
      "empty read-back dropped the attribute column")
    assert(empty.count() === 0L)
    val q = base.where(col("vec_id") < 2).select(col("vec_id").as("qid"), col("v").as("qv"))
    val probed = IvfIndex.probe(spark, q, root, nprobe = 2, topk = 3,
      cand = _.where(col("label") === 1))
    assert(probed.count() === 0L, "filtered probe of the empty index must return no rows")
  }

  test("an attr-mismatched append is REJECTED (mixed parquet schemas are never merged at read)") {
    val base = planted(60, 0L)
      .withColumn("label", (col("vec_id") % 3).cast("int"))
    val root = Scratch.dir("spec_ivf_attr_contract")
    IvfIndex.build(base, k = 2, iters = 2, root)
    val bare = planted(10, 100L) // no label column
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, bare, root)
    }
    assert(e.getMessage.contains("attribute columns"),
      s"wrong rejection message: ${e.getMessage}")
    // matched appends still work
    IvfIndex.append(spark,
      planted(10, 100L).withColumn("label", (col("vec_id") % 3).cast("int")), root)
    assert(IvfIndex.assignments(spark, root).count() === 70L)
    // reserved attr names fail fast with a readable error
    val e2 = intercept[IllegalArgumentException] {
      IvfIndex.buildPq(spark,
        planted(60, 0L).withColumn("code", lit(1)), 2, 4, 4, iters = 2,
        Scratch.dir("spec_ivf_attr_reserved"))
    }
    assert(e2.getMessage.contains("reserved"),
      s"wrong reserved-name message: ${e2.getMessage}")
    // ... including the assignment half's own cl/d2 (r14 advice) and
    // the sq8 refine half's q/qs (r15 advice): a user attr named cl
    // would be silently conflated with the cell id, and one named q/qs
    // would be silently replaced by sq8Of's own columns and then die
    // in an opaque duplicate-column write
    for (name <- Seq("cl", "d2", "q", "qs")) {
      val e3 = intercept[IllegalArgumentException] {
        IvfIndex.build(planted(20, 0L).withColumn(name, lit(1)), k = 2,
          iters = 1, Scratch.dir(s"spec_ivf_attr_reserved_$name"))
      }
      assert(e3.getMessage.contains("reserved"),
        s"$name not rejected: ${e3.getMessage}")
      val e4 = intercept[IllegalArgumentException] {
        IvfIndex.append(spark, planted(5, 100L).withColumn(name, lit(1)), root)
      }
      assert(e4.getMessage.contains("reserved"),
        s"$name append not rejected: ${e4.getMessage}")
    }
  }

  test("a same-NAME different-TYPE attr append is REJECTED (sidecar compares types, not name sets)") {
    // r14 advice (medium): label INT at build, label STRING in the
    // batch passed the old fieldNames-set check and wrote mixed
    // physical parquet schemas into one half — with mergeSchema off,
    // later reads throw or silently misread the appended rows
    val base = planted(60, 0L)
      .withColumn("label", (col("vec_id") % 3).cast("int"))
    val root = Scratch.dir("spec_ivf_attr_types")
    IvfIndex.build(base, k = 2, iters = 2, root)
    val retyped = planted(10, 100L)
      .withColumn("label", (col("vec_id") % 3).cast("string"))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, retyped, root)
    }
    assert(e.getMessage.contains("names AND types"),
      s"wrong rejection message: ${e.getMessage}")
    // the codes half enforces the same law
    IvfIndex.buildPq(spark, base, 2, 4, 4, iters = 2, root)
    val e2 = intercept[IllegalArgumentException] {
      IvfIndex.appendPq(spark, retyped, 2, 4, root)
    }
    assert(e2.getMessage.contains("names AND types"),
      s"codes half accepted a retyped attr: ${e2.getMessage}")
    // nullability does NOT reject: same names/types, different nulls
    IvfIndex.append(spark, planted(10, 100L).withColumn("label",
      when(col("vec_id") % 7 === 0, lit(null)).otherwise(col("vec_id") % 3)
        .cast("int")), root)
    assert(IvfIndex.assignments(spark, root).count() === 70L)
  }

  test("pre-sidecar roots ADOPT the read-back schema on first append (legacy contract, r14 advice)") {
    val base = planted(60, 0L)
      .withColumn("label", (col("vec_id") % 3).cast("int"))
    val root = Scratch.dir("spec_ivf_attr_legacy")
    IvfIndex.build(base, k = 2, iters = 2, root)
    // simulate a root built before the sidecar existed
    val (fs, sp) = (new org.apache.hadoop.fs.Path(s"$root/assignments.schema")
      .getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(s"$root/assignments.schema"))
    fs.delete(sp, false)
    // first append to the sidecar-less root: an attr-less batch must be
    // rejected against the ADOPTED read-back schema, not silently write
    // a second physical schema into the half
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, planted(10, 100L), root)
    }
    assert(e.getMessage.contains("names AND types"),
      s"legacy root accepted a mismatched first append: ${e.getMessage}")
    // the rejection itself lazily wrote the sidecar
    assert(fs.exists(sp), "sidecar not adopted from the read-back schema")
    // and a matching append now passes both the adopted and future checks
    IvfIndex.append(spark,
      planted(10, 100L).withColumn("label", (col("vec_id") % 3).cast("int")), root)
    assert(IvfIndex.assignments(spark, root).count() === 70L)
  }

  test("attrs ride the CODES half: filtered ADC probe and refine respect the predicate across compaction") {
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(100, 0L)
      .withColumn("label", (col("vec_id") % 3).cast("int"))
    val root = Scratch.dir("spec_ivfadc_attr")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, root)
    assert(IvfIndex.codes(spark, root).columns.contains("label"),
      "codes half did not carry the attribute")
    def labelsOf(ids: Seq[Long]) = ids.map(i => i % 3)
    val q = base.where(col("vec_id") < 3).select(col("vec_id").as("qid"), col("v").as("qv"))
    def adcIds = IvfIndex.probePqResidual(spark, q, root, m, dsub, nprobe = 4,
        topk = 5, cand = _.where(col("vec_id") >= 3 && col("label") === 1))
      .collect().map(_.getLong(1)).toSeq
    assert(adcIds.nonEmpty && labelsOf(adcIds).forall(_ == 1),
      "filtered ADC probe returned an out-of-slice candidate")
    def refIds = IvfIndex.probeRefine(spark, q, root, m, dsub, nprobe = 4,
        shortlist = 20, topk = 5,
        cand = _.where(col("vec_id") >= 3 && col("label") === 1))
      .collect().map(_.getLong(1)).toSeq
    assert(refIds.nonEmpty && labelsOf(refIds).forall(_ == 1),
      "filtered refine returned an out-of-slice candidate")
    // attrs survive the lockstep codes rewrite
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 5 === 0).select(col("vec_id")), root)
    assert(IvfIndex.compact(spark, root, minRatio = 0.1).nonEmpty)
    assert(IvfIndex.codes(spark, root).columns.contains("label"),
      "codes attribute lost in the compaction rewrite")
    val after = adcIds
    assert(after.nonEmpty && labelsOf(after).forall(_ == 1) &&
      after.forall(_ % 5 != 0),
      "post-compaction filtered probe wrong (slice or resurrection)")
  }

  test("alloc=false rebuild retires a stale perm from a prior alloc build") {
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(100, 0L)
    val root = Scratch.dir("spec_ivf_stale_perm")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, root, alloc = true)
    assert(new java.io.File(s"$root/perm").isDirectory)
    // codebook retrain WITHOUT the allocation: the perm must die with
    // it, or probes would permute query residuals against unpermuted
    // codes — silent recall garbage (r14 review)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, root)
    assert(!new java.io.File(s"$root/perm").exists(),
      "stale perm survived an alloc=false rebuild")
    // and the plain rebuild answers like a plain build
    val q = base.where(col("vec_id") < 3).select(col("vec_id").as("qid"), col("v").as("qv"))
    val rootP = Scratch.dir("spec_ivf_stale_perm_plain")
    IvfIndex.build(base, k = 4, iters = 2, rootP)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, rootP)
    def res(r: String) = IvfIndex.probePqResidual(spark, q, r, m, dsub,
        nprobe = 2, topk = 3, cand = _.where(col("vec_id") >= 3)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    assert(res(root) === res(rootP))
  }

  test("alloc-built residual IVFADC: perm persisted; appendPqResidual == re-encode at fixed books AND perm") {
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(200, 0L)
    val batch = planted(50, 200L)
    val all = base.unionByName(batch)
    val root = Scratch.dir("spec_ivfadc_alloc")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, root, alloc = true)
    // the permutation is persisted beside the codebooks and is a real
    // permutation of the residual coordinates
    val srcOf = spark.read.parquet(s"$root/perm").orderBy(col("pos"))
      .collect().map(_.getLong(1).toInt)
    assert(srcOf.length === dim)
    assert(srcOf.sorted.toSeq === (0 until dim))
    IvfIndex.append(spark, batch, root)
    IvfIndex.appendPqResidual(spark, batch, m, dsub, root)
    val got = IvfIndex.codes(spark, root).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    // reference: residuals of base ∪ batch against the PERSISTED cells,
    // PERMUTED by the persisted perm, encoded against the PERSISTED books
    val cents = IvfIndex.centroids(spark, root)
    val asg = graft.ml.KMeans.assign(all, cents)
      .select(col("vec_id"), col("v"), col("cl"))
    val res = asg.join(broadcast(cents.select(col("cl"), col("cv"))), "cl")
      .select(col("vec_id"), expr("zip_with(v, cv, (a, b) -> a - b)").as("v"), col("cl"))
      .withColumn("v", array(srcOf.toIndexedSeq.map(i => col("v")(i)): _*))
    val ss = graft.queries.EmbedQueries.pqSubSlices(res, "vec_id", m, dsub)
      .select(col("vec_id"), col("sub"), col("svec").as("v"))
    val want = graft.ml.KMeans.assignGrouped(ss, IvfIndex.codebooks(spark, root),
        idCol = "vec_id", grpCol = "sub")
      .select(col("vec_id"), col("sub"), col("cl").as("code"))
      .join(res.select(col("vec_id"), col("cl")), "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
    assert(got.size === 250 * m)
  }

  test("alloc probe == plain probe of a twin index built on pre-permuted vectors (perm-equivalence law)") {
    // coarse L2 distances are permutation-invariant, so an index built
    // WITH the allocation over raw vectors must answer probes exactly
    // like a PLAIN residual index built over pre-permuted vectors
    // queried with pre-permuted queries — centroids, residuals, seeds,
    // codebooks and ADC tables all commute with the coordinate
    // reorder. This pins that the perm is applied consistently on the
    // build, append, and probe sides (a one-sided slip would break the
    // equality, not just degrade recall).
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(200, 0L)
    val rootA = Scratch.dir("spec_ivfadc_alloc_eq_a")
    IvfIndex.build(base, k = 4, iters = 2, rootA)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, rootA, alloc = true)
    val srcOf = spark.read.parquet(s"$rootA/perm").orderBy(col("pos"))
      .collect().map(_.getLong(1).toInt)
    def perm(df: org.apache.spark.sql.DataFrame, vc: String) =
      df.withColumn(vc, array(srcOf.toIndexedSeq.map(i => col(vc)(i)): _*))
    val rootB = Scratch.dir("spec_ivfadc_alloc_eq_b")
    IvfIndex.build(perm(base, "v"), k = 4, iters = 2, rootB)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, rootB)
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val gotA = IvfIndex.probePqResidual(spark, q, rootA, m, dsub, nprobe = 2, topk = 3,
        cand = _.where(col("vec_id") >= 5)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val gotB = IvfIndex.probePqResidual(spark, perm(q, "qv"), rootB, m, dsub,
        nprobe = 2, topk = 3, cand = _.where(col("vec_id") >= 5)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(gotA === gotB)
    assert(gotA.nonEmpty)
  }

  test("alloc residual codes compact in lockstep; probe and refine never resurrect deletes") {
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivfadc_alloc_compact")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPqResidual(spark, m, dsub, codes, iters = 2, root, alloc = true)
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 5 === 0).select(col("vec_id"), col("v")), root)
    assert(IvfIndex.compact(spark, root, minRatio = 0.1).nonEmpty)
    assert(IvfIndex.tombstones(spark, root).count() === 0L)
    assert(IvfIndex.codes(spark, root).where(col("vec_id") % 5 === 0).count() === 0L)
    // the perm survives compaction (it is a static artifact, never rewritten)
    assert(new java.io.File(s"$root/perm").isDirectory)
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val probed = IvfIndex.probePqResidual(spark, q, root, m, dsub, nprobe = 2, topk = 3,
      cand = _.where(col("vec_id") >= 5)).collect().map(_.getLong(1))
    assert(probed.forall(_ % 5 != 0))
    // refine stays exact at full budget on the alloc'd artifact too
    val got = IvfIndex.probeRefine(spark, q, root, m, dsub, nprobe = 4,
        shortlist = 1000, topk = 3, cand = _.where(col("vec_id") >= 5))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    val d = round(greatest(
      graft.ops.Similarity.dot("qv", "qv") + graft.ops.Similarity.dot("nv", "nv") -
        lit(2) * graft.ops.Similarity.dot("qv", "nv"), lit(0.0)), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
    val want = base.where(col("vec_id") >= 5 && col("vec_id") % 5 =!= 0)
      .select(col("vec_id").as("nid"), col("v").as("nv"))
      .crossJoin(q).withColumn("dist", d)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 3)
      .collect().map(x => (x.getLong(x.fieldIndex("qid")), x.getLong(x.fieldIndex("nid")),
        x.getDouble(x.fieldIndex("dist")), x.getLong(x.fieldIndex("rnk")))).toSet
    assert(got === want)
  }

  test("manifest consolidation: repeated lifecycles keep ONE manifest; carried adds keep serving") {
    // snapshot expiry (the append-only fold would otherwise grow one
    // m-/clean- pair per generation for the life of the artifact): a
    // compaction starting from a CLEAN state writes a manifest that
    // CARRIES the prior live adds, drops the dead rm lines, and gc
    // retires the prior m- files — so the directory holds exactly one
    // manifest in steady state, and a mid-compaction reader of a later
    // generation still serves every older gen's compact-named survivor
    // file through the carried adds
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivf_consolidate")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPqResidual(spark, m = 2, dsub = 4, codes = 4, iters = 2, root)
    def manifests = {
      val d = new java.io.File(s"$root/manifest")
      if (!d.isDirectory) Seq.empty[String]
      else d.listFiles().map(_.getName).filter(_.startsWith("m-")).toSeq.sorted
    }
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 5 === 0).select(col("vec_id"), col("v")), root)
    assert(IvfIndex.compact(spark, root, minRatio = 0.05).nonEmpty)
    assert(manifests === Seq("m-00000001"))
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 7 === 0).select(col("vec_id"), col("v")), root)
    assert(IvfIndex.compact(spark, root, minRatio = 0.05).nonEmpty)
    assert(manifests === Seq("m-00000002"), "gen 2 must consolidate gen 1's manifest away")
    // third generation, probed MID-WINDOW (prepare+publish, no gc yet):
    // the fold is built from the consolidated manifest alone, so the
    // carried adds are what keeps gen-1/2 compact files serving
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 11 === 0).select(col("vec_id"), col("v")), root)
    val (cells, steps) = IvfIndex.compactPlan(spark, root, minRatio = 0.05)
    assert(cells.nonEmpty)
    steps(0).apply(); steps(1).apply()
    val want = (0L until 200L)
      .filter(i => i % 5 != 0 && i % 7 != 0 && i % 11 != 0).toSet
    def liveIds = IvfIndex.liveAssignments(spark, root).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(liveIds === want, "mid-window fold lost a carried survivor file")
    steps(2).apply()
    assert(manifests === Seq("m-00000003"))
    assert(liveIds === want)
  }

  test("a compaction crashed mid-prepare cannot have its generation reused: strays reconcile, never serve") {
    // the gen watermark counts INTENT files too: a prepare that crashed
    // after moving compact-<g>-* strays (intent written, no manifest)
    // must not collide with the next compaction's generation — a reused
    // number would overwrite the intent (the only record of the strays)
    // and a later CLEAN marker would falsely certify directory ≡ view,
    // serving the strays' rows on the fast path
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivf_crashed_prepare")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 5 === 0).select(col("vec_id"), col("v")), root)
    // crash: prepare runs (strays moved, intent recorded), publish never does
    val (cells1, steps1) = IvfIndex.compactPlan(spark, root, minRatio = 0.05)
    assert(cells1.nonEmpty)
    steps1(0).apply()
    // the next full compaction must pick a FRESH generation, reconcile
    // the crashed one's strays in gc, and end CLEAN and correct
    assert(IvfIndex.compact(spark, root, minRatio = 0.05).nonEmpty)
    val live = IvfIndex.liveAssignments(spark, root)
      .select(col("vec_id")).collect().map(_.getLong(0))
    val want = (0L until 200L).filterNot(_ % 5 == 0)
    assert(live.sorted.toSeq == want, "crashed-prepare strays leaked into the serving set")
    assert(live.length == live.distinct.length, "duplicate rows after stray reconciliation")
    val mdir = new java.io.File(s"$root/manifest")
    val names = mdir.listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("intent-")),
      s"gc left an unreconciled intent: ${names.mkString(",")}")
  }

  test("a compaction that retires EVERY file still reads back as the empty index, not an error") {
    // all cells fully dead: gc deletes every assignments parquet; the
    // CLEAN fast path must answer with the empty frame (the same
    // logical state the filtered branch already handles), not a
    // schema-inference failure on the gutted directory
    val base = planted(40, 0L)
    val root = Scratch.dir("spec_ivf_all_dead")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.delete(spark, base.select(col("vec_id"), col("v")), root)
    assert(IvfIndex.compact(spark, root, minRatio = 0.1).nonEmpty)
    assert(IvfIndex.assignments(spark, root).count() === 0L)
    assert(IvfIndex.liveAssignments(spark, root).count() === 0L)
    assert(IvfIndex.tombstones(spark, root).count() === 0L)
  }

  test("refine degenerates to exact search at full probe budget and corpus-wide shortlist") {
    // the two-stage contract: probeRefine's ONLY approximation is the
    // shortlist cut. With nprobe = k (every cell probed) and a
    // shortlist wider than the corpus, the exact squared-L2 re-rank
    // must reproduce brute-force search — computed here independently
    // with a crossJoin, the same round-6 distance, and the same
    // (dist, nid) tie order
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivf_refine_exact")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPqResidual(spark, m = 2, dsub = 4, codes = 4, iters = 2, root)
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val got = IvfIndex.probeRefine(spark, q, root, m = 2, dsub = 4, nprobe = 4,
        shortlist = 1000, topk = 3, cand = _.where(col("vec_id") >= 5))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    val d = round(greatest(
      graft.ops.Similarity.dot("qv", "qv") + graft.ops.Similarity.dot("nv", "nv") -
        lit(2) * graft.ops.Similarity.dot("qv", "nv"), lit(0.0)), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
    val want = base.where(col("vec_id") >= 5)
      .select(col("vec_id").as("nid"), col("v").as("nv"))
      .crossJoin(q).withColumn("dist", d)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 3)
      .collect().map(x => (x.getLong(x.fieldIndex("qid")), x.getLong(x.fieldIndex("nid")),
        x.getDouble(x.fieldIndex("dist")), x.getLong(x.fieldIndex("rnk")))).toSet
    assert(got === want)
  }

  test("compaction is manifest-atomic: probes between ANY two steps see the survivor set") {
    // the r12 verdict's crash-window law: compactPlan exposes the three
    // mutation steps (prepare / publish / gc); the probe answer — both
    // the exact-vector probe and the ADC probe over the codes half —
    // must be the SURVIVOR set at every boundary: before the manifest
    // rename the old files serve with tombstones masking, after it the
    // compacted files serve with tombstones drained, and GC only
    // deletes what the manifest already retired
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivf_atomic")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPq(spark, base, m, dsub, codes, iters = 2, root)
    val doomed = base.where(col("vec_id") % 5 === 0).select(col("vec_id"), col("v"))
    IvfIndex.delete(spark, doomed, root)
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    def probeRows = IvfIndex.probe(spark, q, root, nprobe = 2, topk = 3,
        cand = _.where(col("vec_id") >= 5)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    def adcRows = IvfIndex.probePq(spark, q, root, m, dsub, nprobe = 2, topk = 3,
        cand = _.where(col("vec_id") >= 5)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    val preProbe = probeRows
    val preAdc = adcRows
    val (cells, steps) = IvfIndex.compactPlan(spark, root, minRatio = 0.1)
    assert(cells.nonEmpty && steps.size === 3)
    steps(0).apply() // PREPARE: aside writes + invisible compact-gen moves
    assert(probeRows === preProbe, "prepare changed the probe answer")
    assert(adcRows === preAdc, "prepare changed the ADC answer")
    assert(IvfIndex.tombstones(spark, root).count() > 0,
      "tombstones drained before the commit point")
    steps(1).apply() // PUBLISH: the one atomic manifest rename
    assert(probeRows === preProbe, "commit changed the probe answer")
    assert(adcRows === preAdc, "commit changed the ADC answer")
    assert(IvfIndex.tombstones(spark, root).count() === 0L,
      "commit did not drain the applied tombstones")
    assert(IvfIndex.codes(spark, root).where(col("vec_id") % 5 === 0).count() === 0L,
      "dead code rows still serving after the commit")
    steps(2).apply() // GC of manifest-retired files only
    assert(probeRows === preProbe, "gc changed the probe answer")
    assert(adcRows === preAdc, "gc changed the ADC answer")
  }

  test("repair after a crashed gc: readers return to the plain fast path with the exact survivor set") {
    // r13 verdict §1: a compaction that crashed after PUBLISH leaves
    // readers on the list-and-filter path until some LATER compaction's
    // gc reconciles — if no cell ever again crosses minRatio, forever.
    // repair is the gc-only recovery: reconcile intents, delete folded
    // rms, certify CLEAN — no new compaction required
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivf_repair")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 5 === 0).select(col("vec_id"), col("v")), root)
    val (cells, steps) = IvfIndex.compactPlan(spark, root, minRatio = 0.05)
    assert(cells.nonEmpty)
    steps(0).apply(); steps(1).apply() // crash before gc
    val mdir = new java.io.File(s"$root/manifest")
    assert(!mdir.listFiles().map(_.getName).exists(_.startsWith("clean-")))
    IvfIndex.repair(spark, root)
    val names = mdir.listFiles().map(_.getName)
    assert(names.exists(_.startsWith("clean-")), "repair did not certify CLEAN")
    assert(!names.exists(_.startsWith("intent-")), "repair left an intent")
    // directory ≡ view: every retired file physically gone (the CLEAN
    // contract a plain reader relies on) — no old default-named file
    // may remain in a compacted cell next to its compact-gen rewrite
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    for (c <- cells) {
      val d = new java.io.File(s"$root/assignments/cl=$c")
      assert(!walk(d).exists(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("compact-")),
        s"repair left a retired default-named file in compacted cell $c")
    }
    val want = (0L until 200L).filterNot(_ % 5 == 0).toSet
    val live = IvfIndex.liveAssignments(spark, root)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(live === want)
    assert(IvfIndex.tombstones(spark, root).count() === 0L)
    // idempotent
    IvfIndex.repair(spark, root)
    assert(IvfIndex.liveAssignments(spark, root).count() === want.size.toLong)
  }

  test("repair after a crash mid-prepare with nothing ever committed reverts to the never-compacted state") {
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivf_repair_prep")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 5 === 0).select(col("vec_id"), col("v")), root)
    val (cells, steps) = IvfIndex.compactPlan(spark, root, minRatio = 0.05)
    assert(cells.nonEmpty)
    steps(0).apply() // crash before publish: strays moved, intent written
    IvfIndex.repair(spark, root)
    assert(!new java.io.File(s"$root/manifest").exists(),
      "repair must remove the engaged-but-never-committed manifest dir")
    // pre-compaction state serves exactly: all rows present, tombstones mask
    val live = IvfIndex.liveAssignments(spark, root)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(live === (0L until 200L).filterNot(_ % 5 == 0).toSet)
    assert(IvfIndex.tombstones(spark, root).count() > 0L,
      "mid-prepare crash must not drain tombstones")
    // and the index is fully functional: the next compaction completes
    assert(IvfIndex.compact(spark, root, minRatio = 0.05).nonEmpty)
    assert(IvfIndex.tombstones(spark, root).count() === 0L)
  }

  test("append and delete interleaved inside a compaction window stay correct at every boundary") {
    // r13 verdict §2: the single-writer contract covers COMPACTIONS;
    // append/delete during a compaction window is now a proven
    // interleaving, not an assumption. Both write only default-named
    // NEW files — never in the generation's planned rm set, so the
    // manifest commit cannot retire them and gc cannot delete them
    val base = planted(200, 0L)
    val batch = planted(50, 200L)
    val root = Scratch.dir("spec_ivf_interleave")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 5 === 0).select(col("vec_id")), root)
    val (cells, steps) = IvfIndex.compactPlan(spark, root, minRatio = 0.1)
    assert(cells.nonEmpty)
    steps(0).apply() // PREPARE done; now a writer appends AND deletes mid-window
    IvfIndex.append(spark, batch, root)
    IvfIndex.delete(spark,
      base.where(col("vec_id") % 7 === 0).select(col("vec_id")), root)
    def live = IvfIndex.liveAssignments(spark, root)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    // the mid-window delete targets BASE ids only; every batch id serves
    val want = ((0L until 200L).filter(i => i % 5 != 0 && i % 7 != 0) ++
      (200L until 250L)).toSet
    assert(live === want, "mid-window serving set wrong after interleaved append+delete")
    steps(1).apply() // PUBLISH
    assert(live === want, "publish retired a mid-window file")
    // the mid-window tombstones must NOT have been drained by the commit
    assert(IvfIndex.tombstones(spark, root).count() > 0L)
    steps(2).apply() // GC
    assert(live === want, "gc deleted a mid-window file")
    // a follow-up compaction drains the mid-window tombstones and the
    // final state equals a rebuild on the surviving set
    IvfIndex.compact(spark, root, minRatio = 0.0): Unit
    assert(live === want)
    assert(IvfIndex.tombstones(spark, root).count() === 0L)
    val got = IvfIndex.liveAssignments(spark, root)
      .select(col("vec_id"), col("cl")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = base.unionByName(batch)
    val wantAsg = graft.ml.KMeans.assign(
        all.join(spark.createDataFrame(want.toSeq.map(Tuple1(_))).toDF("vec_id"), "vec_id"),
        IvfIndex.centroids(spark, root))
      .select(col("vec_id"), col("cl")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === wantAsg)
  }

  test("scoped compaction (onlyCells) drains ONLY the targeted cells' tombstones") {
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivf_scoped")
    IvfIndex.build(base, k = 4, iters = 2, root)
    val asg = IvfIndex.assignments(spark, root)
    val cellOf = asg.select(col("vec_id"), col("cl")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cellsAll = cellOf.values.toSeq.distinct.sorted
    assert(cellsAll.size >= 2, "fixture needs at least two non-empty cells")
    val target = cellsAll.head
    // tombstone one id in EVERY cell
    val doomedIds = cellsAll.map(c => cellOf.collectFirst {
      case (id, cl) if cl == c => id }.get)
    IvfIndex.delete(spark,
      spark.createDataFrame(doomedIds.map(Tuple1(_))).toDF("vec_id"), root)
    val compacted = IvfIndex.compact(spark, root, minRatio = 0.0,
      onlyCells = Seq(target))
    assert(compacted === Seq(target))
    // the target cell's tombstone drained; the other cells' still pending
    val pending = IvfIndex.tombstones(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(pending === doomedIds.filter(id => cellOf(id) != target).toSet)
    // serving set: every doomed id still masked (pending tombstones mask)
    val live = IvfIndex.liveAssignments(spark, root)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(live === (0L until 200L).toSet -- doomedIds)
  }

  test("fitGrouped == independent per-group Lloyd fits (codebook training law)") {
    val v = planted(120, 0L)
    // two groups: the front and back half of each vector
    val ss = v.select(col("vec_id"), explode(expr(
        "array(struct(0L AS grp, slice(v, 1, 4) AS v), struct(1L AS grp, slice(v, 5, 4) AS v))"))
        .as("s"))
      .select(col("vec_id"), col("s.grp").as("grp"), col("s.v").as("v"))
    val seeds = ss.where(col("vec_id") < 3)
      .select(col("grp"), col("vec_id").as("cl"), col("v").as("cv"))
    val (ga, gc) = graft.ml.KMeans.fitGrouped(ss, seeds, iters = 3)
    for (g <- Seq(0L, 1L)) {
      val vg = ss.where(col("grp") === g).select(col("vec_id"), col("v"))
      val (ia, ic) = graft.ml.KMeans.fit(vg,
        seeds.where(col("grp") === g).select(col("cl"), col("cv")), iters = 3)
      val gotC = gc.where(col("grp") === g).select(col("cl"), col("cv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
      val wantC = ic.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
      assert(gotC === wantC, s"group $g centroids diverge")
      val gotA = ga.where(col("grp") === g).select(col("vec_id"), col("cl")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val wantA = ia.select(col("vec_id"), col("cl")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotA === wantA, s"group $g assignments diverge")
    }
  }

  test("IVFADC roundtrip: persisted probePq == in-memory ADC mirror") {
    val (m, dsub, codes) = (2, 4, 4)
    val base = planted(200, 0L)
    val root = Scratch.dir("spec_ivfpq")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.buildPq(spark, base, m, dsub, codes, iters = 2, root)
    val q = base.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val got = IvfIndex.probePq(spark, q, root, m, dsub, nprobe = 2, topk = 3,
        cand = _.where(col("vec_id") >= 5)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    // in-memory mirror: the same fits without ever touching disk
    import graft.ops.Similarity
    val (assigned, cents) = graft.ml.KMeans.fit(base,
      graft.ml.KMeans.seedSmallest(base, 4), iters = 2)
    val ss = graft.queries.EmbedQueries.pqSubSlices(base, "vec_id", m, dsub)
      .select(col("vec_id"), col("sub"), col("svec").as("v"))
    val seeds = ss.join(broadcast(graft.ml.KMeans.seedSmallest(base, codes.toLong)
        .select(col("cl").as("__sid"))), col("vec_id") === col("__sid"))
      .select(col("sub"), col("vec_id").as("cl"), col("v").as("cv"))
    val (penc, cb) = graft.ml.KMeans.fitGrouped(ss, seeds, iters = 2,
      idCol = "vec_id", grpCol = "sub")
    val cw = broadcast(cents.select(col("cl"), col("cv"),
      Similarity.dot("cv", "cv").as("c2")))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("__d"), col("cl"))
    val probed = q.crossJoin(cw)
      .withColumn("__d", round(sqrt(greatest(
        Similarity.dot("qv", "qv") + col("c2")
          - lit(2.0) * Similarity.dot("qv", "cv"), lit(0.0))), 6))
      .withColumn("cr", row_number().over(wc)).where(col("cr") <= 2)
      .select(col("qid"), col("qv"), col("cl").as("cell"))
    val cbb = broadcast(cb.select(col("sub"), col("cl").as("code"), col("cv").as("cvec")))
    val adc = graft.queries.EmbedQueries.pqSubSlices(
        q.select(col("qid").as("vec_id"), col("qv").as("v")), "qid", m, dsub)
      .join(cbb, "sub")
      .select(col("qid"), col("sub"), col("code"),
        round(greatest(Similarity.dot("svec", "svec") + Similarity.dot("cvec", "cvec")
          - lit(2) * Similarity.dot("svec", "cvec"), lit(0.0)), 6)
          .cast("decimal(18,6)").as("qd"))
    val cand = penc.where(col("vec_id") >= 5)
      .select(col("vec_id").as("nid"), col("sub"), col("cl").as("code"))
      .join(assigned.select(col("vec_id").as("nid"), col("cl")), "nid")
    val want = cand.join(broadcast(probed.select(col("qid"), col("cell"))),
        col("cl") === col("cell"))
      .join(broadcast(adc), Seq("qid", "sub", "code"))
      .groupBy(col("qid"), col("nid")).agg(sum(col("qd")).as("sd"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("sd"), col("nid"))).cast("long"))
      .where(col("rnk") <= 3)
      .select(col("qid"), col("nid"), col("sd").cast("double").as("adist"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === want)
  }
}
