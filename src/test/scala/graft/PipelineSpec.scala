package graft

import graft.pipeline.{Pipeline, PipelineConfig}
import graft.core.Ingest

/** End-to-end pipeline on generated bicis-shaped raw CSVs: ingest →
  * temporal split → profile → A5 targets → W1 features → GLM → MSE,
  * with checkpoint-skip semantics (SURVEY.md §5.2.7).
  */
class PipelineSpec extends SparkSpec {

  /** ~600 trips over 300 days, 3 stations, v4 dialect (derived returns). */
  private def genCsv(dir: String): String = {
    val rnd = new scala.util.Random(5)
    val stations = Seq("RETIRO", "PACIFICO", "ADUANA")
    val sb = new StringBuilder("FECHA_HORA_RETIRO;TIEMPO_USO;NOMBRE_ORIGEN;NOMBRE_DESTINO\n")
    val cal = java.time.LocalDateTime.of(2016, 1, 1, 0, 0)
    (0 until 600).foreach { i =>
      val t = cal.plusHours(rnd.nextInt(300 * 24)).plusMinutes(rnd.nextInt(60))
      val fmt = java.time.format.DateTimeFormatter.ofPattern("dd/MM/yyyy HH:mm")
      sb.append(s"${t.format(fmt)};${5 + rnd.nextInt(55)};${stations(rnd.nextInt(3))};${stations(rnd.nextInt(3))}\n")
    }
    val p = s"$dir/recorridos-realizados-2016.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), sb.toString)
    p
  }

  test("full pipeline runs, splits add up, model predicts, checkpoints skip") {
    val dir = java.nio.file.Files.createTempDirectory("pipe").toString
    val csv = genCsv(dir)
    val out = s"$dir/out"
    val r1 = Pipeline.run(spark, Seq(csv), out)
    assert(r1.unifiedCount === 600L)
    assert(r1.trainCount + r1.valCount + r1.testCount === r1.unifiedCount)
    assert(r1.trainCount > 0 && r1.valCount > 0 && r1.testCount > 0)
    assert(r1.datasetCount > 0 && r1.predictionCount === r1.datasetCount)
    assert(!r1.mse.isNaN && r1.mse >= 0.0)
    // 2×ring features: rents AND returns measures per ring position
    // (hour_feature_builder.py:44-45) — 48 columns at the default window
    val dsCols = spark.read.parquet(s"$out/dataset_training").columns
    assert(dsCols.count(_.endsWith("_hb")) === 48, dsCols.mkString(","))
    assert((0 until 24).forall(i =>
      dsCols.contains(s"n_rents_${i}_hb") && dsCols.contains(s"n_returns_${i}_hb")))
    assert(new java.io.File(s"$out/split_bounds.json").exists())
    // M5: every split evaluated with every configured registry metric
    assert(r1.metrics.keySet === Set("training", "validation", "testing"))
    val mjson = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/metrics.json"))
    assert(Seq("training", "validation", "testing", "mse", "rmse", "mae")
      .forall(mjson.contains), mjson)
    r1.metrics.values.foreach { m =>
      assert(math.abs(m("rmse") - math.sqrt(m("mse"))) < 1e-9)
    }
    // S8 fails sidecar per split reconciles dataset vs split counts
    Seq("training", "validation", "testing").foreach { n =>
      val fj = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/fails_$n.json"))
      assert(fj.contains("input_count") && fj.contains("number_of_errors"), fj)
      assert(new java.io.File(s"$out/predictions_$n/_SUCCESS").exists())
    }
    // M3: first run fit + persisted the model as a stage target
    assert(!r1.modelLoaded)
    assert(graft.ml.Models.exists(spark, s"$out/model"))

    // checkpoint skip: stage outputs untouched, model LOADED not refit
    val mtime = new java.io.File(s"$out/unified/_SUCCESS").lastModified()
    val modelMtime = new java.io.File(s"$out/model/metadata/_SUCCESS").lastModified()
    val r2 = Pipeline.run(spark, Seq(csv), out)
    assert(r2.unifiedCount === r1.unifiedCount)
    assert(r2.modelLoaded, "second run must load the persisted model")
    assert(new java.io.File(s"$out/unified/_SUCCESS").lastModified() === mtime)
    assert(new java.io.File(s"$out/model/metadata/_SUCCESS").lastModified() === modelMtime)
    assert(math.abs(r2.mse - r1.mse) < 1e-9)
  }

  test("a second model family runs through the same pipeline unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("pipe2").toString
    val csv = genCsv(dir)
    val r = Pipeline.run(spark, Seq(csv), s"$dir/out",
      PipelineConfig(modelName = "linear", metricNames = Seq("rmse", "mae"),
        csvPredictions = true))
    assert(r.predictionCount === r.datasetCount)
    assert(r.metrics("training").keySet === Set("rmse", "mae"))
    // S5 export parity: header-CSV predictions sidecar per split
    // (poisson_regression.py:43-47), behind the csvPredictions flag
    Seq("training", "validation", "testing").foreach { n =>
      val d = new java.io.File(s"$dir/out/predictions_csv_$n")
      assert(new java.io.File(d, "_SUCCESS").exists(), s"csv sidecar missing for $n")
      val part = d.listFiles().find(_.getName.endsWith(".csv")).get
      val header = scala.io.Source.fromFile(part).getLines().next()
      assert(header.split(",").contains("prediction"), header)
    }
    assert(!r.metrics("validation")("rmse").isNaN)
    assert(r.mse.isNaN) // mse not configured -> NaN, not a thrown key error

    // switching families against the same outDir must REFIT (a stale
    // poisson model must not be fed to the linear loader or vice versa)
    val r2 = Pipeline.run(spark, Seq(csv), s"$dir/out",
      PipelineConfig(modelName = "poisson"))
    assert(!r2.modelLoaded, "family switch must refit, not load stale model")
    assert(graft.ml.Models.savedFamily(spark, s"$dir/out/model").contains("poisson"))
  }

  test("dense-id unify assigns gap-free sequential ids") {
    val dir = java.nio.file.Files.createTempDirectory("dense").toString
    val csv = genCsv(dir)
    val ids = Ingest.unifyDenseIds(spark, Seq(csv))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 600L))
  }
}
