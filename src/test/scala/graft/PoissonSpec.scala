package graft

import graft.ml.Poisson

/** M2-M5 invariants (no SQL oracle exists for model fitting; SURVEY.md
  * §5.2): finite fit, prediction count preservation, save/load roundtrip.
  */
class PoissonSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("dataset shape: one row per labeled event, 2x24 ring features (rents AND returns)") {
    val ds = Poisson.buildDataset(spark, dir)
    // hour_feature_builder.py:44-45 — BOTH measures per ring position
    assert(ds.columns.count(_.endsWith("_hb")) === 48)
    assert((0 until 24).forall(i => ds.columns.contains(s"n_rents_${i}_hb")))
    assert((0 until 24).forall(i => ds.columns.contains(s"n_returns_${i}_hb")))
    assert(ds.count() > 0)
  }

  test("fit + predict: counts preserved, MSE finite, save/load roundtrip") {
    val cfg = Poisson.Config()
    val ds = Poisson.buildDataset(spark, dir, cfg)
    val assembled = Poisson.assemble(ds, ds.columns.filter(_.endsWith("_hb")).toSeq).cache()
    val model = Poisson.fit(assembled, cfg)
    val pred = Poisson.predict(model, assembled)
    assert(pred.count() === assembled.count())
    val err = Poisson.mse(pred)
    assert(!err.isNaN && !err.isInfinite && err >= 0.0)

    val path = java.nio.file.Files.createTempDirectory("glm").toString + "/m"
    model.write.overwrite().save(path)
    val loaded = org.apache.spark.ml.regression.GeneralizedLinearRegressionModel.load(path)
    assert(loaded.coefficients === model.coefficients)
    assert(loaded.intercept === model.intercept)
  }

  test("M5 metric registry: dispatch by name, one-pass evaluate agrees") {
    import graft.ml.Metrics
    val ds = Poisson.buildDataset(spark, dir)
    val assembled = Poisson.assemble(ds, ds.columns.filter(_.endsWith("_hb")).toSeq).cache()
    val pred = Poisson.predict(Poisson.fit(assembled), assembled).cache()
    val one = Metrics.evaluate(pred, Seq("mse", "rmse", "mae"))
    // registry dispatch (the object_loader-by-name analog) matches
    Seq("mse", "rmse", "mae").foreach { n =>
      assert(math.abs(Metrics.registry(n)(pred) - one(n)) < 1e-9, n)
    }
    assert(math.abs(one("rmse") - math.sqrt(one("mse"))) < 1e-9)
    assert(one("mae") >= 0 && one("mse") >= one("mae") * 0 && !one("mse").isNaN)
    pred.unpersist(); assembled.unpersist()
  }

  test("M3/model trait: families fit/save/load/predict via registry") {
    import graft.ml.Models
    val ds = Poisson.buildDataset(spark, dir)
    val assembled = Poisson.assemble(ds, ds.columns.filter(_.endsWith("_hb")).toSeq).cache()
    val tmp = java.nio.file.Files.createTempDirectory("fam").toString
    Models.registry.foreach { case (name, fam) =>
      val m = fam.fit(assembled)
      val path = s"$tmp/$name"
      m.save(path)
      assert(Models.exists(spark, path), s"$name save target missing")
      assert(Models.savedFamily(spark, path).contains(name), s"$name family marker")
      val loaded = fam.load(path)
      val a = m.predict(assembled).select("prediction").limit(5).collect().map(_.getDouble(0))
      val b = loaded.predict(assembled).select("prediction").limit(5).collect().map(_.getDouble(0))
      assert(a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 }, s"$name load drift")
    }
    assembled.unpersist()
  }
}
