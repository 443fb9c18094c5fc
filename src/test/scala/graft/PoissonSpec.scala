package graft

import graft.ml.Poisson

/** M2-M5 invariants (no SQL oracle exists for model fitting; SURVEY.md
  * §5.2): finite fit, prediction count preservation, save/load roundtrip.
  */
class PoissonSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("dataset shape: one row per labeled event, 24 ring features") {
    val ds = Poisson.buildDataset(spark, dir)
    assert(ds.columns.count(_.endsWith("_hb")) === 24)
    assert(ds.count() > 0)
  }

  test("fit + predict: counts preserved, MSE finite, save/load roundtrip") {
    val cfg = Poisson.Config()
    val ds = Poisson.buildDataset(spark, dir, cfg)
    val assembled = Poisson.assemble(ds, (0 until 24).map(i => s"n_rents_${i}_hb")).cache()
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
}
