package graft.queries

import graft.SparkSpec

/** The n09/n10 MLP weights are the catalog's ONLY remaining frozen
  * trained constants (COVERAGE.md: the permanent SF-independence
  * boundary — spark.ml's L-BFGS fit has no SQL replay). Per the r14
  * verdict, the quality the frozen gate exists to pin therefore gets
  * its own ACCURACY FLOOR here: the live seeded fit + L1-Bayes
  * decision rule must land inside the reference paper's Table-5 MAE
  * band (0.042–0.064, supp. I.3, 2-day horizon) on the sf0.01 corpus
  * the weights were frozen from — and above the task's measured Bayes
  * floor (0.0365 with the full generative state, SCALING.md r11;
  * anything below it means target leakage, not skill). A broken fit,
  * feature window, standardization, or decision rule moves MAE out of
  * the band; the DuckDB oracle alone would only catch Spark/DuckDB
  * DISAGREEMENT, not a quality regression both sides agree on.
  */
class ForecastFloorSpec extends SparkSpec {
  test("n10 forecast MAE sits inside the paper band and above the Bayes floor") {
    val row = graft.SparkEntry.queries("n10_forecast_mae")(
      spark, "/root/testdata/sf0.01").collect().head
    val mae = row.getAs[Double]("mae")
    val n = row.getAs[Long]("n_samples")
    info(f"n10 MAE $mae%.4f over $n samples (band 0.042-0.064, Bayes floor 0.0365)")
    assert(n > 1000, s"suspiciously few forecast samples: $n")
    assert(mae <= 0.064, f"MAE $mae%.4f above the paper band's 0.064 ceiling")
    assert(mae >= 0.0365, f"MAE $mae%.4f below the measured Bayes floor - leakage?")
  }
}
