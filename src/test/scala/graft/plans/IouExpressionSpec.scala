package graft.plans

import graft.SparkSpec
import graft.queries.RelationalQueries
import org.apache.spark.sql.functions._

class IouExpressionSpec extends SparkSpec {

  test("native Iou expression matches the composed column form on random boxes") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map { _ =>
      val ax1 = rnd.nextDouble() * 1000; val ay1 = rnd.nextDouble() * 600
      val bx1 = rnd.nextDouble() * 1000; val by1 = rnd.nextDouble() * 600
      (ax1, ay1, ax1 + 10 + rnd.nextDouble() * 200, ay1 + 10 + rnd.nextDouble() * 200,
        bx1, by1, bx1 + 10 + rnd.nextDouble() * 200, by1 + 10 + rnd.nextDouble() * 200)
    }
    val df = rows.toDF("ax1", "ay1", "ax2", "ay2", "bx1", "by1", "bx2", "by2")
    val both = df.select(
      expr("iou(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)").as("native"),
      RelationalQueries.iou(col("ax1"), col("ay1"), col("ax2"), col("ay2"),
        col("bx1"), col("by1"), col("bx2"), col("by2")).as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"native ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("iou properties: [0,1], symmetric, self-IoU = 1") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(spark)
    val df = Seq((10.0, 20.0, 110.0, 220.0, 50.0, 60.0, 180.0, 200.0))
      .toDF("ax1", "ay1", "ax2", "ay2", "bx1", "by1", "bx2", "by2")
    val r = df.select(
      expr("iou(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)"),
      expr("iou(bx1, by1, bx2, by2, ax1, ay1, ax2, ay2)"),
      expr("iou(ax1, ay1, ax2, ay2, ax1, ay1, ax2, ay2)")).head()
    assert(r.getDouble(0) >= 0 && r.getDouble(0) <= 1)
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(2) == 1.0)
  }

  test("the expression participates in whole-stage codegen (no fallback)") {
    GraftExtensions.register(spark)
    val df = spark.range(1000).selectExpr(
      "CAST(id AS DOUBLE) AS x",
      "iou(CAST(id AS DOUBLE), 0.0, CAST(id+10 AS DOUBLE), 10.0, 5.0, 0.0, 15.0, 10.0) AS v")
    df.collect() // force compile; a codegen error would fall back with a warning
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"expected codegen stage:\n$p")
  }

  test("null inputs yield null, not a crash") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT iou(CAST(NULL AS DOUBLE), 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0)").head()
    assert(r.isNullAt(0))
  }
}
