package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class CosineExpressionSpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    (0L until 50L).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
  }

  test("cosine_sim matches the higher-order column form bit-for-bit (float + quantized)") {
    GraftExtensions.register(spark)
    val a = vecs.select(col("vec_id"), col("embedding"))
    val b = vecs.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    val joined = a.crossJoin(b).filter(col("vec_id") < 5)
    val both = joined.select(
      call_function("cosine_sim", col("embedding"), col("e2")).as("native"),
      VectorFunctions.cosine(col("embedding"), col("e2")).as("ho"),
      call_function("cosine_sim",
        VectorFunctions.quantize(col("embedding")),
        VectorFunctions.quantize(col("e2"))).as("native_q"),
      VectorFunctions.cosineQ(
        VectorFunctions.quantize(col("embedding")),
        VectorFunctions.quantize(col("e2"))).as("ho_q"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "float form diverges")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "quantized form diverges")
    }
  }

  test("cosine_sim runs inside whole-stage codegen") {
    GraftExtensions.register(spark)
    // a parquet-backed frame (the local Seq form constant-folds away)
    val df = graft.Tables.embeddings(spark, sfDir)
      .select(call_function("cosine_sim", col("embedding"), col("embedding")).as("c"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("), s"no codegen span:\n$p")
    // self-cosine is exactly 1 up to FP; sanity-check the generated loop
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("cosine_sim is NULL on length mismatch or null elements (zip_with semantics)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)), // length mismatch
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))        // well-formed
    ).toDF("a", "b")
    val out = df.select(call_function("cosine_sim", col("a"), col("b")).as("c")).collect()
    assert(out(0).isNullAt(0), "length mismatch must score NULL")
    assert(!out(1).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT cosine_sim(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS c").collect()
    assert(withNullElem(0).isNullAt(0), "null element must score NULL")
  }

  test("cosine_sim interpreted eval (non-codegen path) agrees with codegen") {
    GraftExtensions.register(spark)
    // force interpreted evaluation by calling eval directly
    val rows = vecs.limit(3).collect().map(_.getSeq[Float](1).toArray)
    val lit0 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      rows(0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val lit1 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      rows(1), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val interpreted = CosineSim(lit0, lit1)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty).asInstanceOf[Double]
    val viaSql = vecs.sparkSession.sql(
      s"SELECT 1").sparkSession.range(1)
      .select(call_function("cosine_sim",
        typedLit(rows(0).toSeq), typedLit(rows(1).toSeq)).as("c"))
      .head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(interpreted) ==
      java.lang.Double.doubleToLongBits(viaSql))
  }
}
