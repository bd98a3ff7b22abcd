package graft

import org.apache.spark.sql.functions._

import graft.functions.{FloatVecDot, VectorFunctions}

class RewriteVecDotSpec extends SparkSpec {

  import spark.implicits._

  test("optimizer rewrites aggregate(zip_with(...)) to FloatVecDot") {
    VectorFunctions.register(spark) // installs the experimental rule
    // parquet-backed input: a LocalRelation would be constant-folded away
    // before the plan can be inspected
    val emb = Tables.embeddings(spark, sf001)
    val embD = transform(col("embedding"), _.cast("double"))
    val df = emb.select(col("vec_id"),
      aggregate(zip_with(embD, embD, (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    val optimized = df.queryExecution.optimizedPlan
    val hasKernel = optimized.expressions.exists(_.exists(_.isInstanceOf[FloatVecDot]))
    assert(hasKernel, s"expected FloatVecDot in:\n$optimized")
    // norm² is positive for every non-zero vector
    assert(df.as[(Long, Double)].collect().forall(_._2 > 0.0))
  }

  test("rewrite preserves the exact double accumulation (parity with kernel)") {
    VectorFunctions.register(spark)
    val vals = (0 until 64).map(i => (math.sin(i) * 0.1).toFloat).toArray
    val df = Seq((vals, vals)).toDF("a", "b")
    val viaLambda = df.select(
      aggregate(zip_with(transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double")), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)).as[Double].head()
    val viaKernel = df.select(
      call_function("fvec_dot", col("a"), col("b"))).as[Double].head()
    assert(viaLambda == viaKernel)
  }

  test("cast-to-double-array form is rewritten too; float-arithmetic form is NOT") {
    VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf001)
    val castForm = emb.select(aggregate(
      zip_with(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"),
        (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("d"))
    assert(castForm.queryExecution.optimizedPlan
      .expressions.exists(_.exists(_.isInstanceOf[FloatVecDot])))
    assert(castForm.as[Double].collect().forall(_ > 0.0))
    // float-typed multiply rounds per element — numerically different, so
    // the rule must leave it alone
    val floatForm = emb.select(aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
      lit(0.0f), (acc, v) => acc + v).as("d"))
    assert(!floatForm.queryExecution.optimizedPlan
      .expressions.exists(_.exists(_.isInstanceOf[FloatVecDot])))
  }
}
