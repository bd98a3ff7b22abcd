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

  test("rewrite preserves NULL semantics: unequal lengths and null elements → NULL") {
    VectorFunctions.register(spark)
    // parquet roundtrip so the optimizer sees a real scan (LocalRelation
    // would constant-fold) and element nullability is true, like real data
    val dir = tmpDir("vecnull")
    spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(cast(1.0 as float), cast(2.0 as float)),
        |       array(cast(3.0 as float), cast(4.0 as float))),
        |  (2L, array(cast(1.0 as float), cast(2.0 as float)),
        |       array(cast(3.0 as float), cast(4.0 as float), cast(5.0 as float))),
        |  (3L, array(cast(1.0 as float), cast(null as float)),
        |       array(cast(3.0 as float), cast(4.0 as float)))
        |AS t(id, a, b)""".stripMargin)
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val lambdaForm = df.select(col("id"), aggregate(
      zip_with(transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double")), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("d"))
    // the rule fires (strict kernel) ...
    assert(lambdaForm.queryExecution.optimizedPlan
      .expressions.exists(_.exists(_.isInstanceOf[FloatVecDot])))
    val got = lambdaForm.as[(Long, Option[Double])].collect().toMap
    // ... and reproduces the lambda's null semantics exactly: row 1 is a
    // clean dot product, row 2 NULL (zip_with null-pads the length
    // mismatch), row 3 NULL (null element)
    assert(got == Map(1L -> Some(11.0), 2L -> None, 3L -> None))
  }
}
