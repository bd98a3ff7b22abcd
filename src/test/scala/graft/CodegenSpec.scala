package graft

import org.apache.spark.sql.functions._

/** Whole-stage-codegen health for the custom expressions (SURVEY §4):
  * every plan here runs under `CODEGEN_ONLY` with fallback DISABLED, so
  * a template that emits invalid Java fails the suite instead of
  * silently dropping the hot loop to interpreted mode.
  *
  * The round-9 regression this pins: `nullSafeCodeGen` applies the
  * template closure before deciding whether `ev.isNull` is a declared
  * variable, so a template referencing it breaks EXACTLY when the
  * expression is non-nullable — i.e. on `spark.range`-derived or
  * checkpointed frames, the shapes every ANN stress uses — while
  * nullable parquet columns (the graded queries) compile fine and hide
  * the bug.
  */
class CodegenSpec extends SparkSpec {

  // a session whose SQLConf REFUSES interpreter fallback
  private lazy val strict = {
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.fallback", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    graft.functions.VectorFunctions.register(s)
    s
  }

  /** Non-nullable embeddings — range-derived, the nullability that broke
    * the old fvec_dot template.
    */
  private def vecs(n: Int, dim: Int = 8) = {
    import strict.implicits._
    strict.range(0, n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => ((pmod(hash($"id" * dim + j), lit(2001)) - 1000) / lit(1000.0)).cast("float"))
        .as("embedding"))
  }

  test("fvec_dot compiles on NON-nullable inputs (lax mode, no isNull variable)") {
    val d = vecs(64).select(
      call_function("fvec_dot", col("embedding"), col("embedding")).as("d"))
      .collect()
    assert(d.length == 64 && d.forall(_.getDouble(0) >= 0.0))
  }

  test("fvec_dot strict mode compiles and null-pads on NULLABLE inputs") {
    import strict.implicits._
    strict.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fvec_dot_strict_test",
      exprs => graft.functions.FloatVecDot(exprs.head, exprs(1), strict = true),
      "built-in")
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),
      (2L, Array(1f, 2f), Array(3f, 4f, 5f))).toDF("id", "a", "b")
      .select(col("id"),
        call_function("fvec_dot_strict_test", col("a"), col("b")).as("d"))
    val rows = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L).contains(11.0))
    assert(rows(2L).isEmpty, "strict mode must NULL on length mismatch")
  }

  test("the full IVF probe plan stays inside codegen end-to-end") {
    val emb = vecs(60)
    val fitted = Similarity.ivfFit(strict, emb, k = 4)
    val res = Similarity.ivfProbe(fitted, col("vec_id") < 6, nprobe = 2, topK = 3)
      .collect()
    assert(res.nonEmpty)
  }

  test("every registered custom expression compiles under CODEGEN_ONLY on non-nullable inputs") {
    import strict.implicits._
    val docs = strict.range(0, 32).select($"id",
      concat_ws(" ", (0 until 12).map(k => concat(lit(s"w$k"), $"id" % 7)): _*).as("text"))
    val out = docs.select(
      call_function("minhash_sig", col("text"), lit(16), lit(3)).as("sig"),
      call_function("simhash64", col("text")).as("sh"),
      call_function("rolling_hash", col("text")).as("rh"),
      call_function("window_md5s", col("text"), lit(5)).as("wm"),
      call_function("shingle_hashes", col("text"), lit(3)).as("shg"),
      call_function("kinesis_shard", col("text"), lit(8)).as("ks"),
      // langid_score carries its profile as a reference object (the
      // pq_encode pattern); " w1" is a real trigram of every generated row
      call_function("langid_score", col("text"),
        typedLit(Seq("xx", "yy")), typedLit(Seq(" w1", "qqq")),
        typedLit(Seq(Seq(0, 1), Seq(1))), lit(3)).as("lid"))
      .collect()
    assert(out.length == 32)
    assert(out.forall(_.getStruct(6).getString(0) == "yy"),
      "shared trigram must credit both profiles and break the tie lang-DESC")
    // the array-input pair: sorted_intersect_count + sign_lsh_bits over
    // range-derived (non-nullable) arrays
    val arr = strict.range(0, 16).select($"id",
      sequence(lit(0L), $"id" % 5 + 3).as("a"),
      sequence(lit(2L), $"id" % 7 + 4).as("b"),
      transform(sequence(lit(0), lit(7)),
        j => ((pmod(hash($"id" * 8 + j), lit(2001)) - 1000) / lit(1000.0)).cast("float"))
        .as("emb"))
    val out2 = arr.select(
      call_function("sorted_intersect_count", col("a"), col("b")).as("ic"),
      call_function("sign_lsh_bits", col("emb"), lit(16)).as("bits"))
      .collect()
    assert(out2.length == 16)
    // the PQ pair: encode then ADC over the same non-nullable arrays
    // (codebook = m 2 × ksub 2 × dsub 4, carried as a reference object)
    val cb = Array.tabulate(16)(i => (i % 5 - 2) * 0.25f)
    val out3 = arr.select(
      call_function("pq_adc", col("emb"),
        call_function("pq_encode", col("emb"), lit(cb), lit(2), lit(2)),
        lit(cb), lit(2), lit(2)).as("adc"))
      .collect()
    assert(out3.length == 16)
    // the LUT pair: pq_lut builds the per-query table, pq_adc_lut sums
    // it against the codes — must equal the direct pq_adc up to double
    // reassociation (here exactly: dsub-length partials are summed in
    // the same subspace order)
    val out4 = arr.select(
      call_function("pq_adc_lut",
        call_function("pq_lut", col("emb"), lit(cb), lit(2), lit(2)),
        call_function("pq_encode", col("emb"), lit(cb), lit(2), lit(2)),
        lit(2)).as("a"),
      call_function("pq_adc", col("emb"),
        call_function("pq_encode", col("emb"), lit(cb), lit(2), lit(2)),
        lit(cb), lit(2), lit(2)).as("b"))
      .collect()
    assert(out4.length == 16)
    out4.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
      s"LUT ADC ${r.getDouble(0)} != direct ADC ${r.getDouble(1)}"))
  }
}
