package graft

import org.apache.spark.sql.functions._

import Tables._

/** Scalar function families, SURVEY.md §2.D — one graded query per family
  * exercising several members. All integer-valued computed columns are cast
  * to BIGINT on the Spark side because DuckDB's string/date/window functions
  * return BIGINT where Spark returns INT (verified on DuckDB 1.0.0).
  */
object ScalarFuncs {

  // D1: string functions over customer names ('Customer#000000042').
  val qString = Q(
    "qd1_string",
    """SELECT c_custkey,
      |       lower(c_name) AS name_lower,
      |       substring(c_name, 1, 8) AS name_pre,
      |       length(c_name) AS name_len,
      |       regexp_replace(c_name, '[0-9]', '', 'g') AS name_alpha,
      |       regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
      |       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nk_pad,
      |       concat_ws('|', c_mktsegment, c_name) AS seg_name,
      |       strpos(c_name, '9') AS pos_nine,
      |       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_seg,
      |       replace(c_name, 'Customer', 'C') AS name_short,
      |       reverse(c_mktsegment) AS seg_rev
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    // lev_seg via the byte_levenshtein kernel: DuckDB's levenshtein counts
    // BYTES, Spark's built-in counts CHARS — byte semantics on both
    // engines keep this row multibyte-proof (SURVEY §7.4.10)
    functions.VectorFunctions.register(s)
    customer(s, d).select(
      col("c_custkey"),
      lower(col("c_name")).as("name_lower"),
      substring(col("c_name"), 1, 8).as("name_pre"),
      length(col("c_name")).cast("long").as("name_len"),
      regexp_replace(col("c_name"), "[0-9]", "").as("name_alpha"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
      lpad(col("c_nationkey").cast("string"), 4, "0").as("nk_pad"),
      concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"),
      instr(col("c_name"), "9").cast("long").as("pos_nine"),
      call_function("byte_levenshtein",
        col("c_mktsegment"), lit("BUILDING"), lit(-1)).as("lev_seg"),
      regexp_replace(col("c_name"), "Customer", "C").as("name_short"),
      reverse(col("c_mktsegment")).as("seg_rev"))
      .orderBy(col("c_custkey"))
  }

  // D2: date/time functions (UTC pinned on both engines).
  val qDateTime = Q(
    "qd2_datetime",
    """SELECT o_orderkey,
      |       year(o_orderdate) AS yr,
      |       month(o_orderdate) AS mo,
      |       day(o_orderdate) AS dom,
      |       date_trunc('month', o_orderdate) AS month_start,
      |       CAST(o_orderdate AS DATE) + 30 AS plus30,
      |       epoch_ms(o_orderdate) AS ems,
      |       make_date(CAST(year(o_orderdate) AS INTEGER), 1, 1) AS year_start,
      |       CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mo"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      // parquet timestamps load as TIMESTAMP_NTZ; session is UTC so the
      // LTZ round-trips below are exact, and the output stays NTZ to match
      // DuckDB's naive TIMESTAMP.
      date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
      date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("ems"),
      make_date(year(col("o_orderdate")), lit(1), lit(1)).as("year_start"),
      datediff(col("o_orderdate").cast("date"), to_date(lit("1995-01-01"))).cast("long").as("days_since"))
      .orderBy(col("o_orderkey"))
  }

  // D1b: second string wave — positional/slicing/char functions.
  val qStringExtra = Q(
    "qd1b_string_extra",
    """SELECT c_custkey,
      |       left(c_name, 4) AS l4,
      |       right(c_name, 4) AS r4,
      |       repeat(c_mktsegment, 2) AS seg2,
      |       CAST(ascii(c_name) AS BIGINT) AS first_char,
      |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
      |       split_part(c_name, '#', 2) AS name_num,
      |       contains(c_name, '42') AS has42,
      |       starts_with(c_mktsegment, 'BU') AS is_bu
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    customer(s, d).select(
      col("c_custkey"),
      substring(col("c_name"), 1, 4).as("l4"),
      expr("right(c_name, 4)").as("r4"),
      repeat(col("c_mktsegment"), 2).as("seg2"),
      ascii(col("c_name")).cast("long").as("first_char"),
      translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"),
      expr("split_part(c_name, '#', 2)").as("name_num"),
      col("c_name").contains("42").as("has42"),
      col("c_mktsegment").startsWith("BU").as("is_bu"))
      .orderBy(col("c_custkey"))
  }

  // D2b: second datetime wave — quarter/dow/last_day/month interval.
  // DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday → Spark side shifts.
  val qDateTimeExtra = Q(
    "qd2b_datetime_extra",
    """SELECT o_orderkey,
      |       quarter(o_orderdate) AS qtr,
      |       CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
      |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
      |       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).select(
      col("o_orderkey"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
      last_day(col("o_orderdate").cast("date")).as("month_end"),
      add_months(col("o_orderdate").cast("date"), 2).as("plus2m"),
      dayofyear(col("o_orderdate")).cast("long").as("doy"))
      .orderBy(col("o_orderkey"))
  }

  // D3: math functions. round/bround are excluded from the oracle (HALF_UP
  // vs HALF_EVEN on .5 boundaries, SURVEY.md §7.4.3); sqrt is IEEE
  // exact-rounded, ln/log10 are libm-dependent → floor-truncated at 1e-6.
  val qMath = Q(
    "qd3_math",
    """SELECT p_partkey,
      |       abs(p_retailprice - 1000.0) AS abs_diff,
      |       CAST(ceil(p_retailprice) AS BIGINT) AS ceil_p,
      |       CAST(floor(p_retailprice) AS BIGINT) AS floor_p,
      |       floor(sqrt(p_retailprice)*1000000)/1000000 AS sqrt_p,
      |       floor(ln(p_retailprice)*1000000)/1000000 AS ln_p,
      |       floor(log10(p_retailprice)*1000000)/1000000 AS log10_p,
      |       pow(p_size, 2) AS size_sq,
      |       CAST(sign(p_retailprice - 1000.0) AS BIGINT) AS sgn,
      |       greatest(p_size, 25) AS g25,
      |       least(p_size, 25) AS l25
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d).select(
      col("p_partkey"),
      abs(col("p_retailprice") - 1000.0).as("abs_diff"),
      ceil(col("p_retailprice")).cast("long").as("ceil_p"),
      floor(col("p_retailprice")).cast("long").as("floor_p"),
      trunc6(sqrt(col("p_retailprice"))).as("sqrt_p"),
      trunc6(log(col("p_retailprice"))).as("ln_p"),
      trunc6(log10(col("p_retailprice"))).as("log10_p"),
      pow(col("p_size"), lit(2)).as("size_sq"),
      signum(col("p_retailprice") - 1000.0).cast("long").as("sgn"),
      greatest(col("p_size"), lit(25)).cast("long").as("g25"),
      least(col("p_size"), lit(25)).cast("long").as("l25"))
      .orderBy(col("p_partkey"))
  }

  // D3b: integer-exact math extras — modulo (incl. positive-mod of
  // negatives), factorial, bitwise and/or/xor, shifts. All integer ops:
  // bit-identical across engines by construction, no truncation needed
  // (trig/exp extras were deliberately excluded — Java Math and C libm
  // differ in the last ulp, which flips floor-truncation at the boundary).
  val qMathExtra = Q(
    "qd3b_math_extra",
    """SELECT p_partkey,
      |       CAST(((p_size - 25) % 7 + 7) % 7 AS BIGINT) AS pm7,
      |       CAST(p_partkey % 97 AS BIGINT) AS mod97,
      |       CAST(factorial(p_size % 10) AS BIGINT) AS fact10,
      |       CAST(p_partkey & 255 AS BIGINT) AS band,
      |       CAST(p_partkey | 4096 AS BIGINT) AS bor,
      |       CAST(xor(p_partkey, 1535) AS BIGINT) AS bxor,
      |       CAST(p_size << 3 AS BIGINT) AS shl,
      |       CAST(p_partkey >> 2 AS BIGINT) AS shr
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d).select(
      col("p_partkey"),
      pmod(col("p_size") - 25, lit(7)).cast("long").as("pm7"),
      (col("p_partkey") % 97).cast("long").as("mod97"),
      factorial(col("p_size") % 10).cast("long").as("fact10"),
      col("p_partkey").bitwiseAND(255).cast("long").as("band"),
      col("p_partkey").bitwiseOR(4096).cast("long").as("bor"),
      col("p_partkey").bitwiseXOR(1535).cast("long").as("bxor"),
      shiftleft(col("p_size"), 3).cast("long").as("shl"),
      shiftright(col("p_partkey"), 2).cast("long").as("shr"))
      .orderBy(col("p_partkey"))
  }

  // D4: array functions over the dim-64 embedding vectors. Element math is
  // widened to double on BOTH engines before folding so the sequential
  // accumulation is bit-identical.
  val qArray = Q(
    "qd4_array",
    """SELECT vec_id,
      |       len(embedding) AS dim,
      |       embedding[1] AS h1, embedding[2] AS h2, embedding[3] AS h3,
      |       embedding[1] AS first_elem,
      |       floor(list_sum(CAST(embedding AS DOUBLE[]))*10000)/10000 AS sum_all,
      |       floor(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))*10000)/10000 AS norm_sq,
      |       list_aggregate(embedding, 'max') AS max_elem,
      |       list_aggregate(embedding, 'min') AS min_elem,
      |       (list_sort(embedding[1:5]))[1] AS s1,
      |       (list_sort(embedding[1:5]))[5] AS s5
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
    // Array-typed outputs (head3/sorted5) are scalarized to elements: the
    // driver's comparator sorts every column in pandas, where array cells
    // are unhashable. slice/sort_array still exercise the array kernels;
    // only the graded projection is element-wise.
    val embD = transform(col("embedding"), _.cast("double"))
    val sorted5 = sort_array(slice(col("embedding"), 1, 5))
    embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      slice(col("embedding"), 1, 3).getItem(0).as("h1"),
      slice(col("embedding"), 1, 3).getItem(1).as("h2"),
      slice(col("embedding"), 1, 3).getItem(2).as("h3"),
      col("embedding").getItem(0).as("first_elem"),
      trunc4(aggregate(embD, lit(0.0), (acc, x) => acc + x)).as("sum_all"),
      trunc4(aggregate(embD, lit(0.0), (acc, x) => acc + x * x)).as("norm_sq"),
      array_max(col("embedding")).as("max_elem"),
      array_min(col("embedding")).as("min_elem"),
      sorted5.getItem(0).as("s1"),
      sorted5.getItem(4).as("s5"))
      .orderBy(col("vec_id"))
  }

  // D5: map construction/access (two roads to a map from the props JSON:
  // map() literal and str_to_map over a translated string).
  val qMap = Q(
    "qd5_map",
    """SELECT event_id,
      |       CAST(props->>'k' AS BIGINT) AS k_val,
      |       CAST(props->>'k' AS BIGINT) AS k_val2,
      |       CAST(1 AS BIGINT) AS m_size,
      |       'k' AS key0
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    val m = map(lit("k"), get_json_object(col("props"), "$.k"))
    val m2 = expr("str_to_map(translate(props, '{}\" ', ''), ',', ':')")
    events(s, d).select(
      col("event_id"),
      element_at(m, "k").cast("long").as("k_val"),
      element_at(m2, "k").cast("long").as("k_val2"),
      size(m).cast("long").as("m_size"),
      map_keys(m).getItem(0).as("key0"))
      .orderBy(col("event_id"))
  }

  // D6: JSON functions over events.props.
  val qJson = Q(
    "qd6_json",
    """SELECT event_id,
      |       CAST(props->>'k' AS BIGINT) AS k_val,
      |       CAST(props->>'k' AS BIGINT) AS k_struct,
      |       '{"event_id":' || CAST(event_id AS VARCHAR) || '}' AS j
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k_val"),
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))).getField("k").as("k_struct"),
      to_json(struct(col("event_id"))).as("j"))
      .orderBy(col("event_id"))
  }

  // D7: conditional / null handling.
  val qConditional = Q(
    "qd7_conditional",
    """SELECT c_custkey,
      |       CASE WHEN c_acctbal < 0 THEN 'neg'
      |            WHEN c_acctbal < 5000 THEN 'mid'
      |            ELSE 'high' END AS tier,
      |       coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)') AS seg_or_default,
      |       CASE WHEN c_acctbal >= 0 THEN c_acctbal ELSE 0.0 END AS pos_bal,
      |       CAST(CASE WHEN c_nationkey = 0 THEN NULL ELSE c_nationkey END AS INTEGER) AS nk_nz
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    customer(s, d).select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 5000, "mid")
        .otherwise("high").as("tier"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(default)")).as("seg_or_default"),
      when(col("c_acctbal") >= 0, col("c_acctbal")).otherwise(lit(0.0)).as("pos_bal"),
      nullif(col("c_nationkey"), lit(0)).as("nk_nz"))
      .orderBy(col("c_custkey"))
  }

  def all: Seq[Q] = Seq(
    qString, qStringExtra, qDateTime, qDateTimeExtra, qMath, qMathExtra,
    qArray, qMap, qJson, qConditional)
}
