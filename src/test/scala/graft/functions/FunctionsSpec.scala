package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.{Spark, Tables}
import graft.core.{Blosc, PixelCodec}
import org.apache.spark.sql.functions._

class FunctionsSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-fn-test")

  test("vector_dot is bit-identical to the interpreted HOF fold") {
    import spark.implicits._
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val hof = expr("aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val rows = e.select(vector_dot(col("embedding"), col("embedding")).as("native"), hof.as("hofv"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("md5_bits is bit-identical to the composed conv(substr(md5)) idiom") {
    // the native expression replaced this idiom across the query packs —
    // the gate's hash values all flow through it, so equality must hold
    // for every width in use (4, 8, 15 nibbles)
    import spark.implicits._
    val df = spark.range(10000)
      .select(concat(lit("probe-"), col("id")).cast("string").as("s"))
    for (n <- Seq(4, 8, 15)) {
      val bad = df.select(
          expr(s"md5_bits(s, $n)").as("a"),
          expr(s"CAST(conv(substr(md5(s), 1, $n), 16, 10) AS BIGINT)").as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(bad == 0L, s"nibbles=$n: $bad mismatches vs the composed idiom")
    }
    // null propagates, and the column API agrees with the SQL name
    val r = spark.sql("SELECT md5_bits(CAST(NULL AS STRING), 15)").collect()(0)
    assert(r.isNullAt(0))
    val viaApi = df.limit(1).select(graft.functions.md5_bits(col("s"), 15)).collect()(0).getLong(0)
    val viaSql = df.limit(1).selectExpr("md5_bits(s, 15)").collect()(0).getLong(0)
    assert(viaApi == viaSql)
  }

  test("word_shingle_hashes / char_window_hashes equal their composed SQL pipelines") {
    // the native generators replaced these pipelines in the dedup family;
    // element-for-element equality on real documents is the contract
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val shingleComposed = expr(
      "transform(CASE WHEN size(ts) < 3 THEN array() ELSE sequence(0, size(ts) - 3) END, " +
        "i -> md5_bits(concat_ws(' ', ts[i], ts[i+1], ts[i+2]), 15))")
    val badShingles = d
      .withColumn("ts", split(trim(col("text")), "\\s+"))
      .select(expr("word_shingle_hashes(text, 3)").as("a"), shingleComposed.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(badShingles == 0L, s"$badShingles docs with shingle-hash mismatch")
    val windowComposed = expr(
      "transform(CASE WHEN length(text) < 40 THEN array() ELSE sequence(1, length(text) - 39) END, " +
        "i -> md5_bits(substring(text, i, 40), 15))")
    val badWindows = d
      .select(expr("char_window_hashes(text, 40)").as("a"), windowComposed.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(badWindows == 0L, s"$badWindows docs with window-hash mismatch")
    // non-ASCII fallback keeps CHARACTER window semantics
    val uni = spark.sql(
      "SELECT char_window_hashes('äbcdëfghij', 4) AS a, " +
        "transform(sequence(1, 7), i -> md5_bits(substring('äbcdëfghij', i, 4), 15)) AS b")
      .collect()(0)
    assert(uni.getSeq[Long](0) == uni.getSeq[Long](1))
  }

  test("nearest_centroid equals the array_min(transform(...)) HOF form") {
    // the native expression replaced this HOF chain in the k-means
    // assignment (c1/c3) — (dist, cid) equality incl. tiebreak is the
    // contract; built on real embeddings so quantization is exercised
    import spark.implicits._
    val q = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))")
          .as("qv"))
    val cmat = q.filter(col("vec_id") < 8)
      .select(expr("struct(vec_id AS cid, qv AS cv)").as("c"))
      .agg(expr("array_sort(collect_list(c))").as("cs"))
    val rows = q.crossJoin(broadcast(cmat))
      .select(
        nearest_centroid(col("qv"), col("cs")).as("native"),
        expr("array_min(transform(cs, c -> struct(" +
          "aggregate(sequence(0, 63), CAST(0 AS BIGINT)," +
          " (acc, i) -> acc + (qv[i] - c.cv[i]) * (qv[i] - c.cv[i])) AS dist," +
          " c.cid AS cid)))").as("hof"))
      .as[((Long, Long), (Long, Long))].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) => assert(n == h) }
    // exact-tie determinism: two centroids at the same point -> lowest cid
    val tie = spark.sql(
      """SELECT nearest_centroid(array(CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  array(struct(CAST(7 AS BIGINT) AS cid, array(CAST(1 AS BIGINT), CAST(0 AS BIGINT)) AS cv),
        |        struct(CAST(3 AS BIGINT) AS cid, array(CAST(1 AS BIGINT), CAST(0 AS BIGINT)) AS cv))) AS m
        |""".stripMargin).select(col("m.dist"), col("m.cid")).as[(Long, Long)].head()
    assert(tie == ((1L, 3L)))
  }

  test("id_pairs equals the nested transform/filter HOF pipeline") {
    // the native generator replaced this pipeline in pairCounts (the
    // whole dedup family's pair generation) — element-for-element
    // equality on real shingle buckets is the contract
    import spark.implicits._
    val buckets = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), explode(expr("word_shingle_hashes(text, 3)")).as("h"))
      .distinct()
      .groupBy(col("h")).agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val rows = buckets.select(
        id_pairs(col("ids")).as("native"),
        expr("flatten(transform(ids, a -> transform(filter(ids, b -> b > a)," +
          " b -> struct(a AS d1, b AS d2))))").as("hof"))
      .as[(Seq[(Long, Long)], Seq[(Long, Long)])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) => assert(n == h) }
    // duplicates pair with nothing (the b > a value filter), empty is empty
    val edge = spark.sql(
      """SELECT id_pairs(array(CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(7 AS BIGINT))) AS p,
        |       id_pairs(array(CAST(5 AS BIGINT))) AS e""".stripMargin)
      .as[(Seq[(Long, Long)], Seq[(Long, Long)])].head()
    assert(edge._1 == Seq((3L, 7L), (3L, 7L)) && edge._2.isEmpty)
  }

  test("zorder_key equals the 32-term shift/mask sum and interleaves exactly") {
    import spark.implicits._
    val sumForm = (0 until 16).map(i =>
      s"(shiftleft((x >> $i) & 1, ${2 * i}) + shiftleft((y >> $i) & 1, ${2 * i + 1}))")
      .mkString(" + ")
    val df = spark.range(20000).select(
      (col("id") * 7919 % 65536).as("x"), (col("id") * 104729 % 65536).as("y"))
    val bad = df.select(expr("zorder_key(x, y)").as("a"), expr(sumForm).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0L, s"$bad mismatches vs the shift/mask sum")
    // hand-checked corners: bit i of x -> 2i, bit i of y -> 2i+1
    val corners = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (0xFFFFL, 0L, 0x55555555L), (0L, 0xFFFFL, 0xAAAAAAAAL),
      (0xFFFFL, 0xFFFFL, 0xFFFFFFFFL), (0x10000L, 0L, 0L))
    corners.foreach { case (x, y, want) =>
      val got = Seq((x, y)).toDF("x", "y")
        .select(zorder_key(col("x"), col("y"))).as[Long].head()
      assert(got == want, s"zorder_key($x, $y) = $got, want $want")
    }
    // an aligned 2^11-key range spans at most a 64x32 rectangle — the
    // zone-map pruning bound s2_zorder_layout audits
    val spans = df
      .select(col("x") % 256 as "x", col("y") % 256 as "y")
      .select(col("x"), col("y"), zorder_key(col("x"), col("y")).as("z"))
      .groupBy(expr("z div 2048")).agg(
        (max(col("x")) - min(col("x"))).as("xs"), (max(col("y")) - min(col("y"))).as("ys"))
      .filter(col("xs") > 63 || col("ys") > 31).count()
    assert(spans == 0L)
  }

  test("hll_estimate matches the expression-level HLL estimate per group") {
    import spark.implicits._
    // same shingle-hash input as t13_hll_shingles
    val sh = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("lang"), split(trim(col("text")), "\\s+").as("ts"))
      .select(col("lang"), explode(expr(
        "CASE WHEN size(ts) < 3 THEN array() ELSE " +
        "transform(sequence(0, size(ts) - 3), i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2])) END"))
        .as("sgl"))
      .select(col("lang"),
        expr("CAST(conv(substr(md5(sgl), 1, 15), 16, 10) AS BIGINT)").as("h"))
    val imperative = sh.groupBy(col("lang")).agg(hll_estimate(col("h")).as("est"))
      .as[(String, Long)].collect().toMap
    val viaExprs = sh
      .select(col("lang"), (col("h") % 64).as("register"), expr("h div 64").as("rem"))
      .select(col("lang"), col("register"),
        when(col("rem") === 0, lit(55))
          .otherwise(lit(55) - length(expr("bin(rem)"))).as("rho"))
      .groupBy(col("lang"), col("register")).agg(max(col("rho")).as("rho_j"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("nr"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - rho_j AS INT))")).as("sd"))
      .select(col("lang"), expr(
        "CAST(floor(1.0462993238608057e20 / (sd + (64 - nr) * shiftleft(CAST(1 AS BIGINT), 55)) + 0.5) AS BIGINT)")
        .as("est"))
      .as[(String, Long)].collect().toMap
    assert(imperative.keySet == viaExprs.keySet && imperative.nonEmpty)
    imperative.foreach { case (lang, est) => assert(est == viaExprs(lang), lang) }
  }

  test("hll_estimate merge is order/partitioning independent") {
    import spark.implicits._
    val df = (1L to 10000L).toDF("x")
      .select(expr("CAST(conv(substr(md5(CAST(x AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
    val est1 = df.repartition(1).agg(hll_estimate(col("h"))).as[Long].head()
    val est32 = df.repartition(32).agg(hll_estimate(col("h"))).as[Long].head()
    assert(est1 == est32)
    // a 64-register sketch should land within ~20% of 10k distinct
    assert(est1 > 8000 && est1 < 12500, est1.toString)
  }

  test("vector_dot enters whole-stage codegen") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = e.select(vector_dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen span
    assert(plan.contains("*(1) Project [vector_dot"), plan)
  }

  test("vector_dot null and type handling") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val out = df.select(vector_dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    intercept[Exception] {
      df.select(vector_dot(lit("x"), col("b"))).collect()
    }
  }

  test("cosine_sim of a vector with itself is 1") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cs = e.select(cosine_sim(col("embedding"), col("embedding")).as("c"))
      .agg(min(col("c")), max(col("c"))).collect()(0)
    assert(math.abs(cs.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(cs.getDouble(1) - 1.0) < 1e-12)
  }

  test("blosc expressions roundtrip through SQL") {
    import spark.implicits._
    val px = Array.tabulate(1000)(i => (i * 13) % 65536)
    Seq(PixelCodec.toBytes(px)).toDF("raw").createOrReplaceTempView("raw_chunks")
    val back = spark.sql(
      "SELECT blosc_decompress(blosc_compress(raw)) AS rt, blosc_compress(raw) AS frame FROM raw_chunks")
      .collect()(0)
    assert(back.getAs[Array[Byte]]("rt").sameElements(PixelCodec.toBytes(px)))
    // and the SQL-produced frame decodes with the library codec too
    assert(Blosc.decompress(back.getAs[Array[Byte]]("frame")).sameElements(PixelCodec.toBytes(px)))
  }

  test("vector_dot is registered for SQL") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT vector_dot(embedding, embedding) AS d FROM embeddings WHERE vec_id < 3")
      .collect()
    assert(n.length == 3 && n.forall(_.getDouble(0) > 0))
  }

  test("token_term_counts equals the split/explode formulation on the corpus") {
    import spark.implicits._
    val terms = Seq("spark", "merge", "vector")
    val docsDf = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // reference formulation: the exact pre-round-8 t8 plan fragments —
    // dl from size(split(trim)), tf from explode + isin + count
    val ref = docsDf.select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("tok"))
      .select(col("doc_id"), size(col("tok")).as("dl"), col("tok"))
    val refTf = ref.select(col("doc_id"), explode(col("tok")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(map_from_arrays(collect_list(col("term")), collect_list(col("tf"))).as("m"))
    val want = ref.select(col("doc_id"), col("dl"))
      .join(refTf, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dl"),
        coalesce(col("m").getItem("spark"), lit(0L)).as("tf0"),
        coalesce(col("m").getItem("merge"), lit(0L)).as("tf1"),
        coalesce(col("m").getItem("vector"), lit(0L)).as("tf2"))
    val got = docsDf.select(col("doc_id"),
        token_term_counts(col("text"), terms).as("c"))
      .select(col("doc_id"), col("c").getItem(0).cast("int").as("dl"),
        col("c").getItem(1).cast("long").as("tf0"),
        col("c").getItem(2).cast("long").as("tf1"),
        col("c").getItem(3).cast("long").as("tf2"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("token_count equals size(split(trim)) on the corpus") {
    import spark.implicits._
    val bad = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(token_count(col("text")).as("a"),
        size(split(trim(col("text")), "\\s+")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0L)
    // and on the edge shapes (blank, whitespace-only, edge tabs)
    val edge = Seq("", "   ", " \t\n ", "\tx y\n", "x").toDF("text")
      .select(token_count(col("text")).as("a"),
        size(split(trim(col("text")), "\\s+")).as("b"))
      .as[(Int, Int)].collect()
    edge.foreach { case (a, b) => assert(a == b, edge.mkString(",")) }
  }

  test("token_term_counts edge cases: blank, adjacency, multibyte, exotic whitespace") {
    import spark.implicits._
    val cases = Seq(
      "",                       // blank: dl must clamp to 1 (split yields [""])
      "   \t\n ",               // whitespace-only: also [""] -> dl 1 after trim
      "spark",                  // single token, edge-delimited both sides
      "spark spark\tspark",     // adjacent hits across different \s chars
      "sparkly spark sparks",   // substrings must NOT count
      "a spark",           // NBSP is NOT Java \s: it stays glued to the token
      "café spark café", // multibyte neighbours
      "xsparkmerge\rvector" // \x0B \f \r are all \s
    ).toDF("text")
    val want = cases.select(
      size(split(trim(col("text")), "\\s+")).as("dl"),
      expr("size(filter(split(trim(text), '\\\\s+'), t -> t = 'spark'))").as("tf0"),
      expr("size(filter(split(trim(text), '\\\\s+'), t -> t = 'merge'))").as("tf1"),
      expr("size(filter(split(trim(text), '\\\\s+'), t -> t = 'vector'))").as("tf2"))
      .as[(Int, Int, Int, Int)].collect().toSeq
    val got = cases.select(token_term_counts(col("text"), Seq("spark", "merge", "vector")).as("c"))
      .select(col("c").getItem(0), col("c").getItem(1), col("c").getItem(2), col("c").getItem(3))
      .as[(Int, Int, Int, Int)].collect().toSeq
    assert(got == want)
  }

  test("pq_encode / pq_adc9 equal the composed explode+join+max_by pipeline") {
    // the fused kernels replaced this composition in v8/v9/v14; the
    // bit-identical claim (PqKernels scaladoc) is asserted here on real
    // embeddings: same codes per (vec, sub), same scaled-integer ADC
    // partial sums per (query, corpus) pair, value-exact
    val subDim = 8
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cb = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("cv"))
      .groupBy(col("label"), (col("pos") / subDim).cast("int").as("sub"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("cent"))
      .select(col("sub"), col("label").cast("long").as("code"), col("cent"))
    val cbn = cb.groupBy()
      .agg(collect_list(struct(col("sub"), col("code"), col("cent"))).as("flat"))
      .select(expr(
        "transform(array_sort(array_distinct(transform(flat, x -> x.sub))), " +
        "s -> array_sort(transform(filter(flat, x -> x.sub = s), " +
        "x -> struct(x.code AS code, x.cent AS cent))))").as("cbn"))
    // composed reference: explode sub-vectors, broadcast-join the flat
    // codebook, round-6 fit, max_by argmax with ties to the lowest code
    val subs = e.select(col("vec_id"), col("embedding"),
        explode(expr("sequence(0, 7)")).as("sub"))
      .select(col("vec_id"), col("sub"),
        expr(s"transform(slice(embedding, sub * $subDim + 1, $subDim), x -> CAST(x AS DOUBLE))")
          .as("sv"))
    val refCodes = subs.join(broadcast(cb), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("code"),
        (vector_dot(col("sv"), col("cent")) * 2.0 -
          vector_dot(col("cent"), col("cent"))).as("fit"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(expr("max_by(code, struct(round(fit, 6) AS f, -code AS nc))").as("code"))
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(sub, code))), x -> x.code)")
        .as("ref_codes"))
    val fused = e.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ev"))
      .crossJoin(broadcast(cbn))
      .select(col("vec_id"), col("ev"), col("cbn"),
        pq_encode(col("ev"), col("cbn")).as("codes"))
    val codeMismatch = fused.join(refCodes, Seq("vec_id"))
      .filter(col("codes") =!= col("ref_codes")).count()
    assert(codeMismatch == 0L, s"$codeMismatch vecs encode differently from the composed pipeline")

    // composed ADC: per-sub partials CAST(round(dot * 1e9) AS BIGINT), summed
    val qsubs = subs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("sub"), col("sv").as("qv"))
    val refAdc = fused.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("eid"), explode(expr("sequence(0, 7)")).as("sub"), col("codes"))
      .select(col("eid"), col("sub"), expr("codes[sub]").as("code"))
      .join(broadcast(cb), Seq("sub", "code"))
      .join(broadcast(qsubs), Seq("sub"))
      .select(col("qid"), col("eid"),
        round(vector_dot(col("qv"), col("cent")) * 1e9).cast("long").as("p9"))
      .groupBy(col("qid"), col("eid")).agg(sum(col("p9")).as("ref_adc9"))
    val fusedAdc = fused.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("eid"), col("codes"), col("cbn"))
      .crossJoin(broadcast(fused.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("ev").as("qv"))))
      .select(col("qid"), col("eid"), pq_adc9(col("qv"), col("codes"), col("cbn")).as("adc9"))
    val adcMismatch = fusedAdc.join(refAdc, Seq("qid", "eid"), "full_outer")
      .filter(col("adc9").isNull || col("ref_adc9").isNull || col("adc9") =!= col("ref_adc9"))
      .count()
    assert(adcMismatch == 0L, s"$adcMismatch (qid, eid) pairs score differently from the composed ADC")
  }

  test("pq kernels: NaN embeddings survive and non-multiple dims slice like the composed form") {
    import spark.implicits._
    // codebook: 2 subs x 2 codes of width 4, one row each via the same
    // nested shape the queries build
    val cbn = Seq((
      Seq(Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0))),
          Seq((0L, Seq(0.0, 0.0, 1.0, 0.0)), (1L, Seq(0.0, 0.0, 0.0, 1.0))))
    )).toDF("cbn")
    // a NaN component must not crash the kernel (Spark's round passes
    // NaN through; BigDecimal.valueOf would throw) AND must encode to
    // the SAME codes as the composed max_by pipeline, whose struct
    // ordering ranks NaN fits greatest and breaks NaN-ties to the
    // lowest code. Sub 0's slice carries the NaN, so every code's dot
    // is NaN (NaN*0 = NaN) -> all-NaN fits -> lowest code 0; sub 1 is
    // clean arithmetic -> code 1 (fit -0.4 beats -0.6).
    val nanVec = Seq(Tuple1(Seq(Double.NaN, 1.0, 0.5, 0.25, 0.9, 0.1, 0.2, 0.3))).toDF("v")
    val enc = nanVec.crossJoin(cbn)
      .select(pq_encode(col("v"), col("cbn")).as("codes"))
      .collect()(0).getSeq[Long](0)
    assert(enc == Seq(0L, 1L), s"NaN sub must argmax like max_by(struct): $enc")
    // the composed pipeline itself, over the same NaN vector and
    // codebook — the equality the scaladoc claims, asserted not assumed
    val composed = nanVec.crossJoin(cbn)
      .select(explode(expr("sequence(0, 1)")).as("sub"), col("v"), col("cbn"))
      .select(col("sub"), expr("slice(v, sub * 4 + 1, 4)").as("sv"),
        explode(expr("cbn[sub]")).as("e"))
      .select(col("sub"), col("e._1").as("code"),
        (vector_dot(col("sv"), col("e._2")) * 2.0 -
          vector_dot(col("e._2"), col("e._2"))).as("fit"))
      .groupBy(col("sub"))
      .agg(expr("max_by(code, struct(round(fit, 6) AS f, -code AS nc))").as("code"))
      .orderBy(col("sub")).collect().map(_.getLong(1)).toSeq
    assert(enc == composed, s"kernel $enc != composed $composed on NaN fits")
    // a 6-dim vector against the width-4 codebook: sub widths come from
    // the CODEBOOK (fixed 4-wide windows at offsets 0 and 4, the last
    // slice short) — not dim/nSub = 3, which would shift every offset
    val shortVec = Seq(Tuple1(Seq(0.0, 1.0, 0.0, 0.0, 1.0, 0.0))).toDF("v")
    val enc2 = shortVec.crossJoin(cbn)
      .select(pq_encode(col("v"), col("cbn")).as("codes"))
      .collect()(0).getSeq[Long](0)
    // sub 0 sees (0,1,0,0) -> code 1 exactly; sub 1 sees (1,0) padded
    // short -> fits are 2*1-1=1 (code 0: cent (0,0,1,0) dot (1,0)=0 ->
    // fit -1) vs code 1: cent (0,0,0,1) dot (1,0)=0 -> fit -1: tie ->
    // lowest code 0
    assert(enc2 == Seq(1L, 0L), s"codebook-width slicing: $enc2")
  }
}
