package graft.tools

import org.apache.spark.sql.functions._

/** Same-JVM A/B of the v8 encode projection's cast shape (dev tool,
  * r20): (a) transform(embedding, x -> CAST(x AS DOUBLE)) — interpreted
  * HOF, bars whole-stage codegen; (b) native cast to array<double> —
  * codegen'd. Alternating passes; each pass = encode every corpus
  * vector with the real nested-codebook literal and count.
  *
  * usage: runMain graft.tools.ProbeV8Cast <sfDir> [reps]
  */
object ProbeV8Cast {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = graft.Spark.session(appName = "graft-probe-v8cast")
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val subDim = 8
    val cb = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("cv"))
      .groupBy(col("label"), (col("pos") / subDim).cast("int").as("sub"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("cent"))
      .select(col("sub"), col("label").cast("long").as("code"), col("cent"))
    // same nesting codebookLiteral uses, rebuilt inline (dev-only copy)
    val cbn = cb.groupBy()
      .agg(collect_list(struct(col("sub"), col("code"), col("cent"))).as("flat"))
      .select(expr(
        "transform(array_sort(array_distinct(transform(flat, x -> x.sub))), " +
        "s -> array_sort(transform(filter(flat, x -> x.sub = s), " +
        "x -> struct(x.code AS code, x.cent AS cent))))").as("cbn"))
    import org.apache.spark.sql.types._
    val raw = cbn.head()
      .getAs[scala.collection.Seq[scala.collection.Seq[org.apache.spark.sql.Row]]](0)
    val ext = raw.map(_.map(r => org.apache.spark.sql.Row(r.getLong(0), r.getSeq[Double](1))))
    val dt = ArrayType(ArrayType(StructType(Seq(
      StructField("code", LongType, nullable = false),
      StructField("cent", ArrayType(DoubleType, containsNull = false), nullable = false))),
      containsNull = false), containsNull = false)
    val cbL = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(ext, dt))

    def timeIt(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"[v8cast] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val hof = e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ev"))
      .select(col("vec_id"), graft.functions.pq_encode(col("ev"), cbL).as("codes"))
    val nat = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("ev"))
      .select(col("vec_id"), graft.functions.pq_encode(col("ev"), cbL).as("codes"))
    // plain cast WITHOUT the encode, to separate cast cost from kernel cost
    val hofNoK = e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ev"))
    val natNoK = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("ev"))
    timeIt("warmup hof")(hof); timeIt("warmup nat")(nat)
    for (_ <- 1 to reps) {
      timeIt("hof+encode")(hof)
      timeIt("nat+encode")(nat)
      timeIt("hof only  ")(hofNoK)
      timeIt("nat only  ")(natNoK)
    }
    spark.stop()
  }
}
