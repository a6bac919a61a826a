package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming operators over the embeddings corpus — similarity search at
  * INGEST time: as vectors arrive (a crawl's embedding pass emits them),
  * each is checked for cosine near-duplicates against a static standing
  * corpus before it is admitted. The SemDeDup-at-intake pattern — batch
  * v4/v5's streaming twin.
  */
object EmbeddingStream {

  /** File-source stream over a directory of embeddings parquet; schema
    * from the files' own footers (cold-start fallback to the documented
    * layout, the EventStream/CorpusStream idiom). */
  def read(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    val native = try spark.read.parquet(dir).schema catch {
      case _: org.apache.spark.sql.AnalysisException =>
        org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id BIGINT, embedding ARRAY<FLOAT>, label STRING")
    }
    StreamPath.parquetStream(spark, dir, native, maxFilesPerTrigger)
  }

  private def dot(a: Column, b: Column): Column =
    graft.functions.vector_dot(a, b)

  /** The 16-bit RHP-LSH signature (v5's planes — md5-derived, so batch
    * and stream compute the IDENTICAL bits) plus 4x4-bit band keys,
    * entirely row-local: the arriving vector never shuffles to be
    * signed. */
  private def banded(vecs: DataFrame, idCol: String): DataFrame = {
    val sig = (0 until 16).map { b =>
      when(round(dot(col("embedding"),
        typedLit(graft.queries.SimilarityOps.planes(b).toSeq)), 6) >= 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    vecs.select(col(idCol), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"), sig.as("sig"))
      .select(col(idCol), col("embedding"), col("nrm"),
        explode(expr("sequence(0, 3)")).as("band"), col("sig"))
      .select(col(idCol), col("embedding"), col("nrm"), col("band"),
        expr("shiftright(sig, band * 4) & 15").as("bkey"))
  }

  /** Streaming embedding near-dup detection against a STATIC corpus:
    * arriving vectors sign row-locally (identical planes to batch v5),
    * candidates come from a stream-static equi-join on (band, bkey)
    * against the corpus's precomputed bucket table, and the exact
    * round-6 cosine (v4's 0.45 default threshold) decides on survivors only — candidate work is
    * bucket-bounded (never arrival x corpus), the v5 scale contract at
    * ingest. Emits one row per (arriving vec, corpus near-dup) with
    * the cosine; dedup across the 4 bands rides `dropDuplicates` on
    * the pair key (streaming state = one row per emitted pair; in
    * production bound it with `withWatermark` +
    * `dropDuplicatesWithinWatermark` once vectors carry an ingest
    * timestamp — the CorpusStream.curationSurvivors note). */
  def neardupAgainst(arrivals: DataFrame, corpus: DataFrame,
      threshold: Double = 0.45): DataFrame = {
    val cb = banded(corpus, "vec_id")
      .select(col("band"), col("bkey"), col("vec_id").as("corpus_id"),
        col("embedding").as("cemb"), col("nrm").as("cnrm"))
    banded(arrivals, "vec_id")
      .join(cb, Seq("band", "bkey"))
      .select(col("vec_id"), col("corpus_id"),
        round(dot(col("embedding"), col("cemb")) / (col("nrm") * col("cnrm")), 6)
          .as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("vec_id", "corpus_id")
  }
}
