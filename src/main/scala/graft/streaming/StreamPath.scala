package graft.streaming

import org.apache.spark.sql.SparkSession

/** Source-path resolution for the file-stream cold start one step colder
  * than an empty directory: the ingest directory NOT YET CREATED at
  * stream-definition time (a deploy racing its data producer).
  *
  * Spark's `DataSource.sourceSchema` rejects a non-glob path that does
  * not exist even when the user supplies the schema — but glob paths
  * skip the existence check and are re-listed every micro-batch. So a
  * missing directory streams through the `dir`-slash-star glob (it
  * matches the directory's files as soon as the producer creates them),
  * while an existing directory keeps the plain path: identical listing
  * semantics, and an EXISTING empty directory must not become an empty
  * glob, which the source rejects at start. */
private[streaming] object StreamPath {
  def resolve(spark: SparkSession, dir: String): String = {
    val exists = try {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    } catch { case _: Throwable => false }
    if (exists) dir else s"$dir/*"
  }

  /** The shared file-stream reader the three corpus readers build on:
    * schema pinned, optional per-trigger file cap (maxFilesPerTrigger >
    * 0 bounds each micro-batch, oldest files first — StreamGate's
    * multi-batch replay and a production ingest's back-pressure), path
    * resolved through the cold-start glob rule above. One definition so
    * the next source option cannot be added to one reader and silently
    * diverge the families' replay behavior. */
  def parquetStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int): org.apache.spark.sql.DataFrame = {
    val reader0 = spark.readStream.schema(schema)
    val reader = if (maxFilesPerTrigger > 0)
      reader0.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader0
    reader.parquet(resolve(spark, dir))
  }
}
