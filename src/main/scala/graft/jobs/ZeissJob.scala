package graft.jobs

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.core.Volume
import graft.io.zarr.ZarrIO
import graft.operators.Pyramid
import graft.sources.czi.CziSource

/** End-to-end CZI -> multiscale OME-Zarr job (reference orchestration O1/O3,
  * `zeiss_job.py:103-226` + `czi_to_zarr.py:457-658`).
  *
  * What disappears relative to the reference: static round-robin node
  * partitioning (P1/P2, `zeiss_job.py:29-60` + SLURM scripts) — the Spark
  * scheduler owns task placement; the `aws s3 sync` subprocess (K6) —
  * outputs write straight to any Hadoop-FS URI including `s3a://`; the
  * GIL-driven thread tuning (X7) — tasks are the parallelism unit.
  */
object ZeissJob {

  /** Job settings mirroring the reference's pydantic model
    * (`models.py:23-81`, defaults preserved). */
  final case class Settings(
      inputSource: String,
      outputDirectory: String,
      s3Location: Option[String] = None,
      chunkSize: Array[Int] = Array(128, 128, 128),
      scaleFactor: Array[Int] = Array(2, 2, 2),
      downsampleLevels: Int = 4,
      compressorLevel: Int = 3,
      compress: Boolean = true,
      targetSizeMb: Long = 19200, // reference models.py:77-81 job default
      // engine knob (no reference analogue — the reference converts stacks
      // strictly sequentially): how many stack conversions the driver
      // submits concurrently. Overlapping jobs keeps executors busy
      // through each stack's task tail.
      maxConcurrentStacks: Int = 4)

  final case class JobResponse(statusCode: Int, message: String)

  // Strict JSON mapper — the default for every settings source except the
  // inline CLI arg. @file and the env fallback keep the reference's strict
  // pydantic-style contract (a malformed production settings file fails
  // loudly instead of being silently "repaired").
  private val M = new ObjectMapper()

  // Inline-CLI-only lenience (round 11): `sbt "runMain ... {\"k\":\"v\"}"`
  // never reaches the JVM intact — sbt's command tokenizer strips the
  // escaped double quotes, so the documented inline form had been
  // un-runnable from an sbt shell. Single quotes DO survive both bash
  // and sbt, so the INLINE parser accepts {'k':'v'} (and unquoted field
  // names) in addition to strict JSON. Scoped to a second mapper so the
  // lenience cannot leak into @file/env parsing (round-11 ADVICE).
  private val MInline = new ObjectMapper()
  MInline.configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_SINGLE_QUOTES, true)
  MInline.configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_UNQUOTED_FIELD_NAMES, true)

  /** Parse settings from strict JSON (the `--job-settings` CLI contract,
    * `zeiss_job.py:230-245`) — used by the @file and env paths. */
  def parseSettings(json: String): Settings = parseWith(M, json)

  /** Inline-CLI variant: additionally accepts single-quoted strings and
    * unquoted field names (shell/sbt-tokenizer survivors). */
  def parseSettingsInline(json: String): Settings = parseWith(MInline, json)

  private def parseWith(mapper: ObjectMapper, json: String): Settings = {
    val n = mapper.readTree(json)
    def arr3(node: JsonNode, default: Array[Int]): Array[Int] =
      if (node == null) default
      else { val it = node.elements(); Array(it.next().asInt, it.next().asInt, it.next().asInt) }
    Settings(
      inputSource = n.get("input_source").asText(),
      outputDirectory = n.get("output_directory").asText(),
      s3Location = Option(n.get("s3_location")).filter(!_.isNull).map(_.asText()),
      chunkSize = arr3(n.get("chunk_size"), Array(128, 128, 128)),
      scaleFactor = arr3(n.get("scale_factor"), Array(2, 2, 2)),
      downsampleLevels = if (n.has("downsample_levels")) n.get("downsample_levels").asInt else 4,
      compressorLevel = if (n.has("compressor_level")) n.get("compressor_level").asInt else 3,
      targetSizeMb = if (n.has("target_size_mb")) n.get("target_size_mb").asLong else 19200L,
      maxConcurrentStacks =
        if (n.has("max_concurrent_stacks")) n.get("max_concurrent_stacks").asInt else 4)
  }

  /** Voxel resolution from acquisition.json: first tile's scale transform,
    * stored [x,y,z] on disk, returned [z,y,x] (`zeiss_job.py:62-87`). */
  def voxelResolution(acquisitionPath: String, conf: Configuration = graft.core.HadoopConf.get): Seq[Double] = {
    val p = new Path(acquisitionPath)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val node = try M.readTree(in) finally in.close()
    val transforms = node.get("tiles").get(0).get("coordinate_transformations")
    val it = transforms.elements()
    var scale: JsonNode = null
    while (it.hasNext && scale == null) {
      val t = it.next()
      if (t.get("type").asText() == "scale") scale = t.get("scale")
    }
    require(scale != null, "acquisition.json has no scale transformation")
    val xyz = (0 until 3).map(i => scale.get(i).asDouble())
    Seq(xyz(2), xyz(1), xyz(0))
  }

  /** Discover stacks: the .czi files under `input_source/SPIM`, sorted
    * for deterministic ordering (`zeiss_job.py:42-60`). */
  def discoverStacks(inputSource: String, conf: Configuration = graft.core.HadoopConf.get): Seq[String] = {
    val dir = new Path(s"$inputSource/SPIM")
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).filter(_.isFile)
      .map(_.getPath.toString).filter(_.endsWith(".czi")).sorted.toSeq
  }

  /** Convert one CZI stack to a multiscale OME-Zarr
    * (`czi_stack_zarr_writer`, `czi_to_zarr.py:457-658`). */
  def convertStack(spark: SparkSession, cziPath: String, outRoot: String,
                   settings: Settings, voxelZyx: Seq[Double],
                   channelName: String = "ch0"): Volume = {
    val stackName = new Path(cziPath).getName.stripSuffix(".czi")
    // JPEG-XR containment: swap in the transcode sidecar (or fail with
    // the remediation) before any executor opens the file
    val srcPath = CziSource.resolveInput(cziPath)
    val (vol, idx) = CziSource.volume(srcPath, stackName, settings.chunkSize)
    // the reference assumes one channel per file (utils.py:355); we accept
    // c>1 and emit one omero channel entry per channel
    val chNames =
      if (vol.shape(1) == 1L) Seq(channelName)
      else (0 until vol.shape(1).toInt).map(i => s"ch$i")
    // slab scan materializes chunkDepth x Y x X per task — fine for typical
    // planes, not for stitched volumes; switch to the shuffle-assembled
    // scan when a slab would exceed ~1 GiB (reference X3 vs Spark-scale)
    val slabBytes = vol.chunk(2).toLong * vol.shape(3) * vol.shape(4) * vol.dtype.itemSize
    val level0 = (if (slabBytes <= (1L << 30)) CziSource.scan(spark, srcPath, vol, idx)
                  else graft.sources.czi.CziSourceShuffled.scan(spark, srcPath, vol, idx))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    ZarrIO.writeMetadata(outRoot, vol, settings.downsampleLevels, voxelZyx,
      settings.scaleFactor.toSeq, chNames, Some(Seq(0.0, 0.0, 0.0)),
      compressed = settings.compress, clevel = settings.compressorLevel)
    // superblock-sized write batching (reference X4, target_size_mb)
    ZarrIO.writeChunksBatched(level0, outRoot, vol, settings.targetSizeMb,
      settings.compressorLevel, settings.compress)
    // write level k, then drop level k-1's cache — peak storage is two
    // adjacent levels, not the whole pyramid (reference X6 economy)
    var prev: org.apache.spark.sql.Dataset[graft.core.ZarrChunk] = level0
    Pyramid.levels(spark, level0, vol, settings.downsampleLevels, settings.scaleFactor)
      .foreach { case (lvlVol, ds) =>
        ZarrIO.writeChunksBatched(ds, outRoot, lvlVol, settings.targetSizeMb,
          settings.compressorLevel, settings.compress)
        prev.unpersist()
        prev = ds
      }
    prev.unpersist()
    vol
  }

  /** Copy the input's `derivatives/` folder to the output location —
    * reference `_upload_derivatives_folder` (`zeiss_job.py:187-205`).
    * The reference gates this on partition 0; with Spark there is one
    * driver, so it simply runs once before conversion. Hadoop FS
    * replaces the `aws s3 sync` subprocess. */
  def uploadDerivatives(inputSource: String, outRoot: String,
                        conf: Configuration = graft.core.HadoopConf.get): Boolean = {
    val src = new Path(s"$inputSource/derivatives")
    val srcFs = src.getFileSystem(conf)
    if (!srcFs.exists(src)) return false
    val dst = new Path(s"$outRoot/derivatives")
    val dstFs = dst.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(srcFs, src, dstFs, dst,
      false /* deleteSource */, true /* overwrite */, conf)
  }

  /** Run the whole job: discover -> convert each stack -> respond
    * (`run_job`, `zeiss_job.py:207-226`). */
  def run(spark: SparkSession, settings: Settings): JobResponse = {
    val t0 = System.nanoTime()
    val stacks = discoverStacks(settings.inputSource)
    if (stacks.isEmpty)
      return JobResponse(400, s"no CZI stacks under ${settings.inputSource}/SPIM")
    val voxel =
      try voxelResolution(s"${settings.inputSource}/acquisition.json")
      catch { case _: Throwable => Seq(1.0, 1.0, 1.0) }
    val out = settings.s3Location.getOrElse(settings.outputDirectory)
    uploadDerivatives(settings.inputSource, out)
    convertAll(spark, stacks, out, settings, voxel)
    val secs = (System.nanoTime() - t0) / 1e9
    JobResponse(200, f"converted ${stacks.size} stacks in $secs%.1f s")
  }

  /** Convert stacks with up to `maxConcurrentStacks` conversions in
    * flight: a directory of many small stacks would otherwise leave most
    * executors idle during each stack's task tail. Each conversion runs
    * in its own scheduler pool (effective under FAIR scheduling, harmless
    * under FIFO) so one huge stack cannot starve the others. Failures
    * propagate after all in-flight conversions settle. */
  def convertAll(spark: SparkSession, stacks: Seq[String], out: String,
                 settings: Settings, voxelZyx: Seq[Double]): Seq[Volume] = {
    val par = math.max(1, math.min(settings.maxConcurrentStacks, stacks.size))
    // shared store-root metadata lands exactly once, on the driver, BEFORE
    // any concurrent conversion can race a create/truncate of the same path
    ZarrIO.writeStoreRoot(out)
    if (par == 1) stacks.map(czi => convertStack(spark, czi, out, settings, voxelZyx))
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val futs = stacks.map { czi =>
          scala.concurrent.Future {
            spark.sparkContext.setLocalProperty("spark.scheduler.pool",
              new Path(czi).getName.stripSuffix(".czi"))
            try convertStack(spark, czi, out, settings, voxelZyx)
            finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
          }
        }
        // settle EVERY conversion before surfacing the first failure: a
        // fail-fast Await would return while sibling conversions keep
        // writing into the output from live pool threads
        val settled = scala.concurrent.Await.result(
          scala.concurrent.Future.traverse(futs)(f =>
            f.map(Right(_): Either[Throwable, Volume])
              .recover { case t => Left(t) }),
          scala.concurrent.duration.Duration.Inf)
        settled.collectFirst { case Left(t) => t }.foreach(throw _)
        settled.collect { case Right(v) => v }
      } finally pool.shutdown()
    }
  }

  /** Settings from environment variables — the reference CLI's THIRD
    * config source (`zeiss_job.py` `job_entrypoint`: no `--job-settings`
    * and no `--config-file` falls through to `ZeissJobSettings()`, whose
    * pydantic-settings base reads `TRANSFORMATION_JOB_<FIELD>` env vars).
    * String fields ride verbatim; list/numeric fields parse as JSON,
    * mirroring pydantic-settings' complex-field handling. Implemented by
    * synthesizing the equivalent settings JSON and reusing
    * [[parseSettings]], so all three sources share one validation path. */
  def settingsFromEnv(env: Map[String, String] = sys.env): Settings = {
    val stringFields = Set("input_source", "output_directory", "s3_location")
    val fields = Seq("input_source", "output_directory", "s3_location",
      "chunk_size", "scale_factor", "downsample_levels", "compressor_level",
      "target_size_mb", "max_concurrent_stacks")
    val root = M.createObjectNode()
    fields.foreach { f =>
      env.get("TRANSFORMATION_JOB_" + f.toUpperCase).foreach { v =>
        if (stringFields(f)) root.put(f, v)
        else root.set[JsonNode](f, M.readTree(v))
      }
    }
    require(root.has("input_source") && root.has("output_directory"),
      "env-var settings require TRANSFORMATION_JOB_INPUT_SOURCE and " +
        "TRANSFORMATION_JOB_OUTPUT_DIRECTORY")
    parseSettings(M.writeValueAsString(root))
  }

  def main(args: Array[String]): Unit = {
    // three config sources, in the reference's precedence
    // (zeiss_job.py:234-242): inline JSON (joined — shells/sbt may split
    // it), @file, or — with no args at all — TRANSFORMATION_JOB_* env vars
    val settings =
      if (args.isEmpty) settingsFromEnv()
      else if (args(0).startsWith("@"))
        parseSettings(new String(
          Files.readAllBytes(Paths.get(args(0).drop(1))), "UTF-8"))
      else parseSettingsInline(args.mkString(" "))
    val spark = graft.Spark.session(appName = "graft-zeiss-job")
    val resp = run(spark, settings)
    println(s"""{"status_code":${resp.statusCode},"message":"${resp.message}"}""")
    spark.stop()
  }
}
