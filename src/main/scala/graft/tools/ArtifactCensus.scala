package graft.tools

import org.apache.hadoop.fs.Path

import graft.{Spark, SparkEntry}
import graft.queries.Materialized

/** Cold-build census of the [[graft.queries.Materialized]] layer
  * (VERDICT r15 ask #1): the bench headline is steady-state by
  * methodology — `Bench`'s untimed warmup pass absorbs every shared
  * artifact build — so the amortized numbers must ship NEXT TO their
  * cold cost. This main runs every gate query ONCE against a fresh
  * (hermetic, per-JVM temp) scratch root, so every Materialized tag
  * builds exactly once and is recorded by `Materialized.buildLog`,
  * then prices each artifact (build seconds from the log; rows and
  * bytes read from the committed parquet — deferred to census time so
  * the build hot path never pays an extra count job) and writes
  * `ARTIFACTS.json`:
  *
  * {{{
  *   { "sf_dir": "...", "n_artifacts": N, "total_build_sec": S,
  *     "artifacts": [ { "tag": "...", "names": [...], "build_sec": s,
  *                      "rows": r, "bytes": b }, ... ] }
  * }}}
  *
  * Run per-round by `scripts/round_gate.sh`; args: [sfDir] [outPath].
  */
object ArtifactCensus {
  def main(args: Array[String]): Unit = {
    // the f-interpolator formats with the default locale: under a
    // comma-decimal locale "%.3f" would emit invalid JSON (ADVICE r16)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    // HERMETIC BY CONTRACT: the census prices COLD builds against a
    // fresh per-JVM temp root. A persistent root inherited from the
    // environment would run the census warm (0 artifacts, 0 s) AND
    // write gate artifacts into the operator-managed cache (ADVICE
    // r16) — override it here; the empty property disables both the
    // property and env-var root (see graft.Scratch.persistentRoot).
    if (sys.props.get("graft.scratch.root").exists(_.nonEmpty) ||
        sys.env.get("SPARK_GRAFT_SCRATCH_ROOT").exists(_.nonEmpty)) {
      System.err.println("census: ignoring persistent scratch root (cold-build census is hermetic by contract)")
      sys.props("graft.scratch.root") = ""
    }
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val outPath = if (args.length > 1) args(1) else "ARTIFACTS.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Spark.session(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-artifact-census")

    // one pass over the full gate surface: every query that shares a
    // Materialized relation triggers (at most) one cold build per tag
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"census: $name failed: ${e.getMessage}")
      }
    }

    val fsConf = spark.sparkContext.hadoopConfiguration
    val rows = Materialized.buildLog.sortBy(-_.buildSec).map { rec =>
      val fs = new Path(rec.dir).getFileSystem(fsConf)
      var bytes = 0L
      val it = fs.listFiles(new Path(rec.dir), true)
      while (it.hasNext) bytes += it.next().getLen
      val nRows = rec.names.map(n =>
        spark.read.parquet(s"${rec.dir}/$n.parquet").count()).sum
      (rec, nRows, bytes)
    }
    val arts = rows.map { case (rec, r, b) =>
      s"""{"tag":"${rec.tag}","names":[${rec.names.map("\"" + _ + "\"").mkString(",")}],""" +
        f""""build_sec":${rec.buildSec}%.3f,"rows":$r,"bytes":$b}"""
    }.mkString(",\n    ")
    val total = Materialized.buildLog.map(_.buildSec).sum
    val json =
      s"""{
  "sf_dir": "$sfDir",
  "n_artifacts": ${rows.length},
  "total_build_sec": ${f"$total%.3f"},
  "artifacts": [
    $arts
  ]
}
"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
