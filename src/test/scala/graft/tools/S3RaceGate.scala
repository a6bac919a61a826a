package graft.tools

import java.net.{HttpURLConnection, URL}
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.Spark
import graft.io.s3.S3RestFileSystem

/** REAL two-process proof of the Materialized commit protocol on a
  * NON-ATOMIC-RENAME store (VERDICT r17 ask #1): the local-FS
  * [[RaceGate]] proves the staging+rename protocol where rename IS
  * atomic, which a 100-TB shared root realistically is not — it's an
  * object store, where Hadoop rename is per-key copy+delete and the
  * rename proof does not transfer. `Materialized.commitProtocol`
  * therefore refuses rename-commit on such schemes and commits through
  * a pointer object created with S3 conditional writes
  * ([[graft.io.AtomicCreate]]); THIS gate proves that protocol with two
  * genuinely separate JVMs racing one live (moto) S3 endpoint through
  * the repo's own [[S3RestFileSystem]]:
  *
  *   - both processes exit clean and read VALUE-EQUAL relations
  *     (rows + checksum match each other and the deterministic truth);
  *   - exactly one committed artifact: the `rel.commit` pointer names
  *     ONE attempt dir holding `_SUCCESS`, exactly 3 part files, and
  *     ONE write-job UUID (a mixed file set is impossible: data files
  *     are never renamed, each attempt dir is writer-unique);
  *   - the loser's attempt dir is dropped (never referenced by any
  *     pointer) — no residue beyond the committed attempt;
  *   - a fresh reader (this process) sees the same values over HTTP.
  *
  * Iterations alternate a clean first touch with PRE-PLANTED GARBAGE —
  * a pointer-less `rel-attempt-deadbeef` dir (a crashed writer's
  * leftover). The protocol must IGNORE it (it is indistinguishable
  * from a live writer's in-flight attempt, so nothing may clear it)
  * and it must still be present, untouched, after the race.
  *
  * Usage: sbt "Test/runMain graft.tools.S3RaceGate [iterations] [outPath]"
  * Writes RACE_GATE_S3.json; nonzero exit on any violated invariant
  * (including moto being unavailable — this gate exists to be run).
  */
object S3RaceGate {

  private def httpCode(method: String, url: String): Int = {
    val c = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(2000)
    c.setReadTimeout(5000)
    c.setRequestProperty("Authorization",
      "AWS4-HMAC-SHA256 Credential=graft/20260101/us-east-1/s3/aws4_request, " +
      "SignedHeaders=host, Signature=0000")
    try c.getResponseCode finally c.disconnect()
  }

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val iterations = if (args.nonEmpty) args(0).toInt else 4
    val outPath = if (args.length > 1) args(1) else "RACE_GATE_S3.json"
    val cp = sys.props("java.class.path")
    val addOpens = RaceGate.currentAddOpens

    // live moto S3: ephemeral port + bind-race retry (the S3RetrySpec
    // protocol); unavailability is a FAILURE here, not a skip — the
    // whole point of this gate is that it ran
    require(new ProcessBuilder("python3", "-c", "import moto.server")
      .start().waitFor() == 0, "python3/moto is required for S3RaceGate")
    var motoPort = -1
    var moto: Process = null
    var motoUp = false
    var attempt = 0
    while (!motoUp && attempt < 3) {
      attempt += 1
      motoPort = freePort()
      moto = new ProcessBuilder("python3", "-m", "moto.server",
          "-H", "127.0.0.1", "-p", motoPort.toString)
        .redirectErrorStream(true)
        .redirectOutput(new java.io.File(s"/tmp/moto-race-gate-$attempt.log"))
        .start()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!motoUp && System.nanoTime() < deadline && moto.isAlive) {
        motoUp = try { httpCode("GET", s"http://127.0.0.1:$motoPort/"); true }
                 catch { case _: Throwable => Thread.sleep(250); false }
      }
      if (!motoUp) { moto.destroy(); moto.waitFor() }
    }
    require(motoUp, "moto S3 server failed to start")
    val endpoint = s"http://127.0.0.1:$motoPort"
    val bucket = "graft-race"
    require(httpCode("PUT", s"$endpoint/$bucket") == 200, "bucket create failed")

    val s3Props = Seq(
      s"-Dspark.hadoop.fs.s3r.impl=${classOf[S3RestFileSystem].getName}",
      s"-Dspark.hadoop.fs.s3r.endpoint=$endpoint")
    val s3Conf = {
      val c = new Configuration(false)
      c.set("fs.s3r.impl", classOf[S3RestFileSystem].getName)
      c.set("fs.s3r.endpoint", endpoint)
      c
    }
    val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
      appName = "graft-s3-race-gate")
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3r.impl", classOf[S3RestFileSystem].getName)
    spark.sparkContext.hadoopConfiguration.set("fs.s3r.endpoint", endpoint)
    val expSum = RaceWriter.expectedSum
    var allPass = true
    try {
      val results = (1 to iterations).map { iter =>
        val root = s"s3r://$bucket/race-root-$iter"
        val tag = "race-tag"
        val fs = FileSystem.newInstance(java.net.URI.create(s"s3r://$bucket/"), s3Conf)
        val mvDir = new Path(s"$root/graft-mv-$tag")
        val garbage = iter % 2 == 0
        if (garbage) {
          // a crashed writer's pointer-less attempt: the protocol must
          // ignore it (no pointer ever names it) and must NOT clear it —
          // it is indistinguishable from a live writer's in-flight attempt
          val junk = new Path(mvDir, "rel-attempt-deadbeef")
          val o = fs.create(new Path(junk, "part-00000-junk-c000.snappy.parquet"), true)
          o.write(Array.fill[Byte](128)(7)); o.close()
        }
        val barrier = Files.createTempDirectory(s"s3race-$iter").resolve("go")
        val readyLatch = new CountDownLatch(2)
        val (p1, o1) = RaceGate.launch(cp, addOpens, root, tag,
          barrier.toString, "A", readyLatch, s3Props)
        val (p2, o2) = RaceGate.launch(cp, addOpens, root, tag,
          barrier.toString, "B", readyLatch, s3Props)
        require(readyLatch.await(180, TimeUnit.SECONDS), "writers never got READY")
        Files.write(barrier, "go".getBytes("UTF-8"))
        require(p1.waitFor(300, TimeUnit.SECONDS) && p2.waitFor(300, TimeUnit.SECONDS),
          "a writer hung past the deadline")
        val (w1, w2) = (o1(), o2())

        // committed-artifact invariants, checked from a THIRD process
        // through its own S3 FileSystem instance
        val ptr = new Path(mvDir, "rel.commit")
        val ptrExists = fs.exists(ptr)
        var committedName = ""
        var successOk = false
        var parts = Vector.empty[String]
        var uuids = Vector.empty[String]
        if (ptrExists) {
          val in = fs.open(ptr, 1024)
          val b = new Array[Byte](fs.getFileStatus(ptr).getLen.toInt)
          in.readFully(0, b); in.close()
          committedName = new String(b, "UTF-8")
          val attemptDir = new Path(mvDir, committedName)
          successOk = fs.exists(new Path(attemptDir, "_SUCCESS"))
          val children = fs.listStatus(attemptDir).map(_.getPath.getName).toVector
          parts = children.filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
          val uuidRe = "part-\\d+-([0-9a-f-]{36})-c\\d+".r
          uuids = parts.flatMap(n => uuidRe.findFirstMatchIn(n).map(_.group(1))).distinct
        }
        val children = fs.listStatus(mvDir).map(_.getPath.getName).toVector
        val attempts = children.filter(_.startsWith("rel-attempt-"))
          .filterNot(_ == "rel-attempt-deadbeef")
        val residue = children.filter(n =>
          n.startsWith(".staging-") || n.startsWith(".trash-") ||
          n == "rel.parquet" || n == "_temporary")
        val junkIntact = !garbage ||
          fs.exists(new Path(mvDir, "rel-attempt-deadbeef/part-00000-junk-c000.snappy.parquet"))
        val fresh = spark.read.parquet(new Path(mvDir, committedName).toString)
          .selectExpr("count(1) AS n", "sum(h) AS s").collect()(0)
        val valuesOk = Seq(w1, w2).forall(w =>
          w.rows == RaceWriter.Rows && w.sum == expSum) &&
          fresh.getLong(0) == RaceWriter.Rows && fresh.getLong(1) == expSum
        val pass = w1.exit == 0 && w2.exit == 0 && ptrExists && successOk &&
          parts.length == 3 && uuids.length == 1 &&
          attempts == Vector(committedName) && residue.isEmpty &&
          junkIntact && valuesOk
        if (!pass) {
          allPass = false
          System.err.println(s"iter $iter FAILED:\n--- A ---\n${w1.log}\n--- B ---\n${w2.log}\n" +
            s"ptr=$ptrExists name=$committedName success=$successOk parts=$parts uuids=$uuids " +
            s"attempts=$attempts residue=$residue junkIntact=$junkIntact " +
            s"fresh=(${fresh.getLong(0)},${fresh.getLong(1)})")
        }
        fs.close()
        val line = s"""{"iter":$iter,"garbage_planted":$garbage,""" +
          s""""exit":[${w1.exit},${w2.exit}],"built":[${w1.built},${w2.built}],""" +
          s""""rows":[${w1.rows},${w2.rows}],"sums_equal":${w1.sum == w2.sum},""" +
          s""""pointer_present":$ptrExists,"n_part_files":${parts.length},""" +
          s""""n_writer_uuids":${uuids.length},"success_marker":$successOk,""" +
          s""""loser_attempt_dropped":${attempts.length == 1},""" +
          s""""rename_protocol_residue":${residue.length},""" +
          s""""planted_garbage_untouched":$junkIntact,""" +
          s""""fresh_reader_values_ok":$valuesOk,"pass":$pass}"""
        println(line)
        line
      }
      val json =
        s"""{
  "contract": "two driver JVMs racing one persistent root on a LIVE S3 endpoint (non-atomic rename): pointer commit via conditional PUT, single committed attempt, value-equal readers, loser dropped, crashed-writer garbage untouched",
  "store": "moto S3 through graft.io.s3.S3RestFileSystem (s3r://)",
  "protocol": "pointer (Materialized.commitProtocol classifies s3r as non-atomic-rename + AtomicCreate)",
  "rows_per_build": ${RaceWriter.Rows},
  "iterations": $iterations,
  "results": [
    ${results.mkString(",\n    ")}
  ],
  "pass": $allPass
}
"""
      Files.write(Paths.get(outPath), json.getBytes("UTF-8"))
      println(s"S3 RACE GATE: ${if (allPass) "green" else "RED"}")
    } finally {
      moto.destroy()
      spark.stop()
    }
    if (!allPass) sys.exit(1)
  }
}
