package graft.queries

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.Spark

/** The shared materialized-relation layer is load-bearing for eight
  * query families (tri counts, co-purchase edges, jacpairs, dup-CC
  * labels, Lloyd model, IVF assignment, LSH candidates, bigram types)
  * — its contract gets direct tests, not just integration coverage:
  * build-once per (JVM, tag), tag isolation, multi-relation
  * completeness, concurrent first-touch serialization, a partial
  * (no _SUCCESS) artifact triggering a rebuild instead of a bad read,
  * content-fingerprint freshness under a persistent root, commit-
  * without-overwrite, and a scheme-qualified Hadoop-FS root. */
class MaterializedSpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-materialized-test")

  test("build runs once per tag; every consumer reads the artifact") {
    val builds = new AtomicInteger(0)
    def consume(): Long = Materialized.rel(spark, "mspec-once") {
      builds.incrementAndGet()
      spark.range(100).toDF("id")
    }.count()
    assert((1 to 5).map(_ => consume()).forall(_ == 100L))
    assert(builds.get() == 1, "the build closure must run exactly once per JVM")
    // the cold build is observable for the artifact census
    val rec = Materialized.buildLog.filter(_.tag == "mspec-once")
    assert(rec.length == 1 && rec.head.buildSec > 0 && rec.head.names == Seq("rel"))
  }

  test("different tags are isolated") {
    val a = Materialized.rel(spark, "mspec-iso-a") { spark.range(3).toDF("id") }
    val b = Materialized.rel(spark, "mspec-iso-b") { spark.range(7).toDF("id") }
    assert(a.count() == 3 && b.count() == 7)
    // dirTag separates same-basename dirs with different paths
    assert(Materialized.dirTag(spark, "/x/sf0.1") != Materialized.dirTag(spark, "/y/sf0.1"))
  }

  test("rels: all named relations materialize from one build") {
    val builds = new AtomicInteger(0)
    def consume() = Materialized.rels(spark, "mspec-multi", Seq("small", "big")) {
      builds.incrementAndGet()
      Seq(spark.range(2).toDF("id"), spark.range(20).toDF("id"))
    }
    val first = consume()
    assert(first(0).count() == 2 && first(1).count() == 20)
    val again = consume()
    assert(again(0).count() == 2 && again(1).count() == 20)
    assert(builds.get() == 1)
    // a build returning the wrong arity fails loudly, never writes less
    val e = intercept[IllegalArgumentException] {
      Materialized.rels(spark, "mspec-arity", Seq("x", "y")) {
        Seq(spark.range(1).toDF("id"))
      }
    }
    assert(e.getMessage.contains("returned 1"), e.getMessage)
  }

  test("concurrent first touch: one build, everyone reads complete data") {
    val builds = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    val counts = (1 to 8).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          start.await()
          Materialized.rel(spark, "mspec-race") {
            builds.incrementAndGet()
            Thread.sleep(100) // widen the race window
            spark.range(50).toDF("id")
          }.count()
        }
      })
    }
    start.countDown()
    val got = counts.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(got.forall(_ == 50L), got.toString)
    assert(builds.get() == 1, s"racing consumers must share one build, saw ${builds.get()}")
  }

  test("persistent scratch root: artifacts land under it, survive, and are reused without a rebuild") {
    val root = Files.createTempDirectory("mspec-root").toString
    graft.Scratch.withRoot(root) {
      val builds = new AtomicInteger(0)
      def consume(): Long = Materialized.rel(spark, "mspec-persist") {
        builds.incrementAndGet()
        spark.range(11).toDF("id")
      }.count()
      assert(consume() == 11 && builds.get() == 1)
      // the artifact is where a cluster deployment expects it
      val dir = graft.Scratch.dir("mv-mspec-persist")
      assert(dir.startsWith(root), s"$dir not under $root")
      assert(new java.io.File(s"$dir/rel.parquet", "_SUCCESS").exists())
      // Materialized keeps NO in-JVM built-ness memo — every call gates
      // on the _SUCCESS files — so this repeat call exercises exactly
      // the code path a SECOND driver JVM takes against the same root:
      // artifact present and complete => zero builds
      assert(consume() == 11 && builds.get() == 1, "warm reuse must not rebuild")
    }
    // dirs created inside the window are evicted with it: the same tag
    // re-resolves under the current (temp) mode — the r15 ADVICE hazard
    assert(!graft.Scratch.dir("mv-mspec-persist").startsWith(root))
    assert(!graft.Scratch.dir("mspec-back-to-temp").startsWith(root))
  }

  test("in-place corpus mutation under a persistent root rebuilds: the content fingerprint keys the artifact") {
    val root = Files.createTempDirectory("mspec-fproot").toString
    val corpus = Files.createTempDirectory("mspec-corpus")
    Files.write(corpus.resolve("t.parquet"), Array.fill[Byte](64)(1))
    graft.Scratch.withRoot(root) {
      val builds = new AtomicInteger(0)
      def consume(): Long = Materialized.rel(spark,
          s"mspec-fp-${Materialized.dirTag(spark, corpus.toString)}") {
        builds.incrementAndGet()
        spark.range(5).toDF("id")
      }.count()
      assert(consume() == 5 && builds.get() == 1)
      assert(consume() == 5 && builds.get() == 1, "unchanged corpus: warm reuse")
      // regenerate the corpus IN PLACE at the same path (size changes)
      Files.write(corpus.resolve("t.parquet"), Array.fill[Byte](128)(2))
      assert(consume() == 5 && builds.get() == 2,
        "a mutated corpus must get a fresh artifact key, never a stale artifact")
    }
  }

  test("persistent root on a non-default Hadoop scheme: build, commit, and warm reuse through mock://") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock.impl", classOf[graft.io.MockSchemeFs].getName)
    val local = Files.createTempDirectory("mspec-mockroot").toString
    graft.Scratch.withRoot("mock://" + local) {
      val builds = new AtomicInteger(0)
      def consume(): Long = Materialized.rel(spark, "mspec-mock") {
        builds.incrementAndGet()
        spark.range(13).toDF("id")
      }.count()
      assert(consume() == 13 && builds.get() == 1)
      val dir = graft.Scratch.dir("mv-mspec-mock")
      assert(dir.startsWith("mock:/"), dir) // hadoop Path normalizes "//" to "/"
      // probe + commit went through the Hadoop FS API: the artifact is
      // complete under the scheme and warm reuse needs no rebuild
      assert(new java.io.File(s"$local/graft-mv-mspec-mock/rel.parquet/_SUCCESS").exists())
      assert(consume() == 13 && builds.get() == 1, "warm reuse through the scheme")
    }
  }

  test("fingerprint: stable on an unchanged dir; moves on grow, add, and touch; 'absent' on a missing dir") {
    val dir = Files.createTempDirectory("mspec-fpr")
    Files.write(dir.resolve("a.bin"), Array.fill[Byte](32)(1))
    val f0 = Materialized.fingerprint(spark, dir.toString)
    assert(f0 == Materialized.fingerprint(spark, dir.toString), "repeat call must be stable")
    // byte-length change
    Files.write(dir.resolve("a.bin"), Array.fill[Byte](33)(1))
    val f1 = Materialized.fingerprint(spark, dir.toString)
    assert(f1 != f0, "growing a file must move the fingerprint")
    // file-count change
    Files.write(dir.resolve("b.bin"), Array.fill[Byte](1)(2))
    val f2 = Materialized.fingerprint(spark, dir.toString)
    assert(f2 != f1, "adding a file must move the fingerprint")
    // mtime-only change (same count, same bytes)
    assert(dir.resolve("a.bin").toFile.setLastModified(
      dir.resolve("a.bin").toFile.lastModified() + 60000L))
    val f3 = Materialized.fingerprint(spark, dir.toString)
    assert(f3 != f2, "a newer mtime must move the fingerprint")
    assert(Materialized.fingerprint(spark, dir.toString + "-nope") == "absent")
  }

  test("fingerprint alias edge (ADVICE r16): a same-length same-mtime in-place rewrite still rebuilds") {
    // the r16 fingerprint (count+bytes+max-mtime) provably aliased this:
    // rewrite a file with the SAME byte length and restore the old mtime
    // within one listing granularity tick. The r17 content sample of the
    // newest file's head/tail bytes must move the key anyway.
    val root = Files.createTempDirectory("mspec-aliasroot").toString
    val corpus = Files.createTempDirectory("mspec-aliascorpus")
    val f = corpus.resolve("t.parquet")
    Files.write(f, Array.fill[Byte](256)(1))
    val mtime = f.toFile.lastModified()
    graft.Scratch.withRoot(root) {
      val builds = new AtomicInteger(0)
      def consume(): Long = Materialized.rel(spark,
          s"mspec-alias-${Materialized.dirTag(spark, corpus.toString)}") {
        builds.incrementAndGet()
        spark.range(6).toDF("id")
      }.count()
      assert(consume() == 6 && builds.get() == 1)
      // in-place regeneration: same length, same mtime, different bytes
      Files.write(f, Array.fill[Byte](256)(2))
      assert(f.toFile.setLastModified(mtime))
      assert(f.toFile.lastModified() == mtime && Files.size(f) == 256)
      assert(consume() == 6 && builds.get() == 2,
        "a same-shape rewrite must not serve a stale artifact (content sample)")
    }
  }

  test("fingerprint: per-file fold separates same-aggregate layouts; sample reads head and tail") {
    // ADVICE r17: the separability proof must run within ONE dir —
    // a two-dir variant passes via the differing path terms alone.
    // Swap two files' LENGTHS in place (mtimes pinned, newest file —
    // the sampled one — untouched): a field-separable fold XORs the
    // same two len terms either way and aliases; the bound fold moves.
    val d1 = Files.createTempDirectory("mspec-fpa")
    Files.write(d1.resolve("a.bin"), Array.fill[Byte](10)(1))
    Files.write(d1.resolve("b.bin"), Array.fill[Byte](30)(1))
    // newest-by-mtime tiebreak lands on c.bin so the content sample
    // cannot rescue the swap below
    Files.write(d1.resolve("c.bin"), Array.fill[Byte](7)(9))
    val m = 1700000000000L
    for (n <- Seq("a.bin", "b.bin"))
      assert(d1.resolve(n).toFile.setLastModified(m))
    assert(d1.resolve("c.bin").toFile.setLastModified(m + 60000L))
    val before = Materialized.fingerprint(spark, d1.toString)
    Files.write(d1.resolve("a.bin"), Array.fill[Byte](30)(1))
    Files.write(d1.resolve("b.bin"), Array.fill[Byte](10)(1))
    for (n <- Seq("a.bin", "b.bin"))
      assert(d1.resolve(n).toFile.setLastModified(m))
    assert(Materialized.fingerprint(spark, d1.toString) != before,
      "a same-dir length swap (mtimes pinned) must move the fingerprint")
    // and the same for an mtime swap (lengths pinned)
    val e1 = Files.createTempDirectory("mspec-fpm")
    Files.write(e1.resolve("a.bin"), Array.fill[Byte](10)(1))
    Files.write(e1.resolve("b.bin"), Array.fill[Byte](10)(2))
    Files.write(e1.resolve("c.bin"), Array.fill[Byte](7)(9))
    assert(e1.resolve("a.bin").toFile.setLastModified(m))
    assert(e1.resolve("b.bin").toFile.setLastModified(m + 1000L))
    assert(e1.resolve("c.bin").toFile.setLastModified(m + 60000L))
    val mBefore = Materialized.fingerprint(spark, e1.toString)
    assert(e1.resolve("a.bin").toFile.setLastModified(m + 1000L))
    assert(e1.resolve("b.bin").toFile.setLastModified(m))
    assert(Materialized.fingerprint(spark, e1.toString) != mBefore,
      "a same-dir mtime swap (lengths pinned) must move the fingerprint")
    // tail sensitivity on a >4 KiB newest file: flip one byte past the
    // head window, keep length + mtime
    val big = Files.createTempDirectory("mspec-fpt")
    val bf = big.resolve("x.bin")
    val bytes = Array.fill[Byte](10000)(3)
    Files.write(bf, bytes)
    assert(bf.toFile.setLastModified(m))
    val f0 = Materialized.fingerprint(spark, big.toString)
    bytes(9000) = 4
    Files.write(bf, bytes)
    assert(bf.toFile.setLastModified(m))
    assert(Materialized.fingerprint(spark, big.toString) != f0,
      "a tail-byte rewrite must move the fingerprint")
  }

  test("fingerprintScope: dirTag calls straddling an in-place mutation key ONE consistent artifact set") {
    // VERDICT r17 #4: without a scope, two dirTag calls straddling an
    // in-place corpus mutation key inconsistent artifacts inside one
    // composed build. SparkEntry.queries opens a fingerprintScope per
    // build; within it the fingerprint is memoized per dir.
    val corpus = Files.createTempDirectory("mspec-scope")
    val f = corpus.resolve("t.bin")
    Files.write(f, Array.fill[Byte](64)(1))
    def mutate(): Unit = {
      Files.write(f, Array.fill[Byte](128)(2))
      assert(f.toFile.setLastModified(f.toFile.lastModified() + 60000L))
    }
    val (s1, s2) = Materialized.fingerprintScope {
      val a = Materialized.dirTag(spark, corpus.toString)
      mutate()
      (a, Materialized.dirTag(spark, corpus.toString))
    }
    assert(s1 == s2, "within one build scope the key must be consistent")
    // outside a scope the very next consumer sees the mutation
    val after = Materialized.dirTag(spark, corpus.toString)
    assert(after != s1, "a new build must see the mutated corpus")
    // and a FRESH scope re-reads (memo does not leak across builds)
    val fresh = Materialized.fingerprintScope(Materialized.dirTag(spark, corpus.toString))
    assert(fresh == after)
    // nested scopes share the outermost memo
    Materialized.fingerprintScope {
      val outer = Materialized.dirTag(spark, corpus.toString)
      assert(Materialized.fingerprintScope(Materialized.dirTag(spark, corpus.toString)) == outer)
    }
    // SparkEntry wires the scope: a query function invoked through the
    // public map observes memoized fingerprints (smoke: it builds at all)
    assert(graft.SparkEntry.queries.contains("q1_agg"))
  }

  test("a partial artifact (no _SUCCESS) is rebuilt, not trusted") {
    val builds = new AtomicInteger(0)
    def consume(): Long = Materialized.rel(spark, "mspec-partial") {
      builds.incrementAndGet()
      spark.range(9).toDF("id")
    }.count()
    assert(consume() == 9 && builds.get() == 1)
    // simulate a crashed writer: data present, commit marker gone
    val dir = graft.Scratch.dir("mv-mspec-partial")
    val marker = new java.io.File(s"$dir/rel.parquet", "_SUCCESS")
    assert(marker.exists())
    assert(marker.delete())
    assert(consume() == 9)
    assert(builds.get() == 2, "a missing _SUCCESS must trigger a rebuild")
  }

  test("per-name commit: a committed relation is never rewritten when a sibling rebuilds") {
    val builds = new AtomicInteger(0)
    def consume() = Materialized.rels(spark, "mspec-keep", Seq("a", "b")) {
      builds.incrementAndGet()
      Seq(spark.range(3).toDF("id"), spark.range(4).toDF("id"))
    }
    consume()
    assert(builds.get() == 1)
    val dir = graft.Scratch.dir("mv-mspec-keep")
    // sentinel inside the COMPLETE artifact 'a' (dot-prefixed: invisible
    // to parquet readers) — any overwrite/rename of 'a' would destroy it
    val sentinel = new java.io.File(s"$dir/a.parquet/.sentinel")
    assert(sentinel.createNewFile())
    // crash 'b': remove its marker so the tag reads incomplete
    assert(new java.io.File(s"$dir/b.parquet/_SUCCESS").delete())
    val again = consume()
    assert(builds.get() == 2)
    assert(again(0).count() == 3 && again(1).count() == 4)
    assert(sentinel.exists(),
      "a committed artifact must survive a sibling's rebuild untouched")
    // no staging residue leaks after commit
    val leftovers = new java.io.File(dir).listFiles().filter(_.getName.startsWith(".staging"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }
}
