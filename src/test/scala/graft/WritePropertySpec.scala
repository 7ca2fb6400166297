package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import org.apache.spark.sql.functions._

import graft.operators.{Incremental, MergeWriter}

/** ScalaCheck properties over the write lifecycle (MergeWriter +
  * Incremental) — the carriers of the reference's K2-K7 upsert and
  * F2/F3 watermark semantics, which until now were pinned on example
  * frames only. Randomized batch splits, replays and boundary ties
  * sweep the input space the fixed specs can't.
  *
  * Version values are generated GLOBALLY UNIQUE so the per-key winner
  * is deterministic (the engine's tie-break — updates beat existing
  * at equal version — is pinned separately in MergeWriterSpec).
  */
object WritePropertySpec extends Properties("graft.writes") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = GraftSession.local(4)

  /** (id, ver, payload) rows: small key domain forces cross-batch key
    * collisions; ver is the global index (unique); payload derives
    * from both so winner rows are content-checkable.
    */
  private val rowsGen: Gen[List[(Int, Long, String)]] = for {
    n <- Gen.choose(1, 30)
    ids <- Gen.listOfN(n, Gen.choose(0, 7))
  } yield ids.zipWithIndex.map { case (id, i) =>
    (id, i.toLong, s"p-$id-$i")
  }

  /** Split `rows` into 1-4 contiguous batches at random cut points. */
  private def splitsGen(n: Int): Gen[List[Int]] =
    Gen.choose(0, 3).flatMap(k =>
      Gen.listOfN(k, Gen.choose(1, math.max(1, n - 1))).map(
        _.distinct.sorted))

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-prop-")
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  private def winners(rows: List[(Int, Long, String)]) =
    rows.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }.toSet

  private def readTable(dir: String): Set[(Int, Long, String)] =
    spark.read.parquet(dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet

  private def batchesOf(rows: List[(Int, Long, String)],
      cuts: List[Int]): List[List[(Int, Long, String)]] =
    (0 :: cuts).zip(cuts :+ rows.length).map { case (a, b) =>
      rows.slice(a, b)
    }.filter(_.nonEmpty)

  property("upsert: random batch splits + replays converge on the per-key max-version rows") =
    Prop.forAll(rowsGen, Gen.choose(0L, Long.MaxValue)) { (rows, seed) =>
      import spark.implicits._
      val cuts = splitsGen(rows.length)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
        .getOrElse(Nil)
      val batches = batchesOf(rows, cuts)
      // a replay schedule: after the ordered run, re-apply a
      // pseudo-random subset of earlier batches (stale replays) — with
      // globally unique versions the winners must not move
      val replays = batches.zipWithIndex.filter { case (_, i) =>
        ((seed >>> (i % 60)) & 1L) == 1L
      }.map(_._1)
      val dir = freshDir()
      (batches ++ replays).foreach { b =>
        MergeWriter.upsert(spark, dir, b.toDF("id", "ver", "payload"),
          keys = Seq("id"), versionCols = Seq("ver"))
      }
      readTable(dir) == winners(rows)
    }

  property("upsertPartitioned equals flat upsert when the partition key is key-derived") =
    Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      // day derives from the KEY (the K7 `icao_date` shape): a key's
      // history lives in one partition, so partition-pruned merges see
      // every row the flat merge sees
      def withDay(b: List[(Int, Long, String)]) =
        b.map { case (id, v, p) =>
          (id, v, p, f"2024-01-${1 + id % 5}%02d") }
          .toDF("id", "ver", "payload", "day")
          .withColumn("day", col("day").cast("date"))
      val cuts = rows.length / 2
      val batches = batchesOf(rows, if (cuts >= 1) List(cuts) else Nil)
      val flat = freshDir(); val part = freshDir()
      batches.foreach { b =>
        MergeWriter.upsert(spark, flat, withDay(b),
          keys = Seq("id"), versionCols = Seq("ver"))
        MergeWriter.upsertPartitioned(spark, part, withDay(b),
          keys = Seq("id"), versionCols = Seq("ver"), partCol = "day")
      }
      val f = spark.read.parquet(flat)
        .select("id", "ver", "payload", "day")
      val p = spark.read.parquet(part)
        .select("id", "ver", "payload", "day")
      f.exceptAll(p).isEmpty && p.exceptAll(f).isEmpty
    }

  /** (id, ts) frames with a fat tie domain: ts in [0, 5] guarantees
    * boundary collisions.
    */
  private val srcGen: Gen[List[(Int, Long)]] = for {
    n <- Gen.choose(0, 25)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 99), Gen.choose(0L, 5L)))
  } yield rows.zipWithIndex.map { case ((id, ts), i) => (id * 100 + i, ts) }

  property("aboveWatermark: > and >= are exactly the boundary rows apart; empty target admits all") =
    Prop.forAll(srcGen, Gen.choose(0L, 6L), Gen.choose(0L, Long.MaxValue)) {
      (src, cut, seed) =>
      import spark.implicits._
      val sdf = src.toDF("id", "ts")
      // target = every row below the cut plus a pseudo-random subset
      // of the rows AT the cut — the partially-ingested boundary that
      // makes > vs >= a real choice
      val below = src.filter(_._2 < cut)
      val atCut = src.filter(_._2 == cut).zipWithIndex
        .filter { case (_, i) => ((seed >>> (i % 60)) & 1L) == 1L }
        .map(_._1)
      val tgt = below ++ atCut
      val tdf = tgt.toDF("id", "ts")
      val wm = tgt.map(_._2).maxOption
      val strict = Incremental.aboveWatermark(sdf, tdf, "ts")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val incl = Incremental.aboveWatermark(sdf, tdf, "ts",
          inclusive = true)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val wantStrict = wm match {
        case None => src.toSet // empty target: NULL watermark admits all
        case Some(w) => src.filter(_._2 > w).toSet
      }
      val wantIncl = wm match {
        case None => src.toSet
        case Some(w) => src.filter(_._2 >= w).toSet
      }
      strict == wantStrict && incl == wantIncl &&
        (incl -- strict) == wm.map(w => src.filter(_._2 == w).toSet)
          .getOrElse(Set.empty)
    }

  property("boundary replay equivalence: merged > and >= deltas agree iff the boundary was fully ingested") =
    Prop.forAll(srcGen, Gen.choose(0L, 6L)) { (src, cut) =>
      import spark.implicits._
      // ids are globally unique in srcGen, so the keyed merge of
      // target ∪ delta is just the set union — compute both sides'
      // final tables and compare against all-source
      val sdf = src.toDF("id", "ts")
      val tgt = src.filter(_._2 <= cut) // FULL prefix incl. the boundary
      val tdf = tgt.toDF("id", "ts")
      def mergedWith(inclusive: Boolean): Set[(Int, Long)] = {
        val delta = Incremental.aboveWatermark(sdf, tdf, "ts", inclusive)
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
        tgt.toSet ++ delta // keyed merge on unique ids == union
      }
      // the F2/F3 pipeline invariant: with the boundary fully in the
      // target, strict and inclusive deltas merge to the SAME table
      // (>= re-merges boundary rows, which collapse onto their keys)
      mergedWith(inclusive = false) == src.toSet &&
        mergedWith(inclusive = true) == src.toSet
    }
}
