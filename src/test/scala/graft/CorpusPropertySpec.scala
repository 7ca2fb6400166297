package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import org.apache.spark.sql.functions._

import graft.ext.{Bpe, Sampling}
import graft.functions.MinHash

/** ScalaCheck properties over the corpus operators: the invariants
  * that must hold for ARBITRARY inputs, not just the fixtures the
  * example-based specs pin (a permutation that silently drops a
  * position, an order-sensitive signature, or a pair count that
  * misses an overlap class would all pass a single-fixture test).
  */
object CorpusPropertySpec extends Properties("graft-corpus") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = GraftSession.local(4)

  private val idsGen: Gen[List[Long]] = for {
    n <- Gen.choose(1, 120)
    ids <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
  } yield ids.distinct

  property("shuffleShards is a permutation into dense shard slots") =
    Prop.forAll(idsGen, Gen.choose(1, 40), Gen.alphaNumStr.map(_.take(8))) {
      (ids, perShard, seed) =>
        import spark.implicits._
        val got = Sampling.shuffleShards(ids.toDF("id"), "id", perShard, seed)
          .collect()
          .map(r => (r.getLong(0), r.getLong(2) * perShard + r.getLong(3)))
        // every id appears once; positions are exactly 0..N-1
        got.map(_._1).sorted.toSeq == ids.sorted &&
          got.map(_._2).sorted.toSeq == (0L until ids.length.toLong)
    }

  property("minhash signature is order- and duplicate-invariant") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6)))) { toks =>
      import spark.implicits._
      val variants = Seq(
        toks, scala.util.Random.shuffle(toks), toks ++ toks.take(3))
      val sigs = variants.map { v =>
        Seq(Tuple1(v)).toDF("s")
          .select(MinHash.signatureFast(col("s"), 16).as("sig"))
          .head().getSeq[Long](0).toList
      }
      // a minhash is a min over the SET: reordering or repeating
      // elements must not move any of the 16 component minima
      sigs.distinct.length == 1 && sigs.head.length == 16
    }

  property("BPE pair counts equal the naive per-word fold") =
    Prop.forAll(Gen.listOfN(30,
        Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString))) {
      words =>
        import spark.implicits._
        val docs = Seq(Tuple1(words.mkString(" "))).toDF("text")
        val got = Bpe.pairCounts(Bpe.wordCounts(docs, "text"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        val want = words.filter(_.length >= 2)
          .flatMap(w => w.sliding(2))
          .groupBy(identity).map { case (p, xs) => (p, xs.length.toLong) }
        got == want
    }
}
