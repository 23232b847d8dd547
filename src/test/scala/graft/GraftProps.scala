package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.ops.{Dedup, Sessionize, TextOps}
import graft.nhl.Ingest

/** Property-based pins (SURVEY.md §5 engine test plan): idempotence,
  * set semantics, metric bounds — over generated inputs. Spark jobs
  * per case are expensive, so each property runs a reduced number of
  * generated cases. */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val word = Gen.oneOf(
    "the", "fox", "dog", "spark", "plan", "data", "row", "key",
    "join", "scan", "hash", "sort")
  private val text = Gen.chooseNum(3, 20)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val docs = Gen.chooseNum(2, 12).flatMap(n =>
    Gen.listOfN(n, text)).map(ts =>
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") })

  property("exactDedup is idempotent") = forAllNoShrink(docs) { rows =>
    val df = rows.toDF("doc_id", "text", "lang")
    val once = Dedup.exactDedup(df)
    val twice = Dedup.exactDedup(once)
    once.count() == twice.count() &&
      once.exceptAll(twice).count() == 0
  }

  property("exactDedup keeps one row per distinct normalized text") =
    forAllNoShrink(docs) { rows =>
      val df = rows.toDF("doc_id", "text", "lang")
      val expect = rows.map(r => TestNorm.normalize(r._2)).distinct.size
      Dedup.exactDedup(df).count() == expect
    }

  property("jaccard is within [0,1] and symmetric") =
    forAllNoShrink(text, text) { (t1, t2) =>
      val df = Seq((t1, t2)).toDF("a", "b")
        .select(
          TextOps.jaccard(TextOps.shingles(col("a")),
            TextOps.shingles(col("b"))).as("j_ab"),
          TextOps.jaccard(TextOps.shingles(col("b")),
            TextOps.shingles(col("a"))).as("j_ba"))
      val r = df.head()
      val (jab, jba) = (r.getDouble(0), r.getDouble(1))
      (jab.isNaN && jba.isNaN) ||
        (jab == jba && jab >= 0.0 && jab <= 1.0)
    }

  property("union+distinct == set union") =
    forAllNoShrink(Gen.listOf(Gen.chooseNum(0, 20)),
      Gen.listOf(Gen.chooseNum(0, 20))) { (xs, ys) =>
      val got = xs.toDF("x").union(ys.toDF("x")).distinct().count()
      got == (xs.toSet ++ ys.toSet).size
    }

  property("sessionize conserves events and orders bounds") =
    forAllNoShrink(Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 3L),
        Gen.chooseNum(0L, 4L * 3600 * 1000000L))))) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, us), i) =>
        (i.toLong, u, us * 1000L, 1.0) } // ns
      val df = rows.toDF("event_id", "user_id", "ts", "value")
      val sess = Sessionize.sessionize(df).collect()
      val conserved = sess.map(_.getAs[Long]("n_events")).sum == evs.size
      val ordered = sess.forall(r =>
        r.getAs[Long]("session_start_us") <= r.getAs[Long]("session_end_us"))
      conserved && ordered
    }

  property("timeToSecs agrees with timeCanon round-trip") =
    forAllNoShrink(Gen.chooseNum(0, 23), Gen.chooseNum(0, 59)) { (h, m) =>
      val df = Seq(s"$h:$m").toDF("t").select(
        Ingest.timeToSecs(col("t")).as("s1"),
        Ingest.timeToSecs(Ingest.timeCanon(col("t"))).as("s2"))
      val r = df.head()
      r.getInt(0) == h * 3600 + m * 60 && r.getInt(0) == r.getInt(1)
    }

  /** Scala-side replica of TextOps.normalized for the oracle. */
  private object TestNorm {
    def normalize(s: String): String =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
  }

  // ---- native-kernel equivalence over adversarial random inputs ----
  // (testdata cross-checks live in OpsSpec; these hit empties, unicode,
  // repeats, and single-token rows that real corpora rarely produce)

  private val weirdToken = Gen.oneOf(
    Gen.oneOf("", " ", "a", "0", "ü", "漢字", "\"", "a b"),
    Gen.alphaNumStr.map(_.take(6)),
    Gen.listOfN(2, Gen.oneOf("é", "ß", "λ", "中")).map(_.mkString))
  private val tokenArrays = Gen.chooseNum(0, 15)
    .flatMap(n => Gen.listOfN(n, weirdToken))

  property("ShingleSet native == HOF on weird token arrays") =
    forAllNoShrink(Gen.listOfN(6, tokenArrays)) { arrs =>
      val df = arrs.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDF("id", "toks")
      // shingles/shinglesHof take text; drive both through the same
      // token column via the underlying pieces
      val got = df.select(col("id"),
        graft.functions.ShingleSet.shingle_set(col("toks"), 3).as("n"),
        array_distinct(when(size(col("toks")) >= 3,
          (0 until 3).map(k => slice(col("toks"), lit(k + 1),
            size(col("toks")) - 2)).reduce((acc, s) =>
            zip_with(acc, s, (x, y) => concat(x, lit(" "), y))))
          .otherwise(array().cast("array<string>"))).as("h"))
        .collect()
      got.forall(r => r.getSeq[String](1) == r.getSeq[String](2))
    }

  property("SimHashSig native == aggregate fallback on weird tokens") =
    forAllNoShrink(Gen.listOfN(5, Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, weirdToken)))) { arrs =>
      // join tokens with '' so TextOps.tokens can't re-split them
      val rows = arrs.zipWithIndex.map { case (a, i) =>
        (i.toLong, a.map(_.replaceAll("\\s", "_")).mkString(" ")) }
      val df = rows.toDF("doc_id", "text")
      val a = Dedup.simhashSignatures(df, native = true).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = Dedup.simhashSignatures(df, native = false).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      a == b
    }

  property("DotLongs native == HOF on random long vectors") =
    forAllNoShrink(Gen.listOfN(6, Gen.chooseNum(0, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000000L, 1000000L))))) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "q")
      val got = df.select(col("id"),
        graft.ops.Similarity.dotScaled(col("q"), col("q")).as("n"),
        graft.ops.Similarity.dotScaledHof(col("q"), col("q")).as("h"))
        .collect()
      got.forall(r => r.getLong(1) == r.getLong(2))
    }

  // random points/intervals (negative keys, empty overlaps, inverted
  // intervals excluded by construction lo <= hi) over random widths
  private val rjCase = for {
    pts <- Gen.listOfN(12, Gen.chooseNum(-200L, 200L))
    ivs <- Gen.listOfN(8, for {
      lo <- Gen.chooseNum(-200L, 180L)
      span <- Gen.chooseNum(0L, 60L)
    } yield (lo, lo + span))
    w <- Gen.oneOf(1L, 7L, 32L, 1000L)
  } yield (pts, ivs, w)

  property("interval-overlap join == naive overlap join, no duplicate pairs") =
    forAllNoShrink(rjCase) { case (pts, ivs, w) =>
      // reuse the generator: points become degenerate [p, p+span]
      val a = pts.zipWithIndex.map { case (v, i) => (i.toLong, v, v + 25L) }
        .toDF("a_key", "a_lo", "a_hi")
      val b = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("b_key", "b_lo", "b_hi")
      val got = graft.ops.RangeJoin
        .intervalOverlapJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", w)
        .select("a_key", "b_key").as[(Long, Long)].collect().toSeq
      val want = (for {
        (pv, pi) <- pts.zipWithIndex
        ((lo, hi), ii) <- ivs.zipWithIndex
        if pv <= hi && lo <= pv + 25L
      } yield (pi.toLong, ii.toLong))
      got.sorted == want.sorted // Seq compare: duplicates would fail
    }

  property("binned range join == naive non-equi join for any bin width") =
    forAllNoShrink(rjCase) { case (pts, ivs, w) =>
      val p = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("pid", "p")
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val got = graft.ops.RangeJoin.pointInInterval(p, "p", iv, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = (for {
        (pv, pi) <- pts.zipWithIndex
        ((lo, hi), ii) <- ivs.zipWithIndex
        if pv >= lo && pv <= hi
      } yield (pi.toLong, ii.toLong)).toSet
      got == want
    }

  property("containment bounds: cont >= jaccard, cont(A,A) = 1, cont in [0,1]") =
    forAllNoShrink(text, text) { (t1, t2) =>
      // self-pair plus a generated pair, uncapped so sets are raw
      val df = Seq((1L, t1, "en"), (2L, t2, "en"), (3L, t1, "en"))
        .toDF("doc_id", "text", "lang")
      val cont = Dedup.containmentPairs(df, tau = 0.0, dfCap = 1000000L,
        blockCol = "lang").collect()
      val jac = Dedup.ngramJaccardPairs(df, tau = 1e-9, blockCol = "lang")
        .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3)))
        .toMap
      cont.forall { r =>
        val (a, b) = (r.getLong(1), r.getLong(2))
        val (ca, cb) = (r.getDouble(3), r.getDouble(4))
        val inRange = ca >= 0 && ca <= 1 && cb >= 0 && cb <= 1
        val geJ = jac.get((a, b)).forall(j => ca >= j - 1e-12 && cb >= j - 1e-12)
        val selfDup = if (a == 1L && b == 3L) ca == 1.0 && cb == 1.0 else true
        inRange && geJ && selfDup
      }
    }

  // Kirsch–Mitzenmacher permHash: the Spark long arithmetic must
  // equal arbitrary-precision (h1 + i*h2) mod (2^61-1) — i.e. no
  // signed-64 overflow anywhere in the audited ranges (h1 < 2^60,
  // h2 < 2^56, i < 64)
  private val kmCase = for {
    h1 <- Gen.chooseNum(0L, (1L << 60) - 1)
    h2 <- Gen.chooseNum(0L, (1L << 56) - 1)
    i <- Gen.chooseNum(0, 63)
  } yield (h1, h2, i)

  property("permHash == BigInt modular arithmetic on the audited ranges") =
    forAllNoShrink(Gen.listOfN(8, kmCase)) { cases =>
      val df = cases.toDF("h1", "h2", "i")
        .select(col("h1"), col("h2"), col("i"),
          TextOps.permHash(col("i"), col("h1"), col("h2")).as("g"))
      df.collect().forall { r =>
        val want = (BigInt(r.getLong(0)) + BigInt(r.getInt(2)) * BigInt(r.getLong(1)))
          .mod(BigInt(TextOps.MinHashMod))
        BigInt(r.getLong(3)) == want
      }
    }
}
