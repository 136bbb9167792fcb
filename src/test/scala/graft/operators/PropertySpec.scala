package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-style invariants over the ordered operators (SURVEY §5.2):
  * shape laws that must hold for ANY window/batch/split/resample
  * parameters. Parameters come from seeded ScalaCheck generators (the
  * scalatest-scalacheck bridge isn't in the offline cache, so sampling
  * is explicit and deterministic).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private lazy val base = (1 to 120).map(i => (i.toLong, i * 10L, math.sin(i).abs))
    .toDF("id", "t", "v").cache()

  test("sliding windows: count == N-W+1, all size W (any W)") {
    samples(Gen.choose(1, 15), 6).foreach { w =>
      val win = WindowOps.slidingWindow(base, col("v"), w, Seq.empty, Seq("id"))
      assert(win.count() == 120 - w + 1, s"W=$w")
      assert(win.filter(size(col("win")) =!= w).count() == 0, s"W=$w")
    }
  }

  test("fixed batches: every batch full, count == floor(N/B)*B (any B)") {
    samples(Gen.choose(1, 50), 6).foreach { b =>
      val batched = WindowOps.fixedBatches(base, b, Seq.empty, Seq("id"))
      assert(batched.count() == (120 / b) * b, s"B=$b")
      assert(batched.groupBy("batch_id").count()
        .filter(col("count") =!= b).count() == 0, s"B=$b")
    }
  }

  test("prefix split: partitions all rows, train ids precede eval ids (any fractions)") {
    samples(Gen.zip(Gen.choose(1, 8), Gen.choose(1, 8)), 6)
      .filter { case (a, b) => a + b < 10 }
      .foreach { case (a, b) =>
        val (fa, fb) = (a / 10.0, b / 10.0)
        val sp = WindowOps.prefixSplit(base, (fa, fb, 1.0 - fa - fb), Seq.empty, Seq("id"))
        assert(sp.count() == 120)
        val maxTrain = sp.filter($"split" === "train").agg(max("id")).head()
        val minEval = sp.filter($"split" === "eval").agg(min("id")).head()
        if (!maxTrain.isNullAt(0) && !minEval.isNullAt(0))
          assert(maxTrain.getLong(0) < minEval.getLong(0), s"f=($fa,$fb)")
      }
  }

  test("upsample multiplies rows by the ratio onto an aligned grid (any divisor)") {
    Seq(2, 3, 4, 6).foreach { ratio =>
      val orig = 60L
      val step = orig / ratio
      val ts = base.select(col("id"), timestamp_micros(col("t") * 6000000L).as("ts"), col("v"))
      val up = Resample.upsampleRepeat(ts, "ts", orig, step)
      assert(up.count() == 120L * ratio, s"ratio=$ratio")
      assert(up.filter(col("ts_up") % step =!= 0).count() == 0, s"ratio=$ratio")
    }
  }

  test("components: driver union-find equals distributed fixpoint on random graphs (any shape)") {
    import graft.dedup.Dedup
    // random sparse graphs across the shapes that stress the two paths
    // differently: long chains (diameter), stars (degree skew), random
    // id scatter (hash distribution). The fast path and the fixpoint
    // must agree EXACTLY on every one.
    val gGraph = for {
      n <- Gen.choose(2, 60)
      density <- Gen.choose(1, 3)
      edges <- Gen.listOfN(n * density,
        Gen.zip(Gen.choose(0L, 3 * n.toLong), Gen.choose(0L, 3 * n.toLong)))
    } yield edges
    samples(gGraph, 5).filter(_.nonEmpty).foreach { edges =>
      val pairs = edges.toDF("id_a", "id_b")
      val fast = Dedup.clusterLabels(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.clusterLabelsWithRounds(pairs)._1.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == dist, s"edges=${edges.take(20)}...")
      // canonical is always the component min: it labels itself
      assert(fast.values.forall(c => fast.get(c).contains(c)))
    }
  }

  test("intervalOverlap == cross-join reference for ANY random intervals and bucket width") {
    val ivGen = Gen.listOfN(25, Gen.zip(Gen.choose(-50L, 100L), Gen.choose(-5L, 40L)))
    samples(Gen.zip(ivGen, ivGen, Gen.choose(1L, 30L)), 5).foreach { case (ls, rs, w) =>
      val l = ls.zipWithIndex.map { case ((lo, span), i) => (i.toLong, lo, lo + span) }
        .toDF("a_id", "a_lo", "a_hi")
      val r = rs.zipWithIndex.map { case ((lo, span), i) => (100L + i, lo, lo + span) }
        .toDF("b_id", "b_lo", "b_hi")
      val got = RangeJoin.intervalOverlap(l, r, "a_lo", "a_hi", "b_lo", "b_hi", w)
        .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      // nonempty-interval guard: the bare predicate alone miscounts
      // empty intervals as overlapping
      val want = l.crossJoin(r)
        .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi")
          && col("a_hi") > col("a_lo") && col("b_hi") > col("b_lo"))
        .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      assert(got.sorted == want.sorted, s"w=$w")
      assert(got.size == got.distinct.size, s"w=$w: a pair met in more than one bucket")
    }
  }

  test("selfJoinLev1 == cross-join levenshtein reference for ANY random short strings") {
    val strGen = Gen.listOfN(30, Gen.choose(0, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    samples(strGen, 5).foreach { ss =>
      val df = ss.zipWithIndex.map { case (s0, i) => (i.toLong, s0) }.toDF("id", "name")
      val got = FuzzyJoin.selfJoinLev1(df, "id", "name")
        .select("id_a", "id_b", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = df.select(col("id").as("id_a"), col("name").as("na"))
        .crossJoin(df.select(col("id").as("id_b"), col("name").as("nb")))
        .filter(col("id_a") < col("id_b") && levenshtein(col("na"), col("nb")) <= 1)
        .select(col("id_a"), col("id_b"), levenshtein(col("na"), col("nb")).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"strings=${ss.take(10)}...")
    }
  }

  test("normalize then denormalize is identity up to fp (any affine input)") {
    samples(Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0.5, 50.0)), 5)
      .foreach { case (shift, scale) =>
        val df = base.select((col("v") * scale + shift).as("x"))
        val stats = FeatureSpace.adapt(df, Seq(FeatureSpace.Normalized("x")))
        val cs = stats.numeric("x")
        val err = df.select(
            abs(FeatureSpace.expand(FeatureSpace.Normalized("x"), stats).head._2
              * math.sqrt(cs.varPop) + cs.mean - col("x")).as("e"))
          .agg(max("e")).head().getDouble(0)
        assert(err < 1e-9 * math.max(1.0, math.abs(shift) + scale), s"shift=$shift scale=$scale")
      }
  }

  test("dedup_window chain semantics on random inputs match a driver-side reference (any horizon)") {
    // random (key, ts) events with deliberate clustering so horizons
    // actually split chains; the reference walks each key's sorted
    // history applying the idle-TTL rule directly
    val rnd = new scala.util.Random(4242)
    val events = (1 to 400).map { i =>
      val key = rnd.nextInt(12).toLong
      val typ = if (rnd.nextBoolean()) "a" else "b"
      val ts = rnd.nextInt(40) * 25L + rnd.nextInt(7) // microseconds, clustered
      (key, typ, i.toLong, ts)
    }
    val df = spark.createDataFrame(
      events.map { case (u, t, id, us) => (u, t, id,
        java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000)))
      }).toDF("user_id", "event_type", "event_id", "ts")
    samples(Gen.choose(0L, 300L), 6).foreach { h =>
      val got = graft.queries.RelQueries.dedupWindowFrame(df, h)
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      val want = events.groupBy(e => (e._1, e._2)).flatMap { case ((u, t), es) =>
        val ordered = es.map(e => (e._4, e._3)).sorted // (ts, id)
        val kept = scala.collection.mutable.ListBuffer.empty[(Long, Long)] // (firstId, nSupp)
        var prevTs = Long.MinValue
        var started = false
        ordered.foreach { case (ts, id) =>
          if (!started || ts - prevTs > h) { kept += ((id, 0L)); started = true }
          else { val (fid, n) = kept.last; kept(kept.size - 1) = (fid, n + 1) }
          prevTs = ts // re-arm on EVERY occurrence, kept or dropped
        }
        kept.map { case (fid, n) => (u, t, fid, n) }
      }.toSet
      assert(got == want, s"horizon=$h")
    }
  }
}
