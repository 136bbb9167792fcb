package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Per-sf recall floors for the ADAPTIVE IVF serving family
  * (`ann_ivf_search` / `ann_ivf_probe2` via `ann_recall`, and the
  * composed `ann_ivf_pq` via `ann_recall_pq`) — the AnnGraphSpec
  * treatment applied to the quantization axis. r19 probed a FIXED cell
  * count and IVF recall decayed with corpus growth (0.12/0.28 at
  * sf0.1); with the √N-cell quantizer and `Similarity.adaptiveNProbe`
  * (probe ∝ cells ⇒ probed fraction ≈ 1/8 constant) the measured
  * recalls are FLAT across scales — these floors fail the suite if a
  * future change reintroduces the fixed-constant-vs-scaling-structure
  * defect.
  */
class AnnIvfAdaptiveSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001",
    "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("adaptive probe budget: nProbe = max(2, ceil(cells/8)), integer-exact") {
    assert(Similarity.adaptiveNProbe(1) == 2)    // floor
    assert(Similarity.adaptiveNProbe(16) == 2)
    assert(Similarity.adaptiveNProbe(17) == 3)   // ceil, not floor div
    assert(Similarity.adaptiveNProbe(32) == 4)   // sf0.001/0.01 cells
    assert(Similarity.adaptiveNProbe(64) == 8)   // sf0.1 cells
    assert(Similarity.adaptiveNProbe(1024) == 128) // probed fraction stays 1/8
  }

  test("IVF recall@5 floors hold at every sf (probe scales with cells; recall must not decay)") {
    // measured r20 (deterministic on this data): 1x budget
    // 0.50/0.46/0.44, 2x budget 0.66/0.60/0.60 across
    // sf0.001/0.01/0.1 — flat where r19's fixed probe decayed to
    // 0.12/0.28. Floors sit just under the weakest measurement so a
    // regression to scale decay (or a quantizer/probe-budget break)
    // fails loudly at whichever sf it appears.
    sfDirs.foreach { dir =>
      val r = graft.SparkEntry.queries("ann_recall")(spark, dir)
      val np = r.agg(min(col("n_probe"))).head().getLong(0)
      val r1x = r.filter(col("n_probe") === np)
        .agg(avg(col("recall"))).head().getDouble(0)
      val r2x = r.filter(col("n_probe") === 2 * np)
        .agg(avg(col("recall"))).head().getDouble(0)
      assert(r1x >= 0.40, s"IVF 1x-budget recall $r1x below 0.40 at $dir")
      assert(r2x >= 0.55, s"IVF 2x-budget recall $r2x below 0.55 at $dir")
      // the dial must actually be a dial: more probes, more recall
      assert(r2x > r1x, s"2x budget $r2x did not beat 1x $r1x at $dir")
    }
  }

  test("IVF-PQ recall@5 floors hold at every sf (the composed index gets the same treatment)") {
    // measured r20: ivfpq 0.50/0.46/0.44 flat (pre-adaptive: 0.56 →
    // 0.34, decaying). adc/rerank are whole-vector PQ without a probe
    // structure — their levels reflect quantization-vs-density, not a
    // probe budget, so only the composed IVFADC path is floor-pinned.
    sfDirs.foreach { dir =>
      val r = graft.SparkEntry.queries("ann_recall_pq")(spark, dir)
        .filter(col("method") === "ivfpq")
        .agg(avg(col("recall"))).head().getDouble(0)
      assert(r >= 0.40, s"IVF-PQ recall $r below 0.40 at $dir")
    }
  }

  test("probe budget follows the quantizer: n_probe in ann_recall equals adaptiveNProbe(cells)") {
    // the serving keys and the measurement key must agree on the
    // operating point, and both must track the learned cell count
    sfDirs.foreach { dir =>
      val cells = graft.queries.SimQueries.graphCents(spark, dir).size
      val want = Similarity.adaptiveNProbe(cells).toLong
      val got = graft.SparkEntry.queries("ann_recall")(spark, dir)
        .agg(min(col("n_probe"))).head().getLong(0)
      assert(got == want, s"n_probe $got != adaptiveNProbe($cells) = $want at $dir")
    }
  }
}
