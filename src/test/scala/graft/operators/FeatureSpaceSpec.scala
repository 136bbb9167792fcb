package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.FeatureSpace._

class FeatureSpaceSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    (1L, 10.0, 0, "a"), (2L, 20.0, 1, "b"), (3L, 30.0, 2, "a"), (4L, 40.0, 6, "c")
  ).toDF("id", "x", "cat", "s").cache()

  test("adapt computes mean/var_pop/min/max in one pass") {
    val st = FeatureSpace.adapt(df, Seq(Normalized("x"), Rescaled("x")))
    val cs = st.numeric("x")
    assert(cs.mean == 25.0)
    assert(cs.varPop == 125.0)
    assert(cs.min == 10.0 && cs.max == 40.0)
  }

  test("adapt learns sorted string vocab") {
    val st = FeatureSpace.adapt(df, Seq(OneHotString("s")))
    assert(st.vocab("s") == Seq("a", "b", "c"))
  }

  test("adapt rejects a categorical column over the vocabulary cap before collecting") {
    val wide = spark.range(5000).selectExpr("concat('v', id) AS s")
    val err = intercept[IllegalArgumentException] {
      FeatureSpace.adapt(wide, Seq(OneHotString("s")), maxVocab = 100)
    }
    assert(err.getMessage.contains("'s'"))
    assert(err.getMessage.contains("cap of 100"))
    // at the cap it still adapts (exact semantics, not sketch semantics)
    val ok = FeatureSpace.adapt(wide.limit(100), Seq(OneHotString("s")), maxVocab = 100)
    assert(ok.vocab("s").size == 100)
  }

  test("normalize then inverse is identity") {
    val st = FeatureSpace.adapt(df, Seq(Normalized("x")))
    val cs = st.numeric("x")
    val out = df.select(col("x"), FeatureSpace.expand(Normalized("x"), st).head._2.as("nx"))
      .withColumn("back", col("nx") * math.sqrt(cs.varPop) + cs.mean)
      .select(abs(col("back") - col("x")).as("err"))
      .agg(max("err")).head().getDouble(0)
    assert(out < 1e-9)
  }

  test("one-hot int depth-5 expands to 5 indicator columns, OOV all-zero") {
    val cols = FeatureSpace.expand(OneHotInt("cat", 5), FeatureStats(Map.empty, Map.empty))
    assert(cols.map(_._1) == (0 until 5).map(i => s"cat_onehot_$i"))
    val out = df.select(col("id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .orderBy("id").collect()
    assert(out(0).toSeq.drop(1) == Seq(1.0, 0.0, 0.0, 0.0, 0.0))
    assert(out(3).toSeq.drop(1) == Seq(0.0, 0.0, 0.0, 0.0, 0.0)) // cat=6 OOV
  }

  test("apply preserves spec order and keep columns") {
    val specs = Seq(Rescaled("x"), OneHotString("s"))
    val st = FeatureSpace.adapt(df, specs)
    val out = df.select(FeatureSpace.apply(df, specs, st, keep = Seq("id")): _*)
    assert(out.columns.toSeq == Seq("id", "x", "s_onehot_0", "s_onehot_1", "s_onehot_2"))
    val r = out.orderBy("id").head()
    assert(r.getDouble(1) == 0.0) // (10-10)/(40-10)
  }

  test("stats serialize to JSON deterministically") {
    val st = FeatureSpace.adapt(df, Seq(Normalized("x"), OneHotString("s")))
    val j = st.toJson
    assert(j.contains("\"mean\":25.0") && j.contains("\"vocab\":{\"s\":[\"a\",\"b\",\"c\"]}"))
  }

  test("checkStats rejects stats that don't cover the specs (check_normalizer)") {
    val st = FeatureSpace.adapt(df, Seq(Normalized("x")))
    // reusing stats adapted for x against a spec needing y and a vocab
    val e = intercept[IllegalArgumentException] {
      FeatureSpace.checkStats(Seq(Normalized("x"), Rescaled("y"), OneHotString("s")), st)
    }
    assert(e.getMessage.contains("y") && e.getMessage.contains("s"))
    // valid stats pass
    FeatureSpace.checkStats(Seq(Normalized("x")), st)
  }

  test("checkStats flags degenerate stats instead of applying Infinity/NaN columns") {
    val const = Seq((1.0, 1.0), (1.0, 1.0)).toDF("x", "s")
    val st = FeatureSpace.adapt(const, Seq(Normalized("x"), Rescaled("x")))
    val e = intercept[IllegalArgumentException] {
      FeatureSpace.checkStats(Seq(Normalized("x")), st)
    }
    assert(e.getMessage.contains("zero variance"))
    val e2 = intercept[IllegalArgumentException] {
      FeatureSpace.checkStats(Seq(Rescaled("x")), st)
    }
    assert(e2.getMessage.contains("min == max"))
  }
}
