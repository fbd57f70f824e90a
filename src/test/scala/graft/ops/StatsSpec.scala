package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("corrMatrix recovers perfect, inverted, and degenerate correlation") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toDouble, 2.0 * i + 3, 10.0 - i, 5.0))
      .toDF("x", "y", "z", "c")
    val got = Stats.corrMatrix(df, Seq("x" -> "y", "x" -> "z", "x" -> "c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      ("x", "y", 10L, Some(1.0)),
      ("x", "z", 10L, Some(-1.0)),
      ("x", "c", 10L, None))) // zero-variance side → null, not NaN
  }

  test("gini: 0 on perfect balance, hand value on skew, ties order-invariant") {
    import spark.implicits._
    // perfectly balanced: 3 groups x 4 rows -> gini 0
    val even = (0 until 12).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "g")
    val e = Stats.giniByGroup(even, "g").head()
    assert((e.getLong(0), e.getLong(1), e.getDouble(2)) == ((3L, 12L, 0.0)))
    // counts (1, 1, 2, 4): sorted rank-sum = 1*1 + 2*1 + 3*2 + 4*4 = 25
    //   G = (2*25 - 5*8) / (4*8) = 10/32 = 0.3125 — hand-checked
    val skew = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(4)("d")).zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("id", "g")
    val s = Stats.giniByGroup(skew, "g").head()
    assert((s.getLong(0), s.getLong(1), s.getDouble(2)) == ((4L, 8L, 0.3125)))
    // order-invariance under repartition (the grid form needs no tie-break)
    val again = Stats.giniByGroup(skew.repartition(7), "g").head()
    assert(again.getDouble(2) == 0.3125)
    // near-total concentration pushes toward 1
    val conc = (Seq.fill(97)("big") ++ Seq("x", "y", "z")).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toDF("id", "g")
    assert(Stats.giniByGroup(conc, "g").head().getDouble(2) > 0.7)
  }

  test("corrMatrix matches a hand-computed non-trivial correlation") {
    import spark.implicits._
    // x = 1,2,3,4; y = 1,3,2,4 → r = (4·30−10·10)/((4·30−100)) = 20/√(20·20)… compute
    val xs = Seq(1.0, 2.0, 3.0, 4.0)
    val ys = Seq(1.0, 3.0, 2.0, 4.0)
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(v => v * v).sum
    val syy = ys.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val want = BigDecimal((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Stats.corrMatrix(xs.zip(ys).toDF("x", "y"), Seq("x" -> "y"))
      .head().getDouble(3)
    assert(got == want, s"got $got want $want")
  }

  test("linearFit recovers an exact line and guards zero variance") {
    import spark.implicits._
    val line = (1 to 20).map(i => (i.toDouble, 2.5 * i + 7)).toDF("x", "y")
    val r = Stats.linearFit(line, "x", "y").head()
    assert(r.getLong(0) == 20L)
    assert(r.getDouble(1) == 2.5 && r.getDouble(2) == 7.0 && r.getDouble(3) == 1.0,
      r.toString)
    val flat = (1 to 5).map(i => (1.0, i.toDouble)).toDF("x", "y")
    val f = Stats.linearFit(flat, "x", "y").head()
    assert(f.isNullAt(1) && f.isNullAt(2) && f.isNullAt(3))
  }

  test("chiSquare is zero on independence and counts structural zeros") {
    import spark.implicits._
    // perfectly independent 2×2 (uniform) → chi2 = 0
    val indep = Seq.fill(10)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(10)(("a2", "b2"))
    val r0 = Stats.chiSquare(indep.toDF("a", "b"), "a", "b").head()
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2), r0.getDouble(3)) ==
      ((2L, 2L, 1L, 0.0)))
    // perfect dependence with structural zeros: a1→b1, a2→b2 only;
    // chi2 = n for a 2×2 (here 40) — only reached if empty cells contribute
    val dep = Seq.fill(20)(("a1", "b1")) ++ Seq.fill(20)(("a2", "b2"))
    val r1 = Stats.chiSquare(dep.toDF("a", "b"), "a", "b").head()
    assert(r1.getDouble(3) == 40.0, r1.toString)
    assert(r1.getLong(2) == 1L)
  }

  test("corrMatrix and linearFit use pairwise-complete rows under nulls") {
    import spark.implicits._
    // x=[1,2,3,null], y=[1,2,3,4]: the complete pairs are perfectly linear
    val df = Seq((Some(1.0), Some(1.0)), (Some(2.0), Some(2.0)),
      (Some(3.0), Some(3.0)), (None, Some(4.0))).toDF("x", "y")
    val c = Stats.corrMatrix(df, Seq("x" -> "y")).head()
    assert(c.getLong(2) == 3L && c.getDouble(3) == 1.0, c.toString)
    val f = Stats.linearFit(df, "x", "y").head()
    assert((f.getLong(0), f.getDouble(1), f.getDouble(2)) == ((3L, 1.0, 0.0)))
  }

  test("chiSquare excludes null categories entirely") {
    import spark.implicits._
    val df = Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"),
      ("a1", null), (null, "b1")).toDF("a", "b")
    val r = Stats.chiSquare(df, "a", "b").head()
    // only the 3 fully-keyed rows participate: 2×2 grid, dof 1
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 1L)))
    // ≡ the same data with null rows pre-filtered
    val clean = Stats.chiSquare(
      df.where($"a".isNotNull && $"b".isNotNull), "a", "b").head()
    assert(r.getDouble(3) == clean.getDouble(3))
  }

  test("linearFitBy fits each series independently in one aggregate") {
    import spark.implicits._
    val df = ((1 to 10).map(i => ("up", i.toDouble, 3.0 * i + 1)) ++
      (1 to 10).map(i => ("down", i.toDouble, -2.0 * i + 5)) ++
      (1 to 3).map(_ => ("flat", 4.0, 9.0))).toDF("series", "x", "y")
    val got = Stats.linearFitBy(df, Seq("series"), "x", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got("up") == ((10L, Some(3.0), Some(1.0))))
    assert(got("down") == ((10L, Some(-2.0), Some(5.0))))
    // zero x-variance series → null fit, not a poisoned aggregate
    assert(got("flat") == ((3L, None, None)))
    // matches the ungrouped fit on a single series
    val solo = Stats.linearFit(df.where($"series" === "up"), "x", "y").head()
    assert(solo.getDouble(1) == 3.0 && solo.getDouble(2) == 1.0)
  }

  test("modeBy picks the most frequent value with a lowest-value tie-break") {
    import spark.implicits._
    val df = Seq(
      ("s1", "b"), ("s1", "b"), ("s1", "a"),             // clear winner b
      ("s2", "z"), ("s2", "y"),                          // tie → y (lowest)
      ("s3", null), ("s3", null), ("s3", "only"))        // nulls never win
      .toDF("src", "v")
    val got = Stats.modeBy(df, "src", "v").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map("s1" -> (("b", 2L)), "s2" -> (("y", 1L)),
      "s3" -> (("only", 1L))))
  }

  test("percentRankBy positions values inside their group, ties sharing rank") {
    import spark.implicits._
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 20.0), ("g", 40.0),
      ("solo", 5.0)).toDF("k", "v")
    val got = Stats.percentRankBy(df, "k", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    // ranks over 4 rows: 10→0/3, 20→1/3 (both), 40→3/3; single row → 0
    assert(got == Set(("g", 10.0, 0.0), ("g", 20.0, 1.0 / 3), ("g", 40.0, 1.0),
      ("solo", 5.0, 0.0)), got.toString)
  }

  test("percentRankBy excludes null values instead of ranking them") {
    import spark.implicits._
    // a null value must neither receive a rank nor inflate (n−1) for the
    // real rows: with the null excluded the group ranks over 3 rows, not 4
    val df = Seq(("g", Some(10.0)), ("g", None), ("g", Some(20.0)),
      ("g", Some(40.0))).toDF("k", "v")
    val got = Stats.percentRankBy(df, "k", "v").collect()
      .map(r => (r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set((10.0, 0.0), (20.0, 0.5), (40.0, 1.0)), got.toString)
  }

  test("benford derives first digits through integers and densifies all nine") {
    import spark.implicits._
    // 0.05 → 5 cents → digit 5; 123.45 → digit 1; 9000 → 9; negatives and
    // nulls excluded
    val df = Seq(Some(0.05), Some(123.45), Some(123.45), Some(9000.0),
      Some(-5.0), None).toDF("v")
    val got = Stats.benford(df, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == (1 to 9).toSet)
    assert(got(1) == ((2L, 0.5, 0.301)) && got(5)._1 == 1L && got(9)._1 == 1L)
    assert(got(2)._1 == 0L && got(2)._2 == 0.0) // absent digit densified
    // expectations sum to ~1 and decrease monotonically (Benford shape)
    val exps = (1 to 9).map(got(_)._3)
    assert(math.abs(exps.sum - 1.0) < 0.001 && exps == exps.sorted.reverse)
  }

  test("benford excludes sub-unit amounts below the fixed-point resolution") {
    import spark.implicits._
    // 0.001 at decimals=2 rounds to 0 units (digit '0' — off the spine) and
    // 0.0099 would round-PROMOTE to digit 1; both are excluded so obs_p
    // still sums to 1 over the spine and no digit is invented by rounding
    val df = Seq(0.001, 0.0099, 2.0, 2.0, 7.0).toDF("v")
    val got = Stats.benford(df, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1)._1 == 0L, "rounding must not promote 0.0099 to digit 1")
    assert(got(2) == ((2L, 0.6667)) && got(7) == ((1L, 0.3333)))
    assert(got.values.map(_._1).sum == 3L) // the two sub-unit rows excluded
  }

  test("gini is 0 on equality, approaches 1 under concentration, handles ties") {
    import spark.implicits._
    val equal = Seq.fill(10)(5.0).toDF("v")
    assert(Stats.gini(equal, "v").head().getDouble(1) == 0.0)
    // one holder owns everything: G = (n-1)/n = 0.9 for n=10
    val concentrated = (Seq.fill(9)(0.0) :+ 100.0).toDF("v")
    assert(Stats.gini(concentrated, "v").head().getDouble(1) == 0.9)
    // hand case with ties: x = [1,1,2]: G = 2*(1+2+6)/(3*4) - 4/3 = 1/6
    val ties = Seq(1.0, 2.0, 1.0).toDF("v")
    assert(Stats.gini(ties, "v").head().getDouble(1) == 0.1667)
    // all-zero mass → null, empty → null
    assert(Stats.gini(Seq(0.0, 0.0).toDF("v"), "v").head().isNullAt(1))
    assert(Stats.gini(equal.where($"v" > 99), "v").head().isNullAt(1))
  }

  test("cohenKappa: perfect, chance-level, and degenerate agreement") {
    import spark.implicits._
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("r1", "r2")
    assert(Stats.cohenKappa(perfect, "r1", "r2").head().getDouble(4) == 1.0)
    // hand case: 2x2 with obs [[20,5],[10,15]]: po=0.7, pe=0.5*0.6+0.5*0.4=0.5
    // kappa = 0.2/0.5 = 0.4
    val hand = (Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))).toDF("r1", "r2")
    val h = Stats.cohenKappa(hand, "r1", "r2").head()
    assert(h.getLong(0) == 50L && h.getLong(1) == 2L)
    assert(h.getDouble(2) == 0.7 && h.getDouble(3) == 0.5 && h.getDouble(4) == 0.4)
    // single label on both sides: pe = 1 -> undefined, not perfect
    val degen = Seq.fill(5)(("a", "a")).toDF("r1", "r2")
    assert(Stats.cohenKappa(degen, "r1", "r2").head().isNullAt(4))
    // disjoint label spaces: diagonal 0 AND zero margin overlap -> po=pe=0,
    // kappa 0 (chance level), with the union label space counted
    val disj = Seq(("a", "x"), ("b", "y")).toDF("r1", "r2")
    val dj = Stats.cohenKappa(disj, "r1", "r2").head()
    assert(dj.getLong(1) == 4L && dj.getDouble(4) == 0.0)
  }

  test("aucBinary: perfect separation, chance ties, hand-computed mix") {
    import spark.implicits._
    // perfect: every positive outscores every negative
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("s", "y")
    assert(Stats.aucBinary(perfect, "s", "y").head().getDouble(2) == 1.0)
    // all scores tie -> AUC is exactly 0.5 (the 0.5 * P(=) term)
    val ties = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("s", "y")
    assert(Stats.aucBinary(ties, "s", "y").head().getDouble(2) == 0.5)
    // hand case: pos {0.8, 0.4}, neg {0.6, 0.4}: pairs -> (0.8>0.6)=1,
    // (0.8>0.4)=1, (0.4<0.6)=0, (0.4=0.4)=0.5 -> AUC = 2.5/4
    val hand = Seq((0.8, true), (0.4, true), (0.6, false), (0.4, false))
      .toDF("s", "y")
    val h = Stats.aucBinary(hand, "s", "y").head()
    assert(h.getLong(0) == 2L && h.getLong(1) == 2L && h.getDouble(2) == 0.625)
    // inverted scores flip around 0.5
    val inv = Stats.aucBinary(
      hand.withColumn("s", -org.apache.spark.sql.functions.col("s")), "s", "y").head()
    assert(inv.getDouble(2) == 1.0 - 0.625)
    // single-class input -> null
    val mono = Seq((0.9, true), (0.1, true)).toDF("s", "y")
    assert(Stats.aucBinary(mono, "s", "y").head().isNullAt(2))
    // bucketing at decimals=0 merges 0.4-vs-0.45 into a tie
    val coarse = Seq((0.6, true), (1.4, false)).toDF("s", "y")
    assert(Stats.aucBinary(coarse, "s", "y", decimals = 0).head().getDouble(2) == 0.5)
  }

  test("rocPoints: endpoints, monotonicity, trapezoid area equals aucBinary") {
    import spark.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(org.apache.spark.sql.functions.col("o_totalprice").as("s"),
        (org.apache.spark.sql.functions.col("o_orderstatus") === "F").as("y"))
    val pts = Stats.rocPoints(orders, "s", "y", decimals = -3)
      .orderBy(org.apache.spark.sql.functions.col("score_bucket").desc)
      .collect()
    assert(pts.nonEmpty)
    // final point is (all positives, all negatives) -> (1.0, 1.0)
    assert(pts.last.getDouble(3) == 1.0 && pts.last.getDouble(4) == 1.0)
    // tp/fp cumulative counts never decrease along falling thresholds
    assert(pts.sliding(2).forall { case Array(a, b) =>
      b.getLong(1) >= a.getLong(1) && b.getLong(2) >= a.getLong(2)
    })
    // trapezoid over the EXACT (fp, tp) staircase = Mann-Whitney AUC:
    // area = sum (fp_i - fp_{i-1}) * (tp_i + tp_{i-1}) / (2 P N)
    val (p, n) = (pts.last.getLong(1), pts.last.getLong(2))
    var (prevTp, prevFp, twoArea) = (0L, 0L, BigInt(0))
    pts.foreach { r =>
      twoArea += BigInt(r.getLong(2) - prevFp) * BigInt(r.getLong(1) + prevTp)
      prevTp = r.getLong(1); prevFp = r.getLong(2)
    }
    val area = twoArea.toDouble / (2.0 * p * n)
    val auc = Stats.aucBinary(orders, "s", "y", decimals = -3).head().getDouble(2)
    assert(math.abs(area - auc) < 1e-6, s"trapezoid $area vs auc $auc")
  }

  test("calibrationBins: hand bins, zero-span, null exclusion") {
    import spark.implicits._
    // scores 0..1, bins=2: [0,0.5) -> bin 0, [0.5,1] -> bin 1 (max clamps)
    val df = Seq((0.0, false), (0.2, false), (0.6, true), (1.0, true),
      (0.4, true)).toDF("s", "y")
    val rows = Stats.calibrationBins(df, "s", "y", bins = 2).collect()
    assert(rows.length == 2)
    val b0 = rows(0)
    assert(b0.getInt(0) == 0 && b0.getLong(3) == 3L && b0.getLong(4) == 1L)
    assert(b0.getDouble(5) == math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(b0.getDouble(6) == 0.2) // mean of 0.0, 0.2, 0.4
    val b1 = rows(1)
    assert(b1.getInt(0) == 1 && b1.getLong(3) == 2L && b1.getDouble(5) == 1.0)
    assert(b1.getDouble(6) == 0.8)
    // all-same score collapses into bin 0
    val flat = Seq((0.5, true), (0.5, false)).toDF("s", "y")
    val f = Stats.calibrationBins(flat, "s", "y", bins = 4).collect()
    assert(f.length == 1 && f.head.getInt(0) == 0 && f.head.getLong(3) == 2L)
    // null score / null label rows are excluded
    val withNull = Seq((Some(0.1), Some(true)), (None, Some(false)),
      (Some(0.9), None)).toDF("s", "y")
    val w = Stats.calibrationBins(withNull, "s", "y", bins = 2).collect()
    assert(w.map(_.getLong(3)).sum == 1L)
  }

  test("corrMatrix fast path tracks the exact path within 4dp wobble") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val pairs = Seq("l_quantity" -> "l_extendedprice",
      "l_extendedprice" -> "l_discount")
    def m(exact: Boolean) = Stats.corrMatrix(li, pairs, exact = exact)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val (e, f) = (m(exact = true), m(exact = false))
    assert(e.keySet == f.keySet)
    e.foreach { case (k, v) => assert(math.abs(v - f(k)) <= 2e-4, s"$k: $v vs ${f(k)}") }
  }

  test("ksTest: identical distributions → 0, disjoint → 1, hand case exact") {
    import spark.implicits._
    // identical: A and B both {1,2,3} → every gap 0, argmax ties → lowest bucket
    val same = Seq((1.0, true), (2.0, true), (3.0, true),
      (1.0, false), (2.0, false), (3.0, false)).toDF("v", "y")
    val s = Stats.ksTest(same, "v", "y").collect().head
    assert((s.getLong(0), s.getLong(1), s.getDouble(2), s.getDouble(3)) ==
      ((3L, 3L, 0.0, 1.0)))
    // disjoint: A = {1,2}, B = {5,6} → D = 1 at the last A bucket
    val dis = Seq((1.0, true), (2.0, true), (5.0, false), (6.0, false))
      .toDF("v", "y")
    val d = Stats.ksTest(dis, "v", "y").collect().head
    assert((d.getDouble(2), d.getDouble(3)) == ((1.0, 2.0)))
    // hand case: A = {1,2,3,4}, B = {3,4,5,6}; at v=2: F_a=1/2, F_b=0 →
    // gap = |2·4 − 0·4| = 8 of 16 → D = 0.5 (also at v=4: |16−8|=8 → tie,
    // argmax keeps the LOWEST bucket, v=2)
    val h = Seq(1, 2, 3, 4).map(v => (v.toDouble, true)) ++
      Seq(3, 4, 5, 6).map(v => (v.toDouble, false))
    val r = Stats.ksTest(h.toDF("v", "y"), "v", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      ((4L, 4L, 0.5, 2.0)))
  }

  test("ksTest: one-class → null D, empty → zero rows, coarse grid merges") {
    import spark.implicits._
    val one = Seq((1.0, true), (2.0, true)).toDF("v", "y")
    val r = Stats.ksTest(one, "v", "y").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2) && r.isNullAt(3))
    val empty = Seq.empty[(Double, Boolean)].toDF("v", "y")
    assert(Stats.ksTest(empty, "v", "y").collect().isEmpty)
    // decimals = -1: 14 vs 16 land in different buckets (1 vs 2), so a
    // planted shift survives the coarse grid; 14 vs 15 would merge at 0dp…
    // pin the rescaled at_value: bucket 1 → 10.0
    val c = Stats.ksTest(Seq((14.0, true), (16.0, false)).toDF("v", "y"),
      "v", "y", decimals = -1).collect().head
    assert(c.getDouble(2) == 1.0 && c.getDouble(3) == 10.0)
    intercept[IllegalArgumentException](Stats.ksTest(one, "v", "y", decimals = 9))
  }

  test("ksTest detects a planted shift on real orders and is repartition-stable") {
    import org.apache.spark.sql.functions._
    val od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_totalprice").as("v"), (col("o_orderkey") % 2 === 0).as("y"))
    // even/odd keys draw from the same distribution → D near 0 but exact
    val a = Stats.ksTest(od, "v", "y", decimals = -2).collect().toSeq
    val b = Stats.ksTest(od.repartition(7), "v", "y", decimals = -2).collect().toSeq
    assert(a == b && a.head.getDouble(2) < 0.2)
    // shift the even half up by 10⁶ → disjoint supports → D = 1
    val shifted = od.withColumn("v",
      when(col("y"), col("v") + 1000000.0).otherwise(col("v")))
    assert(Stats.ksTest(shifted, "v", "y", decimals = -2)
      .collect().head.getDouble(2) == 1.0)
  }

  test("mutualInfo: identity → nmi 1, independence → 0, degenerate → null") {
    import spark.implicits._
    // perfect dependence, uniform margins: mi = h = ln 2, nmi = 1
    val dep = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    val d = Stats.mutualInfo(dep, "a", "b").collect().head
    assert((d.getLong(0), d.getLong(1), d.getDouble(2), d.getDouble(5)) ==
      ((2L, 2L, 0.693147, 1.0)))
    // full uniform 2×2 grid: every ratio is 1 → mi = 0, nmi = 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val i = Stats.mutualInfo(ind, "a", "b").collect().head
    assert(i.getDouble(2) == 0.0 && i.getDouble(5) == 0.0)
    // single category on one side: H_a = 0 → nmi null, mi 0
    val deg = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val g = Stats.mutualInfo(deg, "a", "b").collect().head
    assert(g.getLong(0) == 1L && g.getDouble(2) == 0.0 && g.isNullAt(5))
    // nulls excluded entirely
    val withNull = Seq((Some("x"), Some("p")), (None, Some("q")),
      (Some("y"), None)).toDF("a", "b")
    val w = Stats.mutualInfo(withNull, "a", "b").collect().head
    assert(w.getLong(0) == 1L && w.getLong(1) == 1L)
  }

  test("mutualInfo matches a hand-computed skewed joint and bounds nmi") {
    import spark.implicits._
    // cells: (x,p)=2 (x,q)=1 (y,q)=1; N=4; margins x=3 y=1 p=2 q=2
    // mi = [2·ln(8/6) + 1·ln(4/6) + 1·ln(4/2)]/4 — fix each 6dp term
    val df = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("y", "q")).toDF("a", "b")
    def t(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    def fx(v: Double) = math.round(v * 1000000)
    val sMi = (fx(t(2 * math.log(8.0 / 6))) + fx(t(math.log(4.0 / 6))) +
      fx(t(math.log(4.0 / 2)))).toDouble / 1000000
    val want = t(sMi / 4)
    val r = Stats.mutualInfo(df, "a", "b").collect().head
    assert(r.getDouble(2) == want, s"${r.getDouble(2)} vs $want")
    assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0)
  }

  test("mutualInfo is repartition-stable on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Stats.mutualInfo(docs, "source", "lang").collect().toSeq
    val b = Stats.mutualInfo(docs.repartition(7), "source", "lang").collect().toSeq
    assert(a == b && a.nonEmpty)
    val r = a.head
    assert(r.getDouble(2) >= 0.0)
    Option(r.get(5)).foreach(v =>
      assert(v.asInstanceOf[Double] >= -1e-6 && v.asInstanceOf[Double] <= 1.0))
  }

  test("stats are repartition-stable on real lineitem data") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val pairs = Seq("l_quantity" -> "l_extendedprice")
    val a = Stats.corrMatrix(li, pairs).collect().toSeq
    val b = Stats.corrMatrix(li.repartition(7), pairs).collect().toSeq
    assert(a == b && a.nonEmpty)
    val fa = Stats.linearFit(li, "l_quantity", "l_extendedprice").collect().toSeq
    val fb = Stats.linearFit(li.repartition(7), "l_quantity", "l_extendedprice")
      .collect().toSeq
    assert(fa == fb)
    // the synthetic testdata draws quantity and price independently — the
    // point here is a well-formed, deterministic value, not a TPC-H shape
    assert(math.abs(a.head.getDouble(3)) <= 1.0, a.head.toString)
  }

  /** In-memory tie-aware Spearman — the third voice spearman is pinned
    * against: average ranks per tie group, then Pearson on the ranks.
    */
  private def spearmanRef(xs: Seq[Double], ys: Seq[Double]): Double = {
    def avgRanks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted
      val rank = v.map { x =>
        val lt = sorted.count(_ < x)
        val eq = sorted.count(_ == x)
        lt + (eq + 1) / 2.0
      }
      rank
    }
    val (rx, ry) = (avgRanks(xs), avgRanks(ys))
    val n = xs.length.toDouble
    val (sx, sy) = (rx.sum, ry.sum)
    val sxx = rx.map(v => v * v).sum
    val syy = ry.map(v => v * v).sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    BigDecimal((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("spearman hits ±1 on monotone data and is invariant to monotone rescale") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    // y = x³ is monotone but badly non-linear: Pearson < 1, Spearman = 1
    val cubic = xs.map(x => (x, x * x * x)).toDF("x", "y")
    val up = Stats.spearman(cubic, "x", "y").head()
    assert((up.getString(0), up.getString(1), up.getLong(2), up.getDouble(3)) ==
      (("x", "y", 5L, 1.0)))
    val down = Stats.spearman(xs.map(x => (x, -x * x * x)).toDF("x", "y"), "x", "y")
      .head()
    assert(down.getDouble(3) == -1.0)
  }

  test("spearman matches the tie-aware reference on tied data") {
    import spark.implicits._
    val xs = Seq(1.0, 1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 4.0)
    val ys = Seq(2.0, 1.0, 2.0, 3.0, 3.0, 5.0, 4.0, 5.0)
    val got = Stats.spearman(xs.zip(ys).toDF("x", "y"), "x", "y").head()
    assert(got.getLong(2) == 8L)
    assert(got.getDouble(3) == spearmanRef(xs, ys),
      s"${got.getDouble(3)} vs ${spearmanRef(xs, ys)}")
  }

  test("spearman guards constants/nulls and is repartition-stable on lineitem") {
    import spark.implicits._
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    assert(Stats.spearman(const, "x", "y").head().isNullAt(3))
    val withNulls = Seq((Some(1.0), Some(1.0)), (Some(2.0), None),
      (None, Some(3.0)), (Some(4.0), Some(4.0))).toDF("x", "y")
    val r = Stats.spearman(withNulls, "x", "y").head()
    assert(r.getLong(2) == 2L && r.getDouble(3) == 1.0) // pairwise-complete
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val a = Stats.spearman(li, "l_quantity", "l_extendedprice").collect().toSeq
    val b = Stats.spearman(li.repartition(7), "l_quantity", "l_extendedprice")
      .collect().toSeq
    assert(a == b && math.abs(a.head.getDouble(3)) <= 1.0)
  }

  test("welchT matches the hand-computed statistic and flips sign with order") {
    import spark.implicits._
    val a = Seq(5.1, 5.4, 4.9, 5.6, 5.0)
    val b = Seq(4.2, 4.8, 4.4, 4.1)
    val df = (a.map(("t", _)) ++ b.map(("c", _)))
      .toDF("grp", "v")
    // replay the operator's exact association from the same fixed-point
    // atoms, so the pin is bit-exact, not tolerance-based
    def stats(v: Seq[Double]): (Double, Double, Double) = {
      val atoms = v.map(x => math.round(x * 10000).toDouble)
      val nd = v.size.toDouble
      val (s, ss) = (atoms.sum, atoms.map(x => x * x).sum)
      val mean = s / nd / 10000
      val variance = (nd * ss - s * s) / (nd * (nd - 1.0)) / 1e8
      (nd, mean, variance)
    }
    val (na, ma, va) = stats(a)
    val (nb, mb, vb) = stats(b)
    val se2 = va / na + vb / nb
    val wantT = BigDecimal((ma - mb) / math.sqrt(se2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wantDf = BigDecimal(se2 * se2 /
        ((va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0)))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Stats.welchT(df, "v", "grp", "t", "c").head()
    assert((r.getLong(2), r.getLong(3)) == ((5L, 4L)))
    assert(r.getDouble(4) == 5.2 && r.getDouble(5) == 4.375, r.toString)
    assert(r.getDouble(6) == wantT, s"${r.getDouble(6)} vs $wantT")
    assert(r.getDouble(7) == wantDf, s"${r.getDouble(7)} vs $wantDf")
    val flipped = Stats.welchT(df, "v", "grp", "c", "t").head()
    assert(flipped.getDouble(6) == -r.getDouble(6))
  }

  test("welchT guards tiny groups and zero variance; stable on real events") {
    import spark.implicits._
    val tiny = Seq(("t", 1.0), ("c", 2.0), ("c", 3.0)).toDF("grp", "v")
    val r = Stats.welchT(tiny, "v", "grp", "t", "c").head()
    assert(r.getLong(2) == 1L && r.isNullAt(6) && r.isNullAt(7))
    val flatBoth = Seq(("t", 2.0), ("t", 2.0), ("c", 2.0), ("c", 2.0))
      .toDF("grp", "v")
    assert(Stats.welchT(flatBoth, "v", "grp", "t", "c").head().isNullAt(6))
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val x = Stats.welchT(ev, "value", "event_type", "view", "click").collect().toSeq
    val y = Stats.welchT(ev.repartition(7), "value", "event_type", "view", "click")
      .collect().toSeq
    assert(x == y && x.head.getLong(2) > 0)
  }

  test("bootstrapMeanCi collapses on constant data and brackets a real mean") {
    import spark.implicits._
    // constant column: every replicate mean is exactly the constant
    val const = (1L to 50L).map(i => (i, 7.5)).toDF("id", "v")
    val c = Stats.bootstrapMeanCi(const, "v", "id", b = 20).head()
    assert(c.getLong(0) == 50L && c.getLong(1) == 20L)
    assert(c.getDouble(2) == 7.5 && c.getDouble(3) == 7.5 && c.getDouble(4) == 7.5)
    // spread data: lo < mean < hi, interval inside the data range
    val spread = (1L to 200L).map(i => (i, i.toDouble)).toDF("id", "v")
    val r = Stats.bootstrapMeanCi(spread, "v", "id", b = 100).head()
    assert(r.getDouble(2) == 100.5)
    assert(r.getDouble(3) < 100.5 && 100.5 < r.getDouble(4),
      s"CI [${r.getDouble(3)}, ${r.getDouble(4)}] should bracket 100.5")
    assert(r.getDouble(3) > 1.0 && r.getDouble(4) < 200.0)
  }

  test("bootstrapMeanCi is a property of data + salt, not partitioning") {
    import spark.implicits._
    val df = (1L to 120L).map(i => (i, (i % 13).toDouble)).toDF("id", "v")
    val a = Stats.bootstrapMeanCi(df, "v", "id").collect().toSeq
    val b = Stats.bootstrapMeanCi(df.repartition(11), "v", "id").collect().toSeq
    assert(a == b)
    // a different salt rotates the replicates (the interval moves)
    val s2 = Stats.bootstrapMeanCi(df, "v", "id", salt = "boot2").head()
    assert((s2.getDouble(3), s2.getDouble(4)) !=
      ((a.head.getDouble(3), a.head.getDouble(4))))
    // …but the exact mean never does
    assert(s2.getDouble(2) == a.head.getDouble(2))
    intercept[IllegalArgumentException] {
      Stats.bootstrapMeanCi(df, "v", "id", b = 5)
    }
    intercept[IllegalArgumentException] {
      Stats.bootstrapMeanCi(df, "v", "id", alpha = 0.7)
    }
  }

  test("rank-grid guard trips on adversarial resolution, passes at declared parameters") {
    import spark.implicits._
    // adversarial shape: fine decimals over a wide value range — every row
    // its own grid cell, so the single-task cumulative window would be
    // row-bounded. With a low ceiling the guard must refuse EAGERLY (at
    // call time, before any window runs).
    val wide = (1 to 500).map(i => (i * 1234.567891, i % 2 == 0, (501 - i) * 0.97))
      .toDF("score", "label", "y")
    def trips(f: => org.apache.spark.sql.DataFrame): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("maxGridCells"), e.getMessage)
    }
    trips(Stats.aucBinary(wide, "score", "label", decimals = 6, maxGridCells = 100))
    trips(Stats.rocPoints(wide, "score", "label", decimals = 6, maxGridCells = 100))
    trips(Stats.ksTest(wide, "score", "label", decimals = 6, maxGridCells = 100))
    trips(Stats.spearman(wide, "score", "y", decimals = 6, maxGridCells = 100))
    // the same data at the DECLARED parameters passes and produces results
    assert(Stats.aucBinary(wide, "score", "label").collect().length == 1)
    assert(Stats.spearman(wide, "score", "y", decimals = 2).collect().length == 1)
    // and a coarse grid under the same low ceiling also passes: the guard
    // binds on grid cardinality, not row count
    import org.apache.spark.sql.functions.col
    assert(Stats.ksTest(wide.select((col("score") % 7.0).as("score"), col("label")),
      "score", "label", decimals = 0, maxGridCells = 100).collect().length == 1)
  }
}
