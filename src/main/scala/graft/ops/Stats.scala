package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.T._

/** Statistical profiling & drift detection (groups A and X) — SURVEY.md §2b.
  *
  * The corpus-health verbs a curation pipeline runs BEFORE and AFTER every
  * intervention: association tests (did the dedup change the lang×source
  * mix?), robust outlier counts (MAD survives the heavy tails that wreck
  * z-scores), winsorized means (report stats that one 10 MB document can't
  * drag), exact correlation matrices (feature redundancy before training a
  * quality classifier), and distribution-drift scores between corpus
  * generations (PSI / KS — the monitoring numbers a 100 TB nightly refresh
  * alerts on).
  *
  * Determinism engineering (SURVEY §7.3): every statistic is computed from
  * EXACT integer counts or DECIMAL-quantized sums; doubles appear only in
  * final closed-form arithmetic where both engines receive bit-identical
  * operands and apply the same IEEE-754 operations in the same written
  * order (the a_regression / x_text_perplexity precedent), with `round(…,6)`
  * re-syncing the emitted grid. Quantile-derived fences round BEFORE any
  * comparison (the a_outliers precedent) so interpolation ulp noise cannot
  * flip a count.
  */
object Stats {

  val queries: Map[String, Q] = Map(
    // Pearson chi-square test of independence between nation and market
    // segment — the association test behind "is this categorical mix an
    // artifact?". Shape: ONE data-sized groupBy to the contingency cells
    // (map-side combine; 125 cells here, |A|·|B| generally), then row and
    // column totals as window sums over the CELLS frame — the raw table
    // is never rescanned, so at 100 TB the test costs one aggregation
    // pass regardless of cell count. Expected counts and the chi-square
    // terms are derived from exact integer totals with identical IEEE
    // arithmetic on both engines; per-cell terms round to the 6-dp grid
    // and sum as decimals (order-insensitive-exact).
    "a_chi2" -> ((s, d) => {
      val cells = t(s, d, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("obs"))
      val withTot = cells
        .withColumn("rt", sum("obs").over(Window.partitionBy("c_nationkey")))
        .withColumn("ct", sum("obs").over(Window.partitionBy("c_mktsegment")))
        .withColumn("n", sum("obs").over(Window.partitionBy()))
      val e = (col("rt") * col("ct")).cast("double") / col("n")
      val obsD = col("obs").cast("double")
      val term = round((obsD - e) * (obsD - e) / e, 6)
      withTot.select(col("c_nationkey"), term.as("term"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cells"),
          decOut(sum(dec(col("term")))).as("chi2_part"))
        .orderBy("c_nationkey")
    }),

    // Median-absolute-deviation robust outliers per group — the
    // heavy-tail-safe twin of a_outliers' IQR fences (a single extreme
    // value moves a mean/stddev fence arbitrarily; the MAD moves by at
    // most one rank). Two exact-percentile passes (median, then median
    // of |x − med|) with the |groups|-row frames broadcast back — the
    // aggregate-decide-reapply shape. Exact percentiles are holistic;
    // the 100 TB rolling form swaps them for the KLL sketches graded at
    // a_kll_merge — the fences here are the nightly full-table form,
    // and ops/Percentiles.grouped is the DATA-DRIVEN router between the
    // two (exact at or under a group-size threshold, sketch above it;
    // PropertySpec pins the split and both sides' guarantees).
    // med/mad round to the 6-dp grid BEFORE the threshold comparison
    // (a_outliers precedent); 4.4478 = 3·1.4826 (the normal-consistency
    // constant) written as one literal so neither engine re-derives it.
    "a_mad" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val med = li.groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5D)"), 6).as("med"))
      // NOT cached (tried r19, reverted): dev's two consumers are the
      // mad broadcast-subquery future and the main aggregate, which
      // materialize CONCURRENTLY — a lazy persist makes both race to
      // build the same blocks (measured 3.1 → 5.9 s), where uncached
      // each simply computes its own cheap scan+join+abs pass.
      val dev = li.join(broadcast(med), Seq("l_returnflag"))
        .withColumn("dev", abs(col("l_extendedprice") - col("med")))
      val mad = dev.groupBy("l_returnflag")
        .agg(round(expr("percentile(dev, 0.5D)"), 6).as("mad"))
      dev.join(broadcast(mad), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          first(col("med")).as("med"), first(col("mad")).as("mad"),
          sum(when(col("dev") > round(lit(4.4478) * col("mad"), 6), 1L)
            .otherwise(0L)).as("n_robust_out"))
        .orderBy("l_returnflag")
    }),

    // Exact Pearson correlation matrix over the four lineitem measures in
    // ONE scan: every Σx, Σx² and cross Σxy accumulates as an exact
    // DECIMAL over 6-dp-quantized values (decimal products are exact, so
    // the sums are order-insensitive — no engine-summation-order noise),
    // then each pairwise corr evaluates the closed form in doubles built
    // from those identical decimals. This is deliberately NOT the
    // built-in corr(): its double accumulation is summation-order
    // dependent, which round(…,6) only probabilistically repairs. Shape:
    // one pass, 15 decimal partials, 1-row shuffle — the d² moment matrix
    // a 1000-executor job reduces in a single tree aggregation.
    "a_corr_matrix" -> ((s, d) => {
      val cols = Seq("l_quantity" -> "qty", "l_extendedprice" -> "price",
        "l_discount" -> "disc", "l_tax" -> "tax")
      def q(c: String) = col(c).cast("decimal(18,6)")
      val sums =
        cols.map { case (c, a) => sum(q(c)).as(s"s_$a") } ++
          (for {
            i <- cols.indices; j <- i until cols.size
          } yield sum(q(cols(i)._1) * q(cols(j)._1))
            .as(s"p_${cols(i)._2}_${cols(j)._2}"))
      val ag = t(s, d, "lineitem")
        .agg(count(lit(1)).as("n"), sums: _*)
      val dn = col("n").cast("double")
      def dp(name: String) = col(name).cast("double")
      def corr(a: String, b: String) = {
        val num = dn * dp(s"p_${a}_$b") - dp(s"s_$a") * dp(s"s_$b")
        val denA = dn * dp(s"p_${a}_$a") - dp(s"s_$a") * dp(s"s_$a")
        val denB = dn * dp(s"p_${b}_$b") - dp(s"s_$b") * dp(s"s_$b")
        round(num / nullif(sqrt(denA * denB), lit(0.0)), 6)
      }
      val pairs = for {
        i <- cols.indices; j <- (i + 1) until cols.size
      } yield (s"${cols(i)._2}~${cols(j)._2}", cols(i)._2, cols(j)._2)
      val named = ag.select(col("n") +: pairs.zipWithIndex.flatMap {
        case ((label, a, b), i) =>
          Seq(lit(label).as(s"l$i"), corr(a, b).as(s"c$i"))
      }: _*)
      val stackExpr = pairs.indices.map(i => s"l$i, c$i").mkString(", ")
      named.select(col("n"),
        expr(s"stack(${pairs.size}, $stackExpr)").as(Seq("pair", "corr")))
        .select(col("pair"), col("n"), col("corr"))
        .orderBy("pair")
    }),

    // Multi-feature OLS by NORMAL EQUATIONS — the closed-form companion
    // to a_regression's per-group simple OLS and the 2-feature special
    // case of the x_emb_cov Gram machinery: fit
    // price ≈ β₀ + β₁·quantity + β₂·discount in ONE scan. Every moment
    // (Σx, Σx², Σxy up to Σy²) accumulates as an exact decimal over
    // 6-dp-quantized values (order-insensitive — no summation-order
    // noise), then the 3×3 system solves by CRAMER'S RULE in doubles
    // built from those identical decimals, written in the same operation
    // order on both engines. At 100 TB this is the shape that matters:
    // a d-feature fit is d² tree-aggregated accumulators and a d×d
    // driver-side solve — the data is scanned once and never shuffled
    // (the 1-row agg is the only exchange).
    "a_ols_multi" -> ((s, d) => {
      def q(c: String) = col(c).cast("decimal(18,6)")
      val ag = t(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        sum(q("l_quantity")).as("s1"), sum(q("l_discount")).as("s2"),
        sum(q("l_extendedprice")).as("sy"),
        sum(q("l_quantity") * q("l_quantity")).as("s11"),
        sum(q("l_quantity") * q("l_discount")).as("s12"),
        sum(q("l_discount") * q("l_discount")).as("s22"),
        sum(q("l_quantity") * q("l_extendedprice")).as("s1y"),
        sum(q("l_discount") * q("l_extendedprice")).as("s2y"),
        sum(q("l_extendedprice") * q("l_extendedprice")).as("syy"))
      val nD = col("n").cast("double")
      def dp(c: String) = col(c).cast("double")
      val (s1, s2, sy) = (dp("s1"), dp("s2"), dp("sy"))
      val (s11, s12, s22) = (dp("s11"), dp("s12"), dp("s22"))
      val (s1y, s2y, syy) = (dp("s1y"), dp("s2y"), dp("syy"))
      val det = nD * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
        s2 * (s1 * s12 - s11 * s2)
      val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
        s2 * (s1y * s12 - s11 * s2y)
      val det1 = nD * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
        s2 * (s1 * s2y - s1y * s2)
      val det2 = nD * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
        sy * (s1 * s12 - s11 * s2)
      val dd = nullif(det, lit(0.0))
      val (b0, b1, b2) = (det0 / dd, det1 / dd, det2 / dd)
      val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
      val sst = syy - sy * sy / nD
      ag.select(col("n"),
        round(b0, 6).as("b0"), round(b1, 6).as("b1"), round(b2, 6).as("b2"),
        round(lit(1.0) - sse / nullif(sst, lit(0.0)), 6).as("r2"))
    }),

    // Pareto / concentration profile — "what share of revenue comes from
    // each customer decile": the curation-relevant concentration verb
    // (the same shape answers "what share of tokens comes from the top
    // domains"). Two-level: data-sized groupBy to per-customer exact
    // decimal revenue, ntile(10) under a TOTAL order (revenue desc, key),
    // per-decile re-agg, shares from exact decimal totals. The window
    // runs over the |customers|-sized frame, never raw orders.
    "a_pareto" -> ((s, d) => {
      val rev = t(s, d, "orders").groupBy("o_custkey")
        .agg(sum(dec(col("o_totalprice"))).as("rev"))
      val w = Window.orderBy(col("rev").desc, col("o_custkey").asc)
      val tot = Window.partitionBy()
      rev.withColumn("decile", ntile(10).over(w))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_cust"), sum(col("rev")).as("rev_dec"))
        .withColumn("share",
          round(col("rev_dec").cast("double") /
            sum(col("rev_dec")).over(tot).cast("double"), 6))
        .select(col("decile").cast("long").as("decile"), col("n_cust"),
          decOut(col("rev_dec")).as("rev_dec"), col("share"))
        .orderBy("decile")
    }),

    // GINI COEFFICIENT of the revenue distribution — a_pareto's scalar
    // summary (deciles show the shape; Gini is the single inequality
    // number dashboards track): the rank-sum closed form
    // G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending ranks, with Σ(i·xᵢ)
    // as an EXACT decimal (rank cast DECIMAL(12,0) × revenue re-cast
    // DECIMAL(25,6): product precision lands exactly at 38 — one digit
    // more overflows DuckDB and triggers Spark's precision-loss
    // rounding). One data-sized groupBy, then rank + sums over the
    // |customers| frame.
    "a_gini" -> ((s, d) => {
      val rev = t(s, d, "orders").groupBy("o_custkey")
        .agg(sum(dec(col("o_totalprice"))).cast("decimal(25,6)").as("rev"))
      val rk = Window.orderBy(col("rev").asc, col("o_custkey").asc)
      val ranked = rev.withColumn("i",
        row_number().over(rk).cast("decimal(12,0)"))
      val ag = ranked.agg(count(lit(1)).as("n"),
        sum(col("i") * col("rev")).as("swr"),
        sum(col("rev")).as("tot"))
      ag.select(col("n"),
        decOut(col("tot")).as("total_rev"),
        round(lit(2.0) * col("swr").cast("double") /
          (col("n") * col("tot").cast("double")) -
          (col("n") + lit(1)).cast("double") / col("n"), 6).as("gini"))
    }),

    // Welch's two-sample t-test — the numeric twin of a_chi2's
    // categorical association test: does a measure differ between two
    // slices beyond noise? ONE conditional-aggregation pass accumulates
    // exact decimal Σx and Σx² per slice (quantized — order-free), then
    // means, sample variances, the t statistic and the Welch–
    // Satterthwaite df all evaluate in doubles built from identical
    // decimals, written in one shared operation order. 1-row output; at
    // 100 TB the cost is one scan with map-side combine into 6 partials.
    "a_ttest" -> ((s, d) => {
      def q(c: Column) = c.cast("decimal(18,6)")
      val zero = lit(0).cast("decimal(18,6)")
      val ag = t(s, d, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .agg(
          sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_r"),
          sum(when(col("l_returnflag") === "A", q(col("l_extendedprice")))
            .otherwise(zero)).as("s_a"),
          sum(when(col("l_returnflag") === "R", q(col("l_extendedprice")))
            .otherwise(zero)).as("s_r"),
          sum(when(col("l_returnflag") === "A",
            q(col("l_extendedprice")) * q(col("l_extendedprice")))
            .otherwise(zero.cast("decimal(38,12)"))).as("ss_a"),
          sum(when(col("l_returnflag") === "R",
            q(col("l_extendedprice")) * q(col("l_extendedprice")))
            .otherwise(zero.cast("decimal(38,12)"))).as("ss_r"))
      val mA = col("s_a").cast("double") / col("n_a")
      val mR = col("s_r").cast("double") / col("n_r")
      val vA = (col("ss_a").cast("double") - col("n_a") * mA * mA) / (col("n_a") - 1)
      val vR = (col("ss_r").cast("double") - col("n_r") * mR * mR) / (col("n_r") - 1)
      val se2A = vA / col("n_a")
      val se2R = vR / col("n_r")
      val tStat = (mA - mR) / sqrt(se2A + se2R)
      val dfW = (se2A + se2R) * (se2A + se2R) /
        (se2A * se2A / (col("n_a") - 1) + se2R * se2R / (col("n_r") - 1))
      ag.select(col("n_a"), col("n_r"),
        round(mA, 6).as("mean_a"), round(mR, 6).as("mean_r"),
        round(tStat, 6).as("t_stat"), round(dfW, 6).as("df"))
    }),

    // EMBEDDING-CENTROID drift between corpus slices — the vector-space
    // twin of x_drift_psi/ks (those watch scalar distributions; a
    // semantic shift moves the embedding centroid while scalars look
    // flat): per-dimension exact decimal sums per slice in ONE pass over
    // the exploded vectors (64 groups, map-side combine), centroids
    // rounded to the 6-dp grid, then cosine and L2 between them from
    // exact decimal dot products — doubles only in the final
    // sqrt/divide. The most-drifted dimension rides a TakeOrdered 1.
    "x_drift_embed" -> ((s, dd) => {
      def zero6 = lit(0).cast("decimal(18,6)")
      val e = t(s, dd, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      val sums = e.groupBy("pos").agg(
        sum(when(col("vec_id") % 2 === 0, col("v").cast("decimal(18,6)"))
          .otherwise(zero6)).as("s_ref"),
        sum(when(col("vec_id") % 2 =!= 0, col("v").cast("decimal(18,6)"))
          .otherwise(zero6)).as("s_cur"),
        sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_cur"))
      val m = sums.select(col("pos"), col("n_ref"), col("n_cur"),
        round(col("s_ref").cast("double") / col("n_ref"), 6)
          .cast("decimal(18,6)").as("m_ref"),
        round(col("s_cur").cast("double") / col("n_cur"), 6)
          .cast("decimal(18,6)").as("m_cur"))
      val mC = checkpointed(m, eager = true)
      val agg = mC.agg(
        first(col("n_ref")).as("n_ref"), first(col("n_cur")).as("n_cur"),
        sum(col("m_ref") * col("m_cur")).as("num"),
        sum(col("m_ref") * col("m_ref")).as("nr2"),
        sum(col("m_cur") * col("m_cur")).as("nc2"),
        // re-cast the diff to scale 6 (exact) before squaring: a
        // (19,6)×(19,6) product would exceed precision 38 on both engines
        sum((col("m_ref") - col("m_cur")).cast("decimal(18,6)") *
          (col("m_ref") - col("m_cur")).cast("decimal(18,6)")).as("l2sq"))
      val top = mC
        .orderBy(abs(col("m_ref") - col("m_cur")).desc, col("pos").asc)
        .limit(1)
        .select(col("pos").cast("long").as("max_dim"),
          round(abs(col("m_ref") - col("m_cur")).cast("double"), 6)
            .as("max_abs_delta"))
      agg.crossJoin(top)
        .select(col("n_ref"), col("n_cur"),
          round(col("num").cast("double") /
            nullif(sqrt(col("nr2").cast("double")) * sqrt(col("nc2").cast("double")),
              lit(0.0)), 6).as("centroid_cos"),
          round(sqrt(col("l2sq").cast("double")), 6).as("centroid_l2"),
          col("max_dim"), col("max_abs_delta"))
    }),

    // Distributed GRAM / COVARIANCE matrix of the embedding corpus in ONE
    // pass (`functions/Gram.GramAgg`): the aggregation buffer IS the
    // upper-triangular moment matrix, so each executor folds its
    // partition locally and only fixed d + d(d+1)/2 integer accumulators
    // cross the shuffle — never a d²× row explode. Input pre-quantized to
    // scale-6 decimal micros in Column space (the cross-engine-verified
    // decimal cast); all accumulation is exact integer (Math.addExact,
    // loud overflow), so the emitted statistics are order-independent and
    // oracle-hashable. Final projection derives E[x_i x_j] and
    // cov(i,j) = Sxy/n − (Sx/n)(Sy/n) in doubles built from identical
    // decimals on both engines. The 2080-row (pos → i,j) triangle index
    // is a driver-built broadcast.
    "x_emb_cov" -> ((s, dd) => {
      graft.functions.Gram.register(s)
      val d = 64
      val nProds = d * (d + 1) / 2
      val q = transform(col("embedding"),
        e => (e.cast("decimal(18,6)") * lit(1000000)).cast("long"))
      val g = t(s, dd, "embeddings")
        .select(q.as("q"))
        .agg(expr(s"graft_gram_agg(q, $d)").as("g"))
        .select(col("g.n").as("n"),
          slice(col("g.m"), 1, d).as("sums"),
          slice(col("g.m"), d + 1, nProds).as("prods"))
      import s.implicits._
      val idx = (for { i <- 0 until d; j <- i until d } yield
        (graft.functions.Gram.triIndex(d, i, j), i.toLong, j.toLong))
        .toDF("pos", "i", "j")
      g.select(col("n"), col("sums"),
        posexplode(col("prods")).as(Seq("pos", "sxy")))
        .join(broadcast(idx), "pos")
        .withColumn("sx", element_at(col("sums"), (col("i") + 1).cast("int")))
        .withColumn("sy", element_at(col("sums"), (col("j") + 1).cast("int")))
        .select(col("i"), col("j"), col("n"),
          // + 0.0 on gram_mean too (both engines): caught live at sf0.1
          // round 12 — a tiny negative mean rounds to -0.0 on one engine
          // and +0.0 on the other, same class as cov below.
          (round(col("sxy").cast("double") / col("n"), 6) + lit(0.0))
            .as("gram_mean"),
          // + 0.0 (both engines): a tiny negative cell rounds to -0.0 on
          // one engine and 0.0 on the other — numerically equal, but the
          // driver's pandas hash distinguishes the sign bit. IEEE
          // -0.0 + 0.0 = +0.0 normalizes both.
          (round(col("sxy").cast("double") / col("n") -
            (col("sx").cast("double") / col("n")) *
              (col("sy").cast("double") / col("n")), 6) + lit(0.0)).as("cov"))
        .orderBy("i", "j")
    }),

    // PCA TOP COMPONENT by pinned-round POWER ITERATION over the
    // single-pass gram matrix — the engine's iterative-linear-algebra
    // class (the x_graph_pagerank device applied to d×d instead of the
    // edge list): ONE corpus-sized pass builds the exact covariance cells
    // (GramAgg, see x_emb_cov), then 8 matvec+normalize rounds run
    // entirely on the d²-cell frame — corpus-INDEPENDENT cost, so at
    // 100 TB the eigenvector costs one gram pass plus fixed tiny-frame
    // rounds. Every round is decimal-exact between roundings: matvec
    // products/sums in DECIMAL (order-free), re-round to the 6-dp grid,
    // norm² as exact decimal, and only then the IEEE sqrt/divide both
    // engines evaluate on identical operands (the pagerank precedent).
    // The oracle is the SAME iteration unrolled as 8 CTE rounds.
    "x_emb_pca" -> ((s, dd) => {
      graft.functions.Gram.register(s)
      val d = 64
      val nProds = d * (d + 1) / 2
      val q = transform(col("embedding"),
        e => (e.cast("decimal(18,6)") * lit(1000000)).cast("long"))
      val g = t(s, dd, "embeddings")
        .select(q.as("q"))
        .agg(expr(s"graft_gram_agg(q, $d)").as("g"))
        .select(col("g.n").as("n"),
          slice(col("g.m"), 1, d).as("sums"),
          slice(col("g.m"), d + 1, nProds).as("prods"))
      import s.implicits._
      val idx = (for { i <- 0 until d; j <- i until d } yield
        (graft.functions.Gram.triIndex(d, i, j), i.toLong, j.toLong))
        .toDF("pos", "i", "j")
      val covTri = g.select(col("n"), col("sums"),
        posexplode(col("prods")).as(Seq("pos", "sxy")))
        .join(broadcast(idx), "pos")
        .withColumn("sx", element_at(col("sums"), (col("i") + 1).cast("int")))
        .withColumn("sy", element_at(col("sums"), (col("j") + 1).cast("int")))
        .select(col("i"), col("j"),
          round(col("sxy").cast("double") / col("n") -
            (col("sx").cast("double") / col("n")) *
              (col("sy").cast("double") / col("n")), 6)
            .cast("decimal(18,6)").as("cv"))
      // one partition for the whole iteration: the d² cell frame is 4160
      // rows — spreading it over the session's 32 shuffle partitions
      // costs 8 rounds × 32 near-empty tasks of pure scheduling (~6 s at
      // sf0.1); a single task per round is the right plan up to d ≈ 10³
      val covFull = checkpointed(
        covTri.union(covTri.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("cv")))
          .coalesce(1),
        eager = true)
      var v = s.range(0, d)
        .select(col("id").as("jv"), lit(0.125).cast("decimal(18,6)").as("vj"))
      var lastWr: org.apache.spark.sql.DataFrame = null
      for (_ <- 1 to 8) {
        val w = covFull.join(broadcast(v), col("j") === col("jv"))
          .groupBy("i").agg(sum(col("cv") * col("vj")).as("wd")).coalesce(1)
        // checkpoint each round's wr: BOTH the norm and the next v read
        // it, so an unbroken lineage doubles the subtree per round —
        // 2⁸ re-evaluations of the matvec by round 8 (measured 20 s at
        // sf0.1; ~1 s checkpointed). Same pinned-round device as
        // pageRank; frames are 64 rows, so the checkpoint jobs are noise.
        lastWr = checkpointed(w.select(col("i"),
          round(col("wd").cast("double"), 6).cast("decimal(18,6)").as("wr")),
          eager = true)
        val n2 = lastWr.agg(sum(col("wr") * col("wr")).as("n2"))
        v = lastWr.crossJoin(broadcast(n2))
          .select(col("i").as("jv"),
            round(col("wr").cast("double") /
              nullif(sqrt(col("n2").cast("double")), lit(0.0)), 6)
              .cast("decimal(18,6)").as("vj"))
      }
      val eig = lastWr.agg(
        round(sqrt(sum(col("wr") * col("wr")).cast("double")), 6).as("eigval"))
      v.crossJoin(broadcast(eig))
        .select(col("jv").cast("long").as("i"),
          col("vj").cast("double").as("v"), col("eigval"))
        .orderBy("i")
    }),

    // Two-sample Kolmogorov–Smirnov distance between corpus slices —
    // distribution drift on a CONTINUOUS metric (document length),
    // computed EXACTLY in integers: D = max_v |F1(v) − F2(v)| evaluated
    // as |c1·t2 − c2·t1| over the distinct-value frame (cumulative
    // counts via windows), so no floating point exists until the final
    // emitted ratio. Shape: one groupBy to per-value slice counts
    // (|distinct values|-sized), windows over that frame, TakeOrdered 1
    // with a value tiebreak — at 100 TB the value frame is the only
    // state, never raw rows.
    "x_drift_ks" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("is_ref", (col("doc_id") % 2) === 0)
      val perValue = docs.groupBy(col("n_chars").as("v"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("d1"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("d2"))
      val cum = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy()
      perValue
        .withColumn("c1", sum("d1").over(cum))
        .withColumn("c2", sum("d2").over(cum))
        .withColumn("t1", sum("d1").over(tot))
        .withColumn("t2", sum("d2").over(tot))
        .withColumn("d_num", abs(col("c1") * col("t2") - col("c2") * col("t1")))
        .orderBy(col("d_num").desc, col("v").asc)
        .limit(1)
        .select(col("v").as("at_value"), col("t1"), col("t2"),
          col("d_num"),
          round(col("d_num").cast("double") / (col("t1") * col("t2")), 6)
            .as("ks"))
    }),

    // Population Stability Index between corpus slices — the per-bin
    // drift report a nightly refresh alerts on: 10 equal-width bins over
    // the observed [min, max] (integer-exact bin assignment via `div`),
    // Laplace-smoothed bin shares from exact integer counts (identical
    // doubles both engines), per-bin (p−q)·ln(p/q) terms rounded to the
    // 6-dp grid, PSI = exact decimal sum of the terms. The raw table is
    // aggregated ONCE to the bins frame; min/max ride a 1-row broadcast
    // (exempted as such in ContractSpec).
    "x_drift_psi" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("is_ref", length(col("source")) === 4)
      val mm = docs.agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
      val cells = docs.crossJoin(broadcast(mm))
        .withColumn("bin", expr("(n_chars - mn) * 10 div (mx - mn + 1)"))
        .groupBy("bin")
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
      val tot = Window.partitionBy()
      val p = (col("n_ref") + lit(1)).cast("double") / (col("t_ref") + lit(10))
      val q = (col("n_cur") + lit(1)).cast("double") / (col("t_cur") + lit(10))
      cells
        .withColumn("t_ref", sum("n_ref").over(tot))
        .withColumn("t_cur", sum("n_cur").over(tot))
        .withColumn("p", p).withColumn("q", q)
        .withColumn("term", round((col("p") - col("q")) * log(col("p") / col("q")), 6))
        .withColumn("psi", decOut(sum(dec(col("term"))).over(tot)))
        .select(col("bin"), col("n_ref"), col("n_cur"),
          round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
          col("term"), col("psi"))
        .orderBy("bin")
    }),

    // Winsorized per-group statistics — report means a single pathological
    // document cannot drag: clamp to the [p05, p95] exact percentiles
    // (rounded to the 6-dp grid BEFORE clamping — the fence precedent),
    // then exact decimal means of the clamped values next to the raw
    // means. Same aggregate-decide-reapply shape as a_mad; the percentile
    // pass is per-lang so fence frames stay |groups|-sized broadcasts.
    "x_quality_winsorize" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val p = docs.groupBy("lang").agg(
        round(expr("percentile(n_chars, 0.05D)"), 6).as("lo"),
        round(expr("percentile(n_chars, 0.95D)"), 6).as("hi"))
      docs.join(broadcast(p), Seq("lang"))
        .withColumn("wv",
          least(greatest(col("n_chars").cast("double"), col("lo")), col("hi")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          first(col("lo")).as("lo"), first(col("hi")).as("hi"),
          avgOut(sum(dec(col("wv"))), count(lit(1))).as("wmean"),
          avgOut(sum(dec(col("n_chars"))), count(lit(1))).as("rmean"))
        .orderBy("lang")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a_chi2" ->
      ("WITH cells AS (SELECT c_nationkey, c_mktsegment, count(*) AS obs " +
        "FROM customer GROUP BY c_nationkey, c_mktsegment), " +
        "tot AS (SELECT c_nationkey, obs, " +
        "sum(obs) OVER (PARTITION BY c_nationkey) AS rt, " +
        "sum(obs) OVER (PARTITION BY c_mktsegment) AS ct, " +
        "sum(obs) OVER () AS n FROM cells), " +
        "term AS (SELECT c_nationkey, " +
        "round((CAST(obs AS DOUBLE) - CAST(rt*ct AS DOUBLE)/n) * " +
        "(CAST(obs AS DOUBLE) - CAST(rt*ct AS DOUBLE)/n) / " +
        "(CAST(rt*ct AS DOUBLE)/n), 6) AS term FROM tot) " +
        "SELECT c_nationkey, count(*) AS n_cells, " +
        "round(CAST(sum(CAST(term AS DECIMAL(38,6))) AS DOUBLE), 6) AS chi2_part " +
        "FROM term GROUP BY c_nationkey ORDER BY c_nationkey"),
    "a_mad" ->
      ("WITH m AS (SELECT l_returnflag, " +
        "round(quantile_cont(l_extendedprice, 0.5), 6) AS med " +
        "FROM lineitem GROUP BY l_returnflag), " +
        "dv AS (SELECT l.l_returnflag, med, " +
        "abs(l_extendedprice - med) AS dev " +
        "FROM lineitem l JOIN m USING (l_returnflag)), " +
        "md AS (SELECT l_returnflag, round(quantile_cont(dev, 0.5), 6) AS mad " +
        "FROM dv GROUP BY l_returnflag) " +
        "SELECT dv.l_returnflag, count(*) AS n_rows, " +
        "any_value(med) AS med, any_value(mad) AS mad, " +
        "CAST(sum(CASE WHEN dev > round(4.4478 * mad, 6) THEN 1 ELSE 0 END) AS BIGINT) AS n_robust_out " +
        "FROM dv JOIN md USING (l_returnflag) " +
        "GROUP BY dv.l_returnflag ORDER BY dv.l_returnflag"),
    "a_corr_matrix" -> {
      val cols = Seq("l_quantity" -> "qty", "l_extendedprice" -> "price",
        "l_discount" -> "disc", "l_tax" -> "tax")
      // DECIMAL(19,6), not (18,6): DuckDB multiplies (18,6) operands in
      // their int64 physical representation and overflows on price²;
      // 19 digits forces hugeint. The PRODUCT values are identical
      // (scale-12 exact) to Spark's (18,6)×(18,6) → (37,12).
      def q(c: String) = s"CAST($c AS DECIMAL(19,6))"
      val sums =
        cols.map { case (c, a) => s"sum(${q(c)}) AS s_$a" } ++
          (for { i <- cols.indices; j <- i until cols.size } yield
            s"sum(${q(cols(i)._1)} * ${q(cols(j)._1)}) AS p_${cols(i)._2}_${cols(j)._2}")
      def dp(n: String) = s"CAST($n AS DOUBLE)"
      def corr(a: String, b: String) =
        s"round((CAST(n AS DOUBLE) * ${dp(s"p_${a}_$b")} - ${dp(s"s_$a")} * ${dp(s"s_$b")}) / " +
          s"nullif(sqrt((CAST(n AS DOUBLE) * ${dp(s"p_${a}_$a")} - ${dp(s"s_$a")} * ${dp(s"s_$a")}) * " +
          s"(CAST(n AS DOUBLE) * ${dp(s"p_${b}_$b")} - ${dp(s"s_$b")} * ${dp(s"s_$b")})), 0.0), 6)"
      val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
        yield (s"${cols(i)._2}~${cols(j)._2}", cols(i)._2, cols(j)._2)
      val branches = pairs.map { case (label, a, b) =>
        s"SELECT '$label' AS pair, n, ${corr(a, b)} AS corr FROM s"
      }
      s"WITH s AS (SELECT count(*) AS n, ${sums.mkString(", ")} FROM lineitem) " +
        branches.mkString(" UNION ALL ") + " ORDER BY pair"
    },
    "a_ols_multi" -> {
      // DECIMAL(19,6) per the a_corr_matrix lesson: DuckDB multiplies
      // (18,6) physically in int64 and overflows on price² — 19 digits
      // forces hugeint; the product VALUES are identical to Spark's.
      def q(c: String) = s"CAST($c AS DECIMAL(19,6))"
      def dp(c: String) = s"CAST($c AS DOUBLE)"
      val (s1, s2, sy) = (dp("s1"), dp("s2"), dp("sy"))
      val (s11, s12, s22) = (dp("s11"), dp("s12"), dp("s22"))
      val (s1y, s2y, syy) = (dp("s1y"), dp("s2y"), dp("syy"))
      val nD = "CAST(n AS DOUBLE)"
      val det = s"$nD * ($s11 * $s22 - $s12 * $s12) - $s1 * ($s1 * $s22 - $s12 * $s2) + $s2 * ($s1 * $s12 - $s11 * $s2)"
      val det0 = s"$sy * ($s11 * $s22 - $s12 * $s12) - $s1 * ($s1y * $s22 - $s12 * $s2y) + $s2 * ($s1y * $s12 - $s11 * $s2y)"
      val det1 = s"$nD * ($s1y * $s22 - $s12 * $s2y) - $sy * ($s1 * $s22 - $s12 * $s2) + $s2 * ($s1 * $s2y - $s1y * $s2)"
      val det2 = s"$nD * ($s11 * $s2y - $s1y * $s12) - $s1 * ($s1 * $s2y - $s1y * $s2) + $sy * ($s1 * $s12 - $s11 * $s2)"
      "WITH m AS (SELECT count(*) AS n, " +
        s"sum(${q("l_quantity")}) AS s1, sum(${q("l_discount")}) AS s2, " +
        s"sum(${q("l_extendedprice")}) AS sy, " +
        s"sum(${q("l_quantity")} * ${q("l_quantity")}) AS s11, " +
        s"sum(${q("l_quantity")} * ${q("l_discount")}) AS s12, " +
        s"sum(${q("l_discount")} * ${q("l_discount")}) AS s22, " +
        s"sum(${q("l_quantity")} * ${q("l_extendedprice")}) AS s1y, " +
        s"sum(${q("l_discount")} * ${q("l_extendedprice")}) AS s2y, " +
        s"sum(${q("l_extendedprice")} * ${q("l_extendedprice")}) AS syy " +
        "FROM lineitem), " +
        s"b AS (SELECT n, ($det0) / nullif($det, 0.0) AS b0, " +
        s"($det1) / nullif($det, 0.0) AS b1, " +
        s"($det2) / nullif($det, 0.0) AS b2, " +
        s"$sy AS syD, $s1y AS s1yD, $s2y AS s2yD, $syy AS syyD, " +
        s"$sy * $sy / $nD AS sy2n FROM m) " +
        "SELECT n, round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2, " +
        "round(1.0 - (syyD - b0 * syD - b1 * s1yD - b2 * s2yD) / " +
        "nullif(syyD - sy2n, 0.0), 6) AS r2 FROM b"
    },

    "a_pareto" ->
      ("WITH rev AS (SELECT o_custkey, " +
        "sum(CAST(o_totalprice AS DECIMAL(38,6))) AS rev " +
        "FROM orders GROUP BY o_custkey), " +
        "dc AS (SELECT o_custkey, rev, " +
        "ntile(10) OVER (ORDER BY rev DESC, o_custkey ASC) AS decile FROM rev), " +
        "agg AS (SELECT decile, count(*) AS n_cust, sum(rev) AS rev_dec " +
        "FROM dc GROUP BY decile) " +
        "SELECT decile, n_cust, " +
        "round(CAST(rev_dec AS DOUBLE), 6) AS rev_dec, " +
        "round(CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER () AS DOUBLE), 6) AS share " +
        "FROM agg ORDER BY decile"),
    "a_gini" ->
      ("WITH rev AS (SELECT o_custkey, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DECIMAL(25,6)) AS rev " +
        "FROM orders GROUP BY o_custkey), " +
        "rk AS (SELECT rev, CAST(row_number() OVER (ORDER BY rev ASC, o_custkey ASC) AS DECIMAL(12,0)) AS i FROM rev), " +
        "ag AS (SELECT count(*) AS n, sum(i * rev) AS swr, sum(rev) AS tot FROM rk) " +
        "SELECT n, round(CAST(tot AS DOUBLE), 6) AS total_rev, " +
        "round(2.0 * CAST(swr AS DOUBLE) / (n * CAST(tot AS DOUBLE)) - " +
        "CAST(n + 1 AS DOUBLE) / n, 6) AS gini FROM ag"),
    "a_ttest" ->
      ("WITH s AS (SELECT " +
        "CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r, " +
        "sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(19,6)) ELSE CAST(0 AS DECIMAL(19,6)) END) AS s_a, " +
        "sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(19,6)) ELSE CAST(0 AS DECIMAL(19,6)) END) AS s_r, " +
        "sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)) ELSE CAST(0 AS DECIMAL(38,12)) END) AS ss_a, " +
        "sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)) ELSE CAST(0 AS DECIMAL(38,12)) END) AS ss_r " +
        "FROM lineitem WHERE l_returnflag IN ('A', 'R')), " +
        "m AS (SELECT n_a, n_r, " +
        "CAST(s_a AS DOUBLE)/n_a AS m_a, CAST(s_r AS DOUBLE)/n_r AS m_r, " +
        "CAST(ss_a AS DOUBLE) AS ssa, CAST(ss_r AS DOUBLE) AS ssr FROM s), " +
        "v AS (SELECT *, (ssa - n_a * m_a * m_a)/(n_a - 1) AS v_a, " +
        "(ssr - n_r * m_r * m_r)/(n_r - 1) AS v_r FROM m), " +
        "se AS (SELECT *, v_a/n_a AS se2a, v_r/n_r AS se2r FROM v) " +
        "SELECT n_a, n_r, round(m_a, 6) AS mean_a, round(m_r, 6) AS mean_r, " +
        "round((m_a - m_r)/sqrt(se2a + se2r), 6) AS t_stat, " +
        "round((se2a + se2r)*(se2a + se2r)/(se2a*se2a/(n_a - 1) + se2r*se2r/(n_r - 1)), 6) AS df " +
        "FROM se"),
    "x_drift_embed" ->
      ("WITH e AS (SELECT vec_id, r.i AS pos, embedding[r.i+1] AS v " +
        "FROM embeddings CROSS JOIN range(0,64) r(i)), " +
        "sums AS (SELECT pos, " +
        "sum(CASE WHEN vec_id % 2 = 0 THEN CAST(CAST(v AS DOUBLE) AS DECIMAL(19,6)) ELSE CAST(0 AS DECIMAL(19,6)) END) AS s_ref, " +
        "sum(CASE WHEN vec_id % 2 <> 0 THEN CAST(CAST(v AS DOUBLE) AS DECIMAL(19,6)) ELSE CAST(0 AS DECIMAL(19,6)) END) AS s_cur, " +
        "CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref, " +
        "CAST(sum(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur " +
        "FROM e GROUP BY pos), " +
        "m AS (SELECT pos, n_ref, n_cur, " +
        "CAST(round(CAST(s_ref AS DOUBLE)/n_ref, 6) AS DECIMAL(19,6)) AS m_ref, " +
        "CAST(round(CAST(s_cur AS DOUBLE)/n_cur, 6) AS DECIMAL(19,6)) AS m_cur FROM sums), " +
        "ag AS (SELECT any_value(n_ref) AS n_ref, any_value(n_cur) AS n_cur, " +
        "sum(m_ref*m_cur) AS num, sum(m_ref*m_ref) AS nr2, sum(m_cur*m_cur) AS nc2, " +
        "sum(CAST(m_ref - m_cur AS DECIMAL(19,6)) * CAST(m_ref - m_cur AS DECIMAL(19,6))) AS l2sq FROM m), " +
        "top AS (SELECT CAST(pos AS BIGINT) AS max_dim, " +
        "round(CAST(abs(m_ref - m_cur) AS DOUBLE), 6) AS max_abs_delta " +
        "FROM m ORDER BY abs(m_ref - m_cur) DESC, pos ASC LIMIT 1) " +
        "SELECT n_ref, n_cur, " +
        "round(CAST(num AS DOUBLE)/nullif(sqrt(CAST(nr2 AS DOUBLE))*sqrt(CAST(nc2 AS DOUBLE)), 0), 6) AS centroid_cos, " +
        "round(sqrt(CAST(l2sq AS DOUBLE)), 6) AS centroid_l2, max_dim, max_abs_delta " +
        "FROM ag CROSS JOIN top"),
    // the quadratic index explode is fine for DuckDB at 500 vectors — the
    // Spark side's whole point is NOT doing this
    "x_emb_cov" ->
      ("WITH idx AS (SELECT a.i, b.j FROM range(0,64) a(i) CROSS JOIN range(0,64) b(j) WHERE b.j >= a.i), " +
        "cell AS (SELECT i, j, count(*) AS n, " +
        "sum(CAST(CAST(embedding[i+1] AS DOUBLE) AS DECIMAL(19,6)) * " +
        "CAST(CAST(embedding[j+1] AS DOUBLE) AS DECIMAL(19,6))) AS sxy " +
        "FROM embeddings CROSS JOIN idx GROUP BY i, j), " +
        "ds AS (SELECT r.i, " +
        "sum(CAST(CAST(embedding[r.i+1] AS DOUBLE) AS DECIMAL(19,6))) AS sx " +
        "FROM embeddings CROSS JOIN range(0,64) r(i) GROUP BY r.i) " +
        "SELECT c.i, c.j, c.n, " +
        "round(CAST(sxy AS DOUBLE) / n, 6) + 0.0 AS gram_mean, " +
        "round(CAST(sxy AS DOUBLE) / n - (CAST(sa.sx AS DOUBLE) / n) * (CAST(sb.sx AS DOUBLE) / n), 6) + 0.0 AS cov " +
        "FROM cell c JOIN ds sa ON sa.i = c.i JOIN ds sb ON sb.i = c.j " +
        "ORDER BY c.i, c.j"),
    // the same 8-round power iteration UNROLLED as CTE rounds (the
    // pagerank oracle device); decimals (19,6) for hugeint physical
    "x_emb_pca" -> {
      val base =
        "WITH idx AS MATERIALIZED (SELECT a.i, b.j FROM range(0,64) a(i) CROSS JOIN range(0,64) b(j) WHERE b.j >= a.i), " +
          "cell AS MATERIALIZED (SELECT i, j, count(*) AS n, " +
          "sum(CAST(CAST(embedding[i+1] AS DOUBLE) AS DECIMAL(19,6)) * " +
          "CAST(CAST(embedding[j+1] AS DOUBLE) AS DECIMAL(19,6))) AS sxy " +
          "FROM embeddings CROSS JOIN idx GROUP BY i, j), " +
          "ds AS MATERIALIZED (SELECT r.i, " +
          "sum(CAST(CAST(embedding[r.i+1] AS DOUBLE) AS DECIMAL(19,6))) AS sx " +
          "FROM embeddings CROSS JOIN range(0,64) r(i) GROUP BY r.i), " +
          "covt AS MATERIALIZED (SELECT c.i, c.j, " +
          "CAST(round(CAST(sxy AS DOUBLE)/n - (CAST(sa.sx AS DOUBLE)/n) * (CAST(sb.sx AS DOUBLE)/n), 6) AS DECIMAL(19,6)) AS cv " +
          "FROM cell c JOIN ds sa ON sa.i = c.i JOIN ds sb ON sb.i = c.j), " +
          "covf AS MATERIALIZED (SELECT i, j, cv FROM covt " +
          "UNION ALL SELECT j AS i, i AS j, cv FROM covt WHERE i <> j), " +
          "v0 AS MATERIALIZED (SELECT r.i AS j, CAST(0.125 AS DECIMAL(19,6)) AS vj FROM range(0,64) r(i)), "
      val rounds = (1 to 8).map { r =>
        s"w$r AS MATERIALIZED (SELECT m.i, sum(m.cv * v.vj) AS wd FROM covf m " +
          s"JOIN v${r - 1} v ON m.j = v.j GROUP BY m.i), " +
          s"wr$r AS MATERIALIZED (SELECT i, CAST(round(CAST(wd AS DOUBLE), 6) AS DECIMAL(19,6)) AS wr FROM w$r), " +
          s"v$r AS MATERIALIZED (SELECT i AS j, " +
          s"CAST(round(CAST(wr AS DOUBLE) / nullif(sqrt((SELECT CAST(sum(wr*wr) AS DOUBLE) FROM wr$r)), 0), 6) AS DECIMAL(19,6)) AS vj " +
          s"FROM wr$r), "
      }.mkString
      base + rounds.stripSuffix(", ") + " " +
        "SELECT CAST(v8.j AS BIGINT) AS i, CAST(v8.vj AS DOUBLE) AS v, " +
        "(SELECT round(sqrt(CAST(sum(wr*wr) AS DOUBLE)), 6) FROM wr8) AS eigval " +
        "FROM v8 ORDER BY i"
    },
    "x_drift_ks" ->
      ("WITH pv AS (SELECT n_chars AS v, " +
        "sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS d1, " +
        "sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS d2 " +
        "FROM documents GROUP BY n_chars), " +
        "cum AS (SELECT v, " +
        "CAST(sum(d1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1, " +
        "CAST(sum(d2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2, " +
        "CAST(sum(d1) OVER () AS BIGINT) AS t1, " +
        "CAST(sum(d2) OVER () AS BIGINT) AS t2 FROM pv) " +
        "SELECT v AS at_value, t1, t2, " +
        "abs(c1*t2 - c2*t1) AS d_num, " +
        "round(CAST(abs(c1*t2 - c2*t1) AS DOUBLE) / (t1*t2), 6) AS ks " +
        "FROM cum ORDER BY abs(c1*t2 - c2*t1) DESC, v ASC LIMIT 1"),
    "x_drift_psi" ->
      ("WITH mm AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents), " +
        "cells AS (SELECT (n_chars - mn) * 10 // (mx - mn + 1) AS bin, " +
        "sum(CASE WHEN length(source) = 4 THEN 1 ELSE 0 END) AS n_ref, " +
        "sum(CASE WHEN length(source) = 4 THEN 0 ELSE 1 END) AS n_cur " +
        "FROM documents, mm GROUP BY 1), " +
        "tt AS (SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur, " +
        "CAST(sum(n_ref) OVER () AS BIGINT) AS t_ref, " +
        "CAST(sum(n_cur) OVER () AS BIGINT) AS t_cur FROM cells), " +
        "tm AS (SELECT bin, n_ref, n_cur, " +
        "CAST(n_ref + 1 AS DOUBLE) / (t_ref + 10) AS p, " +
        "CAST(n_cur + 1 AS DOUBLE) / (t_cur + 10) AS q FROM tt), " +
        "term AS (SELECT bin, n_ref, n_cur, p, q, " +
        "round((p - q) * ln(p / q), 6) AS term FROM tm) " +
        "SELECT bin, n_ref, n_cur, round(p, 6) AS p, round(q, 6) AS q, term, " +
        "round(CAST(sum(CAST(term AS DECIMAL(38,6))) OVER () AS DOUBLE), 6) AS psi " +
        "FROM term ORDER BY bin"),
    "x_quality_winsorize" ->
      ("WITH p AS (SELECT lang, " +
        "round(quantile_cont(n_chars, 0.05), 6) AS lo, " +
        "round(quantile_cont(n_chars, 0.95), 6) AS hi " +
        "FROM documents GROUP BY lang), " +
        "c AS (SELECT d.lang, lo, hi, n_chars, " +
        "least(greatest(CAST(n_chars AS DOUBLE), lo), hi) AS wv " +
        "FROM documents d JOIN p USING (lang)) " +
        "SELECT lang, count(*) AS n_docs, " +
        "any_value(lo) AS lo, any_value(hi) AS hi, " +
        "round(CAST(sum(CAST(wv AS DECIMAL(38,6))) AS DOUBLE)/count(*), 6) AS wmean, " +
        "round(CAST(sum(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE)/count(*), 6) AS rmean " +
        "FROM c GROUP BY lang ORDER BY lang")
  )
}
