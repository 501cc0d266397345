package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.portableHash60

/** Statistical quality-assurance tooling for corpus pipelines: where to
  * spend a human-review budget ([[neymanAllocation]]) and how much to trust
  * a pipeline metric ([[jackknifeVariance]]). Both are engine-portable
  * deterministic — integer moments end-to-end, with the single `sqrt`
  * (IEEE-mandated correctly-rounded, so bit-identical in any engine)
  * floored to an integer weight before any division.
  */
object QaSampling {

  /** Neyman-optimal allocation of a review budget across domains: sample
    * size per stratum ∝ n_h·σ_h. With integer scores, n·σ collapses to
    * `sqrt(n·Σx² − (Σx)²)` — the per-domain second moment — so the whole
    * allocation is integer moments + one floored sqrt + integer division:
    * `alloc_h = budget · w_h div Σw`. High-variance domains get the
    * reviewers; uniform domains (σ = 0) get none regardless of size.
    *
    * 100 TB shape: ONE aggregation shuffle (count/sum/sum-of-squares per
    * domain — map-side combined), then arithmetic over the domain-sized
    * result with the Σw scalar broadcast back. Overflow bound: n·Σx² must
    * stay within BIGINT — with |score| ≤ 10^4 that holds to ~10^11 docs
    * per domain (document and scale scores down past that). */
  def neymanAllocation(
      scored: DataFrame,
      domainCol: String,
      scoreCol: String,
      budget: Long
  ): DataFrame = {
    require(budget >= 0)
    val moments = scored.groupBy(col(domainCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(scoreCol)).as("__s1"),
        sum(col(scoreCol) * col(scoreCol)).as("__s2"))
      .withColumn("var_num",
        col("n_docs") * col("__s2") - col("__s1") * col("__s1"))
      .withColumn("w", floor(sqrt(col("var_num").cast("double"))).cast("long"))
    val total = moments.agg(sum(col("w")).as("__tw"))
    moments.crossJoin(broadcast(total))
      .withColumn("alloc",
        when(col("__tw") === 0, lit(0L))
          .otherwise(expr(s"($budget * w) div __tw")))
      .select(col(domainCol), col("n_docs"), col("var_num"), col("w"),
        col("alloc"))
  }

  /** Delete-a-group jackknife for a corpus mean: rows split into `buckets`
    * deterministic hash groups; each leave-one-group-out mean is held as
    * the exact integer `floor(1e6·(S−S_b)/(N−N_b))`, and the output is the
    * one-row moment summary (Σm, Σm², and the integer variance numerator
    * `B·Σm² − (Σm)²`) from which the jackknife standard error of the mean
    * is `sqrt((B−1)/B · Var(m))/1e6` — client-side arithmetic on exact
    * integers, so the gate hash-matches. No floating-point SUM ever runs
    * (a 10-term double Σ is already summation-order-sensitive).
    *
    * 100 TB shape: one bucket-keyed aggregation (B groups, map-side
    * combined) then a one-row roll-up. */
  def jackknifeVariance(
      scored: DataFrame,
      idCol: String,
      scoreCol: String,
      buckets: Int = 10
  ): DataFrame = {
    require(buckets >= 2)
    val b = scored
      .select(
        pmod(portableHash60(col(idCol).cast("string")), lit(buckets.toLong))
          .as("__b"),
        col(scoreCol).as("__x"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val tot = b.agg(sum(col("__n")).as("__tn"), sum(col("__s")).as("__ts"))
    b.crossJoin(broadcast(tot))
      .withColumn("__m",
        expr("(1000000 * (__ts - __s)) div (__tn - __n)"))
      .agg(
        max(col("__tn")).as("n_rows"),
        count(lit(1)).as("n_buckets"),
        sum(col("__m")).as("sum_m"),
        sum(col("__m") * col("__m")).as("sum_m2"))
      .withColumn("var_num",
        col("n_buckets") * col("sum_m2") - col("sum_m") * col("sum_m"))
  }

  /** Per-group ordinary least squares y = intercept + slope·x over INTEGER
    * x/y columns — the drift detector behind "is this metric trending"
    * dashboards (daily quality, volume, error rates). All five moments
    * (n, Σx, Σy, Σxy, Σx²) are exact integer sums — order-independent,
    * engine-identical — and each coefficient is ONE double division of two
    * exact integers (slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), intercept =
    * (ΣyΣx²−ΣxΣxy)/same), so `round(..., 6)` agrees bit-for-bit. NULL
    * coefficients when x is constant (zero denominator).
    *
    * 100 TB shape: ONE aggregation shuffle, map-side combined; everything
    * after is arithmetic on the group-sized result. Overflow: moments and
    * their cross-products must stay within BIGINT — with |x| ≤ 10^5 and
    * |y| ≤ 10^6 that holds to ~10^7 rows per group; bucket x (e.g. days,
    * not µs) and scale y down accordingly, or move the moments to
    * DECIMAL(38,0) past that. */
  def olsPerGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
      .withColumn("slope",
        when(den === 0, lit(null).cast("double")).otherwise(round(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / den, 6)))
      .withColumn("intercept",
        when(den === 0, lit(null).cast("double")).otherwise(round(
          (col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
            / den, 6)))
      .select(col(groupCol), col("n"), col("slope"), col("intercept"))
  }

  /** The Wilson 95% interval as a SQL expression over `__p` (rate) and
    * `__nn` (trials, double) — kept as ONE shared text so the Spark plan
    * and the DuckDB oracle parse the byte-identical formula: every +,*,/
    * and the correctly-rounded sqrt then evaluate in the same IEEE order. */
  private def wilson(sign: String): String =
    s"round((__p + 3.8416/(2*__nn)) / (1 + 3.8416/__nn) $sign " +
      s"1.96 * sqrt(__p*(1-__p)/__nn + 3.8416/(4*__nn*__nn)) / (1 + 3.8416/__nn), 6)"

  /** Wilson interval text for oracle construction (same string the Spark
    * plan parses, with `__p`/`__nn` substituted by the caller). */
  def wilsonSql(sign: String, p: String, nn: String): String =
    wilson(sign).replace("__p", p).replace("__nn", nn)

  /** Per-group rare-event rate with Wilson 95% bounds — the error-rate
    * monitor that stays honest at small n (a plain ±1.96√(pq/n) interval
    * leaves [0,1] and covers badly near 0). Groups under `minN` trials are
    * dropped: their intervals are vacuous and they dominate group counts.
    *
    * 100 TB shape: ONE count aggregation (map-side combined); the interval
    * is row-local arithmetic on the group-sized result. */
  def errorRateCi(df: DataFrame, groupCol: String, isErrCol: String,
      minN: Long): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(isErrCol), lit(1L)).otherwise(lit(0L))).as("n_err"))
      .filter(col("n") >= minN)
      .withColumn("__nn", col("n").cast("double"))
      .withColumn("__p", col("n_err").cast("double") / col("__nn"))
      .withColumn("lo", expr(wilson("-")))
      .withColumn("hi", expr(wilson("+")))
      .select(col(groupCol), col("n"), col("n_err"), col("lo"), col("hi"))

  /** Privacy-governance audit before a metadata table ships with a
    * corpus: k-anonymity (every quasi-identifier combination must cover
    * ≥ k rows) and l-diversity (each combination must carry ≥ l
    * DISTINCT sensitive values — a large group with one sensitive value
    * still leaks). One groupBy on the quasi-identifier tuple; exact
    * integer counts; emits per-combination rows with both verdicts so
    * the violating combinations ARE the remediation worklist. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_anonymous", col("n_rows") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }
}
