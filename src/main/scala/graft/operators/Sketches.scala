package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{portableHash60, hash60b}

/** Distributed sketches with engine-portable determinism.
  *
  * NULL contract: null hashes/items carry no identity and are dropped
  * before aggregation everywhere ([[kmvDistinct]], [[kmvSketch]],
  * [[hllRegisters]], [[countMin]], [[bloom]]) — so a group whose hashes
  * are ALL null is ABSENT from the output (no zero-estimate row). A
  * downstream join that needs per-group presence must left-join from the
  * group dimension and `coalesce(est, 0)`; emitting phantom zero rows
  * from inside the sketch would cost an extra unfiltered pass per build
  * for a regime (all-null group) the corpus tables never produce.
  *
  * [[kmvDistinct]] is the k-minimum-values distinct-count estimator
  * (Bar-Yossef et al. 2002): keep the k smallest distinct hash values per
  * group; if the k-th smallest is `h_k` on a hash space of size `H`, the
  * group has ≈ (k-1)·H/h_k distinct values. Unlike HyperLogLog (whose
  * register layout is engine-specific), KMV on [[
  * graft.functions.TextFunctions.portableHash60]] is bit-reproducible in
  * any engine — so it gets an exact DuckDB oracle, not a tolerance check.
  */
object Sketches {

  /** 2^60 — the size of the portableHash60 space (a power of two, so the
    * double literal is exact and the estimate division is bit-identical
    * across engines). */
  val Hash60Space: Double = 1152921504606846976.0

  /** KMV distinct-count estimate per group over a pre-hashed value column.
    *
    * Output: group columns + `est_distinct` (the KMV estimate; groups with
    * fewer than k distinct values fall back to the exact count, the
    * standard small-cardinality regime). With `includeExact = true` an
    * `n_exact` column (exact distinct hashes) is added so a demo/accuracy
    * run exhibits the estimator error — that branch re-aggregates the full
    * distinct frame and is NOT the production shape; the estimate alone is
    * the product, and the default keeps the sketch's single bounded pass.
    *
    * 100 TB shape (default): one shuffle to distinct (group, hash); the
    * k-minima ride [[graft.plans.TopKPerGroup]], whose partial bounded-heap
    * pass caps each partition at k rows per group BEFORE the exchange — the
    * sketch property (fixed k-row state per group) holds end-to-end, which
    * is the point of a sketch.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      hashCol: String,
      k: Int,
      includeExact: Boolean = false
  ): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    val g = groupCols.map(col)
    // null hashes carry no identity: drop them (the asc heap is
    // NULLS-FIRST, so a null would otherwise occupy a k-minima slot and
    // displace the true k-th minimum — a silent overestimate)
    val base = df.select((g :+ col(hashCol).as("__h")): _*)
      .filter(col("__h").isNotNull)
    // estimate path: TopKPerGroup's DISTINCT mode dedups inside the
    // bounded heaps, so no separate distinct exchange ever materializes —
    // the one clustering shuffle carries ≤ partitions×groups×k rows.
    // exact branch (opt-in): the full distinct frame is genuinely needed
    // for n_exact, shared via a lazy localCheckpoint (lifecycle is the
    // RDD's own — the ContextCleaner frees the blocks)
    val distinctHashes =
      if (includeExact) base.distinct().localCheckpoint(false) else base
    val minima = graft.plans.TopKPerGroup.distinct(
      distinctHashes, g, Seq(col("__h").asc), k)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("__n_seen"), max(col("__h")).as("__kth"))
    val withEst = minima
      .withColumn("est_distinct",
        when(col("__n_seen") < k, col("__n_seen"))
          .otherwise(floor(
            lit((k - 1).toDouble) * lit(Hash60Space)
              / col("__kth").cast("double")).cast("long")))
      .drop("__n_seen", "__kth")
    if (!includeExact) withEst
    else distinctHashes.groupBy(g: _*).agg(count(lit(1)).as("n_exact"))
      .join(withEst, groupCols)
  }

  /** Bucket of `item` in CMS row `j`: Kirsch–Mitzenmacher double hashing
    * `(h1 + j·h2) mod width` over two independent 60-bit md5 hashes
    * ([[portableHash60]] of the item and [[hash60b]] of that hash, salted
    * by the family seed). All-integer, engine-portable, and — unlike the
    * `(a·(x mod 2^31−1)+b)` universal family — row buckets depend on the
    * full 60-bit input, so mod-2^31 twins don't collide in every row
    * (which broke the e^-depth independence bound at ≥2^31 items). The
    * inner mods keep every operand < width·depth — no overflow.
    *
    * The step hash is forced into [1, width−1]: with `h2 ≡ 0 (mod width)`
    * every row bucket collapses to `h1 mod width` — probability 1/width
    * per item (1/16 at the width-16 oracle defaults), partially undoing
    * the independence double hashing buys. `1 + h2 mod (width−1)` cannot
    * be ≡ 0, and (width−1 coprime concerns aside) keeps the per-pair
    * collision probability at the 2^-60 double-hash bound. */
  private def cmsBucket(item: Column, seed: Long, j: Int,
      width: Int): Column = {
    val h1 = portableHash60(item)
    val step = lit(1L) + pmod(hash60b(h1, seed), lit((width - 1).toLong))
    pmod(pmod(h1, lit(width.toLong)) + lit(j.toLong) * step,
      lit(width.toLong))
  }

  /** Exact bit length of a NON-NEGATIVE long column: (hex digits − 1)·4 +
    * bits of the leading hex digit; 0 for 0. All-integer — avoids the
    * `floor(log2(x))` double trap (log2(2^52−1) rounds UP to 52.0, so the
    * floor misbins exactly the values a sketch cares about) — and has a
    * verbatim DuckDB twin via `printf('%x', x)` (case-insensitive leading
    * digit: only '1'/'2'-'3'/'4'-'7' matter, every letter falls to 4). */
  def bitLength(x: Column): Column = {
    val h = hex(x) // uppercase, no leading zeros
    val lead = when(substring(h, 1, 1) === "1", 1)
      .when(substring(h, 1, 1).isin("2", "3"), 2)
      .when(substring(h, 1, 1).isin("4", "5", "6", "7"), 3)
      .otherwise(4)
    when(x === 0L, 0).otherwise((length(h) - 1) * 4 + lead)
  }

  /** HyperLogLog distinct-count per group (Flajolet et al. 2007) on
    * [[portableHash60]] values — the engine-portable HLL the [[kmvDistinct]]
    * doc said generic implementations can't give you: the register layout
    * here is pinned to integer math both engines reproduce bit-for-bit
    * (index = hash mod m, payload = hash >> log2m, rank via [[bitLength]]),
    * so it gets an exact DuckDB oracle, not a tolerance check.
    *
    * The register table is held as exact INTEGER state: per register the
    * max-rank is kept as `2^bitLength(min payload)` (the two are monotone
    * duals), and the group roll-up sums those powers of two — `reg_sum` IS
    * `2^(B+1) · Σ 2^(−M_j)` as one overflow-safe BIGINT (B = 60 − log2m;
    * m ≤ 4096 keeps it < 2^63). The classic estimate
    * `α_m · m² / Σ 2^(−M_j)` then needs exactly ONE double op sequence —
    * constant numerator / reg_sum — identical in any IEEE engine, where a
    * float summation of 2^(−M) registers would be order-sensitive (terms
    * spanning 2^−1…2^−54 fall below the running sum's ulp).
    *
    * Output: groupCols + `n_zero_registers` (never-touched registers, what
    * linear-counting correction consumes), `reg_sum`, `est_distinct`
    * (floored raw estimate).
    *
    * 100 TB shape: ONE partial-agg shuffle keyed by (group, register) whose
    * map-side state is ≤ m rows per group — constant regardless of item
    * cardinality (the sketch property) — then a tiny group roll-up.
    * Merging day-sketches is the same min-agg run again. Unlike
    * [[kmvDistinct]] there is no distinct pass and no heap: strictly
    * cheaper per item, at the cost of HLL's higher variance per byte at
    * tiny cardinalities. */
  def hllDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      hashCol: String,
      log2m: Int = 6
  ): DataFrame =
    hllFromRegisters(hllRegisters(df, groupCols, hashCol, log2m),
      groupCols, log2m)

  /** The register table of [[hllDistinct]]: (group cols, `reg_idx`,
    * `reg_mb` = min payload bit-length). A plain min-agg, so it is also
    * the STREAMING maintenance shape: run it on a stream in update mode
    * and the sink always holds the current registers; [[hllFromRegisters]]
    * turns any register snapshot into estimates. Re-running the same
    * min-agg over the union of two register tables merges period sketches.
    */
  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      hashCol: String,
      log2m: Int = 6
  ): DataFrame = {
    require(log2m >= 4 && log2m <= 12, "hll needs 4 <= log2m <= 12")
    val m = 1 << log2m
    val g = groupCols.map(col)
    // a null hash would mint a phantom (null, null) register that counts
    // toward __present but contributes nothing to __s — reg_sum then loses
    // one untouched-register term and the estimate silently inflates
    df.filter(col(hashCol).isNotNull)
      .select((g :+ pmod(col(hashCol), lit(m.toLong)).as("reg_idx") :+
        bitLength(shiftright(col(hashCol), log2m)).as("reg_mb")): _*)
      .groupBy((g :+ col("reg_idx")): _*)
      .agg(min(col("reg_mb")).as("reg_mb"))
  }

  /** Group roll-up of an [[hllRegisters]] snapshot into
    * (n_zero_registers, reg_sum, est_distinct). */
  def hllFromRegisters(
      regs: DataFrame,
      groupCols: Seq[String],
      log2m: Int
  ): DataFrame = {
    val m = 1 << log2m
    val g = groupCols.map(col)
    val untouched = 1L << (60 - log2m + 1)
    regs.groupBy(g: _*)
      .agg(
        sum(call_function("shiftleft", lit(1L), col("reg_mb").cast("int")))
          .as("__s"),
        count(lit(1)).as("__present"))
      .withColumn("n_zero_registers", lit(m.toLong) - col("__present"))
      .withColumn("reg_sum",
        col("__s") + col("n_zero_registers") * lit(untouched))
      .withColumn("est_distinct",
        floor(lit(hllNumerator(log2m)) / col("reg_sum").cast("double"))
          .cast("long"))
      .drop("__s", "__present")
  }

  /** The constant HLL numerator α_m·m²·2^(B+1) as ONE double literal —
    * embed `hllNumerator(log2m).toString` verbatim in an oracle so both
    * engines divide the identical IEEE value (shortest-round-trip decimal
    * parses back to the same bits). */
  def hllNumerator(log2m: Int): Double = {
    val m = (1 << log2m).toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m * Math.pow(2.0, 61 - log2m)
  }

  /** Count-Min sketch per group (Cormode & Muthukrishnan 2005): a
    * `depth`×`width` integer count matrix; point-frequency estimates via
    * [[cmsEstimate]] are upper bounds that overshoot by at most
    * ε·N (ε ≈ e/width) with probability 1-δ (δ ≈ e^-depth). The
    * frequency-estimation companion to [[kmvDistinct]], and like it
    * bit-reproducible in any engine (fixed universal-hash params on
    * [[portableHash60]], integer adds — order-independent), so it gets an
    * exact DuckDB oracle, not a tolerance check.
    *
    * 100 TB shape: ONE aggregation shuffle keyed by group whose partial
    * state is the depth×width long matrix — the input stream never
    * re-shuffles and per-group state is constant-size regardless of item
    * cardinality (the sketch property). Output: groupCols + `cms`
    * (array[depth] of array[width] counts). Merging sketches across
    * partitions/days is element-wise addition — the same agg run again.
    *
    * Practical width bound: the agg materializes width×depth conditional
    * counts as expressions, and past ~2k aggregates whole-stage codegen
    * hits JVM method-size limits and falls back to interpreted (correct
    * but slower). For production widths (w ≥ 1024·d) use
    * [[countMinSparse]] — the identical sketch as (group, j, bucket,
    * count) rows with a plain codegen'd count; estimate-equality is
    * spec-pinned. */
  def countMin(
      items: DataFrame,
      groupCols: Seq[String],
      itemCol: String,
      width: Int,
      depth: Int,
      seed: Long = 7L
  ): DataFrame = {
    require(width >= 2 && depth >= 1)
    val g = groupCols.map(col)
    // null items hash to null buckets (match no cell); drop them so the
    // dense and sparse forms agree and no null cell rows materialize
    val nonNull = items.filter(col(itemCol).isNotNull)
    val withBuckets = (0 until depth).foldLeft(nonNull) { (df, j) =>
      df.withColumn(s"__b$j", cmsBucket(col(itemCol), seed, j, width))
    }
    withBuckets.groupBy(g: _*)
      .agg(array((0 until depth).map { j =>
        array((0 until width).map(i =>
          count(when(col(s"__b$j") === i, lit(1)))): _*)
      }: _*).as("cms"))
  }

  /** [[countMin]] at production widths: the identical sketch as
    * (group, j, bucket, count) ROWS instead of a dense matrix of
    * width×depth aggregate expressions — the restructure the dense form's
    * doc prescribes once w·d passes whole-stage codegen's method-size
    * limit (~2k aggregates). Only occupied cells materialize, the
    * aggregation is a plain count (always codegen'd), and merging sketches
    * is the same count-sum keyed by (group, j, bucket). Estimation twin:
    * [[cmsEstimateSparse]]. Dense↔sparse equality is spec-pinned. */
  def countMinSparse(
      items: DataFrame,
      groupCols: Seq[String],
      itemCol: String,
      width: Int,
      depth: Int,
      seed: Long = 7L
  ): DataFrame = {
    require(width >= 2 && depth >= 1)
    val g = groupCols.map(col)
    val cells = explode(array((0 until depth).map(j =>
      struct(lit(j).as("j"),
        cmsBucket(col(itemCol), seed, j, width).as("bucket"))): _*))
    items
      .filter(col(itemCol).isNotNull) // null items -> null cells: drop
      .select((g :+ cells.as("__c")): _*)
      .groupBy((g ++ Seq(col("__c.j").as("j"), col("__c.bucket").as("bucket"))): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sparse CMS sketches across a partition axis (per-day sketches →
    * the period sketch): Count-Min is LINEAR, so the cell-wise sum of
    * counts IS the sketch of the concatenated stream — bit-identical, not
    * approximately equal. This is the production shape: sketch each
    * partition/day once at ingest, answer any period by summing the tiny
    * cell tables, never re-touching events. `keepGroupCols` names the
    * group columns that survive the merge (the dropped ones are the merge
    * axis). */
  def cmsMergeSparse(sketch: DataFrame, keepGroupCols: Seq[String]): DataFrame =
    sketch
      .groupBy((keepGroupCols.map(col) ++ Seq(col("j"), col("bucket"))): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates from a [[countMinSparse]] sketch: per (group,
    * DISTINCT probe item), min over depth rows of the probe's cell count,
    * 0 for empty cells. NOT a row-for-row twin of [[cmsEstimate]]: probes
    * are treated as an item SET (duplicates collapse, carry-through
    * columns are not preserved) — join estimates back by item if per-row
    * context is needed. `groupCols` must name the sketch's group columns
    * explicitly (inference from remaining column names was a trap for
    * groups named j/bucket/cnt). `broadcastSketch = false` drops the
    * broadcast hints for sketches past executor memory (groups × d × w
    * occupied cells) — the join then shuffles keyed by
    * (group, j, bucket), exactly the fallback the dense form cannot
    * express. */
  def cmsEstimateSparse(
      sketch: DataFrame,
      probes: DataFrame,
      groupCols: Seq[String],
      itemCol: String,
      width: Int,
      depth: Int,
      seed: Long = 7L,
      broadcastSketch: Boolean = true
  ): DataFrame = {
    require(!groupCols.exists(Seq("j", "bucket", "cnt").contains),
      "group columns may not be named j/bucket/cnt")
    val hint: DataFrame => DataFrame =
      if (broadcastSketch) broadcast else identity
    val cells = explode(array((0 until depth).map(j =>
      struct(lit(j).as("j"),
        cmsBucket(col(itemCol), seed, j, width).as("bucket"))): _*))
    val probeCells = probes
      .withColumn("__c", cells)
      .select(col(itemCol), col("__c.j").as("j"), col("__c.bucket").as("bucket"))
    // grouped sketches: pair every probe cell with every group FIRST — an
    // empty cell must still count as 0 under ITS group, and the sketch
    // side of a left join cannot supply the group key for misses
    val base =
      if (groupCols.isEmpty) probeCells
      else probeCells.crossJoin(
        hint(sketch.select(groupCols.map(col): _*).distinct()))
    base
      .join(hint(sketch), groupCols.toSeq ++ Seq("j", "bucket"), "left")
      .groupBy((groupCols.map(col) :+ col(itemCol)): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Bit positions a pre-hashed item (a [[portableHash60]]/
    * [[graft.functions.TextFunctions.shingleHashes60]] value) sets in an
    * `mBits` Bloom filter: Kirsch–Mitzenmacher double hashing
    * `(h1 + j·h2) mod m` — the same bucket math as [[countMin]], for the
    * same reason (positions depend on the full 60-bit input; the
    * universal family's mod-2^31 collapse floored the FP rate at ~n/2^31
    * no matter how many bits were provisioned). All-integer and
    * engine-portable. */
  def bloomPositions(hash60: Column, mBits: Int, k: Int,
      seed: Long = 11L): Seq[Column] = {
    val m = lit(mBits.toLong)
    // step in [1, m-1]: h2 ≡ 0 (mod m) would collapse all k positions to
    // h1 mod m for that item (see cmsBucket)
    val h2m = lit(1L) + pmod(hash60b(hash60, seed), lit((mBits - 1).toLong))
    (0 until k).map { j =>
      pmod(pmod(hash60, m) + lit(j.toLong) * h2m, m)
    }
  }

  /** Bloom filter over a column of PRE-HASHED items: the membership
    * companion to [[countMin]] (Bloom 1970) — `mBits` bits, `k` hashes, no
    * false negatives, false-positive rate ≈ (1 - e^(-k·n/m))^k.
    *
    * Output: one row per 64-bit WORD that has any bit set
    * (`word_idx`, `word`) — the sparse packed representation. Constant
    * size (≤ m/64 rows) regardless of item count, so it broadcasts; build
    * cost is one map over the items plus one tiny aggregation keyed by
    * word index (≤ m/64 groups). Merging two filters is `bit_or` of the
    * word tables — the same agg run again. */
  def bloom(items: DataFrame, hashCol: String, mBits: Int, k: Int,
      seed: Long = 11L): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0 && k >= 1)
    val pos = explode(array(bloomPositions(col(hashCol), mBits, k, seed): _*))
    items
      .filter(col(hashCol).isNotNull) // null hash sets no bits
      .select(pos.as("__pos"))
      .select((col("__pos") / 64).cast("int").as("word_idx"),
        call_function("shiftleft", lit(1L),
          pmod(col("__pos"), lit(64)).cast("int")).as("__m"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(__m)").as("word"))
  }

  /** Membership probe against a [[bloom]] word table: appends
    * `bloom_hit` (true = all k bits set — item possibly in the set; false
    * = DEFINITELY absent). The word table collapses to ONE broadcast row
    * (a word_idx → word map), so the probe is pure map-side — the stream
    * side never shuffles and never joins per-position. */
  def bloomMightContain(probes: DataFrame, bloomWords: DataFrame,
      hashCol: String, mBits: Int, k: Int, seed: Long = 11L): DataFrame = {
    val dense = bloomWords.agg(
      map_from_entries(collect_list(struct(col("word_idx"), col("word"))))
        .as("__bloom"))
    val hit = bloomPositions(col(hashCol), mBits, k, seed)
      .map { p =>
        coalesce(
          element_at(col("__bloom"), (p / 64).cast("int"))
            .bitwiseAND(call_function("shiftleft", lit(1L),
              pmod(p, lit(64)).cast("int")))
            =!= 0L,
          lit(false))
      }
      .reduce(_ && _)
    probes.crossJoin(broadcast(dense))
      .withColumn("bloom_hit", hit)
      .drop("__bloom")
  }

  /** Point-frequency estimates from a [[countMin]] sketch: for every
    * (group, probe) pair, `est_count` = min over the depth rows of the
    * probe's bucket count — ≥ the true count always, = for items whose
    * buckets saw no collisions. The sketch side is one row per group —
    * broadcast — so estimation is map-only over the probe stream. */
  def cmsEstimate(
      sketch: DataFrame,
      probes: DataFrame,
      itemCol: String,
      width: Int,
      depth: Int,
      seed: Long = 7L
  ): DataFrame = {
    val rows = (0 until depth).map { j =>
      element_at(element_at(col("cms"), j + 1),
        (cmsBucket(col(itemCol), seed, j, width) + 1).cast("int"))
    }
    val est = if (depth == 1) rows.head else least(rows: _*)
    probes.crossJoin(broadcast(sketch))
      .withColumn("est_count", est)
      .drop("cms")
  }

  // ---------------- HDR-histogram quantile sketch --------------------

  /** Integer HDR-histogram bucket id for a NON-NEGATIVE long value —
    * the mergeable quantile-sketch primitive. Values below 2^(mBits+1)
    * map to THEMSELVES (small values are exact); a larger value keeps its
    * top mBits+1 bits:
    *   shift = bitLength(v) − mBits − 1
    *   id    = 2^(mBits+1) + (shift−1)·2^mBits + ((v >> shift) − 2^mBits)
    * The id is monotone in v and the bucket width is 2^shift ≤
    * lowerBound·2^−mBits, so any quantile read from bucket lower bounds
    * underestimates by a RELATIVE error ≤ 2^−mBits. Unlike KLL-style
    * compaction sketches, the histogram is a pure per-bucket count:
    * merging is addition — associative, commutative, merge-ORDER
    * independent — so Spark's nondeterministic partial-aggregation order
    * cannot change the result, and the whole pipeline (bucket id, counts,
    * rank walk) is integer arithmetic with a verbatim DuckDB twin
    * ([[bitLength]]'s hex trick; `>>` on columns). State per group is
    * bounded by 64·2^mBits buckets regardless of data volume. */
  def hdrBucket(v: Column, mBits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.ShiftRight
    val base = 1L << (mBits + 1)
    val shiftC = (bitLength(v) - lit(mBits + 1)).cast("int")
    val mant = column(ShiftRight(expression(v), expression(shiftC)))
    when(v < lit(base), v)
      .otherwise(lit(base) + (shiftC.cast("long") - 1) * lit(1L << mBits) +
        (mant - lit(1L << mBits)))
  }

  /** Smallest value mapping to `id` — the quantile read-out value. */
  def hdrLowerBound(id: Column, mBits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.ShiftLeft
    import graft.functions.Predicates.idiv
    val base = 1L << (mBits + 1)
    val m = 1L << mBits
    val off = id - lit(base)
    val shift = (idiv(off, lit(m)) + lit(1L)).cast("int")
    val mant = lit(m) + off % lit(m)
    when(id < lit(base), id)
      .otherwise(column(ShiftLeft(expression(mant), expression(shift))))
  }

  /** Per-group HDR histogram: (groupCols..., bucket_id, cnt). The sketch
    * artifact — write it per partition/day at ingest; any period's
    * quantiles come from summing these tiny tables ([[hdrMerge]]),
    * never re-touching the raw rows. One (group, bucket) partial-agg
    * shuffle; map-side state bounded by the bucket domain. */
  def hdrHistogram(df: DataFrame, groupCols: Seq[String], value: Column,
      mBits: Int): DataFrame =
    df.select(groupCols.map(col) :+ hdrBucket(value, mBits).as("bucket_id"): _*)
      .groupBy((groupCols :+ "bucket_id").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge histogram sketches by bucket-wise addition (drop the merge-axis
    * columns from `keepGroupCols`) — linearity makes period sketches sum
    * to the whole-stream sketch exactly. */
  def hdrMerge(sketch: DataFrame, keepGroupCols: Seq[String]): DataFrame =
    sketch.groupBy((keepGroupCols :+ "bucket_id").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantiles from an HDR histogram: for each probability p (in ppm),
    * the lower bound of the bucket holding the rank-⌈p·n⌉ value (1-based
    * cumulative rank) — columns `p<ppm>`. Integer rank arithmetic; the
    * guaranteed read-out is an underestimate within 2^−mBits relative. */
  def hdrQuantiles(hist: DataFrame, groupCols: Seq[String], mBits: Int,
      probsPpm: Seq[Long]): DataFrame = {
    import graft.functions.Predicates.idiv
    import org.apache.spark.sql.expressions.Window
    require(probsPpm.nonEmpty && probsPpm.forall(p => p > 0 && p <= 1000000L),
      "probabilities are ppm in (0, 1e6]")
    val gw = Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("__cw", sum(col("cnt")).over(gw.orderBy(col("bucket_id"))))
      .withColumn("__n", sum(col("cnt")).over(gw))
    val aggs = probsPpm.map { p =>
      val rank = idiv(col("__n") * lit(p) + lit(999999L), lit(1000000L))
      min(when(col("__cw") >= rank, hdrLowerBound(col("bucket_id"), mBits)))
        .as(s"p$p")
    }
    cum.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** KMV sketch ARTIFACT per group: the sorted k smallest DISTINCT hash
    * values as one array row (`kmv`), the state [[kmvDistinct]] consumes
    * internally but exposed so it can be stored, merged, and — the point —
    * compared ACROSS groups without ever joining the raw streams
    * ([[kmvOverlapPairs]]). Same bounded plan as [[kmvDistinct]]: the
    * k-minima ride [[graft.plans.TopKPerGroup]]'s distinct bounded heaps
    * (≤ k rows per group cross the exchange), then one ≤k-row roll-up per
    * group. Merging two sketches is `slice(array_sort(array_union), 1, k)`
    * — closed under union, the KMV composability property. */
  def kmvSketch(
      df: DataFrame,
      groupCols: Seq[String],
      hashCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    val g = groupCols.map(col)
    // null hashes dropped — same NULLS-FIRST heap-slot trap as kmvDistinct
    val capped = graft.plans.TopKPerGroup.distinct(
      df.select((g :+ col(hashCol).as("__h")): _*)
        .filter(col("__h").isNotNull), g, Seq(col("__h").asc), k)
    capped.groupBy(g: _*)
      .agg(sort_array(collect_list(col("__h"))).as("kmv"))
  }

  /** Merge [[kmvSketch]] artifacts across a partition axis (per-day
    * sketches → the period sketch), the [[cmsMergeSparse]]/[[hdrMerge]]
    * twin for KMV: closure under union makes the k smallest distinct
    * hashes of the merged arrays exactly the sketch of the concatenated
    * streams. `keepGroupCols` names the group columns that survive; the
    * dropped ones are the merge axis. One ≤k·axes-row agg per kept
    * group. */
  def kmvMergeSketches(sketch: DataFrame, keepGroupCols: Seq[String],
      k: Int): DataFrame =
    sketch.groupBy(keepGroupCols.map(col): _*)
      .agg(slice(array_sort(array_distinct(
        flatten(collect_list(col("kmv"))))), 1, k).as("kmv"))

  /** Distinct-count estimate from a k-minima array: groups still below k
    * distinct values report exactly, else (k-1)·H/h_k (the
    * [[kmvDistinct]] estimator on the stored artifact). */
  private def kmvEstFromArr(arr: Column, k: Int): Column = {
    val n = size(arr)
    when(n < k, n.cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(Hash60Space)
        / element_at(arr, -1).cast("double")).cast("long"))
  }

  /** Cross-group set-overlap estimates from stored [[kmvSketch]] artifacts
    * — distinct-union, Jaccard and distinct-intersection for every
    * unordered group pair, WITHOUT touching the raw streams (Beyer et al.
    * 2007, "On Synopses for Distinct-Value Estimation"): the union of two
    * KMV sketches is itself the KMV sketch of the unioned stream, and the
    * fraction ρ of the union sketch's minima present in BOTH input
    * sketches is an unbiased Jaccard estimator, so
    * `intersection ≈ ρ · union`.
    *
    * Output per pair (`groupCol` asc): `est_union`, `jaccard_ppm`
    * (⌊10⁶·ρ⌋), `est_intersection` (⌊ρ·est_union⌋). Pairs in the
    * below-k regime degrade to EXACT set arithmetic automatically (the
    * sketches then ARE the full hash sets).
    *
    * 100 TB shape: the expensive pass is [[kmvSketch]] — one bounded
    * shuffle per stream, done once at ingest; this comparison is a
    * self-join of |groups| k-length arrays (sketch-sized, broadcastable at
    * any corpus scale) with pure codegen'd array math per pair — the
    * "estimate cross-source contamination without an n²-row join" query a
    * 100 TB curation run actually asks. */
  def kmvOverlapPairs(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    val a = sketch.select(col(groupCol).as("__ga"), col("kmv").as("__ka"))
    val b = sketch.select(col(groupCol).as("__gb"), col("kmv").as("__kb"))
    val merged = slice(array_sort(array_union(col("__ka"), col("__kb"))), 1, k)
    val pairs = a.join(broadcast(b), col("__ga") < col("__gb"))
      .withColumn("__m", merged)
      .withColumn("__nu", size(col("__m")).cast("double"))
      .withColumn("__nb",
        size(array_intersect(col("__m"),
          array_intersect(col("__ka"), col("__kb")))).cast("double"))
      .withColumn("est_union", kmvEstFromArr(col("__m"), k))
    pairs.select(
      col("__ga").as(s"${groupCol}_a"),
      col("__gb").as(s"${groupCol}_b"),
      col("est_union"),
      floor(lit(1000000.0) * col("__nb") / col("__nu")).cast("long")
        .as("jaccard_ppm"),
      floor(col("est_union").cast("double") * col("__nb") / col("__nu"))
        .cast("long").as("est_intersection"))
  }

  /** EXACT φ-heavy-hitters with a sketch-gated exchange: every item whose
    * count exceeds `phiPpm` parts-per-million of the stream, with its
    * exact count — equal row-for-row to `GROUP BY item HAVING count ≥
    * ⌈φ·N⌉` (the staged-decontamination discipline from
    * [[graft.operators.CorpusOps]]: sketch-gate, exact-confirm, provably
    * exact).
    *
    * Plan: (1) ONE bounded Count-Min build ([[countMinSparse]]: partial
    * agg keyed by (j, bucket), ≤ depth·width rows total); (2) the cell
    * table — sketch-sized by construction — is collected and re-emitted
    * as a LITERAL array, the same bounded 1-collect discipline as
    * [[graft.operators.SkewJoin.autoJoin]]'s audit row (N itself falls
    * out of row 0's cell sum, so no extra count job); (3) a map-only
    * gate: each item row looks up its depth cells in the literal
    * (`least` of `element_at`s — pure codegen, no join, no shuffle) and
    * only rows whose CMS estimate clears the threshold reach the exact
    * count exchange; (4) exact `HAVING` confirm.
    *
    * Why it's exact: CMS never undercounts, so the gate passes every true
    * heavy hitter (no false negatives); the final exact filter removes
    * collision-inflated impostors. Why it scales: the heavy tail of a
    * 100 TB token stream — the billions of sub-threshold items that
    * dominate a naive wordcount's exchange — is dropped map-side; the
    * shuffle carries only ~1/φ candidates (+ collision noise tuned by
    * `width`). */
  def heavyHittersExact(
      items: DataFrame,
      itemCol: String,
      phiPpm: Long,
      width: Int,
      depth: Int,
      seed: Long = 7L
  ): DataFrame = {
    require(phiPpm >= 1 && phiPpm <= 1000000L, "phiPpm in [1, 1e6]")
    // countMinSparse drops null items, so no null-bucket cell can reach
    // the driver loop below; the gate side filters them symmetrically
    val sk = countMinSparse(items, Nil, itemCol, width, depth, seed).collect()
    val cells = Array.ofDim[Long](depth * width)
    var n = 0L
    sk.foreach { r =>
      // j is the IntegerType literal index; bucket is LongType (pmod output)
      val j = r.getInt(0); val bucket = r.getLong(1).toInt; val cnt = r.getLong(2)
      cells(j * width + bucket) = cnt
      if (j == 0) n += cnt
    }
    // threshold ⌈φ·N⌉ in exact integer math (BigInt: n·phiPpm overflows
    // Long past n ≈ 9.2e12 items — precisely the stream sizes this gate
    // exists for; the wrapped negative threshold would silently degrade
    // the gate to a full wordcount with a wrong cutoff)
    val threshold = ((BigInt(n) * phiPpm + 999999L) / 1000000L)
      .max(BigInt(1)).toLong
    val cellsLit = typedLit(cells.toSeq)
    val est = (0 until depth).map { j =>
      element_at(cellsLit,
        (cmsBucket(col(itemCol), seed, j, width) + lit(j * width + 1))
          .cast("int"))
    }.reduce(least(_, _))
    items.filter(col(itemCol).isNotNull && est >= lit(threshold))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(threshold))
  }
}
