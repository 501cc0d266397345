package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamSpec extends SparkSpec {

  test("streamingNearDupDedup == sequential incremental batches; index " +
      "partitioned per batch for replay idempotency") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // three ingest waves; wave 2 carries an exact twin of a wave-0 doc and
    // wave 1 a twin of another, so cross-batch matches are guaranteed
    val d0 = base.filter(col("doc_id") % 3 === 0)
    val twin0 = d0.orderBy("doc_id").limit(1).select(
      (col("doc_id") + 100000).as("doc_id"), col("text"))
    val twin1 = base.filter(col("doc_id") === 1).select(
      (col("doc_id") + 200000).as("doc_id"), col("text"))
    val b = Seq(
      d0,
      base.filter(col("doc_id") % 3 === 1).unionByName(twin0),
      base.filter(col("doc_id") % 3 === 2).unionByName(twin1))
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.streamingNearDupDedup(
      mem.toDF().toDF("doc_id", "text"),
      s"$root/index", s"$root/matches", s"$root/ckpt")
    b.foreach { bd =>
      mem.addData(bd.collect().toIndexedSeq
        .map(r => (r.getLong(0), r.getString(1))))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.read.parquet(s"$root/matches")
      .select("batch_id", "index_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = (1 to 2).flatMap { i =>
      graft.operators.Dedup.incrementalLshMatches(
        b.take(i).reduce(_ unionByName _), b(i), "doc_id", "text",
        n = 5, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(expected.nonEmpty && got == expected)
    // the on-disk index is one batch_id partition per micro-batch (the
    // replay-overwrite unit) and holds every ingested doc's artifact row
    val idx = spark.read.parquet(s"$root/index")
    assert(idx.select("batch_id").distinct().count() == 3)
    assert(idx.count() == b.map(_.count()).sum)
  }

  test("streamingHardNegatives: after every wave the stored top-k equals " +
      "one-shot mining over everything ingested so far") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val waves = Seq(
      emb.filter(col("vec_id") < 150),
      emb.filter(col("vec_id") >= 150 && col("vec_id") < 320),
      emb.filter(col("vec_id") >= 320))
    val root = java.nio.file.Files.createTempDirectory("graft_shn").toString
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    // gate-scale geometry: 500 accumulated vectors -> the recall-pinned
    // 32 bands x 2 bits (size by autoBitsPerBand(expectedN) in production)
    val q = EventStream.streamingHardNegatives(
      mem.toDF().toDF("vec_id", "embedding", "label"),
      s"$root/index", s"$root/topk", s"$root/ckpt", dim = 64,
      bands = 32, bitsPerBand = 2)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    waves.zipWithIndex.foreach { case (w, i) =>
      mem.addData(w.collect().toIndexedSeq.map(r => (r.getLong(0),
        r.getSeq[Float](1), r.getInt(2))))
      q.processAllAvailable()
      val stored = key(spark.read.parquet(s"$root/topk/batch=$i"))
      val oneShot = key(graft.operators.Similarity.hardNegativesAnn(
        waves.take(i + 1).reduce(_ unionByName _),
        "vec_id", "embedding", "label", k = 3, dim = 64))
      assert(stored == oneShot, s"wave $i diverged from one-shot")
    }
    q.stop()
    // index accumulated one partition per wave, one row per vector
    val idx = spark.read.parquet(s"$root/index")
    assert(idx.select("batch_id").distinct().count() == 3)
    assert(idx.count() == emb.count())
  }

  test("windowedCounts over a real stream (MemoryStream micro-batches)") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val mem = MemoryStream[(Timestamp, String)]
    val events = mem.toDF().toDF("ts", "event_type")
    val q = EventStream.windowedCounts(events, windowDuration = "1 minute",
      watermark = "0 seconds")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    mem.addData(
      (Timestamp.valueOf("2026-01-01 00:00:10"), "click"),
      (Timestamp.valueOf("2026-01-01 00:00:50"), "click"),
      (Timestamp.valueOf("2026-01-01 00:01:10"), "view"))
    q.processAllAvailable()
    val out = spark.table("wc").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n_events"))).toSet
    q.stop()
    assert(out == Set(
      ("2026-01-01 00:00:00.0", "click", 2L),
      ("2026-01-01 00:01:00.0", "view", 1L)))
  }

  test("windowedCounts is the same plan on batch input") {
    import spark.implicits._
    val batch = Seq(
      (Timestamp.valueOf("2026-01-01 00:00:10"), "click"),
      (Timestamp.valueOf("2026-01-01 00:00:50"), "click"))
      .toDF("ts", "event_type")
    val out = EventStream.windowedCounts(batch, windowDuration = "1 minute")
      .collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_events") == 2L)
  }

  test("dedupStream drops in-stream duplicates across micro-batches") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val mem = MemoryStream[(Timestamp, String)]
    val q = EventStream.dedupStream(
      mem.toDF().toDF("ts", "content_hash"), Seq("content_hash"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    val t = Timestamp.valueOf("2026-01-01 00:00:10")
    mem.addData((t, "h1"), (t, "h1"), (t, "h2"))
    q.processAllAvailable()
    mem.addData((t, "h1")) // duplicate arriving in a later batch
    q.processAllAvailable()
    val out = spark.table("dd").collect().map(_.getString(1)).sorted.toSeq
    q.stop()
    assert(out == Seq("h1", "h2"))
  }

  test("dedupStreamByKey collapses duplicates with different event times") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val mem = MemoryStream[(Timestamp, String)]
    val q = EventStream.dedupStreamByKey(
      mem.toDF().toDF("ts", "content_hash"), Seq("content_hash"))
      .writeStream.format("memory").queryName("ddk").outputMode("append").start()
    val t1 = Timestamp.valueOf("2026-01-01 00:00:10")
    val t2 = Timestamp.valueOf("2026-01-01 00:01:10")
    mem.addData((t1, "h1"), (t2, "h1"), (t1, "h2")) // same hash, two event times
    q.processAllAvailable()
    mem.addData((t2, "h2")) // later-batch duplicate, different ts
    q.processAllAvailable()
    val out = spark.table("ddk").collect().map(_.getString(1)).sorted.toSeq
    q.stop()
    assert(out == Seq("h1", "h2")) // plain dedupStream would emit 4 rows here
  }

  test("intervalJoin: stream-stream, in-range matches only, across batches") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val scans = MemoryStream[(Timestamp, Long, String)]
    val flags = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.intervalJoin(
        scans.toDF().toDF("ts", "session_id", "scan_type"),
        flags.toDF().toDF("ts", "session_id", "flag"),
        keyCols = Seq("session_id"),
        maxDelay = "5 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t3 = Timestamp.valueOf("2026-01-01 00:03:00")
    val t9 = Timestamp.valueOf("2026-01-01 00:09:00")
    scans.addData((t0, 1L, "T1w"), (t0, 2L, "bold"))
    q.processAllAvailable()
    // later micro-batch: flag within 5 min of session 1's scan; session 2's
    // flag too late; session 3 has no scan at all
    flags.addData((t3, 1L, "ok"), (t9, 2L, "late"), (t3, 3L, "orphan"))
    q.processAllAvailable()
    val out = spark.table("ij").collect()
      .map(r => (r.getAs[Long]("session_id"), r.getAs[String]("scan_type"),
        r.getAs[String]("right_flag"))).toSet
    q.stop()
    assert(out == Set((1L, "T1w", "ok")))
  }

  test("intervalJoin: identical plan on batch inputs") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t3 = Timestamp.valueOf("2026-01-01 00:03:00")
    val scans = Seq((t0, 1L, "T1w")).toDF("ts", "session_id", "scan_type")
    val flags = Seq((t3, 1L, "ok"), (t0, 9L, "x"))
      .toDF("ts", "session_id", "flag")
    val out = EventStream.intervalJoin(scans, flags, Seq("session_id"),
      maxDelay = "5 minutes").collect()
    assert(out.length == 1 && out.head.getAs[String]("right_flag") == "ok")
    assert(out.head.getAs[Timestamp]("right_ts") == t3)
  }

  test("intervalJoin left_outer: unmatched lefts emit with null rights " +
      "after the watermark closes their window") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val scans = MemoryStream[(Timestamp, Long, String)]
    val flags = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.intervalJoin(
        scans.toDF().toDF("ts", "session_id", "scan_type"),
        flags.toDF().toDF("ts", "session_id", "flag"),
        keyCols = Seq("session_id"),
        maxDelay = "5 minutes", watermark = "0 seconds",
        joinType = "left_outer")
      .writeStream.format("memory").queryName("loj").outputMode("append")
      .start()
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t3 = Timestamp.valueOf("2026-01-01 00:03:00")
    val t60 = Timestamp.valueOf("2026-01-01 01:00:00")
    scans.addData((t0, 1L, "T1w"), (t0, 2L, "bold"))
    flags.addData((t3, 1L, "ok"))
    q.processAllAvailable()
    // advance BOTH watermarks far past t0+5min so session 2's window closes
    scans.addData((t60, 9L, "later"))
    flags.addData((t60, 9L, "later"))
    q.processAllAvailable()
    val out = spark.table("loj").collect()
      .map(r => (r.getAs[Long]("session_id"), r.getAs[String]("scan_type"),
        Option(r.getAs[String]("right_flag")))).toSet
    q.stop()
    assert(out.contains((1L, "T1w", Some("ok"))))   // matched
    assert(out.contains((2L, "bold", None)))        // timed out, null right
    // batch twin: same call, same semantics, no watermark dance
    val b = EventStream.intervalJoin(
      Seq((t0, 1L, "T1w"), (t0, 2L, "bold")).toDF("ts", "session_id", "scan_type"),
      Seq((t3, 1L, "ok")).toDF("ts", "session_id", "flag"),
      Seq("session_id"), maxDelay = "5 minutes", joinType = "left_outer")
      .collect().map(r => (r.getAs[Long]("session_id"),
        Option(r.getAs[String]("right_flag")))).toSet
    assert(b == Set((1L, Some("ok")), (2L, None)))
  }

  test("intervalJoin: shared non-key column names cannot collide") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val l = Seq((t0, 1L, "left-note")).toDF("ts", "session_id", "note")
    val r = Seq((t0, 1L, "right-note")).toDF("ts", "session_id", "note")
    val out = EventStream.intervalJoin(l, r, Seq("session_id"),
      maxDelay = "5 minutes")
    assert(out.columns.toSeq ==
      Seq("session_id", "ts", "note", "right_ts", "right_note"))
    val row = out.collect().head
    assert(row.getAs[String]("note") == "left-note")
    assert(row.getAs[String]("right_note") == "right-note")
  }

  test("sessionWindows: native operator agrees with lag/cumsum sessionize, " +
      "including the exactly-at-gap boundary") {
    import spark.implicits._
    val gap = 1800000000L // 30 min in µs
    val ev = Seq(
      (1L, 100L, 0L),
      (1L, 101L, gap),          // exactly +gap -> SAME session (both forms)
      (1L, 102L, 2 * gap + 1),  // gap exceeded -> new session
      (2L, 200L, 50L),
      (2L, 201L, 50L)           // duplicate timestamp, same session
    ).toDF("user_id", "event_id", "us")
    val native = EventStream.sessionWindows(ev, "user_id", "us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(native == Set(
      (1L, 0L, gap + gap, 2L),            // end = last event + gap
      (1L, 2 * gap + 1, 3 * gap + 1, 1L),
      (2L, 50L, 50L + gap, 2L)))
    // parity with the custom formulation on (start, count) per session
    val custom = EventStream.sessionize(ev, "user_id", "us", "event_id",
        gapMicros = gap)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(custom == native.map(x => (x._1, x._2, x._4)))
  }

  test("sessionWindows: identical results on a real stream") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val mem = MemoryStream[(Long, Long)]
    val q = EventStream.sessionWindows(
        mem.toDF().toDF("user_id", "us"), "user_id", "us",
        watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("sw").outputMode("complete")
      .start()
    mem.addData((1L, 0L), (1L, 60000000L))
    q.processAllAvailable()
    mem.addData((1L, 5000000000L), (2L, 0L))
    q.processAllAvailable()
    val out = spark.table("sw").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    q.stop()
    assert(out == Set((1L, 0L, 2L), (1L, 5000000000L, 1L), (2L, 0L, 1L)))
  }

  test("assembleCorpusIncremental: streamed capstone == batch q99 plan") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    // corpus with exact duplicates, short docs (length-gated), and
    // benchmark docs (id % 10 == 0) whose 2-grams contaminate others
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon"),   // benchmark doc
      (1L, "alpha beta gamma delta epsilon"),    // dup of 10 -> min id 1
      (2L, "zeta eta theta iota kappa lambda"),
      (3L, "zeta eta theta iota kappa lambda"),  // dup of 2
      (4L, "mu nu xi"),                          // < 5 tokens -> gated
      (5L, "omicron pi rho sigma tau upsilon"),
      (6L, "phi chi psi omega alpha beta nine"), // shares "alpha beta" w/ 10
      (20L, "solo unique benchmark entry here"), // benchmark doc
      (7L, "completely different clean content today"))
    val dir = java.nio.file.Files.createTempDirectory("graft_asm").toString
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.assembleCorpusIncremental(
      mem.toDF().toDF("doc_id", "text"),
      s"$dir/out", s"$dir/ckpt",
      minTokens = 5, benchEvery = 10, n = 2, nShards = 2, seqLen = 8)
    // three arrival waves, interleaved so late benchmark docs retract
    // earlier survivors (the non-monotonic case batch handles trivially)
    mem.addData(corpus.take(3): _*); q.processAllAvailable()
    mem.addData(corpus.slice(3, 6): _*); q.processAllAvailable()
    mem.addData(corpus.drop(6): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$dir/out/result")
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.CorpusOps.assembleCorpus(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        minTokens = 5, benchEvery = 10, n = 2, nShards = 2, seqLen = 8)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
    // survivors: dup 3 collapsed into 2; 4 length-gated; 6 contaminated by
    // benchmark 10's "alpha beta"; benchmark texts (10 and its dup-winner
    // 1, and 20) decontaminate themselves out — {2, 5, 7} remain
    assert(batch.map(_.head.asInstanceOf[Long]) == Set(2L, 5L, 7L))
  }

  test("writeUpsertBatches: upsert view correct; batch replay is idempotent") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val mem = MemoryStream[(Timestamp, String)]
    val counts = EventStream.windowedCounts(
      mem.toDF().toDF("ts", "event_type"),
      windowDuration = "1 minute", watermark = "10 minutes")
    val q = EventStream.writeUpsertBatches(counts, s"$dir/out", s"$dir/chk")
    val t10 = Timestamp.valueOf("2026-01-01 00:00:10")
    val t50 = Timestamp.valueOf("2026-01-01 00:00:50")
    mem.addData((t10, "click"))
    q.processAllAvailable()
    mem.addData((t50, "click")) // updates the SAME window in a later batch
    q.processAllAvailable()
    q.stop()

    def reconciled = EventStream.readUpserted(spark, s"$dir/out",
        Seq("window_start", "event_type"))
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"))).toSet
    assert(reconciled == Set(("click", 2L))) // latest batch wins, no dup row

    // simulate the replay failure window: rewrite batch 1's directory with
    // identical content — the overwrite keeps the view unchanged
    val batch1 = spark.read.parquet(s"$dir/out/batch_id=1")
      .collect().toSeq // materialize before overwriting the same path
    spark.createDataFrame(
        spark.sparkContext.parallelize(batch1),
        spark.read.parquet(s"$dir/out/batch_id=1").schema)
      .write.mode("overwrite").parquet(s"$dir/out/batch_id=1")
    assert(reconciled == Set(("click", 2L)))
  }

  test("resampleFill: regular grid, forward fill, duplicate-ts tie = max") {
    import spark.implicits._
    val ev = Seq(
      (1L, 0L, 10.0),
      (1L, 5L, 20.0),
      (1L, 5L, 15.0),   // duplicate timestamp — max (20.0) must win
      (1L, 23L, 30.0),
      (2L, 100L, 1.0)
    ).toDF("user_id", "us", "v")
    val r = EventStream.resampleFill(ev, "user_id", "us", "v", stepMicros = 10L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(r == Set(
      (1L, 0L, 10.0),    // tick at t0: the t0 observation itself
      (1L, 10L, 20.0),   // carried forward past the duplicate-ts pair
      (1L, 20L, 20.0),
      (2L, 100L, 1.0)    // single-event user: one tick
    ))
  }

  test("trackUploadStates: state machine over micro-batched upload events") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val mem = MemoryStream[EventStream.UploadEvent]
    val q = EventStream.trackUploadStates(mem.toDS())
      .writeStream.format("memory").queryName("us").outputMode("update").start()
    mem.addData(
      EventStream.UploadEvent(1L, 1L, "Inserting"),
      EventStream.UploadEvent(2L, 1L, "Inserting"))
    q.processAllAvailable()
    mem.addData(EventStream.UploadEvent(1L, 2L, "InsertionComplete"))
    q.processAllAvailable()
    val out = spark.table("us").groupBy("upload_id")
      .agg(max_by(col("status"), col("n_transitions")).as("status"),
        max(col("n_transitions")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    q.stop()
    assert(out(1L) == ("InsertionComplete", 2))
    assert(out(2L) == ("Inserting", 1))
  }

  test("trackUploadStates: a late lower-seq event in a LATER micro-batch " +
      "never regresses the status") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    val mem = MemoryStream[EventStream.UploadEvent]
    val q = EventStream.trackUploadStates(mem.toDS())
      .writeStream.format("memory").queryName("uslate")
      .outputMode("update").start()
    mem.addData(EventStream.UploadEvent(7L, 5L, "InsertionComplete"))
    q.processAllAvailable()
    // delayed seq=2 arrives after seq=5 was already absorbed
    mem.addData(EventStream.UploadEvent(7L, 2L, "Inserting"))
    q.processAllAvailable()
    val out = spark.table("uslate").groupBy("upload_id")
      .agg(max_by(col("status"), col("n_transitions")).as("status"),
        max(col("n_transitions")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    q.stop()
    // the late event still counts as a transition, but the status stays
    // the highest-seq one ever seen
    assert(out(7L) == ("InsertionComplete", 2), out.toString)
  }

  test("asOfLast: latest prior marker per key, no marker -> NULL, ties by id") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click@10, click@20, purchase@25, purchase@15
      (1L, 101L, 10L, "click"), (1L, 102L, 20L, "click"),
      (1L, 103L, 25L, "purchase"), (1L, 104L, 15L, "purchase"),
      // user 2: purchase before any click
      (2L, 201L, 5L, "purchase"), (2L, 202L, 8L, "click"),
      // same-timestamp tie: click id 301 sorts before purchase id 302
      (3L, 301L, 7L, "click"), (3L, 302L, 7L, "purchase"),
      // other event types never count as markers
      (4L, 401L, 1L, "view"), (4L, 402L, 2L, "purchase")
    ).toDF("user_id", "event_id", "us", "event_type")
    val out = graft.streaming.EventStream.asOfLast(ev, "user_id", "us",
        "event_id", "event_type", "click", "purchase")
      .collect()
      .map(r => r.getLong(1) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(out(103L) == ((Some(20L), Some(5L))))
    assert(out(104L) == ((Some(10L), Some(5L))))
    assert(out(201L) == ((None, None)))
    assert(out(302L) == ((Some(7L), Some(0L))))
    assert(!out.contains(401L)) // views are not targets
    assert(out(402L) == ((None, None)))
  }

  test("linearAttribution: credit resets at each conversion, ppm shares, no-marker NULL") {
    import spark.implicits._
    val ev = Seq(
      // user 1: c c P | c c c P | P  (three conversions)
      (1L, 1L, 1L, "click"), (1L, 2L, 2L, "click"), (1L, 3L, 3L, "purchase"),
      (1L, 4L, 4L, "click"), (1L, 5L, 5L, "click"), (1L, 6L, 6L, "click"),
      (1L, 7L, 7L, "purchase"), (1L, 8L, 8L, "purchase"),
      // user 2: trailing clicks with no conversion emit nothing
      (2L, 9L, 1L, "click"), (2L, 10L, 2L, "click")
    ).toDF("user_id", "event_id", "us", "event_type")
    val out = graft.streaming.EventStream.linearAttribution(ev, "user_id",
        "us", "event_id", "event_type", "click", "purchase")
      .collect()
      .map(r => r.getLong(1) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(out(3L) == ((2L, Some(500000L))))
    assert(out(7L) == ((3L, Some(333333L))))
    assert(out(8L) == ((0L, None))) // back-to-back purchase: no markers
    assert(out.size == 3) // user 2's unconverted clicks emit nothing
  }

  test("streamingMediaDedup == sequential incremental hamming " +
      "admission; index partitioned per batch for replay idempotency") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    // three waves of 64-bit prints; wave 1 carries a 1-bit tweak of a
    // wave-0 print, wave 2 an exact copy of a wave-0 print
    val rnd = new scala.util.Random(77)
    val base = (1L to 9L).map(i => (i, rnd.nextLong()))
    val waves = Seq(
      base.take(3),
      base.slice(3, 6) :+ ((101L, base.head._2 ^ 1L)),
      base.drop(6) :+ ((102L, base(1)._2)))
    val root =
      java.nio.file.Files.createTempDirectory("graft_smedia").toString
    val mem = MemoryStream[(Long, Long)]
    val q = EventStream.streamingMediaDedup(
      mem.toDF().toDF("id", "dhash"),
      s"$root/index", s"$root/matches", s"$root/ckpt")
    waves.foreach { w =>
      mem.addData(w.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.read.parquet(s"$root/matches")
      .select("id_batch", "id_index", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def df(w: Seq[(Long, Long)]) = w.toDF("id", "dhash")
    val expected = (1 to 2).flatMap { i =>
      graft.operators.Dedup.incrementalHammingMatches(
        graft.operators.Dedup.hammingIndex(
          df(waves.take(i).flatten), "id", "dhash", 4),
        df(waves(i)), "id", "dhash", bands = 4, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    }.toSet
    assert(expected.nonEmpty && got == expected)
    assert(got.contains((101L, 1L, 1)) && got.contains((102L, 2L, 0)))
    val idx = spark.read.parquet(s"$root/index")
    assert(idx.select("batch_id").distinct().count() == 3)
    // 4 band rows per ingested print
    assert(idx.count() == waves.map(_.size).sum * 4)
  }

  test("assembleMultimodalIncremental == batch manifest/attrition over " +
      "everything arrived, including a cross-wave component merge; " +
      "payloads decode once (staged rows are metadata-only)") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    import graft.sources.SyntheticFixtures
    def gradient(f: Int => Int): Seq[Seq[Int]] =
      (0 until 8).map(_ => (0 until 18).map { x =>
        val v = f(x); (v << 16) | (v << 8) | v
      })
    val asc = gradient(identity)
    val tweak = asc.updated(0, asc(0).updated(0, 0x050505))
    // wave 0: ascending original + descending; wave 1: the 1-bit tweak
    // (merges into 1's component) + a caption-less dup + junk; wave 2:
    // the PNG re-encode of 1 (cross-wave merge again) + a thumbnail
    // the distinct image is spectrally rich: a mirrored ramp is
    // pHash-close to the ascending one and would merge under the
    // dual-key admission (see MultimodalAssemblySpec)
    val waves: Seq[Seq[(Long, String, String, Array[Byte], Option[String])]] = Seq(
      Seq((1L, "000001", "s0", SyntheticFixtures.bmpBytes(asc),
            Some("ascending gradient")),
          (2L, "000002", "s0", SyntheticFixtures.bmpBytes(
            SyntheticFixtures.richRaster(18, 8, 2)),
            Some("textured photo"))),
      Seq((3L, "000003", "s0", SyntheticFixtures.bmpBytes(tweak),
            Some("tweaked copy")),
          (5L, "000005", "s0", SyntheticFixtures.bmpBytes(asc), None),
          (6L, "000006", "s1", "BMjunk".getBytes("US-ASCII"),
            Some("corrupt"))),
      Seq((4L, "000004", "s1", SyntheticFixtures.pngBytes(asc),
            Some("png copy")),
          (7L, "000007", "s1", SyntheticFixtures.bmpBytes(
            Seq.fill(4)(Seq.fill(4)(0x102030))), Some("tiny"))))
    val root =
      java.nio.file.Files.createTempDirectory("graft_smmasm").toString
    val mem = MemoryStream[(Long, String, String, Array[Byte], Option[String])]
    val q = EventStream.assembleMultimodalIncremental(
      mem.toDF().toDF("id", "sample_id", "shard_name", "content",
        "caption"),
      root, s"$root/ckpt", minWidth = 10)
    try waves.foreach { w =>
      mem.addData(w.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    def canonM(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "sample_id", "shard_name", "width", "height",
        "dhash", "phash", "caption")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getLong(5), r.getLong(6),
        r.getString(7))).toSet
    val allPairs = waves.flatten
      .toDF("id", "sample_id", "shard_name", "content", "caption")
    val gotM = canonM(spark.read.parquet(s"$root/manifest"))
    val expM = canonM(graft.operators.MultimodalAssembly
      .manifest(allPairs, minWidth = 10))
    assert(gotM == expM && gotM.map(_._1) == Set(1L, 2L))
    def canonA(df: org.apache.spark.sql.DataFrame) = df
      .select("n_images", "n_paired", "n_decoded", "n_geometry_ok",
        "n_kept")
      .collect().map(r => (0 to 4).map(r.getLong)).toSeq
    val gotA = canonA(spark.read.parquet(s"$root/attrition"))
    val expA = canonA(graft.operators.MultimodalAssembly
      .attrition(allPairs, minWidth = 10))
    assert(gotA == expA && gotA == Seq(Seq(7L, 6L, 5L, 4L, 2L)))
    // staged rows are metadata-only: the payload column never persists
    val staged = spark.read.parquet(s"$root/staged")
    assert(!staged.columns.contains("content"))
    assert(staged.count() == 5) // one row per decodable paired image
  }

  test("assembleMultimodalIncremental: a first wave where NOTHING " +
      "decodes still writes the attrition artifact (arrivals counted, " +
      "zero survivors) — it must never claim no data arrived") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    import graft.sources.SyntheticFixtures
    val root =
      java.nio.file.Files.createTempDirectory("graft_smmjunk").toString
    val mem = MemoryStream[(Long, String, String, Array[Byte], Option[String])]
    val q = EventStream.assembleMultimodalIncremental(
      mem.toDF().toDF("id", "sample_id", "shard_name", "content",
        "caption"),
      root, s"$root/ckpt", minWidth = 10)
    def attr() = spark.read.parquet(s"$root/attrition")
      .select("n_images", "n_paired", "n_decoded", "n_geometry_ok",
        "n_kept")
      .collect().map(r => (0 to 4).map(r.getLong)).toSeq
    try {
      // wave 0: one junk payload + one unpaired (caption-less) image —
      // zero staged rows, but BOTH must show up in attrition
      mem.addData(Seq(
        (1L, "000001", "s0", "BMjunk".getBytes("US-ASCII"),
          Some("corrupt")),
        (2L, "000002", "s0", "BMjunk2".getBytes("US-ASCII"), None)))
      q.processAllAvailable()
      assert(attr() == Seq(Seq(2L, 1L, 0L, 0L, 0L)))
      // wave 1: a real image — the staged path takes over and the
      // attrition keeps counting everything arrived
      val px = (0 until 8).map(_ => (0 until 18).map(x =>
        (x << 16) | (x << 8) | x))
      mem.addData(Seq((3L, "000003", "s0",
        SyntheticFixtures.bmpBytes(px), Some("real"))))
      q.processAllAvailable()
      assert(attr() == Seq(Seq(3L, 2L, 1L, 1L, 1L)))
    } finally q.stop()
  }

  test("assembleMultimodalIncremental skip-refresh: a wave with NO new " +
      "dup pairs appends to the manifest without the global refresh " +
      "(probe pinned silent on its band index), and a LATER cross-wave " +
      "merge after the skipped wave still re-canonicalizes exactly") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlc
    import graft.sources.SyntheticFixtures
    def gradient(f: Int => Int): Seq[Seq[Int]] =
      (0 until 8).map(_ => (0 until 18).map { x =>
        val v = f(x); (v << 16) | (v << 8) | v
      })
    val asc = gradient(identity)
    val tweak = asc.updated(0, asc(0).updated(0, 0x050505))
    // wave 0: two distinct images; wave 1: a THIRD distinct image (no
    // new dup pairs — the skip path); wave 2: the 1-bit tweak of wave
    // 0's original (cross-wave merge AFTER a skipped wave)
    val waves: Seq[Seq[(Long, String, String, Array[Byte], Option[String])]] = Seq(
      Seq((1L, "000001", "s0", SyntheticFixtures.bmpBytes(asc),
            Some("ascending gradient")),
          (2L, "000002", "s0", SyntheticFixtures.bmpBytes(
            SyntheticFixtures.richRaster(18, 8, 2)),
            Some("textured photo"))),
      Seq((8L, "000008", "s1", SyntheticFixtures.bmpBytes(
            SyntheticFixtures.richRaster(18, 8, 5)),
            Some("another distinct photo"))))
    val waveMerge: Seq[(Long, String, String, Array[Byte], Option[String])] =
      Seq((3L, "000003", "s1",
        SyntheticFixtures.bmpBytes(tweak), Some("tweaked copy")))
    val root =
      java.nio.file.Files.createTempDirectory("graft_smmskip").toString
    val mem = MemoryStream[(Long, String, String, Array[Byte], Option[String])]
    val q = EventStream.assembleMultimodalIncremental(
      mem.toDF().toDF("id", "sample_id", "shard_name", "content",
        "caption"),
      root, s"$root/ckpt", minWidth = 10)
    def manifestIds() = spark.read.parquet(s"$root/manifest")
      .select("id").collect().map(_.getLong(0)).toSet
    try {
      waves.foreach { w =>
        mem.addData(w.toIndexedSeq); q.processAllAvailable()
      }
      // after the skip wave: the manifest must already equal the batch
      // operator over everything arrived
      assert(manifestIds() == Set(1L, 2L, 8L))
      mem.addData(waveMerge.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    // the probe's verdict per wave, replayed over the staged metadata's
    // band keys exactly as the refresh derives them: wave 1 (batch_id=1)
    // introduced no pair — the refresh was SKIPPED — and wave 2
    // (batch_id=2) did (full re-canonicalization)
    val keys = Seq(("dhash", 4, 3), ("phash", 16, 10))
    def probeOf(batchId: Int) = graft.operators.Dedup.fusedBatchPairDelta(
      graft.operators.Dedup.fusedBandRows(
        spark.read.parquet(s"$root/staged").where(col("width") >= 10),
        "id", keys, carryCols = Seq("batch_id"))
        .withColumn("is_batch", col("batch_id") === batchId), keys)
    assert(!probeOf(1) && probeOf(2))
    // final outputs == the batch operator over everything arrived
    val allPairs = (waves.flatten ++ waveMerge)
      .toDF("id", "sample_id", "shard_name", "content", "caption")
    def canonM(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "sample_id", "shard_name", "width", "height",
        "dhash", "phash", "caption")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getLong(5), r.getLong(6),
        r.getString(7))).toSet
    assert(canonM(spark.read.parquet(s"$root/manifest")) ==
      canonM(graft.operators.MultimodalAssembly
        .manifest(allPairs, minWidth = 10)))
    assert(manifestIds() == Set(1L, 2L, 8L))
    def canonA(df: org.apache.spark.sql.DataFrame) = df
      .select("n_images", "n_paired", "n_decoded", "n_geometry_ok",
        "n_kept")
      .collect().map(r => (0 to 4).map(r.getLong)).toSeq
    assert(canonA(spark.read.parquet(s"$root/attrition")) ==
      canonA(graft.operators.MultimodalAssembly
        .attrition(allPairs, minWidth = 10)))
  }
}
