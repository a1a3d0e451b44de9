package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Skew probe: the measured half of SURVEY's "salting for skew, AQE for
  * runtime re-plan" claim. On a 1000-executor cluster one hot key (a
  * mega-domain, an empty-string language tag, a default partition value)
  * routes a double-digit percent of a shuffle into ONE task; whether the
  * job survives depends on which mitigation actually engages. Three join
  * arms, identical results required, per-arm wall + max-task shuffle-read
  * rows/bytes measured via listener:
  *
  *  - JOIN, AQE on (default config): Spark's skew-join split carves the
  *    hot partition into target-size chunks mid-stage. This is the no-code
  *    path our operators rely on for sort-merge joins — the probe proves
  *    it fires (max-task rows drops by the split factor) rather than
  *    trusting the doc.
  *  - JOIN, AQE skew-split off: the counterfactual — one task eats the
  *    whole hot key (max-task rows ≈ hot-key rows). The probe asserts the
  *    imbalance is real, so the AQE arm is measuring a cure, not a
  *    no-op.
  *  - JOIN, [[graft.functions.Skew.saltedJoin]]: the explicit-salt path
  *    for shapes AQE can't fix (broadcast-too-big small side + hot big
  *    side, or a non-SMJ plan). Max-task rows must spread ≈ hot/buckets.
  *
  * AGGREGATION: AQE skew handling does NOT split skewed groupBy
  * partitions (hash-agg has no split rule — only joins get one). Partial
  * aggregation collapses the hot key map-side for ALGEBRAIC aggs, so the
  * hot reducer's record count stays flat — but for HOLISTIC aggs
  * (collect_list/percentile) every hot value's BYTES still funnel into
  * the one reducer that merges the giant per-key list (the executor-OOM
  * shape at 100 TB). The probe measures max-task shuffle-read BYTES:
  * plain collect_list groupBy vs [[graft.functions.Skew.saltedAgg]]
  * two-phase (value bytes spread over `buckets` tasks, bounded per-key
  * partials folded after), results equal. Wall at probe scale may favor
  * the plain arm — the salted shape buys peak-task memory headroom, not
  * local-mode speed; both numbers are recorded honestly.
  *
  * Run: `scripts/runprobe.sh graft.SkewProbe [rows] [hotShare]`.
  * Output: one JSON line per arm + PASS/FAIL summary.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val hotShare = args.drop(1).headOption.map(_.toDouble).getOrElse(0.4)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // force sort-merge joins: a broadcast would sidestep the skew the
      // probe exists to measure (at 100 TB the dim side often can't
      // broadcast either)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // make the split visible at probe scale: default 256 MB / 5x medians
      // would leave this dataset "not skewed enough" to trigger
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // task-level shuffle-read maxima for the CURRENT measured block. Rows
    // expose JOIN skew; BYTES expose holistic-AGG skew (partial
    // collect_list combines map-side, so the hot reducer receives few
    // PARTIAL rows — but they carry every hot value's bytes).
    val maxTaskRows = new AtomicLong(0L)
    val maxTaskBytes = new AtomicLong(0L)
    val active = new java.util.concurrent.atomic.AtomicBoolean(false)
    def bump(a: AtomicLong, v: Long): Unit = {
      var cur = a.get
      while (v > cur && !a.compareAndSet(cur, v)) cur = a.get
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (active.get && t.taskMetrics != null) {
          val sr = t.taskMetrics.shuffleReadMetrics
          bump(maxTaskRows, sr.recordsRead)
          bump(maxTaskBytes, sr.remoteBytesRead + sr.localBytesRead)
        }
    })
    def measured[T](f: => T): (T, Double, Long, Long) = {
      // listener events are async; a short drain bounds cross-arm bleed
      // (task-end events land well within it for a finished local job)
      Thread.sleep(1500)
      maxTaskRows.set(0L); maxTaskBytes.set(0L); active.set(true)
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      active.set(false)
      (r, secs, maxTaskRows.get, maxTaskBytes.get)
    }

    val nKeys = 100000L
    val hotRows = (nRows * hotShare).toLong
    // fact: hotShare of rows on key 0, the rest uniform over nKeys
    val fact = spark.range(nRows).select(
      when(col("id") < hotRows, lit(0L))
        .otherwise(pmod(col("id") * 2654435761L, lit(nKeys))).as("k"),
      (col("id") % 1000).cast("double").as("v"))
    val dim = spark.range(nKeys).select(col("id").as("k"),
      concat(lit("attr_"), col("id") % 7).as("attr"))
    fact.persist(); dim.persist()
    println(s"""{"probe":"setup","rows":${fact.count()},"dim":${dim.count()},"hot_rows":$hotRows}""")

    def joinSum(f: DataFrame, d: DataFrame): Array[(String, Double)] =
      f.join(d, Seq("k")).groupBy("attr").agg(round(sum("v"), 2).as("s"))
        .orderBy("attr").collect().map(r => (r.getString(0), r.getDouble(1)))

    // arm 1: AQE skew-join ON (default true; thresholds tuned above)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val (r1, t1, m1, _) = measured(joinSum(fact, dim))
    println(s"""{"probe":"join_aqe_on","secs":${f"$t1%.2f"},"max_task_rows":$m1}""")

    // arm 2: skew split OFF — the counterfactual hot task
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (r2, t2, m2, _) = measured(joinSum(fact, dim))
    println(s"""{"probe":"join_skew_off","secs":${f"$t2%.2f"},"max_task_rows":$m2}""")

    // arm 3: explicit salting (AQE split left off to isolate the salt)
    val (r3, t3, m3, _) = measured {
      graft.functions.Skew.saltedJoin(fact, dim, Seq("k"), buckets = 16)
        .groupBy("attr").agg(round(sum("v"), 2).as("s"))
        .orderBy("attr").collect().map(r => (r.getString(0), r.getDouble(1)))
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    println(s"""{"probe":"join_salted","secs":${f"$t3%.2f"},"max_task_rows":$m3}""")

    val joinOk = r1.sameElements(r2) && r2.sameElements(r3)
    // the counterfactual must show the hot task; AQE and salt must spread it
    val joinSpread = m2 > hotRows / 2 && m1 < m2 / 2 && m3 < m2 / 2

    // AGGREGATION arm: holistic agg (collect_list). Partial aggregation
    // combines map-side, so the hot reducer reads few PARTIAL rows — but
    // every hot VALUE's bytes still funnel into that one task (the giant
    // per-key list is merged, and held, in one place: the executor-OOM
    // shape at 100 TB). Skew shows in max-task shuffle-read BYTES;
    // saltedAgg spreads the value bytes over `buckets` tasks and folds
    // bounded per-key partials after. Wall at probe scale may FAVOR the
    // plain arm (one extra shuffle is not free) — the salted shape buys
    // peak-task memory headroom, not local-mode speed; both numbers are
    // recorded honestly.
    def canon(rows: Array[(Long, Long, Double)]) = rows.sortBy(_._1)
    val (a1, ta1, _, ba1) = measured {
      fact.groupBy("k").agg(size(collect_list("v")).cast("long").as("n"),
          round(sum("v"), 2).as("s"))
        .agg(count(lit(1)).cast("long").as("groups"), max("n").as("maxn"),
          round(sum("s"), 2).as("tot"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    println(s"""{"probe":"agg_plain","secs":${f"$ta1%.2f"},"max_task_mb":${ba1 / 1048576}}""")
    val (a2, ta2, _, ba2) = measured {
      // two-phase: per-salt partial counts/sums, then per-key fold — the
      // salted shape for holistic aggs (counts stand in for the list body;
      // a real collect_list fold would concat partial arrays per key)
      graft.functions.Skew.saltedAgg(fact, Seq("k"), buckets = 16,
          partialAggs = Seq(size(collect_list("v")).cast("long").as("pn"),
            sum("v").as("ps")),
          finalAggs = Seq(sum("pn").as("n"), round(sum("ps"), 2).as("s")))
        .agg(count(lit(1)).cast("long").as("groups"), max("n").as("maxn"),
          round(sum("s"), 2).as("tot"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    println(s"""{"probe":"agg_salted","secs":${f"$ta2%.2f"},"max_task_mb":${ba2 / 1048576}}""")
    val aggOk = canon(a1).sameElements(canon(a2))
    val aggSpread = ba2 < ba1 / 2

    val pass = joinOk && joinSpread && aggOk && aggSpread
    println(s"""{"summary":{"join_results_equal":$joinOk,"join_spread":$joinSpread,"agg_results_equal":$aggOk,"agg_spread":$aggSpread}}""")
    println(if (pass) "PASS" else "FAIL")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
