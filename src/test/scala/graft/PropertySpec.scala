package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2-4) over generated CDC
  * logs and documents — the behaviors that must hold for *any* input,
  * not just the testdata: snapshot idempotence, dedup invariants, and
  * resume monotonicity.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(r.passed, r.status.toString)
  }

  /** Synthetic CDC log: (user_id, event_id, ts, event_type, value) with
    * duplicate (user, ts) collisions to exercise the tie-break. */
  private val logGen: Gen[List[(Int, Long, Long, String, Double)]] =
    Gen.listOfN(60, for {
      u <- Gen.chooseNum(0, 5)
      e <- Gen.chooseNum(0L, 500L)
      t <- Gen.chooseNum(0L, 20L) // few distinct ts ⇒ forced ties
      k <- Gen.oneOf("insert", "update_after", "delete")
      v <- Gen.chooseNum(-100, 100)
    } yield (u, e, t, k, v.toDouble))

  private def snapshot(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(desc("ts"), desc("event_id"))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  test("snapshot materialization is idempotent: snap(snap(log)) == snap(log)") {
    check(Prop.forAll(logGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("user_id", "event_id", "ts", "event_type", "value")
          .dropDuplicates("user_id", "event_id") // unique (user, event) ids
        val once = snapshot(df).as[(Int, Long, Long, String, Double)]
          .collect().toList
        val twice = snapshot(snapshot(df)).as[(Int, Long, Long, String, Double)]
          .collect().toList
        once.sorted == twice.sorted &&
          once.map(_._1).distinct.size == once.size
      }
    })
  }

  test("snapshot is a prefix-closed fold: appending events never resurrects older state") {
    check(Prop.forAll(logGen, logGen) { (a, b) =>
      (a.isEmpty || b.isEmpty) || {
        // Give the appended batch strictly larger event ids and ts.
        val base = a.toDF("user_id", "event_id", "ts", "event_type", "value")
        val later = b.map { case (u, e, t, k, v) =>
          (u, e + 1000L, t + 100L, k, v) }
          .toDF("user_id", "event_id", "ts", "event_type", "value")
        val snapAll = snapshot(base.unionAll(later))
        // every user present in `later` must take their row from `later`
        val fromLater = snapAll.filter(col("event_id") >= 1000L)
          .select("user_id").distinct()
        val usersLater = later.select("user_id").distinct()
        usersLater.exceptAll(fromLater).isEmpty
      }
    })
  }

  test("resume-from-GTID returns exactly the suffix, in order") {
    check(Prop.forAll(logGen, Gen.chooseNum(0L, 500L)) { (rows, k) =>
      rows.isEmpty || {
        val df = rows.toDF("user_id", "event_id", "ts", "event_type", "value")
        val resumed = df.filter(col("event_id") >= k)
          .orderBy("event_id").select("event_id").as[Long].collect().toList
        val expected = rows.map(_._2).filter(_ >= k).sorted
        resumed.sorted == expected
      }
    })
  }

  test("as-of join matches the sequential reference model on random event logs") {
    // (key, ts, seq, value); seq globally unique via index offset
    val sideGen = Gen.listOfN(40, for {
      k <- Gen.chooseNum(0, 3)
      t <- Gen.chooseNum(0L, 15L) // few ts values ⇒ forced ties
      v <- Gen.chooseNum(0, 999)
    } yield (k, t, v))
    check(Prop.forAll(sideGen, sideGen) { (ls, rs) =>
      (ls.isEmpty || rs.isEmpty) || {
        val left = ls.zipWithIndex.map { case ((k, t, v), i) =>
          (k, t, 1000L + i, v) } // unique seqs, left after right at ties
        val right = rs.zipWithIndex.map { case ((k, t, v), i) =>
          (k, t, i.toLong, v) }
        val out = graft.operators.AsOfJoin(
            left.toDF("k", "ts", "seq", "lv"),
            right.toDF("k", "ts", "seq", "rv"),
            key = "k", tsCol = "ts", seqCol = "seq",
            carry = Map("rv" -> "rv_asof", "seq" -> "rseq"))
          .select("k", "seq", "rv_asof")
          .collect()
          .map(r => (r.getInt(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
        // sequential model: latest right with (ts, seq) <= left's (ts, seq)
        val model = left.map { case (k, t, s, _) =>
          val best = right.filter(r => r._1 == k &&
            (r._2 < t || (r._2 == t && r._3 < s)))
            .sortBy(r => (r._2, r._3)).lastOption
          (k, s, best.map(_._4))
        }.toSet
        out == model
      }
    })
  }

  test("forward as-of join matches the sequential reference model") {
    val sideGen = Gen.listOfN(40, for {
      k <- Gen.chooseNum(0, 3)
      t <- Gen.chooseNum(0L, 15L) // few ts values ⇒ forced ties
      v <- Gen.chooseNum(0, 999)
    } yield (k, t, v))
    check(Prop.forAll(sideGen, sideGen) { (ls, rs) =>
      (ls.isEmpty || rs.isEmpty) || {
        val left = ls.zipWithIndex.map { case ((k, t, v), i) =>
          (k, t, 1000L + i, v) }
        val right = rs.zipWithIndex.map { case ((k, t, v), i) =>
          (k, t, i.toLong, v) }
        val out = graft.operators.AsOfJoin(
            left.toDF("k", "ts", "seq", "lv"),
            right.toDF("k", "ts", "seq", "rv"),
            key = "k", tsCol = "ts", seqCol = "seq",
            carry = Map("rv" -> "rv_asof"), forward = true)
          .select("k", "seq", "rv_asof")
          .collect()
          .map(r => (r.getInt(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
        // model: EARLIEST right strictly after the left on the
        // (ts, seq) total order
        val model = left.map { case (k, t, s, _) =>
          val best = right.filter(r => r._1 == k &&
            (r._2 > t || (r._2 == t && r._3 > s)))
            .sortBy(r => (r._2, r._3)).headOption
          (k, s, best.map(_._4))
        }.toSet
        out == model
      }
    })
  }

  test("nearest as-of composition matches the brute-force nearest model") {
    // Pins join_asof_nearest's composition arithmetic (two directional
    // passes + gap compare, backward wins ties) on logs with FORCED
    // timestamp ties — the regime the driver testdata never hits.
    val sideGen = Gen.listOfN(40, for {
      k <- Gen.chooseNum(0, 3)
      t <- Gen.chooseNum(0L, 15L) // few ts values ⇒ forced ties
      v <- Gen.chooseNum(0, 999)
    } yield (k, t, v))
    check(Prop.forAll(sideGen, sideGen) { (ls, rs) =>
      (ls.isEmpty || rs.isEmpty) || {
        val left = ls.zipWithIndex.map { case ((k, t, v), i) =>
          (k, t, 1000L + i, v) }
        val right = rs.zipWithIndex.map { case ((k, t, v), i) =>
          (k, t, i.toLong, v) }
        val l = left.toDF("k", "ts", "seq", "lv")
        val r = right.toDF("k", "ts", "seq", "rv")
        val back = graft.operators.AsOfJoin(l, r, key = "k",
            tsCol = "ts", seqCol = "seq",
            carry = Map("seq" -> "b_seq", "ts" -> "b_ts"))
          .select(col("k"), col("seq"), col("ts"), col("b_seq"),
            col("b_ts"))
        val fwd = graft.operators.AsOfJoin(l, r, key = "k",
            tsCol = "ts", seqCol = "seq",
            carry = Map("seq" -> "f_seq", "ts" -> "f_ts"),
            forward = true)
          .select(col("seq").as("seq2"), col("f_seq"), col("f_ts"))
        val out = back.join(fwd, col("seq") === col("seq2"))
          .withColumn("b_gap", col("ts") - col("b_ts"))
          .withColumn("f_gap", col("f_ts") - col("ts"))
          .withColumn("nearest",
            when(col("b_seq").isNull, col("f_seq"))
              .when(col("f_seq").isNull, col("b_seq"))
              .when(col("b_gap") <= col("f_gap"), col("b_seq"))
              .otherwise(col("f_seq")))
          .select("k", "seq", "nearest")
          .collect()
          .map(row => (row.getInt(0), row.getLong(1),
            if (row.isNullAt(2)) None else Some(row.getLong(2)))).toSet
        val model = left.map { case (k, t, s, _) =>
          val b = right.filter(rr => rr._1 == k &&
            (rr._2 < t || (rr._2 == t && rr._3 < s)))
            .sortBy(rr => (rr._2, rr._3)).lastOption
          val f = right.filter(rr => rr._1 == k &&
            (rr._2 > t || (rr._2 == t && rr._3 > s)))
            .sortBy(rr => (rr._2, rr._3)).headOption
          val nearest = (b, f) match {
            case (None, ff) => ff.map(_._3)
            case (bb, None) => bb.map(_._3)
            case (Some(bb), Some(ff)) =>
              if (t - bb._2 <= ff._2 - t) Some(bb._3) else Some(ff._3)
          }
          (k, s, nearest)
        }.toSet
        out == model
      }
    })
  }

  /** Random documents with planted exact duplicates. */
  private val docsGen: Gen[List[(Long, String)]] = for {
    texts <- Gen.listOfN(25, Gen.nonEmptyListOf(
      Gen.oneOf("a", "b", "cc", "dd", "e")).map(_.mkString(" ")))
    dupOf <- Gen.listOfN(10, Gen.chooseNum(0, 24))
  } yield (texts ++ dupOf.map(texts(_))).zipWithIndex
    .map { case (t, i) => (i.toLong, t) }

  test("exact dedup: every surviving doc is the min id of its text group; group sizes sum to corpus size") {
    check(Prop.forAll(docsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val dedup = df
        .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      val out = dedup.select("doc_id", "n_copies")
        .as[(Long, Long)].collect()
      val byText = docs.groupBy(_._2.trim.toLowerCase).values.toList
      out.map(_._2).sum == docs.size &&
        out.length == byText.size &&
        out.map(_._1).toSet == byText.map(_.map(_._1).min).toSet
    })
  }

  /** Sequential union-find reference: vertex → min id of its component. */
  private def unionFindLabels(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> verts.filter(u => find(u) == find(v)).min).toMap
  }

  test("connected components match a sequential union-find on random graphs") {
    // small vertex range ⇒ dense-ish random graphs with small diameter
    val edgesGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(12, for {
        a <- Gen.chooseNum(0L, 9L)
        b <- Gen.chooseNum(0L, 9L) if a != b
      } yield (a, b))
    check(Prop.forAll(edgesGen) { edges =>
      edges.isEmpty || {
        val got = graft.operators.ConnectedComponents
          .run(edges.toDF("src", "dst"), "src", "dst")
          .as[(Long, Long)].collect().toMap
        got == unionFindLabels(edges)
      }
    })
  }

  test("big-star CC matches a sequential union-find on random graphs") {
    val edgesGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(12, for {
        a <- Gen.chooseNum(0L, 9L)
        b <- Gen.chooseNum(0L, 9L) if a != b
      } yield (a, b))
    check(Prop.forAll(edgesGen) { edges =>
      edges.isEmpty || {
        val got = graft.operators.BigStarCC
          .run(edges.toDF("src", "dst"), "src", "dst")
          .as[(Long, Long)].collect().toMap
        got == unionFindLabels(edges)
      }
    })
  }

  test("big-star CC solves a chain in few rounds (O(log n), not O(diameter))") {
    // A 64-vertex path: diameter 63, so label propagation would need
    // ~63 rounds; large-star/small-star must finish inside 10.
    val chain = (0L until 63L).map(i => (i, i + 1)).toList
    val got = graft.operators.BigStarCC
      .run(chain.toDF("src", "dst"), "src", "dst", maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 63L).map(_ -> 0L).toMap)
  }

  test("connected components converge on a chain (worst-case diameter)") {
    val chain = (0L until 10L).map(i => (i, i + 1)).toList
    val got = graft.operators.ConnectedComponents
      .run(chain.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 10L).map(_ -> 0L).toMap)
  }

  test("jaccard verification: n_inter <= min sizes, n_union >= max sizes, symmetric threshold") {
    check(Prop.forAll(docsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val tok = df.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
        .filter(col("w") =!= "")
      val cand = df.select(col("doc_id").as("doc_a")).crossJoin(
        df.select(col("doc_id").as("doc_b")))
        .filter(col("doc_a") < col("doc_b"))
      val verified = graft.operators.MinHashLsh
        .verifyJaccard(cand, tok, "doc_id", "w", num = 0, den = 1)
        .as[(Long, Long, Long, Long)].collect()
      val sizes = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).distinct.length }.toMap
      verified.forall { case (a, b, inter, union) =>
        inter <= math.min(sizes(a), sizes(b)) &&
          union >= math.max(sizes(a), sizes(b)) &&
          union == sizes(a) + sizes(b) - inter && inter >= 1
      }
    })
  }

  test("minhash LSH candidates: identical token sets always collide (J=1 recall is structural)") {
    check(Prop.forAll(docsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val tok = df.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
        .filter(col("w") =!= "")
      val cand = graft.operators.MinHashLsh
        .candidatePairs(tok, "doc_id", "w", numHashes = 16, bands = 4)
        .as[(Long, Long)].collect().toSet
      // duplicate-text pairs (non-empty token set) must all be candidates
      val byText = docs.filter(_._2.trim.nonEmpty)
        .groupBy(_._2.split(" ").filter(_.nonEmpty).distinct.toSet)
        .values.filter(_.size > 1)
      byText.forall { grp =>
        val ids = grp.map(_._1).sorted
        ids.combinations(2).forall { case Seq(a, b) => cand((a, b)) }
      }
    })
  }

  test("merge-upsert at ANY split point equals the full-log snapshot with delta tombstones") {
    val gen = for {
      rows <- Gen.listOfN(50, for {
        u <- Gen.chooseNum(0, 6)
        e <- Gen.chooseNum(0L, 200L)
        k <- Gen.oneOf("insert", "update_after", "error")
        v <- Gen.chooseNum(-50, 50)
      } yield (u, e, k, v.toDouble))
      split <- Gen.chooseNum(0L, 200L)
    } yield (rows, split)
    check(Prop.forAll(gen) { case (rows, split) =>
      val distinctRows = rows.distinctBy(r => (r._1, r._2))
      distinctRows.isEmpty || {
        val ev = distinctRows
          .toDF("user_id", "event_id", "event_type", "value")
        val merged = graft.ops.CdcOps.mergeUpsert(ev, split)
          .as[(Int, Long, Double, String)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        // reference: latest event per user over the WHOLE log; a user
        // with delta events whose final event is 'error' is deleted
        val expected = distinctRows.groupBy(_._1).flatMap {
          case (u, evs) =>
            val latest = evs.maxBy(_._2)
            val hasDelta = evs.exists(_._2 >= split)
            if (hasDelta && latest._3 == "error") None
            else Some(u -> (latest._2, latest._4))
        }
        merged == expected
      }
    })
  }

  test("z-order key: SQL expression matches the reference bit-interleave") {
    check(Prop.forAll(
      Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 4095L),
        Gen.chooseNum(0L, 4095L)))) { pts =>
      pts.isEmpty || {
        val got = pts.toDF("x", "y")
          .withColumn("z", graft.functions.ZOrder.zvalue("x", "y", 12))
          .as[(Long, Long, Long)].collect()
        got.forall { case (x, y, z) =>
          z == graft.functions.ZOrder.zvalueRef(x, y, 12)
        }
      }
    })
  }

  test("zorder_key SQL function (registered via GraftExtensions) matches the reference") {
    val pts = Seq((0L, 0L), (1L, 2L), (4095L, 4095L), (123L, 3210L))
    pts.toDF("x", "y").createOrReplaceTempView("zpts")
    val got = spark.sql(
      "SELECT x, y, zorder_key(x, y, 12) AS z, zorder_key(x, y) AS z12 FROM zpts")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (x, y, z, z12) =>
      assert(z == graft.functions.ZOrder.zvalueRef(x, y, 12))
      assert(z12 == z, "default bits should be 12")
    }
  }

  test("z-order locality: points in the same 2^12 z-bucket span <=64 in each dimension") {
    // The Morton curve guarantee the layout_zorder query relies on:
    // fixing the high 2k interleaved bits confines BOTH coordinates to
    // aligned 2^(12-k)-wide tiles (here k=6 -> 64x64 tiles).
    val pts = for (x <- 0L until 4096L by 37; y <- 0L until 4096L by 41)
      yield (x, y)
    val spans = pts.groupBy { case (x, y) =>
      graft.functions.ZOrder.zvalueRef(x, y, 12) >> 12
    }.values.map { grp =>
      val xs = grp.map(_._1); val ys = grp.map(_._2)
      math.max(xs.max - xs.min, ys.max - ys.min)
    }
    assert(spans.nonEmpty && spans.forall(_ <= 63L))
  }

  test("table checksum is invariant under repartitioning and row order") {
    // The claim fn_table_checksum exists for: the modular SUM of row
    // digests must not move when the same rows arrive in a different
    // partitioning or order (that is what lets two clusters compare
    // tables by exchanging one number). Re-run the query through
    // shuffled/re-partitioned inputs and pin equality.
    val dir = "/root/testdata/sf0.001"
    val base = SparkEntry.queries("fn_table_checksum")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rowHash = expr("CAST(conv(substring(md5(concat_ws('|', " +
      "CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING), " +
      "o_orderstatus, " +
      "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), " +
      "CAST(o_orderdate AS STRING), o_orderpriority)), 1, 15), " +
      "16, 10) AS BIGINT)")
    val shuffled = Tables(spark, dir, "orders")
      .repartition(7, col("o_custkey"))
      .sortWithinPartitions(desc("o_totalprice"))
      .select(col("o_orderpriority"), rowHash.as("rh"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        expr("CAST(sum(CAST(rh AS DECIMAL(38,0))) % " +
          "1152921504606846976 AS BIGINT)").as("checksum"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(base.toSeq === shuffled.toSeq)
  }

  test("linear attribution conserves cents: shares sum exactly to the " +
      "attributed purchases' totals") {
    // The audit invariant composite_attribution_linear exists for: a
    // float even-split leaks sub-cent mass; the integer div-plus-
    // remainder-to-earliest split must re-assemble EVERY attributed
    // purchase's cents with zero loss. Verified against the testdata
    // (not just the oracle hash, which could in principle agree on a
    // both-sides-lossy formula).
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("composite_attribution_linear")(
      spark, dir)
    val attributed = out.agg(sum(col("attributed_cents"))).head.getLong(0)
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        floor(unix_timestamp(col("ts"))).cast("long").as("es"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("es").as("pes"), col("cents"))
    val t = e.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("es").as("tes"))
    val touched = p.join(t, Seq("user_id"))
      .filter(col("tes") < col("pes") &&
        col("pes") - col("tes") <= 7L * 86400L)
      .select(col("pid"), col("cents")).distinct()
    val expected = touched.agg(sum(col("cents"))).head.getLong(0)
    assert(attributed === expected,
      s"attributed $attributed != touched-purchase total $expected")
  }
  test("ts_changepoint recovers a planted mean shift exactly") {
    // Synthetic series with a known level shift: 20 days at 100 cents,
    // then 20 days at 500 cents, one event per day per type. The CUSUM
    // argmax must land exactly on the last pre-shift day, for every
    // series. Runs the SAME generated SQL the registered query uses.
    val rows = for {
      typ <- Seq("a", "b")
      d <- 0 until 40
    } yield (typ, java.sql.Timestamp.valueOf(
        f"2024-03-${d / 2 + 1}%02d ${12 * (d % 2)}%02d:00:00"),
      if (d < 20) 1.00 else 5.00)
    // two observations per calendar day -> 20 days, shift after day 10
    rows.toDF("event_type", "ts", "value")
      .createOrReplaceTempView("events_changepoint")
    val out = spark.sql(graft.ops.TsOps.changepointSql(
        "DECIMAL(38,0)", "events_changepoint"))
      .collect().map(r => (r.getString(0), r.getDate(2).toString)).toMap
    // d < 20 -> first 10 calendar days are low; CUSUM max at the last
    // low day (2024-03-10) for both series
    assert(out === Map("a" -> "2024-03-10", "b" -> "2024-03-10"))
  }

  test("A/B statistics are bounded; the mixture budget is exactly exhausted") {
    val dir = "/root/testdata/sf0.001"
    // KS D is a normalized sup-distance: 0 ≤ D ≤ 1000 permille
    val ks = SparkEntry.queries("composite_ab_ks")(spark, dir)
      .collect().head
    val d = ks.getAs[Long]("d_permille")
    assert(d >= 0L && d <= 1000L, s"KS D out of range: $d")
    // AUC is a probability: 0 ≤ AUC ≤ 10⁶ ppm
    val auc = SparkEntry.queries("composite_ab_auc")(spark, dir)
      .collect().head.getAs[Long]("auc_ppm")
    assert(auc >= 0L && auc <= 1000000L, s"AUC out of range: $auc")
    // DiD: all four cells populated on the testdata, estimate defined
    val did = SparkEntry.queries("composite_ab_did")(spark, dir)
      .collect().head
    assert(!did.isNullAt(did.fieldIndex("did_milli")))
    // mixture: weights in [0, 1000], non-increasing in rank order, and
    // Σ tokens·weight = 1000·budget EXACTLY (the greedy takes whole
    // sources then one exact fractional marginal — nothing is lost to
    // rounding except inside the integer-div marginal itself, which
    // the audit reconstructs)
    val mix = SparkEntry.queries("sample_mixture_budget")(spark, dir)
      .collect()
    val weights = mix.map(_.getAs[Long]("weight_permille"))
    assert(weights.forall(w => w >= 0L && w <= 1000L))
    assert(weights.zip(weights.tail).forall { case (a, b) => a >= b },
      "greedy weights must be non-increasing in rank")
    val tokens = mix.map(_.getAs[Long]("tokens"))
    val total = tokens.sum
    val budget = total / 2
    val spent = mix.map(r => r.getAs[Long]("tokens") *
      r.getAs[Long]("weight_permille")).sum
    // whole sources contribute tokens·1000; the marginal contributes
    // (budget − cum)·1000 rounded DOWN by at most (tokens_marginal − 1)
    assert(spent <= budget * 1000 && spent > budget * 1000 - tokens.max,
      s"budget exhaustion violated: spent $spent vs budget $budget")
  }

}
