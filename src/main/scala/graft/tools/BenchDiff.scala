package graft.tools

/** Dev tool: per-query bench drift report between two bench-detail
  * files (the `bench.json` / `BENCH_r*_detail.json` format: one JSON
  * object with a flat `"queries":{"name":seconds,...}` map of
  * per-query MINIMUMS across passes — the stable signal; totals are
  * environment weather, per the r8/r9 drift forensics).
  *
  * Run: sbt "runMain graft.tools.BenchDiff BENCH_r09_detail.json bench.json"
  *
  * Prints: queries only in one file (new/removed, with their summed
  * seconds), movers whose min changed by more than 1.5x in either
  * direction (sorted by absolute seconds moved), and the common-row
  * sums — turning the manual "which rows drifted between rounds"
  * forensics into one command. Zero dependencies: the queries map is
  * flat `"name":number` pairs, parsed with a regex (values never
  * contain quotes or braces).
  */
object BenchDiff {
  private val Pair = "\"(q_[A-Za-z0-9_]+)\"\\s*:\\s*(-?[0-9.eE+-]+)".r

  private def load(path: String): Map[String, Double] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    // Restrict to the queries map so a top-level "value" can't leak in.
    val qs = text.indexOf("\"queries\"")
    require(qs >= 0, s"$path has no \"queries\" map")
    val body = text.substring(qs)
    Pair.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter(_._2 >= 0) // -1 marks attempted-but-failed in bench.json
      .toMap
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BenchDiff <old.json> <new.json>")
    val (a, b) = (load(args(0)), load(args(1)))
    // NAME-SET GATE (r12 verdict task 6 — the 1:1:1 discipline
    // NameCheck enforces for correctness, applied to the bench
    // detail): the NEW file must carry a timing for EVERY declared
    // query — a missing row means a partial/killed/ONLY-restricted
    // run or a post-close addition that was never re-benched, and an
    // extra q_* row means a renamed or removed query's timing is
    // still being reported. `_memo_*` lines are exempt by
    // construction (the q_* regex never matches them). The OLD file
    // is a historical snapshot and may legitimately differ.
    val declared = graft.SparkEntry.queries.keySet
    val missing = (declared -- b.keySet).toSeq.sorted
    val extra = (b.keySet -- declared).toSeq.sorted
    if (missing.nonEmpty || extra.nonEmpty) {
      if (missing.nonEmpty) System.err.println(
        s"[benchdiff] FAIL: declared queries missing from ${args(1)}: " +
          missing.mkString(", "))
      if (extra.nonEmpty) System.err.println(
        s"[benchdiff] FAIL: undeclared rows in ${args(1)}: " +
          extra.mkString(", "))
      sys.exit(1)
    }
    // Mixed-sampling annotation (Bench's extra_pass_rows field): these
    // rows' minima are min-of-(passes+1) while everything else is
    // min-of-passes — surface the set so a mover there is read against
    // the right protocol.
    val extraRe = "\"extra_pass_rows\"\\s*:\\s*\\[([^\\]]*)\\]".r
    val newText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(1))))
    extraRe.findFirstMatchIn(newText).foreach { m =>
      println("extra-pass rows (min-of-(passes+1) protocol): " +
        m.group(1).replace("\"", ""))
    }
    // Sampling-depth annotation (r14 verdict What's-wrong #3): minima
    // are monotone non-increasing in window count, so a ratio between
    // files with different n_windows partly measures SAMPLING, not
    // the engine. Print both sides so the consumer reads ratios in
    // context; "?" = a pre-r15 file that didn't declare it.
    val winRe = "\"n_windows\"\\s*:\\s*(\\d+)".r
    def windows(path: String): String = {
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)))
      winRe.findFirstMatchIn(text).map(_.group(1)).getOrElse("?")
    }
    println(s"sampling windows: old=${windows(args(0))} " +
      s"new=${windows(args(1))} (minima deepen with window count)")
    val common = a.keySet & b.keySet
    val added = (b.keySet -- a.keySet).toSeq.sorted
    val removed = (a.keySet -- b.keySet).toSeq.sorted
    def sum(m: Map[String, Double], ks: Iterable[String]) =
      ks.iterator.map(m).sum
    println(f"common rows: ${common.size}  " +
      f"old=${sum(a, common)}%.1f s  new=${sum(b, common)}%.1f s")
    if (added.nonEmpty)
      println(f"new rows (${added.size}): ${sum(b, added)}%.1f s  " +
        added.mkString(", "))
    if (removed.nonEmpty)
      println(f"removed rows (${removed.size}): ${sum(a, removed)}%.1f s  " +
        removed.mkString(", "))
    val movers = common.toSeq
      .map(k => (k, a(k), b(k)))
      .filter { case (_, o, n) =>
        val lo = math.min(o, n)
        // Ignore sub-50ms noise rows even when the ratio trips.
        math.max(o, n) > 1.5 * lo && math.abs(n - o) > 0.05
      }
      .sortBy { case (_, o, n) => -math.abs(n - o) }
    if (movers.isEmpty) println("movers >1.5x: none")
    else {
      println(s"movers >1.5x (${movers.size}):")
      movers.foreach { case (k, o, n) =>
        val dir = if (n > o) "SLOWER" else "faster"
        println(f"  $k%-28s ${o}%8.3f -> ${n}%8.3f s  (${n / o}%5.2fx $dir)")
      }
    }
  }
}
