package graft.tools

/** Between-JVM interlude for the cross-JVM-residue A/B (round-15
  * verdict #2): a tiny main the repro harness can insert BETWEEN two
  * `runMain graft.Bench …` forks in one sbt invocation, to change one
  * thing about the inter-JVM state without touching Bench itself.
  *
  * Modes (first arg):
  *  - `sleep <sec>`    — idle wait: tests whether the +11 %/predecessor
  *    residue DECAYS on its own (async FS/journal work draining).
  *  - `dropcaches`     — sync + `echo 3 > /proc/sys/vm/drop_caches`:
  *    evicts every clean page and reclaims slab. If the successor's
  *    residue vanishes, the mechanism is page-cache/reclaim state (the
  *    predecessor's dead pages making the successor's allocations pay
  *    reclaim), not leftover dirty IO — the io-settle already rules
  *    that out (dirty counters near zero during the residue).
  *  - `compact`        — `echo 1 > /proc/sys/vm/compact_memory`: forces
  *    full physical-memory compaction without dropping any cache. If
  *    THIS alone removes the residue where `dropcaches` state is
  *    ambiguous, the mechanism is free-memory FRAGMENTATION — the
  *    predecessor's churn leaves the buddy allocator without
  *    contiguous blocks and the successor's large/THP allocations pay
  *    compaction stalls (invisible to dirty counters AND to the calib
  *    spin, which allocates nothing).
  *  - `vmstat`         — print the kernel counters that name the above
  *    mechanisms (/proc/vmstat reclaim/compaction/THP rows + meminfo
  *    free/cached + a buddyinfo high-order summary). The A/B script
  *    brackets each Bench fork with this mode and diffs, since nothing
  *    can snapshot BETWEEN runMain forks of one sbt invocation from
  *    outside.
  *
  * Prints what it did so the probe log is self-describing.
  */
object GateInterlude {
  def main(args: Array[String]): Unit = {
    args.headOption.getOrElse("sleep") match {
      case "sleep" =>
        val sec = args.lift(1).flatMap(_.toIntOption).getOrElse(90)
        println(s"[interlude] sleeping $sec s")
        Thread.sleep(sec * 1000L)
      case "dropcaches" =>
        val t0 = System.nanoTime()
        new ProcessBuilder("sync").start().waitFor()
        val rc = new ProcessBuilder("sh", "-c",
          "echo 3 > /proc/sys/vm/drop_caches").inheritIO().start().waitFor()
        println(f"[interlude] sync+dropcaches rc=$rc in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      case "compact" =>
        val t0 = System.nanoTime()
        val rc = new ProcessBuilder("sh", "-c",
          "echo 1 > /proc/sys/vm/compact_memory").inheritIO().start().waitFor()
        println(f"[interlude] compact_memory rc=$rc in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      case "vmstat" =>
        val tag = args.lift(1).getOrElse("")
        val want = Set(
          // direct-reclaim + kswapd pressure
          "pgscan_direct", "pgsteal_direct", "pgscan_kswapd", "pgsteal_kswapd",
          "allocstall_normal", "allocstall_movable",
          // compaction stalls (the fragmentation signature)
          "compact_stall", "compact_fail", "compact_success",
          "compact_daemon_wake",
          // THP allocation success/fallback
          "thp_fault_alloc", "thp_fault_fallback", "thp_collapse_alloc",
          // IO-side
          "pgmajfault", "nr_dirtied", "nr_written",
          "workingset_refault_file", "workingset_refault_anon")
        def lines(path: String): Iterator[String] = {
          val src = scala.io.Source.fromFile(path)
          try src.getLines().toList.iterator finally src.close()
        }
        val vm = lines("/proc/vmstat").map(_.split(' ')).collect {
          case Array(k, v) if want(k) => s"$k=$v"
        }.mkString(" ")
        val mem = lines("/proc/meminfo").filter(l =>
          l.startsWith("MemFree:") || l.startsWith("Cached:") ||
            l.startsWith("Dirty:") || l.startsWith("Writeback:"))
          .map(_.replaceAll("\\s+", "=").stripSuffix("=kB")).mkString(" ")
        // free blocks of order >= 4 (64 KB+): the contiguity THP and
        // large slab allocations actually need
        val high = lines("/proc/buddyinfo").map { l =>
          val p = l.trim.split("\\s+")
          p.drop(p.indexOf("zone") + 2).drop(4).map(_.toLong).sum
        }.sum
        // vda IO + DISCARD counters: the root fs mounts ext4 `discard`,
        // so deleting a dead JVM's multi-GB shuffle tree issues a storm
        // of device TRIMs plus async jbd2 extent freeing — IO stall the
        // dirty-page settle cannot see. /proc/diskstats fields after the
        // name: 1 reads, 4 ms-reading, 5 writes, 8 ms-writing,
        // 12 discards, 14 sectors-discarded, 15 ms-discarding.
        val disk = lines("/proc/diskstats").map(_.trim.split("\\s+"))
          .collectFirst { case p if p(2) == "vda" =>
            s"vda_r=${p(3)} vda_rms=${p(6)} vda_w=${p(7)} vda_wms=${p(10)} " +
              s"vda_disc=${p(14)} vda_disc_sect=${p(16)} vda_disc_ms=${p(17)}"
          }.getOrElse("vda_missing")
        // PSI io: cumulative stall micros — the stall the discard storm
        // causes shows up here even when Dirty/Writeback are clean
        val psi = try lines("/proc/pressure/io")
          .find(_.startsWith("full")).map(_.replace(" ", ";")).getOrElse("")
        catch { case _: Throwable => "" }
        println(s"[vmstat $tag] $vm $mem order4plus_free_blocks=$high $disk psi_io_$psi")
      case other =>
        sys.error(s"unknown interlude mode: $other")
    }
  }
}
