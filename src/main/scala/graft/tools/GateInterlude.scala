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
      case other =>
        sys.error(s"unknown interlude mode: $other")
    }
  }
}
