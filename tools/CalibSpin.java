/** Single-file-launch twin of graft.Bench.calibrate(): the identical
 * 400M-step long-xorshift spin, so the scale gate's cooldown check and
 * the in-record calib stamps measure the SAME fixed work (the previous
 * python spin tracked the python build, not the host — its reference
 * drifted 0.62 -> 0.95 s across a conda upgrade while the Scala loop
 * held ~0.75 s; round-13 advisor finding). Run: java tools/CalibSpin.java
 */
public class CalibSpin {
  public static void main(String[] args) {
    long x = 0x9E3779B97F4A7C15L;
    final long steps = 400_000_000L;
    long t0 = System.nanoTime();
    for (long i = 0; i < steps; i++) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; }
    double dt = (System.nanoTime() - t0) / 1e9;
    if (x == 42L) System.err.println("calib"); // keep the loop live
    System.out.printf(java.util.Locale.ROOT, "%.3f%n", dt);
  }
}
