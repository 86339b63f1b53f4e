/** Host-health gate for isolated bench legs: replicates graft.Bench's
  * calibOnce(200M) single-thread and calibParOnce(100M, N) all-cores
  * probes in a bare JVM (no Spark), printing "<single_s> <par_s>".
  * Healthy norms on this box: approx 0.10 s single, approx 0.07-0.08 s parallel
  * (the r9 isolated graph leg's calib_q/calib_pq). tools/hostgate.sh
  * loops until consecutive probes pass, so a bench leg never STARTS
  * inside a host-contention window (it can still get hit mid-leg --
  * the in-run probes adjudicate that after the fact).
  */
public class HostGate {
  static double single(long iters) {
    long t0 = System.nanoTime();
    long s = 0;
    for (long i = 0; i < iters; i++) s += i * i;
    if (s == 42) System.out.print("");
    return (System.nanoTime() - t0) / 1e9;
  }

  public static void main(String[] args) throws Exception {
    int threads = args.length > 0 ? Integer.parseInt(args[0]) : 32;
    single(200_000_000L); // discard: JIT warm
    double st = single(200_000_000L);
    Thread[] ts = new Thread[threads];
    long t0 = System.nanoTime();
    for (int i = 0; i < threads; i++) {
      ts[i] = new Thread(() -> single(100_000_000L));
      ts[i].start();
    }
    for (Thread t : ts) t.join();
    double pt = (System.nanoTime() - t0) / 1e9;
    System.out.printf("%.4f %.4f%n", st, pt);
  }
}
