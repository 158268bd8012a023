package graft.tools

/** Microbenchmark for the distance kernels (fp32 vs SQ8 int8) —
  * dev-only sanity that the quantized walk's kernel actually beats the
  * fp32 one per distance evaluation. Usage: runMain graft.tools.KernelBench [dim] */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val dim = if (args.length > 0) args(0).toInt else 100
    val n = 4096
    val iters = 2000
    val rnd = new java.util.Random(7)
    val fa = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
    val ba = fa.map(_.map(x => (x * 127).toByte))
    val k = graft.simd.VectorKernels.Holder.KERNEL
    println(s"kernel: ${k.getClass.getSimpleName}")

    var sink = 0.0
    def bench(name: String)(f: Int => Double): Unit = {
      // warmup
      var w = 0
      while (w < 200) { var i = 0; while (i < n - 1) { sink += f(i); i += 1 }; w += 1 }
      val t0 = System.nanoTime()
      var it = 0
      while (it < iters) { var i = 0; while (i < n - 1) { sink += f(i); i += 1 }; it += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      val evals = iters.toLong * (n - 1)
      println(f"$name%-8s ${evals / dt / 1e6}%8.1f M dist/s")
    }

    bench("fp32")(i => k.l2sq(fa(i), fa(i + 1)))
    bench("int8")(i => k.l2sqI8(ba(i), ba(i + 1)).toDouble)
    println(s"sink $sink")
  }
}
