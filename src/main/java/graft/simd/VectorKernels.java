package graft.simd;

/**
 * SIMD squared-L2 kernel via the JDK incubator Vector API (Panama) with a
 * scalar fallback -- the JVM analog of the reference's AVX kernels
 * (pyglass/glass/simd/distance.hpp:184-227). Used only by the approximate
 * index path (HnswIndex); oracle-exact distances stay in the Catalyst
 * expressions with fixed sequential accumulation.
 *
 * The incubator module may be absent at runtime (no --add-modules flag);
 * callers must route through {@link Holder#KERNEL}, which falls back to
 * the unrolled scalar loop.
 */
public final class VectorKernels {

    public interface DistanceKernel {
        double l2sq(float[] a, float[] b);

        /**
         * Integer squared-L2 over signed-byte SQ8 codes -- the quantized
         * in-graph walk distance (reference searches its graphs on int8
         * codes and re-ranks candidates in fp32, pyglass/glass/
         * searcher.hpp:576-578). Max per-dim diff is 254, so an int
         * accumulator holds dims up to ~33k. Scalar default; Panama
         * override widens bytes to int lanes.
         */
        default int l2sqI8(byte[] a, byte[] b) {
            return l2sqI8Off(a, b, 0, Math.min(a.length, b.length));
        }

        /**
         * Same, against a slice of a flat code matrix (node i's codes at
         * offset i*dim) -- one pointer chase less per hop than jagged
         * byte[][] and contiguous for hardware prefetch.
         */
        default int l2sqI8Off(byte[] a, byte[] flat, int off, int n) {
            int s0 = 0, s1 = 0, s2 = 0, s3 = 0;
            int i = 0;
            for (; i + 3 < n; i += 4) {
                int d0 = a[i] - flat[off + i];
                int d1 = a[i + 1] - flat[off + i + 1];
                int d2 = a[i + 2] - flat[off + i + 2];
                int d3 = a[i + 3] - flat[off + i + 3];
                s0 += d0 * d0; s1 += d1 * d1; s2 += d2 * d2; s3 += d3 * d3;
            }
            for (; i < n; i++) {
                int d = a[i] - flat[off + i];
                s0 += d * d;
            }
            return (s0 + s1) + (s2 + s3);
        }

        /**
         * Both operands are rows of the same flat code matrix (node-to-
         * node distance during the quantized graph build).
         */
        default int l2sqI8Both(byte[] flat, int offA, int offB, int n) {
            int s0 = 0, s1 = 0, s2 = 0, s3 = 0;
            int i = 0;
            for (; i + 3 < n; i += 4) {
                int d0 = flat[offA + i] - flat[offB + i];
                int d1 = flat[offA + i + 1] - flat[offB + i + 1];
                int d2 = flat[offA + i + 2] - flat[offB + i + 2];
                int d3 = flat[offA + i + 3] - flat[offB + i + 3];
                s0 += d0 * d0; s1 += d1 * d1; s2 += d2 * d2; s3 += d3 * d3;
            }
            for (; i < n; i++) {
                int d = flat[offA + i] - flat[offB + i];
                s0 += d * d;
            }
            return (s0 + s1) + (s2 + s3);
        }

        /**
         * Hot-loop variant: the query side is pre-widened to short[]
         * ONCE per search, halving the per-hop lane conversions (the
         * data side still loads packed bytes -- that is where the 4x
         * memory-traffic saving lives).
         */
        default int l2sqI8Pre(short[] q, byte[] flat, int off, int n) {
            int s0 = 0, s1 = 0, s2 = 0, s3 = 0;
            int i = 0;
            for (; i + 3 < n; i += 4) {
                int d0 = q[i] - flat[off + i];
                int d1 = q[i + 1] - flat[off + i + 1];
                int d2 = q[i + 2] - flat[off + i + 2];
                int d3 = q[i + 3] - flat[off + i + 3];
                s0 += d0 * d0; s1 += d1 * d1; s2 += d2 * d2; s3 += d3 * d3;
            }
            for (; i < n; i++) {
                int d = q[i] - flat[off + i];
                s0 += d * d;
            }
            return (s0 + s1) + (s2 + s3);
        }
    }

    public static final class Scalar implements DistanceKernel {
        @Override
        public double l2sq(float[] a, float[] b) {
            int n = a.length;
            float s0 = 0f, s1 = 0f, s2 = 0f, s3 = 0f;
            int i = 0;
            for (; i + 3 < n; i += 4) {
                float d0 = a[i] - b[i];
                float d1 = a[i + 1] - b[i + 1];
                float d2 = a[i + 2] - b[i + 2];
                float d3 = a[i + 3] - b[i + 3];
                s0 += d0 * d0; s1 += d1 * d1; s2 += d2 * d2; s3 += d3 * d3;
            }
            for (; i < n; i++) {
                float d = a[i] - b[i];
                s0 += d * d;
            }
            return (double) ((s0 + s1) + (s2 + s3));
        }
    }

    public static final class Holder {
        public static final DistanceKernel KERNEL = pick();

        private static DistanceKernel pick() {
            try {
                Class<?> cls = Class.forName("graft.simd.PanamaKernels");
                return (DistanceKernel) cls.getDeclaredConstructor().newInstance();
            } catch (Throwable t) {
                return new Scalar();
            }
        }
    }

    private VectorKernels() {}
}
