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
