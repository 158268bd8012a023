package graft.simd;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorSpecies;

/** Panama (jdk.incubator.vector) squared-L2; loaded reflectively by
 * {@link VectorKernels.Holder} so its absence degrades to scalar. */
public final class PanamaKernels implements VectorKernels.DistanceKernel {
    private static final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;

    @Override
    public double l2sq(float[] a, float[] b) {
        int n = a.length;
        int upper = S.loopBound(n);
        FloatVector acc = FloatVector.zero(S);
        int i = 0;
        for (; i < upper; i += S.length()) {
            FloatVector va = FloatVector.fromArray(S, a, i);
            FloatVector vb = FloatVector.fromArray(S, b, i);
            FloatVector d = va.sub(vb);
            acc = d.fma(d, acc);
        }
        float s = acc.reduceLanes(jdk.incubator.vector.VectorOperators.ADD);
        for (; i < n; i++) {
            float d = a[i] - b[i];
            s += d * d;
        }
        return (double) s;
    }

    private static final VectorSpecies<Byte> B128 = jdk.incubator.vector.ByteVector.SPECIES_128;
    private static final VectorSpecies<Short> S256 = jdk.incubator.vector.ShortVector.SPECIES_256;
    private static final VectorSpecies<Integer> I256 = jdk.incubator.vector.IntVector.SPECIES_256;

    /** SQ8-code distance: 16 bytes/iter widened to short lanes, diff in
     * short (max |d| = 254 fits), squares accumulated in int halves. */
    @Override
    public int l2sqI8Off(byte[] a, byte[] flat, int off, int n) {
        int upper = B128.loopBound(n);
        jdk.incubator.vector.IntVector acc = jdk.incubator.vector.IntVector.zero(I256);
        int i = 0;
        for (; i < upper; i += B128.length()) {
            jdk.incubator.vector.ShortVector va = (jdk.incubator.vector.ShortVector)
                jdk.incubator.vector.ByteVector.fromArray(B128, a, i)
                    .convertShape(jdk.incubator.vector.VectorOperators.B2S, S256, 0);
            jdk.incubator.vector.ShortVector vb = (jdk.incubator.vector.ShortVector)
                jdk.incubator.vector.ByteVector.fromArray(B128, flat, off + i)
                    .convertShape(jdk.incubator.vector.VectorOperators.B2S, S256, 0);
            jdk.incubator.vector.ShortVector d = va.sub(vb);
            jdk.incubator.vector.IntVector lo = (jdk.incubator.vector.IntVector)
                d.convertShape(jdk.incubator.vector.VectorOperators.S2I, I256, 0);
            jdk.incubator.vector.IntVector hi = (jdk.incubator.vector.IntVector)
                d.convertShape(jdk.incubator.vector.VectorOperators.S2I, I256, 1);
            acc = acc.add(lo.mul(lo)).add(hi.mul(hi));
        }
        int s = acc.reduceLanes(jdk.incubator.vector.VectorOperators.ADD);
        for (; i < n; i++) {
            int d = a[i] - flat[off + i];
            s += d * d;
        }
        return s;
    }

    @Override
    public int l2sqI8(byte[] a, byte[] b) {
        return l2sqI8Off(a, b, 0, Math.min(a.length, b.length));
    }

    @Override
    public int l2sqI8Both(byte[] flat, int offA, int offB, int n) {
        int upper = B128.loopBound(n);
        jdk.incubator.vector.IntVector acc = jdk.incubator.vector.IntVector.zero(I256);
        int i = 0;
        for (; i < upper; i += B128.length()) {
            jdk.incubator.vector.ShortVector va = (jdk.incubator.vector.ShortVector)
                jdk.incubator.vector.ByteVector.fromArray(B128, flat, offA + i)
                    .convertShape(jdk.incubator.vector.VectorOperators.B2S, S256, 0);
            jdk.incubator.vector.ShortVector vb = (jdk.incubator.vector.ShortVector)
                jdk.incubator.vector.ByteVector.fromArray(B128, flat, offB + i)
                    .convertShape(jdk.incubator.vector.VectorOperators.B2S, S256, 0);
            jdk.incubator.vector.ShortVector d = va.sub(vb);
            jdk.incubator.vector.IntVector lo = (jdk.incubator.vector.IntVector)
                d.convertShape(jdk.incubator.vector.VectorOperators.S2I, I256, 0);
            jdk.incubator.vector.IntVector hi = (jdk.incubator.vector.IntVector)
                d.convertShape(jdk.incubator.vector.VectorOperators.S2I, I256, 1);
            acc = acc.add(lo.mul(lo)).add(hi.mul(hi));
        }
        int s = acc.reduceLanes(jdk.incubator.vector.VectorOperators.ADD);
        for (; i < n; i++) {
            int d = flat[offA + i] - flat[offB + i];
            s += d * d;
        }
        return s;
    }

    @Override
    public int l2sqI8Pre(short[] q, byte[] flat, int off, int n) {
        int upper = B128.loopBound(n);
        jdk.incubator.vector.IntVector acc = jdk.incubator.vector.IntVector.zero(I256);
        int i = 0;
        for (; i < upper; i += B128.length()) {
            jdk.incubator.vector.ShortVector va =
                jdk.incubator.vector.ShortVector.fromArray(S256, q, i);
            jdk.incubator.vector.ShortVector vb = (jdk.incubator.vector.ShortVector)
                jdk.incubator.vector.ByteVector.fromArray(B128, flat, off + i)
                    .convertShape(jdk.incubator.vector.VectorOperators.B2S, S256, 0);
            jdk.incubator.vector.ShortVector d = va.sub(vb);
            jdk.incubator.vector.IntVector lo = (jdk.incubator.vector.IntVector)
                d.convertShape(jdk.incubator.vector.VectorOperators.S2I, I256, 0);
            jdk.incubator.vector.IntVector hi = (jdk.incubator.vector.IntVector)
                d.convertShape(jdk.incubator.vector.VectorOperators.S2I, I256, 1);
            acc = acc.add(lo.mul(lo)).add(hi.mul(hi));
        }
        int s = acc.reduceLanes(jdk.incubator.vector.VectorOperators.ADD);
        for (; i < n; i++) {
            int d = q[i] - flat[off + i];
            s += d * d;
        }
        return s;
    }
}
