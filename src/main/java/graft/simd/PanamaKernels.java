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
}
