import java.math.BigDecimal;
import java.math.MathContext;
import java.math.RoundingMode;

import org.apache.spark.sql.api.java.UDF1;

/**
 * JVM twin of the Go-parity float renderer — strconv.FormatFloat(v,
 * 'f', -1, 64) semantics (reference tostring/tostring.go:71-74):
 * shortest decimal digits that round-trip to the exact double,
 * rendered in FIXED notation (never exponent), integral values
 * without ".0", NaN/"+Inf"/"-Inf" spelled Go-style, negative zero as
 * "-0".
 *
 * Digits from first principles (JDK 17's Double.toString is not
 * always shortest — fixed only in JDK 19, JDK-4511638): a decimal
 * string parses back to d iff it lies inside d's rounding interval
 * [d - gapDown/2, d + gapUp/2] (bounds inclusive iff d's mantissa is
 * even — parseDouble rounds half-to-even). Both bounds are exact
 * BigDecimals, so candidate testing is a pure compareTo — no string
 * formatting or parsing inside the search. The interval is ASYMMETRIC
 * at binade boundaries, which is why the correctly-rounded p-digit
 * value alone is insufficient: it can parse to the neighboring double
 * while the floor/ceil candidate parses to d (observed at
 * 6.483618076376552e+178 in the 185k-double fuzz). Binary search on p
 * is sound because in-interval existence is monotone (append a zero
 * digit), and Double.toString's digit count bounds it above (that
 * rendering round-trips).
 *
 * Equivalence with the Python/Arrow renderer (numpy
 * format_float_positional(unique=True, trim='-'), itself
 * hypothesis-pinned to the Decimal port of Go's algorithm) is
 * fuzz-pinned in tests/test_javakernel.py over multi-regime doubles
 * including subnormals, binade+1ulp values, decimal-exact values, and
 * the 1e15-1e17 boundary band.
 */
public class GoFloat implements UDF1<Double, String> {
    private static final BigDecimal TWO = BigDecimal.valueOf(2);

    @Override
    public String call(Double v) {
        if (v == null) return null;
        return format(v);
    }

    static String format(double d) {
        if (Double.isNaN(d)) return "NaN";
        if (d == Double.POSITIVE_INFINITY) return "+Inf";
        if (d == Double.NEGATIVE_INFINITY) return "-Inf";
        if (d == 0.0) {
            return (Double.doubleToRawLongBits(d) != 0L) ? "-0" : "0";
        }
        if (d < 0.0) return "-" + formatPositive(-d);
        return formatPositive(d);
    }

    private static String formatPositive(double d) {
        BigDecimal exact = new BigDecimal(d); // exact binary expansion
        // parse interval of d (positive): gapUp = ulp(d); gapDown =
        // d - nextDown(d), which is ulp/2 at a binade boundary and
        // MIN_VALUE at the smallest subnormal — the asymmetry falls
        // out of the arithmetic
        BigDecimal hi = exact.add(
            new BigDecimal(Math.ulp(d)).divide(TWO));
        BigDecimal lo = exact.subtract(
            exact.subtract(new BigDecimal(Math.nextDown(d))).divide(TWO));
        // parseDouble breaks midpoint ties toward the EVEN mantissa
        boolean closed = (Double.doubleToRawLongBits(d) & 1L) == 0L;

        // upper bound: Double.toString round-trips, so the shortest
        // digit count cannot exceed its significant-digit count
        int hiP = significantDigits(Double.toString(d));
        int loP = 1;
        while (loP < hiP) {
            int mid = (loP + hiP) >>> 1;
            if (bestAt(exact, mid, lo, hi, closed) != null) {
                hiP = mid;
            } else {
                loP = mid + 1;
            }
        }
        BigDecimal best = bestAt(exact, loP, lo, hi, closed);
        if (best == null) { // defensive: toString bound should hold
            best = bestAt(exact, 17, lo, hi, true);
        }
        // toPlainString never uses exponent notation — exactly Go 'f'
        return best.stripTrailingZeros().toPlainString();
    }

    /**
     * The in-interval p-significant-digit decimal closest to the
     * exact expansion (tie: even final digit, the shortest-repr
     * convention), or null if none exists at this precision. Only
     * floor/ceil of exact need checking: the interval contains exact,
     * so any in-interval decimal above (below) exact implies the
     * first one above (below) — the ceil (floor) — is in too.
     */
    private static BigDecimal bestAt(
            BigDecimal exact, int p, BigDecimal lo, BigDecimal hi,
            boolean closed) {
        BigDecimal fl =
            exact.round(new MathContext(p, RoundingMode.FLOOR));
        int cf = fl.compareTo(lo);
        boolean flIn = closed ? cf >= 0 : cf > 0;
        if (fl.compareTo(exact) == 0) {
            return fl; // exact is itself a p-digit decimal
        }
        BigDecimal ce = fl.add(fl.ulp());
        int cc = ce.compareTo(hi);
        boolean ceIn = closed ? cc <= 0 : cc < 0;
        if (flIn && ceIn) {
            BigDecimal dFl = exact.subtract(fl);
            BigDecimal dCe = ce.subtract(exact);
            int cmp = dFl.compareTo(dCe);
            if (cmp < 0) return fl;
            if (cmp > 0) return ce;
            // exact midpoint: pick the even final digit
            return fl.unscaledValue().testBit(0) ? ce : fl;
        }
        if (flIn) return fl;
        if (ceIn) return ce;
        return null;
    }

    private static int significantDigits(String toStr) {
        int n = 0;
        boolean seenNonZero = false;
        for (int i = 0; i < toStr.length(); i++) {
            char c = toStr.charAt(i);
            if (c == 'e' || c == 'E') break;
            if (c >= '0' && c <= '9') {
                if (c != '0') seenNonZero = true;
                if (seenNonZero) n++;
            }
        }
        // trailing zeros before 'e' count as significant here (safe
        // overestimate); "1.0" -> 2 which still bounds shortest=1
        return Math.max(1, Math.min(17, n));
    }
}
