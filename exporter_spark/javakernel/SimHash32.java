import java.nio.charset.StandardCharsets;
import java.security.MessageDigest;
import java.security.NoSuchAlgorithmException;

import org.apache.spark.sql.api.java.UDF1;

/**
 * JVM-side 32-bit SimHash fingerprint — the cluster-scale twin of the
 * Arrow/pandas kernel in exporter_spark/operators/dedup.py
 * (_make_simhash_udf). Round-6 CPU attribution (SCALE.md) measured the
 * pandas kernel's Python share at 63% of operator wall at 30x corpus
 * scale and rising (the per-token hashlib.md5 loop is interpreted
 * work, exactly the Gopher profile); this kernel removes the Python
 * compute and the Arrow transfer while emitting the IDENTICAL
 * fingerprint, so the pigeonhole chunk join downstream cannot drift.
 *
 * Semantics replicated exactly (fuzz-pinned from pytest):
 *  - NULL text -> NULL fingerprint (drops out of the chunk join; the
 *    pandas kernel documents why this must not be 0);
 *  - tokens are maximal runs of non-whitespace, where whitespace is
 *    CPython's str \s set: Unicode White_Space (which Java's
 *    Character.isWhitespace approximates but excludes the
 *    non-breaking NBSP/FIGURE SPACE/NNBSP and NEL) -- the union below
 *    matches Python's re.split("\\s+") token boundaries code point
 *    for code point;
 *  - per token, the 32-bit lane value is the first 8 hex chars of
 *    md5(utf-8 bytes) (= first 4 digest bytes, big-endian); on
 *    MALFORMED text (unpaired surrogates, which have no UTF-8
 *    encoding) getBytes(UTF_8) substitutes '?' per surrogate — the
 *    pandas kernel mirrors this with errors="replace" (round 7;
 *    previously it raised, so kernel choice changed behavior there);
 *  - each bit contributes +1/-1 to its lane; fingerprint bit j is set
 *    iff lane j sums strictly positive; no tokens -> 0L.
 */
public class SimHash32 implements UDF1<String, Long> {
    private static final ThreadLocal<MessageDigest> MD5 =
        ThreadLocal.withInitial(() -> {
            try {
                return MessageDigest.getInstance("MD5");
            } catch (NoSuchAlgorithmException e) {
                throw new IllegalStateException(e);
            }
        });

    /** CPython str-pattern \s: Unicode White_Space plus nothing else
     *  Java's isWhitespace misses (NEL 0x85 and the non-breaking
     *  spaces 0xA0/0x2007/0x202F); 0x1C-0x1F are in BOTH sets. */
    private static boolean isPySpace(int cp) {
        return Character.isWhitespace(cp)
            || cp == 0x85 || cp == 0xA0 || cp == 0x2007 || cp == 0x202F;
    }

    @Override
    public Long call(String text) {
        if (text == null) {
            return null;
        }
        MessageDigest md = MD5.get();
        int[] lanes = new int[32];
        boolean any = false;
        int n = text.length();
        int i = 0;
        while (i < n) {
            int cp = text.codePointAt(i);
            if (isPySpace(cp)) {
                i += Character.charCount(cp);
                continue;
            }
            int start = i;
            while (i < n) {
                cp = text.codePointAt(i);
                if (isPySpace(cp)) break;
                i += Character.charCount(cp);
            }
            byte[] d = md.digest(
                text.substring(start, i).getBytes(StandardCharsets.UTF_8));
            md.reset();
            int h = ((d[0] & 0xFF) << 24) | ((d[1] & 0xFF) << 16)
                  | ((d[2] & 0xFF) << 8) | (d[3] & 0xFF);
            any = true;
            for (int j = 0; j < 32; j++) {
                lanes[j] += ((h >>> j) & 1) * 2 - 1;
            }
        }
        if (!any) {
            return 0L;
        }
        long fp = 0L;
        for (int j = 0; j < 32; j++) {
            if (lanes[j] > 0) {
                fp |= 1L << j;
            }
        }
        return fp;
    }
}
