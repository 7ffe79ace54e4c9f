import java.util.ArrayList;
import java.util.HashMap;
import java.util.HashSet;
import java.util.List;
import java.util.regex.Pattern;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF1;

/**
 * JVM-side Gopher quality-signal counter — the cluster-scale twin of
 * the Arrow/pandas kernel in exporter_spark/operators/text.py
 * (_gopher_count_udf). Round-5 CPU attribution measured the Python
 * loop at 75% of operator wall at 30x corpus scale (SCALE.md); this
 * kernel removes both the Python compute and the Arrow transfer while
 * emitting the IDENTICAL integer counts — divisions and round(6) stay
 * in Catalyst either way, so the two kernels cannot drift.
 *
 * Semantics replicated exactly (equivalence-tested from pytest):
 *  - trim is SPACE-only; the whitespace split class is
 *    [ \t\n\x0B\f\r]+ (Java \s semantics the expr path already uses);
 *  - token/line lengths count CODE POINTS (Python len), not UTF-16
 *    units;
 *  - "#"/"..." symbol counts are non-overlapping, like str.count;
 *  - bullet prefixes "- ", "* ", "• "; ellipsis suffixes "..."
 *    and "…";
 *  - n-gram fields: top-{2,3}-gram max multiplicity + totals, and
 *    distinct/total {5..10}-gram counts.
 *
 * Output field order must match the struct schema registered in
 * exporter_spark/javakernel/__init__.py: wc, swl, alpha, sym, dw, nl,
 * dl, bul, ell, t2, n2, t3, n3, then (d{n}, g{n}) for n in 5..10.
 */
public class GopherCounts implements UDF1<String, Row> {
    private static final Pattern WS = Pattern.compile("[ \\t\\n\\x0B\\f\\r]+");
    private static final int[] DUP_NS = {5, 6, 7, 8, 9, 10};
    private static final int N_FIELDS = 13 + 2 * DUP_NS.length;

    private static String stripSpaces(String s) {
        int a = 0, b = s.length();
        while (a < b && s.charAt(a) == ' ') a++;
        while (b > a && s.charAt(b - 1) == ' ') b--;
        return s.substring(a, b);
    }

    private static long countNonOverlapping(String s, String pat) {
        long n = 0;
        int i = s.indexOf(pat);
        while (i >= 0) {
            n++;
            i = s.indexOf(pat, i + pat.length());
        }
        return n;
    }

    private static boolean hasAsciiAlpha(String s) {
        for (int i = 0; i < s.length(); i++) {
            char c = s.charAt(i);
            if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) return true;
        }
        return false;
    }

    private static long maxMultiplicity(List<String> grams) {
        if (grams.isEmpty()) return 0L;
        HashMap<String, Integer> cnt = new HashMap<>();
        int best = 0;
        for (String g : grams) {
            int c = cnt.merge(g, 1, Integer::sum);
            if (c > best) best = c;
        }
        return best;
    }

    @Override
    public Row call(String t) {
        if (t == null) {
            return RowFactory.create(new Object[N_FIELDS]);
        }
        List<String> toks = new ArrayList<>();
        for (String x : WS.split(stripSpaces(t))) {
            if (!x.isEmpty()) toks.add(x);
        }
        List<String> lines = new ArrayList<>();
        for (String ln : t.split("\n", -1)) {
            String x = stripSpaces(ln);
            if (!x.isEmpty()) lines.add(x);
        }
        int nt = toks.size();

        long wc = nt;
        long swl = 0;
        long alpha = 0;
        HashSet<String> tokSet = new HashSet<>();
        for (String x : toks) {
            swl += x.codePointCount(0, x.length());
            if (hasAsciiAlpha(x)) alpha++;
            tokSet.add(x);
        }
        long sym = countNonOverlapping(t, "#") + countNonOverlapping(t, "...");
        long dw = tokSet.size();
        long nl = lines.size();
        HashSet<String> lineSet = new HashSet<>(lines);
        long dl = lineSet.size();
        long bul = 0, ell = 0;
        for (String x : lines) {
            if (x.startsWith("- ") || x.startsWith("* ") || x.startsWith("• ")) bul++;
            if (x.endsWith("...") || x.endsWith("…")) ell++;
        }

        List<String> g2 = ngrams(toks, 2);
        List<String> g3 = ngrams(toks, 3);
        long t2 = maxMultiplicity(g2), n2 = g2.size();
        long t3 = maxMultiplicity(g3), n3 = g3.size();

        Object[] out = new Object[N_FIELDS];
        int i = 0;
        out[i++] = wc; out[i++] = swl; out[i++] = alpha; out[i++] = sym;
        out[i++] = dw; out[i++] = nl; out[i++] = dl; out[i++] = bul;
        out[i++] = ell; out[i++] = t2; out[i++] = n2; out[i++] = t3;
        out[i++] = n3;
        for (int n : DUP_NS) {
            if (nt >= n) {
                HashSet<String> distinct = new HashSet<>(ngrams(toks, n));
                out[i++] = (long) distinct.size();
                out[i++] = (long) (nt - n + 1);
            } else {
                out[i++] = 0L;
                out[i++] = 0L;
            }
        }
        return RowFactory.create(out);
    }

    private static List<String> ngrams(List<String> toks, int n) {
        int total = toks.size() - n + 1;
        List<String> out = new ArrayList<>(Math.max(0, total));
        StringBuilder sb = new StringBuilder();
        for (int i = 0; i < total; i++) {
            sb.setLength(0);
            for (int j = 0; j < n; j++) {
                if (j > 0) sb.append(' ');
                sb.append(toks.get(i + j));
            }
            out.add(sb.toString());
        }
        return out;
    }
}
