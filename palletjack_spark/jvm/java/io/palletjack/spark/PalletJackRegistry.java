package io.palletjack.spark;

import java.util.Map;
import java.util.concurrent.ConcurrentHashMap;

/**
 * Driver-side registry of per-file column statistics for index-registered
 * parquet roots, populated from the Python side (index/jvm_routing.py)
 * out of the metadata-index sidecar.
 *
 * <p>Layout: root path (no trailing slash, no "file:" scheme) -&gt;
 * { file path -&gt; { column name -&gt; double[]{min, max} } }.  The values
 * are the index's numeric stat projection (epoch micros for timestamps,
 * days for dates — the same units Catalyst literals use internally), so
 * {@link PalletJackFilePruneRule} can compare them directly against
 * literal values.  A file present in the map with no entry for a queried
 * column is kept (stats-unknown is never pruned).
 *
 * <p>This is the JVM production vehicle for the routing the Python
 * stand-in (index/routing.py) does at the DataFrame layer — SURVEY §4's
 * named SparkSessionExtensions deployment path; the registry itself is a
 * bounded push (files × predicate-relevant columns × 2 doubles), the
 * 100 TB analogue being a broadcast of the aggregated sidecar.
 */
public final class PalletJackRegistry {
    private static final Map<String, Map<String, Map<String, double[]>>> ROOTS =
            new ConcurrentHashMap<>();

    private PalletJackRegistry() {}

    public static String canon(String path) {
        String p = path;
        if (p.startsWith("file:")) {
            p = p.substring(5);
        }
        while (p.length() > 1 && p.endsWith("/")) {
            p = p.substring(0, p.length() - 1);
        }
        return p;
    }

    public static void register(String root, Map<String, Map<String, double[]>> files) {
        ROOTS.put(canon(root), files);
    }

    public static void unregister(String root) {
        ROOTS.remove(canon(root));
    }

    public static void clear() {
        ROOTS.clear();
    }

    public static int size() {
        return ROOTS.size();
    }

    /** The registered root covering {@code path} (itself or an ancestor
     *  directory — a pruned relation's root paths are leaf files), or
     *  null when none is registered. */
    public static String rootFor(String path) {
        String p = canon(path);
        while (true) {
            if (ROOTS.containsKey(p)) {
                return p;
            }
            int slash = p.lastIndexOf('/');
            if (slash <= 0) {
                return null;
            }
            p = p.substring(0, slash);
        }
    }

    public static Map<String, Map<String, double[]>> filesFor(String root) {
        return ROOTS.get(canon(root));
    }
}
