package io.palletjack.spark;

import java.util.ArrayList;
import java.util.List;
import java.util.Map;

import org.apache.hadoop.fs.Path;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.expressions.And;
import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.Cast;
import org.apache.spark.sql.catalyst.expressions.EqualTo;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.GreaterThan;
import org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.In;
import org.apache.spark.sql.catalyst.expressions.InSet;
import org.apache.spark.sql.catalyst.expressions.IsNotNull;
import org.apache.spark.sql.catalyst.expressions.IsNull;
import org.apache.spark.sql.catalyst.expressions.LessThan;
import org.apache.spark.sql.catalyst.expressions.LessThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.Not;
import org.apache.spark.sql.catalyst.expressions.Or;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.execution.datasources.FileStatusCache;
import org.apache.spark.sql.execution.datasources.HadoopFsRelation;
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex;
import org.apache.spark.sql.execution.datasources.LogicalRelation;
import org.apache.spark.sql.execution.datasources.PartitionSpec;
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.Decimal;
import org.apache.spark.sql.types.StructType;

import scala.Option;
import scala.jdk.javaapi.CollectionConverters;

/**
 * Catalyst optimizer rule: rewrite Filter(LogicalRelation(parquet)) over
 * an index-registered root to scan only the files whose per-column
 * [min, max] (from the metadata-index sidecar, via
 * {@link PalletJackRegistry}) can satisfy the filter's numeric
 * conjuncts.  The Filter itself is kept — pruning is a pure
 * optimization, identical results either way.  Disjunctions prune too
 * (round 13): the condition expands into a bounded DNF and a file is
 * dropped only when EVERY disjunct proves it matchless.  Anything the
 * rule cannot prove (an OR branch on an evidence-less column,
 * non-numeric literals, stats-less columns, unit- or value-changing
 * casts, a DNF past the cap) conservatively falls through untouched.  Hive-partitioned roots are supported: the rebuilt file
 * index keeps the original partition spec, so Spark's own scan-time
 * partition pruning composes with this rule's stats-based file pruning
 * within partitions.
 *
 * <p>This is SURVEY §4's named production vehicle for q16's session
 * auto-routing: the same decision inputs (registered path, parsed
 * predicate, per-file stats) as index/routing.py, but applied inside
 * the optimizer so pure-SQL and JDBC clients — which never touch the
 * Python DataFrameReader — get index-routed scans too.  File-level
 * pruning is the JVM-expressible half of smart_read; row-group-level
 * pruning inside surviving files is Spark's own parquet
 * filterPushdown's job (the predicate reaches the scan as usual).
 */
public class PalletJackFilePruneRule extends Rule<LogicalPlan> {
    private final SparkSession session;

    public PalletJackFilePruneRule(SparkSession session) {
        this.session = session;
    }

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        // manual bottom-up transform (the Java-friendly equivalent of
        // plan.transformUp)
        scala.collection.Seq<LogicalPlan> ch = (scala.collection.Seq<LogicalPlan>) plan.children();
        List<LogicalPlan> rebuilt = new ArrayList<>();
        boolean changed = false;
        for (int i = 0; i < ch.size(); i++) {
            LogicalPlan child = ch.apply(i);
            LogicalPlan next = apply(child);
            if (next != child) {
                changed = true;
            }
            rebuilt.add(next);
        }
        LogicalPlan cur = plan;
        if (changed) {
            cur = (LogicalPlan) plan.withNewChildren(
                    CollectionConverters.asScala(rebuilt).toSeq());
        }
        if (cur instanceof Filter) {
            Filter f = (Filter) cur;
            if (f.child() instanceof LogicalRelation) {
                LogicalPlan rewritten = pruneRelation(f, (LogicalRelation) f.child());
                if (rewritten != null) {
                    return rewritten;
                }
            }
        }
        return cur;
    }

    private LogicalPlan pruneRelation(Filter f, LogicalRelation lr) {
        if (!(lr.relation() instanceof HadoopFsRelation)) {
            return null;
        }
        HadoopFsRelation rel = (HadoopFsRelation) lr.relation();
        // Hive-partitioned roots (round-9: the common production layout):
        // keep the ORIGINAL partition spec on the rebuilt file index, so
        // Spark's own scan-time partition pruning (partition-key
        // equality at directory level) still applies on top of this
        // rule's stats-based file pruning within partitions — the same
        // division of labour as Q03c's Python path.  Conjuncts on
        // partition columns have no registry stats and safely fall
        // through to Spark's pruning.
        Option<PartitionSpec> partSpec = Option.empty();
        StructType partSchema = new StructType();
        if (rel.partitionSchema().length() != 0) {
            if (!(rel.location() instanceof PartitioningAwareFileIndex)) {
                return null; // can't recover the spec: fall through unpruned
            }
            partSpec = Option.apply(
                    ((PartitioningAwareFileIndex) rel.location()).partitionSpec());
            partSchema = rel.partitionSchema();
        }
        scala.collection.Seq<Path> roots = (scala.collection.Seq<Path>) rel.location().rootPaths();
        if (roots.isEmpty()) {
            return null;
        }
        String registered = null;
        for (int i = 0; i < roots.size(); i++) {
            String r = PalletJackRegistry.rootFor(roots.apply(i).toString());
            if (r == null || (registered != null && !r.equals(registered))) {
                return null; // every root must map to ONE registered index
            }
            registered = r;
        }
        Map<String, Map<String, double[]>> files = PalletJackRegistry.filesFor(registered);
        if (files == null || files.isEmpty()) {
            return null;
        }
        // bounded DNF (round 13): disjunctions prune too — a file is
        // dropped only when EVERY disjunct's conjuncts prove it
        // matchless.  A disjunct with no provable conjuncts (e.g. an
        // OR branch on an evidence-less column) keeps everything, so
        // the whole filter is unprunable: bail before recording.
        List<List<Conjunct>> dnf = toDnf(f.condition(), DNF_CAP);
        if (dnf == null) {
            // expansion blew the cap: fall back to the conjunction-only
            // view (Or leaves read as unknown — the pre-round-13 shape)
            List<Conjunct> flat = new ArrayList<>();
            collectConjuncts(f.condition(), flat);
            if (flat.isEmpty()) {
                return null;
            }
            dnf = new ArrayList<>();
            dnf.add(flat);
        }
        for (List<Conjunct> d : dnf) {
            if (d.isEmpty()) {
                return null; // some branch can match anything
            }
        }
        Map<String, Map<String, long[]>> digests =
                PalletJackRegistry.digestsFor(registered);
        Map<String, Map<String, PalletJackRegistry.BloomEntry>> blooms =
                PalletJackRegistry.bloomsFor(registered);
        Map<String, Map<String, double[]>> intervals =
                PalletJackRegistry.intervalsFor(registered);
        List<String> surviving = new ArrayList<>();
        // per-tier prune attribution (round-12 verdict item 1: parity
        // with the Python prune_explain surface) — the FIRST tier that
        // proves a file matchless gets the credit, in the same probe
        // order as index/explain.py's TIERS (stats, dictionary, bloom,
        // page; partition pruning stays Spark's own scan-time job)
        int[] tierCounts = new int[TIER_NAMES.length];
        for (Map.Entry<String, Map<String, double[]>> e : files.entrySet()) {
            Map<String, long[]> dig =
                    digests == null ? null : digests.get(e.getKey());
            Map<String, PalletJackRegistry.BloomEntry> blm =
                    blooms == null ? null : blooms.get(e.getKey());
            Map<String, double[]> iv =
                    intervals == null ? null : intervals.get(e.getKey());
            int tier = pruneTierDnf(e.getValue(), dig, blm, iv, dnf);
            if (tier < 0) {
                surviving.add(e.getKey());
            } else {
                tierCounts[tier]++;
            }
        }
        String predicate;
        try {
            predicate = f.condition().sql();
        } catch (RuntimeException ex) {
            predicate = f.condition().toString();
        }
        PalletJackRegistry.recordPrune(
                registered, predicate, files.size(), surviving.size(),
                tierCounts);
        if (surviving.size() >= files.size()) {
            return null; // nothing pruned (also guarantees fixed-point convergence)
        }
        List<Path> paths = new ArrayList<>();
        for (String s : surviving) {
            paths.add(new Path(s));
        }
        InMemoryFileIndex location = new InMemoryFileIndex(
                session,
                CollectionConverters.asScala(paths).toSeq(),
                rel.options(),
                Option.apply(rel.dataSchema()),
                FileStatusCache.getOrCreate(session),
                partSpec,
                Option.empty());
        HadoopFsRelation pruned = new HadoopFsRelation(
                location,
                partSchema,
                rel.dataSchema(),
                rel.bucketSpec(),
                rel.fileFormat(),
                rel.options(),
                session);
        // keep the ORIGINAL output attributes: downstream expressions are
        // bound to their exprIds
        LogicalRelation newLr = new LogicalRelation(
                pruned, lr.output(), lr.catalogTable(), lr.isStreaming(), lr.stream());
        return new Filter(f.condition(), newLr);
    }

    /** One provable comparison: column op literal(s) — a single value
     *  for the binary ops, the member list for "in".  {@code value}/
     *  {@code values} carry the numeric (min/max-comparable) form when
     *  one exists; {@code canon}/{@code canons} the exact canonical
     *  string form (integers as decimal text, strings as-is) the
     *  membership digests hash — present only for =/in, and for string
     *  literals it is the ONLY evidence (strings have no numeric
     *  stats). */
    private static final class Conjunct {
        final String col;
        final String op;
        final Double value;
        final double[] values;
        final String canon;
        final String[] canons;
        /** every literal is an integral Catalyst type (Int/Long/Short/
         *  Byte — incl. internal Date days and Timestamp micros).  The
         *  exclusion stats tier requires this: post-analysis a FLOAT/
         *  DOUBLE column always faces a float-typed literal, so an
         *  integral literal proves the column can hold no NaN — parquet
         *  float stats ignore NaN, and NaN rows DO satisfy != / NOT IN
         *  (they'd be silently dropped by a min==max prune). */
        final boolean integral;

        Conjunct(String col, String op, Double value, String canon,
                 boolean integral) {
            this.col = col;
            this.op = op;
            this.value = value;
            this.values = null;
            this.canon = canon;
            this.canons = null;
            this.integral = integral;
        }

        Conjunct(String col, String op, double[] values, String[] canons,
                 boolean integral) {
            this.col = col;
            this.op = op;
            this.value = null;
            this.values = values;
            this.canon = null;
            this.canons = canons;
            this.integral = integral;
        }
    }

    private static void collectConjuncts(Expression e, List<Conjunct> out) {
        if (e instanceof And) {
            collectConjuncts(((And) e).left(), out);
            collectConjuncts(((And) e).right(), out);
            return;
        }
        if (e instanceof In) {
            addInConjunct((In) e, "in", out);
            return;
        }
        if (e instanceof InSet) {
            // long IN lists: Catalyst converts In to InSet past
            // spark.sql.optimizer.inSetConversionThreshold (default 10)
            // — exactly the multi-key point-lookup shape the digest and
            // bloom tiers exist for (round 13: previously "deliberately
            // unknown", so a 20-key lookup never pruned from pure SQL)
            addInSetConjunct((InSet) e, "in", out);
            return;
        }
        if (e instanceof Not) {
            // Catalyst keeps != as Not(EqualTo) and NOT IN as Not(In)
            // through optimization (round-10 verdict item 3: the digests
            // prove a file's COMPLETE value set, so a file wholly inside
            // the excluded set cannot satisfy the exclusion).  Other
            // Not-wrapped shapes (ranges) are normalized away by
            // BooleanSimplification before this rule runs; anything left
            // falls through unpruned.
            Expression inner = ((Not) e).child();
            if (inner instanceof EqualTo) {
                EqualTo eq = (EqualTo) inner;
                addBinaryConjunct("!=", eq.left(), eq.right(), out);
            } else if (inner instanceof In) {
                addInConjunct((In) inner, "not_in", out);
            } else if (inner instanceof InSet) {
                addInSetConjunct((InSet) inner, "not_in", out);
            }
            return;
        }
        if (e instanceof IsNull) {
            // no cast unwrap: a (non-ANSI) cast can turn a NON-null into
            // NULL, so IsNull(cast(x)) is weaker than IsNull(x) and a
            // nulls==0 prune on x would be unsound
            Expression c = ((IsNull) e).child();
            if (c instanceof AttributeReference) {
                out.add(new Conjunct(((AttributeReference) c).name(),
                        "is_null", (Double) null, (String) null, false));
            }
            return;
        }
        if (e instanceof IsNotNull) {
            // cast unwrap IS sound here: cast(x) non-null requires x
            // non-null, so an all-null x still proves no row matches
            String col = attrName(((IsNotNull) e).child());
            if (col != null) {
                out.add(new Conjunct(
                        col, "not_null", (Double) null, (String) null, false));
            }
            return;
        }
        String op = null;
        Expression l = null;
        Expression r = null;
        if (e instanceof GreaterThanOrEqual) {
            op = ">=";
            l = ((GreaterThanOrEqual) e).left();
            r = ((GreaterThanOrEqual) e).right();
        } else if (e instanceof GreaterThan) {
            op = ">";
            l = ((GreaterThan) e).left();
            r = ((GreaterThan) e).right();
        } else if (e instanceof LessThanOrEqual) {
            op = "<=";
            l = ((LessThanOrEqual) e).left();
            r = ((LessThanOrEqual) e).right();
        } else if (e instanceof LessThan) {
            op = "<";
            l = ((LessThan) e).left();
            r = ((LessThan) e).right();
        } else if (e instanceof EqualTo) {
            op = "=";
            l = ((EqualTo) e).left();
            r = ((EqualTo) e).right();
        }
        if (op == null) {
            return; // unknown conjunct: prune on the others only (safe)
        }
        addBinaryConjunct(op, l, r, out);
    }

    private static void addBinaryConjunct(
            String op, Expression l, Expression r, List<Conjunct> out) {
        boolean eqish = "=".equals(op) || "!=".equals(op);
        String col = attrName(l);
        Double lit = litValue(r);
        String canon = eqish ? litCanon(r) : null;
        if (col != null && (lit != null || canon != null)) {
            out.add(new Conjunct(col, op, lit, canon, litIntegral(r)));
            return;
        }
        // literal op column: flip
        col = attrName(r);
        lit = litValue(l);
        canon = eqish ? litCanon(l) : null;
        if (col != null && (lit != null || canon != null)) {
            out.add(new Conjunct(col, flip(op), lit, canon, litIntegral(l)));
        }
    }

    /**
     * IN / NOT IN over all-literal members.  For "in": a file survives
     * when ANY member can fall inside [min, max] — and, when a
     * membership digest exists, only when at least one member's hash is
     * present.  For "not_in": a file is pruned only when its digest is
     * a SUBSET of the member hashes (its complete value set is wholly
     * excluded).  Non-literal members or an unresolvable column fall
     * through unpruned.  (Catalyst turns long lists into InSet, which
     * this rule deliberately leaves unknown — safe either way.)
     */
    private static void addInConjunct(In in, String op, List<Conjunct> out) {
        String col = attrName(in.value());
        if (col == null) {
            return;
        }
        scala.collection.Seq<Expression> list =
                (scala.collection.Seq<Expression>) in.list();
        double[] vs = new double[list.size()];
        String[] cs = new String[list.size()];
        boolean allNum = true;
        boolean allCanon = true;
        boolean allIntegral = true;
        for (int i = 0; i < list.size(); i++) {
            Double v = litValue(list.apply(i));
            if (v == null) {
                allNum = false;
            } else {
                vs[i] = v;
            }
            cs[i] = litCanon(list.apply(i));
            if (cs[i] == null) {
                allCanon = false;
            }
            if (!litIntegral(list.apply(i))) {
                allIntegral = false;
            }
        }
        if (!allNum && !allCanon) {
            return;
        }
        out.add(new Conjunct(col, op, allNum ? vs : null,
                allCanon ? cs : null, allIntegral));
    }

    /** InSet (the optimizer's hash-set form of long IN lists): same
     *  semantics as {@link #addInConjunct}, but the members are already
     *  evaluated Catalyst values rather than Literal expressions.  A
     *  null member bails entirely (IN with NULL matches nothing extra
     *  but NOT IN with NULL matches nothing at all — conservatively
     *  keep rather than encode three-valued logic here). */
    private static void addInSetConjunct(InSet in, String op, List<Conjunct> out) {
        String col = attrName(in.child());
        if (col == null) {
            return;
        }
        java.util.ArrayList<Object> items = new java.util.ArrayList<>();
        scala.collection.Iterator<Object> it = in.hset().iterator();
        while (it.hasNext()) {
            Object v = it.next();
            if (v == null) {
                return;
            }
            items.add(v);
        }
        double[] vs = new double[items.size()];
        String[] cs = new String[items.size()];
        boolean allNum = true;
        boolean allCanon = true;
        boolean allIntegral = true;
        for (int i = 0; i < items.size(); i++) {
            Double v = rawValue(items.get(i));
            if (v == null) {
                allNum = false;
            } else {
                vs[i] = v;
            }
            cs[i] = rawCanon(items.get(i));
            if (cs[i] == null) {
                allCanon = false;
            }
            if (!rawIntegral(items.get(i))) {
                allIntegral = false;
            }
        }
        if (!allNum && !allCanon) {
            return;
        }
        out.add(new Conjunct(col, op, allNum ? vs : null,
                allCanon ? cs : null, allIntegral));
    }

    private static String flip(String op) {
        switch (op) {
            case ">=": return "<=";
            case ">": return "<";
            case "<=": return ">=";
            case "<": return ">";
            default: return op;
        }
    }

    private static String attrName(Expression e) {
        if (e instanceof Cast) {
            Cast c = (Cast) e;
            // The registry's stats are in the COLUMN's native values and
            // units (int64 as-is, dates as DAYS, timestamps as MICROS),
            // while the literal on the other side is in the CAST TARGET's
            // encoding.  Unwrapping is therefore sound only when
            // cast(x) == x numerically for every possible x — i.e. exact,
            // order-preserving numeric widenings.  Catalyst rewrites
            // `date_col > TIMESTAMP '...'` as
            // Cast(date_col AS timestamp) > micros-literal: unwrapping
            // that compares micros against day-unit stats and wrongly
            // prunes EVERY file (max_days > 1.6e15 is always false) —
            // silent wrong results.  Same for narrowing casts like
            // CAST(bigint_col AS INT), which are non-injective.  Anything
            // not provably exact falls through unpruned (round-9 ADVICE).
            if (!castPreservesStats(c.child().dataType(), c.dataType())) {
                return null;
            }
            e = c.child();
        }
        if (e instanceof AttributeReference) {
            return ((AttributeReference) e).name();
        }
        return null;
    }

    /**
     * True only for casts where every source value maps to exactly its
     * own numeric value in the target type: integral widenings, small
     * integrals into float/double (byte/short fit float's 24-bit
     * mantissa; int fits double's 53), and float→double.  int→float and
     * long→double ROUND (non-injective: a literal between x and
     * round(x) flips the comparison), date↔timestamp changes units, and
     * decimal/string casts change representation — all excluded.
     */
    private static boolean castPreservesStats(DataType from, DataType to) {
        if (from.equals(DataTypes.ByteType) || from.equals(DataTypes.ShortType)) {
            return to.equals(DataTypes.ShortType)
                    || to.equals(DataTypes.IntegerType)
                    || to.equals(DataTypes.LongType)
                    || to.equals(DataTypes.FloatType)
                    || to.equals(DataTypes.DoubleType);
        }
        if (from.equals(DataTypes.IntegerType)) {
            return to.equals(DataTypes.LongType) || to.equals(DataTypes.DoubleType);
        }
        if (from.equals(DataTypes.FloatType)) {
            return to.equals(DataTypes.DoubleType);
        }
        return false;
    }

    /**
     * The literal's canonical string form for digest hashing — integral
     * values as decimal text, strings as-is — or null for types whose
     * canonical form is ambiguous across engines (floats, decimals,
     * dates/timestamps: the Python digest builder hashes RAW dictionary
     * values, which for those types live in a different value space;
     * such columns simply never get a digest, and min/max still applies).
     */
    private static String litCanon(Expression e) {
        return e instanceof Literal ? rawCanon(((Literal) e).value()) : null;
    }

    private static String rawCanon(Object v) {
        if (v instanceof Integer || v instanceof Long
                || v instanceof Short || v instanceof Byte) {
            return String.valueOf(((Number) v).longValue());
        }
        if (v instanceof org.apache.spark.unsafe.types.UTF8String) {
            return v.toString();
        }
        return null;
    }

    /** First 8 big-endian bytes of MD5 over the canonical UTF-8 string,
     *  as a signed long — identical to the Python digest builder; null
     *  when hashing is unavailable (callers must then KEEP the file:
     *  a fabricated absent hash would wrongly prune). */
    private static Long hash64(String canon) {
        try {
            byte[] d = java.security.MessageDigest.getInstance("MD5")
                    .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8));
            return java.nio.ByteBuffer.wrap(d).getLong();
        } catch (java.security.NoSuchAlgorithmException ex) {
            return null; // MD5 is a mandatory JDK algorithm, but stay sound
        }
    }

    /** Whether the literal's Catalyst type is integral (Int/Long/Short/
     *  Byte — incl. internal Date/Timestamp encodings); see
     *  {@link Conjunct#integral}. */
    private static boolean litIntegral(Expression e) {
        return e instanceof Literal && rawIntegral(((Literal) e).value());
    }

    private static boolean rawIntegral(Object v) {
        return v instanceof Integer || v instanceof Long
                || v instanceof Short || v instanceof Byte;
    }

    private static Double litValue(Expression e) {
        return e instanceof Literal ? rawValue(((Literal) e).value()) : null;
    }

    private static Double rawValue(Object v) {
        if (v instanceof Number) {
            // covers Int/Long/Short/Byte/Double/Float — and Catalyst's
            // internal Date (days) / Timestamp (micros) encodings, the
            // same units as the index's numeric stat projection
            return ((Number) v).doubleValue();
        }
        if (v instanceof Decimal) {
            return ((Decimal) v).toDouble();
        }
        return null;
    }

    private static final double TWO_53 = 9007199254740992.0; // 2^53

    /** Whether a stored stat double denotes a UNIQUE long: integral and
     *  |d| < 2^53.  At and beyond 2^53 several longs round onto the same
     *  double, so a degenerate min==max (or lo==hi interval) no longer
     *  proves a single-valued chunk and an exclusion prune on it would
     *  silently drop matching rows.  NaN fails the self-equality test. */
    private static boolean denotesUniqueLong(double d) {
        return d == Math.rint(d) && Math.abs(d) < TWO_53;
    }

    /** The exclusion conjunct's literals as EXACT longs, parsed from the
     *  canonical decimal text ({@link #litCanon}) — {@link #litValue}'s
     *  doubleValue() rounds longs beyond 2^53 onto neighboring stored
     *  values, which would make the == exclusion test wrongly prune
     *  (e.g. col != 9007199254740993 vs a stored 9007199254740992).
     *  Null when any literal lacks an integral canon (no exact
     *  evidence: callers keep the file). */
    private static long[] exclusionLongs(Conjunct c) {
        String[] ex = c.canons != null
                ? c.canons
                : (c.canon != null ? new String[]{c.canon} : null);
        if (ex == null) {
            return null;
        }
        long[] out = new long[ex.length];
        for (int i = 0; i < ex.length; i++) {
            try {
                out[i] = Long.parseLong(ex[i]);
            } catch (NumberFormatException nfe) {
                return null;
            }
        }
        return out;
    }

    // the split-block algorithm's 8 salts (parquet format spec)
    private static final int[] SALT = {
        0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
        0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31,
    };

    /** XXH64 seed 0 — the spec-mandated bloom hash (Java long arithmetic
     *  wraps mod 2^64, matching the reference algorithm directly). */
    private static long xxh64(byte[] d) {
        final long P1 = 0x9E3779B185EBCA87L, P2 = 0xC2B2AE3D27D4EB4FL,
                P3 = 0x165667B19E3779F9L, P4 = 0x85EBCA77C2B2AE63L,
                P5 = 0x27D4EB2F165667C5L;
        int n = d.length;
        int i = 0;
        long h;
        if (n >= 32) {
            long v1 = P1 + P2, v2 = P2, v3 = 0, v4 = -P1;
            while (i + 32 <= n) {
                v1 = Long.rotateLeft(v1 + le64(d, i) * P2, 31) * P1;
                v2 = Long.rotateLeft(v2 + le64(d, i + 8) * P2, 31) * P1;
                v3 = Long.rotateLeft(v3 + le64(d, i + 16) * P2, 31) * P1;
                v4 = Long.rotateLeft(v4 + le64(d, i + 24) * P2, 31) * P1;
                i += 32;
            }
            h = Long.rotateLeft(v1, 1) + Long.rotateLeft(v2, 7)
                    + Long.rotateLeft(v3, 12) + Long.rotateLeft(v4, 18);
            h = (h ^ (Long.rotateLeft(v1 * P2, 31) * P1)) * P1 + P4;
            h = (h ^ (Long.rotateLeft(v2 * P2, 31) * P1)) * P1 + P4;
            h = (h ^ (Long.rotateLeft(v3 * P2, 31) * P1)) * P1 + P4;
            h = (h ^ (Long.rotateLeft(v4 * P2, 31) * P1)) * P1 + P4;
        } else {
            h = P5;
        }
        h += n;
        while (i + 8 <= n) {
            h ^= Long.rotateLeft(le64(d, i) * P2, 31) * P1;
            h = Long.rotateLeft(h, 27) * P1 + P4;
            i += 8;
        }
        if (i + 4 <= n) {
            h ^= (le32(d, i) & 0xFFFFFFFFL) * P1;
            h = Long.rotateLeft(h, 23) * P2 + P3;
            i += 4;
        }
        while (i < n) {
            h ^= (d[i] & 0xFFL) * P5;
            h = Long.rotateLeft(h, 11) * P1;
            i++;
        }
        h ^= h >>> 33;
        h *= P2;
        h ^= h >>> 29;
        h *= P3;
        h ^= h >>> 32;
        return h;
    }

    private static long le64(byte[] d, int i) {
        long v = 0;
        for (int j = 7; j >= 0; j--) {
            v = (v << 8) | (d[i + j] & 0xFFL);
        }
        return v;
    }

    private static int le32(byte[] d, int i) {
        return (d[i] & 0xFF) | ((d[i + 1] & 0xFF) << 8)
                | ((d[i + 2] & 0xFF) << 16) | ((d[i + 3] & 0xFF) << 24);
    }

    private static boolean bloomMightContain(int[] words, long h) {
        int nblocks = words.length >> 3;
        int base = ((int) (((h >>> 32) * nblocks) >>> 32)) << 3;
        int hl = (int) h;
        for (int i = 0; i < 8; i++) {
            int bit = (hl * SALT[i]) >>> 27;
            if (((words[base + i] >>> bit) & 1) == 0) {
                return false;
            }
        }
        return true;
    }

    /** The literal's plain-encoded bloom-hash input for this column's
     *  physical type, or null when it can't be encoded (keep). */
    private static byte[] bloomBytes(String canon, int ptype) {
        try {
            if (ptype == 2) {
                return canon.getBytes(java.nio.charset.StandardCharsets.UTF_8);
            }
            long v = Long.parseLong(canon);
            if (ptype == 0) {
                if (v < Integer.MIN_VALUE || v > Integer.MAX_VALUE) {
                    return null; // out of range: stats' job, keep here
                }
                return new byte[]{
                    (byte) v, (byte) (v >>> 8), (byte) (v >>> 16),
                    (byte) (v >>> 24),
                };
            }
            byte[] out = new byte[8];
            for (int j = 0; j < 8; j++) {
                out[j] = (byte) (v >>> (8 * j));
            }
            return out;
        } catch (NumberFormatException ex) {
            return null; // a string canon against an int column: keep
        }
    }

    /** True when EVERY chunk's bloom filter misses the literal — a proof
     *  the file holds no equal value. */
    private static boolean bloomProvesAbsent(
            PalletJackRegistry.BloomEntry e, String canon) {
        byte[] input = bloomBytes(canon, e.ptype);
        if (input == null) {
            return false;
        }
        long h = xxh64(input);
        for (int[] words : e.chunks) {
            if (bloomMightContain(words, h)) {
                return false;
            }
        }
        return true;
    }

    /** True when some pushed page-envelope interval intersects the
     *  closed box [lo, hi].  Intervals are disjoint and lo-sorted, so
     *  only the LAST interval whose lo <= hi can still reach lo — one
     *  binary search per test. */
    private static boolean intervalsIntersect(double[] iv, double lo, double hi) {
        int n = iv.length / 2;
        int a = 0;
        int b = n; // first interval with iv_lo > hi
        while (a < b) {
            int m = (a + b) >>> 1;
            if (iv[2 * m] <= hi) {
                a = m + 1;
            } else {
                b = m;
            }
        }
        return a > 0 && iv[2 * a - 1] >= lo;
    }

    /** Page-envelope interval tier (round-11, the q03h layout at file
     *  scope): prune when the conjuncts' intersected numeric range box
     *  (or every IN member / the exclusion's degenerate-interval dual)
     *  provably misses every interval of a pushed column.  Strict
     *  bounds are tested as closed (a superset — may keep one extra
     *  file, never prunes wrongly). */
    private static boolean intervalsCanMatch(
            Map<String, double[]> intervals, List<Conjunct> cs) {
        java.util.HashMap<String, double[]> box = new java.util.HashMap<>();
        for (Conjunct c : cs) {
            double[] iv = intervals.get(c.col);
            if (iv == null) {
                continue;
            }
            if ("in".equals(c.op) && c.values != null) {
                boolean any = false;
                for (double v : c.values) {
                    if (Double.isNaN(v)) {
                        // NaN member: NaN rows DO satisfy IN under Spark's
                        // NaN==NaN semantics, and NaN-dropping page stats
                        // leave no trace of them — no evidence, keep
                        any = true;
                        break;
                    }
                    if (intervalsIntersect(iv, v, v)) {
                        any = true;
                        break;
                    }
                }
                if (!any) {
                    return false;
                }
                continue;
            }
            if ("!=".equals(c.op) || "not_in".equals(c.op)) {
                // dual proof: EVERY interval is a single excluded value
                // (degenerate intervals only; the integral-literal gate
                // proves a NaN-free column, as in the stats tier) —
                // then no non-NULL row can satisfy the exclusion, and
                // NULL rows never do
                if (!c.integral) {
                    continue;
                }
                long[] ex = exclusionLongs(c);
                if (ex == null || iv.length == 0) {
                    continue; // no exact literals, or an all-NULL column
                              // (conservatively kept: cheap and rare)
                }
                boolean allExcluded = true;
                for (int i = 0; allExcluded && i < iv.length / 2; i++) {
                    if (iv[2 * i] != iv[2 * i + 1]
                            || !denotesUniqueLong(iv[2 * i])) {
                        // not degenerate, or the stored double does not
                        // denote a unique long (|v| >= 2^53: several longs
                        // collapse onto one double, so lo==hi no longer
                        // proves single-valued) — keep
                        allExcluded = false;
                        break;
                    }
                    long stored = (long) iv[2 * i];
                    boolean hit = false;
                    for (long v : ex) {
                        if (stored == v) {
                            hit = true;
                            break;
                        }
                    }
                    allExcluded = hit;
                }
                if (allExcluded) {
                    return false;
                }
                continue;
            }
            Double v = c.value;
            if (v == null || Double.isNaN(v)) {
                continue;
            }
            double[] bx = box.computeIfAbsent(
                    c.col,
                    k -> new double[]{
                        Double.NEGATIVE_INFINITY, Double.POSITIVE_INFINITY,
                    });
            switch (c.op) {
                case "=":
                    bx[0] = Math.max(bx[0], v);
                    bx[1] = Math.min(bx[1], v);
                    break;
                case ">":
                case ">=":
                    bx[0] = Math.max(bx[0], v);
                    break;
                case "<":
                case "<=":
                    bx[1] = Math.min(bx[1], v);
                    break;
                default:
                    break;
            }
        }
        for (Map.Entry<String, double[]> e : box.entrySet()) {
            double[] bx = e.getValue();
            if (bx[0] == Double.NEGATIVE_INFINITY
                    && bx[1] == Double.POSITIVE_INFINITY) {
                continue;
            }
            if (bx[0] > bx[1]) {
                return false; // contradictory conjuncts: nothing matches
            }
            if (!intervalsIntersect(intervals.get(e.getKey()), bx[0], bx[1])) {
                return false;
            }
        }
        return true;
    }

    //: bound on the DNF expansion — predicates are human-written WHERE
    //: clauses, so real disjunct counts are tiny; anything past the cap
    //: falls back to the conjunction-only view (never unsound, at most
    //: unpruned)
    private static final int DNF_CAP = 64;

    /** Bounded disjunctive normal form of a filter condition: one
     *  conjunct list per disjunct.  Returns null when the expansion
     *  would exceed {@code cap}.  Unknown leaves yield an EMPTY
     *  conjunct list entry inside their conjunction (they just drop
     *  out, as in the flat collector), but an unknown DISJUNCT at Or
     *  level becomes a disjunct with zero conjuncts — the caller must
     *  treat that as "keeps every file". */
    private static List<List<Conjunct>> toDnf(Expression e, int cap) {
        if (e instanceof Or) {
            List<List<Conjunct>> l = toDnf(((Or) e).left(), cap);
            List<List<Conjunct>> r = toDnf(((Or) e).right(), cap);
            if (l == null || r == null || l.size() + r.size() > cap) {
                return null;
            }
            List<List<Conjunct>> out = new ArrayList<>(l);
            out.addAll(r);
            return out;
        }
        if (e instanceof And) {
            List<List<Conjunct>> l = toDnf(((And) e).left(), cap);
            List<List<Conjunct>> r = toDnf(((And) e).right(), cap);
            if (l == null || r == null
                    || (long) l.size() * r.size() > cap) {
                return null;
            }
            List<List<Conjunct>> out = new ArrayList<>();
            for (List<Conjunct> a : l) {
                for (List<Conjunct> b : r) {
                    List<Conjunct> m = new ArrayList<>(a);
                    m.addAll(b);
                    out.add(m);
                }
            }
            return out;
        }
        List<Conjunct> one = new ArrayList<>();
        collectConjuncts(e, one);
        List<List<Conjunct>> out = new ArrayList<>();
        out.add(one);
        return out;
    }

    /** DNF file test: pruned iff EVERY disjunct's conjuncts prove the
     *  file matchless; attribution is the DEEPEST tier any disjunct
     *  needed (all of them were necessary for the proof).  -1 keeps.
     *  Callers guarantee no disjunct is empty. */
    private static int pruneTierDnf(
            Map<String, double[]> stats,
            Map<String, long[]> digests,
            Map<String, PalletJackRegistry.BloomEntry> blooms,
            Map<String, double[]> intervals,
            List<List<Conjunct>> dnf) {
        int worst = -1;
        for (List<Conjunct> cs : dnf) {
            int t = pruneTier(stats, digests, blooms, intervals, cs);
            if (t < 0) {
                return -1;
            }
            worst = Math.max(worst, t);
        }
        return worst;
    }

    /** Tier names in probe order — the same order (minus partition,
     *  which is Spark's own scan-time pruning) as the Python explain
     *  surface's TIERS (index/explain.py), so pure-SQL attribution and
     *  DataFrame-layer attribution agree on shared fixtures.  Indexes
     *  match {@code recordPrune}'s count array. */
    static final String[] TIER_NAMES = {"stats", "dictionary", "bloom", "page"};

    /** The FIRST tier (index into {@link #TIER_NAMES}) that proves the
     *  file matchless, or -1 to keep.  Pure observation-friendly
     *  restructure of the old fileCanMatch: same probes, same
     *  soundness, now attributable per tier. */
    private static int pruneTier(
            Map<String, double[]> stats,
            Map<String, long[]> digests,
            Map<String, PalletJackRegistry.BloomEntry> blooms,
            Map<String, double[]> intervals,
            List<Conjunct> cs) {
        if (!statsCanMatch(stats, cs)) {
            return 0;
        }
        if (digests != null && !digestsCanMatch(digests, cs)) {
            return 1;
        }
        if (blooms != null && !bloomsCanMatch(blooms, cs)) {
            return 2;
        }
        if (intervals != null && !intervalsCanMatch(intervals, cs)) {
            return 3;
        }
        return -1;
    }

    /** Membership-digest tier (round-10): a digest is the file's
     *  COMPLETE value set for the column.  For =/IN, every literal
     *  provably absent means the file cannot match, even when its
     *  [min, max] spans the literal (interleaved high-cardinality keys,
     *  the q03e layout).  For !=/NOT IN (round-11), the dual: a digest
     *  wholly CONTAINED in the excluded hash set means no row can
     *  satisfy the exclusion (NULL rows don't satisfy != / NOT IN
     *  either). */
    private static boolean digestsCanMatch(
            Map<String, long[]> digests, List<Conjunct> cs) {
        for (Conjunct c : cs) {
            long[] dig = digests.get(c.col);
            if (dig == null) {
                continue;
            }
            if ("=".equals(c.op) && c.canon != null) {
                Long h = hash64(c.canon);
                if (h != null && java.util.Arrays.binarySearch(dig, h) < 0) {
                    return false;
                }
            } else if ("in".equals(c.op) && c.canons != null) {
                boolean any = false;
                for (String canon : c.canons) {
                    Long h = hash64(canon);
                    if (h == null || java.util.Arrays.binarySearch(dig, h) >= 0) {
                        any = true;
                        break;
                    }
                }
                if (!any) {
                    return false;
                }
            } else if (("!=".equals(c.op) && c.canon != null)
                    || ("not_in".equals(c.op) && c.canons != null)) {
                String[] ex = c.canons != null
                        ? c.canons : new String[]{c.canon};
                if (dig.length <= ex.length) {
                    long[] exh = new long[ex.length];
                    boolean ok = true;
                    for (int i = 0; i < ex.length; i++) {
                        Long h = hash64(ex[i]);
                        if (h == null) {
                            ok = false;
                            break;
                        }
                        exh[i] = h;
                    }
                    if (ok) {
                        java.util.Arrays.sort(exh);
                        boolean subset = true;
                        for (long d : dig) {
                            if (java.util.Arrays.binarySearch(exh, d) < 0) {
                                subset = false;
                                break;
                            }
                        }
                        if (subset) {
                            return false;
                        }
                    }
                }
            }
        }
        return true;
    }

    /** Bloom tier (round-11): the point-lookup evidence for
     *  dict-OVERFLOW columns, where the digest tier has nothing.
     *  Equality/IN only — a bloom can never prove its column holds
     *  ONLY excluded values. */
    private static boolean bloomsCanMatch(
            Map<String, PalletJackRegistry.BloomEntry> blooms,
            List<Conjunct> cs) {
        for (Conjunct c : cs) {
            PalletJackRegistry.BloomEntry blm = blooms.get(c.col);
            if (blm == null) {
                continue;
            }
            if ("=".equals(c.op) && c.canon != null) {
                if (bloomProvesAbsent(blm, c.canon)) {
                    return false;
                }
            } else if ("in".equals(c.op) && c.canons != null) {
                boolean all = c.canons.length > 0;
                for (String canon : c.canons) {
                    if (!bloomProvesAbsent(blm, canon)) {
                        all = false;
                        break;
                    }
                }
                if (all) {
                    return false;
                }
            }
        }
        return true;
    }

    /** Stats tier: per-conjunct [min, max] / null-count evidence. */
    private static boolean statsCanMatch(
            Map<String, double[]> stats, List<Conjunct> cs) {
        for (Conjunct c : cs) {
            double[] mm = stats.get(c.col);
            if (mm == null) {
                continue; // stats-unknown column: no range evidence
            }
            // layout: [min, max] or [min, max, nullCount, numRows]
            // (round-11); NaN slots mean "unknown" — sourced e.g. from
            // string columns that now carry null counts but no numeric
            // range.  Java NaN comparisons are all false, so every test
            // below must gate on !isNaN explicitly or it would PRUNE.
            double min = mm[0];
            double max = mm[1];
            boolean range = !Double.isNaN(min) && !Double.isNaN(max);
            if ("is_null".equals(c.op) || "not_null".equals(c.op)) {
                if (mm.length < 4
                        || Double.isNaN(mm[2]) || Double.isNaN(mm[3])) {
                    continue; // null counts unknown: keep
                }
                if ("is_null".equals(c.op) && mm[2] == 0.0) {
                    return false; // zero nulls: IS NULL matches nothing
                }
                if ("not_null".equals(c.op) && mm[2] >= mm[3]) {
                    return false; // all rows null: IS NOT NULL matches nothing
                }
                continue;
            }
            if ("in".equals(c.op)) {
                if (c.values == null || !range) {
                    continue; // non-numeric members: digest tier only
                }
                boolean any = false;
                for (double v : c.values) {
                    if (Double.isNaN(v)) {
                        // NaN member: NaN rows satisfy IN under Spark's
                        // NaN==NaN semantics and leave no trace in
                        // NaN-dropping stats — no evidence, keep
                        any = true;
                        break;
                    }
                    if (min <= v && v <= max) {
                        any = true;
                        break;
                    }
                }
                if (!any) {
                    return false;
                }
                continue;
            }
            if ("!=".equals(c.op) || "not_in".equals(c.op)) {
                // stats tier: a provably SINGLE-VALUED file whose one
                // value is excluded.  The integral-literal gate proves a
                // NaN-free column (parquet float stats ignore NaN; NaN
                // satisfies !=), and the prune additionally requires the
                // stored double to denote a UNIQUE long (integral,
                // |v| < 2^53): beyond 2^53 several longs collapse onto
                // one double, so min==max no longer proves single-valued.
                // Literals compare as EXACT longs parsed from the canon
                // text — litValue()'s doubleValue() rounds longs beyond
                // 2^53 onto neighbors and would wrongly prune files whose
                // rows DO satisfy the exclusion.
                if (!range || !c.integral || min != max
                        || !denotesUniqueLong(min)) {
                    continue;
                }
                long[] ex = exclusionLongs(c);
                if (ex == null) {
                    continue;
                }
                long stored = (long) min;
                for (long v : ex) {
                    if (stored == v) {
                        return false;
                    }
                }
                continue;
            }
            if (c.value == null || !range || Double.isNaN(c.value)) {
                // string equality (digest tier only) — or a NaN literal:
                // under Spark semantics NaN==NaN and NaN sorts greatest,
                // so e.g. col >= double('nan') matches NaN rows that
                // NaN-dropping stats cannot see — no evidence, keep
                continue;
            }
            boolean possible;
            switch (c.op) {
                case ">=": possible = max >= c.value; break;
                case ">": possible = max > c.value; break;
                case "<=": possible = min <= c.value; break;
                case "<": possible = min < c.value; break;
                case "=": possible = min <= c.value && c.value <= max; break;
                default: possible = true; break;
            }
            if (!possible) {
                return false;
            }
        }
        return true;
    }
}
