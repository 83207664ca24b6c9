package ksjvm;

/*
 * JVM-side stateful operators for the admit family — the r15 fused-probe
 * adjudication's named production shape ("fuse source reads only when the
 * stateful operator is JVM-side") made EXECUTABLE: Spark 4's Scala/Java
 * transformWithState API keeps the per-bucket state entirely inside the
 * JVM, so state rows never cross the Python/Arrow boundary. Compiled on
 * demand by kinesumer_spark/jvm/__init__.py with the container's javac
 * against the shipped pyspark jars (no external dependency; the Python
 * transformWithStateInPandas twin stays protobuf-gated, this one is
 * javac-gated).
 *
 * Semantics mirror streaming/stateful.py exactly:
 *   - TotalsProcessor  = UserTotalsProcessor (plumbing proof; the
 *     stream_transform_with_state oracle).
 *   - BucketAdmitProcessor = _bucket_verify_rows + _prune_horizon: the
 *     band-bucket near-dup admission with optional TTL horizon. Jaccard
 *     rounding matches the Python kernel's repr-based HALF_UP quantize
 *     bit-for-bit: IEEE double division, then HALF_UP at 6 places on
 *     the SHORTEST-round-trip decimal, derived by shortestRepr() below
 *     rather than Double.toString — pre-JDK-19 toString can emit
 *     non-minimal digits (JDK-4511638) that flip HALF_UP at an exact
 *     6th-decimal tie (driver ADVICE r16; verified against CPython's
 *     repr quantize on 45k random + adversarial doubles, 0 mismatches).
 *
 * Reference analog: the checkpointed consume loop whose state persists
 * across scans (kinesumer.go:615-704; statestore.go:260-281).
 */

import java.math.BigDecimal;
import java.math.RoundingMode;
import java.util.ArrayList;
import java.util.HashSet;
import java.util.List;

import org.apache.spark.api.java.function.MapFunction;
import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.KeyValueGroupedDataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.streaming.ListState;
import org.apache.spark.sql.streaming.OutputMode;
import org.apache.spark.sql.streaming.StatefulProcessor;
import org.apache.spark.sql.streaming.TTLConfig;
import org.apache.spark.sql.streaming.TimeMode;
import org.apache.spark.sql.streaming.TimerValues;
import org.apache.spark.sql.streaming.ValueState;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;

public final class AdmitJvm {

  private AdmitJvm() {}

  private static scala.collection.Iterator<Row> toScala(List<Row> out) {
    return scala.jdk.javaapi.CollectionConverters.asScala(out.iterator());
  }

  /** Shortest round-trip decimal rendering of x — the same digit string
   * Python's repr() produces — derived here instead of trusting
   * Double.toString: on JDKs before 19 (JDK-4511638) toString can emit
   * a NON-minimal digit string, and at an exact 6th-decimal tie the
   * extra digits flip HALF_UP, diverging the JVM twins from the Python
   * kernel's repr-based quantize (driver ADVICE r16). Strategy: find
   * the minimal significant-digit count whose correctly-rounded
   * rendering (%.*e is correctly rounded) parses back to x bit-exactly;
   * that rendering is the closest shortest string, which is what
   * CPython's float_repr_style=short emits. */
  public static String shortestRepr(double x) {
    if (Double.isNaN(x) || Double.isInfinite(x) || x == 0.0) {
      return Double.toString(x);
    }
    for (int sig = 1; sig <= 17; sig++) {
      String s =
          String.format(java.util.Locale.ROOT, "%." + (sig - 1) + "e", x);
      if (Double.parseDouble(s) == x) {
        return s;
      }
    }
    return Double.toString(x);
  }

  /** round(x, 6) bit-compatible with Spark/DuckDB and the Python twin:
   * shortest-repr decimal of the IEEE double, HALF_UP at 6 places. */
  public static double round6Shared(double x) {
    return new BigDecimal(shortestRepr(x))
        .setScale(6, RoundingMode.HALF_UP)
        .doubleValue();
  }

  // ---- running per-user totals (plumbing proof; update mode) -------------

  public static final class TotalsProcessor
      extends StatefulProcessor<Long, Row, Row> {
    private transient ValueState<Row> totals;

    @Override
    public void init(OutputMode outputMode, TimeMode timeMode) {
      StructType st =
          new StructType()
              .add("n", DataTypes.LongType)
              .add("total", DataTypes.LongType);
      totals = getHandle().getValueState("totals", Encoders.row(st),
          TTLConfig.NONE());
    }

    @Override
    public scala.collection.Iterator<Row> handleInputRows(
        Long key, scala.collection.Iterator<Row> rows, TimerValues tv) {
      long n = 0L;
      long total = 0L;
      if (totals.exists()) {
        Row r = totals.get();
        n = r.getLong(0);
        total = r.getLong(1);
      }
      while (rows.hasNext()) {
        Row r = rows.next();
        n += 1L;
        total += r.getLong(1);
      }
      totals.update(RowFactory.create(n, total));
      List<Row> out = new ArrayList<>(1);
      out.add(RowFactory.create(key, n, total));
      return toScala(out);
    }
  }

  /** events: (user_id bigint, value bigint) -> running (user_id, n_events,
   * total_value) in update mode — the stream_transform_with_state shape. */
  public static Dataset<Row> runningTotals(Dataset<Row> events) {
    KeyValueGroupedDataset<Long, Row> g =
        events.groupByKey(
            (MapFunction<Row, Long>)
                (Row r) -> r.getLong(r.fieldIndex("user_id")),
            Encoders.LONG());
    StructType out =
        new StructType()
            .add("user_id", DataTypes.LongType)
            .add("n_events", DataTypes.LongType)
            .add("total_value", DataTypes.LongType);
    return g.transformWithState(
        new TotalsProcessor(), TimeMode.None(), OutputMode.Update(),
        Encoders.row(out));
  }

  // ---- band-bucket near-dup admission (append mode) -----------------------

  /** stateful.py _bucket_verify_rows + _prune_horizon, JVM-side. State is
   * one ListState row per fresh arrival (doc_id, sh_set) — appended
   * incrementally, rewritten via put() only when the TTL horizon pruned
   * something; the entries NEVER leave the JVM. horizon <= 0 means
   * unbounded (the base admit). */
  public static final class BucketAdmitProcessor
      extends StatefulProcessor<String, Row, Row> {
    private final long horizon;
    private final boolean emitIndex;
    private transient ListState<Row> entries;

    public BucketAdmitProcessor(long horizon) {
      this(horizon, false);
    }

    /** emitIndex=true is the FUSED form (stateful.py
     * _make_bucket_update(emit_index=True)): every FRESH arrival also
     * emits a kind='idx' row carrying its bucket key + shingle set —
     * the compacted-index maintenance relation — through the same
     * output, so ONE source read and ONE state pass feed both the
     * pair sink and the bucketed index. With JVM state the idx rows
     * never cross a language boundary, the precondition the r15
     * adjudication named for fusion to win. */
    public BucketAdmitProcessor(long horizon, boolean emitIndex) {
      this.horizon = horizon;
      this.emitIndex = emitIndex;
    }

    @Override
    public void init(OutputMode outputMode, TimeMode timeMode) {
      StructType st =
          new StructType()
              .add("doc_id", DataTypes.LongType)
              .add("sh_set",
                  DataTypes.createArrayType(DataTypes.StringType));
      entries = getHandle().getListState("entries", Encoders.row(st),
          TTLConfig.NONE());
    }

    private static double round6(double x) {
      return AdmitJvm.round6Shared(x);
    }

    @Override
    public scala.collection.Iterator<Row> handleInputRows(
        String key, scala.collection.Iterator<Row> rows, TimerValues tv) {
      List<Long> ids = new ArrayList<>();
      List<HashSet<String>> sets = new ArrayList<>();
      if (entries.exists()) {
        scala.collection.Iterator<Row> it = entries.get();
        while (it.hasNext()) {
          Row r = it.next();
          ids.add(r.getLong(0));
          HashSet<String> s = new HashSet<>(r.<String>getList(1));
          sets.add(s);
        }
      }
      int nStored = ids.size();
      HashSet<Long> seen = new HashSet<>(ids);

      // arrival order within the microbatch = ascending doc_id (the
      // staging contract; mirrors the Python twin's mergesort)
      List<Row> batch = new ArrayList<>();
      while (rows.hasNext()) {
        batch.add(rows.next());
      }
      batch.sort(
          (a, b) ->
              Long.compare(
                  a.getLong(a.fieldIndex("doc_id")),
                  b.getLong(b.fieldIndex("doc_id"))));

      // fused layout: decompose the concatenated group key back into
      // the bucket columns for the kind='idx' rows
      String lang = null;
      int band = 0;
      long key1 = 0L;
      long key2 = 0L;
      if (emitIndex) {
        String[] parts = key.split("\\u0001", -1);
        lang = parts[0];
        band = Integer.parseInt(parts[1]);
        key1 = Long.parseLong(parts[2]);
        key2 = Long.parseLong(parts[3]);
      }

      List<Row> out = new ArrayList<>();
      for (Row r : batch) {
        long d = r.getLong(r.fieldIndex("doc_id"));
        if (seen.contains(d)) {
          continue; // replayed microbatch — already verified
        }
        if (!ids.isEmpty() && d < ids.get(ids.size() - 1)) {
          throw new IllegalStateException(
              "out-of-order arrival: doc " + d + " after "
                  + ids.get(ids.size() - 1)
                  + " in the same bucket (staging contract broken)");
        }
        HashSet<String> s =
            new HashSet<>(r.<String>getList(r.fieldIndex("sh_set")));
        int ns = s.size();
        if (emitIndex) {
          String[] shArr = s.toArray(new String[0]);
          java.util.Arrays.sort(shArr);
          out.add(RowFactory.create("idx", d, null, null, lang, band,
              key1, key2, shArr));
        }
        for (int i = 0; i < ids.size(); i++) {
          long pid = ids.get(i);
          if (horizon > 0 && pid < d - horizon) {
            continue; // expired for THIS doc (prune happens after)
          }
          HashSet<String> ps = sets.get(i);
          int shared = 0;
          // iterate the smaller set for the intersection count
          HashSet<String> small = s.size() <= ps.size() ? s : ps;
          HashSet<String> big = small == s ? ps : s;
          for (String x : small) {
            if (big.contains(x)) {
              shared++;
            }
          }
          if (shared == 0) {
            continue;
          }
          double j = round6((double) shared / (ns + ps.size() - shared));
          if (j >= 0.5) {
            if (emitIndex) {
              out.add(RowFactory.create("pair", d, pid, j, null, null,
                  null, null, null));
            } else {
              out.add(RowFactory.create(d, pid, j));
            }
          }
        }
        ids.add(d);
        sets.add(s);
        seen.add(d);
      }

      // exact TTL prune (ascending arrivals: a dropped entry can never be
      // in-horizon for any future doc)
      int from = 0;
      if (horizon > 0 && !ids.isEmpty()) {
        long cut = ids.get(ids.size() - 1) - horizon;
        while (from < ids.size() && ids.get(from) < cut) {
          from++;
        }
      }
      if (from > 0) {
        Row[] kept = new Row[ids.size() - from];
        for (int i = from; i < ids.size(); i++) {
          kept[i - from] = packEntry(ids.get(i), sets.get(i));
        }
        entries.put(kept); // something expired: rewrite the list
      } else if (ids.size() > nStored) {
        Row[] fresh = new Row[ids.size() - nStored];
        for (int i = nStored; i < ids.size(); i++) {
          fresh[i - nStored] = packEntry(ids.get(i), sets.get(i));
        }
        entries.appendList(fresh); // steady state: ship only the delta
      }
      return toScala(out);
    }

    private static Row packEntry(long id, HashSet<String> s) {
      String[] arr = s.toArray(new String[0]);
      java.util.Arrays.sort(arr);
      return RowFactory.create(id, arr);
    }
  }

  /** probe: (lang string, band int, key1 bigint, key2 bigint,
   * doc_id bigint, sh_set array&lt;string&gt;) -> verified near-dup pairs
   * (doc_id, partner, jaccard), append mode. horizon &lt;= 0 = unbounded. */
  public static Dataset<Row> bucketAdmitPairs(Dataset<Row> probe,
      long horizon) {
    KeyValueGroupedDataset<String, Row> g =
        probe.groupByKey(
            (MapFunction<Row, String>)
                (Row r) ->
                    r.getString(r.fieldIndex("lang"))
                        + '\u0001'
                        + r.getInt(r.fieldIndex("band"))
                        + '\u0001'
                        + r.getLong(r.fieldIndex("key1"))
                        + '\u0001'
                        + r.getLong(r.fieldIndex("key2")),
            Encoders.STRING());
    StructType out =
        new StructType()
            .add("doc_id", DataTypes.LongType)
            .add("partner", DataTypes.LongType)
            .add("jaccard", DataTypes.DoubleType);
    return g.transformWithState(
        new BucketAdmitProcessor(horizon), TimeMode.None(),
        OutputMode.Append(), Encoders.row(out));
  }

  /** The FUSED admit: kind='pair' rows (verified pairs) and kind='idx'
   * rows (the compacted-index maintenance relation) through ONE output
   * from ONE source read and ONE JVM-state pass — the production shape
   * the r15 adjudication reserved for JVM-side state. Schema mirrors
   * stateful.ADMIT_FUSED_OUTPUT_SCHEMA. */
  public static Dataset<Row> bucketAdmitPairsFused(Dataset<Row> probe) {
    KeyValueGroupedDataset<String, Row> g =
        probe.groupByKey(
            (MapFunction<Row, String>)
                (Row r) ->
                    r.getString(r.fieldIndex("lang"))
                        + '\u0001'
                        + r.getInt(r.fieldIndex("band"))
                        + '\u0001'
                        + r.getLong(r.fieldIndex("key1"))
                        + '\u0001'
                        + r.getLong(r.fieldIndex("key2")),
            Encoders.STRING());
    StructType out =
        new StructType()
            .add("kind", DataTypes.StringType)
            .add("doc_id", DataTypes.LongType)
            .add("partner", DataTypes.LongType)
            .add("jaccard", DataTypes.DoubleType)
            .add("lang", DataTypes.StringType)
            .add("band", DataTypes.IntegerType)
            .add("key1", DataTypes.LongType)
            .add("key2", DataTypes.LongType)
            .add("sh_set", DataTypes.createArrayType(DataTypes.StringType));
    return g.transformWithState(
        new BucketAdmitProcessor(0L, true), TimeMode.None(),
        OutputMode.Append(), Encoders.row(out));
  }

  // ---- per-IVF-cell SEMANTIC admission (append mode) ----------------------

  /** stateful.py make_semcell_update, JVM-side: per-cell arrival
   * history (doc_id, vector, precomputed norm) as ListState rows;
   * every arriving vector is exact-cosine verified against its cell's
   * eligible earlier arrivals (horizon window OR last-cap membership —
   * mutually exclusive bounds, both with the exact ascending-arrival
   * eviction argument), emitting tau-passing pairs plus one
   * NULL-partner cell-max row per doc with eligible mates. Cosines are
   * LEFT-ASSOCIATED sequential double loops (Java double arithmetic is
   * IEEE-754-strict, identical to CPython float) and HALF_UP-rounded
   * at 6 via the shortest-repr decimal — bit-compatible with the
   * Python operator and DuckDB's list_dot_product oracle. */
  public static final class SemCellAdmitProcessor
      extends StatefulProcessor<Integer, Row, Row> {
    private final double tau;
    private final long horizon;
    private final long cap;
    private final boolean emitIndex;
    private transient ListState<Row> entries;

    public SemCellAdmitProcessor(double tau, long horizon, long cap) {
      this(tau, horizon, cap, false);
    }

    /** emitIndex=true is the FUSED form: every FRESH arrival also
     * emits a kind='idx' row (cell, doc_id, vector, precomputed norm
     * — exactly the compacted semantic index relation) through the
     * same output, so one source read and one JVM state pass feed
     * both the pair sink and the cell-bucketed index. */
    public SemCellAdmitProcessor(double tau, long horizon, long cap,
        boolean emitIndex) {
      if (horizon > 0 && cap > 0) {
        throw new IllegalArgumentException(
            "horizon and cap are mutually exclusive bounds");
      }
      this.tau = tau;
      this.horizon = horizon;
      this.cap = cap;
      this.emitIndex = emitIndex;
    }

    @Override
    public void init(OutputMode outputMode, TimeMode timeMode) {
      StructType st =
          new StructType()
              .add("doc_id", DataTypes.LongType)
              .add("e", DataTypes.createArrayType(DataTypes.DoubleType))
              .add("nrm", DataTypes.DoubleType);
      entries = getHandle().getListState("entries", Encoders.row(st),
          TTLConfig.NONE());
    }

    private static double round6(double x) {
      return AdmitJvm.round6Shared(x);
    }

    /** left-associated sequential dot — the exactness discipline */
    private static double dot(double[] a, double[] b) {
      double acc = 0.0;
      for (int i = 0; i < a.length; i++) {
        acc = acc + a[i] * b[i];
      }
      return acc;
    }

    private static double[] toVec(List<Double> l) {
      double[] v = new double[l.size()];
      for (int i = 0; i < v.length; i++) {
        v[i] = l.get(i);
      }
      return v;
    }

    @Override
    public scala.collection.Iterator<Row> handleInputRows(
        Integer key, scala.collection.Iterator<Row> rows, TimerValues tv) {
      List<Long> ids = new ArrayList<>();
      List<double[]> vecs = new ArrayList<>();
      List<Double> norms = new ArrayList<>();
      if (entries.exists()) {
        scala.collection.Iterator<Row> it = entries.get();
        while (it.hasNext()) {
          Row r = it.next();
          ids.add(r.getLong(0));
          vecs.add(toVec(r.<Double>getList(1)));
          norms.add(r.getDouble(2));
        }
      }
      int nStored = ids.size();
      HashSet<Long> seen = new HashSet<>(ids);
      int dim = vecs.isEmpty() ? 0 : vecs.get(0).length;

      List<Row> batch = new ArrayList<>();
      while (rows.hasNext()) {
        batch.add(rows.next());
      }
      batch.sort(
          (a, b) ->
              Long.compare(
                  a.getLong(a.fieldIndex("doc_id")),
                  b.getLong(b.fieldIndex("doc_id"))));

      List<Row> out = new ArrayList<>();
      for (Row r : batch) {
        long d = r.getLong(r.fieldIndex("doc_id"));
        if (seen.contains(d)) {
          continue; // replayed microbatch — already verified
        }
        if (!ids.isEmpty() && d < ids.get(ids.size() - 1)) {
          throw new IllegalStateException(
              "out-of-order arrival: vec " + d + " after "
                  + ids.get(ids.size() - 1)
                  + " in the same cell (staging contract broken)");
        }
        double[] e = toVec(r.<Double>getList(r.fieldIndex("e")));
        if (dim > 0 && e.length != dim) {
          throw new IllegalStateException(
              "vector dim drift: doc " + d + " arrived with " + e.length
                  + " floats in a cell packed at dim " + dim);
        }
        if (dim == 0) {
          dim = e.length;
        }
        double nrm = Math.sqrt(dot(e, e));
        if (emitIndex) {
          Double[] boxed = new Double[e.length];
          for (int i = 0; i < e.length; i++) {
            boxed[i] = e[i];
          }
          out.add(RowFactory.create("idx", d, null, null, key, boxed, nrm));
        }
        Double cellMax = null;
        int start = (cap > 0 && ids.size() > cap)
            ? (int) (ids.size() - cap) : 0;
        for (int i = start; i < ids.size(); i++) {
          long pid = ids.get(i);
          if (horizon > 0 && pid < d - horizon) {
            continue; // out of the arrival window
          }
          double c = round6(dot(e, vecs.get(i)) / (nrm * norms.get(i)));
          if (cellMax == null || c > cellMax) {
            cellMax = c;
          }
          if (c >= tau) {
            out.add(emitIndex
                ? RowFactory.create("pair", d, pid, c, null, null, null)
                : RowFactory.create(d, pid, c));
          }
        }
        if (cellMax != null) {
          out.add(emitIndex
              ? RowFactory.create("pair", d, null, cellMax, null, null,
                  null)
              : RowFactory.create(d, null, cellMax));
        }
        ids.add(d);
        vecs.add(e);
        norms.add(nrm);
        seen.add(d);
      }

      int from = 0;
      if (horizon > 0 && !ids.isEmpty()) {
        long floor = ids.get(ids.size() - 1) - horizon;
        while (from < ids.size() && ids.get(from) < floor) {
          from++;
        }
      }
      if (cap > 0 && ids.size() - from > cap) {
        from = (int) (ids.size() - cap);
      }
      if (from > 0) {
        Row[] kept = new Row[ids.size() - from];
        for (int i = from; i < ids.size(); i++) {
          kept[i - from] = packVec(ids.get(i), vecs.get(i), norms.get(i));
        }
        entries.put(kept); // something evicted: rewrite the list
      } else if (ids.size() > nStored) {
        Row[] fresh = new Row[ids.size() - nStored];
        for (int i = nStored; i < ids.size(); i++) {
          fresh[i - nStored] = packVec(ids.get(i), vecs.get(i),
              norms.get(i));
        }
        entries.appendList(fresh); // steady state: only the delta
      }
      return toScala(out);
    }

    private static Row packVec(long id, double[] e, double nrm) {
      Double[] boxed = new Double[e.length];
      for (int i = 0; i < e.length; i++) {
        boxed[i] = e[i];
      }
      return RowFactory.create(id, boxed, nrm);
    }
  }

  /** probe: (cell int, doc_id bigint, e array&lt;double&gt;) ->
   * (doc_id, partner, cos) tau pairs + NULL-partner cell-max rows,
   * append mode. horizon/cap &lt;= 0 = unbounded on that axis. */
  public static Dataset<Row> semcellAdmitPairs(Dataset<Row> probe,
      double tau, long horizon, long cap) {
    KeyValueGroupedDataset<Integer, Row> g =
        probe.groupByKey(
            (MapFunction<Row, Integer>)
                (Row r) -> r.getInt(r.fieldIndex("cell")),
            Encoders.INT());
    StructType out =
        new StructType()
            .add("doc_id", DataTypes.LongType)
            .add("partner", DataTypes.LongType)
            .add("cos", DataTypes.DoubleType);
    return g.transformWithState(
        new SemCellAdmitProcessor(tau, horizon, cap), TimeMode.None(),
        OutputMode.Append(), Encoders.row(out));
  }

  /** The FUSED semantic admit: kind='pair' rows (tau pairs + the
   * NULL-partner cell-max rows) and kind='idx' rows (cell, doc_id,
   * vector, precomputed norm — the compacted semantic index relation)
   * through ONE output from ONE source read and ONE JVM state pass. */
  public static Dataset<Row> semcellAdmitPairsFused(Dataset<Row> probe,
      double tau) {
    KeyValueGroupedDataset<Integer, Row> g =
        probe.groupByKey(
            (MapFunction<Row, Integer>)
                (Row r) -> r.getInt(r.fieldIndex("cell")),
            Encoders.INT());
    StructType out =
        new StructType()
            .add("kind", DataTypes.StringType)
            .add("doc_id", DataTypes.LongType)
            .add("partner", DataTypes.LongType)
            .add("cos", DataTypes.DoubleType)
            .add("cell", DataTypes.IntegerType)
            .add("e", DataTypes.createArrayType(DataTypes.DoubleType))
            .add("nrm", DataTypes.DoubleType);
    return g.transformWithState(
        new SemCellAdmitProcessor(tau, 0L, 0L, true), TimeMode.None(),
        OutputMode.Append(), Encoders.row(out));
  }
}
