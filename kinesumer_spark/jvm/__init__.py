"""On-demand javac build + py4j loader for the JVM-side stateful
operators (src/ksjvm/AdmitJvm.java).

Why this exists: the r15 fused-probe adjudication measured that
source-read fusion LOSES with a Python-state operator (the index
relation pays the Arrow boundary twice) and recorded the design rule
"fuse only when the stateful operator is JVM-side". The Python
transformWithStateInPandas port (stateful.BucketAdmitProcessor) is
protobuf-gated and cannot run in this container; the Scala/Java
transformWithState API has NO Python-side dependency — only a
compiler. The container ships a full JDK 17 (javac + jar), so the
JVM-state form is buildable from source at first use: javac against
the pyspark distribution's own jars, zipped into a content-addressed
jar, registered with sc.addJar (executor side) and loaded through a
py4j URLClassLoader (driver side). No network, no pip, no vendored
binaries — the .java source is the artifact in git.

Capability gate: jvm_state_supported() — javac + jar present and the
one-time compile succeeds. Queries register behind it exactly like
tws_supported() (streaming/queries.py:1150).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src")
_MAIN = os.path.join(_SRC, "ksjvm", "AdmitJvm.java")

_jar_path: str | None = None
_build_err: str | None = None


def _pyspark_jars_dir() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def build_jar() -> str:
    """Compile AdmitJvm.java into a content-addressed jar (cached per
    source hash, shared across processes — the artifact is immutable
    for a given source, so concurrent builders race benignly via an
    atomic rename). Returns the jar path; raises on compile failure."""
    global _jar_path, _build_err
    if _jar_path is not None:
        return _jar_path
    if _build_err is not None:
        raise RuntimeError(_build_err)
    try:
        with open(_MAIN, "rb") as fh:
            digest = hashlib.sha256(fh.read()).hexdigest()[:16]
        # Cache under a per-user 0700 directory, NOT the world-writable
        # tempdir: a predictable /tmp path lets any local user pre-plant
        # or symlink-swap the jar and have their classes loaded into the
        # driver/executor JVM (driver ADVICE r16, medium). XDG cache dir
        # with os.makedirs(mode=0o700) + an explicit chmod on pre-existing
        # dirs; refuse symlinked cache dirs outright.
        cache_root = os.environ.get(
            "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
        )
        cache_dir = os.path.join(cache_root, "ksjvm")
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        if os.path.islink(cache_dir):
            raise RuntimeError(f"ksjvm cache dir is a symlink: {cache_dir}")
        os.chmod(cache_dir, 0o700)
        jar = os.path.join(cache_dir, f"ksjvm_{digest}.jar")
        if os.path.exists(jar) and not os.path.islink(jar):
            _jar_path = jar
            return jar
        javac = shutil.which("javac")
        jartool = shutil.which("jar")
        if not javac or not jartool:
            raise RuntimeError("no JDK: javac/jar not on PATH")
        build = tempfile.mkdtemp(prefix="ksjvm_build_")
        try:
            cp = os.path.join(_pyspark_jars_dir(), "*")
            subprocess.run(
                [javac, "-classpath", cp, "-d", build, _MAIN],
                check=True,
                capture_output=True,
                text=True,
            )
            tmp_jar = os.path.join(build, "ksjvm.jar")
            subprocess.run(
                [jartool, "cf", tmp_jar, "-C", build, "ksjvm"],
                check=True,
                capture_output=True,
                text=True,
            )
            # Atomic publish via a same-directory temp name (os.replace
            # across filesystems — /tmp build dir vs ~/.cache — would
            # raise EXDEV; and the 0700 dir means no one else can race
            # the rename).
            stage = os.path.join(cache_dir, f".ksjvm_{digest}.{os.getpid()}.tmp")
            shutil.copyfile(tmp_jar, stage)
            os.replace(stage, jar)
        finally:
            shutil.rmtree(build, ignore_errors=True)
        _jar_path = jar
        return jar
    except subprocess.CalledProcessError as exc:
        _build_err = f"ksjvm compile failed: {exc.stderr[-2000:]}"
        raise RuntimeError(_build_err) from exc
    except Exception as exc:  # noqa: BLE001 — cache the gate verdict
        _build_err = f"ksjvm build unavailable: {exc}"
        raise RuntimeError(_build_err) from exc


def jvm_state_supported() -> bool:
    """True iff the JVM-state operators can be built here (JDK present,
    compile green). Mirrors tws_supported(): queries register only
    where the capability exists."""
    try:
        build_jar()
        return True
    except RuntimeError:
        return False


_loaded_class_cache: dict[str, object] = {}


def _admit_jvm_class(spark):
    """Load ksjvm.AdmitJvm into the driver JVM (URLClassLoader over the
    built jar) and register the jar with the SparkContext so executor
    tasks can deserialize the processor. Cached per applicationId."""
    app = spark.sparkContext.applicationId
    cached = _loaded_class_cache.get(app)
    if cached is not None:
        return cached
    jar = build_jar()
    spark.sparkContext._jsc.addJar(jar)  # executor-side classpath
    jvm = spark._jvm
    gateway = spark.sparkContext._gateway
    urls = gateway.new_array(jvm.java.net.URL, 1)
    urls[0] = jvm.java.net.URL("file:" + jar)
    loader = jvm.java.net.URLClassLoader(
        urls, jvm.Thread.currentThread().getContextClassLoader()
    )
    cls = loader.loadClass("ksjvm.AdmitJvm")
    _loaded_class_cache[app] = cls
    return cls


def _invoke_static(spark, method: str, *jargs):
    """Reflectively invoke a static AdmitJvm method and wrap the
    returned Dataset<Row> as a PySpark DataFrame."""
    from pyspark.sql import DataFrame

    cls = _admit_jvm_class(spark)
    jvm = spark._jvm
    gateway = spark.sparkContext._gateway
    meths = [m for m in cls.getMethods() if m.getName() == method]
    if not meths:
        raise AttributeError(f"ksjvm.AdmitJvm has no method {method}")
    arr = gateway.new_array(jvm.java.lang.Object, len(jargs))
    for i, a in enumerate(jargs):
        arr[i] = a
    jds = meths[0].invoke(None, arr)
    return DataFrame(jds, spark)


def running_totals_jvm(spark, events):
    """JVM-state running per-user totals (update mode) — the
    stream_transform_with_state semantics on the Scala/Java API.
    ``events`` carries (user_id bigint, value bigint)."""
    return _invoke_static(spark, "runningTotals", events._jdf)


def bucket_admit_pairs_fused_jvm(spark, probe):
    """The FUSED JVM-state admit: kind='pair' + kind='idx' rows through
    one output from one source read and one state pass
    (AdmitJvm.bucketAdmitPairsFused) — the shape the r15 adjudication
    measured AGAINST with Python state (the idx relation paid the Arrow
    boundary twice) and reserved for JVM state. Output schema mirrors
    stateful.ADMIT_FUSED_OUTPUT_SCHEMA."""
    return _invoke_static(spark, "bucketAdmitPairsFused", probe._jdf)


def semcell_admit_pairs_fused_jvm(spark, probe, tau: float):
    """The FUSED JVM-state semantic admit: kind='pair' + kind='idx'
    rows (cell, doc_id, vector, precomputed norm — the compacted
    semantic index relation) through one output from one source read
    and one state pass (AdmitJvm.semcellAdmitPairsFused)."""
    jvm = spark._jvm
    t = jvm.java.lang.Double(float(tau))
    p = probe.selectExpr("CAST(cell AS int) AS cell", "doc_id", "e")
    return _invoke_static(spark, "semcellAdmitPairsFused", p._jdf, t)


def bucket_admit_pairs_jvm(spark, probe, horizon: int | None = None):
    """JVM-state band-bucket near-dup admission (append mode) — the
    stateful.bucket_admit_pairs semantics with state that never leaves
    the JVM. ``probe`` is the stream_inrow_band_probe relation;
    ``horizon`` bounds state to the arrival window (None = unbounded).

    horizon=0 is rejected: AdmitJvm encodes "unbounded" as <=0, while
    the Python twin (stateful.bucket_admit_pairs) treats horizon=0 as
    "no eligible earlier partner" — opposite semantics, so an explicit
    0 must not silently pick either (driver ADVICE r16)."""
    if horizon is not None and int(horizon) <= 0:
        raise ValueError(
            "horizon must be a positive int or None (got "
            f"{horizon!r}); the JVM sentinel for unbounded is None"
        )
    jvm = spark._jvm
    h = jvm.java.lang.Long(int(horizon) if horizon is not None else 0)
    return _invoke_static(spark, "bucketAdmitPairs", probe._jdf, h)


def semcell_admit_pairs_jvm(
    spark, probe, tau: float, horizon: int | None = None,
    cap: int | None = None
):
    """JVM-state per-cell SEMANTIC admission (append mode) — the
    stateful.semcell_admit_pairs semantics (tau pairs + NULL-partner
    cell-max rows, horizon/cap bounds mutually exclusive) with the
    cell history held in JVM ListState. ``probe`` carries
    (cell, doc_id, e); cell is cast to int for the group key.

    horizon=0 / cap=0 are rejected for the same reason as
    bucket_admit_pairs_jvm: the JVM encodes unbounded as <=0 while the
    Python twin gives 0 a different meaning (driver ADVICE r16)."""
    if horizon is not None and int(horizon) <= 0:
        raise ValueError(
            f"horizon must be a positive int or None (got {horizon!r})"
        )
    if cap is not None and int(cap) <= 0:
        raise ValueError(
            f"cap must be a positive int or None (got {cap!r})"
        )
    jvm = spark._jvm
    h = jvm.java.lang.Long(int(horizon) if horizon is not None else 0)
    c = jvm.java.lang.Long(int(cap) if cap is not None else 0)
    t = jvm.java.lang.Double(float(tau))
    p = probe.selectExpr("CAST(cell AS int) AS cell", "doc_id", "e")
    return _invoke_static(spark, "semcellAdmitPairs", p._jdf, t, h, c)
