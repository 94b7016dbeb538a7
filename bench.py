"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus the north_rule scaling-efficiency
measurement (same extraction job at N and 4N local cores).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "scaling": {"cores_lo": .., "cores_hi": .., "turns_per_sec_lo": ..,
               "turns_per_sec_hi": .., "efficiency": ..}}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "extract_documents",
    "assemble_conversations",
    "boilerplate_strip",
    "pdf_extract",
    "minhash_signatures",
    "minhash_xxhash",
    "ngram_jaccard",
    "simhash",
    "cosine_topk",
    "cosine_neardup",
    "media_decode",
    "robots_gate",
    "curate_corpus",
    "curate_corpus_xxhash",
    "pricing_summary",
    "revenue_by_nation",
    "shipping_priority",
    "event_sessions",
    "grouped_topk",
    "quality_score",
    "language_id",
    "fingerprint",
]


def _run_headline(spark, sf_dir):
    import __spark_entry__ as entrymod

    # merged view: folded twins (extra_queries) stay benchable so
    # per-query timings remain comparable across rounds
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    # untimed warm-up: spawn the Python workers, JIT the scan, import
    # the kernel — so the first timed query measures the query, not
    # session startup (a ~5s one-off that previously landed entirely
    # on extract_documents)
    from pyspark.sql import functions as F

    from fundus_spark.plans import extract_articles
    from fundus_spark.sources.doc_html import documents_as_transcripts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(64)
    extract_articles(documents_as_transcripts(docs).drop("doc_id")).count()

    timings = {}
    for name in HEADLINE:
        started = time.time()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - started, 3)
    return timings


REPLICAS = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "64"))


def _materialize_scaled_transcripts(sf_dir: str, replicas: int, path: str) -> int:
    """Build the scaled transcript corpus once (distinct conv_ids per
    replica: a bigger corpus, not the same bytes re-counted) and write
    it as a well-partitioned parquet table — the scaling measurement
    then times the pure scan->extract stage, the shape the job has over
    a bucketed Iceberg table at 100 TB."""
    from pyspark.sql import functions as F

    from fundus_spark.plans import build_session
    from fundus_spark.sources.doc_html import documents_as_transcripts

    spark = build_session(app_name="bench-materialize", cores=CPUS)
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base = documents_as_transcripts(docs).drop("doc_id")
        # 32 files per hi-level core: each file is one scan task (see
        # tools/scaling_visit.py SCAN_SPLIT_CONF), so the stage runs ~32
        # waves at local[32] / ~128 at local[8] — the last-wave
        # straggler tail shrinks to ~1/32 of the stage instead of ~1/8,
        # which at 8 waves was most of the measured efficiency gap.
        transcripts = (
            base.crossJoin(spark.range(replicas).select(F.col("id").alias("_replica")))
            .withColumn("conv_id", F.concat_ws("-", "conv_id", "_replica"))
            .drop("_replica")
            .repartition(CPUS * 32, F.col("conv_id"), F.col("turn_idx"))
        )
        transcripts.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()
    finally:
        spark.stop()


def _scaling_run(cores: int, transcripts_path: str, n_turns: int, timed_runs: int) -> list:
    """One visit to a parallelism level, run as a SUBPROCESS pinned to
    exactly `cores` CPUs (tools/scaling_visit.py documents why: an
    unpinned local[N] on a 32-CPU host gives the JVM's scan/GC/serialize
    threads free idle silicon at low N and oversubscribes at high N —
    an asymmetry no real N-core-executor cluster has). Every visit pays
    its own never-timed warm-up pass so JIT/worker-spawn cost cannot
    land inside a timed pass at either level. Returns turns/sec per
    timed pass."""
    import subprocess

    out = subprocess.run(
        [
            sys.executable,
            str(Path(__file__).resolve().parent / "tools" / "scaling_visit.py"),
            str(cores),
            transcripts_path,
            str(n_turns),
            str(timed_runs),
        ],
        capture_output=True,
        text=True,
        check=True,
        timeout=1800,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["rates"]


def _median(xs: list) -> float:
    xs = sorted(xs)
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2


def _hw_control(transcripts_path: str, procs: int) -> float:
    """Same kernel + same payloads in a plain multiprocessing.Pool (no
    Spark at all) — measures the HOST's own scaling ceiling. Run as a
    subprocess so the fork doesn't inherit this process's JVM."""
    import subprocess

    out = subprocess.run(
        [sys.executable, str(Path(__file__).resolve().parent / "tools" / "hw_control.py"), transcripts_path, str(procs)],
        capture_output=True,
        text=True,
        check=True,
        timeout=300,
    )
    return float(json.loads(out.stdout.strip().splitlines()[-1])["docs_per_sec"])


def _measure_scaling(cores_lo: int, cores_hi: int, transcripts_path: str, n_turns: int) -> dict:
    """North-rule scaling evidence: the same job at N and 4N cores on
    identical input, PLUS a no-Spark hardware control at the same
    process counts.

    Two confounds on a single shared-tenancy box, and how each is
    handled:
    * the host drifts (steal bursts, ±10-20% between minutes) — the two
      levels are visited interleaved lo,hi,lo,hi and summarized by
      median so drift cancels in the ratio;
    * an unpinned local[N] is not an N-core node (JVM service threads +
      Python workers use idle silicon at low N, oversubscribe at high
      N) — every visit runs in a subprocess whose whole tree is pinned
      to exactly N CPUs (tools/scaling_visit.py), the honest emulation
      of an N-core executor;
    * the host itself scales sub-linearly for ANY CPU-bound work (DVFS /
      memory bandwidth: per-core throughput of the kernel under plain
      multiprocessing can drop 20-35% from 8 -> 32 busy cores, no Spark
      involved) — the control measures that ceiling under the SAME
      pinning, and `normalized_efficiency` = spark_efficiency /
      hw_efficiency is the pipeline-attributable number. On a real
      N -> 4N *multi-machine* cluster the control is ~1.0 by
      construction and the raw and normalized numbers coincide.
    """
    # 3 interleaved rounds (median of 6 per level): a steal burst that
    # poisons one whole visit then contributes only 2 of 6 samples, so
    # the median still rejects it — with 2 rounds it owned the median.
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
    rates_lo: list = []
    rates_hi: list = []
    hw_los: list = []
    hw_his: list = []
    paired: list = []
    ratio = cores_hi / cores_lo
    for _ in range(rounds):
        # order within a round pairs each hw-control window with the
        # spark visit it normalizes (lo, hw_lo, hi, hw_hi): the control
        # is only a valid denominator if it samples the same host
        # minutes as its visit — measured drift between distant windows
        # is 2x on this box.
        r_lo = _scaling_run(cores_lo, transcripts_path, n_turns, timed_runs=2)
        h_lo = _hw_control(transcripts_path, cores_lo)
        r_hi = _scaling_run(cores_hi, transcripts_path, n_turns, timed_runs=2)
        h_hi = _hw_control(transcripts_path, cores_hi)
        rates_lo += r_lo
        rates_hi += r_hi
        hw_los.append(h_lo)
        hw_his.append(h_hi)
        # per-round normalized efficiency: the spark ratio divided by
        # the SAME round's control ratio — the 4x parallelism factor
        # cancels, so 1.0 = the pipeline scales exactly as well as raw
        # CPU-bound work did in those minutes
        paired.append((_median(r_hi) / _median(r_lo)) / (h_hi / h_lo))
    tps_lo = _median(rates_lo)
    tps_hi = _median(rates_hi)
    hw_lo = _median(hw_los)
    hw_hi = _median(hw_his)
    efficiency = (tps_hi / tps_lo) / ratio
    hw_efficiency = (hw_hi / hw_lo) / ratio
    return {
        "cores_lo": cores_lo,
        "cores_hi": cores_hi,
        "turns_per_sec_lo": round(tps_lo, 2),
        "turns_per_sec_hi": round(tps_hi, 2),
        "runs_lo": [round(r, 1) for r in rates_lo],
        "runs_hi": [round(r, 1) for r in rates_hi],
        "efficiency": round(efficiency, 3),
        "hw_control_runs_lo": [round(r, 1) for r in hw_los],
        "hw_control_runs_hi": [round(r, 1) for r in hw_his],
        "hw_control_docs_per_sec_lo": round(hw_lo, 1),
        "hw_control_docs_per_sec_hi": round(hw_hi, 1),
        "hw_control_efficiency": round(hw_efficiency, 3),
        "normalized_efficiency": round(efficiency / hw_efficiency, 3),
        "paired_normalized_rounds": [round(p, 3) for p in paired],
        "paired_normalized_efficiency": round(_median(paired), 3),
    }


def _scale_stress(base_timings: dict) -> dict:
    """Round-5 scale-stress: materialize a decorrelated factor-N corpus
    (tools/scale_corpus.py) and run the SAME headline list on it in a
    fresh session. If every plan is linear, each query costs ~N x its
    base time; the growth map localizes any super-linear offender. The
    block is advisory — any failure is reported, never fatal to the
    bench line."""
    from fundus_spark.plans import build_session
    from tools.scale_corpus import materialize_scaled_corpus

    factor = int(os.environ.get("SPARK_GRAFT_SCALE_STRESS_FACTOR", "10"))
    stress_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"fundus_spark_scale_x{factor}"
    )
    spark = build_session(app_name="bench-scale-stress", cores=CPUS)
    try:
        rows = materialize_scaled_corpus(spark, SF_DIR, stress_dir, factor)
        timings = _run_headline(spark, stress_dir)
    finally:
        spark.stop()
    growth = {
        q: round(timings[q] / base_timings[q], 2)
        for q in timings
        if base_timings.get(q)
    }
    return {
        "factor": factor,
        "rows": {t: rows[t] for t in ("documents", "embeddings", "events", "lineitem") if t in rows},
        "total": round(sum(timings.values()), 3),
        "queries": timings,
        "growth_vs_base": growth,
    }


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    from fundus_spark.plans import build_session

    # Reserve a few CPUs at BOTH levels so the pinned hi-level visit is
    # not the entire machine: on a shared-tenancy host, pinning all 32
    # CPUs means every other tenant burst lands inside the measured set
    # at the hi level only (the lo level's 24 unpinned CPUs absorb the
    # same burst for free) — an asymmetry a real N-core-executor
    # cluster does not have, and the main source of the hi-level run
    # variance in round 3 (runs_hi swung 22k-31k while runs_lo stayed
    # within 6%). 28/7 keeps the exact 4x ratio with 4 CPUs of noise
    # headroom at both levels.
    reserve = int(os.environ.get("SPARK_GRAFT_SCALING_RESERVE", "4"))
    cores_hi = max(CPUS - reserve, 4)
    cores_hi -= cores_hi % 4  # keep the N -> 4N ratio exact
    cores_lo = max(cores_hi // 4, 1)
    scaled_path = os.path.join(os.environ.get("TMPDIR", "/tmp"), "fundus_spark_bench_transcripts")
    n_turns = _materialize_scaled_transcripts(SF_DIR, REPLICAS, scaled_path)
    scaling = _measure_scaling(cores_lo, cores_hi, scaled_path, n_turns)

    spark = build_session(app_name="bench", cores=CPUS)
    timings = _run_headline(spark, SF_DIR)
    spark.stop()

    # 10x scale-stress (round 5): on by default for the driver's sf0.1
    # run; "0" disables, "1" forces at any SF (smoke runs at sf0.01
    # skip it so they stay fast).
    stress_mode = os.environ.get("SPARK_GRAFT_SCALE_STRESS", "auto")
    stress = None
    if stress_mode == "1" or (stress_mode == "auto" and SF_DIR.rstrip("/").endswith("sf0.1")):
        try:
            stress = _scale_stress(timings)
        except Exception as exc:  # noqa: BLE001 — advisory block, never fatal
            stress = {"error": f"{type(exc).__name__}: {exc}"}

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline query wall time (extraction pipeline + dedup/similarity/text ops)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        "scaling": scaling,
    }
    if stress is not None:
        out["scale_stress"] = stress
    print(json.dumps(out))


if __name__ == "__main__":
    main()
