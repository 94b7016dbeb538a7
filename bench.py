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
    # round-6 additions (headline grows 22 -> 26; per-query times keep
    # the old subtotal comparable across rounds)
    "c4_page_filter",
    "gopher_quality",
    "c4_span_dedup",
    "dup_substring_spans",
    "dsir_select",
    # round-7 additions (headline 27 -> 35)
    "bpe_token_count",
    "semantic_dedup",
    "quality_classifier",
    "bloom_dedup",
    "hll_ngram_distinct",
    "countmin_heavy",
    "host_filter",
    "ccnet_buckets",
]


# the dedup/curate family: every headline query that reads ONLY
# documents/embeddings and whose plan carries the banded-join /
# verify / curate machinery — the set the 30x second-decade stress
# re-times (scale_corpus can then skip lineitem/events entirely)
DEDUP_FAMILY = [
    "minhash_signatures",
    "minhash_xxhash",
    "ngram_jaccard",
    "simhash",
    "cosine_topk",
    "cosine_neardup",
    "curate_corpus",
    "curate_corpus_xxhash",
    "c4_span_dedup",
    "dup_substring_spans",
    "dsir_select",
    # round-7 additions: all read only documents/embeddings
    "bpe_token_count",
    "semantic_dedup",
    "quality_classifier",
    "bloom_dedup",
    "hll_ngram_distinct",
    "countmin_heavy",
    "host_filter",
    "ccnet_buckets",
]


def _run_headline(spark, sf_dir, names=None):
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
    for name in names if names is not None else HEADLINE:
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
    # Steal-aware re-visit (round-5 verdict #3): the round-5 artifact of
    # record was taken in a window where the NO-SPARK control itself
    # measured 0.86 efficiency with a 58% lo-level spread — i.e. the
    # host, not the pipeline, was the bottleneck, and the protocol
    # published it anyway. Now a visibly noisy window (control
    # efficiency below the floor, or control samples spread wider than
    # the threshold) triggers up to MAX_EXTRA additional interleaved
    # rounds before the numbers are accepted; all samples (original +
    # retry) feed the medians, so a genuinely noisy hour still
    # converges on the quietest minutes instead of the loudest.
    noise_ctl_floor = float(os.environ.get("SPARK_GRAFT_SCALING_CTL_FLOOR", "0.85"))
    noise_spread_max = float(os.environ.get("SPARK_GRAFT_SCALING_SPREAD_MAX", "0.25"))
    max_extra = int(os.environ.get("SPARK_GRAFT_SCALING_MAX_EXTRA", "2"))

    rates_lo: list = []
    rates_hi: list = []
    hw_los: list = []
    hw_his: list = []
    paired: list = []
    ratio = cores_hi / cores_lo

    def _one_round() -> None:
        # order within a round pairs each hw-control window with the
        # spark visit it normalizes (lo, hw_lo, hi, hw_hi): the control
        # is only a valid denominator if it samples the same host
        # minutes as its visit — measured drift between distant windows
        # is 2x on this box.
        r_lo = _scaling_run(cores_lo, transcripts_path, n_turns, timed_runs=2)
        h_lo = _hw_control(transcripts_path, cores_lo)
        r_hi = _scaling_run(cores_hi, transcripts_path, n_turns, timed_runs=2)
        h_hi = _hw_control(transcripts_path, cores_hi)
        rates_lo.extend(r_lo)
        rates_hi.extend(r_hi)
        hw_los.append(h_lo)
        hw_his.append(h_hi)
        # per-round normalized efficiency: the spark ratio divided by
        # the SAME round's control ratio — the 4x parallelism factor
        # cancels, so 1.0 = the pipeline scales exactly as well as raw
        # CPU-bound work did in those minutes
        paired.append((_median(r_hi) / _median(r_lo)) / (h_hi / h_lo))

    def _spread(xs: list) -> float:
        med = _median(xs)
        return (max(xs) - min(xs)) / med if med else 0.0

    for _ in range(rounds):
        _one_round()
    extra = 0
    while extra < max_extra:
        hw_eff_now = (_median(hw_his) / _median(hw_los)) / ratio
        noisy = (
            hw_eff_now < noise_ctl_floor
            or _spread(hw_los) > noise_spread_max
            or _spread(hw_his) > noise_spread_max
        )
        if not noisy:
            break
        extra += 1
        _one_round()
    tps_lo = _median(rates_lo)
    tps_hi = _median(rates_hi)
    hw_lo = _median(hw_los)
    hw_hi = _median(hw_his)
    efficiency = (tps_hi / tps_lo) / ratio
    hw_efficiency = (hw_hi / hw_lo) / ratio
    hw_eff_final = hw_efficiency
    noisy_final = (
        hw_eff_final < noise_ctl_floor
        or _spread(hw_los) > noise_spread_max
        or _spread(hw_his) > noise_spread_max
    )
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
        "noise": {
            "ctl_floor": noise_ctl_floor,
            "spread_max": noise_spread_max,
            "hw_spread_lo": round(_spread(hw_los), 3),
            "hw_spread_hi": round(_spread(hw_his), 3),
            "extra_rounds": extra,
            "still_noisy": noisy_final,
        },
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


def _scale_stress_30x(base_timings: dict, stress10: dict) -> dict:
    """Round-6 second-decade stress (round-5 verdict #8): 10x growth
    ratios of ~2-4x leave headroom ambiguity — a residual O(n^2 * eps)
    term that costs 4x at 10x costs 36x at 30x, while O(n log n) costs
    ~3.3x for the 3x step. So re-time the dedup/curate family ONLY
    (documents + embeddings; lineitem/events replicas skipped) at 30x
    and report growth vs the 10x timings: ~<=3x per step = linear,
    anything well above localizes a quadratic residual."""
    from fundus_spark.plans import build_session
    from tools.scale_corpus import materialize_scaled_corpus

    factor = int(os.environ.get("SPARK_GRAFT_SCALE_STRESS_30X_FACTOR", "30"))
    stress_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"fundus_spark_scale_x{factor}_dedup"
    )
    spark = build_session(app_name="bench-scale-stress-30x", cores=CPUS)
    try:
        rows = materialize_scaled_corpus(
            spark, SF_DIR, stress_dir, factor, tables=("documents", "embeddings")
        )
        timings = _run_headline(spark, stress_dir, names=DEDUP_FAMILY)
    finally:
        spark.stop()
    t10 = stress10.get("queries", {}) if isinstance(stress10, dict) else {}
    step = factor / max(stress10.get("factor", 10), 1) if isinstance(stress10, dict) else 3.0
    return {
        "factor": factor,
        "rows": rows,
        "total": round(sum(timings.values()), 3),
        "queries": timings,
        # per-step growth: t(30x)/t(10x) for a 3x data step — the
        # second-decade linearity signal
        "step_vs_10x": step,
        "growth_vs_10x": {
            q: round(timings[q] / t10[q], 2) for q in timings if t10.get(q)
        },
        "growth_vs_base": {
            q: round(timings[q] / base_timings[q], 2)
            for q in timings
            if base_timings.get(q)
        },
    }


def _incremental_stress() -> dict:
    """Round-6 append-path stress (round-5 verdict #7): the batch
    scale-stress says nothing about the daily-append story — run
    curate_increment over N sequential decorrelated 1x batches while
    the frozen corpus grows from 1x to Nx, timing each increment. The
    100 TB claim under test: per-batch cost stays ~flat because the
    frozen side is probed through its PERSISTED fp/band relations
    (parquet, appended after each batch) — never re-shingled, never
    re-deduplicated — so only the (bounded) band-bucket collisions
    touch frozen text. A per-batch wall time that grows with the
    frozen corpus would falsify the freeze contract's cost model.

    Batches are the decorrelated replicas of the 10x stress corpus
    (tools/scale_corpus.py): replica i occupies doc_id range
    [i*2^33, (i+1)*2^33), so slicing is partition-prunable and each
    batch has the base corpus's workload shape but near-zero
    cross-batch near-dup mass (the measured cost is the probe
    machinery, not pathological cluster growth)."""
    import shutil

    from pyspark.sql import functions as F

    from fundus_spark.operators import band_relation, exact_dedup
    from fundus_spark.plans import build_session, curate_corpus, curate_increment
    from tools.scale_corpus import KEY_SHIFT, materialize_scaled_corpus

    factor = int(os.environ.get("SPARK_GRAFT_INCR_STRESS_BATCHES", "10"))
    src_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"fundus_spark_scale_x{factor}"
    )
    state_dir = os.path.join(os.environ.get("TMPDIR", "/tmp"), "fundus_spark_incr_stress")
    # fresh state every run: the measurement IS the growth curve, so a
    # stale half-grown frozen corpus would corrupt it
    shutil.rmtree(state_dir, ignore_errors=True)
    frozen_docs_path = os.path.join(state_dir, "frozen_docs.parquet")
    fps_path = os.path.join(state_dir, "frozen_fps.parquet")
    bands_path = os.path.join(state_dir, "frozen_bands.parquet")

    spark = build_session(app_name="bench-incremental-stress", cores=CPUS)
    per_batch = []
    frozen_rows = []
    try:
        materialize_scaled_corpus(spark, SF_DIR, src_dir, factor, tables=("documents",))
        docs = spark.read.parquet(f"{src_dir}/documents.parquet")

        def batch_slice(i: int):
            return docs.where(
                (F.col("doc_id") >= i * KEY_SHIFT) & (F.col("doc_id") < (i + 1) * KEY_SHIFT)
            )

        def append_state(new_frozen, mode: str) -> None:
            # the stored-relation contract: fps and bands are written
            # ONCE at a batch's own curation time; later appends probe
            # them from parquet without touching frozen text
            new_frozen.write.mode(mode).parquet(frozen_docs_path)
            written = spark.read.parquet(frozen_docs_path)
            if mode == "overwrite":
                exact_dedup(written).select("fp").write.mode("overwrite").parquet(fps_path)
                band_relation(written).write.mode("overwrite").parquet(bands_path)
            else:
                exact_dedup(new_frozen).select("fp").write.mode("append").parquet(fps_path)
                band_relation(new_frozen).write.mode("append").parquet(bands_path)

        # batch 0: bootstrap the frozen corpus with the full chain, at
        # the same thresholds the curate_corpus headline query uses
        survivors0 = curate_corpus(
            batch_slice(0), jaccard_threshold=0.01, pack_budget=4096
        ).select("doc_id")
        frozen0 = docs.join(survivors0, "doc_id", "left_semi")
        append_state(frozen0, "overwrite")

        for i in range(1, factor):
            frozen_docs = spark.read.parquet(frozen_docs_path)
            frozen_fps = spark.read.parquet(fps_path)
            frozen_bands = spark.read.parquet(bands_path)
            frozen_rows.append(frozen_docs.count())
            started = time.time()
            increment = curate_increment(
                batch_slice(i),
                frozen_docs,
                jaccard_threshold=0.01,
                frozen_fps=frozen_fps,
                frozen_bands=frozen_bands,
            ).localCheckpoint(eager=True)
            increment.count()
            per_batch.append(round(time.time() - started, 3))
            append_state(docs.join(increment.select("doc_id"), "doc_id", "left_semi"), "append")
    finally:
        spark.stop()
    half = len(per_batch) // 2
    return {
        "batches": factor,
        "per_batch_sec": per_batch,
        "frozen_rows_before_batch": frozen_rows,
        "total": round(sum(per_batch), 3),
        # flatness signal: median of the last half vs the first half —
        # ~1.0 means appending to a corpus 5-9x larger costs the same
        # as appending to the 1-4x one (the frozen side is pruned)
        "late_vs_early": round(
            _median(per_batch[half:]) / _median(per_batch[:half]), 3
        )
        if half
        else None,
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
    stress30 = None
    incr = None
    if stress_mode == "1" or (stress_mode == "auto" and SF_DIR.rstrip("/").endswith("sf0.1")):
        try:
            stress = _scale_stress(timings)
        except Exception as exc:  # noqa: BLE001 — advisory block, never fatal
            stress = {"error": f"{type(exc).__name__}: {exc}"}
        # second-decade (30x) dedup/curate stress + append-path stress
        # (round-6): same advisory contract — report, never fail the line
        if os.environ.get("SPARK_GRAFT_SCALE_STRESS_30X", "1") != "0":
            try:
                stress30 = _scale_stress_30x(timings, stress)
            except Exception as exc:  # noqa: BLE001
                stress30 = {"error": f"{type(exc).__name__}: {exc}"}
        if os.environ.get("SPARK_GRAFT_INCR_STRESS", "1") != "0":
            try:
                incr = _incremental_stress()
            except Exception as exc:  # noqa: BLE001
                incr = {"error": f"{type(exc).__name__}: {exc}"}

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
    if stress30 is not None:
        out["scale_stress_30x"] = stress30
    if incr is not None:
        out["incremental_stress"] = incr

    # Round-5 verdict #1: the driver records only a ~2000-char tail of
    # stdout, and round 5's single full-JSON line (runs arrays + the
    # scale_stress per-query maps) blew past it — BENCH_r05.json came
    # back `parsed: null`. The contract now: the FULL artifact goes to
    # a file, and the FINAL stdout line is a compact summary guaranteed
    # to fit the tail window (headline total, per-query times, scaling
    # efficiencies, scale-stress growths). Progressive trimming keeps
    # the line under budget no matter how many advisory blocks grow.
    full_path = Path(__file__).resolve().parent / "BENCH_FULL.json"
    full_path.write_text(json.dumps(out, indent=1))

    compact = {
        "metric": out["metric"],
        "value": total,
        "unit": "sec",
        "queries": {q: round(t, 2) for q, t in timings.items()},
        "sf": out["sf"],
        "scaling": {
            k: scaling[k]
            for k in (
                "cores_lo",
                "cores_hi",
                "turns_per_sec_lo",
                "turns_per_sec_hi",
                "efficiency",
                "hw_control_efficiency",
                "normalized_efficiency",
                "paired_normalized_efficiency",
            )
            if k in scaling
        },
        "full_json": full_path.name,
    }
    if isinstance(scaling.get("noise"), dict):
        compact["scaling"]["noise_extra_rounds"] = scaling["noise"]["extra_rounds"]
        compact["scaling"]["noise_still_noisy"] = scaling["noise"]["still_noisy"]
    for key in ("scale_stress", "scale_stress_30x", "incremental_stress"):
        block = out.get(key)
        if not isinstance(block, dict):
            continue
        if "error" in block:
            compact[key] = {"error": block["error"]}
            continue
        summary = {
            k: block[k]
            for k in ("factor", "total", "batches", "late_vs_early", "step_vs_10x")
            if k in block
        }
        # for the 30x block the per-step (vs 10x) growth is the
        # second-decade linearity signal; vs-base is in the full file
        growth = block.get("growth_vs_10x") or block.get("growth_vs_base")
        if isinstance(growth, dict) and growth:
            ordered = sorted(growth.items(), key=lambda kv: kv[1])
            summary["growth"] = {q: round(g, 1) for q, g in growth.items()}
            summary["median_growth"] = round(_median(list(growth.values())), 2)
            summary["max_growth"] = [ordered[-1][0], round(ordered[-1][1], 2)]
        if "per_batch_sec" in block:
            summary["per_batch_sec"] = [round(t, 2) for t in block["per_batch_sec"]]
        compact[key] = summary
    line = json.dumps(compact, separators=(",", ":"))
    # trim stages, cheapest-information-first, until the line fits the
    # driver's tail window with headroom
    if len(line) > 1800:
        for key in ("scale_stress", "scale_stress_30x", "incremental_stress"):
            if isinstance(compact.get(key), dict):
                compact[key].pop("growth", None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800:
        compact["queries"] = {q: round(t, 1) for q, t in timings.items()}
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
