"""No-Spark hardware control for the scaling measurement.

Runs the SAME extraction kernel over the SAME transcript payloads in a
plain ``multiprocessing.Pool`` at a given process count — no JVM, no
Arrow, no shuffle, no scheduler. Whatever sub-linearity this control
shows going N -> 4N processes is the host's own ceiling (shared-tenancy
DVFS / memory bandwidth), not a property of the Spark pipeline. bench.py
invokes it as a subprocess (clean fork semantics, no JVM in the parent)
and divides the Spark-measured efficiency by this control's efficiency
to get the pipeline-attributable scaling efficiency.

Usage: python tools/hw_control.py <transcripts_parquet_dir> <procs> [n_docs]
Prints one JSON line: {"procs": N, "docs_per_sec": r}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_DOCS: list = []


def _init(parquet_dir: str, n_docs: int) -> None:
    global _DOCS
    import duckdb

    con = duckdb.connect()
    _DOCS = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM '{parquet_dir}/*.parquet' LIMIT {n_docs}"
        ).fetchall()
    ]
    con.close()


def _work(reps: int) -> int:
    from fundus_spark.kernel import run_extraction
    from fundus_spark.rules import resolve

    spec = resolve(None)
    n = 0
    for _ in range(reps):
        for text in _DOCS:
            run_extraction(spec, text, None, error_handling="suppress")
            n += 1
    return n


# reps sized so the timed window is ~8-12s: a ~1s window (the old
# reps=3) is hostage to a single shared-tenancy steal burst, and the
# control's noise then dominates the normalized-efficiency ratio.
def measure(parquet_dir: str, procs: int, n_docs: int = 400, reps: int = 30) -> float:
    import time

    # A raising Pool initializer respawns workers forever -> hang.
    # Validate the corpus before forking.
    if not list(Path(parquet_dir).glob("*.parquet")):
        raise SystemExit(f"hw_control: no parquet files under {parquet_dir!r}")

    with mp.Pool(procs, initializer=_init, initargs=(parquet_dir, n_docs)) as pool:
        pool.map(_work, [1] * procs)  # warm: imports + selector compile
        started = time.time()
        done = sum(pool.map(_work, [reps] * procs))
        elapsed = time.time() - started
    return done / elapsed


if __name__ == "__main__":
    out_dir = sys.argv[1]
    n_procs = int(sys.argv[2])
    docs = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    # Pin to n_procs CPUs, mirroring tools/scaling_visit.py — the
    # control must model the same N-core node the Spark visit models,
    # or the normalization compares a pinned pipeline to an unpinned
    # control.
    from tools.scaling_visit import pin_to_cores  # noqa: E402 — repo root is on sys.path

    pin_to_cores(n_procs)
    print(json.dumps({"procs": n_procs, "docs_per_sec": round(measure(out_dir, n_procs, docs), 1)}))
