"""North-rule two-cluster-size parity INSIDE `pytest -x -q`: the same
pipeline (correct → 1m tier → 1h/1d cascades → Gorilla compress) over the
same input — synthetic pages with injected jumps, gaps, and outliers
(sources/synth) — at local[2] (N) and local[8] (4N) in separate JVMs must
produce bit-identical tier checksums, counts, and compressed payloads.

BENCH/scaling.py measures THROUGHPUT at the two levels (efficiency ≥0.8);
this test pins the CORRECTNESS half of the criterion where the driver's
`python -m pytest -x -q` gate can see it. Fixed partition layout at both
levels (layout is a property of the job, not the cluster size).
"""

import json
import os
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "_parity_worker.py")


def _run(cores: int) -> dict:
    res = subprocess.run(
        [sys.executable, WORKER, str(cores), "60", "150"],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_pipeline_bit_identical_at_n_and_4n_cores():
    r_n = _run(2)
    r_4n = _run(8)
    assert r_n["counts"] == r_4n["counts"]
    assert r_n["checksums"] == r_4n["checksums"], (
        f"N vs 4N divergence: {r_n['checksums']} vs {r_4n['checksums']}"
    )
    # sanity: the fixture actually exercised every stage
    assert r_n["counts"]["r1m"] > r_n["counts"]["r1h"] > r_n["counts"]["r1d"] > 0
    assert r_n["counts"]["comp"] > 0
