"""jobs/run_tiers.py: the tier-family build job writes all three
families day-partitioned, cascading from the stored finer tier."""

import json
import os
import subprocess
import sys


def test_run_tiers_job_end_to_end(tmp_path):
    out = str(tmp_path / "tiers")
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "jobs", "run_tiers.py"),
            "--synthetic", "12x120", "--out", out,
            "--families", "numeric,quantile,counter,timeweight,stats,histogram",
            "--k", "32", "--hist", "0:200:16",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert set(report["tiers"]) == {
        f"{fam}_{tier}"
        for fam in ("numeric", "quantile", "counter", "timeweight", "stats", "histogram")
        for tier in ("1m", "1h", "1d")
    }
    for name, info in report["tiers"].items():
        assert info["rows"] > 0, name
        # bucket_date= partition layout on disk (expiry/pruning contract)
        dirs = os.listdir(info["path"])
        assert any(d.startswith("bucket_date=") for d in dirs), name
    # coarser tiers shrink
    t = report["tiers"]
    for fam in ("numeric", "quantile", "counter", "timeweight", "stats", "histogram"):
        assert t[f"{fam}_1m"]["rows"] > t[f"{fam}_1h"]["rows"] > t[f"{fam}_1d"]["rows"]
