"""Multi-PROCESS distributed tests: real `jax.distributed` jobs on CPU.

Unlike the rest of the suite (one process, 8 virtual devices), this spawns
actual worker processes via the `benchmarks/multihost.py` orchestrator —
the reference's driver/executor process boundary
(`node2vec_spark/.../Node2vec.scala:24-61`) exercised for real: Gloo
collectives between processes, global ("host", "data", "edge") mesh,
edge-sharded TwoWL + data-parallel SEAL steps, and a whole-job
crash + checkpoint-resume cycle.

Runs as subprocesses so the conftest's in-process JAX config doesn't leak.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_proof(tmp_path):
    artifact = tmp_path / "MULTIHOST.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "multihost.py"),
         "--nproc", "2", "--ldev", "4", "--steps", "4",
         "--outdir", str(tmp_path / "work"), "--artifact", str(artifact)],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    report = json.loads(artifact.read_text())
    assert report["ok"]
    assert report["process_count_inside_job"] == 2
    assert report["global_devices_inside_job"] == 8
    c = report["checks"]
    assert c["twowl_param_max_abs_diff_vs_reference"] < 2e-4
    assert c["seal_param_max_abs_diff_vs_reference"] < 2e-4
    assert c["twowl_param_max_abs_diff_resume_vs_uninterrupted"] < 2e-4
    assert c["crash_rc"] == [17, 17]
