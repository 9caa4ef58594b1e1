"""The worked example (examples/transcripts_pipeline.py) must run
end-to-end on testdata — the reference repo ships examples/ and a
notebook; this is the Spark-native analog, kept green by CI.

Subprocess on purpose: the example owns its SparkSession lifecycle
(get_spark + stop), which must not tear down the shared test session.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_example_runs_end_to_end():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "transcripts_pipeline.py")],
        capture_output=True,
        text=True,
        timeout=900,  # generous: host contention once hit 420 s
        
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    assert "prep rows = 1000, bake rows = 1000" in out
    assert "survivors" in out
    assert "recall@3 vs brute tier:" in out
    # the advisor line printed real params
    assert "'n_planes':" in out


def test_webcorpus_example_runs_end_to_end():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "webcorpus_pipeline.py")],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    assert "== ingest == 40 archives -> 200 documents" in out
    assert "== packing ==" in out and "sequences of 64" in out
