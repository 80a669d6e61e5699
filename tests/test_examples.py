"""Smoke tests for the bundled runnable examples."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_examples_run():
    """Smoke test: the bundled examples execute end to end (CPU)."""
    import subprocess
    import sys

    for cmd in (
        [sys.executable, "examples/serving_pipeline.py", "--platform", "cpu"],
        [sys.executable, "examples/sharded_decode.py", "4"],
        [sys.executable, "examples/mixed_corpus_serving.py", "4"],
    ):
        r = subprocess.run(cmd, cwd=REPO, capture_output=True,
                           text=True, timeout=240)
        assert r.returncode == 0, (cmd, r.stdout[-800:], r.stderr[-800:])
