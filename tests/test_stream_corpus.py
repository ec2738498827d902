"""Checked-in smoke streams decode to their recorded reference md5s
(quick CLI verification corpus; regenerate with tools_dev/gen_streams)."""
import os
import subprocess
import sys

import pytest

STREAMS = os.path.join(os.path.dirname(__file__), "streams")


def _entries():
    with open(os.path.join(STREAMS, "md5.txt")) as f:
        return [line.split() for line in f.read().splitlines() if line]


@pytest.mark.parametrize("md5,name", _entries())
def test_corpus_stream_verifies(md5, name):
    r = subprocess.run(
        [sys.executable, "-m", "dav1d_mirror_tpu.cli",
         "-i", os.path.join(STREAMS, name), "--verify", md5, "-o", "-",
         "-q"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.join(os.path.dirname(__file__), os.pardir))
    assert r.returncode == 0, r.stderr
