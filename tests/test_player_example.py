"""The SDL player example runs headless (reference: examples/dav1dplay.c)."""
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent
STREAM = Path(__file__).parent / "streams" / "inter_basic.ivf"


def test_player_headless_decodes():
    pytest.importorskip("pygame")
    r = subprocess.run(
        [sys.executable, str(ROOT / "examples" / "player.py"),
         str(STREAM), "--null", "--untimed", "--frames", "3"],
        capture_output=True, text=True, timeout=180)
    assert r.returncode == 0, r.stderr
    assert "played" in r.stderr
