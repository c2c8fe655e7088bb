"""Golden E2E tests (reference tier 3: tools/test-e2e.py + test-data)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_golden_e2e_harness():
    result = subprocess.run(
        [sys.executable, str(REPO / "tools" / "test_e2e.py")],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert result.returncode == 0, f"stdout:\n{result.stdout}\nstderr:\n{result.stderr}"
    assert "all golden tests passed" in result.stdout
