"""docs/api.md stays in sync with the live docstrings."""
import subprocess
import sys


def test_api_docs_current():
    rc = subprocess.run(
        [sys.executable, "scripts/build_api_docs.py", "--check"],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stdout + rc.stderr
