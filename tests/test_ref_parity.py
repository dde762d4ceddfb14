"""C-reference parity harness wrapper (VERDICT round-1 item 3).

Builds the unmodified reference engine from /root/reference and asserts
mechanical agreement (capture/escape sweep, orbit table, time dilation)
via tools/ref_parity.py.  Skipped when the reference tree or a C
compiler is unavailable.
"""

import os
import shutil
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

import ref_parity  # noqa: E402


@pytest.mark.skipif(
    not os.path.isdir(ref_parity.REF) or shutil.which("gcc") is None,
    reason="reference sources or gcc unavailable",
)
def test_reference_parity(tmp_path):
    rc = ref_parity.main([
        "--n-sweep", "24",
        "--n-bench", "256",
        "--out", str(tmp_path / "ref_baseline.json"),
    ])
    assert rc == 0
