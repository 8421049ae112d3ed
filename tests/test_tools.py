"""Pure-python tests for the benchmark tooling (no SparkSession)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from scaling_bench import replace_section  # noqa: E402

M1 = "\n## Measured (scaling protocol)\n"
M2 = "\n## Measured (local-cluster experiment)\n"


def test_replace_section_appends_when_absent():
    out = replace_section("# Title\nbody\n", M1, M1 + "\nv1\n")
    assert out == "# Title\nbody\n" + M1 + "\nv1\n"


def test_replace_section_preserves_following_section():
    content = "# Title\n" + M1 + "\nold scaling\n" + M2 + "\ncluster data\n"
    out = replace_section(content, M1, M1 + "\nnew scaling\n")
    assert "old scaling" not in out
    assert "new scaling" in out
    assert "cluster data" in out  # the sibling section survives
    # and the sibling replaces cleanly too
    out2 = replace_section(out, M2, M2 + "\nnew cluster\n")
    assert "new scaling" in out2 and "new cluster" in out2
    assert "cluster data" not in out2


def test_replace_section_replaces_tail_section():
    content = "# Title\n" + M1 + "\nold tail\n"
    out = replace_section(content, M1, M1 + "\nnew tail\n")
    assert out == "# Title\n" + M1 + "\nnew tail\n"
