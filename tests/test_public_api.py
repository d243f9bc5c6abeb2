"""Public package surface (VERDICT r10 #8): the documented imports
work from the package root, and the README Quickstart runs VERBATIM —
the test extracts the fenced code block from README.md and executes
it, so the documented example cannot rot."""

from __future__ import annotations

import re
from pathlib import Path

README = Path(__file__).resolve().parent.parent / "README.md"


def test_root_imports_are_lazy_and_complete():
    import importlib
    import sys

    for m in list(sys.modules):
        if m.startswith("eventstream_notify_spark"):
            del sys.modules[m]
    pkg = importlib.import_module("eventstream_notify_spark")
    # importing the root must NOT pull the operator modules (lazy)
    assert "eventstream_notify_spark.operators.text" not in sys.modules
    for name in pkg.__all__:
        assert getattr(pkg, name) is not None, name
    assert "queries" in dir(pkg) and "get_spark" in dir(pkg)
    # the registry export is the real one
    assert "pipeline_e2e" in pkg.queries()


def test_readme_quickstart_runs_verbatim(spark):
    text = README.read_text()
    m = re.search(r"## Quickstart\n\n```python\n(.*?)```", text, re.S)
    assert m, "README has no fenced Quickstart block"
    code = m.group(1)
    # run against the session fixture (get_spark() returns the same
    # singleton via getOrCreate, so the example's own call is honest)
    exec(compile(code, "README.md#quickstart", "exec"), {})
