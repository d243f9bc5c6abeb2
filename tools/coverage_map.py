"""Generate the operator coverage map from the registry itself —
SURVEY.md's hand-kept tables drift; this table cannot.

Usage:
    python tools/coverage_map.py > COVERAGE.md

One row per registered query: name, contract-vs-extra, implementation
site (module:line from the builder's code object), and verification
mode (DuckDB-oracle-paired vs rows-only).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eventstream_notify_spark.registry import registered  # noqa: E402


def main() -> None:
    rows = []
    for name, reg in sorted(registered().items()):
        code = reg.fn.__code__
        mod = str(
            Path(code.co_filename).relative_to(
                Path(__file__).resolve().parent.parent
            )
        )
        rows.append(
            (
                name,
                "contract" if not name.startswith("zx_") else "extra",
                f"`{mod}:{code.co_firstlineno}`",
                "oracle" if reg.oracle else "rows-only",
            )
        )
    n_oracle = sum(1 for r in rows if r[3] == "oracle")
    n_contract = sum(1 for r in rows if r[1] == "contract")
    print("# Coverage map (generated — do not hand-edit)")
    print()
    print(f"Regenerate with `python tools/coverage_map.py > COVERAGE.md`.")
    print()
    print(
        f"**{len(rows)} registered queries** — {n_contract} contract + "
        f"{len(rows) - n_contract} extras; {n_oracle} DuckDB-oracle-paired, "
        f"{len(rows) - n_oracle} rows-only by design."
    )
    print()
    print("| query | tier | implementation | verification |")
    print("|---|---|---|---|")
    for name, tier, site, ver in rows:
        print(f"| `{name}` | {tier} | {site} | {ver} |")


if __name__ == "__main__":
    main()
