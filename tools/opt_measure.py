"""Optimization measurement loop (guide §1) — r14 plans dir.

Isolated per-query timing with the noop sink + formatted-plan capture,
so every before/after claim in OPTIMIZATION_r14.md is backed by a
committed artifact under plans/r14/.

Usage:
    python tools/opt_measure.py [sf_dir] --reps 3 [--tag before|after] q1 q2 ...

Per query: warmup run (untimed), then median-of-reps with the noop
sink (bench methodology), plus `.explain("formatted")` written to
plans/r14/<query>_<tag>.txt when --tag is given. Prints one JSON line
with {query: {"sec": median, "exchanges": n, "plan_file": path}}.
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import exec_with_timeout, make_cleanup, warmup  # noqa: E402
from eventstream_notify_spark.plans.explain import plan_str  # noqa: E402
from eventstream_notify_spark.registry import queries  # noqa: E402
from eventstream_notify_spark.session import get_spark  # noqa: E402

PLANS_DIR = Path(__file__).resolve().parent.parent / "plans" / "r14"


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif a == "--tag":
            tag = args[i + 1]
            i += 2
        elif "/" in a:
            sf_dir = a
            i += 1
        else:
            names.append(a)
            i += 1
    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    warmup(spark)
    cleanup = make_cleanup(spark)
    qs = queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"opt14: {name}")

        def one() -> object:
            d = fn(spark, sf_dir)
            d.write.format("noop").mode("overwrite").save()
            return d

        try:
            cleanup()
            df = exec_with_timeout(one, spark=spark)  # warm, untimed
            runs: list[float] = []
            for _ in range(reps):
                cleanup()
                t0 = time.time()
                exec_with_timeout(one, spark=spark)
                runs.append(time.time() - t0)
            runs.sort()
            plan = plan_str(df, "formatted")
            rec = {
                "sec": round(runs[len(runs) // 2], 3),
                "min": round(runs[0], 3),
                "exchanges": len(re.findall(r"\bExchange\b", plan)),
                "python_evals": len(
                    re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|"
                               r"FlatMapGroupsInPandas|MapInPandas", plan)
                ),
            }
            if tag:
                PLANS_DIR.mkdir(parents=True, exist_ok=True)
                p = PLANS_DIR / f"{name}_{tag}.txt"
                p.write_text(plan)
                rec["plan_file"] = str(p.relative_to(PLANS_DIR.parent.parent))
            out[name] = rec
        except Exception as e:  # noqa: BLE001 — record and continue
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        finally:
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}))


if __name__ == "__main__":
    main()
