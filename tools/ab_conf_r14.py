"""A/B a session conf across queries() entries (round-14 optimization).

Usage:
  python tools/ab_conf_r14.py "k=v[,k=v...]" name [name...]

Runs each named entry noop-sink best-of-3 (after one warm run) in ONE
JVM built with the given conf overrides; run once with and once without
the override (separate invocations = separate JVMs) and diff.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    conf_arg, names = sys.argv[1], sys.argv[2:]
    extra = {}
    if conf_arg not in ("-", ""):
        for kv in conf_arg.split(","):
            k, v = kv.split("=", 1)
            extra[k] = v

    import __spark_entry__ as entrymod
    from querysight_spark.extension_queries import ANN_BENCH
    from querysight_spark.session import get_spark

    spark = get_spark(app_name="qs-ab-r14", extra_conf=extra)
    qs = entrymod.queries()
    qs["p01_scan_filter_project"](spark, SF_DIR).count()

    out = {}
    for name in names:
        if name in ANN_BENCH:
            prepare, fn = ANN_BENCH[name]
            prepare(spark, SF_DIR)
        else:
            fn = qs[name]

        def run():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        run()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print("AB " + json.dumps({"conf": extra, "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
