"""mm11 stage split under bench's exact harness context (r12 ask #4).

Replicates bench.py's v4 child process (get_spark, p01 warmup,
calibration probe) then times: the calibration, mm11 as shipped
(cold + best-of-3), the synth encode alone, the image-stats branch
alone (single encode + decode, no empty-audio second execution), and
the empty audio branch alone.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, n=3):
    cold = None
    best = float("inf")
    for _ in range(n + 1):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if cold is None:
            cold = dt
        else:
            best = min(best, dt)
    return round(cold, 3), round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    import __spark_entry__ as entrymod
    from querysight_spark.session import get_spark

    spark = get_spark(app_name="mm11-stage-split")
    qs = entrymod.queries()
    qs["p01_scan_filter_project"](spark, sf_dir).count()

    def cal():
        spark.range(0, 1 << 28, 1, 64).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).collect()

    _c, cal_best = _timed(cal)
    print(json.dumps({"calibration_sec": cal_best}))

    cold, best = _timed(lambda: qs["mm11_progressive_jpeg_stats"](spark, sf_dir).count())
    print(json.dumps({"mm11_as_shipped": {"cold": cold, "best": best}}))

    from pyspark.sql import functions as F

    from querysight_spark.operators import multimodal as M
    from querysight_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") % 2 == 0)

    cold, best = _timed(
        lambda: M.synth_media_corpus(docs, image_format="jpeg_progressive")
        .select(F.sum(F.length("payload"))).collect()
    )
    print(json.dumps({"encode_only": {"cold": cold, "best": best}}))

    media = M.synth_media_corpus(docs, image_format="jpeg_progressive")
    img_branch = (
        media.where(F.col("media_type") == "image")
        .select("asset_id", "payload")
        .mapInPandas(
            _run_images_clone(M), schema=M._IMG_STATS_SCHEMA
        )
    )
    cold, best = _timed(lambda: img_branch.count())
    print(json.dumps({"image_branch_only": {"cold": cold, "best": best}}))

    aud_branch = media.where(F.col("media_type") == "audio").select("asset_id")
    cold, best = _timed(lambda: aud_branch.count())
    print(json.dumps({"audio_branch_scan_only": {"cold": cold, "best": best}}))

    full = M.payload_stats(media)
    cold, best = _timed(lambda: full.count())
    print(json.dumps({"payload_stats_no_orderby": {"cold": cold, "best": best}}))

    spark.stop()


def _run_images_clone(M):
    import pandas as pd

    def run_images(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, arr = M.decode_image(bytes(payload))
                rows.append((aid, w, h) + M._int_stats(arr.ravel()))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height"] + M._STATS_COLS[1:],
            )

    return run_images


if __name__ == "__main__":
    main()
