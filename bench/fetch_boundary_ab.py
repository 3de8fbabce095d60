#!/usr/bin/env python
"""A/B the fetch stage's Python boundary (guide §4): where do the
~7.6s beyond raw extract CPU go?

Variants over the same joined hits (pages x broadcast batch, ~120k
rows of ~30KB html), each noop-sunk:
  a join-only        scan + broadcast join, octet_length(html)
  b pandas-extract   current path (pandas_udf -> struct(text, links))
  c pandas-noop      same UDF shape, returns ('', []) without reading
                     html -> isolates the html IN transfer + udf
                     scaffolding from compute + output transfer
  d arrow-extract    mapInArrow prototype: pyarrow-native batches,
                     outputs built with pa.array (no pandas layer)

Uses the pages parquet left by bench_extra.py (BENCH_WORKDIR).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORKDIR = os.environ.get(
    "BENCH_WORKDIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bench_extra"),
)


def main():
    from pompspark.session import build_spark

    spark = build_spark(
        f"local[{CPUS}]", app_name="fetch-boundary-ab",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    pages = spark.read.parquet(os.path.join(WORKDIR, "pages"))
    # deterministic ~120k-url batch
    batch = (
        pages.select("url")
        .filter(F.pmod(F.xxhash64("url"), F.lit(8)) == 0)
        .limit(120_000)
    ).persist()
    n = batch.count()
    print(f"batch rows: {n}", flush=True)

    hits = pages.select("url", "warc_ts", "html").join(
        F.broadcast(batch.select(F.col("url").alias("__b_url"))),
        F.col("url") == F.col("__b_url"), "inner",
    ).drop("__b_url")

    def run(df, label):
        # warm + 2 timed
        walls = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{label}#{i}")
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        print(f"  {label}: warm={walls[0]} timed={walls[1:]}", flush=True)

    # a) join-only
    run(hits.select(F.octet_length("html").alias("nb")), "a:join-only")

    # b) current pandas_udf extract
    from pompspark.extract import register_extract_udf

    ext = register_extract_udf()
    b = hits.withColumn("e", ext("html")).select(
        "url", "warc_ts", F.col("e.text").alias("text"),
        F.col("e.links").alias("links"),
    )
    run(b, "b:pandas-extract")

    # c) pandas_udf that never touches html (transfer + scaffolding)
    @F.pandas_udf("text string, links array<string>")
    def ext_noop(html: pd.Series) -> pd.DataFrame:
        k = len(html)
        return pd.DataFrame({"text": [""] * k, "links": [[]] * k})

    c = hits.withColumn("e", ext_noop("html")).select(
        "url", "warc_ts", F.col("e.text").alias("text"),
        F.col("e.links").alias("links"),
    )
    run(c, "c:pandas-noop")

    # d) mapInArrow extract, pyarrow-native output
    import pyarrow as pa

    from pompspark.extract import ref_extract

    in_d = hits.select("url", "warc_ts", "html")
    out_schema = "url string, warc_ts timestamp, text string, links array<string>"

    def gen(batches):
        for rb in batches:
            texts, links = [], []
            for h in rb.column("html"):
                t, l = ref_extract(h.as_py())
                texts.append(t)
                links.append(l)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("url"), rb.column("warc_ts"),
                    pa.array(texts, type=pa.string()),
                    pa.array(links, type=pa.list_(pa.string())),
                ],
                names=["url", "warc_ts", "text", "links"],
            )

    run(in_d.mapInArrow(gen, schema=out_schema), "d:arrow-extract")
    spark.stop()


if __name__ == "__main__":
    main()
