"""sources/parquet.write_parquet_partitioned: hive layout + resume skip."""

import os
import shutil

import pandas as pd

import ray.data as rd

from session_graph_ray.sources.parquet import (
    read_parquet_clean,
    write_parquet_partitioned,
)

OUT = "/tmp/sgr_test_part_sink"


def _df():
    return pd.DataFrame(
        {
            "lang": ["en"] * 40 + ["fr"] * 30 + ["de"] * 20,
            "doc_id": range(90),
            "n": [i * 3 for i in range(90)],
        }
    )


def test_partitioned_write_and_resume():
    shutil.rmtree(OUT, ignore_errors=True)
    written = write_parquet_partitioned(
        rd.from_pandas(_df()).repartition(4), OUT, "lang"
    )
    assert written == ["de", "en", "fr"]
    assert sorted(d for d in os.listdir(OUT) if d.startswith("lang=")) == [
        "lang=de", "lang=en", "lang=fr",
    ]
    back = read_parquet_clean(OUT).to_pandas()
    assert len(back) == 90
    assert sorted(back["doc_id"]) == list(range(90))

    # resume: drop one partition, rewrite with skip_existing -> only the
    # missing partition is written (the others' rows are filtered out)
    shutil.rmtree(os.path.join(OUT, "lang=fr"))
    before = {
        d: max(os.path.getmtime(os.path.join(OUT, d, f))
               for f in os.listdir(os.path.join(OUT, d)))
        for d in ("lang=de", "lang=en")
    }
    written2 = write_parquet_partitioned(
        rd.from_pandas(_df()).repartition(4), OUT, "lang", skip_existing=True
    )
    assert written2 == ["fr"]
    for d, mt in before.items():
        assert max(
            os.path.getmtime(os.path.join(OUT, d, f))
            for f in os.listdir(os.path.join(OUT, d))
        ) == mt  # untouched
    back2 = read_parquet_clean(OUT).to_pandas()
    assert len(back2) == 90

    # fully-written output + skip_existing -> no-op
    assert write_parquet_partitioned(
        rd.from_pandas(_df()), OUT, "lang", skip_existing=True
    ) == []
