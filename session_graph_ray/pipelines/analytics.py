"""Report/analytics pipelines over the TPC-H-ish testdata tables.

Parity targets: the reference's SPARQL analytics surface (SURVEY.md §2.7 A8 —
grouped counts, distinct-counts, top-k hubs, cross-source overlap) expressed
as Ray Data ``groupby/aggregate/sort/limit`` pipelines, plus the classic
filter/join/aggregate shapes.

Numeric-output contract (driver value-hash safety): money/quantity outputs
are **integer cents** computed per row as ``floor(x * 100 + 0.5)`` before
summing. The identical expression runs in the DuckDB oracle, so both sides
sum exactly the same int64s — no float-summation-order hazards.

Reads prune columns at the source (``read_parquet(columns=[...])``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from ..ops.join import broadcast_join, hash_join
from ..sources.parquet import read_parquet_clean as _rp


def _cents(col) -> pa.Array:
    """floor(x*100 + 0.5) as int64 — the shared Ray/SQL rounding contract."""
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64())


def q_pricing_summary(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q1 shape: scan-heavy filter + grouped aggregate (2 keys)."""
    ds = _rp(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": _cents(t["l_quantity"]),
                "base_price_c": _cents(t["l_extendedprice"]),
                "disc_price_c": _cents(disc_price),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_c"),
            Sum("base_price_c", alias_name="sum_base_price_c"),
            Sum("disc_price_c", alias_name="sum_disc_price_c"),
            Count(alias_name="count_order"),
        )
    )


def q_revenue_filter(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q6 shape: tight predicate + single global sum."""
    ds = _rp(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                        pc.less_equal(t["l_discount"], pa.scalar(0.07))),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(mask)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.table({"revenue_c": _cents(rev)})

    agg = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536).aggregate(
        Sum("revenue_c", alias_name="revenue_c")
    )
    # Dataset.aggregate returns a plain row for global aggregates
    return pd.DataFrame([{"revenue_c": np.int64(agg["revenue_c"])}])


def q_top_customers(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Pre-aggregate orders per customer (partial before shuffle), broadcast
    the small customer dim onto the aggregate, global top-k."""
    orders = _rp(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t["o_custkey"], "price_c": _cents(t["o_totalprice"])}
        )

    per_cust = (
        orders.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("o_custkey")
        .aggregate(Sum("price_c", alias_name="total_spent_c"),
                   Count(alias_name="n_orders"))
    )
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    named = broadcast_join(per_cust, cust, left_on="o_custkey", right_on="c_custkey")
    top = named.sort(["total_spent_c", "o_custkey"], descending=[True, False]).limit(k)
    return top.to_pandas()[["c_custkey", "c_name", "total_spent_c", "n_orders"]]


def q_region_sales(sf_dir: str) -> "rd.Dataset":
    """Star join via broadcast dims: orders -> customer -> nation -> region."""
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_regionkey"])
    region = pd.read_parquet(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"])
    dim = (
        cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )[["c_custkey", "r_name"]]

    orders = _rp(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t["o_custkey"], "price_c": _cents(t["o_totalprice"])}
        )

    return (
        broadcast_join(
            orders.map_batches(prep, batch_format="pyarrow", batch_size=65536),
            dim, left_on="o_custkey", right_on="c_custkey",
        )
        .groupby("r_name")
        .aggregate(Sum("price_c", alias_name="total_sales_c"),
                   Count(alias_name="n_orders"))
    )


def q_part_brand_volume(sf_dir: str) -> "rd.Dataset":
    """Large-large hash join (lineitem x part) + grouped aggregate."""
    li = _rp(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": t["l_partkey"], "qty_c": _cents(t["l_quantity"])})

    part = _rp(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    joined = hash_join(
        li.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        part, on="l_partkey", right_on="p_partkey",
    )
    return joined.groupby("p_brand").aggregate(
        Sum("qty_c", alias_name="sum_qty_c"), Count(alias_name="n_items")
    )


def q_event_type_users(sf_dir: str) -> "rd.Dataset":
    """Exact count-distinct via two-level groupby (no driver-side sets)."""
    ev = _rp(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    per_pair = ev.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="n_events_pair")
    )
    return per_pair.groupby("event_type").aggregate(
        Count(alias_name="n_users"), Sum("n_events_pair", alias_name="n_events")
    )


def q_events_daily(sf_dir: str) -> "rd.Dataset":
    """Tumbling calendar-day aggregate (GROUP BY day, type)."""
    ev = _rp(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        return pa.table(
            {"day": day, "event_type": t["event_type"], "value_c": _cents(t["value"])}
        )

    return (
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="sum_value_c"))
    )


def q_sessionize_users(sf_dir: str, gap_minutes: int = 30) -> "rd.Dataset":
    from ..ops.sessionize import sessionize_counts

    ev = _rp(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return sessionize_counts(ev, gap_minutes=gap_minutes)


def q_doc_token_stats(sf_dir: str) -> "rd.Dataset":
    """Per-language integer token/char totals over documents."""
    docs = _rp(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])

    def prep(t: pa.Table) -> pa.Table:
        from ..ops.textstats import token_count_column

        return pa.table(
            {
                "lang": t["lang"],
                "n_tokens": token_count_column(t["text"]),
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    return (
        docs.map_batches(prep, batch_format="pyarrow", batch_size=8192)
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_tokens", alias_name="sum_tokens"),
                   Sum("n_chars", alias_name="sum_chars"))
    )


def q_doc_substring(sf_dir: str, needle: str = "the") -> "rd.Dataset":
    """Vectorized substring filter + grouped count (regex/LIKE parity)."""
    docs = _rp(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def prep(t: pa.Table) -> pa.Table:
        return t.filter(pc.match_substring(t["text"], needle))

    return (
        docs.map_batches(prep, batch_format="pyarrow", batch_size=8192)
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
    )


def q_exact_dedup_docs(sf_dir: str) -> "rd.Dataset":
    from ..ops.dedup import exact_dedup_survivors

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup_survivors(docs)


def q_knn_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 5) -> "rd.Dataset":
    """Brute-force cosine top-k for the first n_queries vectors."""
    from ..ops.similarity import brute_force_topk

    emb = _rp(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir, n_queries)
    out = brute_force_topk(emb, queries, qids, k=k)
    return out.select_columns(["query_id", "vec_id"])


def q_knn_graph(sf_dir: str, k: int = 5) -> "rd.Dataset":
    """k-NN graph over the WHOLE embeddings table — all-pairs top-k per row,
    the primitive behind SemDeDup-style clustering and embedding near-dedup.
    At this scale the size gate picks the exact broadcast plan; at 10^12 rows
    the same call routes through the IVF-bucketed plan (ops/similarity.py).
    ``nn_rank`` is pinned by pytest against a numpy reference; the oracle
    hashes the (vec_id, neighbor_id) edge set (float-rank ties are not part
    of the cross-engine contract, same as ``knn_bruteforce``)."""
    from ..ops.similarity import knn_graph

    emb = _rp(f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"])
    return knn_graph(emb, k=k).select_columns(["vec_id", "neighbor_id"])


def _query_vectors(sf_dir: str, n_queries: int):
    """The first n query vectors via parquet predicate pushdown (row-group
    pruning at the read — round-1's per-row ``ds.filter(lambda)`` full scan
    is exactly the anti-pattern this replaces)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    ).sort_by("vec_id")
    queries = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    return queries, [int(x) for x in t.column("vec_id").to_pylist()]


def q_order_priorities(sf_dir: str) -> "rd.Dataset":
    """Simple grouped count with min/max aggregates over timestamps."""
    from ray.data.aggregate import Max, Min

    orders = _rp(f"{sf_dir}/orders.parquet",
                             columns=["o_orderpriority", "o_orderdate"])
    return orders.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders"),
        Min("o_orderdate", alias_name="first_date"),
        Max("o_orderdate", alias_name="last_date"),
    )


def q_supplier_nation(sf_dir: str) -> "rd.Dataset":
    """Broadcast dim join + grouped aggregate over the supplier table."""
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    sup = _rp(f"{sf_dir}/supplier.parquet",
                          columns=["s_nationkey", "s_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s_nationkey": pc.cast(t["s_nationkey"], pa.int32()),
             "acctbal_c": _cents(t["s_acctbal"])}
        )

    return (
        broadcast_join(
            sup.map_batches(prep, batch_format="pyarrow"),
            nation, left_on="s_nationkey", right_on="n_nationkey",
        )
        .groupby("n_name")
        .aggregate(Count(alias_name="n_suppliers"),
                   Sum("acctbal_c", alias_name="sum_acctbal_c"))
    )


def q_events_anti_join(sf_dir: str) -> pd.DataFrame:
    """Anti-join via broadcast key set (the reference's cache-miss pattern,
    /root/reference/pipeline/link_entities.py:604-641): events whose user has
    no customer record."""
    import ray

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    keys = np.sort(cust["c_custkey"].to_numpy())
    kref = ray.put(keys)

    ev = _rp(f"{sf_dir}/events.parquet", columns=["user_id"])

    def anti(t: pa.Table) -> pa.Table:
        import ray as _r

        ks = _r.get(kref)
        uid = t.column("user_id").to_numpy()
        mask = ~np.isin(uid, ks)
        return pa.table({"user_id": pa.array(uid[mask], pa.int64())})

    n = (
        ev.map_batches(anti, batch_format="pyarrow", batch_size=65536)
        .count()
    )
    return pd.DataFrame([{"n_orphan_events": np.int64(n)}])


def q_top_users_per_type(sf_dir: str, k: int = 3) -> "rd.Dataset":
    """Grouped top-k (the reference's hub-entity analytics, SURVEY.md A8/O7):
    per event type, the k most active users; ties broken by user_id."""
    ev = _rp(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    counts = ev.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="n_events")
    )

    def topk(g: pd.DataFrame):
        from ..ops.util import pd_to_arrow

        g = g.sort_values(["n_events", "user_id"], ascending=[False, True]).head(k)
        return pd_to_arrow(g[["event_type", "user_id", "n_events"]])

    return counts.groupby("event_type").map_groups(topk, batch_format="pandas")


def q_top_user_type_revenue(sf_dir: str) -> "rd.Dataset":
    """Composite-key (event_type, user_id) shuffle join: events against the
    derived per-type top-3-user table, then revenue per (type, top user).
    Demonstrates the multi-column equi-join path (ops/join.composite_key →
    bucket_join); at this dim size a broadcast merge would win, but the
    composite bucketed form is the shape that survives a dim table too big
    for one worker heap."""
    from ..ops.join import bucket_join, composite_key
    from ..ops.util import pd_to_arrow

    top = q_top_users_per_type(sf_dir).drop_columns(["n_events"])
    top = composite_key(
        rename_top(top), ["t_event_type", "t_user_id"], "__rck"
    )

    ev = _rp(f"{sf_dir}/events.parquet",
             columns=["event_type", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "user_id": t["user_id"],
                "value_c": _cents(t["value"]),
            }
        )

    ev = composite_key(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        ["event_type", "user_id"], "__ck",
    )
    joined = bucket_join(
        ev, top, left_on="__ck", right_on="__rck",
        left_schema=pa.schema(
            [("event_type", pa.string()), ("user_id", pa.int64()),
             ("value_c", pa.int64()), ("__ck", pa.string())]
        ),
        right_schema=pa.schema(
            [("t_event_type", pa.string()), ("t_user_id", pa.int64()),
             ("__rck", pa.string())]
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["event_type", "user_id", "value_c"]).to_pandas()
        agg = df.groupby(["event_type", "user_id"], as_index=False).agg(
            revenue_c=("value_c", "sum")
        )
        return pd_to_arrow(agg)

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
    )


def rename_top(top: "rd.Dataset") -> "rd.Dataset":
    from ..ops.join import rename_batches

    return rename_batches(
        top, {"event_type": "t_event_type", "user_id": "t_user_id"}
    )


def q_union_sources(sf_dir: str) -> "rd.Dataset":
    """Dataset.union of per-source subsets then one aggregate (the reference's
    union of per-platform graphs, SURVEY.md D4 / README.md:138)."""
    docs = _rp(f"{sf_dir}/documents.parquet", columns=["lang", "source"])

    def pick(langs):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["lang"], value_set=pa.array(langs)))

        return f

    en = docs.map_batches(pick(["en"]), batch_format="pyarrow")
    fr_de = docs.map_batches(pick(["fr", "de"]), batch_format="pyarrow")
    return en.union(fr_de).groupby("source").aggregate(Count(alias_name="n_docs"))


def q_docs_from_jsonl(sf_dir: str) -> "rd.Dataset":
    """JSONL source reader (reference S1, /root/reference/pipeline/
    jsonl_to_rdf.py:59-77): documents round-tripped through line-delimited
    JSON in /tmp, then read with ray.data.read_json and aggregated."""
    import hashlib
    import json
    import os

    src = f"{sf_dir}/documents.parquet"
    tag = hashlib.sha256(src.encode()).hexdigest()[:12]
    jdir = f"/tmp/sgr_jsonl/{tag}"
    if not os.path.isdir(jdir):
        os.makedirs(jdir, exist_ok=True)
        df = pd.read_parquet(src, columns=["doc_id", "lang", "n_chars"])
        with open(f"{jdir}/docs.jsonl", "w") as f:
            for r in df.itertuples(index=False):
                f.write(json.dumps(
                    {"doc_id": int(r.doc_id), "lang": r.lang,
                     "n_chars": int(r.n_chars)}) + "\n")
    ds = rd.read_json(jdir)
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )


def q_events_sliding_window(sf_dir: str, window_rows: int = 3) -> "rd.Dataset":
    """Sliding-window aggregate over a keyed stream (custom windowed
    operator): per event type, ordered by day, the moving sum of daily value
    totals over the current + 2 preceding days-with-data (SQL ROWS frame)."""
    from ..ops.window import sliding_rows_sum

    daily = q_events_daily(sf_dir).select_columns(["event_type", "day", "sum_value_c"])
    return sliding_rows_sum(
        daily, key="event_type", order="day", value="sum_value_c",
        window_rows=window_rows, out_col="sum3_c",
    )


class _JsonKExtractor:
    """Actor-pool JSON-field extractor: one DuckDB connection per actor
    (T1 house pattern), ONE vectorized ``json_extract_string`` projection
    per batch — no per-row ``json.loads`` (VERDICT r2 #10). A malformed or
    null blob contributes null, never a task failure (M10 discipline:
    ``json_valid`` gate + ``try_cast``)."""

    def __init__(self):
        import duckdb

        self.con = duckdb.connect()
        self.con.execute("SET threads TO 1")

    def __call__(self, t: pa.Table) -> pa.Table:
        self.con.register("b", t)
        out = self.con.execute(
            """SELECT event_type,
                      CASE WHEN json_valid(props)
                           THEN try_cast(json_extract_string(props, '$.k')
                                         AS BIGINT) END AS k
               FROM b"""
        ).arrow()
        self.con.unregister("b")
        return out


def q_event_props_stats(sf_dir: str) -> "rd.Dataset":
    """JSON-blob field extraction (reference M4: Warp stores JSON inside SQL
    columns and the reader parses ``input`` JSON per row,
    ``/root/reference/pipeline/warp_to_rdf.py:89-112``): extract ``$.k``
    with the same DuckDB expression the oracle runs (parity by
    construction), grouped aggregate."""
    ev = _rp(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    return (
        ev.map_batches(_JsonKExtractor, batch_format="pyarrow",
                       batch_size=65536, concurrency=2, num_cpus=1)
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
    )


def q_doc_char_jaccard(sf_dir: str, n_docs: int = 100) -> "rd.Dataset":
    """String-similarity kernel parity check: character-set Jaccard between
    consecutive documents (oracle: DuckDB's ``jaccard`` function). The join
    is the generic consecutive-id self-join shape (reference J1 analog,
    parent-message resolution); the similarity runs per row in the batch.
    Output is micro-units (floor(j*1e6+0.5)) — the integer value-hash
    contract."""
    from ..ops.join import bucket_join, rename_batches

    docs = _rp(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def head_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["doc_id"], pa.scalar(n_docs)))

    head = docs.map_batches(head_filter, batch_format="pyarrow")
    a = rename_batches(head, {"text": "text_a"})
    b = head.map_batches(
        lambda t: pa.table(
            {"k2": pc.subtract(t["doc_id"], pa.scalar(1)), "text_b": t["text"]}
        ),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        a, b, left_on="doc_id", right_on="k2",
        left_schema=pa.schema([("doc_id", pa.int64()), ("text_a", pa.string())]),
        right_schema=pa.schema([("k2", pa.int64()), ("text_b", pa.string())]),
    )

    def jacc(t: pa.Table) -> pa.Table:
        ta = t.column("text_a").to_pylist()
        tb = t.column("text_b").to_pylist()
        out = []
        for x, y in zip(ta, tb):
            # byte-set Jaccard — exactly DuckDB's jaccard() semantics
            # (UTF-8 byte sets, case-sensitive, multiset-collapsed)
            sa, sb = set((x or "").encode()), set((y or "").encode())
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 1.0
            out.append(int(np.floor(j * 1_000_000 + 0.5)))
        return pa.table(
            {"doc_id": t["doc_id"], "jacc_u": pa.array(out, pa.int64())}
        )

    return joined.map_batches(jacc, batch_format="pyarrow")


def q_cross_source_langs(sf_dir: str) -> "rd.Dataset":
    """Cross-source overlap (reference A8: HAVING COUNT(DISTINCT ...) > 1,
    ``/root/reference/pipeline/sample_queries.sparql:141-152``): languages
    appearing in more than one source, via two-level groupby + filter."""
    docs = _rp(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
    per_pair = docs.groupby(["lang", "source"]).aggregate(Count(alias_name="n"))
    out = per_pair.groupby("lang").aggregate(Count(alias_name="n_sources"))
    return out.map_batches(
        lambda t: t.filter(pc.greater(t["n_sources"], pa.scalar(1))),
        batch_format="pyarrow",
    )


def _tag_of(path: str) -> str:
    """Cache key for /tmp fixture mirrors: includes the source file's size
    and mtime so a regenerated testdata file invalidates stale mirrors."""
    import hashlib
    import os

    st = os.stat(path)
    return hashlib.sha256(
        f"{path}|{st.st_size}|{int(st.st_mtime)}".encode()
    ).hexdigest()[:12]


def q_sql_source_events(sf_dir: str) -> "rd.Dataset":
    """SQLite source (reference S4, /root/reference/pipeline/warp_to_rdf.py:
    59-87): the events table mirrored into a SQLite database (fixture,
    cached), read back through the partitioned rowid-range reader, then a
    grouped aggregate — oracle-checked against the original parquet."""
    import os
    import sqlite3

    from ..sources.sqlite import read_sqlite_table

    src = f"{sf_dir}/events.parquet"
    db = f"/tmp/sgr_sqlite/{_tag_of(src)}/events.db"
    if not os.path.exists(db):
        os.makedirs(os.path.dirname(db), exist_ok=True)
        df = pd.read_parquet(src, columns=["event_id", "event_type", "user_id",
                                           "value"])
        tmp = db + ".tmp"
        con = sqlite3.connect(tmp)
        con.execute(
            "CREATE TABLE events (event_id INTEGER, event_type TEXT,"
            " user_id INTEGER, value REAL)"
        )
        con.executemany(
            "INSERT INTO events VALUES (?,?,?,?)",
            list(df.itertuples(index=False, name=None)),
        )
        con.commit()
        con.close()
        os.replace(tmp, db)

    ev = read_sqlite_table(db, "events",
                           columns=["event_type", "user_id", "value"],
                           n_partitions=8)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t["event_type"], "value_c": _cents(t["value"])}
        )

    return (
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(Count(alias_name="n_events"),
                   Sum("value_c", alias_name="sum_value_c"))
    )


def q_jsonl_roundtrip_quarantine(sf_dir: str) -> "rd.Dataset":
    """JSONL sink + robust re-read (reference K3 + S1/M10): documents written
    with ``Dataset.write_json``, malformed lines injected, read back through
    the quarantining reader — bad lines land in the error channel, clean
    rows aggregate to exactly the source truth."""
    import os

    from ..sources.jsonl import clean_rows, read_jsonl_robust, write_jsonl

    src = f"{sf_dir}/documents.parquet"
    jdir = f"/tmp/sgr_jsonl_rt/{_tag_of(src)}"
    if not os.path.isdir(jdir):
        tmp = jdir + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        docs = _rp(src, columns=["doc_id", "source", "n_chars"])
        write_jsonl(docs, tmp)
        with open(os.path.join(tmp, "bad-lines.jsonl"), "w") as f:
            f.write('{"doc_id": broken json\n')
            f.write("not json at all\n")
            f.write('[1, 2, 3]\n')
        os.replace(tmp, jdir)

    parsed = read_jsonl_robust(
        jdir,
        {"doc_id": pa.int64(), "source": pa.string(), "n_chars": pa.int64()},
    )
    return clean_rows(parsed).groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )


def q_event_users_concat(sf_dir: str, k: int = 5) -> "rd.Dataset":
    """Capped grouped collect + GROUP_CONCAT analog (reference J8/A8,
    /root/reference/pipeline/link_entities.py:437-493): per event type the k
    smallest distinct user ids joined into one string."""
    from ..ops.collect import string_agg

    ev = _rp(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return string_agg(ev, key="event_type", value="user_id", sep=",",
                      cap=k, distinct=True).map_batches(
        lambda t: t.rename_columns(["event_type", "users"]),
        batch_format="pyarrow",
    )


def q_conversation_tree(sf_dir: str, n_conversations: int = 50) -> "rd.Dataset":
    """ZIP-archive source + DFS tree flatten (reference S2/S3 + M2,
    /root/reference/pipeline/deepseek_to_rdf.py:41-63, 89-162): a synthetic
    conversation export built deterministically from the documents table
    (each doc becomes a 3-node root->child->grandchild chain whose fragments
    are fixed substrings), flattened to (conv_id, seq, role, frag) rows —
    oracle = UNION ALL of the same substrings in SQL."""
    import json
    import os
    import zipfile

    from ..sources.archives import read_zip_conversations

    src = f"{sf_dir}/documents.parquet"
    zdir = f"/tmp/sgr_zip/{_tag_of(src)}-{n_conversations}"
    zpath = f"{zdir}/conversations.zip"
    if not os.path.exists(zpath):
        os.makedirs(zdir, exist_ok=True)
        df = (
            pd.read_parquet(src, columns=["doc_id", "text"])
            .sort_values("doc_id")
            .head(n_conversations)
        )
        convs = []
        for r in df.itertuples(index=False):
            d = int(r.doc_id)
            text = r.text or ""
            convs.append(
                {
                    "id": d,
                    "mapping": {
                        f"{d}-0": {"parent": None, "children": [f"{d}-1"],
                                   "message": {"role": "user",
                                               "text": text[0:100]}},
                        f"{d}-1": {"parent": f"{d}-0", "children": [f"{d}-2"],
                                   "message": {"role": "assistant",
                                               "text": text[100:200]}},
                        f"{d}-2": {"parent": f"{d}-1", "children": [],
                                   "message": {"role": "user",
                                               "text": text[200:300]}},
                    },
                }
            )
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("conversations.json", json.dumps(convs))
        os.replace(tmp, zpath)

    out = read_zip_conversations(zpath)
    return out.map_batches(
        lambda t: t.select(["conv_id", "seq", "role", "text"])
                   .rename_columns(["conv_id", "seq", "role", "frag"]),
        batch_format="pyarrow",
    )


def q_events_asof_order(sf_dir: str) -> "rd.Dataset":
    """As-of temporal join: each event annotated with the customer's latest
    order date at-or-before the event timestamp (null when none precedes)."""
    from ..ops.asof import asof_join_backward

    ev = _rp(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    orders = _rp(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
    ts_us = pa.timestamp("us")
    return asof_join_backward(
        ev, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_out={"o_orderdate": "last_order_date"},
        left_schema=pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()), ("ts", ts_us)]
        ),
        right_schema=pa.schema(
            [("o_custkey", pa.int64()), ("o_orderdate", ts_us)]
        ),
    )


def q_event_value_quantiles(sf_dir: str) -> "rd.Dataset":
    """Exact discrete p50/p90/p99 of event value (cents) per event type,
    rank = ceil(q*n) — value-compressed before any exchange."""
    from ..ops.rank import grouped_quantile_disc

    ev = _rp(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"], "value_c": _cents(t["value"])})

    cents = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    return grouped_quantile_disc(
        cents, key="event_type", value="value_c",
        qs={"p50_c": 0.50, "p90_c": 0.90, "p99_c": 0.99},
    )


def q_doc_length_deciles(sf_dir: str) -> "rd.Dataset":
    """Window-rank: ntile(10) over (partition by lang order by n_chars,
    doc_id) via sort-free boundary selection (see ops/rank.py)."""
    from ..ops.rank import partitioned_ntile

    docs = _rp(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    return partitioned_ntile(
        docs, part="lang", order="n_chars", tiebreak="doc_id",
        n_tiles=10, out_col="decile",
    )


def q_snm_pairs(sf_dir: str) -> "rd.Dataset":
    """Sorted-neighborhood blocking over documents: every pair within a
    rank window of 10 under ORDER BY (n_chars, doc_id) — the classic
    windowed ER candidate generator (ops/snm.py; rank derivation is a
    constant-size histogram reduce + one bounded exchange, never a full
    sort materialization)."""
    from ..ops.snm import snm_pairs

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return snm_pairs(
        docs, order_col="n_chars", id_col="doc_id", window=10,
        id_a="doc_id_a", id_b="doc_id_b", dist_col="rank_dist",
    )


def q_tfidf_cosine_pairs(sf_dir: str) -> "rd.Dataset":
    """TF-IDF cosine candidate pairs over documents (ops/tfidf.py):
    rare-token blocking (2 <= df <= 25) then exact quantized-idf cosine
    >= 0.3 — all dot products integer-exact, no float reduction order."""
    from ..ops.tfidf import tfidf_cosine_pairs

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_cosine_pairs(docs, df_cap=25, threshold=0.3)


def q_cluster_pairwise_eval(sf_dir: str) -> "rd.Dataset":
    """Clustering-quality scorecard (ops/clustereval.py): the near-dedup
    clustering of documents evaluated against exact-content groups as the
    gold standard — pairwise precision/recall/F1 (the BASELINE.json
    acceptance metric as an operator) plus Adjusted Rand, all derived from
    exact contingency integers."""
    from ..ops.clustereval import exact_assignments, pairwise_cluster_eval
    from ..ops.dedup import near_dedup_assignments
    from ..ops.join import hash_join

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pred = near_dedup_assignments(docs, threshold=0.8)
    gold = exact_assignments(docs).map_batches(
        lambda t: t.rename_columns(["doc_id", "gold"]),
        batch_format="pyarrow",
    )
    joined = hash_join(pred, gold, on="doc_id")
    return pairwise_cluster_eval(joined, "canonical_doc_id", "gold")


def q_events_pivot(sf_dir: str) -> "rd.Dataset":
    """Long->wide pivot: per day, one summed-cents column per event type."""
    from ..ops.pivot import pivot_sum

    ev = _rp(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(t["ts"], unit="day"),
                "event_type": t["event_type"],
                "value_c": _cents(t["value"]),
            }
        )

    wide = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    return pivot_sum(
        wide, index_col="day", pivot_col="event_type", value_col="value_c",
        categories=["click", "error", "purchase", "signup", "view"],
    )


def q_events_in_order_windows(sf_dir: str, n_windows: int = 20) -> "rd.Dataset":
    """Range (containment) join: events falling inside 3-day windows opened
    by the first ``n_windows`` orders — broadcast interval set, zero shuffle
    of the fact table (ops/interval.py)."""
    from ..ops.interval import range_join_broadcast

    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).nsmallest(n_windows, "o_orderkey")
    # anchor windows inside the events epoch (orders predate the event log);
    # start offset is a deterministic function of the order key
    start = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        orders["o_orderkey"].to_numpy() % 28, unit="D"
    )
    iv = pd.DataFrame(
        {
            "win_id": orders["o_orderkey"].to_numpy(),
            "start": start,
            "end": start + pd.Timedelta(days=3),
        }
    )
    ev = _rp(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    return (
        range_join_broadcast(ev, "ts", iv)
        .groupby("win_id")
        .aggregate(Count(alias_name="n_events"))
    )


def q_shipping_priority(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """TPC-H Q3 shape: two selective filters, dim semi-join, fact pre-aggregate,
    broadcast enrich, global top-k. The lineitem revenue is pre-aggregated per
    orderkey inside each batch BEFORE the shuffle groupby (partial combine),
    and the filtered orders side rides along as a broadcast — the only
    all-to-all is the per-orderkey groupby of already-collapsed partials."""
    from ..ops.join import bucket_join

    cutoff = pa.scalar(np.datetime64("1995-03-15", "us"))

    # customer is the one true dim here: broadcast its qualifying key set.
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    building = np.sort(
        cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]
        .to_numpy(np.int64)
    )
    # orders is fact-sized: filter it DISTRIBUTEDLY (never a driver read),
    # keep only (o_orderkey, o_orderdate).
    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilter(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        hit = np.zeros(len(ck), bool)
        if len(building):
            idx = np.searchsorted(building, ck).clip(0, len(building) - 1)
            hit = building[idx] == ck
        t = t.filter(pa.array(hit & (
            t.column("o_orderdate").to_numpy(zero_copy_only=False)
            < np.datetime64("1995-03-15", "us"))))
        return t.select(["o_orderkey", "o_orderdate"])

    orders_f = orders.map_batches(ofilter, batch_format="pyarrow",
                                  batch_size=65536)

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        key = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        rev = _cents(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        ).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uk, pa.int64()),
            "rev_c": pa.array(np.bincount(inv, weights=rev).astype(np.int64)),
        })

    per_order = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_orderkey")
        .aggregate(Sum("rev_c", alias_name="revenue_c"))
    )
    # large-large equi-join on the shared orderkey partitioning — the only
    # all-to-all besides the per-orderkey groupby of collapsed partials.
    joined = bucket_join(
        per_order, orders_f, left_on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("revenue_c", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]),
    )
    top = (
        joined.sort(["revenue_c", "o_orderkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return top[["o_orderkey", "o_orderdate", "revenue_c"]]


def q_event_value_moments(sf_dir: str) -> "rd.Dataset":
    """Grouped second-moment aggregate (variance/stddev building blocks) as
    map-side partial combine: each batch collapses to one row per event_type
    carrying (n, sum_c, sumsq_c2) in exact int64, then a tiny groupby sums the
    partials — the all-to-all ships O(types x blocks) rows, not O(rows)."""
    ev = _rp(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_pylist()
        df = pd.DataFrame({"event_type": et, "c": c, "c2": c * c})
        g = df.groupby("event_type", as_index=False).agg(
            n=("c", "size"), sum_value_c=("c", "sum"), sumsq_value_c2=("c2", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_value_c", alias_name="sum_value_c"),
            Sum("sumsq_value_c2", alias_name="sumsq_value_c2"),
        )
    )


def q_user_event_gaps(sf_dir: str) -> "rd.Dataset":
    """Per-user inter-event-gap stats (lag/lead window shape). Gaps are diffs
    of the per-user sorted ts multiset — invariant to tie order — computed by
    the same hash-bucket + one-vectorized-kernel-per-bucket machinery as
    sessionize (never one pandas call per user)."""
    from ..ops.sessionize import _bucketed

    ev = _rp(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = np.r_[False, uid[1:] == uid[:-1]]
        d = np.r_[0, np.diff(ts)]
        d[~same] = 0
        df = pd.DataFrame(
            {"user_id": uid, "gap": d, "is_gap": same.astype(np.int64)}
        )
        out = df.groupby("user_id", as_index=False).agg(
            n_events=("gap", "size"),
            n_gaps=("is_gap", "sum"),
            sum_gap_us=("gap", "sum"),
            max_gap_us=("gap", "max"),
        )
        from ..ops.util import pd_to_arrow

        return pd_to_arrow(out)

    return _bucketed(ev, "user_id", "ts").map_groups(
        per_bucket, batch_format="pandas"
    )


def q_weekly_revenue(sf_dir: str) -> "rd.Dataset":
    """ISO-week (Monday-start) tumbling aggregate over orders —
    ``floor_temporal(unit='week')`` == DuckDB ``date_trunc('week', ...)``."""
    o = _rp(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(t["o_orderdate"], unit="week")
        return pa.table({"week": wk, "rev_c": _cents(t["o_totalprice"])})

    return (
        o.map_batches(prep, batch_format="pyarrow", batch_size=65536)
        .groupby("week")
        .aggregate(Sum("rev_c", alias_name="revenue_c"), Count(alias_name="n_orders"))
    )


def q_events_rollup(sf_dir: str) -> "rd.Dataset":
    """GROUP BY ROLLUP(event_type) analog: the grand-total row is the sum of
    the per-group partials (a second tiny aggregate over the group results),
    never a second scan of the fact table."""
    per_type = (
        _rp(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        .map_batches(
            lambda t: pa.table(
                {"event_type": t["event_type"], "value_c": _cents(t["value"])}
            ),
            batch_format="pyarrow",
            batch_size=65536,
        )
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="sum_value_c"))
        .materialize()
    )
    tot = per_type.aggregate(Sum("n", alias_name="n"),
                             Sum("sum_value_c", alias_name="sum_value_c"))
    total_row = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["ALL"]),
                "n": pa.array([int(tot["n"])], pa.int64()),
                "sum_value_c": pa.array([int(tot["sum_value_c"])], pa.int64()),
            }
        )
    )
    return per_type.union(total_row)


def q_doc_ngram_jaccard(sf_dir: str, n_docs: int = 100, n: int = 3) -> "rd.Dataset":
    """Token n-gram Jaccard between consecutive documents — the set-similarity
    kernel under MinHash verification, run exactly (reference's fuzzy-match
    semantic, SURVEY.md §2.10). Tokens are maximal [a-z0-9]+ runs of the
    lowercased text on BOTH sides (Python re here, RE2 in the oracle — the
    class is identical in both engines)."""
    import re

    from ..ops.join import bucket_join, rename_batches

    tok = re.compile(r"[a-z0-9]+")
    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    head = docs.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], pa.scalar(n_docs))),
        batch_format="pyarrow",
    )
    a = rename_batches(head, {"text": "text_a"})
    b = head.map_batches(
        lambda t: pa.table(
            {"k2": pc.subtract(t["doc_id"], pa.scalar(1)), "text_b": t["text"]}
        ),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        a, b, left_on="doc_id", right_on="k2",
        left_schema=pa.schema([("doc_id", pa.int64()), ("text_a", pa.string())]),
        right_schema=pa.schema([("k2", pa.int64()), ("text_b", pa.string())]),
    )

    def grams(s: str) -> set:
        w = tok.findall((s or "").lower())
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    def jacc(t: pa.Table) -> pa.Table:
        out = []
        for x, y in zip(t.column("text_a").to_pylist(),
                        t.column("text_b").to_pylist()):
            sa, sb = grams(x), grams(y)
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 1.0
            out.append(int(np.floor(j * 1_000_000 + 0.5)))
        return pa.table({"doc_id": t["doc_id"], "jacc_u": pa.array(out, pa.int64())})

    return joined.map_batches(jacc, batch_format="pyarrow")


def q_top_user_heavy_hitters(sf_dir: str, k: int = 10) -> "rd.Dataset":
    """Top-k users by event count through the Misra-Gries mergeable summary
    (``ops.approx.approx_heavy_hitters``). Capacity 4096 exceeds the distinct
    user count at test scales, so the sketch runs in its exact regime and the
    SQL oracle applies; the same operator at 10^9 users degrades gracefully
    to counted error bounds instead of an unbounded shuffle."""
    from ..ops.approx import approx_heavy_hitters

    ev = _rp(f"{sf_dir}/events.parquet", columns=["user_id"])
    return approx_heavy_hitters(ev, "user_id", k=k, capacity=4096)


_BPE_PAT = r" ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"


def q_doc_bpe_tokens(sf_dir: str) -> "rd.Dataset":
    """BPE-style pre-tokenizer counts (GPT-2 pattern shape, ASCII classes so
    Python/RE2 agree) — fully vectorized via Arrow's RE2
    ``count_substring_regex``, the same engine DuckDB's oracle uses."""
    docs = _rp(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def prep(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], pattern=_BPE_PAT)
        return pa.table({"lang": t["lang"], "toks": pc.cast(n, pa.int64())})

    return (
        docs.map_batches(prep, batch_format="pyarrow", batch_size=4096)
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("toks", alias_name="sum_bpe_tokens"))
    )


def q_event_type_users_approx(sf_dir: str) -> "rd.Dataset":
    """HLL approximate count-distinct per event type (rows-only: estimates
    have no SQL oracle; accuracy asserted against exact counts in tests)."""
    from ..ops.approx import approx_count_distinct

    ev = _rp(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return approx_count_distinct(ev, key="event_type", value="user_id",
                                 out_col="approx_users")


def _big_order_custkeys(sf_dir: str) -> "rd.Dataset":
    """Keys of orders over 400k, MATERIALIZED once: bloom_semi_join consumes
    its build side twice (bitmap build + exact residue), and pinning the
    compact filtered key column (one int64 per qualifying order, distributed
    blocks — never a driver pull) replaces the second full ``orders`` scan
    with an object-store read."""
    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey", "o_totalprice"])
    return orders.map_batches(
        lambda t: t.filter(
            pc.greater(t.column("o_totalprice"), 400000.0)
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    ).materialize()


_CUST_KEY_NAME = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())])


def q_customers_with_big_order(sf_dir: str) -> "rd.Dataset":
    """Bloom-prefiltered exact semi-join: customers holding at least one
    order over 400k. The constant-size Bloom bitmap of the build keys is
    broadcast once and filters the probe side BEFORE the exact join's
    shuffle — the scale path for J2/J4 when the build key set no longer
    fits a worker heap (see ops/bloom.py)."""
    from ..ops.bloom import bloom_semi_join

    cust = _rp(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    return bloom_semi_join(
        cust, _big_order_custkeys(sf_dir), "c_custkey", "o_custkey",
        left_schema=_CUST_KEY_NAME,
    )


def q_customers_no_big_order(sf_dir: str) -> "rd.Dataset":
    """Bloom-split exact anti-join: customers with NO order over 400k.
    Bloom "no" rows are definite non-matches emitted with zero shuffle;
    only the "maybe" rows pay the exact left-join residue."""
    from ..ops.bloom import bloom_semi_join

    cust = _rp(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    return bloom_semi_join(
        cust, _big_order_custkeys(sf_dir), "c_custkey", "o_custkey",
        left_schema=_CUST_KEY_NAME, anti=True,
    )


def q_nation_event_revenue(sf_dir: str) -> "rd.Dataset":
    """Fact/dim join hardened against hot fact keys: events join customer
    through the skew-aware path (ops/skewjoin.py — heavy probe keys found
    by a Misra-Gries pass go through a broadcast merge, the rest through
    the bucketed hash join), then per-nation revenue. heavy_min_rows is
    tuned to the synthetic corpus so both routes execute; at production
    scale the default (100k rows) only fires on true hot keys."""
    from ..ops.skewjoin import skew_join

    ev = _rp(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "value_c": _cents(t["value"])})

    cust = _rp(f"{sf_dir}/customer.parquet",
               columns=["c_custkey", "c_nationkey"])
    joined = skew_join(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        cust, "user_id", "c_custkey",
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("value_c", pa.int64())]
        ),
        right_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
        heavy_min_rows=80,
    )

    def partial(t: pa.Table) -> pa.Table:
        from ..ops.util import pd_to_arrow

        df = t.select(["c_nationkey", "value_c"]).to_pandas()
        agg = df.groupby("c_nationkey", as_index=False).agg(
            revenue_c=("value_c", "sum"), n_events=("value_c", "size")
        )
        return pd_to_arrow(agg)

    totals = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"),
                   Sum("n_events", alias_name="n_events"))
    )
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    out = broadcast_join(totals, nation,
                         left_on="c_nationkey", right_on="n_nationkey")
    return out.map_batches(
        lambda t: t.select(["n_name", "n_events", "revenue_c"]),
        batch_format="pyarrow",
    )


def q_profile_events(sf_dir: str) -> "rd.Dataset":
    """One-pass streaming profile of the events table's numeric columns
    (count / nulls / min / max — constant-size partials per batch, see
    ops/profile.py). The approx-distinct column is exercised rows-only in
    ``profile_docs`` and accuracy-tested in pytest."""
    from ..ops.profile import profile_table

    ev = _rp(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    prof = profile_table(ev, ["user_id", "value"])
    return prof.select_columns(["col", "n", "n_null", "min_num", "max_num"])


def q_profile_docs(sf_dir: str) -> "rd.Dataset":
    """Full profile of the documents table incl. string min/max and HLL
    approx-distinct (rows-only: the estimate has no SQL oracle)."""
    from ..ops.profile import profile_table

    docs = _rp(f"{sf_dir}/documents.parquet",
               columns=["doc_id", "lang", "n_chars"])
    return profile_table(docs, ["doc_id", "lang", "n_chars"])


def q_event_value_quantiles_approx(sf_dir: str) -> "rd.Dataset":
    """Mergeable-summary approximate p50/p90 of event value per event type
    (rows-only: estimates have no SQL oracle; rank-error bound asserted in
    tests). The scale-path twin of ``q_event_value_quantiles``: each batch
    ships <= m (value, weight) rows per group instead of its raw values."""
    from ..ops.approx import approx_quantiles

    ev = _rp(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return approx_quantiles(ev, value="value", qs=[0.5, 0.9],
                            key="event_type", m=1024)


def q_docs_stratified_sample(sf_dir: str, k: int = 20) -> "rd.Dataset":
    """Deterministic k-per-language document sample (key-pure membership —
    identical across runs, shardings and cluster sizes)."""
    from ..ops.sample import stratified_sample

    docs = _rp(f"{sf_dir}/documents.parquet",
               columns=["doc_id", "lang", "source"])
    return stratified_sample(docs, stratum="lang", key="doc_id", k=k)


def q_docs_hash_sample(sf_dir: str, rate: float = 0.25) -> "rd.Dataset":
    """Deterministic Bernoulli(rate) sample keyed on doc_id — membership is
    splitmix64(key ^ seed) < rate*2^64, a pure per-row map (no shuffle, no
    RNG state), so the sample is identical across runs/shardings/cluster
    sizes AND exactly SQL-mirrorable (the oracle re-computes splitmix64 in
    HUGEINT arithmetic)."""
    from ..ops.sample import hash_sample

    docs = _rp(f"{sf_dir}/documents.parquet",
               columns=["doc_id", "lang", "source"])
    return hash_sample(docs, key="doc_id", rate=rate)


def q_doc_split(sf_dir: str) -> "rd.Dataset":
    """Deterministic train/val/test split (90/5/5) keyed on doc_id — a pure
    per-row map with NO shuffle, stable across runs/shardings/cluster sizes.
    The bucket hash is SQL-mirrorable, so unlike the splitmix64 samplers this
    split is oracle-checked value-for-value (ops/sample.hash_split)."""
    from ..ops.sample import hash_split

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return hash_split(docs, key="doc_id",
                      splits={"train": 90, "val": 5, "test": 5}, seed=7)


def q_top_tokens(sf_dir: str, k: int = 30) -> "rd.Dataset":
    """Corpus-wide word count, top-k tokens by frequency. The wide
    `GROUP BY token` done scale-safe: per-batch value_counts partials
    collapse before the shuffle (see ops/wordcount.py)."""
    from ..ops.wordcount import top_k_tokens

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["text"])
    return top_k_tokens(docs, k=k)


def q_doc_vocab_stats(sf_dir: str) -> "rd.Dataset":
    """Per-document vocabulary stats (token count, distinct tokens,
    type-token ratio in integer permille) — vectorized distinct counting
    via dictionary-encode + lexsort (see ops/wordcount.py)."""
    from ..ops.wordcount import vocab_stats

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return vocab_stats(docs)


def q_doc_pii_redact(sf_dir: str) -> "rd.Dataset":
    """PII scrub (ops/pii.py) with an exact DuckDB regexp_replace oracle.

    The synthetic corpus has no PII, so the query first plants a
    deterministic contact suffix per doc (pure function of doc_id — the
    identical expression runs in the SQL oracle), then counts + redacts all
    four default patterns and reports the redacted length."""
    from functools import reduce

    from ..ops.pii import pii_scrub

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        cat = lambda *parts: reduce(np.char.add, parts)
        sid = did.astype(str)
        mail = np.where(
            did % 3 == 0,
            cat(" mail u", sid, "@ex", (did % 7).astype(str), ".org"), "")
        ip = np.where(
            did % 5 == 0,
            cat(" ip 10.", (did % 200).astype(str), ".3.",
                (did % 250).astype(str)), "")
        ssn = np.where(did % 7 == 0, " ssn 987-65-4321", "")
        text = pc.binary_join_element_wise(
            t.column("text"), pa.array(mail.astype(object), pa.string()),
            pa.array(ip.astype(object), pa.string()),
            pa.array(ssn.astype(object), pa.string()), "")
        return pa.table({"doc_id": t.column("doc_id"), "text": text})

    planted = docs.map_batches(plant, batch_format="pyarrow", batch_size=8192)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_email": t.column("n_email"),
                "n_ipv4": t.column("n_ipv4"),
                "n_phone": t.column("n_phone"),
                "n_ssn": t.column("n_ssn"),
                "redacted_len": pc.cast(
                    pc.utf8_length(t.column("text_redacted")), pa.int64()),
            }
        )

    return pii_scrub(planted).map_batches(finish, batch_format="pyarrow")


def q_local_supplier_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q5 shape: 6-table join chain (customer x orders x lineitem x
    supplier x nation x region) with the local-supplier constraint
    (c_nationkey = s_nationkey), revenue per nation in ASIA for one year.

    Join strategy by cardinality class: region/nation/supplier fold into
    broadcast maps (ray.put once, read per batch — at 100 TB supplier
    would graduate to a bucket_join, the plan is otherwise unchanged);
    orders x customer and lineitem x orders are big-big bucket joins that
    both partition on the SAME key family (orderkey after the custkey
    pre-join), with every non-needed column dropped before the shuffles."""
    region = _rp(f"{sf_dir}/region.parquet",
                 columns=["r_regionkey", "r_name"]).to_pandas()
    nation = _rp(f"{sf_dir}/nation.parquet",
                 columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    asia = nation.merge(region[region.r_name == "ASIA"], left_on="n_regionkey",
                        right_on="r_regionkey")[["n_nationkey", "n_name"]]
    asia_keys = set(asia.n_nationkey.tolist())
    name_of = dict(zip(asia.n_nationkey, asia.n_name))

    supp = _rp(f"{sf_dir}/supplier.parquet",
               columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp.s_nationkey.isin(asia_keys)]

    lo, hi = (pa.scalar(np.datetime64("1995-01-01", "us")),
              pa.scalar(np.datetime64("1996-01-01", "us")))

    cust = _rp(f"{sf_dir}/customer.parquet",
               columns=["c_custkey", "c_nationkey"])
    asia_arr = pa.array(sorted(asia_keys), pa.int64())
    cust = cust.map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=asia_arr)),
        batch_format="pyarrow", batch_size=65536)

    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        t = t.filter(m)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]})

    # region-filtered customers are a ~1/5 sliver: below the same 2M-row
    # gate they broadcast into the filtered orders scan; above it, the
    # partitioned hash join (the 100-TB plan, where customer >> node RAM)
    ord_filt = orders.map_batches(o_prep, batch_format="pyarrow",
                                  batch_size=65536)
    cust_mat = cust.materialize()
    if cust_mat.count() <= 2_000_000:
        ord_cust = broadcast_join(ord_filt, cust_mat.to_pandas(),
                                  left_on="o_custkey", right_on="c_custkey")
    else:
        ord_cust = hash_join(ord_filt, cust_mat,
                             on="o_custkey", right_on="c_custkey")
    ord_cust = ord_cust.select_columns(
        ["o_orderkey", "c_nationkey"]).materialize()

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"])

    def l_prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "revenue_c": _cents(rev)})

    li_supp = broadcast_join(
        li.map_batches(l_prep, batch_format="pyarrow", batch_size=65536),
        supp, left_on="l_suppkey", right_on="s_suppkey",
    ).select_columns(["l_orderkey", "s_nationkey", "revenue_c"])

    # the date+region filters collapse orders x customer to a sliver of the
    # orders table; below 2M rows it broadcasts into the lineitem scan (one
    # pandas merge per batch, zero lineitem shuffle) — the same size gate
    # the ER scorer uses. Above it, the partitioned hash join is the plan.
    if ord_cust.count() <= 2_000_000:
        both = broadcast_join(li_supp, ord_cust.to_pandas(),
                              left_on="l_orderkey", right_on="o_orderkey")
    else:
        both = hash_join(li_supp, ord_cust, on="l_orderkey",
                         right_on="o_orderkey")

    def _sum_by_nation(nk: np.ndarray, rev: np.ndarray) -> pa.Table:
        # int64 accumulator (np.add.at), NOT bincount(weights=...): float64
        # weights lose exactness past 2^53, which 100-TB revenue sums exceed
        vals, inv = np.unique(nk, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table(
            {
                "n_nationkey": pa.array(vals, pa.int64()),
                "revenue_c": pa.array(sums),
            }
        )

    def local_partial(t: pa.Table) -> pa.Table:
        # filter to local suppliers, then collapse the batch to <= |nations|
        # partial-sum rows — combiner-before-reduce; the final combine is
        # one kernel over one coalesced block (no native aggregate, whose
        # empty partitions emit zero-column blocks and trip downstream
        # schema unification)
        t = t.filter(pc.equal(t["s_nationkey"], t["c_nationkey"]))
        return _sum_by_nation(
            t["s_nationkey"].to_numpy(zero_copy_only=False),
            t["revenue_c"].to_numpy(zero_copy_only=False),
        )

    def combine(t: pa.Table) -> pa.Table:
        return _sum_by_nation(
            t["n_nationkey"].to_numpy(zero_copy_only=False),
            t["revenue_c"].to_numpy(zero_copy_only=False),
        )

    agg = (both.map_batches(local_partial, batch_format="pyarrow")
           .repartition(1)
           .map_batches(combine, batch_format="pyarrow",
                        batch_size=1 << 30))

    names = pd.DataFrame({"n_nationkey": list(name_of), "n_name": [name_of[k] for k in name_of]})
    out = broadcast_join(agg, names, left_on="n_nationkey")
    return out.select_columns(["n_name", "revenue_c"]).sort(
        ["revenue_c", "n_name"], descending=[True, False])


_BOILER = ("standard license header text appended to every tenth document "
           "for duplicate span detection")


def q_doc_dup_spans(sf_dir: str) -> "rd.Dataset":
    """Exact duplicate-span detection (ops/spandedup.py, Lee et al. 2022
    shape) with a full DuckDB oracle on gram strings: every tenth doc gets a
    deterministic boilerplate suffix, so its 8-grams recur corpus-wide while
    the word-salad base text stays unique."""
    from ..ops.spandedup import duplicate_span_stats

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        suffix = np.where(did % 10 == 0, " " + _BOILER, "")
        text = pc.binary_join_element_wise(
            t.column("text"),
            pa.array(suffix.astype(object), pa.string()), "")
        return pa.table({"doc_id": t.column("doc_id"), "text": text})

    planted = docs.map_batches(plant, batch_format="pyarrow", batch_size=8192)
    return duplicate_span_stats(planted, n=8)


def q_doc_repetition(sf_dir: str) -> "rd.Dataset":
    """Gopher-style repetition metric: most-frequent-2-gram count and its
    token-coverage permille per doc — pure map-side (ops/wordcount.py)."""
    from ..ops.wordcount import repetition_stats

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return repetition_stats(docs, n=2)


def q_doc_contamination(sf_dir: str) -> "rd.Dataset":
    """Train/test n-gram contamination (ops/spandedup.py): the corpus is
    split by doc_id parity into a 'train' and a 'test' side; test docs whose
    doc_id is divisible by 4 additionally carry a copied 12-token span from
    train doc (doc_id-2) — planted leakage the checker must surface. Full
    DuckDB oracle on gram strings."""
    from ..ops.spandedup import contamination_stats

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def even_side(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0))

    def odd_side(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1))

    train = docs.map_batches(even_side, batch_format="pyarrow")
    test = docs.map_batches(odd_side, batch_format="pyarrow")

    # plant leakage: odd docs with (doc_id+1) % 8 == 0 copy the first 12
    # tokens of train doc (doc_id-1) — that train doc exists (it's even)
    def head12_batch(t: pa.Table) -> pa.Table:
        # first 12 \S+ tokens per doc — _flat_tokens drops the empty strings
        # a bare split_pattern_regex('\s+') keeps for leading/trailing
        # whitespace, matching the oracle's regexp_extract_all('\S+') contract
        from ..ops.wordcount import _flat_tokens

        flat, lengths = _flat_tokens(t["text"])
        starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
        tc = np.minimum(lengths, 12)
        tc_starts = np.concatenate([[0], np.cumsum(tc)])
        idx = (np.repeat(starts, tc)
               + np.arange(tc_starts[-1]) - np.repeat(tc_starts[:-1], tc))
        lists = pa.ListArray.from_arrays(
            pa.array(tc_starts, pa.int32()),
            flat.take(pa.array(idx)) if len(idx) else flat.slice(0, 0),
        )
        return pa.table({"doc_id": t["doc_id"],
                         "head12": pc.binary_join(lists, " ")})

    train_head = docs.map_batches(head12_batch, batch_format="pyarrow")

    def leak(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        take = pa.array((did + 1) % 8 == 0)
        head = pc.fill_null(t.column("head12"), "")
        mask = pc.and_(take, pc.not_equal(head, pa.scalar("")))
        suffix = pc.if_else(
            mask,
            pc.binary_join_element_wise(pa.scalar(" "), head, ""),
            pa.scalar(""),
        )
        text = pc.binary_join_element_wise(t.column("text"), suffix, "")
        return pa.table({"doc_id": t["doc_id"], "text": text})

    from ..ops.join import broadcast_join

    heads = train_head.to_pandas()
    heads = heads.rename(columns={"doc_id": "src_id"})
    heads["src_id"] = heads["src_id"] + 1  # align train doc d with test doc d+1
    test_planted = broadcast_join(
        test, heads, left_on="doc_id", right_on="src_id", how="left"
    ).map_batches(leak, batch_format="pyarrow")

    return contamination_stats(train, test_planted, n=8)


_SEARCH_QUERIES = {1: ["table", "key"], 2: ["window", "merge", "sort"]}


def q_keyword_search(sf_dir: str) -> "rd.Dataset":
    """Integer-scored keyword search (ops/search.py): top-10 docs per query
    by (tf_sum, n_terms, doc_id) — exact ROW_NUMBER() oracle in DuckDB."""
    from ..ops.search import keyword_topk

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return keyword_topk(docs, _SEARCH_QUERIES, k=10)


def q_bm25_docs(sf_dir: str) -> "rd.Dataset":
    """Okapi BM25 top-10 per query. Per-term contributions quantize to
    integer micro-units BEFORE summation (ops/search.py), so scores are
    order-independent and the DuckDB oracle reproduces them exactly —
    (query_id, doc_id, score_u, rank), full value-hash parity."""
    from ..ops.search import bm25_topk

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = bm25_topk(docs, _SEARCH_QUERIES, k=10)
    return out.select_columns(["query_id", "doc_id", "score_u", "rank"])


def q_event_value_histogram(sf_dir: str) -> "rd.Dataset":
    """Exact 20-bin (width 25) histogram of event value per event type —
    constant-size partials, one coalesced combine (ops/profile.py)."""
    from ..ops.profile import value_histogram

    ev = _rp(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return value_histogram(ev, "value", bin_width=25.0, n_bins=20,
                           key="event_type")


def q_returned_item_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q10 shape: revenue lost to returned items per customer, one
    quarter — orders(date sliver) broadcasts into the lineitem('R') scan,
    per-batch int64 partial sums reduce in a custkey-bucketed vectorized
    kernel (customer is a high-cardinality group-by: Ray's native aggregate
    pays per-group Python overhead — see PERF.md), names join in via a
    size-gated broadcast, global top-20 by revenue."""
    lo, hi = (pa.scalar(np.datetime64("1995-01-01", "us")),
              pa.scalar(np.datetime64("1995-04-01", "us")))

    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        t = t.filter(m)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]})

    ord_q = orders.map_batches(o_prep, batch_format="pyarrow",
                               batch_size=65536).materialize()

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                      "l_discount"])

    def l_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "revenue_c": _cents(rev)})

    li_r = li.map_batches(l_prep, batch_format="pyarrow", batch_size=65536)
    if ord_q.count() <= 2_000_000:
        joined = broadcast_join(li_r, ord_q.to_pandas(),
                                left_on="l_orderkey", right_on="o_orderkey")
    else:
        joined = hash_join(li_r, ord_q, on="l_orderkey",
                           right_on="o_orderkey")

    B = 64

    def partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        rev = t["revenue_c"].to_numpy(zero_copy_only=False)
        vals, inv = np.unique(ck, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table(
            {
                "c_custkey": pa.array(vals, pa.int64()),
                "revenue_c": pa.array(sums),
                "__bkt": pa.array((vals % B).astype(np.int32)),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        ck = g["c_custkey"].to_numpy(zero_copy_only=False)
        rev = g["revenue_c"].to_numpy(zero_copy_only=False)
        vals, inv = np.unique(ck, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table({"c_custkey": pa.array(vals, pa.int64()),
                         "revenue_c": pa.array(sums)})

    per_cust = (joined.select_columns(["o_custkey", "revenue_c"])
                .map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
                .groupby("__bkt")
                .map_groups(combine, batch_format="pyarrow"))

    cust = _rp(f"{sf_dir}/customer.parquet",
               columns=["c_custkey", "c_name", "c_nationkey"])
    nation = _rp(f"{sf_dir}/nation.parquet",
                 columns=["n_nationkey", "n_name"]).to_pandas()
    cust_mat = cust.materialize()
    if cust_mat.count() <= 2_000_000:
        names = cust_mat.to_pandas().merge(
            nation, left_on="c_nationkey", right_on="n_nationkey")
        out = broadcast_join(per_cust, names[["c_custkey", "c_name", "n_name"]]
                             .rename(columns={"c_custkey": "ck2"}),
                             left_on="c_custkey", right_on="ck2")
        out = out.drop_columns(["ck2"])
    else:
        out = hash_join(per_cust, cust_mat, on="c_custkey",
                        right_on="c_custkey")
        # nation is a 25-row dim at any scale — broadcast it onto the joined
        # rows so this path carries n_name like the small-customer branch
        out = broadcast_join(out, nation,
                             left_on="c_nationkey", right_on="n_nationkey")
    return (out.select_columns(["c_custkey", "c_name", "n_name", "revenue_c"])
            .sort(["revenue_c", "c_custkey"], descending=[True, False])
            .limit(20))


def q_cluster_components(sf_dir: str) -> "rd.Dataset":
    """Generic distributed connected components (D2): the ER transitive-merge
    machinery (``stages/clustering.propagate_labels`` — iterative min-label
    propagation over the bucketed exchange, driver fastpath DISABLED) run
    over a deterministic planted chain graph whose closure IS expressible in
    ANSI SQL, upgrading union-find from pytest-pinned to oracle-checked.

    Graph: node x starts a new component iff ``x % 8 == 0`` or
    ``(x * 48271) % 5 == 0`` (or its predecessor id is absent), else it
    chains to x-1. Components are therefore contiguous id runs (max
    diameter 7) and the canonical min-reachable id is a running window max
    over the start markers in SQL — while the Ray side executes the real
    multi-round distributed propagation + assignments left-join used by the
    ER pipeline (reference analog: the entity-merge walk,
    ``/root/reference/pipeline/link_entities.py:857-879``)."""
    from dataclasses import replace

    from ..config import auto_config
    from ..stages.clustering import assignments, propagate_labels

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        e = d + 1
        keep = ~((e % 8 == 0) | ((e * 48271) % 5 == 0))
        # the last row's edge points at a ghost node (max_id + 1, never in
        # the corpus): harmless — min-label propagation only LOWERS labels,
        # a ghost id above every real id cannot change a real node's label,
        # and the assignments left-join never emits non-corpus nodes
        return pa.table({
            "id_a": pa.array(d[keep].astype(np.uint64), pa.uint64()),
            "id_b": pa.array(e[keep].astype(np.uint64), pa.uint64()),
        })

    # chains have diameter up to 7 (vs the ER pipeline's O(1)-by-
    # construction stars), so give propagation the round budget to reach
    # the fixpoint + detect it; driver_cluster_max_edges=0 forces the
    # distributed path even at test scale
    cfg = replace(auto_config(), driver_cluster_max_edges=0,
                  max_cluster_rounds=24)
    labels = propagate_labels(docs.map_batches(edges, batch_format="pyarrow"),
                              cfg)
    ids = docs.map_batches(
        lambda t: pa.table(
            {"file_id_u64": pc.cast(t.column("doc_id"), pa.uint64())}
        ),
        batch_format="pyarrow",
    )

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t.column("file_id_u64"), pa.int64()),
            "component_id": pc.cast(t.column("canonical_u64"), pa.int64()),
        })

    return (assignments(ids, labels, cfg)
            .map_batches(fmt, batch_format="pyarrow")
            .sort("doc_id"))


def q_doc_pagerank(sf_dir: str) -> "rd.Dataset":
    """Distributed integer PageRank (ops/pagerank.py) over a planted
    deterministic graph on doc ids, exact against a 3-iteration unrolled SQL
    oracle: node x emits (x % 3) + 1 edges to ((x*48271 + i + 1) % N) for
    i in 0..x%3 — out-degrees 1-3 and a scrambled in-degree distribution.
    Ranks are micro-units with int64 floor division per contribution, so
    partial sums commute and the value-hash is exact (the same integer
    contract as `doc_char_jaccard`/`bm25_docs`). The Ray side computes
    out-degrees itself (one exchange) rather than trusting the plant."""
    from ..ops.pagerank import pagerank

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()  # parquet metadata count — no scan

    def edges(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        reps = (d % 3 + 1).astype(np.int64)
        src = np.repeat(d, reps)
        offs = np.arange(len(src), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        dst = (src * 48271 + offs + 1) % n
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    nodes = docs.map_batches(
        lambda t: pa.table({"node": pc.cast(t.column("doc_id"), pa.int64())}),
        batch_format="pyarrow",
    )
    ranks = pagerank(docs.map_batches(edges, batch_format="pyarrow"),
                     nodes, num_iters=3)
    return ranks.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "rank_u": t.column("rank_u")}),
        batch_format="pyarrow",
    ).sort("doc_id")


def q_promo_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q14 shape: promotion revenue share for one month. lineitem
    (date sliver) joins part on partkey — part is the dim side, broadcast
    under the house size gate, hash join past it — then TWO conditional
    int64 partial sums reduce to driver scalars and the share is computed
    as one exact integer division on arbitrary-precision Python ints (the
    SQL side divides HUGEINTs; no float ratio ever exists on either side)."""
    from ..ops.join import broadcast_join, hash_join

    lo, hi = (pa.scalar(np.datetime64("1996-03-01", "us")),
              pa.scalar(np.datetime64("1996-04-01", "us")))
    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_partkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])

    def l_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_partkey": t["l_partkey"],
                         "rev_c": _cents(rev)})

    li_m = li.map_batches(l_prep, batch_format="pyarrow", batch_size=65536)
    part = _rp(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    part_mat = part.materialize()
    if part_mat.count() <= 2_000_000:
        joined = broadcast_join(li_m, part_mat.to_pandas(),
                                left_on="l_partkey", right_on="p_partkey")
    else:
        joined = hash_join(li_m, part_mat, on="l_partkey",
                           right_on="p_partkey")

    def partial(t: pa.Table) -> pa.Table:
        rev = t["rev_c"].to_numpy(zero_copy_only=False)
        promo = pc.equal(t["p_type"], pa.scalar("PROMO")).to_numpy(
            zero_copy_only=False
        )
        return pa.table({
            "p": pa.array([int(rev[promo].sum())], pa.int64()),
            "t": pa.array([int(rev.sum())], pa.int64()),
        })

    agg = joined.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).aggregate(Sum("p", alias_name="promo"), Sum("t", alias_name="total"))
    promo_c = int(agg["promo"] or 0)
    total_c = int(agg["total"] or 0)
    share_u = (promo_c * 1_000_000) // total_c if total_c else 0
    return pa.table({
        "promo_rev_c": pa.array([promo_c], pa.int64()),
        "total_rev_c": pa.array([total_c], pa.int64()),
        "promo_share_u": pa.array([share_u], pa.int64()),
    })


def q_priority_line_counts(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q12 shape (conditional aggregation after a fact-fact join):
    1996-shipped lineitems join orders on orderkey; per linestatus, count
    lines whose order is high-priority (1-URGENT / 2-HIGH) vs not. Both
    sides are fact tables at scale, so the join is the bucketed hash join;
    the CASE-WHEN counts collapse per batch to two int64 partials before
    the 2-group groupby."""
    from ..ops.join import hash_join

    lo, hi = (pa.scalar(np.datetime64("1996-01-01", "us")),
              pa.scalar(np.datetime64("1997-01-01", "us")))
    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_orderkey", "l_linestatus", "l_shipdate"])

    def l_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linestatus": t["l_linestatus"]})

    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_orderpriority"])
    joined = hash_join(
        li.map_batches(l_prep, batch_format="pyarrow", batch_size=65536),
        orders, on="l_orderkey", right_on="o_orderkey",
    )

    def partial(t: pa.Table) -> pa.Table:
        hi_m = pc.or_(pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT")),
                      pc.equal(t["o_orderpriority"], pa.scalar("2-HIGH")))
        hi_np = hi_m.to_numpy(zero_copy_only=False).astype(np.int64)
        ls = t["l_linestatus"]
        enc = pc.dictionary_encode(ls.combine_chunks()
                                   if isinstance(ls, pa.ChunkedArray) else ls)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        high = np.bincount(codes, weights=hi_np, minlength=k).astype(np.int64)
        tot = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.table({
            "l_linestatus": enc.dictionary,
            "high_lines": pa.array(high, pa.int64()),
            "low_lines": pa.array(tot - high, pa.int64()),
        })

    return (joined.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("l_linestatus")
            .aggregate(Sum("high_lines", alias_name="high_lines"),
                       Sum("low_lines", alias_name="low_lines"))
            .sort("l_linestatus"))


def q_big_qty_orders(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q18 shape (HAVING filter then join back): per-order quantity
    sums (bucketed vectorized reduce — orderkey is high-cardinality),
    HAVING > 200, then the small surviving set joins back through orders
    to customer names. Quantities are integral by construction, so the
    sums are exact int64 (no float hash risk). Join-backs are size-gated
    broadcasts with the hash-join fallback spelled out."""
    from ..ops.join import broadcast_join, hash_join

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_orderkey", "l_quantity"])
    B = 64

    def partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, q)
        return pa.table({
            "ok": pa.array(vals, pa.int64()),
            "q": pa.array(sums),
            "__bkt": pa.array((vals % B).astype(np.int32)),
        })

    def combine(g: pa.Table) -> pa.Table:
        ok = g["ok"].to_numpy(zero_copy_only=False)
        q = g["q"].to_numpy(zero_copy_only=False)
        vals, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, q)
        keep = sums > 200
        return pa.table({"ok": pa.array(vals[keep], pa.int64()),
                         "total_qty": pa.array(sums[keep])})

    big = (li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby("__bkt").map_groups(combine, batch_format="pyarrow")
           .materialize())

    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_custkey"])
    # the HAVING survivors are a sliver of orders — broadcast them into the
    # orders scan below the gate; at 100-TB the filtered side can still be
    # huge, hence the hash-join fallback
    if big.count() <= 2_000_000:
        ord_big = broadcast_join(orders, big.to_pandas(),
                                 left_on="o_orderkey", right_on="ok")
    else:
        ord_big = hash_join(orders, big, on="o_orderkey", right_on="ok")

    cust = _rp(f"{sf_dir}/customer.parquet",
               columns=["c_custkey", "c_name"])
    cust_mat = cust.materialize()
    if cust_mat.count() <= 2_000_000:
        out = broadcast_join(ord_big, cust_mat.to_pandas(),
                             left_on="o_custkey", right_on="c_custkey")
    else:
        out = hash_join(ord_big, cust_mat, on="o_custkey",
                        right_on="c_custkey")
    return (out.select_columns(["c_custkey", "c_name", "o_orderkey",
                                "total_qty"])
            .sort(["total_qty", "o_orderkey"], descending=[True, False])
            .limit(100))


def q_rich_idle_customers(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q22 shape (scalar subquery + anti-join + grouped aggregate):
    customers with above-average account balance and NO urgent order, per
    market segment. The global average is an exact integer comparison
    (bal_c * n > sum_c — no float mean exists on either side; the SQL
    oracle compares the same rationals), computed by one Sum/Count
    aggregate whose result broadcasts into the filter closure. The NOT
    EXISTS goes through the bloom-split anti-join (definite-no rows never
    shuffle)."""
    from ..ops.bloom import bloom_semi_join

    cust = _rp(f"{sf_dir}/customer.parquet",
               columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def c_prep(t: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_mktsegment": t["c_mktsegment"],
                         "bal_c": _cents(t["c_acctbal"])})

    cust_c = cust.map_batches(c_prep, batch_format="pyarrow",
                              batch_size=65536).materialize()
    agg = cust_c.aggregate(Sum("bal_c", alias_name="s"),
                           Count(alias_name="n"))
    s, n = int(agg["s"] or 0), int(agg["n"] or 0)

    rich = cust_c.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["bal_c"], pa.scalar(n, pa.int64())),
            pa.scalar(s, pa.int64()))),
        batch_format="pyarrow",
    )

    urgent = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(
            pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))
        ).select(["o_custkey"]),
        batch_format="pyarrow", batch_size=65536,
    ).materialize()

    lonely = bloom_semi_join(
        rich, urgent, "c_custkey", "o_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_mktsegment", pa.string()),
                               ("bal_c", pa.int64())]),
        anti=True,
    )
    return (lonely.groupby("c_mktsegment")
            .aggregate(Count(alias_name="n_cust"),
                       Sum("bal_c", alias_name="total_bal_c"))
            .sort("c_mktsegment"))


def q_label_centroids(sf_dir: str) -> "rd.Dataset":
    """Per-label embedding centroid (ops/similarity.group_centroids) in
    exact integer micro-units: components quantize to int64 BEFORE the sum
    so the result is partition-order-free; the final floor division is
    mirrored in SQL with the truncation-safe residue formula (DuckDB's
    ``//`` truncates toward zero, numpy floors — subtracting the
    non-negative residue first makes them agree on negatives)."""
    from ..ops.similarity import group_centroids

    emb = _rp(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    out = group_centroids(emb, group_col="label", vec_col="embedding")
    return out.map_batches(
        lambda t: pa.table({"label": pc.cast(t.column("label"), pa.int64()),
                            "dim": t.column("dim"),
                            "centroid_u": t.column("centroid_u")}),
        batch_format="pyarrow",
    )


def q_centroid_assign(sf_dir: str) -> "rd.Dataset":
    """k-means assign step with an exact integer oracle: per-label centroids
    (ops/similarity.group_centroids) broadcast into a nearest-centroid scan
    (ops/similarity.assign_to_centroids). Distances are int64 squared L2
    over micro-unit quantized components — no float argmin ambiguity; ties
    break to the smallest label on both sides."""
    from ..ops.similarity import assign_to_centroids, group_centroids

    emb = _rp(f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "label", "embedding"])
    cents = group_centroids(
        emb.select_columns(["label", "embedding"]),
        group_col="label", vec_col="embedding",
    )
    # the centroid table is O(groups x dims) — a driver pull of a few KB
    # (the broadcast small side; the vector scan below streams)
    cent_tbl = pa.concat_tables(
        list(cents.iter_batches(batch_format="pyarrow"))
    )
    return assign_to_centroids(
        emb.select_columns(["vec_id", "embedding"]), cent_tbl
    ).sort("vec_id")


def q_latest_user_events(sf_dir: str) -> "rd.Dataset":
    """CDC/upsert compaction (ops/compact.latest_per_key): the newest event
    row per user — max (ts, event_id) — with every payload column riding
    through the take untouched. The oracle is the canonical QUALIFY
    row_number() = 1 window; `value` travels as exact cents."""
    from ..ops.compact import latest_per_key

    ev = _rp(f"{sf_dir}/events.parquet",
             columns=["event_id", "ts", "user_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts": t["ts"],
            "event_type": t["event_type"],
            "value_c": _cents(t["value"]),
        })

    schema = pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")), ("event_type", pa.string()),
        ("value_c", pa.int64()),
    ])
    out = latest_per_key(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        key_col="user_id", order_col="ts", tiebreak_col="event_id",
        schema=schema,
    )
    return out.sort("user_id")


def q_cust_order_distribution(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q13 shape: left-outer join + double aggregation — how many
    customers placed k non-urgent orders, INCLUDING k = 0 (the row the
    inner-join plans silently drop). Plan: orders pre-aggregate to per-
    customer counts (the only exchange carries (custkey, cnt) partials, not
    order rows), then the bucketed LEFT OUTER join against the customer key
    column preserves order-less customers as nulls -> 0, and the final
    distribution is a tiny grouped count."""
    from ..ops.exchange import exchange_map_groups
    from ..ops.join import bucket_join

    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey", "o_orderpriority"])
    urgent = pa.scalar("1-URGENT")

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["o_orderpriority"], urgent))
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(ck, return_counts=True)
        return pa.table({"ck": pa.array(vals, pa.int64()),
                         "cnt": pa.array(cnts.astype(np.int64))})

    def combine(g: pa.Table) -> pa.Table:
        ck = g["ck"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        vals, inv = np.unique(ck, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, cnt)
        return pa.table({"ck": pa.array(vals, pa.int64()),
                         "cnt": pa.array(sums)})

    cnt_schema = pa.schema([("ck", pa.int64()), ("cnt", pa.int64())])

    def bucket_fn(t: pa.Table) -> np.ndarray:
        k = t.column("ck").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(256)).astype(np.int64)

    per_cust = exchange_map_groups(
        orders.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
        combine, None, 256, cnt_schema.empty_table(), bucket_fn=bucket_fn,
    )

    cust = _rp(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    joined = bucket_join(
        cust, per_cust, left_on="c_custkey", right_on="ck", how="left",
        left_schema=pa.schema([("c_custkey", pa.int64())]),
        right_schema=cnt_schema,
    )

    def dist_partial(t: pa.Table) -> pa.Table:
        c = pc.fill_null(t["cnt"], 0).to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(c, return_counts=True)
        return pa.table({"c_count": pa.array(vals, pa.int64()),
                         "custdist": pa.array(cnts.astype(np.int64))})

    return (joined.map_batches(dist_partial, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("c_count")
            .aggregate(Sum("custdist", alias_name="custdist"))
            .sort(["custdist", "c_count"], descending=[True, True]))


def q_user_top_event_type(sf_dir: str) -> "rd.Dataset":
    """Grouped mode (ops/rank.grouped_mode): each user's most frequent
    event_type with its count, ties to the lexicographically smallest type —
    the exact row_number() OVER (ORDER BY count DESC, value ASC) = 1
    contract, computed with pre-aggregated (key, value, cnt) partials and
    one bucketed exchange."""
    from ..ops.rank import grouped_mode

    ev = _rp(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    return grouped_mode(
        ev, key="user_id", value="event_type",
        out_value="top_type", out_count="cnt",
    ).sort("user_id")


def q_user_rolling_value_1h(sf_dir: str) -> "rd.Dataset":
    """Time-range windowed aggregate (ops/window.sliding_time_sum): per
    event, the sum of value-cents over the user's trailing 1-hour interval —
    SQL RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW, peers
    included. One bucketed exchange + a lexsort/cumsum/searchsorted kernel;
    exact int64 cents end-to-end."""
    from ..ops.window import sliding_time_sum

    ev = _rp(f"{sf_dir}/events.parquet",
             columns=["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "ts": t["ts"], "value_c": _cents(t["value"]),
        })

    schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")), ("value_c", pa.int64()),
    ])
    out = sliding_time_sum(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        key_col="user_id", ts_col="ts", val_col="value_c",
        window_us=3_600_000_000, schema=schema, out_col="roll_c",
    )
    return out.sort("event_id")


def q_small_qty_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q17 shape: correlated-average filter — revenue from Brand#13
    line items whose quantity is below 20% of that part's average quantity.
    Exactness: qty < 0.2 * (sum/cnt) is evaluated as the integer cross-
    multiplication 5 * qty_c * cnt < sum_qty_c (no float division on either
    side). Plan: the brand's part keys broadcast into the lineitem scan
    (part is the dim side); per-part (sum, cnt) stats reduce from per-batch
    partials and broadcast back (|brand parts| = |part|/25 — kilobytes at
    test scale, ~25 MB of int64s at TPC-H SF100k); the second scan filters
    and sums in one pass. No fact-table shuffle at any point."""
    import ray

    part = _rp(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])

    def pk_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["p_brand"], pa.scalar("Brand#13")))
        return t.select(["p_partkey"])

    pkeys = np.sort(
        pa.concat_tables(
            ray.get(part.map_batches(pk_only, batch_format="pyarrow")
                    .to_arrow_refs())
        )["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    pk_ref = ray.put(pkeys)

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def stats_partial(t: pa.Table) -> pa.Table:
        import ray as _r

        keys = _r.get(pk_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys) == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "sq": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        pos = np.minimum(np.searchsorted(keys, pk), len(keys) - 1)
        m = keys[pos] == pk
        pk, qty = pk[m], _cents(t["l_quantity"]).to_numpy()[m]
        vals, inv = np.unique(pk, return_inverse=True)
        sq = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sq, inv, qty)
        cnt = np.bincount(inv, minlength=len(vals)).astype(np.int64)
        return pa.table({"pk": pa.array(vals), "sq": pa.array(sq),
                         "cnt": pa.array(cnt)})

    stats = (li.map_batches(stats_partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("pk")
             .aggregate(Sum("sq", alias_name="sq"),
                        Sum("cnt", alias_name="cnt"))
             .to_pandas())
    st_order = np.argsort(stats["pk"].to_numpy())
    st_ref = ray.put((stats["pk"].to_numpy()[st_order],
                      stats["sq"].to_numpy()[st_order],
                      stats["cnt"].to_numpy()[st_order]))

    def probe(t: pa.Table) -> pa.Table:
        import ray as _r

        spk, ssq, scnt = _r.get(st_ref)
        if len(spk) == 0:
            return pa.table({"rev_c": pa.array([0], pa.int64()),
                             "n": pa.array([0], pa.int64())})
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(spk, pk), len(spk) - 1)
        m = spk[pos] == pk
        qty = _cents(t["l_quantity"]).to_numpy()[m]
        price = _cents(t["l_extendedprice"]).to_numpy()[m]
        sq, cnt = ssq[pos[m]], scnt[pos[m]]
        keep = 5 * qty * cnt < sq
        return pa.table({"rev_c": pa.array([int(price[keep].sum())]),
                         "n": pa.array([int(keep.sum())])})

    agg = (li.map_batches(probe, batch_format="pyarrow", batch_size=65536)
           .aggregate(Sum("rev_c", alias_name="rev_c"),
                      Sum("n", alias_name="n")))
    return rd.from_arrow(pa.table({"rev_c": pa.array([agg["rev_c"]], pa.int64()),
                                   "n": pa.array([agg["n"]], pa.int64())}))


def q_event_gap_lag(sf_dir: str) -> "rd.Dataset":
    """LAG window (ops/window.grouped_lag): per event, microseconds since
    the same user's previous event (ordered by ts with event_id as the
    total-order tiebreak), -1 on each user's first event. One bucketed
    exchange + one lexsort; the lagged value is exact int64 microseconds."""
    from ..ops.window import grouped_lag

    ev = _rp(f"{sf_dir}/events.parquet",
             columns=["event_id", "ts", "user_id"])
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
    ])
    lagged = grouped_lag(
        ev, key_col="user_id", order_col="ts", tiebreak_col="event_id",
        value_col="ts", schema=schema, out_col="prev_ts",
    )

    def finish(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64())
        gap = pc.fill_null(pc.subtract(ts, t["prev_ts"]), -1)
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "ts": t["ts"], "gap_us": gap})

    return (lagged.map_batches(finish, batch_format="pyarrow",
                               batch_size=65536)
            .sort("event_id"))


def _custkeys_by_year(sf_dir: str, year: int) -> "rd.Dataset":
    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey", "o_orderdate"])
    lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"))
    hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"))

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        return t.filter(m).select(["o_custkey"])

    return orders.map_batches(f, batch_format="pyarrow", batch_size=65536)


def q_repeat_customers_1995_1996(sf_dir: str) -> "rd.Dataset":
    """Distinct set INTERSECT (ops/setops.key_set_op): customers who ordered
    in BOTH 1995 and 1996. Each side ships per-batch DISTINCT keys tagged
    with a side bit; one bucketed exchange ORs the bits per key."""
    from ..ops.setops import key_set_op

    out = key_set_op(
        _custkeys_by_year(sf_dir, 1995), _custkeys_by_year(sf_dir, 1996),
        left_key="o_custkey", right_key="o_custkey",
        op="intersect", out_col="custkey",
    )
    return out.sort("custkey")


def q_lapsed_customers_1995(sf_dir: str) -> "rd.Dataset":
    """Distinct set EXCEPT (ops/setops.key_set_op): customers who ordered in
    1995 but not in 1996 — same machinery as the intersect, mask = left-bit
    only."""
    from ..ops.setops import key_set_op

    out = key_set_op(
        _custkeys_by_year(sf_dir, 1995), _custkeys_by_year(sf_dir, 1996),
        left_key="o_custkey", right_key="o_custkey",
        op="except", out_col="custkey",
    )
    return out.sort("custkey")


def q_sales_rollup(sf_dir: str) -> "rd.Dataset":
    """GROUP BY ROLLUP(priority, status) in one scan: each batch aggregates
    the finest (priority, status) grouping vectorized, then REPLAYS those
    partials for the (priority, ALL) and (ALL, ALL) sets — the shuffle
    carries 3x the (tiny) distinct-group count, never 3x the rows. NULL
    rollup markers travel as the literal 'ALL' (COALESCE'd identically in
    the oracle) so the value hash is null-free."""
    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        base = pa.table({
            "priority": t["o_orderpriority"],
            "status": t["o_orderstatus"],
            "rev_c": _cents(t["o_totalprice"]),
        })
        fine = (base.group_by(["priority", "status"])
                .aggregate([("rev_c", "sum"), ([], "count_all")])
                .rename_columns(["priority", "status", "rev_c", "n"]))
        allc = pa.array(np.repeat("ALL", fine.num_rows), pa.string())
        mid = fine.set_column(1, "status", allc)
        top = mid.set_column(0, "priority", allc)
        return pa.concat_tables([fine, mid, top])

    return (orders.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(["priority", "status"])
            .aggregate(Sum("rev_c", alias_name="rev_c"),
                       Sum("n", alias_name="n"))
            .sort(["priority", "status"]))


def q_epoch_shuffle_head(sf_dir: str) -> "rd.Dataset":
    """Deterministic epoch shuffle, first 100: training-data epoch order is
    'sort by keyed hash' — stable across runs, re-shardings and cluster
    sizes, and exactly SQL-mirrorable ((k*2654435761+7) mod 2^32, the same
    hash contract as hash_split). The global head-100 never sorts the
    corpus: each batch keeps its 100 smallest (hash, id) pairs via one
    lexsort, and only those partials meet for the final top-k."""
    from ..ops.sample import _KNUTH

    ev = _rp(f"{sf_dir}/events.parquet", columns=["event_id"])
    K = 100

    def partial(t: pa.Table) -> pa.Table:
        k = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((k * np.uint64(_KNUTH) + np.uint64(7))
             & np.uint64(0xFFFFFFFF)).astype(np.int64)
        order = np.lexsort((k.astype(np.int64), h))[:K]
        return pa.table({"event_id": pa.array(k[order].astype(np.int64)),
                         "shuffle_key": pa.array(h[order])})

    return (ev.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .sort(["shuffle_key", "event_id"])
            .limit(K))


def _year_order_counts(sf_dir: str, year: int, key_out: str,
                       cnt_out: str) -> "rd.Dataset":
    """Per-customer order counts for one calendar year, reduced from
    per-batch partials in one bucketed exchange (no order rows shuffled)."""
    from ..ops.exchange import exchange_map_groups

    src = _custkeys_by_year(sf_dir, year)

    def partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(ck, return_counts=True)
        return pa.table({key_out: pa.array(vals, pa.int64()),
                         cnt_out: pa.array(cnts.astype(np.int64))})

    def combine(g: pa.Table) -> pa.Table:
        ck = g[key_out].to_numpy(zero_copy_only=False)
        cnt = g[cnt_out].to_numpy(zero_copy_only=False)
        vals, inv = np.unique(ck, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, cnt)
        return pa.table({key_out: pa.array(vals, pa.int64()),
                         cnt_out: pa.array(sums)})

    schema = pa.schema([(key_out, pa.int64()), (cnt_out, pa.int64())])

    def bucket_fn(t: pa.Table) -> np.ndarray:
        k = t.column(key_out).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (k % np.uint64(256)).astype(np.int64)

    return exchange_map_groups(
        src.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        combine, None, 256, schema.empty_table(), bucket_fn=bucket_fn,
    )


def q_customer_year_activity(sf_dir: str) -> "rd.Dataset":
    """FULL OUTER join (ops/join.bucket_join how=outer): per-customer order
    counts in 1995 vs 1996, customers active in EITHER year surviving with
    the other side's count null -> 0. The join inputs are the pre-aggregated
    per-customer counts (one tiny exchange each), never the order rows; the
    coalesced key proves both null sides travel correctly."""
    from ..ops.join import bucket_join

    a = _year_order_counts(sf_dir, 1995, "ck95", "n95")
    b = _year_order_counts(sf_dir, 1996, "ck96", "n96")
    j = bucket_join(
        a, b, left_on="ck95", right_on="ck96", how="outer",
        left_schema=pa.schema([("ck95", pa.int64()), ("n95", pa.int64())]),
        right_schema=pa.schema([("ck96", pa.int64()), ("n96", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        ck = pc.coalesce(t["ck95"], t["ck96"])
        return pa.table({
            "custkey": ck,
            "n_1995": pc.fill_null(t["n95"], 0),
            "n_1996": pc.fill_null(t["n96"], 0),
        })

    return (j.map_batches(finish, batch_format="pyarrow", batch_size=65536)
            .sort("custkey"))


def q_events_unpivot(sf_dir: str) -> "rd.Dataset":
    """Melt (ops/pivot.unpivot): the wide per-day pivot back to long
    (day, event_type, sum_value_c) — pivot's inverse as a pure per-batch
    reshape, zero-filled combinations preserved (the oracle reconstructs
    them with a day x type grid)."""
    from ..ops.pivot import unpivot

    wide = q_events_pivot(sf_dir)
    cats = ["click", "error", "purchase", "signup", "view"]
    return unpivot(
        wide, id_cols=["day"], value_cols=[f"{c}_c" for c in cats],
        var_name="event_type", value_name="sum_value_c", labels=cats,
    ).sort(["day", "event_type"])


def q_monthly_revenue_delta(sf_dir: str) -> "rd.Dataset":
    """Month-over-month revenue delta: tumbling monthly aggregate composed
    with the LAG window operator (constant partition key — the series is
    months, tiny by construction). delta_c = rev_c - prev month's rev_c,
    first month against 0."""
    from ..ops.window import grouped_lag

    o = _rp(f"{sf_dir}/orders.parquet",
            columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.floor_temporal(t["o_orderdate"], unit="month"),
            "rev_c": _cents(t["o_totalprice"]),
        })

    monthly = (o.map_batches(prep, batch_format="pyarrow", batch_size=65536)
               .groupby("month")
               .aggregate(Sum("rev_c", alias_name="rev_c")))

    def add_key(t: pa.Table) -> pa.Table:
        k = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        m = t["month"].cast(pa.int64())
        return pa.table({"__k": k, "month": t["month"], "m_i": m,
                         "rev_c": t["rev_c"]})

    keyed = monthly.map_batches(add_key, batch_format="pyarrow")
    schema = pa.schema([("__k", pa.int64()), ("month", pa.timestamp("us")),
                        ("m_i", pa.int64()), ("rev_c", pa.int64())])
    lagged = grouped_lag(keyed, key_col="__k", order_col="m_i",
                         tiebreak_col="m_i", value_col="rev_c",
                         schema=schema, out_col="prev_rev_c")

    def finish(t: pa.Table) -> pa.Table:
        prev = pc.fill_null(t["prev_rev_c"], 0)
        return pa.table({
            "month": t["month"], "rev_c": t["rev_c"],
            "delta_c": pc.subtract(t["rev_c"], prev),
        })

    return (lagged.map_batches(finish, batch_format="pyarrow")
            .sort("month"))


def q_events_in_all_order_windows(sf_dir: str) -> "rd.Dataset":
    """Distributed range join (ops/interval.range_join_binned): count events
    inside EVERY order's 3-day window — the interval side is the full orders
    table (15k windows at sf0.01, 10^9+ in prod), so nothing broadcasts:
    intervals replicate clipped to day cells, points route to their cell,
    one exchange, and the per-partition match is a single searchsorted over
    ts-sorted points (cells are disjoint ranges, so raw-ts order IS
    (cell, ts) order). Windows anchor inside the events epoch as a
    deterministic function of the order key (same contract as
    events_in_order_windows)."""
    from ..ops.interval import range_join_binned

    orders = _rp(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    epoch = np.int64(np.datetime64("2024-01-01", "us").view("i8"))
    day_us = np.int64(86_400_000_000)

    def mk_windows(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = epoch + (k % 28) * day_us
        return pa.table({"win_id": pa.array(k),
                         "start": pa.array(start),
                         "end": pa.array(start + 3 * day_us)})

    iv = orders.map_batches(mk_windows, batch_format="pyarrow",
                            batch_size=65536)
    ev = _rp(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    joined = range_join_binned(
        ev, iv, ts_col="ts",
        point_schema=pa.schema([("event_id", pa.int64()),
                                ("ts", pa.timestamp("us"))]),
        bin_us=int(day_us),
    )
    return (joined.groupby("win_id")
            .aggregate(Count(alias_name="n_events"))
            .sort("win_id"))


def q_nation_pair_volume(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q7 shape (volume shipping between two nations): revenue by
    (supp_nation, cust_nation, year) for the NATION_13/NATION_19 pair, either
    direction, 1996-1997 shipments. Supplier is the tiny dim — its
    two-nation slice broadcasts into the lineitem scan (inner merge doubles
    as the supplier filter). The customer side is size-gated: the
    two-nation customer slice broadcasts into orders below the gate, else
    it hash-joins. The only fact-fact exchange is lineitem x orders on
    orderkey; revenue collapses per batch to (supp, cust, year) partials
    before a 4-row groupby. Both-in-pair + s != c is exactly the Q7
    either-direction predicate."""
    nat = _rp(f"{sf_dir}/nation.parquet",
              columns=["n_nationkey", "n_name"]).to_pandas()
    keys = {n: k for k, n in zip(nat.n_nationkey, nat.n_name)}
    k1, k2 = keys["NATION_13"], keys["NATION_19"]

    sup = _rp(f"{sf_dir}/supplier.parquet",
              columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup.s_nationkey.isin([k1, k2])]
    sup = pd.DataFrame({"s_suppkey": sup.s_suppkey,
                        "s_nat": sup.s_nationkey.astype("int64")})

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"))
    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount", "l_shipdate"])

    def l_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "l_year": pc.year(t["l_shipdate"]).cast(pa.int64()),
                         "rev_c": _cents(rev)})

    li_s = broadcast_join(
        li.map_batches(l_prep, batch_format="pyarrow", batch_size=65536),
        sup, left_on="l_suppkey", right_on="s_suppkey")

    cust = _rp(f"{sf_dir}/customer.parquet",
               columns=["c_custkey", "c_nationkey"])

    def c_prep(t: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(t["c_nationkey"], pa.scalar(int(k1))),
                   pc.equal(t["c_nationkey"], pa.scalar(int(k2))))
        t = t.filter(m)
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_nat": t["c_nationkey"].cast(pa.int64())})

    cust2 = cust.map_batches(c_prep, batch_format="pyarrow",
                             batch_size=65536).materialize()
    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_custkey"])
    if cust2.count() <= 2_000_000:
        ord_n = broadcast_join(orders, cust2.to_pandas(),
                               left_on="o_custkey", right_on="c_custkey")
    else:
        ord_n = hash_join(orders, cust2, on="o_custkey",
                          right_on="c_custkey")
    joined = hash_join(li_s, ord_n, on="l_orderkey", right_on="o_orderkey")

    name_of = {int(k1): "NATION_13", int(k2): "NATION_19"}

    def partial(t: pa.Table) -> pa.Table:
        s = t["s_nat"].to_numpy(zero_copy_only=False)
        c = t["c_nat"].to_numpy(zero_copy_only=False)
        keep = s != c
        s, c = s[keep], c[keep]
        y = t["l_year"].to_numpy(zero_copy_only=False)[keep]
        r = t["rev_c"].to_numpy(zero_copy_only=False)[keep]
        # pack (s-bit, year) into one int key: both nations + few years
        key = (s == int(k2)).astype(np.int64) * 10_000 + y
        vals, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, r)
        sk = np.where(vals >= 10_000, int(k2), int(k1))
        ck = np.where(vals >= 10_000, int(k1), int(k2))
        return pa.table({
            "supp_nation": pa.array([name_of[int(x)] for x in sk]),
            "cust_nation": pa.array([name_of[int(x)] for x in ck]),
            "l_year": pa.array(vals % 10_000, pa.int64()),
            "revenue_c": pa.array(sums),
        })

    return (joined.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .aggregate(Sum("revenue_c", alias_name="revenue_c"))
            .sort(["supp_nation", "cust_nation", "l_year"]))


def q_nation_market_share(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q8 shape (national market share): among PROMO-type parts
    ordered 1995-1996 by ASIA-region customers, NATION_12-supplier revenue
    vs total revenue per order year. Share is reported as the exact int64
    pair (nation_rev_c, total_rev_c) — no float division on either side,
    so the value hash is rounding-free. Part keys and the supplier->nation
    flag are dim broadcasts; customer routing is the same size-gated
    broadcast as Q7; the one fact-fact exchange is lineitem x orders."""
    nat = _rp(f"{sf_dir}/nation.parquet",
              columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _rp(f"{sf_dir}/region.parquet",
              columns=["r_regionkey", "r_name"]).to_pandas()
    asia = nat.merge(reg[reg.r_name == "ASIA"], left_on="n_regionkey",
                     right_on="r_regionkey")
    asia_keys = set(asia.n_nationkey)
    k5 = int(nat[nat.n_name == "NATION_12"].n_nationkey.iloc[0])

    part = _rp(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    pk = part.map_batches(
        lambda t: t.filter(pc.equal(t["p_type"], pa.scalar("PROMO")))
        .select(["p_partkey"]),
        batch_format="pyarrow", batch_size=65536).to_pandas()

    sup = _rp(f"{sf_dir}/supplier.parquet",
              columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = pd.DataFrame({"s_suppkey": sup.s_suppkey,
                        "is_n5": (sup.s_nationkey == k5).astype("int64")})

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_orderkey", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_discount"])

    def l_prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_partkey": t["l_partkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev_c": _cents(rev)})

    li_p = broadcast_join(
        li.map_batches(l_prep, batch_format="pyarrow", batch_size=65536),
        pk, left_on="l_partkey", right_on="p_partkey")
    li_ps = broadcast_join(li_p, sup, left_on="l_suppkey",
                           right_on="s_suppkey")

    lo = pa.scalar(np.datetime64("1995-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))
    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        t = t.filter(m)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "o_year": pc.year(t["o_orderdate"]).cast(pa.int64())})

    cust = _rp(f"{sf_dir}/customer.parquet",
               columns=["c_custkey", "c_nationkey"])
    ck_arr = pa.array(sorted(int(x) for x in asia_keys), pa.int64())

    def c_prep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["c_nationkey"].cast(pa.int64()), value_set=ck_arr)
        return t.filter(m).select(["c_custkey"])

    cust_a = cust.map_batches(c_prep, batch_format="pyarrow",
                              batch_size=65536).materialize()
    ords = orders.map_batches(o_prep, batch_format="pyarrow",
                              batch_size=65536)
    if cust_a.count() <= 2_000_000:
        ord_a = broadcast_join(ords, cust_a.to_pandas(),
                               left_on="o_custkey", right_on="c_custkey")
    else:
        ord_a = hash_join(ords, cust_a, on="o_custkey",
                          right_on="c_custkey")
    joined = hash_join(li_ps, ord_a, on="l_orderkey", right_on="o_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        y = t["o_year"].to_numpy(zero_copy_only=False)
        r = t["rev_c"].to_numpy(zero_copy_only=False)
        f = t["is_n5"].to_numpy(zero_copy_only=False)
        vals, inv = np.unique(y, return_inverse=True)
        tot = np.zeros(len(vals), dtype=np.int64)
        n5 = np.zeros(len(vals), dtype=np.int64)
        np.add.at(tot, inv, r)
        np.add.at(n5, inv, r * f)
        return pa.table({"o_year": pa.array(vals, pa.int64()),
                         "nation_rev_c": pa.array(n5),
                         "total_rev_c": pa.array(tot)})

    return (joined.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("o_year")
            .aggregate(Sum("nation_rev_c", alias_name="nation_rev_c"),
                       Sum("total_rev_c", alias_name="total_rev_c"))
            .sort("o_year"))


def q_top_supplier(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q15 shape (max-over-aggregate with ties): per-supplier revenue
    for 1996Q1 shipments via the bucketed vectorized reduce (suppkey is the
    key — 10k/SF), then the global max is ONE tiny driver scalar from an
    aggregate over the per-supplier sums (never the fact table), and the
    tie-preserving equality filter + supplier-name broadcast finish it.
    The fact table is scanned once; nothing else shuffles."""
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))
    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_suppkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])
    B = 64

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        r = _cents(rev).to_numpy(zero_copy_only=False)
        vals, inv = np.unique(sk, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, r)
        return pa.table({"s_suppkey": pa.array(vals, pa.int64()),
                         "total_revenue_c": pa.array(sums),
                         "__bkt": pa.array((vals % B).astype(np.int32))})

    def combine(g: pa.Table) -> pa.Table:
        sk = g["s_suppkey"].to_numpy(zero_copy_only=False)
        r = g["total_revenue_c"].to_numpy(zero_copy_only=False)
        vals, inv = np.unique(sk, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, r)
        return pa.table({"s_suppkey": pa.array(vals, pa.int64()),
                         "total_revenue_c": pa.array(sums)})

    per_supp = (li.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
                .groupby("__bkt").map_groups(combine, batch_format="pyarrow")
                .materialize())
    best = per_supp.aggregate(Max("total_revenue_c"))
    best_v = int(best["max(total_revenue_c)"])

    winners = per_supp.filter(
        expr=f"total_revenue_c == {best_v}")
    names = _rp(f"{sf_dir}/supplier.parquet",
                columns=["s_suppkey", "s_name"]).to_pandas()
    return (broadcast_join(winners, names, left_on="s_suppkey")
            .select_columns(["s_suppkey", "s_name", "total_revenue_c"])
            .sort("s_suppkey"))


def q_discount_brand_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19 shape (disjunctive multi-clause predicate scan): revenue
    from three OR'd (brand, size-range, quantity-range) clauses. The part
    dim is pre-pruned to the three brands BEFORE broadcasting (only
    matching partkeys ship to workers), the per-batch predicate is one
    vectorized boolean expression over the merged batch, and the result is
    a single global int64 sum — partials collapse per batch, nothing
    shuffles. Returns a one-row Arrow table."""
    part = _rp(f"{sf_dir}/part.parquet",
               columns=["p_partkey", "p_brand", "p_size"])

    def p_prep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["p_brand"],
                     value_set=pa.array(["Brand#12", "Brand#23", "Brand#34"]))
        return t.filter(m)

    pk = part.map_batches(p_prep, batch_format="pyarrow",
                          batch_size=65536).to_pandas()

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_partkey", "l_quantity", "l_extendedprice",
                      "l_discount"])
    merged = broadcast_join(li, pk, left_on="l_partkey",
                            right_on="p_partkey")

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"]
        sz = t["p_size"]
        b = t["p_brand"]

        def clause(brand, smax, qlo, qhi):
            return pc.and_(
                pc.and_(pc.equal(b, pa.scalar(brand)),
                        pc.and_(pc.greater_equal(sz, pa.scalar(1)),
                                pc.less_equal(sz, pa.scalar(smax)))),
                pc.and_(pc.greater_equal(q, pa.scalar(float(qlo))),
                        pc.less_equal(q, pa.scalar(float(qhi)))))

        m = pc.or_(pc.or_(clause("Brand#12", 15, 1, 11),
                          clause("Brand#23", 25, 10, 20)),
                   clause("Brand#34", 35, 20, 30))
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        s = pc.sum(_cents(rev))
        v = 0 if s.as_py() is None else s.as_py()
        return pa.table({"revenue_c": pa.array([v], pa.int64())})

    total = (merged.map_batches(partial, batch_format="pyarrow",
                                batch_size=65536)
             .aggregate(Sum("revenue_c", alias_name="revenue_c")))
    return pa.table({"revenue_c": pa.array([int(total["revenue_c"])],
                                           pa.int64())})


def q_priority_order_counts(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q4 shape (EXISTS semi-join then grouped count): orders placed
    1996H1 that have at least one returned line (l_returnflag = 'R'),
    counted per order priority. The EXISTS set is the bucketed DISTINCT of
    returned orderkeys (per-batch np.unique partials, one small exchange);
    below the gate it broadcasts into the orders scan as one sorted int64
    membership array (np.isin — vectorized, no hash dict), else it routes
    through the bucketed hash join. The fact table never shuffles."""
    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_orderkey", "l_returnflag"])
    B = 64

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        ok = np.unique(t["l_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table({"ok": pa.array(ok, pa.int64()),
                         "__bkt": pa.array((ok % B).astype(np.int32))})

    def combine(g: pa.Table) -> pa.Table:
        ok = np.unique(g["ok"].to_numpy(zero_copy_only=False))
        return pa.table({"ok": pa.array(ok, pa.int64())})

    returned = (li.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
                .groupby("__bkt").map_groups(combine, batch_format="pyarrow")
                .materialize())

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-07-01", "us"))
    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_window(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        return t.filter(m).select(["o_orderkey", "o_orderpriority"])

    ords = orders.map_batches(o_window, batch_format="pyarrow",
                              batch_size=65536)
    if returned.count() <= 2_000_000:
        import ray as _ray
        keys_ref = _ray.put(np.sort(
            returned.to_pandas()["ok"].to_numpy()))

        def member(t: pa.Table) -> pa.Table:
            keys = _ray.get(keys_ref)
            ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(ok, keys)))

        sem = ords.map_batches(member, batch_format="pyarrow",
                               batch_size=65536)
    else:
        sem = hash_join(ords, returned, on="o_orderkey", right_on="ok")
    return (sem.groupby("o_orderpriority")
            .aggregate(Count(alias_name="order_count"))
            .sort("o_orderpriority"))


def q_waiting_suppliers(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q21 shape (EXISTS + NOT-EXISTS self-join on the fact table):
    suppliers who were the SOLE late supplier (shipped >= 60 days after the
    order date — the schema has no commit/receipt dates) on a finished
    multi-supplier order. One fact-fact exchange joins lineitem x filtered
    orders; per-batch partials reduce to distinct (orderkey, suppkey,
    late-max) triples; ONE bucketed exchange on orderkey colocates each
    order's triples, and the per-bucket kernel is pure lexsort/reduceat —
    per order: distinct-supplier count, late count, and (when exactly one
    supplier is late and another exists) that supplier, recovered as
    sum(late*suppkey) without any per-order Python."""
    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_orderstatus", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))
        return t.select(["o_orderkey", "o_orderdate"])

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    joined = hash_join(
        li, orders.map_batches(o_prep, batch_format="pyarrow",
                               batch_size=65536),
        on="l_orderkey", right_on="o_orderkey")
    B = 64
    late_us = np.int64(60) * 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False).view("i8")
        odate = t["o_orderdate"].to_numpy(zero_copy_only=False).view("i8")
        late = (ship >= odate + late_us).astype(np.int64)
        idx = np.lexsort((sk, ok))
        ok, sk, late = ok[idx], sk[idx], late[idx]
        new = np.empty(len(ok), dtype=bool)
        new[:1] = True
        new[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        seg = np.flatnonzero(new)
        late_max = np.maximum.reduceat(late, seg) if len(seg) else late[:0]
        ok, sk = ok[new], sk[new]
        return pa.table({"ok": pa.array(ok), "sk": pa.array(sk),
                         "late": pa.array(late_max),
                         "__bkt": pa.array((ok % B).astype(np.int32))})

    def blame(g: pa.Table) -> pa.Table:
        ok = g["ok"].to_numpy(zero_copy_only=False)
        sk = g["sk"].to_numpy(zero_copy_only=False)
        late = g["late"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((sk, ok))
        ok, sk, late = ok[idx], sk[idx], late[idx]
        new = np.empty(len(ok), dtype=bool)
        new[:1] = True
        new[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        seg = np.flatnonzero(new)
        late = np.maximum.reduceat(late, seg) if len(seg) else late[:0]
        ok, sk = ok[new], sk[new]
        onew = np.empty(len(ok), dtype=bool)
        onew[:1] = True
        onew[1:] = ok[1:] != ok[:-1]
        oseg = np.flatnonzero(onew)
        if not len(oseg):
            return pa.table({"s_suppkey": pa.array([], pa.int64())})
        n_pairs = np.diff(np.append(oseg, len(ok)))
        n_late = np.add.reduceat(late, oseg)
        late_sk = np.add.reduceat(late * sk, oseg)
        hit = (n_pairs >= 2) & (n_late == 1)
        return pa.table({"s_suppkey": pa.array(late_sk[hit], pa.int64())})

    blamed = (joined.map_batches(partial, batch_format="pyarrow",
                                 batch_size=65536)
              .groupby("__bkt").map_groups(blame, batch_format="pyarrow"))
    counts = (blamed.groupby("s_suppkey")
              .aggregate(Count(alias_name="numwait")))
    names = _rp(f"{sf_dir}/supplier.parquet",
                columns=["s_suppkey", "s_name"]).to_pandas()
    return (broadcast_join(counts, names, left_on="s_suppkey")
            .select_columns(["s_name", "numwait"])
            .sort(["numwait", "s_name"], descending=[True, False])
            .limit(10))


def q_doc_bigram_lm(sf_dir: str) -> "rd.Dataset":
    """Corpus bigram-LM document scoring (ops/lm.py): train bigram counts
    over the documents table in one exploded-census pass, then score every
    doc by the summed quantized log-frequency of its bigram instances —
    the count-based core of a CCNet/Gopher-style LM quality filter, exact
    int64 micro-units end-to-end. The DuckDB oracle recomputes counts and
    scores on bigram STRINGS, guarding the 64-bit gram-hash identity too."""
    from ..ops.lm import bigram_lm_scores

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bigram_lm_scores(docs).sort("doc_id")


def q_doc_mixture_sample(sf_dir: str) -> "rd.Dataset":
    """Deterministic training-mixture weighting (ops/sample.mixture_sample):
    per-source rates upsample src0 2.5x (two guaranteed copies + a
    key-chosen half), keep src1 whole, thin src2 to 0.4, drop src3, and
    default everything else to 0.25. Membership and copy count are pure
    functions of (doc_id, source) via splitmix64, so the multiset is
    identical under any re-sharding; the DuckDB oracle replays the hash
    chain in HUGEINT arithmetic and expands copies with generate_series."""
    from ..ops.sample import mixture_sample

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    out = mixture_sample(docs, source_col="source", key="doc_id",
                         rates={"src0": 2.5, "src1": 1.0, "src2": 0.4,
                                "src3": 0.0},
                         default_rate=0.25)
    return out.select_columns(["doc_id", "source", "epoch"]).sort(
        ["doc_id", "epoch"])


def q_doc_triangles(sf_dir: str) -> "rd.Dataset":
    """Distributed triangle enumeration (ops/triangles.py, degree-ordered
    orientation) over the same planted deterministic doc graph as
    q_doc_pagerank; each triangle emitted once as a sorted (a, b, c) row.
    The oracle closes wedges with a 3-way self-join on the DISTINCT
    undirected edge set."""
    from ..ops.triangles import enumerate_triangles

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()  # parquet metadata count — no scan

    def edges(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        reps = (d % 3 + 1).astype(np.int64)
        src = np.repeat(d, reps)
        offs = np.arange(len(src), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        dst = (src * 48271 + offs + 1) % n
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    tri = enumerate_triangles(docs.map_batches(edges,
                                               batch_format="pyarrow"))
    return tri.sort(["a", "b", "c"])


def q_source_kl(sf_dir: str) -> "rd.Dataset":
    """Per-source vocabulary drift (ops/drift.source_kl): KL(source||corpus)
    over the unigram census in exact micro-units. One token-bucketed
    exchange attaches corpus totals locally (every source's rows for a
    token land in the same bucket); the oracle evaluates the identical
    IEEE-double term tree on the same integer counts."""
    from ..ops.drift import source_kl

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return source_kl(docs)


def q_user_type_history(sf_dir: str) -> "rd.Dataset":
    """SCD2 change history (ops/window.scd2_history): per user, the
    event-type change log with validity intervals — valid_from = the
    change's timestamp (microseconds), valid_to = the next change's (null
    while current). Event types map to dense ids via the tiny sorted
    distinct-type table (driver-held; the oracle derives the identical
    mapping with row_number over DISTINCT)."""
    from ..ops.window import scd2_history

    ev = _rp(f"{sf_dir}/events.parquet",
             columns=["event_id", "ts", "user_id", "event_type"])
    types = sorted(set(
        ev.groupby("event_type").count().to_pandas()["event_type"]))
    tid_of = {t: i + 1 for i, t in enumerate(types)}

    def prep(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        # tid lookup once per DISTINCT type, then one vectorized gather
        lut = np.array([tid_of[x] for x in enc.dictionary.to_pylist()],
                       dtype=np.int64)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"].cast(pa.int64()),
            "o": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"].cast(pa.int64()),
            "type_id": pa.array(lut[codes], pa.int64()),
        })

    schema = pa.schema([("user_id", pa.int64()), ("o", pa.int64()),
                        ("event_id", pa.int64()), ("type_id", pa.int64())])
    hist = scd2_history(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        key_col="user_id", order_col="o", tiebreak_col="event_id",
        value_col="type_id", schema=schema)
    return hist.sort(["user_id", "valid_from", "change_id"])


def q_source_overlap(sf_dir: str) -> "rd.Dataset":
    """Cross-source duplicate-overlap matrix (ops/drift.source_overlap):
    distinct shared contents per source pair. Every 5th doc's text is
    replaced by one of 7 canonical strings (planted mirror content — the
    raw corpus is all-unique), so the matrix is non-trivial; the DuckDB
    oracle plants identically and intersects on full strings."""
    from ..ops.drift import source_overlap

    docs = _rp(f"{sf_dir}/documents.parquet",
               columns=["doc_id", "source", "text"])

    def plant(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        shared = pc.binary_join_element_wise(
            pa.array(np.full(len(d), "SHARED_")),
            pa.array((d % 7).astype("U1")), "")
        txt = pc.if_else(pa.array(d % 5 == 0), shared, t["text"])
        return pa.table({"source": t["source"], "text": txt})

    return source_overlap(
        docs.map_batches(plant, batch_format="pyarrow", batch_size=8192))


def q_events_cdc_snapshot(sf_dir: str) -> "rd.Dataset":
    """CDC apply (ops/compact.apply_cdc): the epoch's first half compacts
    into a base snapshot (latest event per user), the second half replays
    as a changelog where every 17th event id is a DELETE tombstone; the
    result is the maintained snapshot — upserts win by recency, deleted
    users drop out. One exchange builds the base, one applies the log."""
    from ..ops.compact import apply_cdc, latest_per_key

    ev = _rp(f"{sf_dir}/events.parquet",
             columns=["event_id", "ts", "user_id", "value"])
    split = int(np.datetime64("2024-02-15", "us").view("i8"))

    def prep(lo: bool):
        def f(t: pa.Table) -> pa.Table:
            o = t["ts"].cast(pa.int64())
            mask = (pc.less(o, pa.scalar(split)) if lo
                    else pc.greater_equal(o, pa.scalar(split)))
            t = t.filter(mask)
            o = t["ts"].cast(pa.int64())
            eid = t["event_id"].cast(pa.int64())
            if lo:
                op = pa.array(np.full(t.num_rows, "U"), pa.string())
            else:
                tomb = eid.to_numpy(zero_copy_only=False) % 17 == 0
                op = pa.array(np.where(tomb, "D", "U"))
            return pa.table({
                "user_id": t["user_id"].cast(pa.int64()),
                "event_id": eid, "o": o,
                "value_c": _cents(t["value"]), "op": op,
            })

        return f

    schema = pa.schema([("user_id", pa.int64()), ("event_id", pa.int64()),
                        ("o", pa.int64()), ("value_c", pa.int64()),
                        ("op", pa.string())])
    first = ev.map_batches(prep(True), batch_format="pyarrow",
                           batch_size=65536)
    base = latest_per_key(first, "user_id", "o", "event_id", schema)
    changes = ev.map_batches(prep(False), batch_format="pyarrow",
                             batch_size=65536)
    snap = apply_cdc(base, changes, "user_id", "o", "event_id", "op",
                     schema)

    def out(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "last_event_id": t["event_id"],
            "last_ts_us": t["o"],
            "last_value_c": t["value_c"],
        })

    return snap.map_batches(out, batch_format="pyarrow").sort("user_id")


def q_docs_evolved_union(sf_dir: str) -> "rd.Dataset":
    """Schema-evolution reader (sources/parquet.read_parquet_evolved):
    three ingest epochs of the documents table carry different column
    sets — epoch 1 (doc_id, lang), epoch 2 (doc_id, lang, source),
    epoch 3 (doc_id, source) — written as real parquet files and read
    back as ONE dataset over the union schema with nulls where a column
    didn't exist yet. The oracle derives the identical null pattern from
    the registered documents view with CASE on the epoch boundaries."""
    import os
    import tempfile

    import pyarrow.parquet as pq_

    from ..sources.parquet import read_parquet_evolved

    full = _rp(f"{sf_dir}/documents.parquet",
               columns=["doc_id", "lang", "source"]).to_arrow_refs()
    import ray as _ray

    t = pa.concat_tables(_ray.get(full))
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    d = t["doc_id"].to_numpy()
    out_dir = os.path.join(tempfile.gettempdir(),
                           f"evolved_{abs(hash(sf_dir)) % 10**8}")
    os.makedirs(out_dir, exist_ok=True)
    e1 = t.filter(pa.array(d < 150)).select(["doc_id", "lang"])
    e2 = t.filter(pa.array((d >= 150) & (d < 300)))
    e3 = t.filter(pa.array(d >= 300)).select(["doc_id", "source"])
    p1, p2, p3 = (os.path.join(out_dir, f"epoch{i}.parquet")
                  for i in (1, 2, 3))
    pq_.write_table(e1, p1)
    pq_.write_table(e2, p2)
    pq_.write_table(e3, p3)
    return read_parquet_evolved([p1, p2, p3]).sort("doc_id")


def q_order_window_overlaps(sf_dir: str) -> "rd.Dataset":
    """Interval x interval overlap join (ops/interval.interval_overlap_binned):
    every 100th order's 3-day window against EVERY order's 2-day window
    (different anchor modulus), counted per left window. Both interval
    sides are Datasets — nothing broadcasts; pairs emit exactly once at
    the intersection's first cell."""
    from ..ops.interval import interval_overlap_binned

    orders = _rp(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    epoch = np.int64(np.datetime64("2024-01-01", "us").view("i8"))
    day_us = np.int64(86_400_000_000)

    def win_a(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = k[k % 100 == 0]
        start = epoch + (k % 28) * day_us
        return pa.table({"a_id": pa.array(k), "start": pa.array(start),
                         "end": pa.array(start + 3 * day_us)})

    def win_b(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = epoch + (k % 35) * day_us
        return pa.table({"b_id": pa.array(k), "start": pa.array(start),
                         "end": pa.array(start + 2 * day_us)})

    a = orders.map_batches(win_a, batch_format="pyarrow", batch_size=65536)
    b = orders.map_batches(win_b, batch_format="pyarrow", batch_size=65536)
    pairs = interval_overlap_binned(a, b, bin_us=int(day_us))
    return (pairs.groupby("a_id")
            .aggregate(Count(alias_name="n_overlaps"))
            .sort("a_id"))


def q_docs_weighted_sample(sf_dir: str) -> "rd.Dataset":
    """Weighted sampling without replacement, 5 docs per language weighted
    by n_chars (ops/sample.weighted_stratified_sample — Efraimidis-Spirakis
    with hash-derived randomness). The oracle replays the splitmix64 chain
    and the identical u^(1/w) IEEE-double rank in SQL, so even this
    'random' draw is value-hash-checked."""
    from ..ops.sample import weighted_stratified_sample

    docs = _rp(f"{sf_dir}/documents.parquet",
               columns=["doc_id", "lang", "n_chars"])
    out = weighted_stratified_sample(docs, stratum="lang", key="doc_id",
                                     weight="n_chars", k=5)
    return out.sort(["lang", "doc_id"])


def q_product_profit(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q9 shape (product-type profit by nation and year): for parts
    whose name contains 'red', profit = revenue - cost x quantity per
    (supplier nation, order year). The schema has no partsupp, so cost is
    the p_retailprice x 0.8 proxy — the JOIN TOPOLOGY (lineitem x part x
    supplier x orders x nation, 5 tables) is Q9's. Part attrs and the
    supplier->nation map broadcast (dims); the one fact-fact exchange is
    lineitem x orders; per-batch (nation, year) partials collapse before
    the tiny groupby. Profit rows can be negative — int64 cents
    throughout."""
    part = _rp(f"{sf_dir}/part.parquet",
               columns=["p_partkey", "p_name", "p_retailprice"])

    def p_prep(t: pa.Table) -> pa.Table:
        m = pc.match_substring(t["p_name"], "red")
        t = t.filter(m)
        return pa.table({"p_partkey": t["p_partkey"],
                         "p_retailprice": t["p_retailprice"]})

    pk = part.map_batches(p_prep, batch_format="pyarrow",
                          batch_size=65536).to_pandas()

    nat = _rp(f"{sf_dir}/nation.parquet",
              columns=["n_nationkey", "n_name"]).to_pandas()
    sup = _rp(f"{sf_dir}/supplier.parquet",
              columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]]

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                      "l_extendedprice", "l_discount"])
    li_p = broadcast_join(li, pk, left_on="l_partkey",
                          right_on="p_partkey")
    li_ps = broadcast_join(li_p, sup, left_on="l_suppkey",
                           right_on="s_suppkey")

    def amount(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cost = pc.multiply(pc.multiply(t["p_retailprice"],
                                       pa.scalar(0.8)), t["l_quantity"])
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "n_name": t["n_name"],
            "amount_c": pc.subtract(_cents(rev), _cents(cost)),
        })

    orders = _rp(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_year": pc.year(t["o_orderdate"]).cast(
                             pa.int64())})

    joined = hash_join(
        li_ps.map_batches(amount, batch_format="pyarrow",
                          batch_size=65536),
        orders.map_batches(o_prep, batch_format="pyarrow",
                           batch_size=65536),
        on="l_orderkey", right_on="o_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "n_name": t["n_name"].to_numpy(zero_copy_only=False),
            "o_year": t["o_year"].to_numpy(zero_copy_only=False),
            "profit_c": t["amount_c"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["n_name", "o_year"], sort=False, as_index=False)[
            "profit_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(["n_name", "o_year"])
            .aggregate(Sum("profit_c", alias_name="profit_c"))
            .sort(["n_name", "o_year"]))


def q_parts_supplier_counts(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q16 shape (distinct-supplier counts per part attribute group
    with a NOT-IN supplier exclusion): the part-supplier relation is the
    DISTINCT (l_partkey, l_suppkey) of lineitem (no partsupp in schema),
    negative-balance suppliers are excluded (the 'complaints' NOT IN),
    and the count per (brand, type, size) is a true distinct-count. One
    bucketed exchange keyed by the group hash — each kernel sees all of
    its groups' rows, dedups (group, supplier) locally and counts."""
    from ..functions.hashing import hash64_np

    sup = _rp(f"{sf_dir}/supplier.parquet",
              columns=["s_suppkey", "s_acctbal"]).to_pandas()
    bad = set(sup[sup.s_acctbal < 0].s_suppkey)
    part = _rp(f"{sf_dir}/part.parquet",
               columns=["p_partkey", "p_brand", "p_type", "p_size"]
               ).to_pandas()

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_partkey", "l_suppkey"])
    B = 64

    def pair_distinct(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # keys outside [0, 2^31) would silently corrupt the packed pair
        # (the overflow class triangles._canonical_edges raises on) —
        # validate loudly instead (ADVICE r3)
        if len(p) and (max(p.max(initial=0), s.max(initial=0))
                       >= (np.int64(1) << 31)
                       or min(p.min(initial=0), s.min(initial=0)) < 0):
            raise ValueError("part/supplier keys must fit in 31 bits")
        key = np.unique(p * (np.int64(1) << 31) + s)
        return pa.table({"pk": pa.array(key),
                         "__bkt": pa.array((key % B).astype(np.int32))})

    def pair_combine(g: pa.Table) -> pa.Table:
        key = np.unique(g["pk"].to_numpy(zero_copy_only=False))
        p = key >> 31
        s = key & ((np.int64(1) << 31) - 1)
        keep = ~np.isin(s, list(bad))
        return pa.table({"l_partkey": pa.array(p[keep]),
                         "l_suppkey": pa.array(s[keep])})

    pairs = (li.map_batches(pair_distinct, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("__bkt").map_groups(pair_combine,
                                          batch_format="pyarrow"))
    merged = broadcast_join(pairs, part, left_on="l_partkey",
                            right_on="p_partkey")

    def tag(t: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            t["p_brand"], t["p_type"],
            pc.cast(t["p_size"], pa.string()), "\x1f")
        h = hash64_np(keys.to_pylist())
        return pa.table({
            "p_brand": t["p_brand"], "p_type": t["p_type"],
            "p_size": t["p_size"].cast(pa.int64()),
            "l_suppkey": t["l_suppkey"],
            "__bkt": pa.array((h % np.uint64(B)).astype(np.int32)),
        })

    def count_distinct(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas().drop_duplicates(
            ["p_brand", "p_type", "p_size", "l_suppkey"])
        out = (df.groupby(["p_brand", "p_type", "p_size"], sort=False,
                          as_index=False)
               .l_suppkey.nunique()
               .rename(columns={"l_suppkey": "supplier_cnt"}))
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (merged.map_batches(tag, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("__bkt").map_groups(count_distinct,
                                         batch_format="pyarrow")
            .sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
                  descending=[True, False, False, False])
            .limit(50))


def q_events_next_within_2h(sf_dir: str) -> "rd.Dataset":
    """As-of FORWARD join with tolerance and strict inequality
    (ops/asof.asof_join_backward generalized): each event annotated with
    the same user's NEXT event id strictly after it and within 2 hours
    (null when none) — the gap-feature / dwell-time primitive.
    Equal-timestamp right rows resolve by event id (right_tiebreak), so
    the match is deterministic under any partitioning."""
    from ..ops.asof import asof_join_backward

    ev = _rp(f"{sf_dir}/events.parquet",
             columns=["event_id", "user_id", "ts"])

    def rprep(t: pa.Table) -> pa.Table:
        return pa.table({"r_user": t["user_id"].cast(pa.int64()),
                         "r_ts": t["ts"],
                         "r_event_id": t["event_id"].cast(pa.int64())})

    right = ev.map_batches(rprep, batch_format="pyarrow", batch_size=65536)
    ts_us = pa.timestamp("us")
    out = asof_join_backward(
        ev, right,
        left_key="user_id", right_key="r_user",
        left_ts="ts", right_ts="r_ts",
        right_out={"r_event_id": "next_event_id"},
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("user_id", pa.int64()), ("ts", ts_us)]),
        right_schema=pa.schema([("r_user", pa.int64()), ("r_ts", ts_us),
                                ("r_event_id", pa.int64())]),
        direction="forward",
        tolerance=2 * 3600 * 1_000_000,
        right_tiebreak="r_event_id",
        allow_exact_matches=False,
    )
    return out.sort("event_id")


def q_contrastive_negatives(sf_dir: str) -> "rd.Dataset":
    """Deterministic negative sampling for contrastive training
    (ops/sample.contrastive_negatives): 4 hash-drawn negatives per
    embedding anchor over the dense vec_id space. Even this 'random'
    generator is value-hash-checked — the oracle replays the splitmix64
    chain over (anchor*k + slot)."""
    from ..ops.sample import contrastive_negatives

    emb = _rp(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    n = emb.count()  # parquet metadata count
    return contrastive_negatives(emb, "vec_id", k=4, n_total=n).sort(
        ["vec_id", "slot"])


def q_event_value_outliers(sf_dir: str) -> "rd.Dataset":
    """Robust per-type outlier stats (ops/rank.grouped_mad_outliers):
    exact discrete median and MAD of event value cents per event type,
    plus the count of rows beyond 5 MADs — integer-exact, oracle-mirrored
    with row_number rank selections."""
    from ..ops.rank import grouped_mad_outliers

    ev = _rp(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "value_c": _cents(t["value"])})

    cents = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    return grouped_mad_outliers(cents, key="event_type", value="value_c")


def q_vocab_edit1_pairs(sf_dir: str) -> "rd.Dataset":
    """Edit-distance-1 spelling-variant discovery over the corpus
    vocabulary (ops/fuzzy.edit1_pairs, FastSS deletion neighborhoods —
    an EXACT blocking scheme, no recall loss). Every 4th doc plants a
    typo of its first token (first char -> 'x'), so the variant graph is
    non-trivial; the oracle self-joins the same vocabulary with
    DuckDB's levenshtein() = 1."""
    from ..ops.fuzzy import edit1_pairs
    from ..ops.wordcount import _flat_tokens

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        flat, lengths = _flat_tokens(t.column("text"))
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        # planted typos: first token of every 4th doc, first char -> 'x'
        starts = np.cumsum(lengths) - lengths
        has = (lengths > 0) & (d % 4 == 0)
        firsts = flat.take(pa.array(starts[has])).to_pylist()
        typos = ["x" + w[1:] for w in firsts]
        return pa.table({"token": pa.concat_arrays(
            [flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
             else flat, pa.array(typos, pa.string())])})

    tokens = docs.map_batches(toks, batch_format="pyarrow",
                              batch_size=8192)
    out = edit1_pairs(tokens)

    def clean(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["token_a"], pa.scalar("__truncated__"))
        return t.filter(keep)

    return (out.map_batches(clean, batch_format="pyarrow")
            .sort(["token_a", "token_b"]))


# ---- TPC-H Q2/Q11/Q20 shapes over the lineitem-derived part-supplier
# relation (the testdata has no partsupp table; `ps` below is the exact
# groupby-derived stand-in, computed identically in the DuckDB oracles).


def q_min_cost_supplier(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q2 shape (correlated min subquery): for every LARGE part of
    size 10-25, the EUROPE supplier(s) offering it at the global minimum
    derived supply cost (min cents(l_extendedprice) per part x supplier).
    Both dimension sets broadcast as sorted keysets INTO the fact-scan
    partial, so non-qualifying rows never enter the exchange; the combine
    kernel is one lexsort/reduceat per partkey bucket, and the correlated
    "= min(cost) over the part" filter runs inside the SAME bucket kernel
    (a bucket owns all rows of its partkeys after the exchange) — no
    second shuffle, no driver-side min table."""
    part = _rp(f"{sf_dir}/part.parquet",
               columns=["p_partkey", "p_type", "p_size"])

    def p_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["p_type"], pa.scalar("LARGE")),
                    pc.and_(pc.greater_equal(t["p_size"], pa.scalar(10)),
                            pc.less_equal(t["p_size"], pa.scalar(25))))
        return t.filter(m).select(["p_partkey", "p_type"])

    pdim = part.map_batches(p_prep, batch_format="pyarrow",
                            batch_size=65536).to_pandas()
    pkeys = np.sort(pdim["p_partkey"].to_numpy(dtype=np.int64))

    sup = _rp(f"{sf_dir}/supplier.parquet",
              columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
              ).to_pandas()
    nat = _rp(f"{sf_dir}/nation.parquet",
              columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _rp(f"{sf_dir}/region.parquet").to_pandas()
    eu_nk = nat.merge(reg[reg.r_name == "EUROPE"],
                      left_on="n_regionkey", right_on="r_regionkey")
    eu = sup.merge(eu_nk, left_on="s_nationkey", right_on="n_nationkey")
    skeys = np.sort(eu["s_suppkey"].to_numpy(dtype=np.int64))

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    B = 64

    def partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (pkeys[np.searchsorted(pkeys, pk, side="left").clip(
                    max=len(pkeys) - 1)] == pk if len(pkeys) else
                np.zeros(len(pk), dtype=bool))
        keep &= (skeys[np.searchsorted(skeys, sk, side="left").clip(
                    max=len(skeys) - 1)] == sk if len(skeys) else False)
        pk, sk = pk[keep], sk[keep]
        cost = _cents(t["l_extendedprice"]).to_numpy(
            zero_copy_only=False)[keep]
        idx = np.lexsort((sk, pk))
        pk, sk, cost = pk[idx], sk[idx], cost[idx]
        new = np.empty(len(pk), dtype=bool)
        new[:1] = True
        new[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
        seg = np.flatnonzero(new)
        cmin = np.minimum.reduceat(cost, seg) if len(seg) else cost[:0]
        pk, sk = pk[new], sk[new]
        return pa.table({"pk": pa.array(pk), "sk": pa.array(sk),
                         "cost": pa.array(cmin),
                         "__bkt": pa.array((pk % B).astype(np.int32))})

    def winners(g: pa.Table) -> pa.Table:
        pk = g["pk"].to_numpy(zero_copy_only=False)
        sk = g["sk"].to_numpy(zero_copy_only=False)
        cost = g["cost"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((sk, pk))
        pk, sk, cost = pk[idx], sk[idx], cost[idx]
        new = np.empty(len(pk), dtype=bool)
        new[:1] = True
        new[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
        seg = np.flatnonzero(new)
        cost = (np.minimum.reduceat(cost, seg) if len(seg) else cost[:0])
        pk, sk = pk[new], sk[new]
        pnew = np.empty(len(pk), dtype=bool)
        pnew[:1] = True
        pnew[1:] = pk[1:] != pk[:-1]
        # per-part min, broadcast back along the sorted runs
        pseg = np.flatnonzero(pnew)
        if not len(pseg):
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "s_suppkey": pa.array([], pa.int64()),
                             "supplycost_c": pa.array([], pa.int64())})
        best = np.minimum.reduceat(cost, pseg)
        hit = cost == np.repeat(best, np.diff(np.append(pseg, len(pk))))
        return pa.table({"p_partkey": pa.array(pk[hit], pa.int64()),
                         "s_suppkey": pa.array(sk[hit], pa.int64()),
                         "supplycost_c": pa.array(cost[hit], pa.int64())})

    won = (li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby("__bkt").map_groups(winners, batch_format="pyarrow"))
    eu2 = eu[["s_suppkey", "s_name", "n_name"]].copy()
    eu2["acctbal_c"] = np.floor(
        eu["s_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
    out = broadcast_join(won, eu2, left_on="s_suppkey")
    out = broadcast_join(out, pdim, left_on="p_partkey",
                         right_on="p_partkey")
    return (out.select_columns(["acctbal_c", "s_name", "n_name",
                                "p_partkey", "p_type", "supplycost_c"])
            .sort(["acctbal_c", "n_name", "s_name", "p_partkey"],
                  descending=[True, False, False, False])
            .limit(100))


def q_important_parts(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q11 shape (grouped sum vs a global-fraction HAVING): per-part
    lineitem value shipped by ASIA suppliers; keep parts whose value
    exceeds 1/1000 of the regional total. The supplier keyset broadcasts
    into the scan partial; the per-part sums reduce through one bucketed
    exchange; the global total is ONE driver scalar aggregated from the
    per-part table (O(|part|), never the fact table); and the HAVING is an
    exact integer cross-multiply (value_c * 1000 > total_c) — no float
    fraction on either side of the oracle."""
    sup = _rp(f"{sf_dir}/supplier.parquet",
              columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _rp(f"{sf_dir}/nation.parquet",
              columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _rp(f"{sf_dir}/region.parquet").to_pandas()
    asia_nk = nat.merge(reg[reg.r_name == "ASIA"],
                        left_on="n_regionkey", right_on="r_regionkey")
    skeys = np.sort(sup.merge(asia_nk, left_on="s_nationkey",
                              right_on="n_nationkey")
                    ["s_suppkey"].to_numpy(dtype=np.int64))

    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    B = 64

    def partial(t: pa.Table) -> pa.Table:
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (skeys[np.searchsorted(skeys, sk, side="left").clip(
                    max=len(skeys) - 1)] == sk if len(skeys) else
                np.zeros(len(sk), dtype=bool))
        pk = t["l_partkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        v = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)[keep]
        vals, inv = np.unique(pk, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, v)
        return pa.table({"l_partkey": pa.array(vals, pa.int64()),
                         "value_c": pa.array(sums),
                         "__bkt": pa.array((vals % B).astype(np.int32))})

    def combine(g: pa.Table) -> pa.Table:
        pk = g["l_partkey"].to_numpy(zero_copy_only=False)
        v = g["value_c"].to_numpy(zero_copy_only=False)
        vals, inv = np.unique(pk, return_inverse=True)
        sums = np.zeros(len(vals), dtype=np.int64)
        np.add.at(sums, inv, v)
        return pa.table({"l_partkey": pa.array(vals, pa.int64()),
                         "value_c": pa.array(sums)})

    val = (li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby("__bkt").map_groups(combine, batch_format="pyarrow")
           .materialize())
    tot = val.aggregate(Sum("value_c"))
    total_c = int(tot["sum(value_c)"] or 0)

    def having(t: pa.Table) -> pa.Table:
        v = t["value_c"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(v * 1000 > total_c))

    return (val.map_batches(having, batch_format="pyarrow")
            .sort(["value_c", "l_partkey"], descending=[True, False]))


def q_promo_part_suppliers(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q20 shape (nested semi-joins into a supplier list): AMERICA
    suppliers that were the DOMINANT 1996 shipper of some PROMO part
    (their quantity > half that part's 1996 total — availqty has no
    equivalent here, so dominance stands in for the excess-stock gate).
    The promo partkey set is pruned BEFORE broadcast; per-(part,supplier)
    quantity partials reduce through one partkey-bucketed exchange whose
    kernel also resolves the per-part total and the 2*q > tot dominance
    test in place (same-bucket colocation); the surviving suppkeys are a
    tiny distinct set joined to the broadcast supplier dim."""
    part = _rp(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])

    def p_prep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["p_type"], pa.scalar("PROMO")))

    pkeys = np.sort(part.map_batches(p_prep, batch_format="pyarrow",
                                     batch_size=65536)
                    .to_pandas()["p_partkey"].to_numpy(dtype=np.int64))

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))
    li = _rp(f"{sf_dir}/lineitem.parquet",
             columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    B = 64

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (pkeys[np.searchsorted(pkeys, pk, side="left").clip(
                    max=len(pkeys) - 1)] == pk if len(pkeys) else
                np.zeros(len(pk), dtype=bool))
        pk = pk[keep]
        sk = t["l_suppkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        q = _cents(t["l_quantity"]).to_numpy(zero_copy_only=False)[keep]
        idx = np.lexsort((sk, pk))
        pk, sk, q = pk[idx], sk[idx], q[idx]
        new = np.empty(len(pk), dtype=bool)
        new[:1] = True
        new[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
        seg = np.flatnonzero(new)
        qs = np.add.reduceat(q, seg) if len(seg) else q[:0]
        pk, sk = pk[new], sk[new]
        return pa.table({"pk": pa.array(pk), "sk": pa.array(sk),
                         "qty": pa.array(qs),
                         "__bkt": pa.array((pk % B).astype(np.int32))})

    def dominant(g: pa.Table) -> pa.Table:
        pk = g["pk"].to_numpy(zero_copy_only=False)
        sk = g["sk"].to_numpy(zero_copy_only=False)
        q = g["qty"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((sk, pk))
        pk, sk, q = pk[idx], sk[idx], q[idx]
        new = np.empty(len(pk), dtype=bool)
        new[:1] = True
        new[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
        seg = np.flatnonzero(new)
        q = np.add.reduceat(q, seg) if len(seg) else q[:0]
        pk, sk = pk[new], sk[new]
        pnew = np.empty(len(pk), dtype=bool)
        pnew[:1] = True
        pnew[1:] = pk[1:] != pk[:-1]
        pseg = np.flatnonzero(pnew)
        if not len(pseg):
            return pa.table({"s_suppkey": pa.array([], pa.int64())})
        tot = np.add.reduceat(q, pseg)
        hit = 2 * q > np.repeat(tot, np.diff(np.append(pseg, len(pk))))
        return pa.table({"s_suppkey": pa.array(np.unique(sk[hit]),
                                               pa.int64())})

    dom = (li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby("__bkt").map_groups(dominant, batch_format="pyarrow")
           .groupby("s_suppkey").aggregate(Count(alias_name="__n"))
           .select_columns(["s_suppkey"]))

    sup = _rp(f"{sf_dir}/supplier.parquet",
              columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
              ).to_pandas()
    nat = _rp(f"{sf_dir}/nation.parquet",
              columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _rp(f"{sf_dir}/region.parquet").to_pandas()
    am_nk = nat.merge(reg[reg.r_name == "AMERICA"],
                      left_on="n_regionkey", right_on="r_regionkey")
    am = sup.merge(am_nk, left_on="s_nationkey", right_on="n_nationkey")
    am2 = am[["s_suppkey", "s_name"]].copy()
    am2["acctbal_c"] = np.floor(
        am["s_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
    return (broadcast_join(dom, am2, left_on="s_suppkey")
            .select_columns(["s_name", "acctbal_c"])
            .sort("s_name"))


def q_user_profiles(sf_dir: str) -> "rd.Dataset":
    """Golden-record survivorship (ops/survivorship.py) applied as entity
    profile-building: one canonical row per user from their event stream —
    count, first/last seen, deterministic favorite event type (mode with
    the (count DESC, value ASC) tie-break; ties are REAL in this corpus),
    and max value in integer cents. One bucketed exchange of projected
    rows; the oracle replays the identical election with a window rank."""
    from ..ops.survivorship import golden_records

    ev = _rp(f"{sf_dir}/events.parquet",
             columns=["user_id", "ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "ts": t["ts"],
            "event_type": t["event_type"],
            "value_c": _cents(t["value"]),
        })

    g = golden_records(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        "user_id",
        {
            "n_events": "count:",
            "first_seen": "min:ts",
            "last_seen": "max:ts",
            "fav_type": "mode:event_type",
            "max_value_c": "max:value_c",
        },
    )
    return g.select_columns(["user_id", "n_events", "first_seen",
                             "last_seen", "fav_type", "max_value_c"]
                            ).sort("user_id")


def q_setsim_pairs(sf_dir: str, tau: float = 0.6) -> "rd.Dataset":
    """Exact threshold set-similarity self-join (AllPairs prefix filtering,
    ``ops/setsim.py``): every document pair with distinct-token Jaccard
    >= tau, similarity in integer micro-units. The exact complement of the
    probabilistic MinHash near-dedup path — the oracle replays the same
    integer threshold and rounding over an exploded token self-join."""
    from ..ops.setsim import setsim_join

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = setsim_join(docs, tau)

    def drop_metric(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.schema.names:
            from ..ops.setsim import _PAIR_SCHEMA

            return _PAIR_SCHEMA.empty_table()
        return t.filter(pc.greater_equal(t["doc_a"], pa.scalar(0)))

    return pairs.map_batches(drop_metric, batch_format="pyarrow")


def q_metablock_edges(sf_dir: str, max_block_size: int = 64) -> "rd.Dataset":
    """Meta-blocking with weighted-edge pruning (``ops/metablock.py``,
    Papadakis et al. TKDE'13) over the near-dedup word-3-gram block space:
    block purging at ``max_block_size``, CBS edge weights (number of shared
    blocks), then the integer-exact global-mean cut. The oracle replays
    blocks, weights and cut over the gram CTE the near-dedup oracle uses."""
    from ..ops.metablock import doc_gram_blocks, metablock_wep

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    edges, _stats = metablock_wep(
        doc_gram_blocks(docs), max_block_size=max_block_size
    )
    return edges.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "w"]),
        batch_format="pyarrow",
    )


def q_metablock_wnp_edges(sf_dir: str, max_block_size: int = 64) -> "rd.Dataset":
    """Meta-blocking with reciprocal Weighted Node Pruning
    (``ops/metablock.metablock_wnp``): an edge survives iff its CBS weight
    clears BOTH endpoints' local mean — integer-exact (w*deg >= sum), so
    the oracle replays the cut over the same gram-block CTE."""
    from ..ops.metablock import doc_gram_blocks, metablock_wnp

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    edges, _stats = metablock_wnp(
        doc_gram_blocks(docs), max_block_size=max_block_size
    )
    return edges.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "w"]),
        batch_format="pyarrow",
    )


def q_setsim_incremental(sf_dir: str, tau: float = 0.6) -> "rd.Dataset":
    """Incremental fold-in of the exact set-similarity join: the newest
    20%% of documents (by doc_id) are the delta; output is every pair of
    the FULL corpus touching the delta — identical values to the batch
    join restricted to those pairs (idempotent-reprocessing contract).
    Only the delta's prefix-token runs are exchanged."""
    from ..ops.setsim import setsim_join

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    hi = docs.max("doc_id")
    lo = docs.min("doc_id")
    split = int(lo + (hi - lo) * 4 // 5) + 1
    pairs = setsim_join(docs, tau, new_min_doc_id=split)

    def drop_metric(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.schema.names:
            from ..ops.setsim import _PAIR_SCHEMA

            return _PAIR_SCHEMA.empty_table()
        return t.filter(pc.greater_equal(t["doc_a"], pa.scalar(0)))

    return pairs.map_batches(drop_metric, batch_format="pyarrow")


def q_canopy_assign(sf_dir: str, t_loose: float = 0.5,
                    t_tight: float = 0.8) -> "rd.Dataset":
    """Canopy clustering (``ops/canopy.py``, McCallum et al. KDD'00):
    greedy T-tight-separated centers in ascending doc_id, then every doc
    joins each center's canopy at token-Jaccard >= t_loose. Pinned to
    ``num_partitions=1`` so the single-level greedy is replayable as a
    recursive-CTE fold in the oracle; the distributed two-level path is
    pytest-pinned (``tests/test_canopy.py``)."""
    from ..ops.canopy import canopy_assign

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    assigned, _stats = canopy_assign(
        docs, t_loose, t_tight, num_partitions=1
    )
    return assigned


def q_cluster_bcubed(sf_dir: str) -> "rd.Dataset":
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998;
    ``ops/clustereval.bcubed_eval``): the near-dedup clustering of
    documents scored item-averaged against exact-content gold groups —
    the standard ER clustering metric beside the pairwise scorecard.
    Integer-exact: per-cell floor-divided contributions, order-free
    sums, so the oracle replays it bit-for-bit."""
    from ..ops.clustereval import bcubed_eval, exact_assignments
    from ..ops.dedup import near_dedup_assignments
    from ..ops.join import hash_join

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pred = near_dedup_assignments(docs, threshold=0.8)
    gold = exact_assignments(docs).map_batches(
        lambda t: t.rename_columns(["doc_id", "gold"]),
        batch_format="pyarrow",
    )
    joined = hash_join(pred, gold, on="doc_id")
    return bcubed_eval(joined, "canonical_doc_id", "gold")


def q_vocab_edit2_pairs(sf_dir: str) -> "rd.Dataset":
    """Edit-distance <= 2 spelling-variant discovery over the corpus
    vocabulary (``ops/passjoin.edit_pairs_k``, PassJoin VLDB'11 — exact
    segment blocking, zero recall loss). Every 4th doc plants a dist-1
    typo of its first token ('x' + w[1:]) and every 6th doc a dist-2
    typo ('xy' + w[2:]); the oracle self-joins the same vocabulary with
    DuckDB's levenshtein() BETWEEN 1 AND 2."""
    from ..ops.passjoin import edit_pairs_k
    from ..ops.wordcount import _flat_tokens

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        flat, lengths = _flat_tokens(t.column("text"))
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        starts = np.cumsum(lengths) - lengths
        has1 = (lengths > 0) & (d % 4 == 0)
        has2 = (lengths > 0) & (d % 6 == 0)
        f1 = flat.take(pa.array(starts[has1])).to_pylist()
        f2 = flat.take(pa.array(starts[has2])).to_pylist()
        typos = (["x" + w[1:] for w in f1]
                 + ["xy" + w[2:] for w in f2 if len(w) >= 2])
        base = (flat.combine_chunks()
                if isinstance(flat, pa.ChunkedArray) else flat)
        return pa.table({"token": pa.concat_arrays(
            [base, pa.array(typos, pa.string())])})

    tokens = docs.map_batches(toks, batch_format="pyarrow",
                              batch_size=8192)
    pairs = edit_pairs_k(tokens, k=2)
    return pairs.map_batches(
        lambda t: t.filter(pc.not_equal(t["token_a"],
                                        pa.scalar("__truncated__"))),
        batch_format="pyarrow",
    )


def q_center_clusters(sf_dir: str, tau: float = 0.6) -> "rd.Dataset":
    """CENTER (star) clustering over the exact token-Jaccard >= tau
    similarity graph (``ops/center.py``): the precision-favoring
    alternative to transitive components — every member is DIRECTLY
    similar to its cluster center. Centers are the lexicographically-
    first MIS; the oracle replays the greedy fold as a recursive CTE
    (canopy-oracle pattern) over the setsim edge CTE."""
    from ..ops.center import center_clustering
    from ..ops.setsim import setsim_join

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = setsim_join(docs, tau)

    def strip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.schema.names:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        keep = pc.greater_equal(t["doc_a"], pa.scalar(0))
        return t.filter(keep).select(["doc_a", "doc_b"])

    edges = pairs.map_batches(strip, batch_format="pyarrow")
    out = center_clustering(edges, docs.select_columns(["doc_id"]),
                            node_col="doc_id")
    return out.map_batches(
        lambda t: t.rename_columns(["doc_id", "center_id"]),
        batch_format="pyarrow",
    )
