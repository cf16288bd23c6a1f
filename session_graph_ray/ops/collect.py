"""Grouped collect-list with cap + string-agg (SURVEY.md J8 / A8).

Reference semantics: the entity-context join gathers <=5 neighboring triples
per entity, sorted for determinism (``/root/reference/pipeline/
link_entities.py:437-493``); SPARQL analytics use ``GROUP_CONCAT``
(``.claude/skills/devkg-sparql/SKILL.md:240-251``). Ray-Data-first: one
``groupby(key)`` shuffle carrying only (key, value); per-group sort + head-k
+ join run vectorized inside ``map_groups``. The cap bounds both output row
width and worker memory — the "no unbounded per-group state" rule.
"""

from __future__ import annotations

import pandas as pd

import ray.data


def collect_list(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    cap: int = 5,
    distinct: bool = True,
) -> "ray.data.Dataset":
    """(key, value) -> one row per key with ``values`` = the first ``cap``
    values in ascending order (deterministic — the reference sorts its
    context triples for the same reason, ``link_entities.py:486-489``)."""

    def gather(g: pd.DataFrame):
        from .util import pd_to_arrow

        vals = g[value]
        if distinct:
            vals = vals.drop_duplicates()
        vals = vals.sort_values().head(cap)
        return pd_to_arrow(
            pd.DataFrame({key: [g[key].iloc[0]], "values": [vals.tolist()]})
        )

    return (
        ds.select_columns([key, value])
        .groupby(key)
        .map_groups(gather, batch_format="pandas")
    )


def string_agg(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    sep: str = ",",
    cap: int | None = None,
    distinct: bool = True,
) -> "ray.data.Dataset":
    """GROUP_CONCAT analog: per key, the (capped) sorted values joined by
    ``sep`` into one string column ``agg``."""

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[value]
        if distinct:
            vals = vals.drop_duplicates()
        vals = vals.sort_values()  # native dtype order (ints sort numerically)
        if cap is not None:
            vals = vals.head(cap)
        from .util import pd_to_arrow

        return pd_to_arrow(
            pd.DataFrame(
                {key: [g[key].iloc[0]], "agg": [sep.join(vals.astype(str).tolist())]}
            )
        )

    return (
        ds.select_columns([key, value])
        .groupby(key)
        .map_groups(gather, batch_format="pandas")
    )
