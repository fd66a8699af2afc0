"""Driver-facing query catalogue with DuckDB oracle SQL.

Each entry in ``QUERIES`` is a callable ``fn(sf_dir) -> Dataset | Table``
and (where SQL-expressible) a matching oracle in ``oracle_sql_for``.
Naming rule: every computed column is named identically in the Ray code
and the SQL (the driver hash-compares columns by name).

Float discipline (so value hashes match bit-for-bit):
- money/metric aggregates are summed as integers — per-row
  ``CAST(round(x * 100) AS BIGINT)`` cents / micros in BOTH engines; the
  per-row double product is computed identically (IEEE) on both sides,
  so the rounded int is identical and integer sums are order-independent;
- cosine similarities are rounded to 6dp before ranking on both sides;
- everything else exposed to the driver is ints / strings.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cartography_ray.core.context import IngestContext
from cartography_ray.sources.transcripts import ensure_transcripts, transcripts_path

QUERY_TAG = 20260101

# matches DuckDB's round(): half away from zero (arrow calls it
# "half_towards_infinity")
_ROUND = {"round_mode": "half_towards_infinity"}


def _rd():
    import ray.data

    from cartography_ray.runtime import configure

    configure()
    return ray.data


def _cents(col, factor: float = 100.0) -> pa.Array:
    import pyarrow.compute as pc

    return pc.cast(pc.round(pc.multiply(col, pa.scalar(factor)), 0, **_ROUND), pa.int64())


def _parts_for(*paths: str) -> int | None:
    """Shuffle-partition hint from input file sizes (the per-partition
    fixed cost otherwise dominates small shuffles; runtime.shuffle_partitions)."""
    from cartography_ray.runtime import shuffle_partitions

    try:
        return shuffle_partitions(n_bytes=sum(os.path.getsize(p) for p in paths))
    except OSError:
        return None


def _parts_for_rows(*paths: str, scale: float = 1.0) -> int | None:
    """Shuffle-partition hint from parquet FOOTER row counts — for
    exchanges whose volume is key-domain-sized (post-combiner groupbys,
    dimension-keyed joins) rather than input-byte-sized.  ``scale``
    adjusts when the keyed output is a known multiple of the footer rows
    (e.g. a gap-filled grid ≈ 2× the sparse series)."""
    from cartography_ray.runtime import shuffle_partitions

    try:
        import pyarrow.parquet as pq

        rows = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    except Exception:
        return None
    return shuffle_partitions(n_rows=int(rows * scale))


# --------------------------------------------------------------------------
# Relational operator family (TPC-H-ish; strong oracles over driver views)
# --------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    """Grouped aggregation with two-phase partial agg (TPC-H Q1 shape)."""
    rd = _rd()
    from cartography_ray.ops.agg import bounded_groupby_agg

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), pa.scalar(pd.Timestamp("1998-09-02"))))
        disc = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "price_cents": _cents(t.column("l_extendedprice")),
                "disc_cents": _cents(disc),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    # flag×status is ≤ 6 groups — dimension-bounded, so the final phase is
    # a streamed driver fold (no shuffle); see bounded_groupby_agg.
    return bounded_groupby_agg(
        prepped,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("qty", "sum"),
            "sum_price_cents": ("price_cents", "sum"),
            "sum_disc_cents": ("disc_cents", "sum"),
            "count_order": (None, "count"),
        },
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""


def q_lineitem_rollup(sf_dir: str):
    """Multi-level subtotals in one shuffle (ops/agg.rollup_groupby_agg):
    (flag, status), (flag,), and grand-total grouping sets, 'ALL'
    sentinels matching the SQL COALESCE-over-ROLLUP idiom."""
    rd = _rd()
    from cartography_ray.ops.agg import rollup_groupby_agg

    path = f"{sf_dir}/lineitem.parquet"
    ds = rd.read_parquet(
        path, columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "price_cents": _cents(t.column("l_extendedprice")),
            }
        )

    return rollup_groupby_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("qty", "sum"),
            "sum_price_cents": ("price_cents", "sum"),
            "n": (None, "count"),
        },
        num_partitions=_parts_for(path),
    )


SQL_LINEITEM_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_lineitem_cube(sf_dir: str):
    """Every subset grouping set in one shuffle (ops/agg.cube_groupby_agg)
    — the CUBE twin of lineitem_rollup."""
    rd = _rd()
    from cartography_ray.ops.agg import cube_groupby_agg

    path = f"{sf_dir}/lineitem.parquet"
    ds = rd.read_parquet(
        path, columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "price_cents": _cents(t.column("l_extendedprice")),
            }
        )

    return cube_groupby_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("qty", "sum"),
            "sum_price_cents": ("price_cents", "sum"),
            "n": (None, "count"),
        },
        num_partitions=_parts_for(path),
    )


SQL_LINEITEM_CUBE = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# customer→nation side of the revenue join: broadcast below this many
# rows (parquet-footer count — no data read), distributed hash_join
# above. Same size-guarded contract as resolve_keys / AddRelationship /
# the alias-label spill: never an UNCONDITIONAL driver read of a table
# that scales with the corpus (VERDICT r03 item 2).
REVENUE_CUST_BROADCAST_LIMIT = 2_000_000


def q_revenue_by_nation(
    sf_dir: str,
    cust_broadcast_limit: int | None = None,
    skew_salt: int | None = None,
):
    """Join chain lineitem→orders→customer→nation + agg.

    Scale posture: lineitem, orders AND customer are all fact tables
    (∝ scale). The lineitem⋈orders join is always a distributed
    reduce-side ``hash_join``; the customer side auto-switches — joined
    via a ``ray.put`` broadcast map while its FOOTER row count is under
    ``REVENUE_CUST_BROADCAST_LIMIT`` (a second shuffle costs ~1.5 s pool
    setup + ~60 ms/partition, which dominates at bench scale), and via a
    second ``hash_join`` above it (at 100× customer is order-of-lineitem
    and a driver read OOMs first). The only unconditional broadcast is
    the genuinely fixed 25-row nation map. Both plans hash the same
    oracle; the forced-limit twin is asserted equal in tests.

    ``skew_salt`` threads into the fact⋈orders join — the
    ``revenue_by_nation_salted`` twin runs it to prove the salted plan
    hashes the same oracle end-to-end (the *_salted precedent).
    """
    rd = _rd()
    import pyarrow.parquet as pq

    from cartography_ray.ops.agg import bounded_groupby_agg
    from cartography_ray.ops.joins import broadcast_join, hash_join

    limit = REVENUE_CUST_BROADCAST_LIMIT if cust_broadcast_limit is None else cust_broadcast_limit
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()

    cust_path = f"{sf_dir}/customer.parquet"
    cust_rows = pq.read_metadata(cust_path).num_rows
    customer = rd.read_parquet(cust_path, columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def prep(t: pa.Table) -> pa.Table:
        # per-batch combine on l_orderkey BEFORE the shuffle join:
        # lineitem is clustered by orderkey, so this cuts the exchanged
        # rows ~4:1 (revenue partial-summed, lineitem count carried so
        # the final COUNT(*) is a sum of partial counts)
        disc = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        tt = pa.table({"l_orderkey": t.column("l_orderkey"), "revenue_cents": _cents(disc)})
        g = tt.group_by("l_orderkey").aggregate(
            [("revenue_cents", "sum"), ("revenue_cents", "count")]
        )
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "revenue_cents": g.column("revenue_cents_sum"),
                "n_li": pc.cast(g.column("revenue_cents_count"), pa.int64()),
            }
        )

    fact = hash_join(
        ds.map_batches(prep, batch_format="pyarrow"),
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=_parts_for(
            f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
        ),
        skew_salt=skew_salt,
    )
    def combine_by_cust(t: pa.Table) -> pa.Table:
        # map-side partial before shuffle #2: each block collapses to one
        # row per distinct custkey it holds (~10 orders/customer), so the
        # customer join exchanges customer-sized, not order-sized, volume
        g = t.group_by("o_custkey").aggregate([("revenue_cents", "sum"), ("n_li", "sum")])
        return pa.table(
            {
                "revenue_cents": g.column("revenue_cents_sum"),
                "n_li": g.column("n_li_sum"),
                "o_custkey": g.column("o_custkey"),
            }
        )

    fact = fact.map_batches(combine_by_cust, batch_format="pyarrow")
    # fact's schema is statically known (join #1 emits lcols + o_custkey,
    # then combine_by_cust reshapes); passing it avoids Dataset.schema()
    # executing the whole first shuffle just to learn the types
    # (hash_join left_schema docstring)
    fact_schema = pa.schema(
        [
            ("revenue_cents", pa.int64()),
            ("n_li", pa.int64()),
            ("o_custkey", pa.int64()),
        ]
    )
    if cust_rows <= limit:
        # broadcast path: pre-merge customer⋈nation driver-side (both
        # bounded by the limit), ship ONE small map via ray.put
        cust_pdf = pq.read_table(
            cust_path, columns=["c_custkey", "c_nationkey"]
        ).to_pandas()
        cn = cust_pdf.merge(
            nation, left_on="c_nationkey", right_on="n_nationkey"
        )[["c_custkey", "n_name"]]
        joined = broadcast_join(fact, cn, left_on="o_custkey", right_on="c_custkey")
    else:
        with_cust = hash_join(
            fact,
            customer,
            left_on="o_custkey",
            right_on="c_custkey",
            num_partitions=_parts_for(
                f"{sf_dir}/orders.parquet", f"{sf_dir}/customer.parquet"
            ),
            left_schema=fact_schema,
        )
        joined = broadcast_join(with_cust, nation, left_on="c_nationkey", right_on="n_nationkey")
    # 25 nations — dimension-bounded final, streamed driver fold (no
    # third shuffle); the all-to-alls are the two fact⋈fact hash_joins.
    return bounded_groupby_agg(
        joined.select_columns(["n_name", "revenue_cents", "n_li"]),
        "n_name",
        {"revenue_cents": ("revenue_cents", "sum"), "n_items": ("n_li", "sum")},
    )


def q_revenue_by_nation_salted(sf_dir: str):
    """Hot-key fallback plan of ``revenue_by_nation``: the fact⋈orders
    ``hash_join`` runs with ``skew_salt=8`` (left rows round-robined over
    8 salted sub-buckets, orders replicated 8×) against the SAME oracle —
    plan equivalence proved the way the window-family *_salted twins
    prove ``chunk_us``."""
    return q_revenue_by_nation(sf_dir, skew_salt=8)


SQL_REVENUE_NATION = """
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY 1
"""


def q_top_orders(sf_dir: str):
    """Global top-k without a full sort (per-block prune + tiny final)."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"), "total_cents": _cents(t.column("o_totalprice"))}
        )

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["total_cents", "o_orderkey"], ascending=[False, True]).head(10)

    pruned = ds.map_batches(prep, batch_format="pyarrow").map_batches(local, batch_format="pandas")
    final = pruned.to_pandas().sort_values(["total_cents", "o_orderkey"], ascending=[False, True]).head(10)
    return pa.Table.from_pandas(final.reset_index(drop=True), preserve_index=False).replace_schema_metadata(None)


SQL_TOP_ORDERS = """
SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders
ORDER BY total_cents DESC, o_orderkey
LIMIT 10
"""


def q_filter_project(sf_dir: str):
    """Vectorized row filter + computed projection."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(pd.Timestamp("1995-01-01"))),
            pc.greater_equal(t.column("l_discount"), pa.scalar(0.05)),
        )
        t = t.filter(mask)
        disc = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "revenue_cents": _cents(disc),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber,
       CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount >= 0.05
"""


def q_customers_without_orders(sf_dir: str):
    """Distributed anti-join (the cleanup primitive): customers with no
    order above 300k.

    Scale posture: ``hash_join(how="anti")`` — both sides shuffled once by
    key hash, the anti filter applied inside each bucket. NO key list ever
    reaches the driver (VERDICT r02 item 3 replaced the broadcast key-set
    variant); a per-batch unique combiner still shrinks the fact side
    before the shuffle.
    """
    rd = _rd()
    from cartography_ray.ops.joins import hash_join
    from cartography_ray.runtime import drop_empty_blocks

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    def local_distinct(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("o_totalprice"), pa.scalar(300000.0)))
        return pa.table({"o_custkey": pc.unique(t.column("o_custkey"))})

    keys_ds = orders.map_batches(local_distinct, batch_format="pyarrow")
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    return drop_empty_blocks(
        hash_join(
            ds, keys_ds, left_on="c_custkey", right_on="o_custkey", how="anti",
            num_partitions=_parts_for(
                f"{sf_dir}/customer.parquet", f"{sf_dir}/orders.parquet"
            ),
        )
    )


SQL_CUST_NO_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


def q_cust_orders_events_outer(sf_dir: str):
    """FULL OUTER join — the last ``hash_join`` mode without a
    catalogue entry: per-customer urgent-order stats ⟗ per-user event
    counts on the shared key domain. All three regions are live at
    sf0.01 (1169 order-only / 22 event-only / 128 both). Unmatched
    sides surface as typed nulls from the bucket merge and are
    coalesced to the -1 sentinel on BOTH engines (the nullable-int
    hash convention)."""
    rd = _rd()
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import hash_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    )

    def prep_o(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("o_orderpriority"), "1-URGENT"))
        return pa.table(
            {"key": t.column("o_custkey"), "cents": _cents(t.column("o_totalprice"))}
        )

    # the per-batch combiner collapses each block to key-domain-sized
    # partials BEFORE the exchange, so sizing these shuffles from input
    # bytes (_parts_for) over-partitions them — measured 10.0 → 5.8 s at
    # sf0.1. The key domain here is the customer id space, which grows
    # ∝ SF: size the shuffles from the customer table's footer row count
    # (8 at bench scale, proportional at 100×) instead of a constant.
    key_parts = _parts_for_rows(f"{sf_dir}/customer.parquet")
    left = partial_groupby_agg(
        orders.map_batches(prep_o, batch_format="pyarrow"),
        ["key"],
        {"n_orders": (None, "count"), "sum_urgent_cents": ("cents", "sum")},
        num_partitions=key_parts,
    )
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def prep_e(t: pa.Table) -> pa.Table:
        return pa.table({"key": pc.cast(t.column("user_id"), pa.int64())})

    right = partial_groupby_agg(
        events.map_batches(prep_e, batch_format="pyarrow"),
        ["key"],
        {"n_events": (None, "count")},
        num_partitions=key_parts,
    )
    j = hash_join(
        left,
        right,
        left_on="key",
        how="outer",
        left_schema=pa.schema(
            [("key", pa.int64()), ("n_orders", pa.int64()),
             ("sum_urgent_cents", pa.int64())]
        ),
        right_schema=pa.schema([("key", pa.int64()), ("n_events", pa.int64())]),
        num_partitions=key_parts,  # key-domain-sized by construction
    )

    def finish(t: pa.Table) -> pa.Table:
        neg = pa.scalar(-1, pa.int64())
        return pa.table(
            {
                "key": t.column("key"),
                "n_orders": pc.fill_null(t.column("n_orders"), neg),
                "sum_urgent_cents": pc.fill_null(t.column("sum_urgent_cents"), neg),
                "n_events": pc.fill_null(t.column("n_events"), neg),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


SQL_CUST_ORDERS_EVENTS_OUTER = """
WITH l AS (
  SELECT o_custkey AS key, COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_urgent_cents
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
r AS (SELECT user_id AS key, COUNT(*) AS n_events FROM events GROUP BY 1)
SELECT COALESCE(l.key, r.key) AS key,
       COALESCE(l.n_orders, -1) AS n_orders,
       COALESCE(l.sum_urgent_cents, -1) AS sum_urgent_cents,
       COALESCE(r.n_events, -1) AS n_events
FROM l FULL OUTER JOIN r ON l.key = r.key
"""


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate (1h) over the event stream table."""
    rd = _rd()
    from cartography_ray.ops.agg import partial_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "hour_bucket": hour,
                "value_micros": _cents(t.column("value"), 1_000_000.0),
            }
        )

    return partial_groupby_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "hour_bucket"],
        {"n_events": (None, "count"), "sum_value_micros": ("value_micros", "sum")},
        num_partitions=_parts_for(f"{sf_dir}/events.parquet"),
    )


SQL_EVENTS_HOURLY = """
SELECT user_id, epoch_us(ts) // 3600000000 AS hour_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros
FROM events
GROUP BY 1, 2
"""


GAPFILL_SLOT_US = 900_000_000  # 15-min slots: ~50% of per-type slots are empty at sf0.01


def q_events_gapfill(sf_dir: str):
    """Time-series densification: per-type 15-min counts with EVERY
    slot between each type's min and max emitted, zeros where no event
    landed (ops/window.gap_fill — the row-GENERATING operator family;
    SQL generate_series + LEFT JOIN). Downstream rolling/lag kernels
    need dense series to be correct, which is why resampling is a
    first-class stage in stream-shaped training pipelines."""
    rd = _rd()
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.window import gap_fill

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "slot": pc.divide(us, pa.scalar(GAPFILL_SLOT_US, pa.int64())),
                "value_cents": _cents(t.column("value")),
            }
        )

    sparse = partial_groupby_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "slot"],
        {"n_events": (None, "count"), "sum_value_cents": ("value_cents", "sum")},
        num_partitions=_parts_for(f"{sf_dir}/events.parquet"),
    )
    # the filled series is slot-range-sized (types × slots), tiny next
    # to the event table — size the exchange from the sparse series'
    # upper bound (≈2× footer rows covers the densified grid at every
    # observed SF; the cluster cap in shuffle_partitions bounds it above)
    return gap_fill(
        sparse,
        key="event_type",
        bucket_col="slot",
        value_cols=["n_events", "sum_value_cents"],
        num_partitions=_parts_for_rows(f"{sf_dir}/events.parquet", scale=2.0),
    )


SQL_EVENTS_GAPFILL = f"""
WITH b AS (
  SELECT event_type, epoch_us(ts) // {GAPFILL_SLOT_US} AS slot,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, MIN(slot) AS mn, MAX(slot) AS mx FROM b GROUP BY 1),
g AS (SELECT event_type, UNNEST(generate_series(mn, mx)) AS slot FROM r)
SELECT g.event_type, g.slot,
       COALESCE(b.n_events, 0) AS n_events,
       COALESCE(b.sum_value_cents, 0) AS sum_value_cents
FROM g LEFT JOIN b USING (event_type, slot)
"""


def q_events_gapfill_locf(sf_dir: str):
    """Resample + forward-fill: the densified per-type 15-min series
    (same spec as ``events_gapfill``) with every empty slot inheriting
    the last OBSERVED slot's summed cents (ops/window.locf) — the
    carry-forward stage that makes a resampled series usable as a
    model feature. Dense series is slot-range-sized, so the extra key
    shuffle is over the tiny grid, never the event table. First slot
    of each range is observed by construction (ranges start at each
    type's min observed slot), so the -1 sentinel never fires here —
    it exists for callers whose ranges lead with gaps."""
    from cartography_ray.ops.window import locf

    dense = q_events_gapfill(sf_dir)
    return locf(
        dense,
        key="event_type",
        order_cols=["slot"],
        value_col="sum_value_cents",
        observed_col="n_events",
        out_col="locf_cents",
        num_partitions=_parts_for_rows(f"{sf_dir}/events.parquet", scale=2.0),
    )


SQL_EVENTS_GAPFILL_LOCF = f"""
WITH b AS (
  SELECT event_type, epoch_us(ts) // {GAPFILL_SLOT_US} AS slot,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, MIN(slot) AS mn, MAX(slot) AS mx FROM b GROUP BY 1),
g AS (SELECT event_type, UNNEST(generate_series(mn, mx)) AS slot FROM r),
d AS (SELECT g.event_type, g.slot,
             COALESCE(b.n_events, 0) AS n_events,
             COALESCE(b.sum_value_cents, 0) AS sum_value_cents
      FROM g LEFT JOIN b USING (event_type, slot))
SELECT event_type, slot, n_events, sum_value_cents,
       COALESCE(LAST_VALUE(CASE WHEN n_events > 0 THEN sum_value_cents END IGNORE NULLS)
                OVER (PARTITION BY event_type ORDER BY slot
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                -1) AS locf_cents
FROM d
"""


def q_events_gapfill_interp(sf_dir: str):
    """Resample + linear interpolation: the densified per-type series
    (``events_gapfill`` spec) with interior gaps linearly interpolated
    between the bracketing observed slots and trailing gaps carried
    forward (ops/window.interp_fill). Every float op is the same
    int-difference → divide → multiply → add tree the SQL twin writes,
    so the oracle hash-matches exactly at 1e-9 rounding."""
    from cartography_ray.ops.window import interp_fill

    dense = q_events_gapfill(sf_dir)
    out = interp_fill(
        dense,
        key="event_type",
        order_col="slot",
        value_col="sum_value_cents",
        observed_col="n_events",
        out_col="interp",
        num_partitions=_parts_for_rows(f"{sf_dir}/events.parquet", scale=2.0),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "slot": t.column("slot"),
                "n_events": t.column("n_events"),
                "sum_value_cents": t.column("sum_value_cents"),
                "interp9": pc.round(
                    t.column("interp"), 9, round_mode="half_towards_infinity"
                ),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


SQL_EVENTS_GAPFILL_INTERP = f"""
WITH b AS (
  SELECT event_type, epoch_us(ts) // {GAPFILL_SLOT_US} AS slot,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, MIN(slot) AS mn, MAX(slot) AS mx FROM b GROUP BY 1),
g AS (SELECT event_type, UNNEST(generate_series(mn, mx)) AS slot FROM r),
d AS (SELECT g.event_type, g.slot,
             COALESCE(b.n_events, 0) AS n_events,
             COALESCE(b.sum_value_cents, 0) AS sum_value_cents
      FROM g LEFT JOIN b USING (event_type, slot)),
w AS (SELECT *,
        LAST_VALUE(CASE WHEN n_events > 0 THEN CAST(sum_value_cents AS DOUBLE) END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY slot
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN n_events > 0 THEN CAST(slot AS DOUBLE) END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY slot
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps,
        FIRST_VALUE(CASE WHEN n_events > 0 THEN CAST(sum_value_cents AS DOUBLE) END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY slot
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN n_events > 0 THEN CAST(slot AS DOUBLE) END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY slot
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ns
      FROM d)
SELECT event_type, slot, n_events, sum_value_cents,
       round(CASE WHEN n_events > 0 THEN CAST(sum_value_cents AS DOUBLE)
                  WHEN ns IS NULL THEN pv
                  ELSE pv + (nv - pv) * ((CAST(slot AS DOUBLE) - ps) / (ns - ps))
             END, 9) AS interp9
FROM w
"""


HOP_WINDOW_US = 2 * 3_600_000_000  # 2h windows ...
HOP_US = 3_600_000_000             # ... hopping every 1h (2 copies/row)


def q_events_hopping(sf_dir: str):
    """Hopping-window aggregate (2h window / 1h hop) per event type —
    the overlapping-window member of the windowed family
    (ops/window.hopping_window_agg; events_hourly is the tumbling
    special case)."""
    rd = _rd()
    from cartography_ray.ops.window import hopping_window_agg

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "ts": t.column("ts"),
                "value_micros": _cents(t.column("value"), 1_000_000.0),
            }
        )

    return hopping_window_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        "ts",
        window_us=HOP_WINDOW_US,
        hop_us=HOP_US,
        keys="event_type",
        aggs={"n_events": (None, "count"), "sum_value_micros": ("value_micros", "sum")},
        num_partitions=_parts_for(path),
    )


SQL_EVENTS_HOPPING = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t,
         CAST(round(value * 1000000) AS BIGINT) AS value_micros
  FROM events
), w AS (
  SELECT event_type, value_micros,
         unnest(range((t - {HOP_WINDOW_US}) // {HOP_US} + 1, t // {HOP_US} + 1)) AS widx
  FROM e
)
SELECT event_type, widx * {HOP_US} AS window_start_us,
       COUNT(*) AS n_events,
       CAST(SUM(value_micros) AS BIGINT) AS sum_value_micros
FROM w GROUP BY 1, 2
"""


def q_events_first(sf_dir: str):
    """First-event-per-key dedup (MERGE-style min reduce)."""
    rd = _rd()
    from cartography_ray.ops.agg import partial_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "event_id"])
    return partial_groupby_agg(
        ds, ["user_id", "event_type"], {"first_event_id": ("event_id", "min")},
        num_partitions=_parts_for(f"{sf_dir}/events.parquet"),
    )


SQL_EVENTS_FIRST = """
SELECT user_id, event_type, MIN(event_id) AS first_event_id
FROM events GROUP BY 1, 2
"""

DAY_US = 86_400_000_000


def q_events_retention(sf_dir: str):
    """Cohort retention matrix (ops/window.cohort_retention): users
    active `age` days after their first-ever activity day, grouped by
    cohort day. Distinct-activity combiner → one user-keyed shuffle →
    grid-sized count exchange."""
    rd = _rd()
    from cartography_ray.ops.window import cohort_retention

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                # trunc == floor for the always-positive epoch (SQL `//`)
                "day": pc.divide(pc.cast(t.column("ts"), pa.int64()), pa.scalar(DAY_US, pa.int64())),
            }
        )

    return cohort_retention(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="user_id", day_col="day", num_partitions=_parts_for(path),
    )


SQL_EVENTS_RETENTION = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
),
fi AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY 1)
SELECT fi.cohort_day, ud.day - fi.cohort_day AS age_days,
       CAST(COUNT(*) AS BIGINT) AS users
FROM ud JOIN fi USING (user_id)
GROUP BY 1, 2
"""

FUNNEL_STEPS = ["view", "click", "purchase"]


def q_events_funnel(sf_dir: str):
    """Ordered funnel (ops/window.funnel_counts): users reaching each
    step of view → click → purchase, every step strictly after the
    previous step's first qualifying event (ties impossible: the order
    is the (ts, event_id) total order on both sides)."""
    rd = _rd()
    from cartography_ray.ops.window import funnel_counts

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
            }
        )

    return funnel_counts(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="user_id", step_col="event_type", steps=FUNNEL_STEPS,
        order_cols=["ts_us", "event_id"], num_partitions=_parts_for(path),
    )


# rn filtered in an explicit outer WHERE, not QUALIFY: DuckDB 1.0
# silently skips a QUALIFY on a select-alias inside these joined CTEs
# (observed: s2 kept all rn up to 22)
SQL_EVENTS_FUNNEL = f"""
WITH s1 AS (
  SELECT user_id, t, e FROM (
    SELECT user_id, epoch_us(ts) AS t, event_id AS e,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = '{FUNNEL_STEPS[0]}'
  ) WHERE rn = 1
),
s2 AS (
  SELECT user_id, t, e FROM (
    SELECT ev.user_id, epoch_us(ev.ts) AS t, ev.event_id AS e,
           ROW_NUMBER() OVER (PARTITION BY ev.user_id ORDER BY ev.ts, ev.event_id) AS rn
    FROM events ev JOIN s1 ON ev.user_id = s1.user_id
    WHERE ev.event_type = '{FUNNEL_STEPS[1]}' AND (epoch_us(ev.ts), ev.event_id) > (s1.t, s1.e)
  ) WHERE rn = 1
),
s3 AS (
  SELECT user_id FROM (
    SELECT ev.user_id,
           ROW_NUMBER() OVER (PARTITION BY ev.user_id ORDER BY ev.ts, ev.event_id) AS rn
    FROM events ev JOIN s2 ON ev.user_id = s2.user_id
    WHERE ev.event_type = '{FUNNEL_STEPS[2]}' AND (epoch_us(ev.ts), ev.event_id) > (s2.t, s2.e)
  ) WHERE rn = 1
)
SELECT CAST(1 AS BIGINT) AS step, '{FUNNEL_STEPS[0]}' AS step_name,
       CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS users
UNION ALL
SELECT 2, '{FUNNEL_STEPS[1]}', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, '{FUNNEL_STEPS[2]}', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
"""

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


# hot-key chunk width shared by the *_salted catalogue variants: wide
# enough that most keys stay single-chunk, narrow enough that the salted
# paths (chunk shuffle + boundary/carry-in merge) genuinely execute
SALT_CHUNK_US = 6 * 3600 * 1_000_000


def q_events_sessions(sf_dir: str, chunk_us: int | None = None):
    """Gap-based sessionization (windowed operator family: the Ray
    analogue of LAG + SUM OVER PARTITION; ops/window.py)."""
    rd = _rd()
    from cartography_ray.ops.window import sessionize

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["user_id", "ts", "event_id"])
    return sessionize(
        ds, key="user_id", ts_col="ts", gap_us=SESSION_GAP_US,
        order_cols=["event_id"], num_partitions=_parts_for(path),
        chunk_us=chunk_us,
    )


def q_events_sessions_salted(sf_dir: str):
    """Hot-key fallback plan of ``events_sessions`` (time-chunk salting +
    boundary merge) against the SAME SQL oracle — the driver gate proves
    chunked/unchunked equivalence on real data."""
    return q_events_sessions(sf_dir, chunk_us=SALT_CHUNK_US)


SQL_EVENTS_SESSIONS = f"""
WITH f AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN ts_us - LAG(ts_us) OVER w IS NULL
              OR ts_us - LAG(ts_us) OVER w > {SESSION_GAP_US} THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), s AS (
  SELECT user_id, ts_us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT)
           AS session_seq
  FROM f
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us
FROM s GROUP BY 1, 2
"""


def q_events_session_ranges(sf_dir: str, chunk_us: int | None = None):
    """Range (point-in-interval) join: every event matched back to its
    sessionize window — interval-join composition (ops/joins.range_join
    over the ops/window.sessionize output)."""
    rd = _rd()
    from cartography_ray.ops.joins import range_join

    path = f"{sf_dir}/events.parquet"
    parts = _parts_for(path)
    sessions = q_events_sessions(sf_dir)
    ev = rd.read_parquet(path, columns=["user_id", "ts", "event_id"])

    def pointize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    joined = range_join(
        ev.map_batches(pointize, batch_format="pyarrow"), sessions,
        by="user_id", point_col="ts_us",
        lo_col="session_start_us", hi_col="session_end_us",
        num_partitions=parts, chunk_us=chunk_us,
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "session_seq": t.column("r_session_seq"),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


def q_events_session_ranges_salted(sf_dir: str):
    """Hot-key fallback plan of ``events_session_ranges`` (intervals
    replicated across the chunks they overlap) against the SAME SQL
    oracle."""
    return q_events_session_ranges(sf_dir, chunk_us=SALT_CHUNK_US)


SQL_EVENTS_SESSION_RANGES = f"""
SELECT e.event_id, e.user_id, sess.session_seq
FROM events e
JOIN ({SQL_EVENTS_SESSIONS}) sess
  ON e.user_id = sess.user_id
 AND epoch_us(e.ts) BETWEEN sess.session_start_us AND sess.session_end_us
"""


def q_top_orders_per_cust(sf_dir: str):
    """Per-group top-k with rank (ROW_NUMBER analogue; combiner-pruned
    shuffle — see ops/window.py grouped_topk)."""
    rd = _rd()
    from cartography_ray.ops.window import grouped_topk

    path = f"{sf_dir}/orders.parquet"
    ds = rd.read_parquet(path, columns=["o_custkey", "o_orderkey", "o_totalprice"])
    top = grouped_topk(
        ds, "o_custkey", "o_totalprice", k=2, descending=True,
        tiebreak=["o_orderkey"], num_partitions=_parts_for(path),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "price_cents": _cents(t.column("o_totalprice")),
                "rn": t.column("rn"),
            }
        )

    return top.map_batches(project, batch_format="pyarrow")


SQL_TOP_ORDERS_PER_CUST = """
SELECT o_custkey, o_orderkey, price_cents, rn FROM (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 2
"""


EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_events_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT) per group (ops/sketches.grouped_distinct_count
    — per-batch dedup combiner + one shuffle; grouped_hll is the
    fixed-footprint scale path, error-bound-tested in tests/)."""
    rd = _rd()
    from cartography_ray.ops.sketches import grouped_distinct_count

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "user_id"])
    return grouped_distinct_count(
        ds, "event_type", "user_id", out_col="n_users",
        num_partitions=_parts_for(path),
    )


SQL_EVENTS_DISTINCT_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


def q_events_distinct_users_hll(sf_dir: str):
    """HyperLogLog distinct-count estimate per group (rows-only:
    approximate by design; |est - exact| bound asserted in tests)."""
    rd = _rd()
    from cartography_ray.ops.sketches import grouped_hll

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "user_id"])
    return grouped_hll(ds, "event_type", "user_id", p=12, out_col="n_users_est")


PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def q_events_profile(sf_dir: str):
    """ANALYZE-style column profile of the events table
    (ops/agg.table_profile): per column n / n_null / exact n_distinct in
    one pass and one hot-key-free shuffle (values bucketed on
    hash(column, value), per-batch value_counts combiner). The planning
    pass that sizes shuffles/broadcasts/salts before a big run."""
    rd = _rd()
    from cartography_ray.ops.agg import table_profile

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=PROFILE_COLS)
    return table_profile(ds, PROFILE_COLS, num_partitions=_parts_for(path))


SQL_EVENTS_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM events"""
    for c in PROFILE_COLS
)


SAMPLE_RATE = 0.1
STRATA_K = 50


def q_events_sample(sf_dir: str):
    """Deterministic Bernoulli-by-hash sample (ops/window.deterministic_sample
    — no RNG state, so resumes/retries keep identical rows; the SQL twin
    evaluates the same integer arithmetic)."""
    rd = _rd()
    from cartography_ray.ops.window import deterministic_sample

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"])
    return deterministic_sample(ds, "event_id", SAMPLE_RATE)


SQL_EVENTS_SAMPLE = f"""
SELECT event_id, user_id, event_type FROM events
WHERE (CAST(event_id AS UBIGINT) % 4294967296) * 2654435761 % 4294967296
      < {int(SAMPLE_RATE * (1 << 32))}
"""


# class rebalancing: drown the dominant click/view stream, keep every
# purchase; 'error' exercises the default-rate (absent-key) path
WSAMPLE_RATES = {"click": 0.25, "view": 0.5, "purchase": 1.0, "signup": 0.75}
WSAMPLE_DEFAULT = 0.05


def q_events_weighted_sample(sf_dir: str):
    """Per-stratum Bernoulli sampling (ops/window.keyed_rate_sample):
    each event type keeps its own rate — the class-rebalancing sampler
    (vs deterministic_sample's one global rate and stratified_sample's
    exactly-k). Keys absent from the rate map get the default rate."""
    rd = _rd()
    from cartography_ray.ops.window import keyed_rate_sample

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    return keyed_rate_sample(
        ds, "event_id", "event_type", WSAMPLE_RATES, default_rate=WSAMPLE_DEFAULT
    )


def _wsample_sql() -> str:
    mod = 1 << 32
    cases = "\n        ".join(
        f"WHEN '{k}' THEN {int(r * mod)}" for k, r in WSAMPLE_RATES.items()
    )
    return f"""
SELECT event_id, user_id, event_type FROM events
WHERE (CAST(event_id AS UBIGINT) % 4294967296) * 2654435761 % 4294967296
      < CASE event_type
        {cases}
        ELSE {int(WSAMPLE_DEFAULT * mod)} END
"""


SPLIT_FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_events_split(sf_dir: str):
    """Leakage-safe train/val/test split (ops/window.hash_split): every
    event labeled by its USER's hash band, so one user's events never
    straddle splits — per-batch append, no shuffle, RNG-free."""
    rd = _rd()
    from cartography_ray.ops.window import hash_split

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    return hash_split(ds, "user_id", SPLIT_FRACS)


def _sql_events_split() -> str:
    mod = 1 << 32
    c1 = int(SPLIT_FRACS["train"] * mod)
    c2 = int((SPLIT_FRACS["train"] + SPLIT_FRACS["val"]) * mod)
    return f"""
SELECT event_id, user_id,
       CASE WHEN h < {c1} THEN 'train'
            WHEN h < {c2} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT event_id, user_id,
         (CAST(user_id AS UBIGINT) % 4294967296) * 2654435761 % 4294967296 AS h
  FROM events
)
"""


SQL_EVENTS_SPLIT = _sql_events_split()


def q_docs_shuffled(sf_dir: str):
    """Deterministic epoch shuffle (ops/window.epoch_shuffle): every doc
    gets its epoch-1 hash position and the table is globally sorted by
    it — the RNG-free per-epoch training-order permutation. The sort is
    the one all-to-all; positions are a per-batch append. The driver's
    compare is order-insensitive, so the oracle checks the POSITIONS;
    the cross-block global ordering is asserted in tests."""
    rd = _rd()
    from cartography_ray.ops.window import epoch_shuffle

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return epoch_shuffle(ds, "doc_id", epoch=1)


SQL_DOCS_SHUFFLED = """
SELECT doc_id,
       CAST(((CAST(doc_id AS UBIGINT) % 4294967296 + 1) % 4294967296)
            * 2654435761 % 4294967296 AS BIGINT) AS shuffle_pos
FROM documents
"""


def q_events_stratified(sf_dir: str):
    """Exactly-k-per-group deterministic sample (grouped_topk over the
    sampling score — per-batch combiner bounds shuffle volume)."""
    rd = _rd()
    from cartography_ray.ops.window import stratified_sample

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "event_type"])
    out = stratified_sample(
        ds, "event_type", "event_id", k=STRATA_K, num_partitions=_parts_for(path)
    )
    return out.select_columns(["event_type", "event_id", "rn"])


SQL_EVENTS_STRATIFIED = f"""
SELECT event_type, event_id, rn FROM (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY (CAST(event_id AS UBIGINT) % 4294967296) * 2654435761 % 4294967296,
                    event_id
         ) AS rn
  FROM events
) WHERE rn <= {STRATA_K}
"""


MIX_RATE_A, MIX_RATE_B = 0.6, 0.3


def q_docs_mix(sf_dir: str):
    """Deterministic weighted corpus mixing (ops/window.mix_sources):
    two sources (even/odd doc_ids standing in for two corpora) sampled
    at different rates with per-source salts, tagged and unioned — the
    training-data mixing-weights step, RNG-free and SQL-twinned."""
    rd = _rd()
    from cartography_ray.ops.window import mix_sources

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id")
            return t.filter(pc.equal(pc.bit_wise_and(ids, pa.scalar(1, pa.int64())), parity))

        return fn

    web = docs.map_batches(half(0), batch_format="pyarrow")
    chat = docs.map_batches(half(1), batch_format="pyarrow")
    return mix_sources([("web", web, MIX_RATE_A), ("chat", chat, MIX_RATE_B)], "doc_id")


SQL_DOCS_MIX = f"""
SELECT doc_id, 'web' AS source FROM documents
WHERE doc_id % 2 = 0
  AND (CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761 % 4294967296
      < {int(MIX_RATE_A * (1 << 32))}
UNION ALL
SELECT doc_id, 'chat' AS source FROM documents
WHERE doc_id % 2 = 1
  AND ((CAST(doc_id AS UBIGINT) % 4294967296 + 1) % 4294967296) * 2654435761 % 4294967296
      < {int(MIX_RATE_B * (1 << 32))}
"""


def q_events_pivot(sf_dir: str):
    """PIVOT / conditional aggregation: per-user value-cents by event
    type as wide columns (ops/agg.pivot_groupby_sum — widen + the
    existing two-phase partial agg, no new shuffle machinery)."""
    rd = _rd()
    from cartography_ray.ops.agg import pivot_groupby_sum

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["user_id", "event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "value_cents": _cents(t.column("value")),
            }
        )

    return pivot_groupby_sum(
        ds.map_batches(cents, batch_format="pyarrow"),
        "user_id", "event_type", EVENT_TYPES, "value_cents",
        suffix="_cents", num_partitions=_parts_for(path),
    )


SQL_EVENTS_PIVOT = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS click_cents,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS view_cents,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_cents,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS signup_cents,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS error_cents
FROM events GROUP BY 1
"""


def q_events_lag(sf_dir: str):
    """Generic per-partition LAG (ops/window.with_lag): each event gets
    its user's previous event id and the inter-event gap (-1 sentinel
    for partition firsts so both engines emit stable int64)."""
    rd = _rd()
    from cartography_ray.ops.window import with_lag

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["user_id", "ts", "event_id"])
    lagged = with_lag(
        ds, key="user_id", order_cols=["ts", "event_id"], cols=["ts", "event_id"],
        num_partitions=_parts_for(path),
    )

    def project(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t.column("ts"), pa.int64())
        prev_us = pc.cast(pc.cast(t.column("prev_ts"), pa.timestamp("us")), pa.int64())
        neg1 = pa.scalar(-1, pa.int64())
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "prev_event_id": pc.coalesce(
                    pc.cast(pc.round(t.column("prev_event_id")), pa.int64()), neg1
                ),
                "gap_us": pc.coalesce(pc.subtract(ts_us, prev_us), neg1),
            }
        )

    return lagged.map_batches(project, batch_format="pyarrow")


SQL_EVENTS_LAG = """
SELECT event_id, user_id,
       COALESCE(LAG(event_id) OVER w, -1) AS prev_event_id,
       COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER w, -1) AS gap_us
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_events_ewma(sf_dir: str):
    """Per-user exponential smoothing of spend (ops/window.ewma, α=0.5)
    — the recursive member of the windowed family. Dyadic α makes every
    step the identical multiply/multiply/add the recursive-CTE twin
    evaluates, so the float64 stream hash-matches exactly (rounded to
    1e-9 like events_zscore; dyadic values can never sit on a decimal
    half-boundary, so the rounding modes agree too)."""
    rd = _rd()
    from cartography_ray.ops.window import ewma

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "cents": _cents(t.column("value")),
            }
        )

    sm = ewma(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        order_cols=["ts", "event_id"],
        value_col="cents",
        alpha=0.5,
        num_partitions=_parts_for(path),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ewma9": pc.round(
                    t.column("ewma"), 9, round_mode="half_towards_infinity"
                ),
            }
        )

    return sm.map_batches(project, batch_format="pyarrow")


SQL_EVENTS_EWMA = """
WITH RECURSIVE base AS (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), rec AS (
  SELECT event_id, user_id, rn, CAST(cents AS DOUBLE) AS y FROM base WHERE rn = 1
  UNION ALL
  SELECT b.event_id, b.user_id, b.rn, 0.5 * b.cents + 0.5 * r.y
  FROM base b JOIN rec r ON b.user_id = r.user_id AND b.rn = r.rn + 1
)
SELECT event_id, user_id, round(y, 9) AS ewma9 FROM rec
"""


def q_events_running_distinct(sf_dir: str):
    """Per-user running count of distinct event types seen so far
    (ops/window.running_distinct) — the breadth-so-far behavioral
    feature; exact int64, windowed-COUNT(DISTINCT) emulated on both
    engines via the first-occurrence flag."""
    rd = _rd()
    from cartography_ray.ops.window import running_distinct

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "user_id", "ts", "event_type"])
    out = running_distinct(
        ds,
        key="user_id",
        order_cols=["ts", "event_id"],
        distinct_col="event_type",
        out_col="types_seen",
        num_partitions=_parts_for(path),
    )

    def project(t: pa.Table) -> pa.Table:
        return t.select(["event_id", "user_id", "types_seen"])

    return out.map_batches(project, batch_format="pyarrow")


SQL_EVENTS_RUNNING_DISTINCT = """
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS types_seen
FROM (
  SELECT event_id, user_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
"""


def q_events_running_sum(sf_dir: str, chunk_us: int | None = None):
    """Per-user cumulative spend (ops/window.running_sum) — the ordered
    running-aggregate member of the windowed family; integer cents so
    the SQL window-function twin hash-matches."""
    rd = _rd()
    from cartography_ray.ops.window import running_sum

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "v_cents": _cents(t.column("value")),
            }
        )

    rs = running_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        order_cols=["ts_us", "event_id"],
        value_col="v_cents",
        out_col="run_cents",
        num_partitions=_parts_for(path),
        chunk_us=chunk_us,
    )
    return rs.select_columns(["event_id", "user_id", "ts_us", "run_cents"])


def q_events_running_sum_salted(sf_dir: str):
    """Hot-key fallback plan (6 h time-chunk salting + cell-prefix
    fan-back) — same oracle as events_running_sum proves equivalence."""
    return q_events_running_sum(sf_dir, chunk_us=6 * 3_600_000_000)


SQL_EVENTS_RUNNING_SUM = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
FROM events
"""


ROLLING_FRAME_ROWS = 5


def q_events_rolling(sf_dir: str):
    """Per-user bounded-frame moving spend (ops/window.rolling_sum) —
    the ROWS-BETWEEN window-frame member of the windowed family.
    Integer-exact: key-local cumsum minus the cumsum frame-size back,
    never a float rolling kernel, so the SQL twin hash-matches."""
    rd = _rd()
    from cartography_ray.ops.window import rolling_sum

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "v_cents": _cents(t.column("value")),
            }
        )

    rs = rolling_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="user_id",
        order_cols=["ts_us", "event_id"],
        value_col="v_cents",
        window_rows=ROLLING_FRAME_ROWS,
        out_col="roll_cents",
        num_partitions=_parts_for(path),
    )
    return rs.select_columns(["event_id", "user_id", "ts_us", "roll_cents"])


SQL_EVENTS_ROLLING = f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN {ROLLING_FRAME_ROWS - 1} PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_cents
FROM events
"""


WINSOR_LO, WINSOR_HI = 0.05, 0.95


def q_events_winsorized(sf_dir: str):
    """Outlier trimming by per-group quantile bounds — a pure COMPOSITION
    of existing operators: exact grouped quantiles (bit-identical to
    ``quantile_cont``, cf. events_quantiles) → dimension-bounded bounds
    broadcast → per-batch filter. Keeps events inside [p05, p95] of
    their type."""
    import ray

    rd = _rd()
    from cartography_ray.ops.quantiles import grouped_quantiles

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "event_type", "value"])
    bounds = grouped_quantiles(
        ds.map_batches(
            lambda t: t.select(["event_type", "value"]), batch_format="pyarrow"
        ),
        "event_type", "value", [WINSOR_LO, WINSOR_HI],
        num_partitions=_parts_for(path),
    ).to_pandas()  # event types are dimension-bounded by contract
    bmap_ref = ray.put(
        {r.event_type: (r.p05, r.p95) for r in bounds.itertuples()}
    )

    def trim(t: pa.Table) -> pa.Table:
        m = ray.get(bmap_ref)
        et = t.column("event_type").to_pylist()
        v = t.column("value").to_numpy(zero_copy_only=False)
        lo = np.fromiter((m[x][0] for x in et), dtype="float64", count=len(et))
        hi = np.fromiter((m[x][1] for x in et), dtype="float64", count=len(et))
        keep = (v >= lo) & (v <= hi)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "value_cents": _cents(t.column("value")),
            }
        )

    return ds.map_batches(trim, batch_format="pyarrow")


SQL_EVENTS_WINSORIZED = f"""
WITH b AS (
  SELECT event_type,
         quantile_cont(value, {WINSOR_LO}) AS lo,
         quantile_cont(value, {WINSOR_HI}) AS hi
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
       CAST(round(e.value * 100) AS BIGINT) AS value_cents
FROM events e JOIN b USING (event_type)
WHERE e.value >= b.lo AND e.value <= b.hi
"""


def q_events_zscore(sf_dir: str):
    """Per-group feature standardization (z-score) — the normalization
    step of training-data pipelines, with the co-moment exactness idiom
    made PER-ROW: one pass folds exact int64 (n, Σx, Σx²) per type
    (dimension-bounded, broadcast via ``ray.put``), then every row's
    z = (n·x − Σx) / √(n·(n·Σx² − Σx²)/(n−1)) is evaluated per batch
    with the identical float64 expression tree the SQL twin hand-writes
    (sample stddev; both engines make the same IEEE int64→double
    conversions, so the 1e-9-rounded outputs hash-match). Groups need
    n ≥ 2 and non-constant values (true of this corpus by construction;
    degenerate groups emit 0)."""
    import ray

    rd = _rd()
    from cartography_ray.ops.agg import bounded_groupby_agg

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        x = _cents(t.column("value"))
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "x": x,
                "x2": pc.multiply(x, x),
            }
        )

    moments = bounded_groupby_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"],
        {"n": (None, "count"), "sx": ("x", "sum"), "sx2": ("x2", "sum")},
    ).to_pandas()  # event types: dimension-bounded by contract
    mref = ray.put(
        {
            r.event_type: (float(r.n), float(r.sx), float(r.sx2))
            for r in moments.itertuples()
        }
    )

    def zscore(t: pa.Table) -> pa.Table:
        m = ray.get(mref)
        et = t.column("event_type").to_pylist()
        x = _cents(t.column("value")).to_numpy(zero_copy_only=False).astype("float64")
        n = np.fromiter((m[e][0] for e in et), dtype="float64", count=len(et))
        sx = np.fromiter((m[e][1] for e in et), dtype="float64", count=len(et))
        sx2 = np.fromiter((m[e][2] for e in et), dtype="float64", count=len(et))
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (n * x - sx) / np.sqrt(n * (n * sx2 - sx * sx) / (n - 1.0))
        z = np.where(n > 1.0, z, 0.0)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "z9": pc.round(
                    pa.array(z, pa.float64()), 9, round_mode="half_towards_infinity"
                ),
            }
        )

    return ds.map_batches(zscore, batch_format="pyarrow")


SQL_EVENTS_ZSCORE = """
WITH m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sx2
  FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x FROM events)
  GROUP BY 1
)
SELECT e.event_id, e.event_type,
       round(
         CASE WHEN m.n > 1 THEN
           (CAST(m.n AS DOUBLE) * CAST(CAST(round(e.value * 100) AS BIGINT) AS DOUBLE)
            - CAST(m.sx AS DOUBLE))
           / sqrt(CAST(m.n AS DOUBLE)
                  * (CAST(m.n AS DOUBLE) * CAST(m.sx2 AS DOUBLE)
                     - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE))
                  / (CAST(m.n AS DOUBLE) - 1))
         ELSE 0.0 END, 9) AS z9
FROM events e JOIN m USING (event_type)
"""


NTILE_N = 4


def q_events_ntile(sf_dir: str):
    """Per-user NTILE quantile bucketing (ops/window.with_ntile)."""
    rd = _rd()
    from cartography_ray.ops.window import with_ntile

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "ts", "user_id"])
    tiled = with_ntile(
        ds, key="user_id", order_cols=["ts", "event_id"], n=NTILE_N,
        num_partitions=_parts_for(path),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "tile": t.column("tile"),
            }
        )

    return tiled.map_batches(project, batch_format="pyarrow")


SQL_EVENTS_NTILE = f"""
SELECT event_id, user_id,
       CAST(NTILE({NTILE_N}) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS tile
FROM events
"""


def q_events_rank(sf_dir: str):
    """Per-user RANK + DENSE_RANK over spend (ops/window.with_rank —
    both modes in the one key shuffle). Cent values tie, so the gap
    (rnk) vs no-gap (drnk) semantics genuinely diverge here."""
    rd = _rd()
    from cartography_ray.ops.window import with_rank

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "v_cents": _cents(t.column("value")),
            }
        )

    ranked = with_rank(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="user_id", order_cols=["v_cents"],
        rank_col="rnk", dense_col="drnk",
        num_partitions=_parts_for(path),
    )
    return ranked.select_columns(["event_id", "user_id", "rnk", "drnk"])


SQL_EVENTS_RANK = """
SELECT event_id, user_id,
       RANK() OVER w AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(round(value * 100) AS BIGINT))
"""


def q_events_cume_dist(sf_dir: str):
    """Per-user CUME_DIST + PERCENT_RANK over spend (the distribution-
    position window modes of ``ops/window.with_rank``, same one-shuffle
    pass as rank/dense_rank). Both outputs are a single IEEE division
    of exact int64s — (tie-group max row)/size and (rank−1)/(size−1) —
    so the DuckDB window twins hash-match bit-for-bit; cent ties are
    real in this corpus, so the peer semantics genuinely engage."""
    rd = _rd()
    from cartography_ray.ops.window import with_rank

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "v_cents": _cents(t.column("value")),
            }
        )

    ranked = with_rank(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="user_id", order_cols=["v_cents"],
        rank_col=None, cume_col="cume", pctrank_col="pctr",
        num_partitions=_parts_for(path),
    )
    return ranked.select_columns(["event_id", "user_id", "cume", "pctr"])


SQL_EVENTS_CUME_DIST = """
SELECT event_id, user_id,
       CUME_DIST() OVER w AS cume,
       PERCENT_RANK() OVER w AS pctr
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(round(value * 100) AS BIGINT))
"""


def q_events_attribution(sf_dir: str, chunk_us: int | None = None):
    """Purchase→click attribution: each purchase matched to the user's
    most recent preceding click (distributed as-of join, ops/joins.py)."""
    rd = _rd()
    from cartography_ray.ops.joins import asof_join

    path = f"{sf_dir}/events.parquet"
    ev = rd.read_parquet(path, columns=["user_id", "event_type", "ts", "event_id"])

    def only(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("event_type"), kind)).drop_columns(
                ["event_type"]
            )

        return fn

    purchases = ev.map_batches(only("purchase"), batch_format="pyarrow")
    clicks = ev.map_batches(only("click"), batch_format="pyarrow")
    joined = asof_join(
        purchases, clicks, by="user_id", on="ts", right_prefix="click_",
        how="inner", num_partitions=_parts_for(path), chunk_us=chunk_us,
    )

    def project(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t.column("ts"), pa.int64())
        click_us = pc.cast(t.column("click_ts"), pa.int64())
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "click_event_id": t.column("click_event_id"),
                "lag_us": pc.subtract(ts_us, click_us),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


def q_events_attribution_salted(sf_dir: str):
    """Hot-key fallback plan of ``events_attribution``: no tolerance, so
    this exercises the two-pass carry-in path (in-chunk as-of → per-cell
    summaries → cell-sized as-of → hash-join fan-back) against the SAME
    DuckDB ASOF JOIN oracle."""
    return q_events_attribution(sf_dir, chunk_us=SALT_CHUNK_US)


SQL_EVENTS_ATTRIBUTION = """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, c.event_id AS click_event_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_events_next_purchase(sf_dir: str):
    """Click→NEXT-purchase conversion: each click matched to the user's
    earliest purchase at-or-after it — the FORWARD as-of direction
    (ops/joins.asof_join direction=\"forward\"; time-to-conversion is
    the standard funnel metric this expresses). Oracle note: DuckDB's
    ASOF JOIN is backward-only, so the twin negates epoch-us timestamps
    on both sides (forward on t ≡ backward on −t); determinism rests on
    unique (user_id, ts) per event type, which holds in the corpus."""
    rd = _rd()
    from cartography_ray.ops.joins import asof_join

    path = f"{sf_dir}/events.parquet"
    ev = rd.read_parquet(path, columns=["user_id", "event_type", "ts", "event_id"])

    def only(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("event_type"), kind)).drop_columns(
                ["event_type"]
            )

        return fn

    clicks = ev.map_batches(only("click"), batch_format="pyarrow")
    purchases = ev.map_batches(only("purchase"), batch_format="pyarrow")
    joined = asof_join(
        clicks, purchases, by="user_id", on="ts", right_prefix="purchase_",
        how="inner", direction="forward", num_partitions=_parts_for(path),
    )

    def project(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t.column("ts"), pa.int64())
        pur_us = pc.cast(t.column("purchase_ts"), pa.int64())
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "purchase_event_id": t.column("purchase_event_id"),
                "lead_us": pc.subtract(pur_us, ts_us),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


SQL_EVENTS_NEXT_PURCHASE = """
WITH c AS (SELECT user_id, -epoch_us(ts) AS nts, epoch_us(ts) AS ts_us, event_id
           FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, -epoch_us(ts) AS nts, epoch_us(ts) AS ts_us, event_id
           FROM events WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id, p.event_id AS purchase_event_id,
       p.ts_us - c.ts_us AS lead_us
FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.nts >= p.nts
"""


def q_events_quantiles(sf_dir: str):
    """Exact per-group quantiles (quantile_cont analogue). Values are
    integer cents on both sides so the linear interpolation is exact in
    doubles (see ops/quantiles.py; the histogram sketch is the scale
    path, recall-tested in tests/)."""
    rd = _rd()
    from cartography_ray.ops.quantiles import grouped_quantiles

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t.column("event_type"), "value_cents": _cents(t.column("value"))}
        )

    return grouped_quantiles(
        ds.map_batches(cents, batch_format="pyarrow"),
        "event_type", "value_cents", [0.25, 0.5, 0.75],
        num_partitions=_parts_for(path),
    )


SQL_EVENTS_QUANTILES = """
SELECT event_type, COUNT(*) AS n,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.25) AS p25,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.50) AS p50,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.75) AS p75
FROM events GROUP BY 1
"""


def q_events_mad(sf_dir: str):
    """Per-type median absolute deviation (ops/quantiles.grouped_mad) —
    robust dispersion in PURE int64: med2 = 2·median(cents), mad4 =
    4·MAD, both exact middle-element arithmetic, one shuffle total (the
    deviation pass runs inside the same kernel as the median)."""
    rd = _rd()
    from cartography_ray.ops.quantiles import grouped_mad

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t.column("event_type"), "value_cents": _cents(t.column("value"))}
        )

    return grouped_mad(
        ds.map_batches(cents, batch_format="pyarrow"),
        "event_type", "value_cents",
        num_partitions=_parts_for(path),
    )


SQL_EVENTS_MAD = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
), m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS med2
  FROM c GROUP BY 1
), d AS (
  SELECT c.event_type, abs(2 * c.v - m.med2) AS dev2
  FROM c JOIN m USING (event_type)
)
SELECT d.event_type, m.n, m.med2,
       CAST(2 * quantile_cont(d.dev2, 0.5) AS BIGINT) AS mad4
FROM d JOIN m USING (event_type)
GROUP BY d.event_type, m.n, m.med2
"""


def q_events_quantiles_disc(sf_dir: str):
    """Discrete per-group quantiles (quantile_disc analogue): returns
    ACTUAL stream elements (numpy 'inverted_cdf', verified == DuckDB
    quantile_disc elementwise), so on integer cents both sides are
    integer-exact end-to-end — no float convention involved at all."""
    rd = _rd()
    from cartography_ray.ops.quantiles import grouped_quantiles

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t.column("event_type"), "value_cents": _cents(t.column("value"))}
        )

    return grouped_quantiles(
        ds.map_batches(cents, batch_format="pyarrow"),
        "event_type", "value_cents", [0.10, 0.50, 0.90, 0.99],
        num_partitions=_parts_for(path), method="disc",
    )


SQL_EVENTS_QUANTILES_DISC = """
SELECT event_type, COUNT(*) AS n,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.10) AS p10,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.50) AS p50,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.90) AS p90,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) AS p99
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# Training-data operator family (documents / embeddings)
# --------------------------------------------------------------------------


def q_docs_stats(sf_dir: str):
    rd = _rd()
    from cartography_ray.functions.text import TextStats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(TextStats, batch_format="pyarrow", concurrency=2)


SQL_DOCS_STATS = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       len(regexp_extract_all(text, '\b(the|and|of|to|a|is|in)\b')) AS n_stop,
       length(text) AS n_chars2
FROM documents
"""


BUDGET_TOKENS = 15_000


def q_docs_budget_select(sf_dir: str):
    """Budget-constrained corpus selection (ops/window.
    ordered_budget_select): keep the highest-quality documents until a
    token budget is spent — quality here is the stopword+punctuation
    milli-density from TextStats (a stand-in for a model score), size is
    n_tokens. No global sort: per-score histogram → driver boundary find
    → stateless keep filter + a sort of the ONE boundary bin."""
    rd = _rd()
    from cartography_ray.functions.text import TextStats
    from cartography_ray.ops.window import ordered_budget_select

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    stats = ds.map_batches(TextStats, batch_format="pyarrow", concurrency=2)

    def proj(t: pa.Table) -> pa.Table:
        tok = pc.cast(t.column("n_tokens"), pa.int64())
        dens = pc.add(
            pc.cast(t.column("n_stop"), pa.int64()),
            pc.cast(t.column("n_punct"), pa.int64()),
        )
        denom = pc.max_element_wise(tok, pa.scalar(1, pa.int64()))
        # identical IEEE tree to the SQL twin:
        # floor(1000.0 * dens / denom) — ints < 2^53 are float64-exact
        f = pc.divide(
            pc.multiply(pa.scalar(1000.0), pc.cast(dens, pa.float64())),
            pc.cast(denom, pa.float64()),
        )
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "score": pc.cast(pc.floor(f), pa.int64()),
                "sz": tok,
            }
        )

    scored = stats.map_batches(proj, batch_format="pyarrow")
    return ordered_budget_select(
        scored, "score", "sz", "doc_id", BUDGET_TOKENS,
        num_partitions=_parts_for(path),
    )


SQL_DOCS_BUDGET_SELECT = rf"""
WITH st AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         len(regexp_extract_all(text, '\b(the|and|of|to|a|is|in)\b')) AS n_stop
  FROM documents
), s AS (
  SELECT doc_id,
         CAST(floor(1000.0 * (n_stop + n_punct) / greatest(n_tokens, 1)) AS BIGINT) AS score,
         CAST(n_tokens AS BIGINT) AS sz
  FROM st
), w AS (
  SELECT doc_id, score, sz,
         SUM(sz) OVER (ORDER BY score DESC, doc_id) AS cum
  FROM s
)
SELECT doc_id, score, sz FROM w WHERE cum <= {BUDGET_TOKENS}
"""


def q_docs_langid(sf_dir: str):
    rd = _rd()
    from cartography_ray.functions.text import langid_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(langid_batch, batch_format="pyarrow")


SQL_DOCS_LANGID = r"""
WITH h AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS de,
         len(regexp_extract_all(lower(text), '\b(the|and|is|of|to)\b')) AS en,
         len(regexp_extract_all(lower(text), '\b(el|la|los|que|es)\b')) AS es,
         len(regexp_extract_all(lower(text), '\b(le|la|les|est|et)\b')) AS fr
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
            WHEN de >= en AND de >= es AND de >= fr THEN 'de'
            WHEN en >= es AND en >= fr THEN 'en'
            WHEN es >= fr THEN 'es'
            ELSE 'fr' END AS pred_lang,
       en AS en_hits
FROM h
"""


def q_docs_fingerprint(sf_dir: str):
    rd = _rd()
    from cartography_ray.functions.text import fingerprint_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


SQL_DOCS_FINGERPRINT = r"""
SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


VOCAB_TOP_N = 100
CHUNK_TOKENS = 64


def q_docs_token_freq(sf_dir: str):
    """Corpus vocabulary top-N (functions/text.token_frequency): batch
    tokenize + count combiner → one vocab-sized shuffle → per-block
    prune → candidate sort."""
    rd = _rd()
    from cartography_ray.functions.text import token_frequency

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["text"])
    return token_frequency(ds, top_n=VOCAB_TOP_N, num_partitions=_parts_for(path))


SQL_DOCS_TOKEN_FREQ = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
  FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM toks WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT {VOCAB_TOP_N}
"""

BIGRAM_TOP_N = 100


def q_docs_bigrams(sf_dir: str):
    """Corpus collocation top-N (functions/text.bigram_frequency):
    adjacent-token pairs within each document, counted corpus-wide —
    same one-vocab-shuffle shape as docs_token_freq."""
    rd = _rd()
    from cartography_ray.functions.text import bigram_frequency

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["text"])
    return bigram_frequency(ds, top_n=BIGRAM_TOP_N, num_partitions=_parts_for(path))


SQL_DOCS_BIGRAMS = f"""
WITH tl AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
),
bg AS (
  SELECT l[CAST(i AS INTEGER)] || ' ' || l[CAST(i AS INTEGER) + 1] AS bigram
  FROM (SELECT l, unnest(range(1, len(l))) AS i FROM tl)
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT {BIGRAM_TOP_N}
"""


TFIDF_K = 5


def q_docs_tfidf(sf_dir: str):
    """Top-k TF-IDF terms per document (functions/text.tfidf_topk) —
    integer-exact scoring (int tf × floor-scaled-ln idf), so the DuckDB
    twin is a full hash oracle. n_docs from the parquet footer."""
    import pyarrow.parquet as pq

    rd = _rd()
    from cartography_ray.functions.text import tfidf_topk

    path = f"{sf_dir}/documents.parquet"
    n_docs = pq.read_metadata(path).num_rows
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    return tfidf_topk(ds, n_docs=n_docs, k=TFIDF_K, num_partitions=_parts_for(path))


SQL_DOCS_TFIDF = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token <> '' GROUP BY 1, 2
), df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         tf.tf * CAST(floor(1000000 * ln(
             CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df.df)) AS BIGINT)
           AS score
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, tf, score, rn FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY score DESC, token ASC) AS BIGINT) AS rn
  FROM scored
) WHERE rn <= {TFIDF_K}
"""


BM25_TERMS = ["hash", "join", "vector", "stream"]
BM25_K = 20


def q_docs_bm25(sf_dir: str):
    """BM25 retrieval ranking: top-20 documents for a fixed query
    (functions/text.bm25_topk) — integer-exact BM25 (exact-int inputs,
    per-term floored micro-scores, order-free int sum), so the DuckDB
    twin is a full hash oracle despite the float formula. n_docs from
    the parquet footer."""
    import pyarrow.parquet as pq

    rd = _rd()
    from cartography_ray.functions.text import bm25_topk

    path = f"{sf_dir}/documents.parquet"
    n_docs = pq.read_metadata(path).num_rows
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    return bm25_topk(ds, BM25_TERMS, n_docs=n_docs, k=BM25_K)


SQL_DOCS_BM25 = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
  FROM documents
), tok AS (
  SELECT doc_id, token FROM toks WHERE token <> ''
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) /
         CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl
  FROM dl
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE token IN ({", ".join("'" + t + "'" for t in BM25_TERMS)})
  GROUP BY 1, 2
), df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), idf AS (
  SELECT token, CAST(floor(1000000 * ln(
      1.0 + (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) - df + 0.5)
            / (df + 0.5))) AS BIGINT) AS idf6
  FROM df
), term_scores AS (
  SELECT tf.doc_id,
         CAST(floor(CAST(idf.idf6 AS DOUBLE) * (
             (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)) /
             (CAST(tf.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
                + 0.75 * CAST(dl.dl AS DOUBLE) / (SELECT avgdl FROM stats)))
         )) AS BIGINT) AS s
  FROM tf JOIN idf USING (token) JOIN dl USING (doc_id)
)
SELECT doc_id, score_micro, rn FROM (
  SELECT doc_id, score_micro, CAST(ROW_NUMBER() OVER (
      ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS rn
  FROM (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_micro
        FROM term_scores GROUP BY 1)
) WHERE rn <= {BM25_K}
"""


def q_docs_bpe_tokens(sf_dir: str):
    """Whitespace + GPT-2-style BPE pre-token counts per document
    (functions/text.bpe_token_count) — both Arrow RE2 kernels,
    shuffle-free; the training-token budget proxy."""
    rd = _rd()
    from cartography_ray.functions.text import bpe_token_count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bpe_token_count(ds)


def _sql_docs_bpe_tokens() -> str:
    from cartography_ray.functions.text import BPE_SPLIT_RE as _raw

    # the contraction alternative contains single quotes — double them
    # for the SQL string literal
    BPE_SPLIT_RE = _raw.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[^ \\t\\n\\r\\f\\v]+')) AS BIGINT)
         AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_SPLIT_RE}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents
"""


def q_docs_lm_score(sf_dir: str):
    """Perplexity-proxy quality scoring against a corpus-trained unigram
    LM (functions/text.lm_score) — integer-exact NLL sums (ONE libm ln
    per distinct token), token stream never shuffles."""
    rd = _rd()
    from cartography_ray.functions.text import lm_score

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    return lm_score(ds, num_partitions=_parts_for(path))


SQL_DOCS_LM_SCORE = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token <> '' GROUP BY 1, 2
), c AS (
  SELECT token, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY 1
), nll AS (
  SELECT token, CAST(floor(1000000 * ln(
      CAST((SELECT SUM(c) FROM c) AS DOUBLE) / c)) AS BIGINT) AS nll
  FROM c
)
SELECT tf.doc_id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf.tf * nll.nll) AS BIGINT) AS nll
FROM tf JOIN nll USING (token)
GROUP BY 1
"""


def q_docs_heavy_tokens(sf_dir: str):
    """Shuffle-free Misra-Gries heavy hitters over the token stream
    (ops/sketches.heavy_hitters) — the sketch-path twin of
    ``docs_token_freq``. With vocabulary ≤ k_track (true of this corpus:
    tokens are drawn from a small word list) the summary is provably
    exact with err = 0, so the DuckDB twin is a real oracle here; the
    approximate regime (vocab ≫ k_track: lower/upper bracketing, heavy
    items guaranteed present, err ≤ N/(k+1)) is property-tested in
    tests/test_sketches.py."""
    rd = _rd()
    from cartography_ray.functions.text import VOCAB_SPLIT_RE
    from cartography_ray.ops.sketches import heavy_hitters

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def toks(t: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.cast(t.column("text"), pa.string()))
        flat = pc.list_flatten(pc.split_pattern_regex(lowered, VOCAB_SPLIT_RE))
        return pa.table({"token": flat.filter(pc.not_equal(flat, ""))})

    return heavy_hitters(
        ds.map_batches(toks, batch_format="pyarrow"),
        "token", k_track=512, top_n=VOCAB_TOP_N,
    )


SQL_DOCS_HEAVY_TOKENS = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
  FROM documents
)
SELECT token AS value, CAST(COUNT(*) AS BIGINT) AS count_lo,
       CAST(0 AS BIGINT) AS err
FROM toks WHERE token <> ''
GROUP BY token
ORDER BY count_lo DESC, value ASC
LIMIT {VOCAB_TOP_N}
"""


def q_docs_chunks(sf_dir: str):
    """Fixed-token-window document chunking (functions/text.
    chunk_documents) — the RAG/training-window split; pure flat_map."""
    rd = _rd()
    from cartography_ray.functions.text import chunk_documents

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return chunk_documents(ds, max_tokens=CHUNK_TOKENS)


SQL_DOCS_CHUNKS = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \\t\\n\\r\\f\\v]+'),
                     x -> x <> '') AS toks
  FROM documents
), idx AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT))) AS i
  FROM d
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(toks, i * {CHUNK_TOKENS} + 1,
                           least((i + 1) * {CHUNK_TOKENS}, len(toks)))) AS BIGINT)
         AS n_tokens,
       array_to_string(list_slice(toks, i * {CHUNK_TOKENS} + 1,
                                  least((i + 1) * {CHUNK_TOKENS}, len(toks))), ' ')
         AS chunk_text
FROM idx
"""


def q_docs_repetition(sf_dir: str):
    """Gopher-style per-doc repetition quality signals (functions/text.
    repetition_stats) — integer numerators (token totals, top unigram /
    adjacent-bigram counts), shuffle-free per-batch kernel."""
    rd = _rd()
    from cartography_ray.functions.text import repetition_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return repetition_stats(ds)


SQL_DOCS_REPETITION = """
WITH split AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS l FROM documents
), raw AS (
  SELECT doc_id, unnest(l) AS token, generate_subscripts(l, 1) AS i FROM split
), tf AS (
  SELECT doc_id, token, i FROM raw WHERE token <> ''
), uni AS (
  SELECT doc_id, token, COUNT(*) AS c FROM tf GROUP BY 1, 2
), per AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS top_tok_n
  FROM uni GROUP BY 1
), seq AS (
  SELECT doc_id, token, lead(token) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
  FROM tf
), bg AS (
  SELECT doc_id, token || ' ' || nxt AS b, COUNT(*) AS c
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
), btop AS (
  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n FROM bg GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(per.n_tokens, 0) AS n_tokens,
       COALESCE(per.n_distinct, 0) AS n_distinct,
       COALESCE(per.top_tok_n, 0) AS top_tok_n,
       COALESCE(btop.top_bigram_n, 0) AS top_bigram_n
FROM documents d LEFT JOIN per USING (doc_id) LEFT JOIN btop USING (doc_id)
"""


def q_docs_gopher(sf_dir: str):
    """Gopher quality-rule filter (Rae et al. 2021 §A1.1; functions/
    text.GopherQuality): seven per-document rules as 0/1 integers plus
    the conjunction — word-count bounds, mean-word-length bounds,
    symbol/bullet/ellipsis density caps, alphabetic-word floor, distinct-
    stopword floor. All cross-multiplied integer comparisons, shuffle-
    free per-batch actor stage."""
    rd = _rd()
    from cartography_ray.functions.text import GopherQuality

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(GopherQuality, batch_format="pyarrow", concurrency=2)


SQL_DOCS_GOPHER = r"""
WITH feat AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS words,
         length(text) - len(regexp_extract_all(text, '\s')) AS word_chars,
         length(text) - length(replace(text, chr(10), '')) + 1 AS lines,
         len(regexp_extract_all(text, '#|…|\.\.\.')) AS syms,
         len(regexp_extract_all(text, '(?m)^[-*•]')) AS bullets,
         len(regexp_extract_all(text, '(?m)(\.\.\.|…)$')) AS ellips,
         len(regexp_extract_all(text, '\S*[a-zA-Z]\S*')) AS alpha_words,
         (CASE WHEN regexp_matches(text, '\bthe\b') THEN 1 ELSE 0 END
          + CASE WHEN regexp_matches(text, '\band\b') THEN 1 ELSE 0 END
          + CASE WHEN regexp_matches(text, '\bof\b') THEN 1 ELSE 0 END
          + CASE WHEN regexp_matches(text, '\bto\b') THEN 1 ELSE 0 END
          + CASE WHEN regexp_matches(text, '\ba\b') THEN 1 ELSE 0 END
          + CASE WHEN regexp_matches(text, '\bis\b') THEN 1 ELSE 0 END
          + CASE WHEN regexp_matches(text, '\bin\b') THEN 1 ELSE 0 END) AS stops
  FROM documents
), rules AS (
  SELECT doc_id,
         CAST(words AS BIGINT) AS n_words,
         CAST(CASE WHEN words BETWEEN 20 AND 90 THEN 1 ELSE 0 END AS BIGINT) AS r_wordcount,
         CAST(CASE WHEN 3 * words <= word_chars AND word_chars <= 10 * words THEN 1 ELSE 0 END AS BIGINT) AS r_meanlen,
         CAST(CASE WHEN 10 * syms <= words THEN 1 ELSE 0 END AS BIGINT) AS r_symbol,
         CAST(CASE WHEN 10 * bullets <= 9 * lines THEN 1 ELSE 0 END AS BIGINT) AS r_bullet,
         CAST(CASE WHEN 10 * ellips <= 3 * lines THEN 1 ELSE 0 END AS BIGINT) AS r_ellipsis,
         CAST(CASE WHEN 5 * alpha_words >= 4 * words THEN 1 ELSE 0 END AS BIGINT) AS r_alpha,
         CAST(CASE WHEN stops >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop
  FROM feat
)
SELECT *,
       r_wordcount * r_meanlen * r_symbol * r_bullet * r_ellipsis
         * r_alpha * r_stop AS gopher_pass
FROM rules
"""


def q_docs_entropy(sf_dir: str):
    """Per-document token-distribution Shannon entropy (functions/text.
    token_entropy) in integer-exact scaled nats — low entropy flags
    gibberish / single-token spam. Floor-scaled-ln construction (the
    lm_score idiom) keeps the DuckDB oracle a full hash match;
    shuffle-free per-batch kernel."""
    rd = _rd()
    from cartography_ray.functions.text import token_entropy

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return token_entropy(ds)


SQL_DOCS_ENTROPY = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE token <> '' GROUP BY 1, 2
), tot AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM tf GROUP BY 1
), ent AS (
  SELECT tf.doc_id,
         CAST(SUM(c * (CAST(floor(1000000 * ln(CAST(t AS DOUBLE))) AS BIGINT)
                       - CAST(floor(1000000 * ln(CAST(c AS DOUBLE))) AS BIGINT))) AS BIGINT) AS e
  FROM tf JOIN tot ON tf.doc_id = tot.doc_id
  GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(tot.t, 0) AS n_tokens,
       COALESCE(ent.e, 0) AS entropy_scaled
FROM documents d
LEFT JOIN tot ON d.doc_id = tot.doc_id
LEFT JOIN ent ON d.doc_id = ent.doc_id
"""


PACK_BUDGET = 512


def q_docs_packed(sf_dir: str):
    """Sequence packing (functions/text.pack_sequences): per-language
    token-budget bin assignment — shuffle-free token count, ONE key
    shuffle (running_sum), vectorized bin epilogue."""
    rd = _rd()
    from cartography_ray.functions.text import pack_sequences

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return pack_sequences(
        ds,
        budget=PACK_BUDGET,
        num_partitions=_parts_for(f"{sf_dir}/documents.parquet"),
    )


SQL_DOCS_PACKED = f"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\r\\f\\v]+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT lang, doc_id, n_tokens,
       CAST(((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
              - n_tokens) // {PACK_BUDGET}) AS BIGINT) AS bin
FROM t
"""


# 2-token spans collide heavily on this corpus's 31-word vocabulary
# (93% duplicate chunks at sf0.01) so the keep-first + reassembly paths
# are exercised for real; production spans are larger (MassiveText uses
# ~50-token windows) — the operator is span-size-agnostic.
SPAN_DEDUP_TOKENS = 2


def q_docs_span_dedup(sf_dir: str):
    """Corpus-wide duplicate-span removal (functions/dedup.span_dedup):
    chunk → global keep-first per chunk text (combiner + ONE text-keyed
    min shuffle) → survivor-sized reassembly → id-only outer anchor."""
    rd = _rd()
    from cartography_ray.functions.dedup import span_dedup

    parts = _parts_for(f"{sf_dir}/documents.parquet")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return span_dedup(ds, span_tokens=SPAN_DEDUP_TOKENS, num_partitions=parts)


def q_docs_span_dedup_hashed(sf_dir: str):
    """The 100-TB plan twin of ``docs_span_dedup``: the dedup exchange
    ships (128-bit hash, occ) only; survivor text is fetched by a
    bloom-prefiltered semi-join. Same oracle — plan equivalence proved
    through the driver gate."""
    rd = _rd()
    from cartography_ray.functions.dedup import span_dedup

    parts = _parts_for(f"{sf_dir}/documents.parquet")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return span_dedup(
        ds, span_tokens=SPAN_DEDUP_TOKENS, num_partitions=parts, payload="hash"
    )


SQL_DOCS_SPAN_DEDUP = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \\t\\n\\r\\f\\v]+'),
                     x -> x <> '') AS toks
  FROM documents
), idx AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks) / {SPAN_DEDUP_TOKENS}.0) AS BIGINT))) AS i
  FROM d
), chunks AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         array_to_string(list_slice(toks, i * {SPAN_DEDUP_TOKENS} + 1,
                                    least((i + 1) * {SPAN_DEDUP_TOKENS}, len(toks))), ' ')
           AS chunk_text
  FROM idx
), ranked AS (
  SELECT doc_id, chunk_idx, chunk_text,
         ROW_NUMBER() OVER (PARTITION BY chunk_text
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
), agg AS (
  SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text
  FROM ranked WHERE rn = 1 GROUP BY doc_id
)
SELECT d0.doc_id, coalesce(a.text, '') AS text
FROM documents d0 LEFT JOIN agg a USING (doc_id)
"""


DECONTAM_NGRAM = 24
DECONTAM_BENCH_MOD = 41


def _decontam_parts(sf_dir: str):
    rd = _rd()
    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text", "source"])

    def part(is_bench: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % DECONTAM_BENCH_MOD == 0) == is_bench
            return t.filter(pa.array(mask))

        return fn

    bench = ds.map_batches(part(True), batch_format="pyarrow")
    corpus = ds.map_batches(part(False), batch_format="pyarrow")
    return corpus, bench, path


def q_docs_decontam(sf_dir: str):
    """Benchmark decontamination (functions/dedup.decontaminate): docs
    sharing any 24-char shingle with the benchmark subset (doc_id ≡ 0
    mod 41) are dropped. Broadcast plan (bench shingles ≤ limit)."""
    from cartography_ray.functions.dedup import decontaminate

    corpus, bench, path = _decontam_parts(sf_dir)
    return decontaminate(
        corpus, bench, ngram=DECONTAM_NGRAM, num_partitions=_parts_for(path)
    ).select_columns(["doc_id", "source"])


def q_docs_decontam_joined(sf_dir: str):
    """Same semantics through the distributed semi/anti-join plan
    (broadcast_limit=0) — the identical oracle proves plan equivalence,
    the *_salted precedent."""
    from cartography_ray.functions.dedup import decontaminate

    corpus, bench, path = _decontam_parts(sf_dir)
    return decontaminate(
        corpus, bench, ngram=DECONTAM_NGRAM, broadcast_limit=0,
        num_partitions=_parts_for(path),
    ).select_columns(["doc_id", "source"])


def q_docs_near_decontam(sf_dir: str):
    """NEAR-dup benchmark decontamination (functions/dedup.
    near_decontaminate): corpus docs whose MinHash-LSH banding collides
    with the benchmark subset are dropped — catches paraphrased eval
    leakage the exact 24-gram scrub misses. Rows-only (LSH is
    approximate by design); recall + broadcast≡join plan identity are
    asserted in tests/test_functions.py."""
    from cartography_ray.functions.dedup import near_decontaminate

    corpus, bench, path = _decontam_parts(sf_dir)
    return near_decontaminate(
        corpus, bench, num_perm=64, bands=8, shingle_k=5,
        num_partitions=_parts_for(path),
    ).select_columns(["doc_id", "source"])


SQL_DOCS_DECONTAM = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, substring(lt, CAST(i AS INTEGER), {DECONTAM_NGRAM}) AS g
  FROM (
    SELECT doc_id, lt, unnest(range(1, greatest(1, length(lt) - {DECONTAM_NGRAM - 2}))) AS i
    FROM (SELECT doc_id, lower(text) AS lt FROM documents)
  )
),
bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
contam AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (g))
SELECT doc_id, source FROM documents
WHERE doc_id % {DECONTAM_BENCH_MOD} <> 0
  AND doc_id NOT IN (SELECT doc_id FROM contam)
"""


# prune tokens appearing in ≥ 75% of documents (the corpus-frequency
# boilerplate strip); threshold scales with the corpus via the footer
# row count, so the query is sf-independent
DF_PRUNE_FRAC = 0.75


def q_docs_pruned(sf_dir: str):
    """Corpus-DF token pruning (functions/text.prune_frequent_tokens):
    one vocab-sized df shuffle, shape-bounded broadcast of the pruned
    set, per-batch rewrite."""
    import math

    import pyarrow.parquet as pq

    rd = _rd()
    from cartography_ray.functions.text import prune_frequent_tokens

    path = f"{sf_dir}/documents.parquet"
    n_docs = pq.read_metadata(path).num_rows
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    return prune_frequent_tokens(
        ds, n_docs=n_docs, df_limit=math.ceil(DF_PRUNE_FRAC * n_docs),
        num_partitions=_parts_for(path),
    )


SQL_DOCS_PRUNED = f"""
WITH split AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS l FROM documents
), raw AS (
  SELECT doc_id, unnest(l) AS token, generate_subscripts(l, 1) AS i FROM split
), tf AS (
  SELECT doc_id, token, i FROM raw WHERE token <> ''
), df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
), pruned AS (
  SELECT token FROM df
  WHERE df >= CAST(ceil({DF_PRUNE_FRAC} * (SELECT COUNT(*) FROM documents)) AS BIGINT)
), keep AS (
  SELECT doc_id, token, i FROM tf
  WHERE token NOT IN (SELECT token FROM pruned)
)
SELECT doc_id,
       string_agg(token, ' ' ORDER BY i) AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM keep GROUP BY doc_id
"""


def q_docs_incremental_dedup(sf_dir: str):
    """Cross-run incremental dedup (functions/dedup.
    incremental_exact_dedup): even doc_ids play the persisted history
    (epoch 1 seeds the bucketed fingerprint index), odd doc_ids the new
    crawl (epoch 2 anti-joins against it, bucket-aligned — history never
    shuffles). Deterministic, so the two-epoch composition has a real
    SQL oracle."""
    import hashlib as _hl
    import shutil as _sh

    rd = _rd()
    from cartography_ray.functions.dedup import incremental_exact_dedup

    path = f"{sf_dir}/documents.parquet"

    def half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id")
            return t.filter(pc.equal(pc.bit_wise_and(ids, pa.scalar(1, pa.int64())), parity))

        return fn

    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    state = f"/tmp/graft_incdedup/{_hl.md5(sf_dir.encode()).hexdigest()[:12]}"
    _sh.rmtree(state, ignore_errors=True)  # fresh per call (deterministic)
    incremental_exact_dedup(
        docs.map_batches(half(0), batch_format="pyarrow"), state, epoch=1
    ).materialize()
    return incremental_exact_dedup(
        docs.map_batches(half(1), batch_format="pyarrow"), state, epoch=2
    ).materialize()


SQL_DOCS_INCREMENTAL_DEDUP = r"""
WITH f AS (
  SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
  FROM documents
),
hist AS (SELECT DISTINCT fingerprint FROM f WHERE doc_id % 2 = 0),
new_min AS (
  SELECT MIN(doc_id) AS doc_id, fingerprint
  FROM f WHERE doc_id % 2 = 1 GROUP BY fingerprint
)
SELECT doc_id, fingerprint FROM new_min
WHERE fingerprint NOT IN (SELECT fingerprint FROM hist)
"""


def q_docs_incremental_minhash(sf_dir: str):
    """Cross-run NEAR-dup (functions/dedup.incremental_minhash_dedup):
    even doc_ids seed the persisted LSH band-bucket index (epoch 1); the
    new crawl (epoch 2) is the odd docs plus exact text copies of 20
    even docs under synthetic ids ≥ 10^6 — the copies must be dropped
    against history while the genuinely novel odd docs survive.
    Deterministic (splitmix hashing, no RNG) but approximate-by-design →
    rows-only, with the recall/idempotency semantics governed by
    tests/test_functions.py::test_incremental_minhash_dedup_epochs."""
    import hashlib as _hl
    import shutil as _sh

    rd = _rd()
    from cartography_ray.functions.dedup import incremental_minhash_dedup

    path = f"{sf_dir}/documents.parquet"

    def half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id")
            return t.filter(
                pc.equal(pc.bit_wise_and(ids, pa.scalar(1, pa.int64())), parity)
            )

        return fn

    def with_copies(t: pa.Table) -> pa.Table:
        odd = half(1)(t)
        evens = half(0)(t)
        cp = evens.filter(
            pc.less(evens.column("doc_id"), pa.scalar(40, pa.int64()))
        )
        cp = pa.table(
            {
                "doc_id": pc.add(cp.column("doc_id"), pa.scalar(1_000_000, pa.int64())),
                "text": cp.column("text"),
            }
        )
        return pa.concat_tables([odd.select(["doc_id", "text"]), cp])

    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    state = f"/tmp/graft_incminhash/{_hl.md5(sf_dir.encode()).hexdigest()[:12]}"
    _sh.rmtree(state, ignore_errors=True)  # fresh per call (deterministic)
    incremental_minhash_dedup(
        docs.map_batches(half(0), batch_format="pyarrow"), state, epoch=1,
        threshold=0.5,
    ).materialize()
    return incremental_minhash_dedup(
        docs.map_batches(with_copies, batch_format="pyarrow"), state, epoch=2,
        threshold=0.5,
    ).materialize()


def q_docs_exact_dedup(sf_dir: str):
    rd = _rd()
    from cartography_ray.functions.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(ds).select_columns(["doc_id"])


SQL_DOCS_EXACT_DEDUP = r"""
SELECT MIN(doc_id) AS doc_id
FROM (SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS fp FROM documents)
GROUP BY fp
"""


DUP_SEED_MAX = 8
DUP_SEED_OFFSET = 10_000_000


def q_docs_dup_edges(sf_dir: str):
    """(member)-[DUPLICATE_OF]->(keeper) edges from exact-duplicate
    clusters (the documents module's graph output; pipelines/docs.py).

    The bench corpus has no exact duplicates, which made this oracle
    check vacuous (ADVICE r02) — so the query corpus is the documents
    table UNION a deterministic re-id'd copy of its first
    ``DUP_SEED_MAX`` docs (same derivation in the SQL oracle), making
    keeper selection and edge direction actually comparable."""
    rd = _rd()
    from cartography_ray.pipelines.docs import duplicate_edges

    ctx = IngestContext.make(update_tag=QUERY_TAG)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def seed_copies(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.less(t.column("doc_id"), pa.scalar(DUP_SEED_MAX)))
        return pa.table(
            {
                "doc_id": pc.add(
                    pc.cast(sel.column("doc_id"), pa.int64()),
                    pa.scalar(DUP_SEED_OFFSET, pa.int64()),
                ),
                "text": sel.column("text"),
            }
        )

    corpus = ds.union(ds.map_batches(seed_copies, batch_format="pyarrow"))
    out = duplicate_edges(corpus, ctx)
    if out.count() == 0:
        # all-empty shuffle output loses its schema in Ray 2.49 — return
        # a typed empty so the driver's schema compare still matches
        return pa.table({"src_id": pa.array([], pa.string()), "dst_id": pa.array([], pa.string())})
    return out.select_columns(["src_id", "dst_id"])


SQL_DOCS_DUP_EDGES = rf"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_SEED_OFFSET} AS doc_id, text FROM documents
  WHERE doc_id < {DUP_SEED_MAX}
),
fp AS (
  SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS f FROM corpus
),
k AS (SELECT f, MIN(doc_id) AS keeper FROM fp GROUP BY f)
SELECT 'doc:' || fp.doc_id AS src_id, 'doc:' || k.keeper AS dst_id
FROM fp JOIN k ON fp.f = k.f
WHERE fp.doc_id <> k.keeper
"""


JACCARD_SUBSET_MAX = 40
JACCARD_THRESHOLD = 0.25


def q_docs_jaccard_pairs(sf_dir: str):
    """Exact n-gram Jaccard vs a broadcast subset (oracle-checkable)."""
    rd = _rd()
    from cartography_ray.functions.dedup import jaccard_pairs_smallside

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = jaccard_pairs_smallside(
        ds, subset_ids=list(range(JACCARD_SUBSET_MAX)), threshold=JACCARD_THRESHOLD
    )
    return out.select_columns(["id_a", "id_b"])


SQL_DOCS_JACCARD = f"""
WITH sh AS (
  -- lateral unnest bounded by the LOWERED text's length: the old
  -- JOIN range(1,100000) idiom capped docs at 100k chars and mis-indexed
  -- when lower() changes codepoint count (ADVICE r03)
  SELECT DISTINCT doc_id, substring(lt, CAST(i AS INTEGER), 5) AS g
  FROM (
    SELECT doc_id, lt, unnest(range(1, greatest(1, length(lt) - 3))) AS i
    FROM (SELECT doc_id, lower(text) AS lt FROM documents)
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  WHERE b.doc_id < {JACCARD_SUBSET_MAX}
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / greatest(1, sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
"""


def q_docs_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup candidates, Jaccard-verified (rows-only check;
    recall vs the exact baseline is asserted in tests)."""
    rd = _rd()
    from cartography_ray.functions.dedup import minhash_lsh_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # r=4 banding (64 hashes, 16 bands): candidate prob ≈0.64 at j=0.5 and
    # ≈0.03 at j=0.2 — the operating point matters: r=2 banding admits most
    # sub-threshold pairs of a same-domain corpus and the candidate set
    # goes quadratic (observed at 5k docs). Low thresholds want r=1 on a
    # pre-blocked corpus instead (see tests/test_functions.py).
    return minhash_lsh_pairs(
        ds, threshold=0.5, num_perm=64, bands=16
    ).select_columns(["id_a", "id_b"])


def q_docs_simhash_pairs(sf_dir: str):
    rd = _rd()
    from cartography_ray.functions.dedup import simhash_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=6).select_columns(["id_a", "id_b", "hamming"])


KNN_QUERY_MAX = 8
KNN_K = 5


def _knn_queries(sf_dir: str) -> dict[int, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    out = {}
    for vid, emb in zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()):
        if vid < KNN_QUERY_MAX:
            out[vid] = np.asarray(emb, dtype=np.float64)
    return out


def q_emb_knn(sf_dir: str):
    rd = _rd()
    from cartography_ray.functions.ann import knn_brute

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = knn_brute(ds, _knn_queries(sf_dir), k=KNN_K)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def q_docs_source_weights(sf_dir: str):
    """Temperature-scaled (α=0.7) source mixing weights over per-source
    character volume (functions/text.source_temperature_weights) — the
    data-mixing computation multi-source LM training runs before
    sampling. Integer-exact cross-engine: floor-scaled pow scores in
    int64, order-free bigint normalizer, ONE final IEEE division."""
    rd = _rd()
    from cartography_ray.functions.text import source_temperature_weights

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )
    return source_temperature_weights(ds, "source", "n_chars", alpha=0.7)


SQL_DOCS_SOURCE_WEIGHTS = """
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY 1
), tot AS (SELECT greatest(CAST(SUM(chars) AS BIGINT), 1) AS tc FROM s),
sc AS (
  SELECT source, n_docs, chars,
         CAST(floor(1000000 * pow(CAST(chars AS DOUBLE) / CAST(tc AS DOUBLE), 0.7)) AS BIGINT) AS score
  FROM s, tot
), ts AS (SELECT greatest(CAST(SUM(score) AS BIGINT), 1) AS tsc FROM sc)
SELECT source, n_docs, chars, score,
       round(CAST(score AS DOUBLE) / CAST(tsc AS DOUBLE), 6) AS weight6
FROM sc, ts
"""


def q_emb_mmr(sf_dir: str):
    """Maximal-Marginal-Relevance diverse top-k around the vec_id=0
    embedding (functions/ann.mmr_topk): distributed pool selection, then
    the k-step greedy argmax over the pool-bounded candidates. Iterative
    argmax has no tractable SQL twin — rows-only, with the textbook-MMR
    reference-equality test governing correctness (PageRank precedent)."""
    from cartography_ray.functions.ann import mmr_topk

    rd = _rd()
    qvec = _knn_queries(sf_dir)[0]
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return mmr_topk(ds, qvec, k=KNN_K, lam=0.7, pool=256)


SQL_EMB_KNN = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {KNN_QUERY_MAX}),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS sim6
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rank FROM s)
SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {KNN_K}
"""


def q_emb_knn_lsh(sf_dir: str):
    """Approximate ANN over a WRITE-ONCE partition-bucketed LSH index
    (rows-only; recall asserted in tests): the corpus is written
    partitioned by sign-pattern bucket and each query set reads only the
    matching partitions — scan volume < corpus (the scale path VERDICT
    r01 item 10 asked for). The index is built once per sf dir."""
    rd = _rd()
    import hashlib
    import json

    from cartography_ray.functions.ann import build_lsh_index, knn_lsh_indexed

    src = f"{sf_dir}/embeddings.parquet"
    st = os.stat(src)
    fp = hashlib.md5(f"{src}:{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:12]
    name = os.path.basename(os.path.normpath(sf_dir))
    index_dir = f"/tmp/graft_kg/lsh_index/{name}"
    meta_path = os.path.join(index_dir, "meta.json")
    fresh = False
    if os.path.exists(meta_path):
        try:
            fresh = json.load(open(meta_path)).get("input_fingerprint") == fp
        except (OSError, ValueError):
            fresh = False
    if not fresh:  # absent OR stale (corpus regenerated in place) → rebuild
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
        ds = rd.read_parquet(src, columns=["vec_id", "embedding"])
        build_lsh_index(ds, index_dir, planes=4, input_fingerprint=fp)
    out, _stats = knn_lsh_indexed(index_dir, _knn_queries(sf_dir), k=KNN_K, probe_hamming=1)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


CLEAN_MIN_TOKENS = 40
CLEAN_MIN_STOP = 2
CLEAN_JACCARD_TAU = 0.35
CLEAN_MAX_DF = 64


def q_docs_clean_corpus(sf_dir: str):
    """The composite training-data cleaning pipeline as ONE oracle-checked
    entry: quality filter → exact dedup → exact near-dup removal.

    Stages (each an existing operator): QualityFilter actor pool →
    exact_dedup keepers → semi hash_join back to (id, text) →
    jaccard_pairs_exact set-similarity join (df-capped inverted index) →
    anti hash_join dropping every doc with a higher-similarity twin of
    smaller id. Drop rule is "any ≥τ pair with a smaller id" (not greedy
    chains) — deterministic and SQL-expressible; both engines apply it
    identically.
    """
    rd = _rd()
    from cartography_ray.functions.dedup import exact_dedup, jaccard_pairs_exact
    from cartography_ray.functions.text import QualityFilter
    from cartography_ray.ops.joins import hash_join

    path = f"{sf_dir}/documents.parquet"
    parts = _parts_for(path)
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    # materialize: `quality` fans out to TWO consumers (exact_dedup and
    # the semi-join left side); Ray Data has no common-subexpression
    # reuse, so an unmaterialized actor-pool stage would execute twice —
    # pool setup included. Also lets exact_dedup measure the input for
    # its local-fold guard.
    quality = docs.map_batches(
        QualityFilter,
        fn_constructor_kwargs={"min_tokens": CLEAN_MIN_TOKENS, "min_stop": CLEAN_MIN_STOP},
        batch_format="pyarrow", concurrency=2,
    ).materialize()
    keepers = exact_dedup(quality, "doc_id", "text")

    def kid(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(t.column("doc_id"), pa.int64())})

    # same fan-out-2 rule as `quality`: survivors feeds the set-similarity
    # join AND the final anti-join (a no-op when the join's local-merge
    # path already returned a materialized block)
    survivors = hash_join(
        quality, keepers.map_batches(kid, batch_format="pyarrow"),
        left_on="doc_id", how="semi", num_partitions=parts,
    ).materialize()
    pairs = jaccard_pairs_exact(
        survivors, threshold=CLEAN_JACCARD_TAU, ngram=5, max_df=CLEAN_MAX_DF,
        num_partitions=parts,
    )

    def dropset(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("id_b")})

    clean = hash_join(
        survivors.select_columns(["doc_id"]),
        pairs.map_batches(dropset, batch_format="pyarrow"),
        left_on="doc_id", how="anti", num_partitions=parts,
    )
    return clean


SQL_DOCS_CLEAN_CORPUS = f"""
WITH q AS (
  SELECT doc_id, text FROM documents
  WHERE len(regexp_extract_all(text, '\\S+')) >= {CLEAN_MIN_TOKENS}
    AND len(regexp_extract_all(text, '\\b(the|and|of|to|a|is|in)\\b')) >= {CLEAN_MIN_STOP}
),
keepers AS (
  SELECT MIN(doc_id) AS doc_id
  FROM (SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS fp FROM q)
  GROUP BY fp
),
dd AS (SELECT q.doc_id, q.text FROM q JOIN keepers USING (doc_id)),
sh_all AS (
  -- lateral unnest over the LOWERED text (no 100k-char cap; ADVICE r03)
  SELECT DISTINCT doc_id, substring(lt, CAST(i AS INTEGER), 5) AS g
  FROM (
    SELECT doc_id, lt, unnest(range(1, greatest(1, length(lt) - 3))) AS i
    FROM (SELECT doc_id, lower(text) AS lt FROM dd)
  )
),
sh AS (
  SELECT * FROM sh_all
  WHERE g IN (SELECT g FROM sh_all GROUP BY g HAVING COUNT(*) <= {CLEAN_MAX_DF})
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
drops AS (
  SELECT DISTINCT id_b AS doc_id
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / greatest(1, sa.n + sb.n - c) >= {CLEAN_JACCARD_TAU}
)
SELECT doc_id FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM drops)
"""


def q_emb_knn_ivf(sf_dir: str):
    """Approximate ANN over a WRITE-ONCE IVF (k-means-partitioned) index
    (rows-only; recall asserted in tests): the corpus is written
    partitioned by nearest-centroid inverted list and each query reads
    only its nprobe closest lists — the second scale path next to the
    LSH index. Built once per sf dir, fingerprint-invalidated."""
    rd = _rd()
    import hashlib
    import json

    from cartography_ray.functions.ann import build_ivf_index, knn_ivf_indexed

    src = f"{sf_dir}/embeddings.parquet"
    st = os.stat(src)
    fp = hashlib.md5(f"{src}:{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:12]
    name = os.path.basename(os.path.normpath(sf_dir))
    index_dir = f"/tmp/graft_kg/ivf_index/{name}"
    meta_path = os.path.join(index_dir, "meta.json")
    fresh = False
    if os.path.exists(meta_path):
        try:
            fresh = json.load(open(meta_path)).get("input_fingerprint") == fp
        except (OSError, ValueError):
            fresh = False
    if not fresh:
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
        ds = rd.read_parquet(src, columns=["vec_id", "embedding"])
        build_ivf_index(ds, index_dir, n_centroids=16, iters=4, input_fingerprint=fp)
    out, _stats = knn_ivf_indexed(index_dir, _knn_queries(sf_dir), k=KNN_K, nprobe=4)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def q_emb_knn_pq(sf_dir: str):
    """Product-quantization ANN (functions/ann: train_pq_codebooks →
    pq_encode → knn_pq ADC scan): the vector-COMPRESSION scale path —
    m uint8 codes per vector (32× under float32×64dim) with asymmetric-
    distance lookup-table scans, next to the partition-pruning paths
    (LSH/IVF indexes). Rows-only (codeword snapping is approximate and
    k-means float sums are block-order-dependent); recall vs exact
    brute force asserted in tests."""
    rd = _rd()
    from cartography_ray.functions.ann import (
        knn_pq,
        pq_encode,
        train_pq_codebooks,
    )

    src = f"{sf_dir}/embeddings.parquet"
    # fan-out rule: sampling + 2 Lloyd passes + encode = 4 consumers of
    # the same input — materialize once instead of 4 parquet re-reads
    ds = rd.read_parquet(src, columns=["vec_id", "embedding"]).materialize()
    books = train_pq_codebooks(ds, m=8, k=64, iters=2)
    codes = pq_encode(ds, books).materialize()  # consumed per query
    qvec = _knn_queries(sf_dir)[0]
    return knn_pq(codes, books, qvec, k=KNN_K)


EMB_NEARDUP_TAU = 0.4
# semantic-dedup drop set: broadcast the non-root member ids below this
# count (same size-guarded contract as REVENUE_CUST_BROADCAST_LIMIT)
SEMANTIC_DROP_BROADCAST_LIMIT = 2_000_000


def q_emb_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs — EXACT, distributed.

    Completes the dedup family (exact / MinHash / SimHash / Jaccard /
    embedding-cosine) with an oracle-checkable member: a triangle
    block-pair join (see functions/ann.py:cosine_neardup_pairs) spreads
    the O(n²) cosine matrix over P(P+1)/2 independent GEMM tasks with
    O(n·P) replication — no corpus broadcast, no driver materialization.
    """
    rd = _rd()
    from cartography_ray.functions.ann import cosine_neardup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return cosine_neardup_pairs(ds, threshold=EMB_NEARDUP_TAU, num_blocks=8)


SQL_EMB_NEARDUP = f"""
WITH p AS (
  SELECT least(a.vec_id, b.vec_id) AS id_a, greatest(a.vec_id, b.vec_id) AS id_b,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim6
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, sim6 FROM p WHERE sim6 >= {EMB_NEARDUP_TAU}
"""


PCA_K = 8


def q_emb_pca(sf_dir: str):
    """Distributed PCA (functions/ann.pca_fit/pca_project): streaming
    per-batch moment partials → driver d×d eigh → broadcast basis →
    per-batch projection GEMM. Rows-only (eigendecomposition is not
    SQL-expressible); invariants are property-tested against numpy
    (tests/test_functions.py::test_pca_matches_numpy_reference)."""
    rd = _rd()
    from cartography_ray.functions.ann import pca_fit, pca_project

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mean, comps = pca_fit(ds, k=PCA_K)
    return pca_project(ds, mean, comps)


KMEANS_K = 16


def q_emb_clusters(sf_dir: str):
    """Distributed spherical k-means clustering exposed as a first-class
    operator (functions/ann.train_kmeans_ivf + kmeans_assign): train on
    streaming moment partials, then one broadcast-GEMM labeling pass per
    batch. Rows-only (Lloyd float folds are not bit-deterministic across
    block orders — same contract as emb_knn_ivf); invariants
    (row preservation, argmax self-consistency, k bound) are
    property-tested in tests/test_functions.py."""
    rd = _rd()
    from cartography_ray.functions.ann import kmeans_assign, train_kmeans_ivf

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cent = train_kmeans_ivf(ds, n_centroids=KMEANS_K, iters=4)
    return kmeans_assign(ds, cent)


def q_emb_semantic_dedup(sf_dir: str, drop_broadcast_limit: int | None = None):
    """Semantic dedup: one keeper (min vec_id) per near-duplicate
    CLUSTER — transitive closure over the cosine near-dup pairs via the
    engine's own distributed connected_components, then an anti-join
    drops every non-root member. Composes three existing distributed
    pieces (triangle GEMM pair join → union-find CC → anti-join); the
    drop side auto-switches (broadcast key-set filter ≤
    ``SEMANTIC_DROP_BROADCAST_LIMIT``, distributed hash anti-join on a
    mostly-duplicate corpus) so nothing UNBOUNDED lands on the driver."""
    rd = _rd()
    from cartography_ray.functions.ann import cosine_neardup_pairs
    from cartography_ray.ops.joins import hash_join
    from cartography_ray.stages.canonicalize import connected_components

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pairs = cosine_neardup_pairs(ds, threshold=EMB_NEARDUP_TAU, num_blocks=8)

    def pad(col):
        # zero-pad so lexicographic MIN == numeric MIN (CC labels are
        # strings; the oracle's MIN is over integers)
        return pc.utf8_lpad(pc.cast(col, pa.string()), 12, "0")

    edges = pairs.map_batches(
        lambda t: pa.table({"a": pad(t.column("id_a")), "b": pad(t.column("id_b"))}),
        batch_format="pyarrow",
    )
    labels = connected_components(edges)
    dropped = labels.map_batches(
        lambda t: pa.table(
            {"vec_id": pc.cast(t.column("node"), pa.int64())}
        ).filter(pc.not_equal(t.column("node"), t.column("label"))),
        batch_format="pyarrow",
    )
    ids = ds.map_batches(
        lambda t: t.select(["vec_id"]), batch_format="pyarrow"
    )
    # the drop set is component-member-sized; while it fits the broadcast
    # limit a ray.put key-set filter beats the anti join's double shuffle
    # (the resolve_keys / revenue_by_nation size-guard pattern). Above
    # the limit — a mostly-duplicate corpus — fall back to the
    # distributed anti hash_join.
    from cartography_ray.ops.joins import broadcast_semi_anti

    limit = (
        SEMANTIC_DROP_BROADCAST_LIMIT
        if drop_broadcast_limit is None
        else drop_broadcast_limit
    )
    dropped = dropped.materialize()
    if dropped.count() <= limit:
        keys = dropped.to_pandas()["vec_id"].astype(str).tolist()
        return broadcast_semi_anti(ids, keys, on="vec_id", anti=True)
    return hash_join(
        ids, dropped, left_on="vec_id", how="anti",
        left_schema=pa.schema([("vec_id", pa.int64())]),
        right_schema=pa.schema([("vec_id", pa.int64())]),
    )


SQL_EMB_SEMANTIC_DEDUP = f"""
WITH RECURSIVE p AS (
  SELECT least(a.vec_id, b.vec_id) AS id_a, greatest(a.vec_id, b.vec_id) AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), 6) >= {EMB_NEARDUP_TAU}
),
es AS (
  -- SELECT DISTINCT over UNION ALL: a top-level UNION body is misparsed
  -- as recursive under WITH RECURSIVE (see sql_kg_pagerank note)
  SELECT DISTINCT a, b FROM (
    SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p
  )
),
nodes AS (SELECT DISTINCT a AS node FROM es),
r(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.a, r.lab FROM es e JOIN r ON e.b = r.node
),
reach AS (SELECT node, MIN(lab) AS root FROM r GROUP BY node)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT node FROM reach WHERE node <> root)
"""


MATERIAL_WORDS = ("ring", "widget", "bolt", "gear", "gizmo")


def q_fuzzy_match_parts(sf_dir: str):
    """Fuzzy-contains matcher (attach_rels): part name CONTAINS word.

    The matchlink-style fuzzy mode (reference querybuilder.py:731-739):
    target key contains the item value, case-folded; target table
    broadcast-small as the reference's docs require.
    """
    rd = _rd()
    import pyarrow.parquet as pq

    from cartography_ray.core.compile import attach_rels, project_rel_candidates
    from cartography_ray.spec import PropertyRef, RelSpec, TargetNodeMatcher

    ctx = IngestContext.make(update_tag=QUERY_TAG)
    rel = RelSpec(
        rel_label="NAMES",
        target_node_label="Part",
        target_node_matcher=TargetNodeMatcher.make(
            pname=PropertyRef("word", fuzzy_and_ignore_case=True)
        ),
    )
    parts = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    targets = pa.table(
        {
            "id": pc.cast(parts.column("p_partkey"), pa.string()),
            "pname": parts.column("p_name"),
        }
    )
    import ray.data

    items = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(list(MATERIAL_WORDS), pa.string()),
                "word": pa.array(list(MATERIAL_WORDS), pa.string()),
            }
        )
    )
    cand = items.map_batches(
        project_rel_candidates(rel, ctx, PropertyRef("src")), batch_format="pyarrow"
    )
    out = attach_rels(cand, targets, rel, ctx)
    return out.select_columns(["src_id", "dst_id"])


SQL_FUZZY_PARTS = f"""
SELECT t.w AS src_id, CAST(p_partkey AS VARCHAR) AS dst_id
FROM part, (SELECT unnest({list(MATERIAL_WORDS)}) AS w) t
WHERE contains(lower(p_name), t.w)
"""


def q_one_to_many_part_words(sf_dir: str):
    """one_to_many matcher: item carries a LIST; target key IN list
    (reference querybuilder.py:723-729 'a.key IN item.list')."""
    rd = _rd()
    import ray.data

    from cartography_ray.core.compile import attach_rels, project_rel_candidates
    from cartography_ray.spec import PropertyRef, RelSpec, TargetNodeMatcher

    ctx = IngestContext.make(update_tag=QUERY_TAG)
    rel = RelSpec(
        rel_label="HAS_WORD",
        target_node_label="Word",
        target_node_matcher=TargetNodeMatcher.make(
            wkey=PropertyRef("words", one_to_many=True)
        ),
    )
    targets = pa.table(
        {
            "id": pa.array([f"word:{w}" for w in MATERIAL_WORDS], pa.string()),
            "wkey": pa.array(list(MATERIAL_WORDS), pa.string()),
        }
    )
    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t.column("p_partkey"), pa.string()),
                "words": pc.split_pattern(pc.cast(t.column("p_name"), pa.string()), " "),
            }
        )

    cand = ds.map_batches(prep, batch_format="pyarrow").map_batches(
        project_rel_candidates(rel, ctx, PropertyRef("src")), batch_format="pyarrow"
    )
    return attach_rels(cand, targets, rel, ctx).select_columns(["src_id", "dst_id"])


SQL_ONE_TO_MANY_WORDS = f"""
SELECT CAST(p_partkey AS VARCHAR) AS src_id, 'word:' || w AS dst_id
FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS w FROM part)
WHERE w IN {tuple(MATERIAL_WORDS)}
"""


def q_events_props_k(sf_dir: str):
    """Semi-structured payload parsing (the reference's JSON report reads,
    trivy/__init__.py:239-247) — extract props.k vectorized."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])

    def fn(t: pa.Table) -> pa.Table:
        k = pc.extract_regex(pc.cast(t.column("props"), pa.string()), r'"k": (?P<k>[0-9]+)')
        kv = pc.struct_field(k, "k")
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "k_value": pc.cast(kv, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_EVENTS_PROPS = r"""
SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_value
FROM events
"""


# --------------------------------------------------------------------------
# Spec-driven load (the MERGE/store path) over a relational table
# --------------------------------------------------------------------------


def q_load_customers(sf_dir: str):
    """Customer rows through a NodeSpec projection (the load() analogue)."""
    rd = _rd()
    from cartography_ray.core.compile import project_nodes
    from cartography_ray.spec import ExtraNodeLabel, NodeSpec, PropertyRef

    spec = NodeSpec.make(
        "Customer",
        {
            "id": PropertyRef("c_custkey"),
            "name": PropertyRef("c_name"),
            "mktsegment": PropertyRef("c_mktsegment"),
            "acctbal_cents": PropertyRef("acctbal_cents"),
        },
        scoped_cleanup=False,
        extra_node_labels=(ExtraNodeLabel("Debtor").when(negative_bal=True),),
    )
    ctx = IngestContext.make(update_tag=QUERY_TAG)
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment", "c_acctbal"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.append_column("acctbal_cents", _cents(t.column("c_acctbal")))
        return t.append_column("negative_bal", pc.less(t.column("c_acctbal"), pa.scalar(0.0)))

    return ds.map_batches(prep, batch_format="pyarrow").map_batches(
        project_nodes(spec, ctx), batch_format="pyarrow"
    ).select_columns(["id", "name", "mktsegment", "acctbal_cents", "lastupdated", "_labels"])


SQL_LOAD_CUSTOMERS = f"""
SELECT CAST(c_custkey AS VARCHAR) AS id,
       c_name AS name,
       c_mktsegment AS mktsegment,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       CAST({QUERY_TAG} AS BIGINT) AS lastupdated,
       CASE WHEN c_acctbal < 0 THEN 'Customer;Debtor' ELSE 'Customer' END AS _labels
FROM customer
"""


# --------------------------------------------------------------------------
# Ontology projection + consolidation (reference querybuilder.py:24-415,
# intel/ontology/utils.py:44-153)
# --------------------------------------------------------------------------


def q_ont_project_customers(sf_dir: str):
    """All 8 ontology special handlers compiled to pyarrow.compute over
    the customer table (reference querybuilder.py:24-318 semantics)."""
    rd = _rd()
    from cartography_ray.stages.ontology import (
        OntFieldMapping,
        OntNodeMapping,
        project_ontology_fields,
    )

    mapping = OntNodeMapping(
        node_label="Customer",
        fields=(
            OntFieldMapping("name", "c_name"),  # plain copy
            OntFieldMapping(
                "segment", "c_mktsegment", handler="mapping",
                extra={"map": {"BUILDING": "b2b", "MACHINERY": "b2b",
                               "AUTOMOBILE": "consumer", "HOUSEHOLD": "consumer"}},
            ),
            OntFieldMapping("source", "", handler="static_value", extra={"value": "tpch"}),
            OntFieldMapping(
                "priority", "c_mktsegment", handler="equal_boolean",
                extra={"values": ["BUILDING", "MACHINERY"]},
            ),
            OntFieldMapping("active", "c_acctbal", handler="to_boolean"),
            OntFieldMapping("contact", "name_gappy", handler="coalesce", extra={"fields": ["c_mktsegment"]}),
            OntFieldMapping("not_auto", "is_auto", handler="invert_boolean"),
            OntFieldMapping("flagged", "is_auto", handler="or_boolean", extra={"fields": ["neg_bal"]}),
            OntFieldMapping("clean", "is_auto", handler="nor_boolean", extra={"fields": ["neg_bal"]}),
        ),
    )
    project = project_ontology_fields(mapping)
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment", "c_acctbal"],
    )

    def fn(t: pa.Table) -> pa.Table:
        t = t.append_column("is_auto", pc.equal(t.column("c_mktsegment"), pa.scalar("AUTOMOBILE")))
        t = t.append_column("neg_bal", pc.less(t.column("c_acctbal"), pa.scalar(0.0)))
        t = t.append_column(
            "name_gappy",
            pc.if_else(
                pc.less(t.column("c_acctbal"), pa.scalar(0.0)),
                pa.scalar(None, pa.string()),
                pc.cast(t.column("c_name"), pa.string()),
            ),
        )
        out = project(t)
        return pa.table(
            {
                "id": pc.cast(out.column("c_custkey"), pa.string()),
                **{
                    c: out.column(c)
                    for c in out.column_names
                    if c.startswith("_ont_")
                },
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_ONT_PROJECT = """
SELECT CAST(c_custkey AS VARCHAR) AS id,
       c_name AS _ont_name,
       CASE c_mktsegment WHEN 'BUILDING' THEN 'b2b' WHEN 'MACHINERY' THEN 'b2b'
                         WHEN 'AUTOMOBILE' THEN 'consumer' WHEN 'HOUSEHOLD' THEN 'consumer'
                         END AS _ont_segment,
       'tpch' AS _ont_source,
       c_mktsegment IN ('BUILDING', 'MACHINERY') AS _ont_priority,
       (c_acctbal <> 0) AS _ont_active,
       coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_name END, c_mktsegment) AS _ont_contact,
       NOT coalesce(c_mktsegment = 'AUTOMOBILE', false) AS _ont_not_auto,
       (coalesce(c_mktsegment = 'AUTOMOBILE', false) OR coalesce(c_acctbal < 0, false)) AS _ont_flagged,
       (NOT coalesce(c_mktsegment = 'AUTOMOBILE', false) AND NOT coalesce(c_acctbal < 0, false)) AS _ont_clean
FROM customer
"""


def q_ont_users_merged(sf_dir: str):
    """Cross-source consolidation merge (reference
    intel/ontology/utils.py:60-81): customer + supplier rows keyed by the
    shared numeric id; per field, the FIRST source's non-null value wins
    (customer has priority; suppliers fill phone gaps)."""
    rd = _rd()
    from cartography_ray.stages.ontology import (
        OntFieldMapping,
        OntNodeMapping,
        consolidate_sources,
        extract_ont_rows,
    )

    cust_map = OntNodeMapping(
        node_label="Customer",
        fields=(
            OntFieldMapping("id", "id_str", required=True),
            OntFieldMapping("name", "name_gappy"),
            OntFieldMapping("region", "region_str"),
            OntFieldMapping("segment", "c_mktsegment"),
        ),
    )
    supp_map = OntNodeMapping(
        node_label="Supplier",
        fields=(
            OntFieldMapping("id", "id_str", required=True),
            OntFieldMapping("name", "s_name"),
            OntFieldMapping("region", "region_str"),
            OntFieldMapping("segment", "seg_null"),
        ),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"],
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )

    def prep_cust(t: pa.Table) -> pa.Table:
        t = t.append_column("id_str", pc.cast(t.column("c_custkey"), pa.string()))
        t = t.append_column("region_str", pc.cast(t.column("c_nationkey"), pa.string()))
        # negative-balance customers have no name on file (creates the
        # gaps the supplier source fills)
        return t.append_column(
            "name_gappy",
            pc.if_else(
                pc.less(t.column("c_acctbal"), pa.scalar(0.0)),
                pa.scalar(None, pa.string()),
                pc.cast(t.column("c_name"), pa.string()),
            ),
        )

    def prep_supp(t: pa.Table) -> pa.Table:
        t = t.append_column("id_str", pc.cast(t.column("s_suppkey"), pa.string()))
        t = t.append_column("region_str", pc.cast(t.column("s_nationkey"), pa.string()))
        return t.append_column("seg_null", pc.cast(pa.nulls(t.num_rows), pa.string()))

    a = cust.map_batches(prep_cust, batch_format="pyarrow").map_batches(
        extract_ont_rows(cust_map), batch_format="pyarrow"
    )
    b = supp.map_batches(prep_supp, batch_format="pyarrow").map_batches(
        extract_ont_rows(supp_map), batch_format="pyarrow"
    )
    return consolidate_sources([a, b], "id")


SQL_ONT_MERGED = """
WITH a AS (
  SELECT CAST(c_custkey AS VARCHAR) AS id,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_name END AS name,
         CAST(c_nationkey AS VARCHAR) AS region,
         c_mktsegment AS segment
  FROM customer
),
b AS (
  SELECT CAST(s_suppkey AS VARCHAR) AS id, s_name AS name,
         CAST(s_nationkey AS VARCHAR) AS region,
         CAST(NULL AS VARCHAR) AS segment
  FROM supplier
)
SELECT coalesce(a.id, b.id) AS id,
       coalesce(a.name, b.name) AS name,
       coalesce(a.region, b.region) AS region,
       coalesce(a.segment, b.segment) AS segment
FROM a FULL OUTER JOIN b ON a.id = b.id
"""


# --------------------------------------------------------------------------
# Knowledge-graph pipeline family (north rule) over synthetic transcripts
# --------------------------------------------------------------------------


def _kg_work_dir(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/graft_kg/qwork/{name}"


def _kg_mentions_ds(sf_dir: str):
    """Shared sorted+detected mention checkpoint for the KG queries."""
    rd = _rd()
    from cartography_ray.pipelines.kg import _checkpoint, _prepare_turns
    from cartography_ray.stages.extract import MentionDetector

    ensure_transcripts(sf_dir)
    work = _kg_work_dir(sf_dir)
    sorted_path = os.path.join(work, "sorted")
    if not os.path.exists(os.path.join(sorted_path, "_SUCCESS")):
        ds = rd.read_parquet(transcripts_path(sf_dir))
        _checkpoint(
            ds.sort(["conv_id", "turn_idx"]).map_batches(_prepare_turns, batch_format="pyarrow"),
            sorted_path,
        )
    mention_path = os.path.join(work, "mentions")
    if not os.path.exists(os.path.join(mention_path, "_SUCCESS")):
        turns = rd.read_parquet(sorted_path)
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        _checkpoint(
            turns.map_batches(
                MentionDetector, batch_format="pyarrow", batch_size=4096,
                concurrency=max(2, ncpu - 2),
            ),
            mention_path,
        )
    return rd.read_parquet(sorted_path), rd.read_parquet(mention_path)


def _kg_labels(sf_dir: str, mentions):
    from cartography_ray.runtime import known_input_bytes, shuffle_partitions
    from cartography_ray.stages.canonicalize import connected_components
    from cartography_ray.stages.link import alias_edges_batch

    alias_edges = mentions.map_batches(alias_edges_batch, batch_format="pyarrow")
    # alias edges are a subset of the (file-backed, checkpointed) mention
    # table — size the CC exchanges from its footprint instead of a
    # constant so the partition count grows with the corpus (8 at bench
    # scale; the distinct-aliased-key domain grows ∝ SF)
    parts = shuffle_partitions(n_bytes=known_input_bytes(mentions)) or 16
    return connected_components(alias_edges, num_partitions=parts)


def q_kg_turns(sf_dir: str):
    """Per-turn lineage table (the text-equality invariant surface)."""
    turns, _ = _kg_mentions_ds(sf_dir)
    return turns.select_columns(["conv_id", "turn_idx", "role", "text"])


def sql_kg_turns(path: str) -> str:
    return f"SELECT conv_id, turn_idx, role, text FROM read_parquet('{path}')"


def q_kg_pii_redacted(sf_dir: str):
    """PII scrubbing over the transcript turns (functions/text.
    redact_pii): URL/email/@handle/IPv4 spans replaced with typed
    tokens + per-family counts — Arrow RE2 kernels, shuffle-free."""
    rd = _rd()
    from cartography_ray.functions.text import redact_pii

    path = ensure_transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
    return redact_pii(ds, id_cols=["conv_id", "turn_idx"])


def sql_kg_pii_redacted(path: str) -> str:
    from cartography_ray.functions.text import PII_PATTERNS

    (_, p_url, t_url), (_, p_email, t_email), (_, p_handle, t_handle), (
        _,
        p_ipv4,
        t_ipv4,
    ) = PII_PATTERNS
    return f"""
WITH s0 AS (SELECT conv_id, turn_idx, text AS t0 FROM read_parquet('{path}')),
s1 AS (SELECT conv_id, turn_idx,
              CAST(len(regexp_extract_all(t0, '{p_url}')) AS BIGINT) AS n_url,
              regexp_replace(t0, '{p_url}', '{t_url}', 'g') AS t1 FROM s0),
s2 AS (SELECT *, CAST(len(regexp_extract_all(t1, '{p_email}')) AS BIGINT) AS n_email,
              regexp_replace(t1, '{p_email}', '{t_email}', 'g') AS t2 FROM s1),
s3 AS (SELECT *, CAST(len(regexp_extract_all(t2, '{p_handle}')) AS BIGINT) AS n_handle,
              regexp_replace(t2, '{p_handle}', '{t_handle}', 'g') AS t3 FROM s2),
s4 AS (SELECT *, CAST(len(regexp_extract_all(t3, '{p_ipv4}')) AS BIGINT) AS n_ipv4,
              regexp_replace(t3, '{p_ipv4}', '{t_ipv4}', 'g') AS t4 FROM s3)
SELECT conv_id, turn_idx, t4 AS text, n_url, n_email, n_handle, n_ipv4 FROM s4
"""


def q_kg_domains(sf_dir: str):
    """Top source domains by URL mention count over the transcript turns
    (functions/text.domain_frequency) — the web-curation blocklist /
    per-domain mixing sweep; combiner → one domain-keyed shuffle."""
    rd = _rd()
    from cartography_ray.functions.text import domain_frequency

    path = ensure_transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["text"])
    return domain_frequency(ds, top_n=50, num_partitions=_parts_for(path))


def sql_kg_domains(path: str) -> str:
    from cartography_ray.functions.text import URL_DOMAIN_RE

    return f"""
WITH urls AS (
  SELECT lower(unnest(regexp_extract_all(text, '{URL_DOMAIN_RE}', 1))) AS domain
  FROM read_parquet('{path}')
)
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n
FROM urls GROUP BY 1 ORDER BY n DESC, domain ASC LIMIT 50
"""


def q_kg_mentions(sf_dir: str):
    _, mentions = _kg_mentions_ds(sf_dir)
    keep = mentions.filter(expr="kind != 'alias'")
    return keep.select_columns(["conv_id", "turn_idx", "kind", "form"])


def sql_kg_mentions(path: str) -> str:
    return f"""
WITH t AS (SELECT * FROM read_parquet('{path}'))
SELECT conv_id, turn_idx, 'handle' AS kind,
       unnest(regexp_extract_all(text, '(^|\\s)(@[a-z][a-z0-9_]*)', 2)) AS form FROM t
UNION ALL
SELECT conv_id, turn_idx, 'email',
       unnest(regexp_extract_all(text, '(^|\\s)([a-z0-9_.]+@[a-z0-9.-]+\\.[a-z]{{2,}})', 2)) FROM t
UNION ALL
SELECT conv_id, turn_idx, 'name',
       unnest(regexp_extract_all(text, '(^|\\s)([A-Z][a-z]+[0-9]+)', 2)) FROM t
UNION ALL
SELECT conv_id, turn_idx, 'ticket',
       unnest(regexp_extract_all(text, '\\b([A-Z]{{2,5}}-[0-9]+)\\b', 1)) FROM t
UNION ALL
SELECT conv_id, turn_idx, 'url',
       unnest(regexp_extract_all(text, '(https://[^\\s]+)', 1)) FROM t
"""


_KG_RESOLVED_SQL = """
WITH RECURSIVE t AS (SELECT * FROM read_parquet('{path}')),
m AS (
  SELECT conv_id, turn_idx, 'handle' AS kind,
         unnest(regexp_extract_all(text, '(^|\\s)(@[a-z][a-z0-9_]*)', 2)) AS form FROM t
  UNION ALL
  SELECT conv_id, turn_idx, 'email',
         unnest(regexp_extract_all(text, '(^|\\s)([a-z0-9_.]+@[a-z0-9.-]+\\.[a-z]{{2,}})', 2)) FROM t
  UNION ALL
  SELECT conv_id, turn_idx, 'name',
         unnest(regexp_extract_all(text, '(^|\\s)([A-Z][a-z]+[0-9]+)', 2)) FROM t
  UNION ALL
  SELECT conv_id, turn_idx, 'ticket',
         unnest(regexp_extract_all(text, '\\b([A-Z]{{2,5}}-[0-9]+)\\b', 1)) FROM t
  UNION ALL
  SELECT conv_id, turn_idx, 'url',
         unnest(regexp_extract_all(text, '(https://[^\\s]+)', 1)) FROM t
),
keyed AS (
  SELECT conv_id, turn_idx, kind, form,
         CASE kind
           WHEN 'handle' THEN 'user:' || substring(form, 2)
           WHEN 'email'  THEN 'user:' || split_part(form, '@', 1)
           WHEN 'name'   THEN 'name:' || lower(form)
           WHEN 'ticket' THEN 'ticket:' || form
           ELSE 'url:' || form END AS entity_key,
         CASE kind WHEN 'ticket' THEN 'REFERENCES_TICKET'
                   WHEN 'url' THEN 'LINKS_TO'
                   ELSE 'MENTIONS' END AS pred
  FROM m
),
ae AS (
  SELECT 'name:' || lower(regexp_extract(text, '(^|\\s)([A-Z][a-z]+[0-9]+) \\(aka (@[a-z][a-z0-9_]*)\\)', 2)) AS a,
         'user:' || substring(regexp_extract(text, '(^|\\s)([A-Z][a-z]+[0-9]+) \\(aka (@[a-z][a-z0-9_]*)\\)', 3), 2) AS b
  FROM t WHERE regexp_matches(text, '(^|\\s)([A-Z][a-z]+[0-9]+) \\(aka (@[a-z][a-z0-9_]*)\\)')
  UNION ALL
  SELECT 'user:' || substring(regexp_extract(text, '(^|\\s)(@[a-z][a-z0-9_]*) \\(aka (@[a-z][a-z0-9_]*)\\)', 2), 2),
         'user:' || substring(regexp_extract(text, '(^|\\s)(@[a-z][a-z0-9_]*) \\(aka (@[a-z][a-z0-9_]*)\\)', 3), 2)
  FROM t WHERE regexp_matches(text, '(^|\\s)(@[a-z][a-z0-9_]*) \\(aka (@[a-z][a-z0-9_]*)\\)')
),
es AS (SELECT a, b FROM ae UNION SELECT b AS a, a AS b FROM ae),
nodes AS (SELECT DISTINCT a AS node FROM es),
r(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.a, r.lab FROM es e JOIN r ON e.b = r.node
),
reach AS (SELECT node, MIN(lab) AS root FROM r GROUP BY node),
resolved AS (
  SELECT k.conv_id, k.turn_idx, k.kind, k.form, k.pred,
         coalesce(rc.root, k.entity_key) AS entity_id
  FROM keyed k LEFT JOIN reach rc ON k.entity_key = rc.node
)
"""


def q_kg_entities(sf_dir: str):
    """Canonical entities after linking + union-find, with mention counts."""
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.stages.canonicalize import resolve_keys
    from cartography_ray.stages.link import LinkScorer

    _, mentions = _kg_mentions_ds(sf_dir)
    labels = _kg_labels(sf_dir, mentions)
    linked = mentions.map_batches(LinkScorer(), batch_format="pyarrow")
    resolved = resolve_keys(linked, labels, key_col="entity_key", out_col="entity_id")

    def prep(t: pa.Table) -> pa.Table:
        kind = pc.list_element(pc.split_pattern(t.column("entity_id"), ":"), 0)
        return pa.table({"entity_id": t.column("entity_id"), "kind": kind})

    return partial_groupby_agg(
        resolved.map_batches(prep, batch_format="pyarrow"),
        ["entity_id", "kind"],
        {"n_mentions": (None, "count")},
    )


def sql_kg_entities(path: str) -> str:
    return _KG_RESOLVED_SQL.format(path=path) + """
SELECT entity_id, split_part(entity_id, ':', 1) AS kind, COUNT(*) AS n_mentions
FROM resolved GROUP BY 1, 2
"""


def q_kg_alias_components(sf_dir: str):
    _, mentions = _kg_mentions_ds(sf_dir)
    labels = _kg_labels(sf_dir, mentions)
    return labels.map_batches(
        lambda t: pa.table({"member": t.column("node"), "root": t.column("label")}),
        batch_format="pyarrow",
    )


def sql_kg_alias_components(path: str) -> str:
    return _KG_RESOLVED_SQL.format(path=path) + """
SELECT node AS member, root FROM reach
"""


def q_kg_triples(sf_dir: str):
    """The flagship output: distinct (subj, pred, obj) triples."""
    from cartography_ray.core.context import IngestContext
    from cartography_ray.pipelines.kg import build_graph
    from cartography_ray.runtime import drop_empty_blocks
    from cartography_ray.sources.transcripts import read_transcripts

    rd = _rd()
    ctx = IngestContext.make(update_tag=QUERY_TAG)
    g = build_graph(
        read_transcripts(sf_dir),
        ctx,
        work_dir=_kg_work_dir(sf_dir),
    )
    uni = g["edges_union"].select_columns(["src_id", "rel_label", "dst_id"])

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"subj": t.column("src_id"), "pred": t.column("rel_label"), "obj": t.column("dst_id")}
        )

    def local_dedup(b: pd.DataFrame) -> pd.DataFrame:
        # per-batch combiner + bucket key: a per-triple groupby would pay
        # per-group pandas overhead at 60k+ keys; 64 hash buckets with a
        # vectorized drop_duplicates inside do the same distinct
        out = b.drop_duplicates()
        h = pd.util.hash_pandas_object(out[["subj", "pred", "obj"]], index=False)
        return out.assign(__tb=(h.to_numpy() % 64).astype("int64"))

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["subj", "pred", "obj"])[["subj", "pred", "obj"]]

    renamed = uni.map_batches(rename, batch_format="pyarrow").map_batches(
        local_dedup, batch_format="pandas"
    )
    return drop_empty_blocks(
        drop_empty_blocks(renamed).groupby("__tb").map_groups(
            bucket_distinct, batch_format="pandas"
        )
    )


def sql_kg_triples(path: str) -> str:
    return _KG_RESOLVED_SQL.format(path=path) + """
SELECT DISTINCT 'turn:' || conv_id || ':' || turn_idx AS subj, pred, entity_id AS obj FROM resolved
UNION
SELECT DISTINCT 'turn:' || conv_id || ':' || turn_idx, 'USES_TOOL', 'tool:' || tool
FROM t WHERE role = 'tool' AND tool IS NOT NULL
UNION
SELECT 'turn:' || conv_id || ':' || (turn_idx - 1), 'NEXT_TURN', 'turn:' || conv_id || ':' || turn_idx
FROM t WHERE turn_idx > 0
UNION
SELECT 'turn:' || conv_id || ':' || turn_idx, 'IN_CONV', 'conv:' || conv_id FROM t
UNION
SELECT node, 'ALIAS_OF', root FROM reach WHERE node <> root
"""


def q_kg_conversations(sf_dir: str):
    from cartography_ray.ops.agg import partial_groupby_agg

    turns, _ = _kg_mentions_ds(sf_dir)
    out = partial_groupby_agg(
        turns.select_columns(["conv_id"]), "conv_id", {"n_turns": (None, "count")}
    )

    def add_uid(t: pa.Table) -> pa.Table:
        uid = pc.binary_join_element_wise(
            pa.array(["conv"] * t.num_rows, pa.string()), pc.cast(t.column("conv_id"), pa.string()), ":"
        )
        return pa.table({"id": uid, "n_turns": pc.cast(t.column("n_turns"), pa.int64())})

    from cartography_ray.runtime import drop_empty_blocks

    return drop_empty_blocks(out).map_batches(add_uid, batch_format="pyarrow")


def sql_kg_conversations(path: str) -> str:
    return (
        f"SELECT 'conv:' || conv_id AS id, COUNT(*) AS n_turns "
        f"FROM read_parquet('{path}') GROUP BY 1"
    )


def q_kg_co_mentions(sf_dir: str):
    """2-hop graph-derived pair join (reference pattern
    intel/aws/ec2/instances.py:517-552 — the instance→profile→role
    ASSUMES chain): entities co-mentioned in the same turn. All
    (turn, entity) rows co-locate with ONE turn-bucket shuffle
    (``groupby(__kb).map_groups``); dedup and ordered-pair formation are
    bucket-local (a vectorized self-merge on ``turn_uid``), so the old
    plan's distinct exchange + double-shuffled self ``hash_join``
    collapse into a single exchange ahead of the pair-count aggregate.
    Pair volume per turn is quadratic in that turn's DISTINCT entity
    count, which mention detection bounds — no hot-bucket risk.

    The counted pair table is checkpointed next to the sorted/mentions
    checkpoints (same ``_SUCCESS`` discipline): three catalogue queries
    consume it (co_mentions, pagerank, triangles), so each session pays
    the resolve+pair pipeline once."""
    rd = _rd()
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.pipelines.kg import _checkpoint
    from cartography_ray.runtime import drop_empty_blocks
    from cartography_ray.stages.canonicalize import resolve_keys
    from cartography_ray.stages.link import LinkScorer

    pairs_path = os.path.join(_kg_work_dir(sf_dir), "co_pairs")
    if os.path.exists(os.path.join(pairs_path, "_SUCCESS")):
        return rd.read_parquet(pairs_path)

    _, mentions = _kg_mentions_ds(sf_dir)
    labels = _kg_labels(sf_dir, mentions)
    linked = mentions.map_batches(LinkScorer(), batch_format="pyarrow")
    resolved = resolve_keys(linked, labels, key_col="entity_key", out_col="entity_id")

    # distinct (turn, entity) — bucket-hashed groupby distinct
    def local_distinct(t: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        pdf = pa.table(
            {"turn_uid": t.column("turn_uid"), "entity_id": t.column("entity_id")}
        ).to_pandas().drop_duplicates()
        h = pd.util.hash_array(pdf["turn_uid"].to_numpy(), categorize=False)
        pdf["__kb"] = (h % 64).astype("int64")
        return pa.Table.from_pandas(pdf, preserve_index=False).replace_schema_metadata(None)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ents = g.drop_duplicates(["turn_uid", "entity_id"])[["turn_uid", "entity_id"]]
        m = ents.merge(ents, on="turn_uid")
        m = m[m["entity_id_x"] < m["entity_id_y"]]
        return pd.DataFrame(
            {"entity_a": m["entity_id_x"], "entity_b": m["entity_id_y"]}
        )

    pairs = drop_empty_blocks(
        drop_empty_blocks(resolved.map_batches(local_distinct, batch_format="pyarrow"))
        .groupby("__kb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    counted = partial_groupby_agg(
        pairs, ["entity_a", "entity_b"], {"n_turns": (None, "count")}
    )
    _checkpoint(counted, pairs_path)
    return rd.read_parquet(pairs_path)


_KG_CO_CTE = """
, dm AS (
  SELECT DISTINCT 'turn:' || conv_id || ':' || turn_idx AS turn_uid, entity_id
  FROM resolved
),
co AS (
  SELECT a.entity_id AS entity_a, b.entity_id AS entity_b, COUNT(*) AS n_turns
  FROM dm a JOIN dm b ON a.turn_uid = b.turn_uid AND a.entity_id < b.entity_id
  GROUP BY 1, 2
)
"""


def sql_kg_co_mentions(path: str) -> str:
    return _KG_RESOLVED_SQL.format(path=path) + _KG_CO_CTE + """
SELECT entity_a, entity_b, n_turns FROM co
"""


def sql_kg_pagerank(path: str, damping: float = 0.85, iters: int = 15, k: int = 50) -> str:
    """Fixed-iteration weighted PageRank unrolled as chained CTEs — the
    deterministic cross-engine oracle for ``q_kg_pagerank`` (VERDICT r03
    item 4: formerly the only catalogue family never checked against a
    second engine). Mirrors ops.graph.pagerank exactly: symmetric
    co-mention edges weighted by n_turns, out-weight normalization,
    uniform 1/N init, per-iteration dangling-mass redistribution
    (identically zero here — the symmetrized graph has no dangling
    nodes, but the term is kept so the oracle stays general), ranks
    rounded to 1e-9 on both sides, deterministic (rank9 DESC, node)
    top-k cut."""
    # MATERIALIZED: DuckDB inlines plain CTEs per reference — 15 unrolled
    # iterations would re-expand (and re-read the parquet under) the whole
    # upstream chain each time ("Too many open files" observed)
    sql = _KG_RESOLVED_SQL.format(path=path) + _KG_CO_CTE + """
, pe AS MATERIALIZED (
  SELECT entity_a AS src, entity_b AS dst, CAST(n_turns AS DOUBLE) AS w FROM co
  UNION ALL
  SELECT entity_b, entity_a, CAST(n_turns AS DOUBLE) FROM co
),
pow_ AS MATERIALIZED (SELECT src, SUM(w) AS ow FROM pe GROUP BY src),
pne AS MATERIALIZED (SELECT pe.src, pe.dst, pe.w / pow_.ow AS w FROM pe JOIN pow_ ON pe.src = pow_.src),
pn AS MATERIALIZED (
  -- NOT "a UNION b": under WITH RECURSIVE DuckDB parses a top-level
  -- UNION CTE body as a recursive definition and skips the dedup
  SELECT DISTINCT node FROM (SELECT src AS node FROM pe UNION ALL SELECT dst FROM pe)
),
pnn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pn),
pr0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM pnn) AS rank FROM pn)
"""
    for i in range(1, iters + 1):
        sql += f""", pr{i} AS MATERIALIZED (
  SELECT pn.node,
         (1 - {damping}) / (SELECT n FROM pnn)
         + {damping} * (
             COALESCE(s.contrib, 0)
             + (SELECT COALESCE(SUM(p.rank), 0) FROM pr{i - 1} p
                LEFT JOIN pow_ o ON p.node = o.src WHERE o.src IS NULL)
               / (SELECT n FROM pnn)
           ) AS rank
  FROM pn
  LEFT JOIN (SELECT e.dst AS node, SUM(p.rank * e.w) AS contrib
             FROM pne e JOIN pr{i - 1} p ON e.src = p.node GROUP BY e.dst) s
  ON pn.node = s.node
)
"""
    return sql + f"""
SELECT node, round(rank, 9) AS rank9 FROM pr{iters}
ORDER BY rank9 DESC, node
LIMIT {k}
"""


def q_kg_pagerank(sf_dir: str):
    """Weighted PageRank over the co-mention graph. Top 50 by rank with a
    deterministic (rank9 DESC, node) cut. Oracle: the same 15 iterations
    unrolled as DuckDB CTEs (``sql_kg_pagerank``) — ranks agree to the
    1e-9 rounding because damping < 1 keeps cross-engine float
    summation-order noise (~1e-15) contracted, and both strategies also
    equal a numpy reference to machine epsilon in tests/test_graph.py."""
    from cartography_ray.ops.agg import topk
    from cartography_ray.ops.graph import pagerank

    pairs = q_kg_co_mentions(sf_dir)

    def sym(t: pa.Table) -> pa.Table:
        a, b = t.column("entity_a"), t.column("entity_b")
        w = pc.cast(t.column("n_turns"), pa.float64())
        return pa.table(
            {
                "src": pa.concat_arrays([pc.cast(a, pa.string()).combine_chunks(), pc.cast(b, pa.string()).combine_chunks()]),
                "dst": pa.concat_arrays([pc.cast(b, pa.string()).combine_chunks(), pc.cast(a, pa.string()).combine_chunks()]),
                "w": pa.concat_arrays([w.combine_chunks(), w.combine_chunks()]),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow")
    pr = pagerank(edges, "src", "dst", weight="w", damping=0.85, iters=15)

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                # half_towards_infinity == DuckDB round() (CLAUDE.md
                # rounding convention; default half_to_even diverges)
                "rank9": pc.round(t.column("rank"), 9, round_mode="half_towards_infinity"),
            }
        )

    return topk(pr.map_batches(proj, batch_format="pyarrow"), "rank9", 50, tiebreak=["node"])


def q_kg_triangles(sf_dir: str):
    """Triangle enumeration over the co-mention graph
    (ops/graph.triangles — degree-ordered wedge plan, so a hub entity
    never enumerates deg² wedges). One row per triangle, id-sorted
    (node_a < node_b < node_c); the DuckDB twin is a plain triple
    self-join over the same co-mention edge CTE."""
    from cartography_ray.ops.graph import triangles

    pairs = q_kg_co_mentions(sf_dir)

    def edge(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t.column("entity_a"), pa.string()),
                "dst": pc.cast(t.column("entity_b"), pa.string()),
            }
        )

    return triangles(pairs.map_batches(edge, batch_format="pyarrow"))


def sql_kg_triangles(path: str) -> str:
    return _KG_RESOLVED_SQL.format(path=path) + _KG_CO_CTE + """
SELECT a.entity_a AS node_a, a.entity_b AS node_b, b.entity_b AS node_c
FROM co a
JOIN co b ON b.entity_a = a.entity_b
JOIN co c ON c.entity_a = a.entity_a AND c.entity_b = b.entity_b
"""


# --------------------------------------------------------------------------
# Catalogue
# --------------------------------------------------------------------------

def q_events_user_mode(sf_dir: str):
    """Per-user modal event type (ops/agg.grouped_mode): combiner-first
    single shuffle keyed on user only, deterministic count-desc /
    value-asc tie-break spelled out identically in the SQL twin."""
    rd = _rd()
    from cartography_ray.ops.agg import grouped_mode

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["user_id", "event_type"])
    return grouped_mode(
        ds,
        keys="user_id",
        value_col="event_type",
        out_col="mode_event",
        count_col="mode_count",
        num_partitions=_parts_for(path),
    )


SQL_EVENTS_USER_MODE = """
SELECT user_id, event_type AS mode_event, cnt AS mode_count FROM (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1
"""


# interval half-length: cents(value) × 6 s — sized so the sf0.01 event
# stream (median per-user gap ≈ 7.3 h, mean value ≈ 50) yields a healthy
# mix of merged islands and singletons; integer-exact on both engines
COVERAGE_US_PER_CENT = 6_000_000


def q_events_coverage(sf_dir: str):
    """Per-user union of event 'activity intervals' [ts, ts + value-scaled
    duration) — the gaps-and-islands interval merge
    (ops/window.interval_union: ONE key shuffle, vectorized running-cummax
    kernel). Emits one row per merged island."""
    rd = _rd()
    from cartography_ray.ops.window import interval_union

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["user_id", "ts", "value"])

    def iv(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.cast(t.column("ts"), pa.int64())
        dur = pc.multiply(
            _cents(t.column("value")), pa.scalar(COVERAGE_US_PER_CENT, pa.int64())
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "s_us": s,
                "e_us": pc.add(s, dur),
            }
        )

    return interval_union(
        ds.map_batches(iv, batch_format="pyarrow"),
        key="user_id",
        start_col="s_us",
        end_col="e_us",
        num_partitions=_parts_for(path),
    )


SQL_EVENTS_COVERAGE = f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * {COVERAGE_US_PER_CENT} AS e
  FROM events
), m AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM iv
), f AS (
  SELECT user_id, s, e,
         CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS flag
  FROM m
), g AS (
  -- RANGE framing gives tied (s, e) peers the same island id, matching
  -- the engine's order-independent island membership
  SELECT user_id, s, e,
         SUM(flag) OVER (PARTITION BY user_id ORDER BY s, e) AS isl
  FROM f
)
SELECT user_id, MIN(s) AS island_start, MAX(e) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS n_iv
FROM g GROUP BY user_id, isl
"""


def q_customers_fuzzy_names(sf_dir: str):
    """Levenshtein ≤ 1 fuzzy self-join over customer names
    (functions/fuzzy.edit_distance_pairs: symmetric-delete blocking —
    candidate-complete — + banded-DP vectorized verify). The full
    O(n²)-levenshtein DuckDB twin is the oracle; the TPC-H-style
    'Customer#000000123' name space has thousands of true distance-1
    pairs (single-digit substitutions), so the join is non-vacuous."""
    rd = _rd()
    from cartography_ray.functions.fuzzy import edit_distance_pairs

    path = f"{sf_dir}/customer.parquet"
    ds = rd.read_parquet(path, columns=["c_custkey", "c_name"])
    return edit_distance_pairs(
        ds,
        id_col="c_custkey",
        str_col="c_name",
        max_dist=1,
        num_partitions=_parts_for(path),
    )


SQL_CUSTOMERS_FUZZY_NAMES = """
SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND abs(length(a.c_name) - length(b.c_name)) <= 1
 AND levenshtein(a.c_name, b.c_name) <= 1
"""


HIST_WIDTH_CENTS = 2_000  # fixed-width bins: integer-exact bucketing


def q_events_histogram(sf_dir: str):
    """Per-type equal-width value histogram — the distribution-profiling
    sweep (one combiner-first shuffle on (type, bin); bins are
    integer-exact: cents // width on both engines)."""
    rd = _rd()
    from cartography_ray.ops.agg import partial_groupby_agg

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "value"])

    def binify(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value"))
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "bin": pc.divide(cents, pa.scalar(HIST_WIDTH_CENTS, pa.int64())),
            }
        )

    return partial_groupby_agg(
        ds.map_batches(binify, batch_format="pyarrow"),
        ["event_type", "bin"],
        {"n": (None, "count")},
        num_partitions=_parts_for(path),
    )


SQL_EVENTS_HISTOGRAM = f"""
SELECT event_type,
       CAST(round(value * 100) AS BIGINT) // {HIST_WIDTH_CENTS} AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


def q_events_corr(sf_dir: str):
    """Per-type Pearson correlation between spend and hour-of-day —
    grouped co-moments, integer-exact: the per-batch combiner sums
    (x, y, xy, x², y², n) in int64 (x = cents, y = hour), the final is
    a dimension-bounded driver fold, and the correlation itself is
    computed from those EXACT integers in float64 with the identical
    expression tree on both engines (+, ×, /, sqrt are all IEEE
    correctly rounded, so equal inputs give equal doubles), rounded to
    9 digits like the pagerank oracle. The SQL twin hand-writes the
    same formula — the built-in ``corr()`` uses a different single-pass
    update order and would diverge in the last bits."""
    rd = _rd()
    from cartography_ray.ops.agg import bounded_groupby_agg

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        x = _cents(t.column("value"))
        hour = pc.cast(
            pc.divide(
                pc.cast(t.column("ts"), pa.int64()),
                pa.scalar(3_600_000_000, pa.int64()),
            ),
            pa.int64(),
        )
        y = pc.subtract(
            hour, pc.multiply(pc.divide(hour, pa.scalar(24, pa.int64())), pa.scalar(24, pa.int64()))
        )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "x2": pc.multiply(x, x),
                "y2": pc.multiply(y, y),
            }
        )

    agg = bounded_groupby_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"],
        {
            "n": (None, "count"),
            "sx": ("x", "sum"),
            "sy": ("y", "sum"),
            "sxy": ("xy", "sum"),
            "sx2": ("x2", "sum"),
            "sy2": ("y2", "sum"),
        },
    )
    pdf = agg.to_pandas()  # event types: dimension-bounded by contract
    n = pdf["n"].to_numpy().astype("float64")
    sx = pdf["sx"].to_numpy().astype("float64")
    sy = pdf["sy"].to_numpy().astype("float64")
    sxy = pdf["sxy"].to_numpy().astype("float64")
    sx2 = pdf["sx2"].to_numpy().astype("float64")
    sy2 = pdf["sy2"].to_numpy().astype("float64")
    corr = (n * sxy - sx * sy) / np.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(pdf["event_type"].astype(str), pa.string()),
                "n": pa.array(pdf["n"].to_numpy().astype("int64"), pa.int64()),
                "corr9": pc.round(
                    pa.array(corr, pa.float64()), 9,
                    round_mode="half_towards_infinity",
                ),
            }
        )
    )


SQL_EVENTS_CORR = """
WITH m AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS x,
         (epoch_us(ts) // 3600000000) % 24 AS y
  FROM events
), s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sx2, CAST(SUM(y * y) AS BIGINT) AS sy2
  FROM m GROUP BY 1
)
SELECT event_type, n,
       round(
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
         9) AS corr9
FROM s
"""

# hour index of 2026-01-01T00:00:00Z — the trend regressor is hours
# since corpus start, keeping x² (and its sums) far from int64 range
TREND_BASE_HOURS = 490_896


def q_events_trend(sf_dir: str):
    """Per-type least-squares spend trend (slope + intercept of cents vs
    hours-since-corpus-start) — grouped linear regression from the SAME
    integer-exact co-moment partials as ``events_corr``: the per-batch
    combiner sums (x, y, xy, x², n) in int64, the final is a
    dimension-bounded driver fold, and slope = (n·Σxy − Σx·Σy) /
    (n·Σx² − (Σx)²) is evaluated with the identical float64 expression
    tree on both engines (DuckDB's built-in REGR_SLOPE uses a
    single-pass update order that diverges in the last bits, so the SQL
    twin hand-writes the formula). Co-moment magnitudes are bounded by
    the rebased hour index — the contract that keeps int64 exact at
    gate scale (events_corr's convention)."""
    rd = _rd()
    from cartography_ray.ops.agg import bounded_groupby_agg

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        y = _cents(t.column("value"))
        x = pc.subtract(
            pc.divide(
                pc.cast(t.column("ts"), pa.int64()),
                pa.scalar(3_600_000_000, pa.int64()),
            ),
            pa.scalar(TREND_BASE_HOURS, pa.int64()),
        )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "x2": pc.multiply(x, x),
            }
        )

    agg = bounded_groupby_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"],
        {
            "n": (None, "count"),
            "sx": ("x", "sum"),
            "sy": ("y", "sum"),
            "sxy": ("xy", "sum"),
            "sx2": ("x2", "sum"),
        },
    )
    pdf = agg.to_pandas()  # event types: dimension-bounded by contract
    n = pdf["n"].to_numpy().astype("float64")
    sx = pdf["sx"].to_numpy().astype("float64")
    sy = pdf["sy"].to_numpy().astype("float64")
    sxy = pdf["sxy"].to_numpy().astype("float64")
    sx2 = pdf["sx2"].to_numpy().astype("float64")
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    icept = (sy - slope * sx) / n
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(pdf["event_type"].astype(str), pa.string()),
                "n": pa.array(pdf["n"].to_numpy().astype("int64"), pa.int64()),
                "slope9": pc.round(
                    pa.array(slope, pa.float64()), 9,
                    round_mode="half_towards_infinity",
                ),
                "icept9": pc.round(
                    pa.array(icept, pa.float64()), 9,
                    round_mode="half_towards_infinity",
                ),
            }
        )
    )


SQL_EVENTS_TREND = f"""
WITH m AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) - {TREND_BASE_HOURS} AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sx2
  FROM m GROUP BY 1
), f AS (
  SELECT event_type, n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM s
)
SELECT event_type, n, round(slope, 9) AS slope9,
       round((syd - slope * sxd) / CAST(n AS DOUBLE), 9) AS icept9
FROM f
"""


def q_docs_lang_routed(sf_dir: str):
    """The resumable partitioned sink exercised END-TO-END through the
    driver gate: language-ID → ``write_partitioned`` keyed by predicted
    language into a fingerprinted scratch root → read back the SEALED
    partitions. Rows identical to ``docs_langid`` (shared SQL twin), but
    every row has made a round trip through the ``part=<k>/`` layout —
    the gate therefore also proves the sink's markers, atomic-rename
    seal, hive-inference-off read, and (on repeat runs with the same
    input fingerprint) the skip-sealed resume path, which the gate's own
    two executions of this query exercise for real."""
    import hashlib

    from cartography_ray.functions.text import langid_batch
    from cartography_ray.state.sink import read_partitioned, write_partitioned

    rd = _rd()
    path = f"{sf_dir}/documents.parquet"
    st = os.stat(path)
    fp = hashlib.sha256(
        f"lang_routed_v1|{path}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()
    root = f"/tmp/graft_sink/lang_routed/{fp[:16]}"

    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    write_partitioned(
        ds.map_batches(langid_batch, batch_format="pyarrow"),
        root,
        partition_col="pred_lang",
        num_parts=8,
        fingerprint=fp,
        num_partitions=_parts_for(path),
    )
    return read_partitioned(root)


def _cluster_summary(pairs, a_col: str, b_col: str, num_partitions):
    """Shared tail of the two cluster queries: pair Dataset → the
    engine's connected_components → one (canonical, n_members) row per
    cluster. Ids ride zero-padded strings so min-label propagation's
    string min IS the numeric min. Measured-small pair tables fuse the
    whole tail (CC fixpoint + label counts + int cast) into ONE task —
    same kernel (`_cc_pandas_labels`) as the driver-local CC strategy,
    so results are identical; large pair tables keep the distributed
    plan."""
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import (
        LOCAL_MERGE_BYTE_LIMIT,
        LOCAL_MERGE_ROW_LIMIT,
        _ensure_merge_task,
        _nonempty_refs,
    )
    from cartography_ray.stages.canonicalize import (
        _cc_pandas_labels,
        connected_components,
    )

    def pad(col):
        return pc.utf8_lpad(pc.cast(col, pa.string()), 12, "0")

    edges = pairs.map_batches(
        lambda t: pa.table({"a": pad(t.column(a_col)), "b": pad(t.column(b_col))}),
        batch_format="pyarrow",
    )
    refs, n_rows, n_bytes = _nonempty_refs(edges)
    if not refs:
        return _rd().from_arrow(
            pa.schema(
                [("canonical", pa.int64()), ("n_members", pa.int64())]
            ).empty_table()
        )
    if n_rows <= LOCAL_MERGE_ROW_LIMIT and n_bytes <= LOCAL_MERGE_BYTE_LIMIT:
        import ray.data as _rdm

        def tail(t: pa.Table) -> pa.Table:
            lab = _cc_pandas_labels(t)
            counts = lab.value_counts()
            return pa.table(
                {
                    "canonical": pc.cast(
                        pa.array(counts.index.to_numpy(), pa.string()),
                        pa.int64(),
                    ),
                    "n_members": pa.array(
                        counts.to_numpy("int64"), pa.int64()
                    ),
                }
            )

        out_ref = _ensure_merge_task().remote(tail, "pyarrow", *refs)
        return _rdm.from_arrow_refs([out_ref])

    import ray.data as _rdm

    labels = connected_components(_rdm.from_arrow_refs(refs))
    sizes = partial_groupby_agg(
        labels, ["label"], {"n_members": (None, "count")},
        num_partitions=num_partitions, elide_small=True,
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canonical": pc.cast(t.column("label"), pa.int64()),
                "n_members": t.column("n_members"),
            }
        )

    return sizes.map_batches(proj, batch_format="pyarrow")


def q_docs_dup_clusters(sf_dir: str):
    """Transitive near-duplicate clusters over the EXACT set-similarity
    join — the text analogue of ``emb_semantic_dedup``: one row per
    cluster whose members are chained by n-gram-Jaccard ≥ τ pairs
    (jaccard_pairs_exact → the engine's connected_components →
    canonical = min doc_id, n_members). Deterministic end to end, so the
    recursive-CTE closure oracle hash-matches — unlike the minhash
    family, which is rows-only by design."""
    rd = _rd()
    from cartography_ray.functions.dedup import jaccard_pairs_exact

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    pairs = jaccard_pairs_exact(
        ds, threshold=CLEAN_JACCARD_TAU, ngram=5, max_df=CLEAN_MAX_DF,
        num_partitions=_parts_for(path),
    )
    return _cluster_summary(pairs, "id_a", "id_b", _parts_for(path))


SQL_DOCS_DUP_CLUSTERS = f"""
WITH RECURSIVE sh_all AS (
  SELECT DISTINCT doc_id, substring(lt, CAST(i AS INTEGER), 5) AS g
  FROM (
    SELECT doc_id, lt, unnest(range(1, greatest(1, length(lt) - 3))) AS i
    FROM (SELECT doc_id, lower(text) AS lt FROM documents)
  )
),
sh AS (
  SELECT * FROM sh_all
  WHERE g IN (SELECT g FROM sh_all GROUP BY g HAVING COUNT(*) <= {CLEAN_MAX_DF})
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sim AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / greatest(1, sa.n + sb.n - c) >= {CLEAN_JACCARD_TAU}
),
pairs AS (SELECT id_a AS x, id_b AS y FROM sim UNION ALL SELECT id_b, id_a FROM sim),
nodes AS (SELECT DISTINCT x AS node FROM pairs),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT p.x, r.lab FROM pairs p JOIN reach r ON r.node = p.y
),
canon AS (SELECT node, MIN(lab) AS lab FROM reach GROUP BY node)
SELECT lab AS canonical, CAST(COUNT(*) AS BIGINT) AS n_members
FROM canon GROUP BY lab
"""


# every customer name is one digit-substitution chain away from most
# others, so the FULL table's lev-1 graph collapses into one giant
# component (measured: 1500/1500, and the closure oracle costs 24 s);
# the mod-7 subsample keeps the same pipeline honest with real cluster
# structure — 63 clusters, max size 8, 0.3 s oracle at sf0.01
FUZZY_CLUSTER_MOD = 7


def q_customers_fuzzy_clusters(sf_dir: str):
    """End-to-end fuzzy entity resolution: Levenshtein-1 name pairs
    (functions/fuzzy blocking+verify) → the engine's own distributed
    connected_components → one summary row per duplicate CLUSTER
    (canonical = min member id, n_members). Node ids ride as
    zero-padded strings so min-label propagation's string min IS the
    numeric min. Oracle: recursive-CTE transitive closure over the same
    levenshtein pairs (the emb_semantic_dedup oracle idiom applied to
    string identity)."""
    rd = _rd()
    from cartography_ray.functions.fuzzy import edit_distance_pairs

    path = f"{sf_dir}/customer.parquet"
    ds = rd.read_parquet(path, columns=["c_custkey", "c_name"])

    def subsample(t: pa.Table) -> pa.Table:
        # k % MOD == 0 (pyarrow has no modulo kernel; positive keys, so
        # trunc integer divide works)
        k = t.column("c_custkey")
        mod = pc.equal(
            pc.subtract(
                k, pc.multiply(pc.divide(k, FUZZY_CLUSTER_MOD), FUZZY_CLUSTER_MOD)
            ),
            pa.scalar(0, pa.int64()),
        )
        return t.filter(mod)

    pairs = edit_distance_pairs(
        ds.map_batches(subsample, batch_format="pyarrow"),
        id_col="c_custkey",
        str_col="c_name",
        max_dist=1,
        num_partitions=_parts_for(path),
    )
    return _cluster_summary(pairs, "a_id", "b_id", _parts_for(path))


SQL_CUSTOMERS_FUZZY_CLUSTERS = f"""
WITH RECURSIVE sub AS (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % {FUZZY_CLUSTER_MOD} = 0
), pairs AS (
  SELECT a.c_custkey AS x, b.c_custkey AS y
  FROM sub a JOIN sub b
    ON a.c_custkey <> b.c_custkey
   AND abs(length(a.c_name) - length(b.c_name)) <= 1
   AND levenshtein(a.c_name, b.c_name) <= 1
), nodes AS (SELECT DISTINCT x AS node FROM pairs),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT p.x, r.lab FROM pairs p JOIN reach r ON r.node = p.y
), canon AS (
  SELECT node, MIN(lab) AS lab FROM reach GROUP BY node
)
SELECT lab AS canonical, CAST(COUNT(*) AS BIGINT) AS n_members
FROM canon GROUP BY lab
"""


CMS_WIDTH, CMS_DEPTH = 4096, 4


def q_docs_token_freq_cms(sf_dir: str):
    """Count-min-sketch token frequencies vs exact (ops/sketches.cms_*):
    the fixed-memory frequency-estimation path — per-block (depth×width)
    partials folded driver-side, NO shuffle at any corpus size. Emits
    the exact top-100 tokens with exact and estimated counts; CMS
    guarantees est ≥ exact (asserted in tests). Rows-only: the sketch's
    collision pattern is hash-family-specific, not SQL-reproducible."""
    rd = _rd()
    from cartography_ray.functions.text import VOCAB_SPLIT_RE, token_frequency
    from cartography_ray.ops.sketches import cms_build, cms_query

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["text"])

    def tokens(t: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.cast(t.column("text"), pa.string()))
        toks = pc.list_flatten(pc.split_pattern_regex(lowered, VOCAB_SPLIT_RE))
        return pa.table({"token": toks.filter(pc.not_equal(toks, ""))})

    sk = cms_build(
        ds.map_batches(tokens, batch_format="pyarrow"),
        "token", width=CMS_WIDTH, depth=CMS_DEPTH,
    )
    exact = token_frequency(
        ds, text_col="text", top_n=100, num_partitions=_parts_for(path)
    ).to_pandas()  # 100 rows by construction
    import pandas as pd

    est = cms_query(sk, exact["token"])
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "token": pa.array(exact["token"].astype(str), pa.string()),
                "n": pa.array(exact["n"].to_numpy().astype("int64"), pa.int64()),
                "n_est": pa.array(est, pa.int64()),
            }
        )
    )


TOP_PARTNERS_K = 3


def q_kg_top_partners(sf_dir: str):
    """Top-3 co-mention partners per entity (grouped_topk over the
    symmetrized co-mention pair table — the KG 'related entities'
    panel). Deterministic: n_turns DESC, partner ASC; reuses the shared
    co-mention checkpoint, so the pair pipeline is paid once per
    corpus."""
    from cartography_ray.ops.window import grouped_topk

    pairs = q_kg_co_mentions(sf_dir)

    def sym(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("entity_a"), pa.string()).combine_chunks()
        b = pc.cast(t.column("entity_b"), pa.string()).combine_chunks()
        n = pc.cast(t.column("n_turns"), pa.int64()).combine_chunks()
        return pa.table(
            {
                "entity": pa.concat_arrays([a, b]),
                "partner": pa.concat_arrays([b, a]),
                "n_turns": pa.concat_arrays([n, n]),
            }
        )

    from cartography_ray.runtime import shuffle_partitions

    ranked = grouped_topk(
        pairs.map_batches(sym, batch_format="pyarrow"),
        group_keys="entity",
        order_col="n_turns",
        k=TOP_PARTNERS_K,
        descending=True,
        tiebreak=["partner"],
        # the pair table is co-mention-sized (≪ corpus); without a hint
        # the shuffle pays ~60 ms × session-default partitions for a
        # few-MB exchange (measured 6.7 s end-to-end at sf0.1)
        num_partitions=shuffle_partitions(n_bytes=8 << 20),
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": t.column("entity"),
                "partner": t.column("partner"),
                "n_turns": t.column("n_turns"),
                "rn": pc.cast(t.column("rn"), pa.int64()),
            }
        )

    return ranked.map_batches(proj, batch_format="pyarrow")


def sql_kg_top_partners(path: str, k: int = TOP_PARTNERS_K) -> str:
    return _KG_RESOLVED_SQL.format(path=path) + _KG_CO_CTE + f"""
, sym AS (
  SELECT entity_a AS entity, entity_b AS partner, CAST(n_turns AS BIGINT) AS n_turns FROM co
  UNION ALL
  SELECT entity_b, entity_a, CAST(n_turns AS BIGINT) FROM co
)
SELECT entity, partner, n_turns, rn FROM (
  SELECT entity, partner, n_turns,
         ROW_NUMBER() OVER (PARTITION BY entity
                            ORDER BY n_turns DESC, partner) AS rn
  FROM sym)
WHERE rn <= {k}
"""


Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1998-01-01"


# bloom-prefilter the Q5 fact probes only above this probe-side size:
# the bloom costs one build-side materialize + an extra scan, which is
# repaid only when the probe shuffle it prunes is large (A/B at sf0.1,
# interleaved ×2: bloom 9.7/8.9 s vs no-bloom 8.3/8.2 s — below the
# threshold the plain join wins; at 100-TB lineitem the ~4/5 probe-row
# cut dominates). Same shape as the broadcast size guards.
Q5_BLOOM_MIN_PROBE_BYTES = 1 << 30


def q_regional_supplier_revenue(sf_dir: str, use_bloom: bool | None = None):
    """TPC-H Q5 shape: revenue by nation for orders whose customer and
    line-item supplier share a nation inside one region, over a date
    window — the deepest join pipeline in the catalogue (lineitem ⋈
    orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region).

    Plan (scale posture): the two genuinely fixed dims (region 5,
    nation 25) resolve driver-side into a nationkey set + name map;
    customer and supplier are FACTS (∝ SF) — each is filtered to the
    region per batch, then joined reduce-side. Join order puts the
    selective joins first: date-filtered orders ⋈ region-filtered
    customer (~1/5 survive), and the big lineitem join probes THAT
    result with a bloom prefilter, so ~4/5 of lineitem rows never enter
    the exchange; the supplier join is bloom-prefiltered the same way.
    The final group-by is nation-bounded (driver fold)."""
    import pyarrow.parquet as pq

    rd = _rd()
    from cartography_ray.ops.agg import bounded_groupby_agg
    from cartography_ray.ops.joins import hash_join

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    rkeys = set(region[region["r_name"] == Q5_REGION]["r_regionkey"])
    in_region = nation[nation["n_regionkey"].isin(rkeys)]
    nkeys = frozenset(int(k) for k in in_region["n_nationkey"])
    name_of = {int(r.n_nationkey): r.n_name for r in in_region.itertuples()}

    lo = np.datetime64(Q5_DATE_LO, "us")
    hi = np.datetime64(Q5_DATE_HI, "us")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def date_filter(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        m = pc.and_(
            pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi))
        )
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    def nation_filter(key_col: str, nat_col: str):
        keys = nkeys

        def fn(t: pa.Table) -> pa.Table:
            nk = t.column(nat_col).to_numpy(zero_copy_only=False)
            m = np.isin(nk, np.fromiter(keys, dtype="int64"))
            return t.filter(pa.array(m)).select([key_col, nat_col])

        return fn

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(nation_filter("c_custkey", "c_nationkey"), batch_format="pyarrow")
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(nation_filter("s_suppkey", "s_nationkey"), batch_format="pyarrow")

    if use_bloom is None:
        try:
            use_bloom = (
                os.path.getsize(f"{sf_dir}/lineitem.parquet")
                >= Q5_BLOOM_MIN_PROBE_BYTES
            )
        except OSError:
            use_bloom = True

    parts = _parts_for(f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet")
    cust_orders = hash_join(
        orders.map_batches(date_filter, batch_format="pyarrow"),
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        num_partitions=parts,
    ).map_batches(
        lambda t: t.select(["o_orderkey", "c_nationkey"]), batch_format="pyarrow"
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "revenue_cents": _cents(disc),
            }
        )

    li_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
         ("revenue_cents", pa.int64())]
    )
    co_schema = pa.schema([("o_orderkey", pa.int64()), ("c_nationkey", pa.int64())])
    j2 = hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        cust_orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=parts,
        left_schema=li_schema,
        right_schema=co_schema,
        bloom_prefilter_bits=(1 << 22) if use_bloom else None,
    )
    j2_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
         ("revenue_cents", pa.int64()), ("o_orderkey", pa.int64()),
         ("c_nationkey", pa.int64())]
    )
    supp_schema = pa.schema([("s_suppkey", pa.int64()), ("s_nationkey", pa.int64())])
    j3 = hash_join(
        j2,
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
        num_partitions=parts,
        left_schema=j2_schema,
        right_schema=supp_schema,
        bloom_prefilter_bits=(1 << 20) if use_bloom else None,
    )

    # vectorized 25-entry gather (no per-row dict lookups in the hot
    # final stage): index_in against the fixed nation-key array
    nk_arr = pa.array(sorted(name_of), pa.int64())
    nm_arr = pa.array([name_of[k] for k in sorted(name_of)], pa.string())

    def local_only(t: pa.Table) -> pa.Table:
        cn = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        sn = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(cn == sn))
        pos = pc.index_in(t.column("c_nationkey"), nk_arr)
        return pa.table(
            {
                "n_name": pc.take(nm_arr, pos),
                "revenue_cents": t.column("revenue_cents"),
            }
        )

    return bounded_groupby_agg(
        j3.map_batches(local_only, batch_format="pyarrow"),
        ["n_name"],
        {"revenue_cents": ("revenue_cents", "sum"), "n_items": (None, "count")},
    )


SQL_REGIONAL_SUPPLIER_REVENUE = f"""
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND s_nationkey = c_nationkey
  AND o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q5_DATE_HI}'
GROUP BY 1
"""


# distinct users scale with SF (not a dimension): broadcast the per-user
# moment table only below this bound, hash_join above (the resolve_keys /
# revenue_by_nation size-guard precedent)
OUTLIER_BROADCAST_LIMIT = 2_000_000


def q_events_outliers(sf_dir: str, broadcast_limit: int | None = None):
    """Per-user 3-sigma outlier events — anomaly flagging with
    INTEGER-EXACT moments and mirrored-IEEE flag arithmetic: per-batch
    (cents, cents²) combiner → one user-keyed moment aggregation, then
    flag x iff (n·x − s)² > 9·(n·q − s²). The squares would overflow
    BIGINT, so BOTH engines evaluate them in float64 with the identical
    expression tree (n, s, q, x are int64-exact first; IEEE ops are
    per-op deterministic, so the hash compare holds — the
    integer-cents convention extended to second moments)."""
    import ray

    rd = _rd()
    from cartography_ray.ops.agg import partial_groupby_agg

    limit = OUTLIER_BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_id", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        x = _cents(t.column("value"))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "value_cents": x,
                "__x2": pc.multiply(x, x),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    stats = partial_groupby_agg(
        prepped.map_batches(
            lambda t: t.select(["user_id", "value_cents", "__x2"]),
            batch_format="pyarrow",
        ),
        ["user_id"],
        {"n": (None, "count"), "s": ("value_cents", "sum"), "q": ("__x2", "sum")},
        num_partitions=_parts_for(path),
    ).materialize()

    def flag_arrays(x, n, s, q):
        nf = n.astype("float64")
        xf = x.astype("float64")
        sf_ = s.astype("float64")
        qf = q.astype("float64")
        a = nf * xf - sf_
        return (a * a) > (9.0 * (nf * qf - sf_ * sf_))

    if stats.count() <= limit:
        import pandas as pd

        spdf = stats.to_pandas().set_index("user_id").sort_index()
        smap_ref = ray.put(spdf)

        def flag_bcast(t: pa.Table) -> pa.Table:
            m: pd.DataFrame = ray.get(smap_ref)
            u = t.column("user_id").to_numpy(zero_copy_only=False)
            x = t.column("value_cents").to_numpy(zero_copy_only=False)
            # vectorized gather: every event's user is in the moment
            # table by construction (it was aggregated from this input)
            pos = m.index.get_indexer(u)
            n = m["n"].to_numpy()[pos]
            s = m["s"].to_numpy()[pos]
            q = m["q"].to_numpy()[pos]
            t = t.filter(pa.array(flag_arrays(x, n, s, q)))
            return t.select(["event_id", "user_id", "value_cents"])

        return prepped.map_batches(flag_bcast, batch_format="pyarrow")

    from cartography_ray.ops.joins import hash_join

    joined = hash_join(
        prepped.map_batches(
            lambda t: t.select(["event_id", "user_id", "value_cents"]),
            batch_format="pyarrow",
        ),
        stats,
        left_on="user_id",
        right_on="user_id",
        num_partitions=_parts_for(path),
    )

    def flag_joined(t: pa.Table) -> pa.Table:
        x = t.column("value_cents").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        q = t.column("q").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(flag_arrays(x, n, s, q)))
        return t.select(["event_id", "user_id", "value_cents"])

    return joined.map_batches(flag_joined, batch_format="pyarrow")


SQL_EVENTS_OUTLIERS = """
WITH x AS (
  SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS xc FROM events
), st AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xc) AS BIGINT) AS s, CAST(SUM(xc * xc) AS BIGINT) AS q
  FROM x GROUP BY 1
)
SELECT e.event_id, e.user_id, e.xc AS value_cents
FROM x e JOIN st USING (user_id)
WHERE (CAST(st.n AS DOUBLE) * CAST(e.xc AS DOUBLE) - CAST(st.s AS DOUBLE))
      * (CAST(st.n AS DOUBLE) * CAST(e.xc AS DOUBLE) - CAST(st.s AS DOUBLE))
      > 9.0 * (CAST(st.n AS DOUBLE) * CAST(st.q AS DOUBLE)
               - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE))
"""


BPE_N_MERGES = 40


def q_docs_bpe_merges(sf_dir: str):
    """BPE vocabulary induction over the document corpus
    (functions/bpe.train_bpe_merges): the 40 highest-frequency merges,
    deterministic lexicographic tie-breaks. Rows-only — the iterative
    argmax+rewrite loop is not SQL-expressible; correctness is the
    pure-python Sennrich reference-equality test plus the
    driver≡distributed tier test in tests/test_functions.py."""
    rd = _rd()
    from cartography_ray.functions.bpe import train_bpe_merges

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["text"])
    return train_bpe_merges(
        ds, text_col="text", n_merges=BPE_N_MERGES,
        num_partitions=_parts_for(path),
    )


def q_docs_bpe_encoded(sf_dir: str):
    """The tokenizer-APPLY half of the BPE loop: train the corpus's 40
    merges (same spec as ``docs_bpe_merges``), then encode every
    document with them (functions/bpe.bpe_encode — actor pool, regexes
    compiled once per actor, merge table broadcast once, unique-word
    cache per batch). Output: (doc_id, n_words, bpe_n_tokens). Rows-only
    like its training twin (the merge loop is not SQL-expressible);
    correctness is the pure-python encode reference-equality test in
    tests/test_bpe.py."""
    rd = _rd()
    from cartography_ray.functions.bpe import bpe_encode, train_bpe_merges

    path = f"{sf_dir}/documents.parquet"
    merges = train_bpe_merges(
        rd.read_parquet(path, columns=["text"]), text_col="text",
        n_merges=BPE_N_MERGES, num_partitions=_parts_for(path),
    ).to_pandas()
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    return bpe_encode(
        ds,
        list(zip(merges["left"], merges["right"])),
        text_col="text",
        id_col="doc_id",
    )


PATH_MAX_LEN = 20


def q_events_user_path(sf_dir: str):
    """Per-user ordered action sequence — the first 20 event types by
    (ts, event_id), '>'-joined (ops/window.sequence_paths: per-batch
    first-k combiner → one key shuffle → truncate + join kernel)."""
    rd = _rd()
    from cartography_ray.ops.window import sequence_paths

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["user_id", "ts", "event_id", "event_type"])
    return sequence_paths(
        ds,
        key="user_id",
        order_cols=["ts", "event_id"],
        value_col="event_type",
        max_len=PATH_MAX_LEN,
        num_partitions=_parts_for(path),
    )


SQL_EVENTS_USER_PATH = f"""
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn <= {PATH_MAX_LEN}
GROUP BY user_id
"""


# sf0.01 co-mention graph: 3539 nodes / 8247 edges; the 4-core has 998
# nodes and needs SIX parallel peel rounds to converge — multi-round
# peeling is genuinely live. Oracle unrolls 2× that depth.
KCORE_K = 4
# 4× the measured sf0.01 peel depth (6): the unrolled oracle must cover
# the peel depth of ANY corpus the gate runs on — under-unrolling would
# return a superset core and blame the (correct) engine; extra rounds
# are fixpoint no-ops and MATERIALIZED CTEs keep them cheap
KCORE_ORACLE_ROUNDS = 24


def q_kg_kcore(sf_dir: str):
    """k-core of the co-mention graph (ops/graph.kcore: iterative
    peeling to fixpoint — driver tier below 200k edges, degree-agg +
    two-semi-join rounds above; the core is UNIQUE regardless of peel
    order, so the unrolled-CTE DuckDB twin matches exactly)."""
    from cartography_ray.ops.graph import kcore

    pairs = q_kg_co_mentions(sf_dir)

    def edge(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t.column("entity_a"), pa.string()),
                "dst": pc.cast(t.column("entity_b"), pa.string()),
            }
        )

    return kcore(pairs.map_batches(edge, batch_format="pyarrow"), k=KCORE_K)


def sql_kg_kcore(
    path: str, k: int = KCORE_K, rounds: int = KCORE_ORACLE_ROUNDS
) -> str:
    """Peel loop unrolled as a CTE chain (the ``sql_kg_pagerank``
    fixed-iteration idiom — a shrinking set is inexpressible under
    WITH RECURSIVE's append-only semantics). ``rounds`` must exceed the
    graph's parallel peel depth (6 at sf0.01; 2× margin); extra rounds
    are no-ops at fixpoint, so over-unrolling is safe, never wrong."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # round references the previous one 3× — the unrolled chain would
    # otherwise expand to 3^rounds transcript scans (observed as an
    # fd-exhaustion IO error, not just slowness)
    parts = [", r0 AS MATERIALIZED (SELECT entity_a AS a, entity_b AS b FROM co)"]
    for i in range(rounds):
        parts.append(
            f""", s{i} AS MATERIALIZED (
  SELECT node FROM (
    SELECT a AS node FROM r{i} UNION ALL SELECT b FROM r{i}
  ) GROUP BY node HAVING COUNT(*) >= {k})
, r{i + 1} AS MATERIALIZED (
  SELECT r.a, r.b FROM r{i} r
  JOIN s{i} x ON r.a = x.node JOIN s{i} y ON r.b = y.node)"""
        )
    final = f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
  SELECT a AS node FROM r{rounds} UNION ALL SELECT b FROM r{rounds}
) GROUP BY node HAVING COUNT(*) >= {k}
"""
    return (
        _KG_RESOLVED_SQL.format(path=path) + _KG_CO_CTE + "".join(parts) + final
    )


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1995-03-15"


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: unshipped-revenue top-10 orders for one market
    segment (customer ⋈ orders ⋈ lineitem with opposing date cuts,
    group by order, top-k). Complements Q5: customer participates as a
    pure FILTER here, so the plan uses a semi join (no customer bytes
    enter the second exchange) where Q5 had to carry the nation column
    through an inner join. Top-10 is the per-block-prune + bounded
    driver-final idiom (``q_top_orders``), never a global sort."""
    rd = _rd()
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import hash_join

    cut = np.datetime64(Q3_DATE, "us")

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def seg_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("c_mktsegment"), Q3_SEGMENT))
        return t.select(["c_custkey"])

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def ord_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("o_orderdate"), pa.scalar(cut)))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_date_us": pc.cast(t.column("o_orderdate"), pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    parts = _parts_for(f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet")
    ord_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("o_date_us", pa.int64()), ("o_orderpriority", pa.string())]
    )
    ord_b = hash_join(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        cust.map_batches(seg_filter, batch_format="pyarrow"),
        left_on="o_custkey",
        right_on="c_custkey",
        how="semi",
        left_schema=ord_schema,
        right_schema=pa.schema([("c_custkey", pa.int64())]),
        num_partitions=parts,
    ).map_batches(
        lambda t: t.select(["o_orderkey", "o_date_us", "o_orderpriority"]),
        batch_format="pyarrow",
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), pa.scalar(cut)))
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "revenue_cents": _cents(disc)}
        )

    j = hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        ord_b,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue_cents", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_date_us", pa.int64()),
             ("o_orderpriority", pa.string())]
        ),
        num_partitions=parts,
    )
    grouped = partial_groupby_agg(
        j,
        ["l_orderkey", "o_date_us", "o_orderpriority"],
        {"revenue_cents": ("revenue_cents", "sum")},
        num_partitions=parts,
    )

    sort_cols = ["revenue_cents", "o_date_us", "l_orderkey"]
    order = [False, True, True]

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(sort_cols, ascending=order).head(10)

    final = (
        grouped.map_batches(local, batch_format="pandas")
        .to_pandas()
        .sort_values(sort_cols, ascending=order)
        .head(10)
    )
    cols = ["l_orderkey", "revenue_cents", "o_date_us", "o_orderpriority"]
    return pa.Table.from_pandas(
        final[cols].reset_index(drop=True), preserve_index=False
    ).replace_schema_metadata(None)


SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       epoch_us(o_orderdate) AS o_date_us,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE}'
GROUP BY l_orderkey, o_date_us, o_orderpriority
ORDER BY revenue_cents DESC, o_date_us, l_orderkey
LIMIT 10
"""


Q10_DATE_LO = "1996-01-01"
Q10_DATE_HI = "1996-04-01"
Q10_CUST_BROADCAST_LIMIT = 2_000_000


def q_returned_item_revenue(sf_dir: str, cust_broadcast_limit: int | None = None):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items in one quarter (lineitem[R-flag] ⋈ orders[date window] ⋈
    customer ⋈ nation, group by customer, top-k).

    Scale posture: the quarter window keeps ~4% of orders, so the
    lineitem⋈orders join runs with a bloom prefilter of the windowed
    order keys — ~96% of returned-lineitem rows drop BEFORE the
    exchange. Customer auto-switches broadcast↔hash_join on footer row
    count (the revenue_by_nation guard); nation (fixed 25 rows) is the
    only unconditional broadcast. Top-20 is per-block prune + bounded
    driver final, never a global sort."""
    rd = _rd()
    import pyarrow.parquet as pq

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import broadcast_join, hash_join

    lo = np.datetime64(Q10_DATE_LO, "us")
    hi = np.datetime64(Q10_DATE_HI, "us")
    limit = (
        Q10_CUST_BROADCAST_LIMIT if cust_broadcast_limit is None else cust_broadcast_limit
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def ord_prep(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi)))
        t = t.filter(keep)
        return t.select(["o_orderkey", "o_custkey"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        tt = pa.table(
            {"l_orderkey": t.column("l_orderkey"), "revenue_cents": _cents(disc)}
        )
        # per-batch combine on orderkey before the shuffle (lineitem is
        # clustered by orderkey — the revenue_by_nation combiner)
        g = tt.group_by("l_orderkey").aggregate([("revenue_cents", "sum")])
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "revenue_cents": g.column("revenue_cents_sum"),
            }
        )

    parts = _parts_for(f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet")
    fact = hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        left_on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=parts,
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue_cents", pa.int64())]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        bloom_prefilter_bits=1 << 22,
    )

    def combine_by_cust(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("revenue_cents", "sum")])
        return pa.table(
            {
                "o_custkey": g.column("o_custkey"),
                "revenue_cents": g.column("revenue_cents_sum"),
            }
        )

    fact = fact.map_batches(combine_by_cust, batch_format="pyarrow")
    fact_schema = pa.schema([("o_custkey", pa.int64()), ("revenue_cents", pa.int64())])

    cust_path = f"{sf_dir}/customer.parquet"
    cust_cols = ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    if pq.read_metadata(cust_path).num_rows <= limit:
        cust_tbl = pq.read_table(cust_path, columns=cust_cols)
        cust_pdf = cust_tbl.to_pandas()
        # DuckDB round() is half-away-from-zero — go through _cents (the
        # repo's rounding convention), not numpy's banker's round
        cust_pdf["acctbal_cents"] = _cents(cust_tbl.column("c_acctbal")).to_numpy()
        cn = cust_pdf.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        cn = cn[["c_custkey", "c_name", "acctbal_cents", "n_name"]]
        joined = broadcast_join(fact, cn, left_on="o_custkey", right_on="c_custkey")
    else:
        customer = rd.read_parquet(cust_path, columns=cust_cols)

        def cust_prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "c_custkey": t.column("c_custkey"),
                    "c_name": t.column("c_name"),
                    "acctbal_cents": _cents(t.column("c_acctbal")),
                    "c_nationkey": t.column("c_nationkey"),
                }
            )

        with_cust = hash_join(
            fact,
            customer.map_batches(cust_prep, batch_format="pyarrow"),
            left_on="o_custkey",
            right_on="c_custkey",
            num_partitions=_parts_for(f"{sf_dir}/customer.parquet"),
            left_schema=fact_schema,
        )
        with_nation = broadcast_join(
            with_cust, nation, left_on="c_nationkey", right_on="n_nationkey"
        )

        def unify(t: pa.Table) -> pa.Table:
            # hash_join folds the right key into the left key column —
            # re-expose it under the broadcast plan's name (in-UDF rename;
            # Dataset.rename_columns mis-fuses with pandas stages)
            return pa.table(
                {
                    "c_custkey": t.column("o_custkey"),
                    "c_name": t.column("c_name"),
                    "acctbal_cents": t.column("acctbal_cents"),
                    "n_name": t.column("n_name"),
                    "revenue_cents": t.column("revenue_cents"),
                }
            )

        joined = with_nation.map_batches(unify, batch_format="pyarrow")

    grouped = partial_groupby_agg(
        joined.select_columns(
            ["c_custkey", "c_name", "acctbal_cents", "n_name", "revenue_cents"]
        ),
        ["c_custkey", "c_name", "acctbal_cents", "n_name"],
        {"revenue_cents": ("revenue_cents", "sum")},
        num_partitions=_parts_for(cust_path),
    )

    sort_cols = ["revenue_cents", "c_custkey"]
    order = [False, True]

    def local(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(sort_cols, ascending=order).head(20)

    final = (
        grouped.map_batches(local, batch_format="pandas")
        .to_pandas()
        .sort_values(sort_cols, ascending=order)
        .head(20)
    )
    cols = ["c_custkey", "c_name", "revenue_cents", "acctbal_cents", "n_name"]
    return pa.Table.from_pandas(
        final[cols].reset_index(drop=True), preserve_index=False
    ).replace_schema_metadata(None)


SQL_RETURNED_ITEM_REVENUE = f"""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{Q10_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q10_DATE_HI}'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, acctbal_cents, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


Q4_DATE_LO = "1996-01-01"
Q4_DATE_HI = "1997-01-01"
Q4_LATE_DAYS = 30
_US_PER_DAY = 86_400_000_000


def q_priority_late_orders(sf_dir: str):
    """TPC-H Q4 shape: per-priority census of orders (one year window)
    with at least one LATE line item — EXISTS(lineitem shipped > 30
    days after the order date).

    Scale posture: the EXISTS never materializes order×line pairs — the
    fact table reduces FIRST to one (orderkey, max ship) row per order
    (per-batch combine exploits orderkey clustering, then one keyed
    shuffle over the combined partials), so the join input is
    order-cardinality, not line-cardinality. The lineitem read also
    pre-drops rows that cannot satisfy the predicate for ANY windowed
    order (shipdate ≤ window_lo + 30d — existence over a max is
    insensitive to dropping sub-threshold rows). The windowed-order key
    set bloom-prefilters the probe side; the 5-row priority census
    folds driver-side with zero further shuffles
    (``bounded_groupby_agg``). Reference analogue: the saved asset-age /
    staleness census queries in cartography/client (bounded-dimension
    GROUP BY over an EXISTS-style predicate)."""
    rd = _rd()
    from cartography_ray.ops.agg import bounded_groupby_agg, partial_groupby_agg
    from cartography_ray.ops.joins import hash_join

    lo = np.datetime64(Q4_DATE_LO, "us")
    hi = np.datetime64(Q4_DATE_HI, "us")
    late_us = Q4_LATE_DAYS * _US_PER_DAY
    ship_floor = pa.scalar(np.datetime64(Q4_DATE_LO, "us") + np.timedelta64(Q4_LATE_DAYS, "D"))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def ord_prep(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi)))
        t = t.filter(keep)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_date_us": pc.cast(t.column("o_orderdate"), pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def li_prep(t: pa.Table) -> pa.Table:
        # rows with shipdate ≤ window_lo+30d can't satisfy the predicate
        # for any windowed order (o_orderdate ≥ window_lo) — drop before
        # the combine; max-EXISTS is unchanged
        t = t.filter(pc.greater(t.column("l_shipdate"), ship_floor))
        tt = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "ship_us": pc.cast(t.column("l_shipdate"), pa.int64()),
            }
        )
        g = tt.group_by("l_orderkey").aggregate([("ship_us", "max")])
        return pa.table(
            {"l_orderkey": g.column("l_orderkey"), "ship_us": g.column("ship_us_max")}
        )

    parts = _parts_for(f"{sf_dir}/orders.parquet")
    max_ship = partial_groupby_agg(
        li.map_batches(li_prep, batch_format="pyarrow"),
        ["l_orderkey"],
        {"max_ship_us": ("ship_us", "max")},
        num_partitions=parts,
    )
    j = hash_join(
        max_ship,
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        left_on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=parts,
        left_schema=pa.schema([("l_orderkey", pa.int64()), ("max_ship_us", pa.int64())]),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_date_us", pa.int64()),
             ("o_orderpriority", pa.string())]
        ),
        bloom_prefilter_bits=1 << 22,
    )

    def late_filter(t: pa.Table) -> pa.Table:
        keep = pc.greater(
            t.column("max_ship_us"),
            pc.add(t.column("o_date_us"), pa.scalar(late_us, pa.int64())),
        )
        return t.filter(keep).select(["o_orderpriority"])

    census = bounded_groupby_agg(
        j.map_batches(late_filter, batch_format="pyarrow"),
        ["o_orderpriority"],
        {"order_count": (None, "count")},
    )
    return census.sort_by([("o_orderpriority", "ascending")])


SQL_PRIORITY_LATE_ORDERS = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q4_DATE_HI}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


Q12_DATE_LO = "1997-01-01"
Q12_DATE_HI = "1998-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")
Q12_ORD_BROADCAST_LIMIT = 2_000_000


def q_urgent_lines_by_status(sf_dir: str, ord_broadcast_limit: int | None = None):
    """TPC-H Q12 shape: per line-status census of lines shipped in one
    year, split by whether the owning order is high-priority
    (1-URGENT/2-HIGH) — the conditional-aggregation-after-join pattern.

    Scale posture: the order side carries ONE bit per key, so under the
    footer-row-count guard it broadcasts as a sorted int64 key array +
    packed bool (``ray.put`` once, ``searchsorted`` per batch) and the
    whole plan is shuffle-FREE: per-batch lookup → per-batch (status,
    high) partials → driver-side bounded fold over 2 statuses. Above
    the guard it falls back to one bloom-prefiltered hash join (orders
    outside the shipped-window key set drop pre-shuffle). Both arms are
    equality-tested (tests/test_relational_pipelines.py)."""
    rd = _rd()
    import pyarrow.parquet as pq
    import ray

    from cartography_ray.ops.agg import bounded_groupby_agg
    from cartography_ray.ops.joins import hash_join

    lo = np.datetime64(Q12_DATE_LO, "us")
    hi = np.datetime64(Q12_DATE_HI, "us")
    limit = (
        Q12_ORD_BROADCAST_LIMIT if ord_broadcast_limit is None else ord_broadcast_limit
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
    )

    def li_window(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate")
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi)))
        t = t.filter(keep)
        return t.select(["l_orderkey", "l_linestatus"])

    ord_path = f"{sf_dir}/orders.parquet"

    def census(ds) -> pa.Table:
        out = bounded_groupby_agg(
            ds,
            ["l_linestatus"],
            {"high_line_count": ("high", "sum"), "low_line_count": ("low", "sum")},
        )
        return out.sort_by([("l_linestatus", "ascending")])

    windowed = li.map_batches(li_window, batch_format="pyarrow")
    if pq.read_metadata(ord_path).num_rows <= limit:
        ot = pq.read_table(ord_path, columns=["o_orderkey", "o_orderpriority"])
        keys = ot.column("o_orderkey").to_numpy()
        order_idx = np.argsort(keys, kind="stable")
        keys = keys[order_idx]
        high = pc.is_in(
            ot.column("o_orderpriority"), value_set=pa.array(Q12_HIGH)
        ).to_numpy(zero_copy_only=False)[order_idx]
        side_ref = ray.put((keys, high))

        def lookup(t: pa.Table) -> pa.Table:
            k, h = ray.get(side_ref)
            ok = t.column("l_orderkey").to_numpy()
            pos = np.searchsorted(k, ok)
            pos = np.clip(pos, 0, len(k) - 1)
            hit = k[pos] == ok  # FK integrity holds in this corpus, but
            is_high = (h[pos] & hit).astype("int64")  # misses count as no row
            return pa.table(
                {
                    "l_linestatus": t.column("l_linestatus").filter(pa.array(hit)),
                    "high": pa.array(is_high[hit]),
                    "low": pa.array(1 - is_high[hit]),
                }
            )

        return census(windowed.map_batches(lookup, batch_format="pyarrow"))

    orders = rd.read_parquet(ord_path, columns=["o_orderkey", "o_orderpriority"])
    j = hash_join(
        windowed,
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=_parts_for(ord_path),
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_linestatus", pa.string())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
        ),
        bloom_prefilter_bits=1 << 22,
    )

    def split(t: pa.Table) -> pa.Table:
        is_high = pc.cast(
            pc.is_in(t.column("o_orderpriority"), value_set=pa.array(Q12_HIGH)),
            pa.int64(),
        )
        return pa.table(
            {
                "l_linestatus": t.column("l_linestatus"),
                "high": is_high,
                "low": pc.subtract(pa.scalar(1, pa.int64()), is_high),
            }
        )

    return census(j.map_batches(split, batch_format="pyarrow"))


SQL_URGENT_LINES_BY_STATUS = f"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('{Q12_HIGH[0]}', '{Q12_HIGH[1]}')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('{Q12_HIGH[0]}', '{Q12_HIGH[1]}')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_DATE_LO}'
  AND l_shipdate <  TIMESTAMP '{Q12_DATE_HI}'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


Q6_DATE_LO = "1997-01-01"
Q6_DATE_HI = "1998-01-01"
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_QTY_MAX = 24.0


def q_discounted_revenue(sf_dir: str):
    """TPC-H Q6 shape: what-if revenue from mid-discount small-quantity
    lines shipped in one year — the pure scan-aggregate, and the repo's
    prune-at-the-read showcase: the ship-date window is pushed into
    ``read_parquet(filter=...)`` so non-matching row groups never leave
    storage, the residual predicates filter per batch, and the global
    sum is order-free integer cents. ZERO shuffles end-to-end: one
    int64 partial per block streams through a driver fold whose memory
    is O(blocks), never O(rows). Empty match set returns 0 (the SQL
    twin coalesces NULL identically)."""
    rd = _rd()
    import pyarrow.dataset as pads

    lo = np.datetime64(Q6_DATE_LO, "us")
    hi = np.datetime64(Q6_DATE_HI, "us")
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=(
            (pads.field("l_shipdate") >= pa.scalar(lo))
            & (pads.field("l_shipdate") < pa.scalar(hi))
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate")
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi)))
        keep = pc.and_(
            keep,
            pc.and_(
                pc.greater_equal(t.column("l_discount"), pa.scalar(Q6_DISC_LO)),
                pc.less_equal(t.column("l_discount"), pa.scalar(Q6_DISC_HI)),
            ),
        )
        keep = pc.and_(keep, pc.less(t.column("l_quantity"), pa.scalar(Q6_QTY_MAX)))
        t = t.filter(keep)
        rev = _cents(pc.multiply(t.column("l_extendedprice"), t.column("l_discount")))
        s = pc.sum(rev).as_py()
        return pa.table({"revenue_cents": pa.array([s or 0], pa.int64())})

    total = 0
    partials = ds.map_batches(partial, batch_format="pyarrow")
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        total += pc.sum(b.column("revenue_cents")).as_py() or 0
    return pa.table({"revenue_cents": pa.array([total], pa.int64())})


SQL_DISCOUNTED_REVENUE = f"""
SELECT COALESCE(CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT), 0) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_DATE_LO}'
  AND l_shipdate <  TIMESTAMP '{Q6_DATE_HI}'
  AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY_MAX}
"""


Q14_DATE_LO = "1997-03-01"
Q14_DATE_HI = "1997-06-01"
Q14_PROMO_TYPE = "PROMO"
Q14_PART_BROADCAST_LIMIT = 4_000_000


def q_promo_revenue_share(sf_dir: str, part_broadcast_limit: int | None = None):
    """TPC-H Q14 shape: promo-part share of revenue in one quarter —
    two conditional sums over a lineitem⋈part join, reported as exact
    integer numerator/denominator (promo_revenue_cents,
    total_revenue_cents) so the output is hash-stable (the percentage
    is the consumer's one division; a float share would hash on
    last-bit division order).

    Scale posture: like Q12's order bit, the part side reduces to ONE
    bit per key — under the footer guard it broadcasts as sorted int64
    keys + packed bool (``ray.put`` once, ``searchsorted`` per batch;
    zero shuffles), above it one bloom-prefiltered hash join. Output is
    a single global row, folded from per-block int64 partials."""
    rd = _rd()
    import pyarrow.parquet as pq
    import ray

    from cartography_ray.ops.joins import hash_join

    lo = np.datetime64(Q14_DATE_LO, "us")
    hi = np.datetime64(Q14_DATE_HI, "us")
    limit = (
        Q14_PART_BROADCAST_LIMIT if part_broadcast_limit is None else part_broadcast_limit
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate")
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo)), pc.less(d, pa.scalar(hi)))
        t = t.filter(keep)
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table(
            {"l_partkey": t.column("l_partkey"), "revenue_cents": _cents(disc)}
        )

    def fold(ds_tagged) -> pa.Table:
        def partial(t: pa.Table) -> pa.Table:
            rev = t.column("revenue_cents")
            promo = pc.sum(pc.multiply(rev, t.column("is_promo"))).as_py() or 0
            tot = pc.sum(rev).as_py() or 0
            return pa.table(
                {
                    "promo_revenue_cents": pa.array([promo], pa.int64()),
                    "total_revenue_cents": pa.array([tot], pa.int64()),
                }
            )

        promo = total = 0
        for b in ds_tagged.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            promo += pc.sum(b.column("promo_revenue_cents")).as_py() or 0
            total += pc.sum(b.column("total_revenue_cents")).as_py() or 0
        return pa.table(
            {
                "promo_revenue_cents": pa.array([promo], pa.int64()),
                "total_revenue_cents": pa.array([total], pa.int64()),
            }
        )

    part_path = f"{sf_dir}/part.parquet"
    prepped = li.map_batches(li_prep, batch_format="pyarrow")
    if pq.read_metadata(part_path).num_rows <= limit:
        ptab = pq.read_table(part_path, columns=["p_partkey", "p_type"])
        keys = ptab.column("p_partkey").to_numpy()
        order_idx = np.argsort(keys, kind="stable")
        keys = keys[order_idx]
        is_promo = pc.equal(
            ptab.column("p_type"), pa.scalar(Q14_PROMO_TYPE)
        ).to_numpy(zero_copy_only=False)[order_idx]
        side_ref = ray.put((keys, is_promo))

        def lookup(t: pa.Table) -> pa.Table:
            k, pr = ray.get(side_ref)
            pk = t.column("l_partkey").to_numpy()
            pos = np.searchsorted(k, pk)
            pos = np.clip(pos, 0, len(k) - 1)
            hit = k[pos] == pk  # inner-join semantics: misses drop
            flag = (pr[pos] & hit).astype("int64")
            return pa.table(
                {
                    "revenue_cents": t.column("revenue_cents").filter(pa.array(hit)),
                    "is_promo": pa.array(flag[hit]),
                }
            )

        return fold(prepped.map_batches(lookup, batch_format="pyarrow"))

    part = rd.read_parquet(part_path, columns=["p_partkey", "p_type"])

    def part_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "is_promo": pc.cast(
                    pc.equal(t.column("p_type"), pa.scalar(Q14_PROMO_TYPE)), pa.int64()
                ),
            }
        )

    j = hash_join(
        prepped,
        part.map_batches(part_prep, batch_format="pyarrow"),
        left_on="l_partkey",
        right_on="p_partkey",
        num_partitions=_parts_for(part_path),
        left_schema=pa.schema([("l_partkey", pa.int64()), ("revenue_cents", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()), ("is_promo", pa.int64())]),
        bloom_prefilter_bits=1 << 22,
    )
    return fold(j)


SQL_PROMO_REVENUE_SHARE = f"""
SELECT CAST(SUM(CASE WHEN p_type = '{Q14_PROMO_TYPE}'
                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_revenue_cents,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_revenue_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_DATE_LO}'
  AND l_shipdate <  TIMESTAMP '{Q14_DATE_HI}'
"""


# 'ticket:' entities are sparse (one per support ticket mention), so the
# 4-hop reach set exercises genuinely multi-round frontier growth
KG_REACH_SEED_PREFIX = "ticket:"
KG_REACH_MAX_HOPS = 4


def q_kg_reach(sf_dir: str):
    """Multi-source BFS over the co-mention graph (ops/graph.bfs_hops:
    min hop distance from any ticket entity, ≤ 4 hops — driver tier
    below 200k edges, per-hop semi-join frontier expansion + anti-join
    visited filter above; min-distance is unique, so the unrolled-CTE
    DuckDB twin matches exactly). Traversal-distance is the graph
    primitive behind blast-radius / exposure queries in the reference's
    security domain (reference cartography/client queries walk
    bounded-depth relationship paths)."""
    from cartography_ray.ops.graph import bfs_hops

    pairs = q_kg_co_mentions(sf_dir)

    def edge(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t.column("entity_a"), pa.string()),
                "dst": pc.cast(t.column("entity_b"), pa.string()),
            }
        )

    edges = pairs.map_batches(edge, batch_format="pyarrow")

    def seed(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [
                t.column("src").combine_chunks().cast(pa.string()),
                t.column("dst").combine_chunks().cast(pa.string()),
            ]
        )
        keep = pc.starts_with(nodes, KG_REACH_SEED_PREFIX)
        return pa.table({"node": nodes.filter(keep)})

    seeds = edges.map_batches(seed, batch_format="pyarrow")
    return bfs_hops(edges, seeds, max_hops=KG_REACH_MAX_HOPS)


def sql_kg_reach(
    path: str,
    prefix: str = KG_REACH_SEED_PREFIX,
    hops: int = KG_REACH_MAX_HOPS,
) -> str:
    """Per-hop frontier unrolled as a CTE chain (the ``sql_kg_kcore``
    idiom — hop count is a fixed constant, so unrolling is exact, and
    MIN over the unioned candidate sets reproduces bfs_hops' min
    distance regardless of expansion order)."""
    parts = [
        """, e AS MATERIALIZED (
  SELECT entity_a AS a, entity_b AS b FROM co
  UNION ALL SELECT entity_b, entity_a FROM co)
, d0 AS MATERIALIZED (
  SELECT DISTINCT a AS node, CAST(0 AS BIGINT) AS hops FROM e
  WHERE a LIKE '{pfx}%')""".format(pfx=prefix)
    ]
    for i in range(1, hops + 1):
        parts.append(
            f""", f{i} AS MATERIALIZED (
  SELECT DISTINCT e.b AS node FROM e
  JOIN d{i - 1} p ON e.a = p.node AND p.hops = {i - 1})
, d{i} AS MATERIALIZED (
  SELECT node, CAST(MIN(hops) AS BIGINT) AS hops FROM (
    SELECT node, hops FROM d{i - 1}
    UNION ALL SELECT node, {i} FROM f{i}
  ) GROUP BY node)"""
        )
    final = f"""
SELECT node, hops FROM d{hops}
"""
    return (
        _KG_RESOLVED_SQL.format(path=path) + _KG_CO_CTE + "".join(parts) + final
    )


QUERIES: dict[str, Callable] = {
    # Ordering contract: the driver gates only the FIRST 50 entries, so
    # never-driver-checked oracled entries lead, then entries last checked
    # in round 3, then round-4-green entries; approximate rows-only
    # entries (no oracle by design) sit at the end so no gate slot is
    # spent on a permanent no_oracle row.  (VERDICT r04 next-round #2)
    # --- never driver-checked (oracled) ---
    # (kg_pagerank's r03 row was no_oracle — its oracle landed in r04
    # outside the window, so it has never been driver hash-checked)
    "kg_pagerank": q_kg_pagerank,
    "docs_packed": q_docs_packed,
    "docs_span_dedup": q_docs_span_dedup,
    "docs_span_dedup_hashed": q_docs_span_dedup_hashed,
    "docs_pruned": q_docs_pruned,
    "docs_decontam": q_docs_decontam,
    "docs_decontam_joined": q_docs_decontam_joined,
    "docs_incremental_dedup": q_docs_incremental_dedup,
    "docs_mix": q_docs_mix,
    "docs_source_weights": q_docs_source_weights,
    "emb_semantic_dedup": q_emb_semantic_dedup,
    "kg_pii_redacted": q_kg_pii_redacted,
    "kg_domains": q_kg_domains,
    "kg_triangles": q_kg_triangles,
    "events_retention": q_events_retention,
    "events_funnel": q_events_funnel,
    "events_rolling": q_events_rolling,
    "events_rank": q_events_rank,
    "docs_bigrams": q_docs_bigrams,
    "events_user_mode": q_events_user_mode,
    "events_coverage": q_events_coverage,
    "customers_fuzzy_names": q_customers_fuzzy_names,
    "kg_kcore": q_kg_kcore,
    "kg_reach": q_kg_reach,
    "events_user_path": q_events_user_path,
    "events_outliers": q_events_outliers,
    "regional_supplier_revenue": q_regional_supplier_revenue,
    "shipping_priority": q_shipping_priority,
    "kg_top_partners": q_kg_top_partners,
    "customers_fuzzy_clusters": q_customers_fuzzy_clusters,
    "docs_dup_clusters": q_docs_dup_clusters,
    "docs_lang_routed": q_docs_lang_routed,
    "events_corr": q_events_corr,
    "events_histogram": q_events_histogram,
    # --- new in round 5 (never driver-checked) ---
    "events_cume_dist": q_events_cume_dist,
    "events_trend": q_events_trend,
    "events_zscore": q_events_zscore,
    # --- last driver-checked in round 3 ---
    "docs_exact_dedup": q_docs_exact_dedup,
    "docs_dup_edges": q_docs_dup_edges,
    "docs_jaccard_pairs": q_docs_jaccard_pairs,
    "docs_clean_corpus": q_docs_clean_corpus,
    "emb_knn": q_emb_knn,
    "emb_neardup": q_emb_neardup,
    "fuzzy_match_parts": q_fuzzy_match_parts,
    "one_to_many_part_words": q_one_to_many_part_words,
    "events_props_k": q_events_props_k,
    "load_customers": q_load_customers,
    "ont_project_customers": q_ont_project_customers,
    "ont_users_merged": q_ont_users_merged,
    "kg_turns": q_kg_turns,
    "kg_mentions": q_kg_mentions,
    "kg_entities": q_kg_entities,
    "kg_alias_components": q_kg_alias_components,
    "kg_conversations": q_kg_conversations,
    "kg_triples": q_kg_triples,
    "kg_co_mentions": q_kg_co_mentions,
    # --- driver-green in round 4 ---
    "pricing_summary": q_pricing_summary,
    "lineitem_rollup": q_lineitem_rollup,
    "lineitem_cube": q_lineitem_cube,
    "revenue_by_nation": q_revenue_by_nation,
    "revenue_by_nation_salted": q_revenue_by_nation_salted,
    "top_orders": q_top_orders,
    "filter_project": q_filter_project,
    "customers_without_orders": q_customers_without_orders,
    "cust_orders_events_outer": q_cust_orders_events_outer,
    "events_hourly": q_events_hourly,
    "events_hopping": q_events_hopping,
    "events_gapfill": q_events_gapfill,
    "events_first": q_events_first,
    "events_sessions": q_events_sessions,
    "events_sessions_salted": q_events_sessions_salted,
    "events_session_ranges": q_events_session_ranges,
    "events_session_ranges_salted": q_events_session_ranges_salted,
    "top_orders_per_cust": q_top_orders_per_cust,
    "events_attribution": q_events_attribution,
    "events_attribution_salted": q_events_attribution_salted,
    "events_next_purchase": q_events_next_purchase,
    "events_quantiles": q_events_quantiles,
    "events_quantiles_disc": q_events_quantiles_disc,
    "events_mad": q_events_mad,
    "events_lag": q_events_lag,
    "events_running_sum": q_events_running_sum,
    "events_running_sum_salted": q_events_running_sum_salted,
    "events_ntile": q_events_ntile,
    "events_winsorized": q_events_winsorized,
    "events_pivot": q_events_pivot,
    "events_sample": q_events_sample,
    "events_weighted_sample": q_events_weighted_sample,
    "events_split": q_events_split,
    "docs_shuffled": q_docs_shuffled,
    "events_stratified": q_events_stratified,
    "events_distinct_users": q_events_distinct_users,
    "events_profile": q_events_profile,
    "docs_stats": q_docs_stats,
    "docs_budget_select": q_docs_budget_select,
    "docs_langid": q_docs_langid,
    "docs_fingerprint": q_docs_fingerprint,
    "docs_token_freq": q_docs_token_freq,
    "docs_heavy_tokens": q_docs_heavy_tokens,
    "docs_tfidf": q_docs_tfidf,
    "docs_bm25": q_docs_bm25,
    "docs_bpe_tokens": q_docs_bpe_tokens,
    "docs_lm_score": q_docs_lm_score,
    "docs_chunks": q_docs_chunks,
    "docs_repetition": q_docs_repetition,
    "docs_gopher": q_docs_gopher,
    "docs_entropy": q_docs_entropy,
    "returned_item_revenue": q_returned_item_revenue,
    "priority_late_orders": q_priority_late_orders,
    "urgent_lines_by_status": q_urgent_lines_by_status,
    "discounted_revenue": q_discounted_revenue,
    "promo_revenue_share": q_promo_revenue_share,
    "events_ewma": q_events_ewma,
    "events_gapfill_locf": q_events_gapfill_locf,
    "events_running_distinct": q_events_running_distinct,
    "events_gapfill_interp": q_events_gapfill_interp,
    # --- approximate / rows-only (no oracle by design) ---
    "events_distinct_users_hll": q_events_distinct_users_hll,
    "docs_incremental_minhash": q_docs_incremental_minhash,
    "docs_minhash_pairs": q_docs_minhash_pairs,
    "docs_simhash_pairs": q_docs_simhash_pairs,
    "emb_mmr": q_emb_mmr,
    "emb_knn_lsh": q_emb_knn_lsh,
    "emb_knn_ivf": q_emb_knn_ivf,
    "emb_knn_pq": q_emb_knn_pq,
    "emb_pca": q_emb_pca,
    "emb_clusters": q_emb_clusters,
    "docs_bpe_merges": q_docs_bpe_merges,
    "docs_token_freq_cms": q_docs_token_freq_cms,
    "docs_bpe_encoded": q_docs_bpe_encoded,
    "docs_near_decontam": q_docs_near_decontam,
}


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    """Oracle SQL strings; KG oracles read the same cached transcript
    parquet the Ray queries use (generated deterministically at import)."""
    path = ensure_transcripts(sf_dir)
    return {
        "pricing_summary": SQL_PRICING,
        "lineitem_rollup": SQL_LINEITEM_ROLLUP,
        "lineitem_cube": SQL_LINEITEM_CUBE,
        "revenue_by_nation": SQL_REVENUE_NATION,
        # skew_salt=8 plan of the same join chain — identical oracle
        # proves the salted hash_join plan (like the window *_salted twins)
        "revenue_by_nation_salted": SQL_REVENUE_NATION,
        "top_orders": SQL_TOP_ORDERS,
        "filter_project": SQL_FILTER_PROJECT,
        "customers_without_orders": SQL_CUST_NO_ORDERS,
        "cust_orders_events_outer": SQL_CUST_ORDERS_EVENTS_OUTER,
        "events_hourly": SQL_EVENTS_HOURLY,
        "events_hopping": SQL_EVENTS_HOPPING,
        "events_gapfill": SQL_EVENTS_GAPFILL,
        "events_first": SQL_EVENTS_FIRST,
        "events_sessions": SQL_EVENTS_SESSIONS,
        "events_session_ranges": SQL_EVENTS_SESSION_RANGES,
        "top_orders_per_cust": SQL_TOP_ORDERS_PER_CUST,
        "events_attribution": SQL_EVENTS_ATTRIBUTION,
        # the *_salted variants are the SAME semantics under the hot-key
        # chunked plans — identical oracles prove plan equivalence
        "events_sessions_salted": SQL_EVENTS_SESSIONS,
        "events_session_ranges_salted": SQL_EVENTS_SESSION_RANGES,
        "events_attribution_salted": SQL_EVENTS_ATTRIBUTION,
        "events_next_purchase": SQL_EVENTS_NEXT_PURCHASE,
        "events_quantiles": SQL_EVENTS_QUANTILES,
        "events_quantiles_disc": SQL_EVENTS_QUANTILES_DISC,
        "events_mad": SQL_EVENTS_MAD,
        "events_lag": SQL_EVENTS_LAG,
        "events_running_sum": SQL_EVENTS_RUNNING_SUM,
        "events_running_sum_salted": SQL_EVENTS_RUNNING_SUM,
        "events_ntile": SQL_EVENTS_NTILE,
        "events_winsorized": SQL_EVENTS_WINSORIZED,
        "events_pivot": SQL_EVENTS_PIVOT,
        "events_sample": SQL_EVENTS_SAMPLE,
        "events_weighted_sample": _wsample_sql(),
        "events_split": SQL_EVENTS_SPLIT,
        "docs_shuffled": SQL_DOCS_SHUFFLED,
        "events_stratified": SQL_EVENTS_STRATIFIED,
        "events_distinct_users": SQL_EVENTS_DISTINCT_USERS,
        "events_profile": SQL_EVENTS_PROFILE,
        # events_distinct_users_hll is approximate-by-design → rows-only
        "docs_stats": SQL_DOCS_STATS,
        "docs_budget_select": SQL_DOCS_BUDGET_SELECT,
        "docs_langid": SQL_DOCS_LANGID,
        "docs_lang_routed": SQL_DOCS_LANGID,
        "events_corr": SQL_EVENTS_CORR,
        "events_cume_dist": SQL_EVENTS_CUME_DIST,
        "events_trend": SQL_EVENTS_TREND,
        "events_zscore": SQL_EVENTS_ZSCORE,
        "events_histogram": SQL_EVENTS_HISTOGRAM,
        "docs_fingerprint": SQL_DOCS_FINGERPRINT,
        "docs_token_freq": SQL_DOCS_TOKEN_FREQ,
        # exact-by-construction here: corpus vocabulary ≤ k_track (see
        # q_docs_heavy_tokens docstring); approximate regime is
        # property-tested instead
        "docs_heavy_tokens": SQL_DOCS_HEAVY_TOKENS,
        "docs_tfidf": SQL_DOCS_TFIDF,
        "docs_bm25": SQL_DOCS_BM25,
        "docs_bpe_tokens": _sql_docs_bpe_tokens(),
        "docs_lm_score": SQL_DOCS_LM_SCORE,
        "docs_chunks": SQL_DOCS_CHUNKS,
        "docs_repetition": SQL_DOCS_REPETITION,
        "docs_gopher": SQL_DOCS_GOPHER,
        "docs_entropy": SQL_DOCS_ENTROPY,
        "returned_item_revenue": SQL_RETURNED_ITEM_REVENUE,
        "priority_late_orders": SQL_PRIORITY_LATE_ORDERS,
        "urgent_lines_by_status": SQL_URGENT_LINES_BY_STATUS,
        "discounted_revenue": SQL_DISCOUNTED_REVENUE,
        "promo_revenue_share": SQL_PROMO_REVENUE_SHARE,
        "events_ewma": SQL_EVENTS_EWMA,
        "events_gapfill_locf": SQL_EVENTS_GAPFILL_LOCF,
        "events_running_distinct": SQL_EVENTS_RUNNING_DISTINCT,
        "events_gapfill_interp": SQL_EVENTS_GAPFILL_INTERP,
        "docs_packed": SQL_DOCS_PACKED,
        "docs_span_dedup": SQL_DOCS_SPAN_DEDUP,
        # plan twin through the hash-payload + bloom-semi-join path —
        # identical oracle proves plan equivalence
        "docs_span_dedup_hashed": SQL_DOCS_SPAN_DEDUP,
        "docs_pruned": SQL_DOCS_PRUNED,
        "docs_decontam": SQL_DOCS_DECONTAM,
        # the joined twin is the SAME semantics through the distributed
        # semi/anti plan — identical oracle proves plan equivalence
        "docs_decontam_joined": SQL_DOCS_DECONTAM,
        "docs_exact_dedup": SQL_DOCS_EXACT_DEDUP,
        "docs_incremental_dedup": SQL_DOCS_INCREMENTAL_DEDUP,
        "docs_mix": SQL_DOCS_MIX,
        "docs_source_weights": SQL_DOCS_SOURCE_WEIGHTS,
        "docs_dup_edges": SQL_DOCS_DUP_EDGES,
        "docs_jaccard_pairs": SQL_DOCS_JACCARD,
        "docs_clean_corpus": SQL_DOCS_CLEAN_CORPUS,
        "emb_knn": SQL_EMB_KNN,
        "emb_neardup": SQL_EMB_NEARDUP,
        "emb_semantic_dedup": SQL_EMB_SEMANTIC_DEDUP,
        "fuzzy_match_parts": SQL_FUZZY_PARTS,
        "one_to_many_part_words": SQL_ONE_TO_MANY_WORDS,
        "events_props_k": SQL_EVENTS_PROPS,
        "load_customers": SQL_LOAD_CUSTOMERS,
        "ont_project_customers": SQL_ONT_PROJECT,
        "ont_users_merged": SQL_ONT_MERGED,
        "kg_turns": sql_kg_turns(path),
        "kg_pii_redacted": sql_kg_pii_redacted(path),
        "kg_domains": sql_kg_domains(path),
        "kg_mentions": sql_kg_mentions(path),
        "kg_entities": sql_kg_entities(path),
        "kg_alias_components": sql_kg_alias_components(path),
        "kg_conversations": sql_kg_conversations(path),
        "kg_triples": sql_kg_triples(path),
        "kg_co_mentions": sql_kg_co_mentions(path),
        "kg_pagerank": sql_kg_pagerank(path),
        "kg_triangles": sql_kg_triangles(path),
        "kg_kcore": sql_kg_kcore(path),
        "kg_reach": sql_kg_reach(path),
        "kg_top_partners": sql_kg_top_partners(path),
        "events_user_path": SQL_EVENTS_USER_PATH,
        "events_outliers": SQL_EVENTS_OUTLIERS,
        "regional_supplier_revenue": SQL_REGIONAL_SUPPLIER_REVENUE,
        "shipping_priority": SQL_SHIPPING_PRIORITY,
        "events_retention": SQL_EVENTS_RETENTION,
        "events_funnel": SQL_EVENTS_FUNNEL,
        "events_rolling": SQL_EVENTS_ROLLING,
        "events_rank": SQL_EVENTS_RANK,
        "docs_bigrams": SQL_DOCS_BIGRAMS,
        "events_user_mode": SQL_EVENTS_USER_MODE,
        "events_coverage": SQL_EVENTS_COVERAGE,
        "customers_fuzzy_names": SQL_CUSTOMERS_FUZZY_NAMES,
        "customers_fuzzy_clusters": SQL_CUSTOMERS_FUZZY_CLUSTERS,
        "docs_dup_clusters": SQL_DOCS_DUP_CLUSTERS,
        # docs_minhash_pairs / docs_simhash_pairs / emb_knn_lsh are
        # approximate-by-design → rows-only checks (recall asserted in tests)
    }
