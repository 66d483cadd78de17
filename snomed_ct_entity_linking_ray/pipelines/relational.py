"""Relational operator family over the testdata star schema.

Each function returns a lazy ``ray.data.Dataset``; the DuckDB oracle for
each lives in ``__ray_entry__.oracle_sql``. These exercise the engine's
generic operator classes from SURVEY.md §2: pruned reads (S1), vectorized
projections/filters (M5-class), broadcast hash joins (J1/J2), partial-then-
final grouped aggregation (G1/G2 combine pattern), top-k (T2), as-of join
(guide §Joins), tumbling/session windows (§2.9 target streaming-shaped ops).

Column names match the oracle SQL aliases exactly (driver hashes by name).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .common import broadcast, cents, grouped_sums, read, read_arrow


# --- filters / projections -------------------------------------------------

def q_filter_revenue(sf_dir: str):
    """lineitem rows before 1996 with discount > 0.05; revenue is a single
    IEEE multiply so it crosses the oracle boundary bit-exactly."""
    ds = read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    cutoff = _dt.datetime(1996, 1, 1)

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.less(t["l_shipdate"], pa.scalar(cutoff)),
            pc.greater(t["l_discount"], 0.05),
        )
        t = t.filter(mask)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue": rev,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- grouped aggregation (partial + final combine) -------------------------

def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped summary; money sums as exact integer cents."""
    ds = read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "qty_c": cents(df["l_quantity"]),
                "price_c": cents(df["l_extendedprice"]),
                "disc_c": cents(df["l_discount"]),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pandas")
    return grouped_sums(
        prepped,
        ["l_returnflag", "l_linestatus"],
        sums={"sum_qty_cents": "qty_c", "sum_price_cents": "price_c", "sum_disc_cents": "disc_c"},
        count_as="n_rows",
    )


# --- broadcast hash joins --------------------------------------------------

def q_orders_by_segment(sf_dir: str):
    """orders ⋈ customer (broadcast small side) → per-segment counts/sums."""
    cust = read_arrow(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    ref = broadcast(cust)

    ds = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    class JoinSeg:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = df.merge(self.small, left_on="o_custkey", right_on="c_custkey")
            return pd.DataFrame(
                {
                    "c_mktsegment": out["c_mktsegment"],
                    "total_c": cents(out["o_totalprice"]),
                }
            )

    joined = ds.map_batches(JoinSeg, batch_format="pandas", concurrency=(1, 4))
    return grouped_sums(
        joined, ["c_mktsegment"], sums={"sum_total_cents": "total_c"}, count_as="n_orders"
    )


def q_customers_per_region(sf_dir: str):
    """customer ⋈ nation ⋈ region (two-level broadcast dim join) → counts."""
    nation = read_arrow(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = read_arrow(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ]
    ref = broadcast(dim)

    ds = read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    class JoinDim:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = df.merge(self.small, left_on="c_nationkey", right_on="n_nationkey")
            out["one"] = np.int64(1)
            return out[["r_name", "one"]]

    joined = ds.map_batches(JoinDim, batch_format="pandas", concurrency=(1, 4))
    return grouped_sums(joined, ["r_name"], sums={"n_customers": "one"})


# --- sort / top-k ----------------------------------------------------------

def q_top_orders(sf_dir: str):
    """Global top-10 orders by totalprice (cents), deterministic tiebreak."""
    ds = read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "total_cents": pa.array(cents(t["o_totalprice"].to_numpy()), pa.int64()),
            }
        )

    # per-batch partial top-k, then a tiny global sort — the full sort never
    # shuffles all rows
    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.nlargest(10, ["total_cents", "o_orderkey"])

    p = ds.map_batches(prep, batch_format="pyarrow").map_batches(
        partial_topk, batch_format="pandas"
    )
    return p.sort(["total_cents", "o_orderkey"], descending=[True, True]).limit(10)


# --- as-of join ------------------------------------------------------------

def q_latest_order_before_event(sf_dir: str):
    """Per event: MAX(o_orderdate) of the same user's orders at/before ts —
    an as-of join done as broadcast sorted arrays + searchsorted per batch
    (SURVEY.md guide: as-of joins sort within key buckets)."""
    orders = read_arrow(sf_dir, "orders", ["o_custkey", "o_orderdate"]).to_pandas()
    per_user: dict[int, np.ndarray] = {
        k: np.sort(g["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64))
        for k, g in orders.groupby("o_custkey")
    }
    ref = broadcast(per_user)

    ds = read(sf_dir, "events", ["event_id", "user_id", "ts"])

    class AsOf:
        def __init__(self):
            self.per_user = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            users = df["user_id"].to_numpy()
            out = np.empty(len(df), dtype=np.int64)
            ok = np.zeros(len(df), dtype=bool)
            for u in np.unique(users):
                arr = self.per_user.get(int(u))
                sel = users == u
                if arr is None or len(arr) == 0:
                    continue
                idx = np.searchsorted(arr, ts[sel], side="right") - 1
                valid = idx >= 0
                vals = np.where(valid, arr[np.clip(idx, 0, None)], 0)
                out[sel] = vals
                ok[sel] = valid
            res = pd.DataFrame(
                {
                    "event_id": df["event_id"],
                    "last_order_ts": out.astype("datetime64[us]"),
                }
            )
            return res[ok]

    return ds.map_batches(AsOf, batch_format="pandas", concurrency=(1, 4))


# --- windows (tumbling + session) -----------------------------------------

def q_hourly_user_activity(sf_dir: str):
    """Tumbling 1h window per user: event count + value cents.

    The shuffle key is the INT64 epoch-hour, not a datetime64 column —
    grouping on a datetime key measured 39s vs 0.2s for the identical
    aggregate on this input (Ray's sort shuffle degrades badly on
    datetime blocks); the timestamp is reconstructed after the combine."""
    ds = read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "hour_idx": (df["ts"].astype("int64") // (3600 * 10**6)).astype(
                    np.int64
                ),  # fixture ts is datetime64[us]
                "value_c": cents(df["value"]),
            }
        )

    p = ds.map_batches(prep, batch_format="pandas")
    agg = grouped_sums(
        p, ["user_id", "hour_idx"], sums={"sum_value_cents": "value_c"},
        count_as="n_events",
    )

    def restore_hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "hour": (df["hour_idx"].to_numpy(np.int64) * (3600 * 10**6)).astype(
                    "datetime64[us]"
                ),
                "sum_value_cents": df["sum_value_cents"],
                "n_events": df["n_events"],
            }
        )

    return agg.map_batches(restore_hour, batch_format="pandas")


# --- semi / anti joins (J2-class: broadcast key-set filters) ---------------

def q_customers_without_events(sf_dir: str):
    """Anti-join: customers with no event activity — the key set of the
    probe side is broadcast as a set, no shuffle (guide §Joins)."""
    keys = set(read_arrow(sf_dir, "events", ["user_id"])["user_id"].to_pylist())
    ref = broadcast(keys)
    ds = read(sf_dir, "customer", ["c_custkey", "c_name"])

    class Anti:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df[~df["c_custkey"].isin(self.keys)]

    return ds.map_batches(Anti, batch_format="pandas", concurrency=(1, 4))


def q_parts_with_orders(sf_dir: str):
    """Semi-join: parts referenced by at least one lineitem."""
    keys = set(
        read_arrow(sf_dir, "lineitem", ["l_partkey"])["l_partkey"].to_pylist()
    )
    ref = broadcast(keys)
    ds = read(sf_dir, "part", ["p_partkey", "p_name"])

    class Semi:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df[df["p_partkey"].isin(self.keys)]

    return ds.map_batches(Semi, batch_format="pandas", concurrency=(1, 4))


# --- priority / order-sensitive dedup (D6-class) ---------------------------

def q_first_event_per_user(sf_dir: str):
    """Order-sensitive dedup: keep each user's earliest event
    (deterministic (ts, event_id) tiebreak) — the distributed form of
    ``drop_duplicates(keep="first")`` with an explicit rank
    (SURVEY.md D6: priority dedup must carry the order explicitly)."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts"])

    # map-side combine: per-batch first, then per-group first of partials
    def batch_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["ts", "event_id"]).groupby("user_id", as_index=False).head(1)

    def group_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["ts", "event_id"]).head(1)

    return (
        ds.map_batches(batch_first, batch_format="pandas")
        .groupby("user_id")
        .map_groups(group_first, batch_format="pandas")
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "user_id": df["user_id"],
                    "first_event_id": df["event_id"].astype(np.int64),
                    "first_ts": df["ts"],
                }
            ),
            batch_format="pandas",
        )
    )


# --- distinct-count aggregate (G5-class collect_set) -----------------------

def q_user_event_type_counts(sf_dir: str):
    """Distinct event types per user: per-batch distinct pairs (map-side
    combine), exact distinct via groupby(pair).first, then a tiny count."""
    ds = read(sf_dir, "events", ["user_id", "event_type"])

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    pairs = (
        ds.map_batches(distinct_pairs, batch_format="pandas")
        .groupby(["user_id", "event_type"])
        .map_groups(first, batch_format="pandas")
    )

    def ones(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"], "one": np.int64(1)})

    return grouped_sums(
        pairs.map_batches(ones, batch_format="pandas"),
        ["user_id"],
        sums={"n_types": "one"},
    )


def q_sessionize(sf_dir: str, gap_seconds: int = 1800):
    """Session windows per user (gap > 30 min starts a new session).

    Ordering assumption: only WITHIN-user order matters; each user's events
    are sorted inside its group (guide §Streaming-shaped workloads).
    """
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds()
        new = (gaps.isna()) | (gaps > gap_seconds)
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "session_id": new.cumsum().astype(np.int64) - 1,
            }
        )

    return ds.groupby("user_id").map_groups(sess, batch_format="pandas")
