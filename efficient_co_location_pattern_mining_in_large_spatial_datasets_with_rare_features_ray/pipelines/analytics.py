"""Warehouse-analytics operator family: full outer join, semi-structured
(JSON) field extraction, set operations, ROLLUP aggregation, pivot
(conditional aggregation), and embedding normalization.

Each query is the scale-right composition of the engine's primitives:
pre-aggregated partials before any shuffle, static bucket exchanges for
the joins/set ops, integer-unit money sums (order-independent, exact
oracle hashes), and Dataset results that stream (the only driver-side
tables are aggregate-sized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


# ---------------------------------------------------------------- full outer


def _daily_counts(sf_dir: str, table: str, date_col: str,
                  day_col: str, n_col: str) -> Dataset:
    """Per-day row counts: per-batch partial (day -> n) then a tiny
    groupby merge — only (days x blocks) partial rows ever shuffle."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                               columns=[date_col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        days = df[date_col].to_numpy(dtype="datetime64[D]").astype(np.int64)
        d, n = np.unique(days, return_counts=True)
        return pd.DataFrame({day_col: d, n_col: n.astype(np.int64)})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(day_col, sort=False)[n_col].sum().reset_index()
        g[n_col] = g[n_col].astype(np.int64)
        return g

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(day_col)
        .map_groups(merge, batch_format="pandas")
    )


def q_daily_activity_full(sf_dir: str) -> Dataset:
    """FULL OUTER JOIN demo on a real asymmetry: order-placement days vs
    lineitem-ship days (shipping lags ordering, so each side has days
    the other lacks). Both sides aggregate DOWN to per-day counts before
    the join — the join moves day-grain rows, never facts — and the
    bucketed exchange keeps unmatched rows of BOTH sides with NULLs on
    the absent side (joins.hash_join how='full')."""
    from .joins import hash_join

    od = _daily_counts(sf_dir, "orders", "o_orderdate", "o_day", "n_orders")
    ld = _daily_counts(sf_dir, "lineitem", "l_shipdate", "l_day", "n_ship")
    return hash_join(
        od, ld, key="o_day", right_key="l_day",
        right_columns=["l_day", "n_ship"], how="full",
    )


SQL_DAILY_ACTIVITY_FULL = """WITH od AS (
  SELECT DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS o_day,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
), ld AS (
  SELECT DATEDIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS l_day,
         COUNT(*) AS n_ship
  FROM lineitem GROUP BY 1
)
SELECT od.o_day, od.n_orders, ld.l_day, ld.n_ship
FROM od FULL OUTER JOIN ld ON od.o_day = ld.l_day"""


# ------------------------------------------------------- JSON extraction

# the events table's props column is a JSON object payload; extraction
# is a compiled vectorized regex over the raw strings (a full JSON parse
# per row is Python-rate; for flat scalar fields the anchored regex is
# byte-for-byte equivalent and runs at C speed)
_PROPS_K_RE = r'"k":\s*(-?\d+)'


def q_events_props(sf_dir: str) -> Dataset:
    """Semi-structured field extraction + aggregate: pull the integer
    field ``k`` out of the JSON ``props`` payload and aggregate it per
    event type. sum_k is an exact int sum; avg_k is ONE float division
    of two exact ints (bit-identical to the oracle's SUM/COUNT)."""
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(_PROPS_K_RE, expand=False)
        kv = pd.to_numeric(k, errors="raise").to_numpy(np.int64)
        return (
            pd.DataFrame({"event_type": df["event_type"], "n": 1, "sum_k": kv})
            .groupby("event_type", sort=False).sum().reset_index()
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False).agg(
            n=("n", "sum"), sum_k=("sum_k", "sum")
        ).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["sum_k"] = g["sum_k"].astype(np.int64)
        g["avg_k"] = g["sum_k"].to_numpy(np.float64) / g["n"].to_numpy(
            np.float64
        )
        return g

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )


SQL_EVENTS_PROPS = """SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
         / COUNT(*) AS avg_k
FROM events GROUP BY event_type"""


# ------------------------------------------------------------- set ops


def _priority_customers(sf_dir: str, priority: str) -> Dataset:
    import pyarrow.compute as pc
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], priority))
        .select(["o_custkey"]),
        batch_format="pyarrow",
    )


def q_cust_urgent_and_low(sf_dir: str) -> Dataset:
    """SQL INTERSECT: customers with BOTH an urgent and a low-priority
    order. Distinct partials collapse each side inside the map stage;
    only distinct ids reach the one bucketed exchange
    (pipelines/setops.key_intersect)."""
    from .setops import key_intersect

    return key_intersect(
        _priority_customers(sf_dir, "1-URGENT"),
        _priority_customers(sf_dir, "5-LOW"),
        key="o_custkey",
    )


SQL_CUST_URGENT_AND_LOW = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'"""


def q_cust_urgent_only(sf_dir: str) -> Dataset:
    """SQL EXCEPT: customers with an urgent order and no low-priority
    one (pipelines/setops.key_except, same exchange plan as
    INTERSECT)."""
    from .setops import key_except

    return key_except(
        _priority_customers(sf_dir, "1-URGENT"),
        _priority_customers(sf_dir, "5-LOW"),
        key="o_custkey",
    )


SQL_CUST_URGENT_ONLY = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'"""


# --------------------------------------------------------------- rollup


def q_revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): revenue and row
    counts at three grains (flag+status, flag, grand total). ONE
    distributed pass computes the finest grain with per-batch partials;
    the coarser grains derive from the finest-grain result — an
    aggregate-sized table (|flags| x |statuses| rows), so the rollup
    derivation costs nothing at any scale. Revenue sums in integer
    1e-4-dollar units (order-independent, exact oracle hash)."""
    import ray.data

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice",
                 "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        price_c = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        disc_c = np.floor(
            df["l_discount"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame({
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "revenue_e4": price_c * (100 - disc_c),
                "n_rows": 1,
            })
            .groupby(["l_returnflag", "l_linestatus"], sort=False)
            .sum().reset_index()
        )

    finest = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(
            lambda df: df.groupby(
                ["l_returnflag", "l_linestatus"], sort=False
            ).sum().reset_index(),
            batch_format="pandas",
        )
        .to_pandas()  # aggregate-sized: |flags| x |statuses| rows
    )
    per_flag = finest.groupby("l_returnflag", sort=False, as_index=False)[
        ["revenue_e4", "n_rows"]
    ].sum()
    per_flag["l_linestatus"] = "ALL"
    total = pd.DataFrame({
        "l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
        "revenue_e4": [finest["revenue_e4"].sum()],
        "n_rows": [finest["n_rows"].sum()],
    })
    out = pd.concat([finest, per_flag, total], ignore_index=True)
    out["revenue_e4"] = out["revenue_e4"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out[["l_returnflag", "l_linestatus", "revenue_e4", "n_rows"]]


SQL_REVENUE_ROLLUP = """SELECT
  COALESCE(l_returnflag, 'ALL') AS l_returnflag,
  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)))
       AS BIGINT) AS revenue_e4,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)"""


# ---------------------------------------------------------------- pivot

PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


def q_user_event_pivot(sf_dir: str) -> Dataset:
    """Pivot (conditional aggregation): one row per user with a count
    column per event type. Per-batch partial pivots (vectorized boolean
    sums) collapse each batch to at most |users-in-batch| rows before
    the one keyed shuffle; counts are exact ints."""
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    cols = [f"n_{t}" for t in PIVOT_TYPES]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy(object)
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64)})
        for t, c in zip(PIVOT_TYPES, cols):
            out[c] = (et == t).astype(np.int64)
        return out.groupby("user_id", sort=False).sum().reset_index()

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False).sum().reset_index()
        for c in cols:
            g[c] = g[c].astype(np.int64)
        return g

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .map_groups(merge, batch_format="pandas")
    )


SQL_USER_EVENT_PIVOT = "SELECT user_id, " + ", ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
    f" AS BIGINT) AS n_{t}"
    for t in PIVOT_TYPES
) + " FROM events GROUP BY user_id"


# ------------------------------------------------------ embedding norm


def q_embed_l2norm(sf_dir: str) -> Dataset:
    """Embedding L2 norms — the map-only normalization stage every
    embedding pipeline runs before cosine ops. Zero-copy fixed-width
    matrix view per batch, one vectorized einsum, no shuffle."""
    import ray.data

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def fn(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(t.num_rows, -1)
        nrm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        return pa.table({
            "vec_id": t["vec_id"],
            "nrm": pa.array(np.round(nrm, 6), pa.float64()),
        })

    return emb.map_batches(fn, batch_format="pyarrow")


# reuses the shared norms CTE shape from queries.py (kept inline here so
# the module is self-contained)
SQL_EMBED_L2NORM = """WITH pos AS (SELECT unnest(generate_series(1, 64)) AS p)
SELECT e.vec_id,
       round(sqrt(sum(pow(CAST(e.embedding[p.p] AS DOUBLE), 2))), 6) AS nrm
FROM embeddings e, pos p GROUP BY e.vec_id"""


ANALYTICS_QUERIES = {
    "daily_activity_full": q_daily_activity_full,
    "events_props": q_events_props,
    "cust_urgent_and_low": q_cust_urgent_and_low,
    "cust_urgent_only": q_cust_urgent_only,
    "revenue_rollup": q_revenue_rollup,
    "user_event_pivot": q_user_event_pivot,
    "embed_l2norm": q_embed_l2norm,
}

ANALYTICS_SQL = {
    "daily_activity_full": SQL_DAILY_ACTIVITY_FULL,
    "events_props": SQL_EVENTS_PROPS,
    "cust_urgent_and_low": SQL_CUST_URGENT_AND_LOW,
    "cust_urgent_only": SQL_CUST_URGENT_ONLY,
    "revenue_rollup": SQL_REVENUE_ROLLUP,
    "user_event_pivot": SQL_USER_EVENT_PIVOT,
    "embed_l2norm": SQL_EMBED_L2NORM,
}


# ------------------------------------------------- running total / ntile


def q_events_cumsum(sf_dir: str) -> Dataset:
    """Per-key running total (SUM OVER ... ROWS UNBOUNDED PRECEDING):
    each user's cumulative spend in integer cents — the exact-arithmetic
    trick of the Q3 composite applied to a window, so the prefix sum is
    order-independent-exact and hash-matches SQL regardless of float
    summation association. One hash shuffle, vectorized in-group
    sort + cumsum (same one-key-per-task contract as the sessionizer)."""
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="stable")
        cents = np.floor(
            df["value"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts": df["ts"].to_numpy(),
                "cum_cents": np.cumsum(cents),
            }
        )

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas")


SQL_EVENTS_CUMSUM = """SELECT event_id, user_id, ts,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM events"""


NTILE_BUCKETS = 4


def q_orders_price_quartile(sf_dir: str) -> Dataset:
    """NTILE (equal-frequency bucketing) over a total order: quartile of
    every order by totalprice. Rides the distributed global_rank
    operator (range partition -> per-bucket sort + offsets); the
    rank -> ntile map is pure per-batch arithmetic off the one tiny
    metadata count, so the bucketing adds NO extra pass or shuffle."""
    import ray.data

    from .rank import global_rank

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    n = orders.count()  # parquet metadata, no execution
    ranked = global_rank(
        orders, "o_totalprice", "o_orderkey", rank_col="price_rank"
    )
    base, rem = divmod(n, NTILE_BUCKETS)
    cut = rem * (base + 1)

    def add_ntile(t: pa.Table) -> pa.Table:
        r = t["price_rank"].to_numpy(zero_copy_only=False).astype(np.int64) - 1
        if base == 0:  # degenerate tiny input: one row per bucket
            nt = r + 1
        else:
            nt = np.where(r < cut, r // (base + 1), rem + (r - cut) // base) + 1
        return t.append_column("quartile", pa.array(nt, pa.int64()))

    return ranked.map_batches(add_ntile, batch_format="pyarrow")


SQL_ORDERS_PRICE_QUARTILE = f"""SELECT o_orderkey, o_totalprice,
       ROW_NUMBER() OVER w AS price_rank,
       CAST(NTILE({NTILE_BUCKETS}) OVER w AS BIGINT) AS quartile
FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey)"""


ANALYTICS_QUERIES["events_cumsum"] = q_events_cumsum
ANALYTICS_QUERIES["orders_price_quartile"] = q_orders_price_quartile
ANALYTICS_SQL["events_cumsum"] = SQL_EVENTS_CUMSUM
ANALYTICS_SQL["orders_price_quartile"] = SQL_ORDERS_PRICE_QUARTILE


# ------------------------------------------------- string-key join


def q_docs_source_enriched(sf_dir: str) -> Dataset:
    """STRING-key shuffle join (fact x derived aggregate): every doc
    enriched with its source's corpus stats. The aggregate side builds
    with per-batch partials (tiny — one row per source per block); the
    join buckets both sides on the stable string hash and
    dictionary-encodes within each bucket (joins.hash_join string-key
    path) — exact string equality, no hash false positives, and the
    fact side never ships anything but its own rows once."""
    import ray.data

    from .joins import hash_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"source": df["source"], "n_src_docs": 1,
                          "src_chars": df["n_chars"]})
            .groupby("source", sort=False).sum().reset_index()
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).agg(
            n_src_docs=("n_src_docs", "sum"), src_chars=("src_chars", "sum")
        ).reset_index()
        g["n_src_docs"] = g["n_src_docs"].astype(np.int64)
        g["src_chars"] = g["src_chars"].astype(np.int64)
        return g

    per_source = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(merge, batch_format="pandas")
    )
    return hash_join(
        docs.select_columns(["doc_id", "source"]), per_source,
        key="source", right_columns=["n_src_docs", "src_chars"],
        n_buckets=16,
    )


SQL_DOCS_SOURCE_ENRICHED = """SELECT d.doc_id, d.source,
       s.n_src_docs, s.src_chars
FROM documents d JOIN (
  SELECT source, COUNT(*) AS n_src_docs,
         CAST(SUM(n_chars) AS BIGINT) AS src_chars
  FROM documents GROUP BY source
) s USING (source)"""


ANALYTICS_QUERIES["docs_source_enriched"] = q_docs_source_enriched
ANALYTICS_SQL["docs_source_enriched"] = SQL_DOCS_SOURCE_ENRICHED


# --------------------------------------------------- explode / unnest


def q_doc_tokens_exploded(sf_dir: str) -> Dataset:
    """Explode (SQL UNNEST WITH ORDINALITY): one output row per token
    with its 1-based in-doc position — the row-expansion operator shape
    (flat_map) every text pipeline needs between doc-grain and
    token-grain stages. Map-only: the expansion happens inside each
    batch (repeat-gather for doc_ids, one vectorized ragged-range for
    the ordinality), so blocks grow but never shuffle."""
    import itertools

    import ray.data

    from ..mining_core import _range_gather

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def explode(df: pd.DataFrame) -> pa.Table:
        pieces = df["text"].str.split(" ")
        cnt = pieces.str.len().to_numpy(np.int64)
        doc_ids = np.repeat(df["doc_id"].to_numpy(np.int64), cnt)
        toks = list(itertools.chain.from_iterable(pieces))
        idx = _range_gather(np.ones(len(cnt), np.int64), cnt)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "token": pa.array(toks, pa.string()),
            "idx": pa.array(idx, pa.int64()),
        })

    return docs.map_batches(explode, batch_format="pandas")


SQL_DOC_TOKENS_EXPLODED = """SELECT doc_id,
       unnest(string_split(text, ' ')) AS token,
       generate_subscripts(string_split(text, ' '), 1) AS idx
FROM documents"""


ANALYTICS_QUERIES["doc_tokens_exploded"] = q_doc_tokens_exploded
ANALYTICS_SQL["doc_tokens_exploded"] = SQL_DOC_TOKENS_EXPLODED


# ------------------------------------------------ HLL distinct sketch


def q_events_hll_users(sf_dir: str) -> pa.Table:
    """Approximate distinct users per event type via the mergeable
    HyperLogLog sketch (pipelines/sketches.py) — the constant-exchange
    scale path beside the exact operator (events_distinct_users): at
    most 1024 register rows per key per block move, independent of id
    cardinality. Deterministic (stable SipHash registers, max-merge
    associative), so the committed VALUES golden is an exact oracle;
    accuracy vs the exact count is separately tested (~3% at m=1024)."""
    import ray.data

    from .sketches import hll_distinct

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    df = (
        hll_distinct(ev, "event_type", "user_id")
        .to_pandas()  # one row per event type
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return pa.table({
        "event_type": pa.array(df["event_type"].astype(str), pa.string()),
        "est": pa.array(df["est"].to_numpy(np.int64), pa.int64()),
    })


ANALYTICS_QUERIES["events_hll_users"] = q_events_hll_users


# ------------------------------------- pricing summary (TPC-H Q1 shape)


def q_lineitem_pricing(sf_dir: str) -> pd.DataFrame:
    """Multi-aggregate GROUP BY report (the TPC-H Q1 shape): per
    (returnflag, linestatus) sums/averages/count over lineitem. ONE
    distributed pass of per-batch partials (<= |flags|x|statuses| rows
    leave each block) then a tiny keyed merge; all money/qty sums
    accumulate in INTEGER units (cents, 1e-4 and 1e-6 dollars), so the
    result is order-independent and hash-exact vs SQL, and every
    published float is ONE IEEE division of exact ints (bit-identical
    on both sides). int64 headroom: per-row charge units are < 1e11, so
    a block stays exact to ~7e7 rows and the global sum to ~9e16 rows
    per group; beyond that this kernel would overflow int64 silently --
    the upgrade is decimal128 partials (Arrow carries them natively) or
    splitting the sum into (quotient, remainder) columns, NOT
    implemented here because the sandbox inputs sit 10 orders below the
    edge."""
    import ray.data

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
    )
    keys = ["l_returnflag", "l_linestatus"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qty = np.floor(
            df["l_quantity"].to_numpy(np.float64) + 0.5
        ).astype(np.int64)
        price_c = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        disc_c = np.floor(
            df["l_discount"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        tax_c = np.floor(
            df["l_tax"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        disc_e4 = price_c * (100 - disc_c)
        return (
            pd.DataFrame({
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "qty": qty,
                "price_c": price_c,
                "disc_e4": disc_e4,
                "charge_e6": disc_e4 * (100 + tax_c),
                "disc_c": disc_c,
                "n": 1,
            })
            .groupby(keys, sort=False).sum().reset_index()
        )

    agg = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .map_groups(
            lambda df: df.groupby(keys, sort=False).sum().reset_index(),
            batch_format="pandas",
        )
        .to_pandas()  # aggregate-sized: |flags| x |statuses| rows
        .sort_values(keys)
        .reset_index(drop=True)
    )
    n = agg["n"].to_numpy(np.int64)
    out = pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "l_linestatus": agg["l_linestatus"],
        "sum_qty": agg["qty"].to_numpy(np.int64),
        "sum_base_price": agg["price_c"].to_numpy(np.int64) / 100.0,
        "sum_disc_price": agg["disc_e4"].to_numpy(np.int64) / 1e4,
        "sum_charge": agg["charge_e6"].to_numpy(np.int64) / 1e6,
        "avg_qty": agg["qty"].to_numpy(np.int64).astype(np.float64) / n,
        "avg_price": (
            agg["price_c"].to_numpy(np.int64).astype(np.float64) / 100.0 / n
        ),
        "avg_disc": (
            agg["disc_c"].to_numpy(np.int64).astype(np.float64) / 100.0 / n
        ),
        "count_order": n,
    })
    return out


# Every float mirrors the engine bit-for-bit: the same integer-unit sum
# followed by the same division(s).
SQL_LINEITEM_PRICING = """SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
    / 100.0 AS sum_base_price,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)))
       AS DOUBLE) / 1e4 AS sum_disc_price,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
           * (100 + CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)))
       AS DOUBLE) / 1e6 AS sum_charge,
  CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS DOUBLE)
    / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
    / 100.0 / COUNT(*) AS avg_price,
  CAST(SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE)
    / 100.0 / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus"""


ANALYTICS_QUERIES["lineitem_pricing"] = q_lineitem_pricing
ANALYTICS_SQL["lineitem_pricing"] = SQL_LINEITEM_PRICING


# --------------------------------------------- hopping (sliding) window

HOP_US = 6 * 3600 * 1_000_000  # 6-hour hop
HOP_WINDOW_US = 2 * HOP_US     # 12-hour windows -> each event in exactly 2


def q_events_hopping(sf_dir: str) -> Dataset:
    """Hopping-window aggregate (width = 2 x hop): per (event_type,
    window_start) event count and exact cent-unit value sum. Each event
    belongs to exactly TWO windows (k = floor(ts/hop) and k-1), so the
    replication is a constant-factor in-batch expansion — blocks grow
    2x, nothing reshuffles until the tiny per-(type, window) partials.
    The tumbling window (events_windowed) is the degenerate width=hop
    case of this plan; wider windows replicate width/hop times, still
    map-only before the aggregate-sized keyed merge."""
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        k = np.floor_divide(us, HOP_US)
        v_c = np.floor(
            df["value"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        et = df["event_type"].to_numpy()
        # window k covers [k*hop, k*hop + 2*hop): event at t is in
        # windows floor(t/hop) and floor(t/hop)-1, always both
        return (
            pd.DataFrame({
                "event_type": np.concatenate([et, et]),
                "window_start_us": np.concatenate([k, k - 1]) * HOP_US,
                "n_events": 1,
                "value_c": np.concatenate([v_c, v_c]),
            })
            .groupby(["event_type", "window_start_us"], sort=False)
            .sum().reset_index()
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "window_start_us"], sort=False).agg(
            n_events=("n_events", "sum"), value_c=("value_c", "sum")
        ).reset_index()
        g["n_events"] = g["n_events"].astype(np.int64)
        g["sum_value"] = g["value_c"].to_numpy(np.int64) / 100.0
        return g[["event_type", "window_start_us", "n_events", "sum_value"]]

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "window_start_us"])
        .map_groups(merge, batch_format="pandas")
    )


SQL_EVENTS_HOPPING = f"""WITH ks AS (
  SELECT event_type,
         CAST(FLOOR(epoch_us(ts) / {HOP_US}) AS BIGINT) AS k,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
), both_windows AS (
  SELECT event_type, k AS w, v_c FROM ks
  UNION ALL
  SELECT event_type, k - 1 AS w, v_c FROM ks
)
SELECT event_type, w * {HOP_US} AS window_start_us,
       COUNT(*) AS n_events,
       CAST(SUM(v_c) AS DOUBLE) / 100.0 AS sum_value
FROM both_windows
GROUP BY event_type, w"""


ANALYTICS_QUERIES["events_hopping"] = q_events_hopping
ANALYTICS_SQL["events_hopping"] = SQL_EVENTS_HOPPING


# ------------------------------------------- regex scrub (PII-redaction shape)

# the redaction target: standalone single-letter 'a' / article 'the' --
# the pattern class (word-boundary alternation) is exactly what an
# email/phone PII scrub compiles; the synthetic corpus has no PII, so
# the demo pattern targets words that actually occur
SCRUB_PATTERN = r"\b(?:a|the)\b"


def q_doc_scrub(sf_dir: str) -> Dataset:
    """Regex scrub / PII-redaction shape: map-only pass that deletes
    every match of a compiled pattern from each document and reports
    the per-doc clean length and match count. The pattern compiles ONCE
    per actor (callable-class stage), the scan is pandas' vectorized
    str kernels over the batch -- no per-row Python, no shuffle, and
    only (doc_id, counts) leave the stage (the scrubbed text itself
    would be written to a sink in a real redaction run)."""
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    class Scrubber:
        def __init__(self):
            import re

            self.pat = re.compile(SCRUB_PATTERN)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            s = df["text"].astype(str)
            # the COMPILED pattern, so no per-call re-resolution
            n_hits = s.str.count(self.pat).astype(np.int64)
            clean = s.str.replace(self.pat, "", regex=True)
            return pd.DataFrame({
                "doc_id": df["doc_id"].astype(np.int64),
                "n_redacted": n_hits,
                "clean_chars": clean.str.len().astype(np.int64),
            })

    # pool sized BELOW the cluster CPU count so upstream read tasks
    # always have a slot (an actor pool that reserves every CPU
    # deadlocks the streaming executor on small test clusters)
    return docs.map_batches(
        Scrubber, concurrency=2, num_cpus=1, batch_format="pandas"
    )


SQL_DOC_SCRUB = rf"""SELECT doc_id,
  CAST(LENGTH(regexp_extract_all(text, '{SCRUB_PATTERN}')) AS BIGINT)
    AS n_redacted,
  CAST(LENGTH(REGEXP_REPLACE(text, '{SCRUB_PATTERN}', '', 'g')) AS BIGINT)
    AS clean_chars
FROM documents"""


ANALYTICS_QUERIES["doc_scrub"] = q_doc_scrub
ANALYTICS_SQL["doc_scrub"] = SQL_DOC_SCRUB


# -------------------------------- log-histogram quantile sketch query


def q_events_value_quantiles(sf_dir: str) -> Dataset:
    """Approximate p50/p95/p99 of event value per type via the
    mergeable log-histogram sketch (pipelines/sketches.py) — the
    constant-exchange scale path beside the exact grouped percentile
    (docs_median_chars): <= (octaves x 32) count rows per key per
    block move, independent of value cardinality. Bin assignment is
    integer-exact, so the SQL restatement of the same binning is a
    hash-exact oracle; the <= 1/32 relative error bound vs the TRUE
    quantile is separately tested."""
    import ray.data

    from .sketches import log_histogram_quantiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return log_histogram_quantiles(ev, "event_type", "value")


def _qsk_rep(q: str) -> str:
    from .sketches import QSK_SUB

    return (f"MIN(CASE WHEN cum >= CEIL({q} * tot) THEN "
            f"POW(2.0, e) * (1.0 + j / {QSK_SUB}.0) / 100.0 END)")


from .sketches import QSK_SUB as _QSK_SUB  # noqa: E402

SQL_EVENTS_VALUE_QUANTILES = f"""WITH c AS (
  SELECT event_type,
         GREATEST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT), 1) AS v_c
  FROM events
), b AS (
  SELECT event_type, CAST(FLOOR(LOG2(v_c + 0.5)) AS BIGINT) AS e, v_c
  FROM c
), bins AS (
  SELECT event_type, e,
         CAST(FLOOR((v_c - POW(2.0, e)) * {_QSK_SUB} / POW(2.0, e)) AS BIGINT) AS j,
         COUNT(*) AS n
  FROM b GROUP BY event_type, e, j
), r AS (
  SELECT event_type, e, j, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY e, j
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM bins
)
SELECT event_type,
  {_qsk_rep('0.5')} AS p50,
  {_qsk_rep('0.95')} AS p95,
  {_qsk_rep('0.99')} AS p99
FROM r GROUP BY event_type"""


ANALYTICS_QUERIES["events_value_quantiles"] = q_events_value_quantiles
ANALYTICS_SQL["events_value_quantiles"] = SQL_EVENTS_VALUE_QUANTILES


# ------------------------------------ Count-Min frequency sketch query

CM_QUERY_USERS = list(range(20))  # fixed query set: user ids 0..19


def q_events_user_cm(sf_dir: str) -> pd.DataFrame:
    """Approximate per-user event counts for a fixed query set via the
    mergeable Count-Min sketch (pipelines/sketches.py): <= 4 x 2048
    cells move regardless of user cardinality, and the md5 placement
    lets the SQL oracle restate the exact same sketch — a hash-exact
    oracle for an approximate operator (overestimate-only error is
    separately bound-tested)."""
    import ray.data

    from .sketches import cm_frequencies

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    )
    out = cm_frequencies(ev, "user_id", [str(u) for u in CM_QUERY_USERS])
    return pd.DataFrame({
        "user_id": np.array(CM_QUERY_USERS, np.int64),
        "est": out["est"].to_numpy(np.int64),
    })


from .sketches import CM_D as _CM_D, CM_W as _CM_W  # noqa: E402

_CM_POS = ("CAST(concat('0x', substr(md5(CAST({r} AS VARCHAR) || '|' || "
           "CAST({k} AS VARCHAR)), 1, 8)) AS UBIGINT) % " + str(_CM_W))

SQL_EVENTS_USER_CM = f"""WITH pos AS (
  SELECT t.r, {_CM_POS.format(r='t.r', k='user_id')} AS p
  FROM events, range({_CM_D}) t(r)
), cells AS (
  SELECT r, p, COUNT(*) AS n FROM pos GROUP BY r, p
), q AS (
  SELECT u.user_id, t.r,
         {_CM_POS.format(r='t.r', k='u.user_id')} AS p
  FROM range({len(CM_QUERY_USERS)}) u(user_id), range({_CM_D}) t(r)
)
SELECT q.user_id,
       CAST(MIN(COALESCE(cells.n, 0)) AS BIGINT) AS est
FROM q LEFT JOIN cells ON q.r = cells.r AND q.p = cells.p
GROUP BY q.user_id"""


ANALYTICS_QUERIES["events_user_cm"] = q_events_user_cm
ANALYTICS_SQL["events_user_cm"] = SQL_EVENTS_USER_CM


# --------------------------------------- grouped embedding centroids


def q_embed_centroids(sf_dir: str) -> Dataset:
    """Per-label embedding centroids (class centroids for semantic
    dedup / prototype classification): per-batch partials sum each
    label's vectors with one einsum over the zero-copy fixed-width
    matrix view — dim rows per label per block move, never the vectors
    — then a tiny keyed merge divides sums by counts. Output is long
    form (label, pos, centroid) so the oracle compares scalars, not
    arrays; 6-dp round on both sides absorbs partial-order float
    drift (sums are ~1e1 over <= 1e3 rows, error ~1e-14)."""
    import ray.data

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(t.num_rows, -1)
        labs = t["label"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labs, return_inverse=True)
        onehot = np.zeros((len(uniq), t.num_rows))
        onehot[inv, np.arange(t.num_rows)] = 1.0
        sums = onehot @ mat  # (labels, dim)
        cnts = onehot.sum(1).astype(np.int64)
        dim = mat.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim).astype(np.int64)),
            "pos": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                    len(uniq))),
            "s": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(cnts, dim)),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["label", "pos"], sort=False).agg(
            s=("s", "sum"), n=("n", "sum")
        ).reset_index()
        return pd.DataFrame({
            "label": g["label"].astype(np.int64),
            "pos": g["pos"].astype(np.int64),
            "centroid": np.round(
                g["s"].to_numpy(np.float64) / g["n"].to_numpy(np.float64), 6
            ),
        })

    return (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "pos"])
        .map_groups(merge, batch_format="pandas")
    )


SQL_EMBED_CENTROIDS = """SELECT label,
       CAST(pos AS BIGINT) AS pos,
       ROUND(SUM(CAST(v AS DOUBLE)) / COUNT(*), 6) AS centroid
FROM (
  SELECT CAST(label AS BIGINT) AS label,
         generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS v
  FROM embeddings
)
GROUP BY label, pos"""


ANALYTICS_QUERIES["embed_centroids"] = q_embed_centroids
ANALYTICS_SQL["embed_centroids"] = SQL_EMBED_CENTROIDS


# ------------------------------------- global z-score feature scaling


def q_orders_price_zscore(sf_dir: str) -> Dataset:
    """Global z-score normalization (the feature-scaling stage of every
    tabular ML pipeline): two passes, both streaming — (1) per-batch
    (n, sum, sumsq) partials in integer cents (EXACT, order-independent
    — float moment sums would drift across block orders), merged on the
    driver into one tiny stats tuple; (2) a map-only normalize against
    the broadcast stats. Population std; 6-dp round on both sides
    absorbs the one float divide/sqrt difference chain."""
    import ray.data

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def stats_partial(t: pa.Table) -> pa.Table:
        c = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table({
            "n": pa.array([len(c)], pa.int64()),
            "s": pa.array([int(c.sum())], pa.int64()),
            "ss": pa.array([int((c * c).sum())], pa.int64()),
        })

    parts = orders.map_batches(
        stats_partial, batch_format="pyarrow"
    ).take_all()  # one tiny row per block
    n = sum(p["n"] for p in parts)
    s = sum(p["s"] for p in parts)      # Python ints: no overflow
    ss = sum(p["ss"] for p in parts)
    # mirror the oracle's CAST(SUM AS DOUBLE)/COUNT exactly: round the
    # (possibly > 2^53) integer sums to double FIRST, then divide —
    # Python's exact-bigint division would differ in the last bits
    mean_c = float(s) / n
    var_c = float(ss) / n - mean_c * mean_c  # population variance
    std_c = float(np.sqrt(var_c))

    def normalize(t: pa.Table) -> pa.Table:
        c = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        z = np.round((c - mean_c) / std_c, 6)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "z": pa.array(z, pa.float64()),
        })

    return orders.map_batches(normalize, batch_format="pyarrow")


# the oracle restates the same integer-cents moments so mean/std are
# bit-identical, then the same (c - mean)/std chain
SQL_ORDERS_PRICE_ZSCORE = """WITH c AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders
), st AS (
  SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_c,
         SQRT(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)
              - (CAST(SUM(v) AS DOUBLE) / COUNT(*))
                * (CAST(SUM(v) AS DOUBLE) / COUNT(*))) AS std_c
  FROM c
)
SELECT o_orderkey, ROUND((v - mean_c) / std_c, 6) AS z
FROM c, st"""


ANALYTICS_QUERIES["orders_price_zscore"] = q_orders_price_zscore
ANALYTICS_SQL["orders_price_zscore"] = SQL_ORDERS_PRICE_ZSCORE


# ------------------------------------ snapshot diff / churn (CDC shape)

CHURN_DAY_A = "2024-01-05"
CHURN_DAY_B = "2024-01-20"


def q_user_churn(sf_dir: str) -> Dataset:
    """Snapshot diff (the change-data-capture shape: compare two
    versions of a keyed set and emit added/dropped/retained): users
    active on day A vs day B. Per-batch DISTINCT (user, side) partials
    collapse each block to at most 2 rows per user BEFORE the one keyed
    exchange; the status derives per user from side presence — no
    full-outer join of row-level data, no driver materialization."""
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    day_a = np.datetime64(CHURN_DAY_A, "D").astype(np.int64)
    day_b = np.datetime64(CHURN_DAY_B, "D").astype(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        days = df["ts"].to_numpy(dtype="datetime64[D]").astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        keep = (days == day_a) | (days == day_b)
        out = pd.DataFrame({
            "user_id": uid[keep],
            "on_a": (days[keep] == day_a).astype(np.int64),
            "on_b": (days[keep] == day_b).astype(np.int64),
        })
        return out.groupby("user_id", sort=False).max().reset_index()

    def status(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False).max().reset_index()
        a = g["on_a"].to_numpy(bool)
        b = g["on_b"].to_numpy(bool)
        return pd.DataFrame({
            "user_id": g["user_id"].astype(np.int64),
            "status": np.where(a & b, "retained",
                               np.where(a, "dropped", "added")),
        })

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .map_groups(status, batch_format="pandas")
    )


SQL_USER_CHURN = f"""WITH d AS (
  SELECT user_id,
         MAX(CAST(ts AS DATE) = DATE '{CHURN_DAY_A}') AS on_a,
         MAX(CAST(ts AS DATE) = DATE '{CHURN_DAY_B}') AS on_b
  FROM events
  WHERE CAST(ts AS DATE) = DATE '{CHURN_DAY_A}'
     OR CAST(ts AS DATE) = DATE '{CHURN_DAY_B}'
  GROUP BY user_id
)
SELECT user_id,
       CASE WHEN on_a AND on_b THEN 'retained'
            WHEN on_a THEN 'dropped'
            ELSE 'added' END AS status
FROM d"""


ANALYTICS_QUERIES["user_churn"] = q_user_churn
ANALYTICS_SQL["user_churn"] = SQL_USER_CHURN
