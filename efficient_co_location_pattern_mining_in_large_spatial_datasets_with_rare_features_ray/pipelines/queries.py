"""Driver-facing query registry (consumed by __ray_entry__.py).

One entry per operator/pipeline from SURVEY.md sec. 2, each paired where
possible with an exact ANSI-SQL oracle over the same parquet tables so
the DuckDB correctness gate can hash-compare results. Column names are
kept identical between the Ray pipelines and the SQL.

The co-location family runs over a deterministic projection of the
``events`` table (sources/instances.py); parameters are fixed
(d = COLO_D, min_prev = COLO_MIN_PREV) so results are reproducible at
any scale factor.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..canonical import FeatureContext
from ..config import MiningConfig
from ..sources.instances import EVENTS_INSTANCES_SQL, instances_from_events
from ..stages.grid import assign_cells, global_origin
from ..stages.pairs import neighbor_pairs
from ..stages.stars import ordered_edges
from . import colocation, k2

COLO_D = 6.0
COLO_MIN_PREV = 0.15


def _cfg() -> MiningConfig:
    return MiningConfig(neighbor_distance=COLO_D, min_prevalence=COLO_MIN_PREV)


def _ctx(instances: Dataset) -> FeatureContext:
    return colocation.make_context(instances)


# ----- Ray pipelines ------------------------------------------------------

def q_instances(sf_dir: str) -> Dataset:
    return instances_from_events(sf_dir)


def q_feature_counts(sf_dir: str) -> Dataset:
    ds = instances_from_events(sf_dir).groupby("feature").count()
    return ds.map_batches(
        lambda t: t.rename_columns(["feature", "n"]), batch_format="pyarrow"
    )


def q_cell_assign(sf_dir: str) -> Dataset:
    inst = instances_from_events(sf_dir)
    origin = global_origin(inst)
    ds = assign_cells(inst, COLO_D, origin)
    return ds.select_columns(["instance_id", "feature", "cell_x", "cell_y"])


def q_neighbor_pairs(sf_dir: str) -> Dataset:
    return neighbor_pairs(instances_from_events(sf_dir), _cfg())


def q_ordered_edges(sf_dir: str) -> Dataset:
    inst = instances_from_events(sf_dir)
    ctx = _ctx(inst)
    return ordered_edges(neighbor_pairs(inst, _cfg()), ctx)


def q_star_sizes(sf_dir: str) -> Dataset:
    edges = q_ordered_edges(sf_dir)
    ds = edges.groupby(["center_id", "nbr_feature"]).count()
    return ds.map_batches(
        lambda t: t.rename_columns(["center_id", "nbr_feature", "n_nbrs"]),
        batch_format="pyarrow",
    )


def q_patterns_k2(sf_dir: str) -> pa.Table:
    inst = instances_from_events(sf_dir)
    return k2.k2_metrics(inst, _cfg(), _ctx(inst))


def _patterns_out(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "pattern": t["pattern"],
            "k": t["k"],
            "wpi": pc.round(t["wpi"], ndigits=9),
            "pi": pc.round(t["pi"], ndigits=9),
            "n_rows": t["n_rows"],
        }
    ).sort_by([("k", "ascending"), ("pattern", "ascending")])


def q_patterns_full(sf_dir: str) -> pa.Table:
    """Full multi-level WPI mining, subtree-partitioned mode. Hash-checked
    in the driver against the unrolled k<=3 apriori SQL oracle
    (sql_patterns_full -- exact at the driver's fixed (d, mp), see
    COLO_SQL note); general-k conformance is pytest's engine-vs-oracle
    gate plus the LasVegas golden."""
    inst = instances_from_events(sf_dir)
    run = colocation.mine(inst, _cfg())
    return _patterns_out(run.patterns_table())


def q_patterns_salted(sf_dir: str) -> pa.Table:
    """Same mining via the root-instance-sharded (salted) coordinated
    mode -- must emit the identical table as colo_patterns."""
    inst = instances_from_events(sf_dir)
    run = colocation.mine_coordinated(inst, _cfg())
    return _patterns_out(run.patterns_table())


# ----- DuckDB oracles -----------------------------------------------------

_INST = f"inst AS ({EVENTS_INSTANCES_SQL})"


def _pairs_sql(d: float) -> str:
    return f"""pairs AS (
  SELECT a.instance_id AS a_id, a.feature AS a_feature,
         b.instance_id AS b_id, b.feature AS b_feature
  FROM inst a JOIN inst b
    ON b.x >= a.x - {d} AND b.x <= a.x + {d}
   AND b.y >= a.y - {d} AND b.y <= a.y + {d}
   AND a.instance_id < b.instance_id
  WHERE a.feature <> b.feature
    AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {d * d}
)"""


_PAIRS = f"""pairs AS (
  SELECT a.instance_id AS a_id, a.feature AS a_feature,
         b.instance_id AS b_id, b.feature AS b_feature
  FROM inst a JOIN inst b
    ON b.x >= a.x - {COLO_D} AND b.x <= a.x + {COLO_D}
   AND b.y >= a.y - {COLO_D} AND b.y <= a.y + {COLO_D}
   AND a.instance_id < b.instance_id
  WHERE a.feature <> b.feature
    AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {COLO_D * COLO_D}
)"""

_COUNTS = "counts AS (SELECT feature, CAST(count(*) AS DOUBLE) AS n FROM inst GROUP BY feature)"

SQL_INSTANCES = f"WITH {_INST} SELECT * FROM inst"

SQL_FEATURE_COUNTS = (
    f"WITH {_INST} SELECT feature, count(*) AS n FROM inst GROUP BY feature"
)

SQL_CELL_ASSIGN = f"""WITH {_INST},
o AS (SELECT min(x) AS ox, min(y) AS oy FROM inst)
SELECT instance_id, feature,
       CAST(floor((x - o.ox) / {COLO_D}) AS BIGINT) AS cell_x,
       CAST(floor((y - o.oy) / {COLO_D}) AS BIGINT) AS cell_y
FROM inst, o"""

SQL_NEIGHBOR_PAIRS = f"WITH {_INST}, {_PAIRS} SELECT * FROM pairs"

_DIRECTED = """directed AS (
  SELECT CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN a_id ELSE b_id END AS center_id,
         CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN a_feature ELSE b_feature END AS center_feature,
         CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN b_id ELSE a_id END AS nbr_id,
         CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN b_feature ELSE a_feature END AS nbr_feature
  FROM pairs
  JOIN counts ca ON ca.feature = a_feature
  JOIN counts cb ON cb.feature = b_feature
)"""

SQL_ORDERED_EDGES = f"WITH {_INST}, {_COUNTS}, {_PAIRS}, {_DIRECTED} SELECT * FROM directed"

SQL_STAR_SIZES = f"""WITH {_INST}, {_COUNTS}, {_PAIRS}, {_DIRECTED}
SELECT center_id, nbr_feature, count(*) AS n_nbrs
FROM directed GROUP BY center_id, nbr_feature"""

SQL_PATTERNS_K2 = f"""WITH {_INST}, {_COUNTS}, {_PAIRS},
m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM counts),
ranked AS (SELECT feature, n, row_number() OVER (ORDER BY n, feature) AS rk FROM counts),
delta AS (
  SELECT 2.0 / (m.m * (m.m - 1.0))
         * (SELECT sum(b.n / a.n) FROM ranked a JOIN ranked b ON b.rk > a.rk)
         AS delta
  FROM m
),
canon AS (
  SELECT CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN a_feature ELSE b_feature END AS f1,
         CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN b_feature ELSE a_feature END AS f2,
         CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN a_id ELSE b_id END AS id1,
         CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN b_id ELSE a_id END AS id2
  FROM pairs
  JOIN counts ca ON ca.feature = a_feature
  JOIN counts cb ON cb.feature = b_feature
),
agg AS (
  SELECT f1, f2, count(*) AS n_rows,
         count(DISTINCT id1) AS d1, count(DISTINCT id2) AS d2
  FROM canon GROUP BY f1, f2
),
met AS (
  SELECT f1 || ',' || f2 AS pattern, CAST(2 AS INTEGER) AS k, n_rows,
         d1 / c1.n AS pr1, d2 / c2.n AS pr2,
         CASE WHEN delta.delta <= 1e-9 THEN 0.0
              ELSE exp(-pow(c1.n / least(c1.n, c2.n) - 1.0, 2)
                       / (2.0 * delta.delta * delta.delta)) END AS ri1,
         CASE WHEN delta.delta <= 1e-9 THEN 0.0
              ELSE exp(-pow(c2.n / least(c1.n, c2.n) - 1.0, 2)
                       / (2.0 * delta.delta * delta.delta)) END AS ri2
  FROM agg
  JOIN counts c1 ON c1.feature = f1
  JOIN counts c2 ON c2.feature = f2, delta
)
SELECT pattern, k, n_rows,
       round(least(pr1, pr2), 9) AS pi,
       round(least(CASE WHEN ri1 > 1e-9 THEN pr1 / ri1 ELSE 0.0 END,
                   CASE WHEN ri2 > 1e-9 THEN pr2 / ri2 ELSE 0.0 END), 9) AS wpi
FROM met"""


def sql_patterns_full(d: float = COLO_D, mp: float = COLO_MIN_PREV) -> str:
    """Unrolled apriori-level SQL oracle for the FULL mining output
    (prevalent patterns of every size), exact whenever the maximal
    prevalent pattern has k <= 3 -- which holds for the driver's fixed
    (d = COLO_D, mp = COLO_MIN_PREV) on the testdata projection (all
    prevalent patterns are k = 2 there, and the k = 3 level in this SQL
    verifies that no spurious k >= 3 pattern is emitted / missed).

    Mirrors the engine level loop (mining_core.mine_local) exactly:
    * k2 candidates = all cross-type pairs; emit iff WPI >= mp
      (src/miner.cpp:382-430 epsilon-weight branch).
    * k3 candidates = apriori-gen join of prevalent k2s sharing their
      first (rarest) feature, last features in canonical (count asc,
      lex) order (src/miner.cpp:102-149); Lemma-2's drop!=0 subsets are
      the two generators themselves at k=3, so no extra filter.
    * k3 table instances = T2 rows extended by the shared ordered
      neighbor (findExtendedSet, src/miner.cpp:264-310) == triangle
      join over the ordered edge relation.
    Validated against the engine at (d=40, mp=0.15) on sf0.001 where
    ten k=3 patterns exist (tests/test_flagship_sql.py)."""
    return f"""WITH {_INST}, {_COUNTS}, {_pairs_sql(d)},
m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM counts),
ranked AS (SELECT feature, n, row_number() OVER (ORDER BY n, feature) AS rk FROM counts),
delta AS (
  SELECT 2.0 / (m.m * (m.m - 1.0))
         * (SELECT sum(b.n / a.n) FROM ranked a JOIN ranked b ON b.rk > a.rk)
         AS delta
  FROM m
),
directed AS (
  SELECT CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN a_id ELSE b_id END AS center_id,
         CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN a_feature ELSE b_feature END AS center_feature,
         CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN b_id ELSE a_id END AS nbr_id,
         CASE WHEN ca.n < cb.n OR (ca.n = cb.n AND a_feature <= b_feature)
              THEN b_feature ELSE a_feature END AS nbr_feature
  FROM pairs
  JOIN counts ca ON ca.feature = a_feature
  JOIN counts cb ON cb.feature = b_feature
),
agg2 AS (
  SELECT center_feature AS f1, nbr_feature AS f2, count(*) AS n_rows,
         count(DISTINCT center_id) AS d1, count(DISTINCT nbr_id) AS d2
  FROM directed GROUP BY 1, 2
),
met2 AS (
  SELECT f1, f2, n_rows,
         d1 / c1.n AS pr1, d2 / c2.n AS pr2,
         CASE WHEN delta.delta <= 1e-9 THEN 0.0
              ELSE exp(-pow(c1.n / least(c1.n, c2.n) - 1.0, 2)
                       / (2.0 * delta.delta * delta.delta)) END AS ri1,
         CASE WHEN delta.delta <= 1e-9 THEN 0.0
              ELSE exp(-pow(c2.n / least(c1.n, c2.n) - 1.0, 2)
                       / (2.0 * delta.delta * delta.delta)) END AS ri2
  FROM agg2
  JOIN counts c1 ON c1.feature = f1
  JOIN counts c2 ON c2.feature = f2, delta
),
wmet2 AS (
  SELECT f1, f2, n_rows,
         least(pr1, pr2) AS pi,
         least(CASE WHEN ri1 > 1e-9 THEN pr1 / ri1 ELSE 0.0 END,
               CASE WHEN ri2 > 1e-9 THEN pr2 / ri2 ELSE 0.0 END) AS wpi
  FROM met2
),
prev2 AS (SELECT * FROM wmet2 WHERE wpi >= {mp}),
cand3 AS (
  SELECT a.f1 AS f1, a.f2 AS f2, b.f2 AS f3
  FROM prev2 a
  JOIN prev2 b ON a.f1 = b.f1
  JOIN ranked r2 ON r2.feature = a.f2
  JOIN ranked r3 ON r3.feature = b.f2
  WHERE r2.rk < r3.rk
),
t3 AS (
  SELECT c.f1, c.f2, c.f3,
         e12.center_id AS i1, e12.nbr_id AS i2, e13.nbr_id AS i3
  FROM cand3 c
  JOIN directed e12 ON e12.center_feature = c.f1 AND e12.nbr_feature = c.f2
  JOIN directed e13 ON e13.center_id = e12.center_id AND e13.nbr_feature = c.f3
  JOIN directed e23 ON e23.center_id = e12.nbr_id AND e23.nbr_id = e13.nbr_id
),
agg3 AS (
  SELECT f1, f2, f3, count(*) AS n_rows,
         count(DISTINCT i1) AS d1, count(DISTINCT i2) AS d2,
         count(DISTINCT i3) AS d3
  FROM t3 GROUP BY 1, 2, 3
),
met3 AS (
  SELECT f1, f2, f3, n_rows,
         d1 / c1.n AS pr1, d2 / c2.n AS pr2, d3 / c3.n AS pr3,
         c1.n AS n1, c2.n AS n2, c3.n AS n3,
         least(c1.n, c2.n, c3.n) AS mn, delta.delta AS dlt
  FROM agg3
  JOIN counts c1 ON c1.feature = f1
  JOIN counts c2 ON c2.feature = f2
  JOIN counts c3 ON c3.feature = f3, delta
),
wmet3 AS (
  SELECT f1, f2, f3, n_rows,
         least(pr1, pr2, pr3) AS pi,
         least(CASE WHEN ri1 > 1e-9 THEN pr1 / ri1 ELSE 0.0 END,
               CASE WHEN ri2 > 1e-9 THEN pr2 / ri2 ELSE 0.0 END,
               CASE WHEN ri3 > 1e-9 THEN pr3 / ri3 ELSE 0.0 END) AS wpi
  FROM (
    SELECT *,
           CASE WHEN dlt <= 1e-9 THEN 0.0
                ELSE exp(-pow(n1 / mn - 1.0, 2) / (2.0 * dlt * dlt)) END AS ri1,
           CASE WHEN dlt <= 1e-9 THEN 0.0
                ELSE exp(-pow(n2 / mn - 1.0, 2) / (2.0 * dlt * dlt)) END AS ri2,
           CASE WHEN dlt <= 1e-9 THEN 0.0
                ELSE exp(-pow(n3 / mn - 1.0, 2) / (2.0 * dlt * dlt)) END AS ri3
    FROM met3
  )
),
prev3 AS (SELECT * FROM wmet3 WHERE wpi >= {mp})
SELECT f1 || ',' || f2 AS pattern, CAST(2 AS INTEGER) AS k,
       round(wpi, 9) AS wpi, round(pi, 9) AS pi, n_rows
FROM prev2
UNION ALL
SELECT f1 || ',' || f2 || ',' || f3 AS pattern, CAST(3 AS INTEGER) AS k,
       round(wpi, 9) AS wpi, round(pi, 9) AS pi, n_rows
FROM prev3"""


# ----- spatial utility operators (kNN / PIP / raster) ---------------------

KNN_QUERY_IDS = ("0", "1", "2", "3", "4")
KNN_K = 5
RASTER_CELL = 50.0

# axis-aligned regions at .5 offsets (integer point coords never sit on a
# boundary, so ray-casting and BETWEEN agree exactly); first match wins
PIP_RECTS = {
    "r_a": (100.5, 100.5, 400.5, 400.5),
    "r_b": (300.5, 300.5, 700.5, 650.5),
    "r_c": (750.5, 50.5, 950.5, 250.5),
}


def q_knn(sf_dir: str) -> Dataset:
    from ..stages import spatial_ops

    inst = instances_from_events(sf_dir)
    qset = set(KNN_QUERY_IDS)
    qpts = inst.map_batches(
        lambda df: df[df["instance_id"].isin(qset)].rename(
            columns={"instance_id": "query_id"}
        )[["query_id", "x", "y"]],
        batch_format="pandas",
    )
    out = spatial_ops.knn(inst, qpts, k=KNN_K + 1)
    # exclude the query point itself (dist 0 rank 1), rerank 1..k

    def strip_self(t):
        import pandas as pd

        df = t if isinstance(t, pd.DataFrame) else t.to_pandas()
        df = df[df["nbr_id"] != df["query_id"]].copy()
        df["rank"] = df.groupby("query_id")["rank"].rank(method="first").astype("int32")
        return df[df["rank"] <= KNN_K]

    return out.map_batches(strip_self, batch_format="pandas")


def q_pip(sf_dir: str) -> Dataset:
    from ..stages import spatial_ops

    polys = {
        name: [(x1, y1), (x2, y1), (x2, y2), (x1, y2)]
        for name, (x1, y1, x2, y2) in PIP_RECTS.items()
    }
    return spatial_ops.tag_polygons(instances_from_events(sf_dir), polys)


def q_rasterize(sf_dir: str) -> Dataset:
    from ..stages import spatial_ops

    return spatial_ops.rasterize(instances_from_events(sf_dir), RASTER_CELL)


def q_raster_boxes(sf_dir: str) -> Dataset:
    from ..stages import spatial_ops

    r = spatial_ops.rasterize(instances_from_events(sf_dir), RASTER_CELL)
    return spatial_ops.cells_to_boxes(r, RASTER_CELL)


def q_events_windowed(sf_dir: str) -> Dataset:
    import numpy as np
    import pandas as pd
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["ts"].dt.floor("h")
        g = pd.DataFrame(
            {"event_type": df["event_type"], "window_start": w,
             "n": 1, "sum_value": df["value"]}
        ).groupby(["event_type", "window_start"], sort=False).sum().reset_index()
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "window_start"], sort=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        ).reset_index()
        g["sum_value"] = np.round(g["sum_value"], 6)
        return g

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "window_start"])
        .map_groups(merge, batch_format="pandas")
    )


SESSION_GAP_MIN = 30


def q_events_sessions(sf_dir: str) -> Dataset:
    """Sessionization: per user, order events by (ts, event_id) and cut a
    new session whenever the gap to the previous event exceeds
    SESSION_GAP_MIN minutes. Stream-shaped op per the Ray guide: events
    treated as a keyed, ts-sorted log; windows computed per user group
    with vectorized pandas."""
    import numpy as np
    import pandas as pd
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        new = df["ts"].diff() > gap
        # NaT > gap is False (not NaN), so set the first row explicitly
        new.iloc[0] = True
        df["session_id"] = new.cumsum().astype(np.int64)
        g = df.groupby("session_id", sort=True).agg(
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
        ).reset_index()
        g.insert(0, "user_id", df["user_id"].iloc[0])
        return g

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas")


SQL_EVENTS_SESSIONS = f"""WITH ordered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts
FROM sess GROUP BY user_id, session_id"""


ASOF_LEFT_TYPE = "purchase"
ASOF_RIGHT_TYPE = "click"


def q_events_asof(sf_dir: str) -> Dataset:
    """Point-in-time (as-of) join: each purchase event picks up the value
    of the same user's most recent click at-or-before the purchase ts.
    One tagged-union hash shuffle + vectorized in-group searchsorted --
    see pipelines/joins.py for the operator and its partitioning
    assumption."""
    import ray.data

    from .joins import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    left = ev.filter(
        expr=f"event_type == '{ASOF_LEFT_TYPE}'"
    ).select_columns(["event_id", "user_id", "ts"])
    right = ev.filter(
        expr=f"event_type == '{ASOF_RIGHT_TYPE}'"
    ).select_columns(["event_id", "user_id", "ts", "value"])
    return asof_join(left, right)


def q_orders_enriched(sf_dir: str) -> Dataset:
    """Small-dimension enrichment via broadcast equi-join: every order
    row picks up its customer's nation + market segment WITHOUT
    shuffling the (big) orders side — the customer table is ray.put
    once as sorted key shards and probed per batch
    (pipelines/joins.broadcast_join)."""
    import ray.data

    from .joins import broadcast_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    )
    return broadcast_join(
        orders, cust, key="o_custkey",
        right_columns=["c_nationkey", "c_mktsegment"],
        right_key="c_custkey",
    )


SQL_ORDERS_ENRICHED = """SELECT o_orderkey, o_custkey, o_totalprice,
       c_nationkey, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey"""


def q_lineitem_enriched(sf_dir: str) -> Dataset:
    """Large-large shuffle equi-join (fact x fact): every lineitem row
    picks up its order's custkey + totalprice. Neither side is
    dimension-sized, so this is the hash-bucketed co-group exchange
    (pipelines/joins.hash_join), not the broadcast path — one static
    split exchange per side, vectorized searchsorted probe per bucket,
    many-to-many expansion supported."""
    import ray.data

    from .joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    return hash_join(
        li, orders, key="l_orderkey",
        right_columns=["o_custkey", "o_totalprice"],
        right_key="o_orderkey",
    )


SQL_LINEITEM_ENRICHED = """SELECT l_orderkey, l_linenumber, l_extendedprice,
       o_custkey, o_totalprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""


ACTIVE_SINCE = "2001-01-01"  # recency cutoff for the semi/anti/left demos


def _recent_orders(sf_dir: str, columns: list[str]) -> "Dataset":
    """Orders placed on/after ACTIVE_SINCE, filtered arrow-native at the
    read edge (predicate runs per batch; only ``columns`` leave
    storage)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    cutoff = np.datetime64(ACTIVE_SINCE, "us")

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(cutoff)))

    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"] + columns
    ).map_batches(filt, batch_format="pyarrow")


def q_customer_active(sf_dir: str) -> Dataset:
    """Distributed SEMI join (hash_join how='semi'): customers with at
    least one order since ACTIVE_SINCE — the WHERE EXISTS shape. Both
    sides shuffle-bucketed; only the right KEY column moves through the
    exchange (no payload), and the probe is two searchsorteds + a
    boolean filter, no expansion."""
    import ray.data

    from .joins import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    )
    return hash_join(
        cust, _recent_orders(sf_dir, ["o_custkey"]),
        key="c_custkey", right_columns=[], right_key="o_custkey",
        how="semi",
    )


SQL_CUSTOMER_ACTIVE = f"""SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '{ACTIVE_SINCE}')"""


def q_customer_inactive(sf_dir: str) -> Dataset:
    """Distributed ANTI join (hash_join how='anti'): customers with NO
    order since ACTIVE_SINCE — the WHERE NOT EXISTS shape (churn lists,
    orphan-key audits). Same exchange plan as the semi join; the probe
    keeps the zero-match rows instead."""
    import ray.data

    from .joins import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"],
    )
    return hash_join(
        cust, _recent_orders(sf_dir, ["o_custkey"]),
        key="c_custkey", right_columns=[], right_key="o_custkey",
        how="anti",
    )


SQL_CUSTOMER_INACTIVE = f"""SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{ACTIVE_SINCE}')"""


def q_customer_orders_left(sf_dir: str) -> Dataset:
    """Distributed LEFT OUTER join (hash_join how='left'): every
    customer row survives; customers without a recent order carry a
    NULL o_totalprice (Arrow take() with null gather indices — no
    sentinel values, real SQL null semantics). Matched customers expand
    many-to-many as in the inner join."""
    import ray.data

    from .joins import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    return hash_join(
        cust, _recent_orders(sf_dir, ["o_custkey", "o_totalprice"]),
        key="c_custkey", right_columns=["o_totalprice"],
        right_key="o_custkey", how="left",
    )


SQL_CUSTOMER_ORDERS_LEFT = f"""SELECT c_custkey, c_name, o_totalprice
FROM customer c LEFT JOIN (
    SELECT o_custkey, o_totalprice FROM orders
    WHERE o_orderdate >= TIMESTAMP '{ACTIVE_SINCE}'
) o ON c.c_custkey = o.o_custkey"""


Q3_CUTOFF = "1998-06-01"
Q3_SEGMENT = "BUILDING"
Q3_TOPK = 10


def q_top_building_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q3-shaped composite: dimension filter -> broadcast join ->
    fact x fact shuffle join -> distributed keyed aggregate -> global
    top-k, each stage the scale-right choice:

    * customer (dimension) filters to one segment and BROADCASTS into
      orders (no shuffle of the fact side);
    * orders x lineitem is the bucketed shuffle hash_join (both large);
    * revenue is summed in integer 1e-4-dollar units (floor(x*100+0.5)
      cents x (100 - discount pct)) so the sum is order-independent and
      the oracle hash is exact — no float-accumulation drift;
    * per-batch partials fold duplicate orderkeys before the ONE wide
      groupby, and every block prunes to its local top-k before the
      driver sees anything (driver merges <= blocks x k tiny rows)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from .joins import broadcast_join, hash_join

    cutoff = np.datetime64(Q3_CUTOFF, "us")

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], Q3_SEGMENT)),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff))),
        batch_format="pyarrow",
    )
    orders_b = broadcast_join(
        orders, cust, key="o_custkey",
        right_columns=["c_mktsegment"], right_key="c_custkey",
    ).select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"])

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda t: t.filter(
            pc.greater(t["l_shipdate"], pa.scalar(cutoff))
        ).drop_columns(["l_shipdate"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        li, orders_b, key="l_orderkey",
        right_columns=["o_orderdate", "o_orderpriority"],
        right_key="o_orderkey",
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
                "l_orderkey": df["l_orderkey"],
                "o_orderdate": df["o_orderdate"],
                "o_orderpriority": df["o_orderpriority"],
                "revenue_e4": price_c * (100 - disc_c),
            })
            .groupby(
                ["l_orderkey", "o_orderdate", "o_orderpriority"], sort=False
            )["revenue_e4"].sum().reset_index()
        )

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(
                ["l_orderkey", "o_orderdate", "o_orderpriority"], sort=False
            )["revenue_e4"].sum().reset_index()
        )
        # local top-k prune: the global top-k is a subset of the union
        # of per-group top-k's (orderkeys don't split across groups)
        return g.sort_values(
            ["revenue_e4", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True], kind="stable",
        ).head(Q3_TOPK)

    pruned = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("l_orderkey")
        .map_groups(per_order, batch_format="pandas")
        .map_batches(per_order, batch_format="pandas")
    )
    top = per_order(pruned.to_pandas())  # <= blocks x k rows reach the driver
    return top[
        ["l_orderkey", "revenue_e4", "o_orderdate", "o_orderpriority"]
    ].reset_index(drop=True)


SQL_TOP_BUILDING_ORDERS = f"""SELECT l_orderkey,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_e4,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, o_orderdate, l_orderkey
LIMIT {Q3_TOPK}"""


PRICE_HIST_WIDTH = 500.0


def q_price_histogram(sf_dir: str) -> pd.DataFrame:
    """Fixed-width histogram (pipelines/stats.histogram) over
    l_extendedprice, weighted by the integral l_quantity — the
    mergeable-partial binned aggregate (one np.add.at pass per batch,
    <= n_bins rows move per block, no shuffle)."""
    import ray.data

    from .stats import histogram

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_quantity"],
    )
    return histogram(
        li, "l_extendedprice", PRICE_HIST_WIDTH, weight_col="l_quantity"
    )


SQL_PRICE_HISTOGRAM = f"""SELECT
    CAST(FLOOR(l_extendedprice / {PRICE_HIST_WIDTH}) AS BIGINT) AS bin,
    COUNT(*) AS n,
    SUM(l_quantity) AS wsum
FROM lineitem GROUP BY 1 ORDER BY 1"""


def q_orders_price_rank(sf_dir: str) -> Dataset:
    """Global ROW_NUMBER over a total order (pipelines/rank.global_rank):
    every order gets its exact 1-based position by totalprice — the
    distributed order-by (range partition -> tiny bucket-count pass ->
    per-bucket local sort + global offsets). No task sees more than one
    value-range bucket."""
    import ray.data

    from .rank import global_rank

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return global_rank(
        orders, "o_totalprice", "o_orderkey", rank_col="price_rank"
    )


SQL_ORDERS_PRICE_RANK = """SELECT o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS price_rank
FROM orders"""


RANGE_JOIN_WINDOW_DAYS = 7


def q_lineitem_in_window(sf_dir: str) -> pd.DataFrame:
    """Non-equi RANGE join (pipelines/joins.range_join): pair every
    lineitem with every order whose 7-day activity window contains the
    lineitem's shipdate — no key equality anywhere, the join shape an
    equi-join engine cannot express (~2.9M internal pairs at sf0.01,
    never driver-materialized). The pair stream folds into a per-priority
    (n_pairs, sum_qty) aggregate with per-batch partials before the tiny
    final groupby. sum_qty is exact: quantities are integral doubles, so
    the sum is order-independent."""
    import numpy as np
    import pandas as pd
    import ray.data

    from .joins import range_join

    def _us(s: pd.Series) -> np.ndarray:
        # unit-proof epoch micros (pandas may hand back ns- or us-unit
        # datetimes depending on version)
        return s.to_numpy(dtype="datetime64[us]").astype(np.int64)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_quantity"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {"ship_us": _us(df["l_shipdate"]),
             "l_quantity": df["l_quantity"]}
        ),
        batch_format="pandas",
    )
    day_us = 86_400_000_000
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {"lo_us": _us(df["o_orderdate"]),
             "hi_us": _us(df["o_orderdate"])
             + RANGE_JOIN_WINDOW_DAYS * day_us,
             "priority": df["o_orderpriority"]}
        ),
        batch_format="pandas",
    )
    pairs = range_join(
        li, orders, value_col="ship_us", lo_col="lo_us", hi_col="hi_us",
        interval_cols=["priority"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"priority": df["priority"], "n_pairs": 1,
                          "sum_qty": df["l_quantity"]})
            .groupby("priority", sort=False).sum().reset_index()
        )

    # partials are <= n_priorities rows per pair block — the driver
    # merges a tiny frame (blocks x 5 rows even at 100 TB), so no
    # shuffle is spent on a 5-group aggregate
    parts = pairs.map_batches(partial, batch_format="pandas").to_pandas()
    g = parts.groupby("priority", sort=True).agg(
        n_pairs=("n_pairs", "sum"), sum_qty=("sum_qty", "sum")
    ).reset_index()
    g["n_pairs"] = g["n_pairs"].astype(np.int64)
    return g


SQL_LINEITEM_IN_WINDOW = f"""SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_pairs,
       SUM(l.l_quantity) AS sum_qty
FROM lineitem l JOIN orders o
  ON l.l_shipdate BETWEEN o.o_orderdate
                      AND o.o_orderdate + INTERVAL {RANGE_JOIN_WINDOW_DAYS} DAY
GROUP BY 1 ORDER BY 1"""


def q_events_distinct_users(sf_dir: str) -> Dataset:
    """Exact distinct-count per key (unique users per event type) with
    per-batch dedup BEFORE the shuffle: each batch emits its distinct
    (event_type, user_id) pairs, the tiny groupby over the deduped pair
    space counts once more, then a count-per-key aggregate — the
    standard cardinality pre-aggregate (only distinct pairs move, never
    raw events). The mining path's exact distinct-participant reduce is
    the heavyweight sibling of this op."""
    import numpy as np
    import pandas as pd
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    pairs = ev.map_batches(partial, batch_format="pandas")

    def count_unique(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_users": np.array([df["user_id"].nunique()], np.int64),
            }
        )

    return pairs.groupby("event_type").map_groups(
        count_unique, batch_format="pandas"
    )


SQL_EVENTS_DISTINCT_USERS = """SELECT event_type,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type"""


ROLL_WINDOW = 4  # current row + 3 preceding


def q_events_rolling(sf_dir: str) -> Dataset:
    """Per-key ordered window functions over the event log: row_number,
    lag(value), and a rolling max over the last ROLL_WINDOW rows — the
    training-data window family beyond the tumbling aggregate
    (events_windowed) and the gap sessionizer (events_sessions). One
    hash shuffle (groupby user), then fully vectorized in-group kernels:
    shifted views for lag, a maximum-of-shifted-views tree for the
    rolling max (exact — no floating accumulation, so it hash-matches
    the SQL window oracle bit-for-bit). Same one-key-per-task assumption
    as the sessionizer (a user's history is bounded)."""
    import numpy as np
    import pandas as pd
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="stable")
        v = df["value"].to_numpy(np.float64)
        n = len(v)
        pad = np.concatenate([np.full(ROLL_WINDOW - 1, -np.inf), v])
        roll_max = pad[ROLL_WINDOW - 1:].copy()
        for s in range(1, ROLL_WINDOW):
            np.maximum(roll_max, pad[ROLL_WINDOW - 1 - s: len(pad) - s],
                       out=roll_max)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "ts": df["ts"].to_numpy(),
                "rn": np.arange(1, n + 1, dtype=np.int64),
                "prev_value": np.concatenate([[0.0], v[:-1]]),
                "roll_max": roll_max,
            }
        )

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas")


SQL_EVENTS_ROLLING = f"""SELECT event_id, user_id, ts,
       row_number() OVER w AS rn,
       COALESCE(lag(value) OVER w, 0.0) AS prev_value,
       max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN {ROLL_WINDOW - 1} PRECEDING
                        AND CURRENT ROW) AS roll_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""


SQL_EVENTS_ASOF = f"""SELECT l.event_id, l.user_id, l.ts,
       r.ts AS asof_ts, r.value AS asof_value
FROM events l
CROSS JOIN LATERAL (
  SELECT r.ts, r.value FROM events r
  WHERE r.user_id = l.user_id
    AND r.event_type = '{ASOF_RIGHT_TYPE}'
    AND r.ts <= l.ts
  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1
) r
WHERE l.event_type = '{ASOF_LEFT_TYPE}'"""


_KNN_IDS_SQL = ", ".join(f"'{q}'" for q in KNN_QUERY_IDS)

SQL_KNN = f"""WITH {_INST},
q AS (SELECT * FROM inst WHERE instance_id IN ({_KNN_IDS_SQL})),
sel AS (
  SELECT q.instance_id AS query_id, i.instance_id AS nbr_id,
         sqrt((q.x - i.x) * (q.x - i.x) + (q.y - i.y) * (q.y - i.y)) AS d,
         row_number() OVER (
           PARTITION BY q.instance_id
           ORDER BY sqrt((q.x - i.x) * (q.x - i.x) + (q.y - i.y) * (q.y - i.y)),
                    i.instance_id
         ) AS rnk
  FROM q JOIN inst i ON i.instance_id <> q.instance_id
)
SELECT query_id, nbr_id, round(d, 6) AS dist, CAST(rnk AS INTEGER) AS rank
FROM sel WHERE rnk <= {KNN_K}"""

_PIP_CASE = " ".join(
    f"WHEN x > {x1} AND x < {x2} AND y > {y1} AND y < {y2} THEN '{name}'"
    for name, (x1, y1, x2, y2) in PIP_RECTS.items()
)

SQL_PIP = f"""WITH {_INST}
SELECT instance_id, CASE {_PIP_CASE} ELSE '' END AS polygon FROM inst"""

SQL_RASTERIZE = f"""WITH {_INST}
SELECT CAST(floor(x / {RASTER_CELL}) AS BIGINT) AS cell_x,
       CAST(floor(y / {RASTER_CELL}) AS BIGINT) AS cell_y,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(x) / count(*), 6) AS mean_x,
       round(sum(y) / count(*), 6) AS mean_y
FROM inst GROUP BY 1, 2"""

SQL_RASTER_BOXES = f"""WITH {_INST},
cells AS (
  SELECT CAST(floor(x / {RASTER_CELL}) AS BIGINT) AS cell_x,
         CAST(floor(y / {RASTER_CELL}) AS BIGINT) AS cell_y
  FROM inst GROUP BY 1, 2
)
SELECT cell_x, cell_y,
       cell_x * {RASTER_CELL} AS x_min, cell_y * {RASTER_CELL} AS y_min,
       (cell_x + 1) * {RASTER_CELL} AS x_max, (cell_y + 1) * {RASTER_CELL} AS y_max
FROM cells"""

SQL_EVENTS_WINDOWED = """SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""


# ----- documents / embeddings (training-data ops) -------------------------

def _docs(sf_dir: str) -> Dataset:
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )


def _embeddings(sf_dir: str) -> Dataset:
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def q_doc_quality(sf_dir: str) -> Dataset:
    from . import text as text_pipe

    return text_pipe.doc_quality(_docs(sf_dir))


def q_token_totals(sf_dir: str) -> Dataset:
    from . import text as text_pipe

    return text_pipe.token_totals(_docs(sf_dir))


def q_token_topk(sf_dir: str) -> Dataset:
    from . import text as text_pipe

    return text_pipe.token_topk(_docs(sf_dir), k=50)


def q_bigram_topk(sf_dir: str) -> Dataset:
    from . import text as text_pipe

    return text_pipe.bigram_topk(_docs(sf_dir), k=50)


def q_doc_boilerplate(sf_dir: str) -> Dataset:
    """Per-doc duplicated-bigram boilerplate ratio (Gopher-style quality
    rule) — map-only, no shuffle; read pruned to (doc_id, text)."""
    import ray.data

    from . import text as text_pipe

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return text_pipe.doc_boilerplate(docs)


SQL_DOC_BOILERPLATE = """WITH flat AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok,
         unnest(generate_series(1, len(string_split_regex(trim(text), '\\s+')))) AS ord
  FROM documents WHERE trim(text) <> ''
), pairs AS (
  SELECT doc_id,
         tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS bigram
  FROM flat
), cnt AS (
  SELECT doc_id, bigram, count(*) AS c
  FROM pairs WHERE bigram IS NOT NULL GROUP BY 1, 2
), agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_bigrams,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup
  FROM cnt GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(a.n_bigrams, 0) AS n_bigrams,
       COALESCE(a.n_dup, 0) AS n_dup_bigrams,
       CASE WHEN COALESCE(a.n_bigrams, 0) > 0
            THEN CAST(a.n_dup AS DOUBLE) / a.n_bigrams
            ELSE 0.0 END AS dup_frac
FROM documents d LEFT JOIN agg a USING (doc_id)"""


DECON_N = 5            # word n-gram span length
DECON_BENCH_MOD = 97   # doc_id % MOD == 0 -> benchmark member


def q_doc_decontaminate(sf_dir: str) -> Dataset:
    """Test-set decontamination: docs sharing any 5-gram with the
    deterministic benchmark subset (doc_id % 97 == 0, standing in for a
    held-out eval set) are flagged. Benchmark gram set broadcasts once;
    the corpus side is map-only."""
    import numpy as np
    import ray.data

    from . import text as text_pipe

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def bench_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % DECON_BENCH_MOD == 0))

    bench = docs.map_batches(bench_filter, batch_format="pyarrow")
    return text_pipe.decontaminate(docs, bench, n=DECON_N)


SQL_DOC_DECONTAMINATE = f"""WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok,
         unnest(generate_series(1, len(string_split_regex(trim(text), '\\s+')))) AS ord
  FROM documents WHERE trim(text) <> ''
), g AS (
  SELECT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
             || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS gram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
), gd AS (
  SELECT DISTINCT doc_id, gram FROM g WHERE gram IS NOT NULL
), bench AS (
  SELECT DISTINCT gram FROM gd WHERE doc_id % {DECON_BENCH_MOD} = 0
), hits AS (
  SELECT gd.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM gd JOIN bench USING (gram) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(h.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(h.n_overlap, 0) > 0 AS BIGINT) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)"""


def q_doc_top_terms(sf_dir: str) -> Dataset:
    """Per-doc top-3 salient terms by rational (BM25-form) tf-idf:
    per-batch tf kernel -> partial-agg df -> tf x df shuffle hash join
    on the token hash -> grouped top-k per doc. Read pruned to the two
    columns the op touches."""
    import ray.data

    from . import text as text_pipe

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return text_pipe.doc_top_terms(docs, k=3)


def q_langid(sf_dir: str) -> Dataset:
    from . import text as text_pipe

    return text_pipe.doc_langid(_docs(sf_dir))


def q_fingerprints(sf_dir: str) -> Dataset:
    from . import text as text_pipe

    return text_pipe.doc_fingerprints(_docs(sf_dir))


def q_dedup_exact(sf_dir: str) -> Dataset:
    from . import dedup as dedup_pipe

    ds = dedup_pipe.exact_dedup(_docs(sf_dir))
    return ds.select_columns(["doc_id", "n_copies"])


def q_dedup_exact_latest(sf_dir: str) -> Dataset:
    """Exact dedup keeping the NEWEST copy (max doc_id) per distinct
    text — the crawl-snapshot survivor policy."""
    from . import dedup as dedup_pipe

    ds = dedup_pipe.exact_dedup(_docs(sf_dir), keep="latest")
    return ds.select_columns(["doc_id", "n_copies"])


def q_minhash_neardup(sf_dir: str) -> pa.Table:
    from . import dedup as dedup_pipe

    return dedup_pipe.minhash_neardup_pairs(_docs(sf_dir), threshold=0.7)


def q_simhash(sf_dir: str) -> Dataset:
    from . import dedup as dedup_pipe

    return dedup_pipe.simhash_signatures(_docs(sf_dir))


def q_simhash_neardup(sf_dir: str) -> Dataset:
    """Fuzzy dedup over simhash signatures: rotating bit-band LSH +
    exact hamming <= 3 verify (pigeonhole-exact at 4 bands x 16 bits)."""
    from . import dedup as dedup_pipe

    return dedup_pipe.simhash_neardup_pairs(_docs(sf_dir), max_hamming=3)


def q_ngram_pairs(sf_dir: str) -> Dataset:
    from . import dedup as dedup_pipe

    return dedup_pipe.ngram_jaccard_pairs(_docs(sf_dir), threshold=0.3)


ANN_QUERY_IDS = [0, 1, 2]
ANN_K = 10
NEARDUP_TAU = 0.4


def q_ann_topk(sf_dir: str) -> pa.Table:
    from . import similarity

    return similarity.ann_topk(_embeddings(sf_dir), ANN_QUERY_IDS, k=ANN_K)


def q_ann_topk_lsh(sf_dir: str) -> pa.Table:
    from . import similarity

    return similarity.lsh_bucket_topk(
        _embeddings(sf_dir), ANN_QUERY_IDS, k=ANN_K
    )


def q_ann_topk_ivf(sf_dir: str) -> pa.Table:
    from . import similarity

    return similarity.ivf_topk(_embeddings(sf_dir), ANN_QUERY_IDS, k=ANN_K)


def q_embed_clusters(sf_dir: str) -> pa.Table:
    """Embedding k-means cluster assignment (semantic-dedup / topic-
    mixing building block): bounded driver-sample training, broadcast
    centroids, map-only assignment of every vector. Deterministic under
    the fixed seed -> committed VALUES golden oracle."""
    from . import similarity

    res = similarity.embed_clusters(_embeddings(sf_dir), n_clusters=8)
    out = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    return out.sort_by("vec_id")


def q_embed_neardup(sf_dir: str) -> pa.Table:
    from . import similarity

    return similarity.cosine_neardup_pairs(_embeddings(sf_dir), NEARDUP_TAU)


def q_embed_neardup_lsh(sf_dir: str) -> pa.Table:
    """Composed bucketed near-dup (LSH candidates -> per-bucket exact
    verify). At the oracle scale (<= 4096 vectors) 24 bands x 3 bits
    gives per-pair miss probability (1-p^3)^24 ~ 1e-3 at tau=0.4, so the
    output equals the exact all-pairs op (verified table-equal at
    sf0.01) and shares its SQL oracle. Beyond that, band_bits grows with
    the input (one extra bit per doubling) so expected bucket sizes --
    and hence the per-bucket O(|g|^2) verify -- stay bounded instead of
    each band bucket holding ~n/8 of the corpus."""
    import glob
    import math
    import os

    import pyarrow.parquet as pq

    from . import similarity

    path = f"{sf_dir}/embeddings.parquet"
    files = (
        sorted(glob.glob(f"{path}/*.parquet")) if os.path.isdir(path)
        else [path]
    )
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    band_bits = max(3, 3 + math.ceil(math.log2(max(n, 1) / 4096)))
    return similarity.lsh_neardup_pairs(
        _embeddings(sf_dir), NEARDUP_TAU, n_bands=24, band_bits=band_bits
    )


# ----- image pHash family -------------------------------------------------

def _phash_image_table(sf_dir: str, n_base: int, n_dups: int) -> pa.Table:
    """Deterministic image table derived from the events table: every
    (n_events // n_base)-th event id becomes an image whose pixels are
    keyed by the id string, so the result depends on the actual sf input
    (row count) and the committed goldens can be fingerprint-gated. Base
    rows are PNG (hash of the exact pixels); the first ``n_dups`` ids
    get a planted near-duplicate row — the SAME pixels re-encoded as
    lossy JPEG, id suffixed '~j' — the realistic crawl-dedup scenario."""
    import glob
    import os

    import pyarrow.parquet as pq

    from ..sources.image_codec import (
        deterministic_pixels,
        encode_jpeg,
        encode_png,
    )
    from ..sources.images import IMAGE_SCHEMA

    path = os.path.join(sf_dir, "events.parquet")
    files = (
        sorted(glob.glob(f"{path}/*.parquet")) if os.path.isdir(path)
        else [path]
    )
    n_events = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    step = max(1, n_events // n_base)
    rows = {k: [] for k in IMAGE_SCHEMA.names}

    def add(iid, px, fmt):
        rows["image_id"].append(iid)
        rows["bytes"].append(encode_png(px) if fmt == "png" else encode_jpeg(px))
        rows["w"].append(px.shape[1])
        rows["h"].append(px.shape[0])
        rows["fmt"].append(fmt)
        rows["caption"].append(f"{iid} at 0.000 0.000")
        rows["phash"].append(0)

    for j in range(n_base):
        eid = j * step
        if eid >= n_events:
            break
        iid = f"E{eid}"
        px = deterministic_pixels(iid, 16, 16)
        add(iid, px, "png")
        if j < n_dups:
            add(iid + "~j", px, "jpeg")
    return pa.table(rows, schema=IMAGE_SCHEMA)


def _event_ids(sf_dir: str, n_base: int) -> list[int]:
    """Every (n_events // n_base)-th event id — the shared keying scheme
    of the derived media fixtures (_phash_image_table uses the same), so
    the committed goldens can be gated on the events-table fingerprint."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "events.parquet")
    files = (
        sorted(glob.glob(f"{path}/*.parquet")) if os.path.isdir(path)
        else [path]
    )
    n_events = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    step = max(1, n_events // n_base)
    return [j * step for j in range(n_base) if j * step < n_events]


def _audio_table(sf_dir: str, n_clips: int = 64) -> pa.Table:
    """Deterministic RIFF/WAVE PCM16 clip table derived from the events
    table: per clip, a seeded sine + uniform noise at 8 kHz with
    id-dependent frequency and length."""
    import numpy as np

    from ..sources.wav import encode_wav

    ids, blobs = [], []
    for eid in _event_ids(sf_dir, n_clips):
        rng = np.random.default_rng(eid)
        n = 400 + (eid % 800)
        freq = 100.0 + (eid % 900)
        t = np.arange(n, dtype=np.float64) / 8000.0
        x = 6000.0 * np.sin(2 * np.pi * freq * t) + rng.uniform(-500, 500, n)
        stereo = np.stack([x, -0.5 * x], axis=1)
        ids.append(f"A{eid}")
        blobs.append(encode_wav(np.round(stereo).astype(np.int16), 8000))
    return pa.table(
        {"clip_id": pa.array(ids, pa.string()),
         "bytes": pa.array(blobs, pa.binary())}
    )


def q_audio_features(sf_dir: str) -> pa.Table:
    """Distributed audio decode (real from-spec WAV codec) + clip-level
    feature extraction via an actor pool. Deterministic, so the
    committed VALUES golden is its exact oracle."""
    import ray.data

    from . import multimodal

    t = _audio_table(sf_dir, 64)
    parts = [t.slice(o, 16) for o in range(0, t.num_rows, 16)]
    res = multimodal.extract_audio_features(
        ray.data.from_arrow(parts), concurrency=2
    )
    out = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    return out.sort_by("clip_id")


def _mjpeg_table(sf_dir: str, n_clips: int = 32) -> pa.Table:
    """Deterministic MJPEG clip table derived from the events table:
    each clip is 3-6 concatenated JFIF frames of seeded pixel content
    (the real JPEG encoder, so the demuxer walks real entropy data)."""
    from ..sources.image_codec import deterministic_pixels, encode_jpeg

    ids, blobs = [], []
    for eid in _event_ids(sf_dir, n_clips):
        n_frames = 3 + (eid % 4)
        blob = b"".join(
            encode_jpeg(deterministic_pixels(f"V{eid}f{j}", 16, 16))
            for j in range(n_frames)
        )
        ids.append(f"V{eid}")
        blobs.append(blob)
    return pa.table(
        {"clip_id": pa.array(ids, pa.string()),
         "bytes": pa.array(blobs, pa.binary())}
    )


def q_video_frames(sf_dir: str) -> pa.Table:
    """Distributed MJPEG demux + every-2nd-frame sampling + per-frame
    stats via an actor pool. Deterministic -> VALUES golden oracle."""
    import ray.data

    from . import multimodal

    t = _mjpeg_table(sf_dir, 32)
    parts = [t.slice(o, 8) for o in range(0, t.num_rows, 8)]
    res = multimodal.mjpeg_frame_stats(
        ray.data.from_arrow(parts), every_k=2, concurrency=2
    )
    out = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    return out.sort_by([("clip_id", "ascending"), ("frame_idx", "ascending")])


def q_image_phash(sf_dir: str) -> pa.Table:
    """Distributed decode + perceptual hash over an image table (the
    'document fingerprint' of the image world). Deterministic, so the
    committed VALUES golden is its exact oracle."""
    import ray.data

    from . import multimodal

    t = _phash_image_table(sf_dir, 256, 0)
    # several input blocks so the decode actor pool actually fans out
    parts = [t.slice(o, 64) for o in range(0, t.num_rows, 64)]
    res = multimodal.image_phash(ray.data.from_arrow(parts), concurrency=2)
    out = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    return out.sort_by("image_id")


def _mixture_rate(source: str) -> int:
    """Per-source keep percentage for the mixture-weighting query:
    10 + 17*N mod 80 for source 'srcN' (a fixed, SQL-restatable rule)."""
    return 10 + (int(source[3:]) * 17) % 80


def q_doc_sample(sf_dir: str):
    """Deterministic stratified sampling by source (mixture weighting).
    Map-only, no shuffle; the md5-threshold predicate is restated
    exactly in the SQL oracle."""
    import ray.data

    from . import sampling

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return sampling.stratified_sample(
        docs, "doc_id", "source", _mixture_rate
    )


SQL_DOC_SAMPLE = """SELECT doc_id, source FROM documents
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|' || source), 1, 8)) AS UBIGINT) % 100
      < 10 + (CAST(substr(source, 4) AS BIGINT) * 17) % 80"""


def q_docs_topk_per_source(sf_dir: str):
    """Top-3 longest documents per source (grouped top-k / window-rank
    operator; partial per-block prune before the shuffle)."""
    import ray.data

    from . import rank

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return rank.grouped_topk(
        docs, ["source"], "n_chars", k=3, tie_col="doc_id"
    )


SQL_DOCS_TOPK = """SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn <= 3"""


def q_docs_median_chars(sf_dir: str) -> Dataset:
    """EXACT grouped percentile (median doc length per source) without
    sorting the corpus: per-batch partial (source, n_chars) value-counts
    -> one small groupby-sum over the distinct-value space -> per-source
    discrete quantile read off the count histogram (first value whose
    cumulative count reaches ceil(n/2) — DuckDB quantile_disc
    semantics). The only shuffle moves (sources x distinct lengths)
    count rows, not documents, so it is scale-clean for any corpus whose
    VALUE domain is bounded (lengths, scores, token counts) — the
    pre-aggregate pattern the mining path's feature-count scan uses."""
    import numpy as np
    import pandas as pd
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = (
            df.groupby(["source", "n_chars"], sort=False, observed=True)
            .size().reset_index(name="n")
        )
        vc["n"] = vc["n"].astype(np.int64)
        return vc

    counts = docs.map_batches(partial, batch_format="pandas")

    def quantile_from_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("n_chars", sort=True)["n"].sum()
        )  # distinct lengths, ascending
        cum = g.cumsum().to_numpy()
        total = int(cum[-1])
        pos = (total + 1) // 2  # ceil(0.5 * n): quantile_disc(0.5)
        idx = int(np.searchsorted(cum, pos))
        return pd.DataFrame(
            {
                "source": [df["source"].iloc[0]],
                "median_chars": np.array([g.index[idx]], np.int64),
            }
        )

    return counts.groupby("source").map_groups(
        quantile_from_counts, batch_format="pandas"
    )


SQL_DOCS_MEDIAN = """SELECT source,
       quantile_disc(n_chars, 0.5) AS median_chars
FROM documents GROUP BY source"""


def q_ann_topk_int8(sf_dir: str) -> pa.Table:
    """Cosine top-k over int8 quantize-dequantized vectors (the
    compressed-store serving path). Deterministic -> VALUES golden;
    recall vs the exact search is tested in tests/test_sampling.py."""
    from . import similarity

    return similarity.ann_topk(
        _embeddings(sf_dir), ANN_QUERY_IDS, k=ANN_K, int8=True
    )


def q_embed_quantize(sf_dir: str):
    """Symmetric int8 embedding quantization (map-only, reduceat-
    vectorized); scale + code checksums restated exactly in SQL."""
    from . import similarity

    return similarity.quantize_int8(_embeddings(sf_dir))


SQL_EMBED_QUANTIZE = """SELECT vec_id,
       round(list_aggregate(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0, 9) AS scale,
       CAST(CASE WHEN m = 0 THEN 0 ELSE list_aggregate(list_transform(embedding,
            x -> floor(CAST(x AS DOUBLE) * 127.0 / m + 0.5)), 'sum') END AS BIGINT) AS q_sum,
       CAST(CASE WHEN m = 0 THEN 0 ELSE list_aggregate(list_transform(embedding,
            x -> abs(floor(CAST(x AS DOUBLE) * 127.0 / m + 0.5))), 'sum') END AS BIGINT) AS q_abs_sum
FROM (
  SELECT vec_id, embedding,
         list_aggregate(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE))), 'max') AS m
  FROM embeddings
)"""


def q_image_stats(sf_dir: str) -> pa.Table:
    """Distributed decode + per-image channel statistics (the
    feature-extract step of an image pipeline), over the same derived
    image table as image_phash. Deterministic -> VALUES golden."""
    import ray.data

    from . import multimodal

    t = _phash_image_table(sf_dir, 256, 0)
    parts = [t.slice(o, 64) for o in range(0, t.num_rows, 64)]
    res = multimodal.decode_stats(ray.data.from_arrow(parts), concurrency=2)
    out = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    return out.sort_by("image_id")


def q_image_resize(sf_dir: str) -> pa.Table:
    """Distributed resize (decode -> nearest-neighbor downsample ->
    re-encode PNG) over the derived image table. The binary output
    column is summarized as crc32 so the deterministic VALUES golden
    pins the exact re-encoded bytes end to end."""
    import zlib

    import ray.data

    from . import multimodal

    t = _phash_image_table(sf_dir, 128, 0)
    parts = [t.slice(o, 64) for o in range(0, t.num_rows, 64)]
    res = multimodal.resize_images(
        ray.data.from_arrow(parts), target=8, concurrency=2
    )

    def summarize(b: pa.Table) -> pa.Table:
        crc = [zlib.crc32(x) for x in b["bytes"].to_pylist()]
        return pa.table(
            {
                "image_id": b["image_id"],
                "w": b["w"],
                "h": b["h"],
                "fmt": b["fmt"],
                "crc32": pa.array(crc, pa.int64()),
            }
        )

    out = res.map_batches(summarize, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).sort_by(
        "image_id"
    )


def q_image_phash_neardup(sf_dir: str) -> pa.Table:
    """pHash-LSH image near-dup: 48 planted JPEG re-encodes of PNG
    originals must pair up (re-encode moves 0-6 bits, the 8x8-band LSH
    catches <= 7 exactly); unrelated fixture images sit >= 18 bits apart,
    so the expected output is exactly the planted pairs."""
    import ray.data

    from . import multimodal

    t = _phash_image_table(sf_dir, 192, 48)
    parts = [t.slice(o, 64) for o in range(0, t.num_rows, 64)]
    res = multimodal.phash_neardup(ray.data.from_arrow(parts))
    out = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


SQL_DOC_QUALITY = """WITH base AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         len(string_split_regex(trim(text), '\\s+')) AS n_words,
         length(regexp_replace(text, '\\s', '', 'g')) AS nospace,
         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
             x -> x IN ('the','a','and','of','to','in','is','on','for','with'))) AS stops
  FROM documents
)
SELECT doc_id, n_chars, n_words,
       round(CAST(nospace AS DOUBLE) / greatest(n_words, 1), 6) AS avg_word_len,
       round(CAST(punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct_ratio,
       round(CAST(stops AS DOUBLE) / greatest(n_words, 1), 6) AS stop_ratio,
       round(1.0 / (1.0 + exp(-(
           0.02 * n_words
           + 5.0 * round(CAST(stops AS DOUBLE) / greatest(n_words, 1), 6)
           - 10.0 * round(CAST(punct AS DOUBLE) / greatest(n_chars, 1), 6)
           - 0.2 * abs(round(CAST(nospace AS DOUBLE) / greatest(n_words, 1), 6) - 5.0)
       ))), 6) AS quality_score
FROM base"""

SQL_TOKEN_TOTALS = """SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens_ws,
       CAST(sum(len(regexp_extract_all(text, '[\\w]+|[^\\w\\s]'))) AS BIGINT) AS total_tokens_bpe
FROM documents GROUP BY source"""

SQL_DEDUP_EXACT = """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY text"""

SQL_DEDUP_EXACT_LATEST = """SELECT max(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY text"""

# same whitespace tokenization as SQL_TOKEN_TOTALS (trim + \s+ split ==
# python str.split()); ties at the cutoff break (n desc, token asc) on
# both sides, so the LIMIT boundary is deterministic
SQL_TOKEN_TOPK = """SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY n DESC, token ASC LIMIT 50"""

SQL_DOC_TOP_TERMS = """WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE token <> '' GROUP BY 1, 2
),
df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * ((n.n - df.df + 0.5) / (df.df + 0.5)) AS score
  FROM tf JOIN df USING (token) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rn
  FROM scored
)
SELECT doc_id, token, tf, df, score FROM ranked WHERE rn <= 3"""

SQL_BIGRAM_TOPK = """WITH flat AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok,
         unnest(generate_series(1, len(string_split_regex(trim(text), '\\s+')))) AS ord
  FROM documents WHERE trim(text) <> ''
), pairs AS (
  SELECT tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS bigram
  FROM flat
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM pairs WHERE bigram IS NOT NULL
GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 50"""

# exact restatement of functions/text.lang_id: per-language stopword hit
# counts over whitespace tokens (duplicates counted), first language in
# profile order wins ties, zero hits -> 'und'
_LANG_LISTS = {
    "en": "'the','and','of','to','in','is','that','it','for','on','with','as','was','at','by'",
    "es": "'el','la','de','que','y','en','un','ser','se','no','por','con','para','como','su'",
    "de": "'der','die','und','in','den','von','zu','das','mit','sich','des','auf','ist'",
    "fr": "'le','la','de','et','les','des','en','un','du','une','que','est','pour','qui'",
}

SQL_LANGID = f"""WITH scored AS (
  SELECT doc_id, lang,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             x -> x IN ({_LANG_LISTS["en"]}))) AS s_en,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             x -> x IN ({_LANG_LISTS["es"]}))) AS s_es,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             x -> x IN ({_LANG_LISTS["de"]}))) AS s_de,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             x -> x IN ({_LANG_LISTS["fr"]}))) AS s_fr
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
            WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
            WHEN s_de >= s_fr THEN 'de'
            ELSE 'fr' END AS lang_pred
FROM scored"""

# exact restatement of functions/text.fingerprint: ordered left fold
# h = (h * 1000003 + md5_64(token)) mod (2^61 - 1) via list_reduce
SQL_FINGERPRINTS = """SELECT doc_id,
       CAST(list_reduce(
         list_prepend(CAST(0 AS HUGEINT),
           list_transform(
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(text), '\\s+') END,
             t -> CAST(CAST(concat('0x', substr(md5(t), 1, 16)) AS UBIGINT) AS HUGEINT))),
         (acc, x) -> (acc * 1000003 + x) % 2305843009213693951
       ) AS BIGINT) AS fp
FROM documents"""

# exact restatement of functions/dedup.simhash64: md5-64 token hash,
# per-bit +1/-1 majority vote, signed-int64 signature
SQL_SIMHASH = """WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
th AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS h
  FROM toks
),
bits AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th, (SELECT unnest(generate_series(0, 63)) AS b) b
  GROUP BY doc_id, b.b
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (CAST(1 AS HUGEINT) << b) ELSE CAST(0 AS HUGEINT) END) AS u
  FROM bits GROUP BY doc_id
)
SELECT doc_id,
       CAST(CASE WHEN u >= (CAST(1 AS HUGEINT) << 63)
                 THEN u - (CAST(1 AS HUGEINT) << 64) ELSE u END AS BIGINT) AS simhash
FROM sig
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT) AS simhash
FROM documents WHERE trim(text) = ''"""

# exact restatement of pipelines/dedup.simhash_neardup_pairs: the
# banded LSH is pigeonhole-EXACT at hamming <= 3 (4 bands x 16 bits),
# so the full self-join equals the engine's banded op bit-for-bit
SQL_SIMHASH_NEARDUP = f"""WITH sig AS ({SQL_SIMHASH})
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM sig x JOIN sig y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3"""


def _sql_minhash_pairs(source: str, tau: float) -> str:
    """Parenthesized subquery yielding (a, b, jaccard): exact
    restatement of the FULL MinHash-LSH pipeline
    (pipelines/dedup.minhash_verified_pairs) over ``source`` (any
    relation with doc_id, text): md5-64 char-5-shingles mod (2^61-1),
    the 128 (a,b) permutation constants inlined, per-band polynomial
    bucket hash via ordered list_reduce, bucket self-join candidates,
    exact hashed-shingle Jaccard verify >= tau. Every arithmetic step
    is mod-Mersenne61 HUGEINT math that the Python side reproduces
    bit-for-bit (functions/dedup.mulmod_mersenne61)."""
    import numpy as np

    from ..functions.dedup import (
        _A,
        _B,
        _MERSENNE,
        BAND_HASH_MUL,
        MINHASH_BANDS,
        MINHASH_PERMS,
        band_hashes,
    )

    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    perm_values = ", ".join(
        f"({p}, {p // rows_per_band}, "
        f"CAST({int(_A[p])} AS HUGEINT), CAST({int(_B[p])} AS HUGEINT))"
        for p in range(MINHASH_PERMS)
    )
    empty_bh = int(
        band_hashes(
            np.full(MINHASH_PERMS, np.iinfo(np.int64).max, dtype=np.int64)
        )[0]
    )
    p = _MERSENNE
    return f"""(WITH lt AS (SELECT doc_id, lower(text) AS t FROM {source}),
sh AS (
  SELECT doc_id,
         CASE WHEN length(t) = 0 THEN CAST([] AS HUGEINT[])
              WHEN length(t) < 5 THEN
                [CAST(CAST(concat('0x', substr(md5(t), 1, 16)) AS UBIGINT) AS HUGEINT) % {p}]
              ELSE list_distinct(
                [CAST(CAST(concat('0x', substr(md5(substr(t, x, 5)), 1, 16)) AS UBIGINT) AS HUGEINT) % {p}
                 FOR x IN generate_series(1, length(t) - 4)])
         END AS s
  FROM lt
),
perm(p, band, a, b) AS (VALUES {perm_values}),
expl AS (SELECT doc_id, unnest(s) AS x FROM sh WHERE len(s) > 0),
mins AS (
  SELECT e.doc_id, perm.band, perm.p,
         min((perm.a * e.x + perm.b) % {p}) AS v
  FROM expl e CROSS JOIN perm
  GROUP BY e.doc_id, perm.band, perm.p
),
bh AS (
  SELECT doc_id, band,
         list_reduce(list_prepend(CAST(0 AS HUGEINT), list(v ORDER BY p)),
                     (acc, xx) -> (acc * {BAND_HASH_MUL} + xx) % {p}) AS h
  FROM mins GROUP BY doc_id, band
  UNION ALL
  SELECT sh.doc_id, b.band, CAST({empty_bh} AS HUGEINT) AS h
  FROM sh, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band) b
  WHERE len(sh.s) = 0
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bh x JOIN bh y ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id
),
ver AS (
  SELECT c.a, c.b,
         CASE WHEN len(sa.s) = 0 AND len(sb.s) = 0 THEN 1.0
              ELSE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(sa.s, sb.s))) END AS j
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b
)
SELECT a, b, round(j, 6) AS jaccard FROM ver WHERE j >= {tau})"""


SQL_MINHASH = (
    f"SELECT a, b, jaccard FROM {_sql_minhash_pairs('documents', 0.7)} m"
)

def _sql_corpus_clean(min_words: int = 20, tau: float = 0.7) -> str:
    """Exact restatement of pipelines/corpus.clean_corpus: quality gate
    (n_words / stop_ratio as in doc_quality) -> exact dedup (min doc_id
    per text among survivors) -> MinHash-LSH near-dup pairs over the
    exact survivors (_sql_minhash_pairs) -> connected components via a
    recursive transitive-closure CTE with min-root (equals the engine's
    distributed min-label propagation). Output (doc_id, kept, reason)."""
    stop = "'the','a','and','of','to','in','is','on','for','with'"
    return f"""WITH RECURSIVE q AS (
  SELECT doc_id, text,
         (len(string_split_regex(trim(text), '\\s+')) >= {min_words}
          AND round(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                        x -> x IN ({stop}))) AS DOUBLE)
                    / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6)
              <= 0.9) AS q_ok
  FROM documents
),
e AS (
  SELECT doc_id, text,
         doc_id <> min(doc_id) OVER (PARTITION BY text) AS exact_dup
  FROM q WHERE q_ok
),
surv AS (SELECT doc_id, text FROM e WHERE NOT exact_dup),
nd AS (SELECT a, b FROM {_sql_minhash_pairs('surv', tau)} m),
nodes AS (SELECT a AS n FROM nd UNION SELECT b AS n FROM nd),
edges AS (SELECT a AS s, b AS d FROM nd UNION ALL SELECT b AS s, a AS d FROM nd),
reach(src, dst) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.src, e2.d FROM reach r JOIN edges e2 ON e2.s = r.dst
),
roots AS (SELECT src AS n, min(dst) AS root FROM reach GROUP BY src),
final AS (
  SELECT d.doc_id,
         CASE WHEN NOT q.q_ok THEN 'quality'
              WHEN COALESCE(e.exact_dup, FALSE) THEN 'exact_dup'
              WHEN r.root IS NOT NULL AND r.root <> d.doc_id THEN 'near_dup'
              ELSE '' END AS reason
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id
  LEFT JOIN e ON e.doc_id = d.doc_id
  LEFT JOIN roots r ON r.n = d.doc_id
)
SELECT doc_id, (reason = '') AS kept, reason FROM final"""


SQL_CORPUS_CLEAN = _sql_corpus_clean()

# exact restatement of pipelines/dedup.ngram_jaccard_pairs: UNhashed
# lowercased char-3-shingles, within-source pairs, jaccard >= 0.3
SQL_NGRAM_JACCARD = """WITH sh AS (
  SELECT doc_id, source,
         CASE WHEN length(lower(text)) = 0 THEN CAST([] AS VARCHAR[])
              WHEN length(lower(text)) < 3 THEN [lower(text)]
              ELSE list_distinct([substr(lower(text), x, 3)
                                  FOR x IN generate_series(1, length(lower(text)) - 2)])
         END AS s
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         CASE WHEN len(a.s) = 0 AND len(b.s) = 0 THEN 1.0
              ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.s, b.s))) END AS j
  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
)
SELECT a, b, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.3"""

_EMB_NORMS = """pos AS (SELECT unnest(generate_series(1, 64)) AS p),
norms AS (
  SELECT e.vec_id, sqrt(sum(pow(CAST(e.embedding[p.p] AS DOUBLE), 2))) AS nrm
  FROM embeddings e, pos p GROUP BY e.vec_id
)"""

SQL_ANN_TOPK = f"""WITH {_EMB_NORMS},
dots AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         sum(CAST(q.embedding[p.p] AS DOUBLE) * CAST(e.embedding[p.p] AS DOUBLE)) AS dot
  FROM embeddings q, embeddings e, pos p
  WHERE q.vec_id IN (0, 1, 2) AND e.vec_id <> q.vec_id
  GROUP BY q.vec_id, e.vec_id
),
sims AS (
  SELECT query_id, d.vec_id,
         d.dot / (nq.nrm * ne.nrm) AS sim
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms ne ON ne.vec_id = d.vec_id
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
  FROM sims
)
SELECT query_id, vec_id, round(sim, 6) AS sim
FROM ranked WHERE rn <= {ANN_K}"""

SQL_EMBED_NEARDUP = f"""WITH {_EMB_NORMS},
dots AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         sum(CAST(a.embedding[p.p] AS DOUBLE) * CAST(b.embedding[p.p] AS DOUBLE)) AS dot
  FROM embeddings a, embeddings b, pos p
  WHERE a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT d.a, d.b, round(d.dot / (na.nrm * nb.nrm), 6) AS sim
FROM dots d
JOIN norms na ON na.vec_id = d.a
JOIN norms nb ON nb.vec_id = d.b
WHERE d.dot / (na.nrm * nb.nrm) >= {NEARDUP_TAU}"""




DBSCAN_EPS = 4.0
DBSCAN_MIN_PTS = 4  # |eps-neighborhood| including the point itself


def q_dbscan(sf_dir: str) -> Dataset:
    """Distributed grid-based DBSCAN over the deterministic spatial
    projection of events (INT ids — the component machinery's
    contract): (instance_id, cluster, is_core), cluster = the
    component's smallest core id, border points adopt the min cluster
    among their core neighbors, noise = -1
    (stages/spatial_ops.dbscan; pairs via the mining grid join with
    cross_type=False, components via the corpus min-label
    propagation)."""
    import numpy as np
    import ray.data

    from ..sources.instances import (
        EVENTS_EXTENT,
        EVENTS_XMUL,
        EVENTS_YMUL_EVENT,
        EVENTS_YMUL_USER,
    )
    from ..stages.spatial_ops import dbscan

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )

    def project(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        uid = t["user_id"].to_numpy()
        return pa.table({
            "instance_id": pa.array(eid.astype(np.int64)),
            "feature": t["event_type"],
            "x": pa.array(((eid * EVENTS_XMUL) % EVENTS_EXTENT)
                          .astype(np.float64)),
            "y": pa.array(
                ((eid * EVENTS_YMUL_EVENT + uid * EVENTS_YMUL_USER)
                 % EVENTS_EXTENT).astype(np.float64)),
        })

    inst = ev.map_batches(project, batch_format="pyarrow")
    return dbscan(inst, eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS)


def _sql_dbscan() -> str:
    d = DBSCAN_EPS
    mp = DBSCAN_MIN_PTS
    return f"""WITH RECURSIVE i2 AS MATERIALIZED (
  SELECT CAST(event_id AS BIGINT) AS id,
         CAST((event_id * {{XM}}) % {{EX}} AS DOUBLE) AS x,
         CAST((event_id * {{YME}} + user_id * {{YMU}}) % {{EX}} AS DOUBLE) AS y
  FROM events
), dpairs AS MATERIALIZED (
  SELECT a.id AS a, b.id AS b FROM i2 a JOIN i2 b
    ON b.x >= a.x - {d} AND b.x <= a.x + {d}
   AND b.y >= a.y - {d} AND b.y <= a.y + {d}
   AND a.id < b.id
  WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {d * d}
), deg AS MATERIALIZED (
  SELECT n, COUNT(*) AS c
  FROM (SELECT a AS n FROM dpairs UNION ALL SELECT b FROM dpairs)
  GROUP BY n
), core AS MATERIALIZED (SELECT n FROM deg WHERE c + 1 >= {mp}),
cc AS MATERIALIZED (
  SELECT a, b FROM dpairs
  WHERE a IN (SELECT n FROM core) AND b IN (SELECT n FROM core)
),
nodes AS (SELECT a AS n FROM cc UNION SELECT b FROM cc),
cedges AS (SELECT a AS s, b AS d FROM cc UNION ALL SELECT b, a FROM cc),
reach(src, dst) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.src, e.d FROM reach r JOIN cedges e ON e.s = r.dst
),
roots AS (SELECT src AS n, MIN(dst) AS root FROM reach GROUP BY src),
clab AS (  -- every core's cluster; isolated cores self-root
  SELECT c.n, COALESCE(r.root, c.n) AS cluster
  FROM core c LEFT JOIN roots r ON r.n = c.n
),
heard AS (  -- min core-neighbor cluster per node (either direction)
  SELECT e.node, MIN(cl.cluster) AS cluster
  FROM (SELECT a AS node, b AS nbr FROM dpairs
        UNION ALL SELECT b, a FROM dpairs) e
  JOIN clab cl ON cl.n = e.nbr
  GROUP BY e.node
)
SELECT i2.id AS instance_id,
       CAST(COALESCE(cl.cluster, h.cluster, -1) AS BIGINT) AS cluster,
       cl.n IS NOT NULL AS is_core
FROM i2
LEFT JOIN clab cl ON cl.n = i2.id
LEFT JOIN heard h ON h.node = i2.id"""


def sql_dbscan() -> str:
    from ..sources.instances import (
        EVENTS_EXTENT,
        EVENTS_XMUL,
        EVENTS_YMUL_EVENT,
        EVENTS_YMUL_USER,
    )

    return (
        _sql_dbscan()
        .replace("{XM}", str(EVENTS_XMUL))
        .replace("{EX}", str(EVENTS_EXTENT))
        .replace("{YME}", str(EVENTS_YMUL_EVENT))
        .replace("{YMU}", str(EVENTS_YMUL_USER))
    )


SPATIAL_QUERIES = {
    "colo_knn": q_knn,
    "colo_dbscan": q_dbscan,
    "colo_point_in_polygon": q_pip,
    "colo_rasterize": q_rasterize,
    "colo_raster_boxes": q_raster_boxes,
    "events_windowed": q_events_windowed,
    "events_sessions": q_events_sessions,
    "events_asof": q_events_asof,
    "orders_enriched": q_orders_enriched,
    "lineitem_enriched": q_lineitem_enriched,
    "lineitem_in_window": q_lineitem_in_window,
    "events_rolling": q_events_rolling,
    "events_distinct_users": q_events_distinct_users,
    "customer_active": q_customer_active,
    "customer_inactive": q_customer_inactive,
    "customer_orders_left": q_customer_orders_left,
    "top_building_orders": q_top_building_orders,
    "price_histogram": q_price_histogram,
    "orders_price_rank": q_orders_price_rank,
}

SPATIAL_SQL = {
    "events_sessions": SQL_EVENTS_SESSIONS,
    "events_asof": SQL_EVENTS_ASOF,
    "lineitem_enriched": SQL_LINEITEM_ENRICHED,
    "lineitem_in_window": SQL_LINEITEM_IN_WINDOW,
    "events_rolling": SQL_EVENTS_ROLLING,
    "events_distinct_users": SQL_EVENTS_DISTINCT_USERS,
    "colo_knn": SQL_KNN,
    "colo_dbscan": sql_dbscan(),
    "colo_point_in_polygon": SQL_PIP,
    "colo_rasterize": SQL_RASTERIZE,
    "colo_raster_boxes": SQL_RASTER_BOXES,
    "events_windowed": SQL_EVENTS_WINDOWED,
    "orders_enriched": SQL_ORDERS_ENRICHED,
    "customer_active": SQL_CUSTOMER_ACTIVE,
    "customer_inactive": SQL_CUSTOMER_INACTIVE,
    "customer_orders_left": SQL_CUSTOMER_ORDERS_LEFT,
    "top_building_orders": SQL_TOP_BUILDING_ORDERS,
    "price_histogram": SQL_PRICE_HISTOGRAM,
    "orders_price_rank": SQL_ORDERS_PRICE_RANK,
}

def q_corpus_clean(sf_dir: str) -> Dataset:
    """Returns the verdict DATASET (clean_corpus streams; the driver's
    oracle compare consumes it — no driver-side materialization inside
    the pipeline itself)."""
    from . import corpus

    return corpus.clean_corpus(_docs(sf_dir))


DATA_QUERIES = {
    "corpus_clean": q_corpus_clean,
    "doc_quality": q_doc_quality,
    "token_totals": q_token_totals,
    "token_topk": q_token_topk,
    "bigram_topk": q_bigram_topk,
    "doc_top_terms": q_doc_top_terms,
    "doc_boilerplate": q_doc_boilerplate,
    "doc_decontaminate": q_doc_decontaminate,
    "doc_langid": q_langid,
    "doc_fingerprints": q_fingerprints,
    "dedup_exact": q_dedup_exact,
    "dedup_exact_latest": q_dedup_exact_latest,
    "dedup_minhash_lsh": q_minhash_neardup,
    "dedup_simhash": q_simhash,
    "dedup_simhash_neardup": q_simhash_neardup,
    "dedup_ngram_jaccard": q_ngram_pairs,
    "ann_topk": q_ann_topk,
    "ann_topk_lsh": q_ann_topk_lsh,
    "ann_topk_ivf": q_ann_topk_ivf,
    "embed_neardup": q_embed_neardup,
    "embed_clusters": q_embed_clusters,
    "embed_neardup_lsh": q_embed_neardup_lsh,
    "image_phash": q_image_phash,
    "image_phash_neardup": q_image_phash_neardup,
    "audio_features": q_audio_features,
    "video_frames": q_video_frames,
    "image_stats": q_image_stats,
    "doc_sample": q_doc_sample,
    "docs_topk_per_source": q_docs_topk_per_source,
    "docs_median_chars": q_docs_median_chars,
    "image_resize": q_image_resize,
    "embed_quantize": q_embed_quantize,
    "ann_topk_int8": q_ann_topk_int8,
}


def _golden_sql(name: str) -> str | None:
    """Committed VALUES-literal oracle for deterministic approximate ops
    (fixed seed -> byte-stable output; regenerate with
    tools/gen_value_goldens.py). Valid at the driver's sf0.01 inputs."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "goldens", f"{name}_sf001.sql",
    )
    if os.path.exists(path):
        with open(path) as f:
            return f.read()
    return None

DATA_SQL = {
    "doc_quality": SQL_DOC_QUALITY,
    "token_totals": SQL_TOKEN_TOTALS,
    "token_topk": SQL_TOKEN_TOPK,
    "bigram_topk": SQL_BIGRAM_TOPK,
    "doc_top_terms": SQL_DOC_TOP_TERMS,
    "doc_boilerplate": SQL_DOC_BOILERPLATE,
    "doc_decontaminate": SQL_DOC_DECONTAMINATE,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_exact_latest": SQL_DEDUP_EXACT_LATEST,
    "ann_topk": SQL_ANN_TOPK,
    "embed_neardup": SQL_EMBED_NEARDUP,
    "doc_langid": SQL_LANGID,
    "doc_fingerprints": SQL_FINGERPRINTS,
    "dedup_simhash": SQL_SIMHASH,
    "dedup_simhash_neardup": SQL_SIMHASH_NEARDUP,
    "dedup_ngram_jaccard": SQL_NGRAM_JACCARD,
    "dedup_minhash_lsh": SQL_MINHASH,
    "corpus_clean": SQL_CORPUS_CLEAN,
    # the composed LSH near-dup's parameters make it exact at this scale
    # (per-pair miss ~1e-3; verified table-equal to the all-pairs op at
    # sf0.01), so it shares the exact op's SQL oracle
    "embed_neardup_lsh": SQL_EMBED_NEARDUP,
    "doc_sample": SQL_DOC_SAMPLE,
    "docs_topk_per_source": SQL_DOCS_TOPK,
    "docs_median_chars": SQL_DOCS_MEDIAN,
    "embed_quantize": SQL_EMBED_QUANTIZE,
}

# ann_topk_lsh / ann_topk_ivf: approximate by design (no SQL can restate
# hyperplane-sign / k-means bucketing), but deterministic under their
# fixed seeds -- committed VALUES goldens (tools/gen_value_goldens.py)
# give the driver an exact comparison target; recall is separately
# tested against the exact baseline (tests/test_similarity.py).
for _n in ("ann_topk_lsh", "ann_topk_ivf", "ann_topk_int8", "embed_clusters"):
    _g = _golden_sql(_n)
    if _g:
        DATA_SQL[_n] = _g

# image_phash / image_phash_neardup / audio_features / video_frames:
# decoded-media outputs cannot be restated in SQL, but the pipelines are
# deterministic -- the committed VALUES goldens (gated on an
# events-table fingerprint) are their exact oracles.
for _n in ("image_phash", "image_phash_neardup", "image_stats",
           "image_resize", "audio_features", "video_frames",
           "events_hll_users"):
    _g = _golden_sql(_n)
    if _g:
        DATA_SQL[_n] = _g


COLO_QUERIES = {
    "colo_instances": q_instances,
    "colo_feature_counts": q_feature_counts,
    "colo_cell_assign": q_cell_assign,
    "colo_neighbor_pairs": q_neighbor_pairs,
    "colo_ordered_edges": q_ordered_edges,
    "colo_star_sizes": q_star_sizes,
    "colo_patterns_k2": q_patterns_k2,
    "colo_patterns": q_patterns_full,
    "colo_patterns_salted": q_patterns_salted,
}

COLO_SQL = {
    "colo_instances": SQL_INSTANCES,
    "colo_feature_counts": SQL_FEATURE_COUNTS,
    "colo_cell_assign": SQL_CELL_ASSIGN,
    "colo_neighbor_pairs": SQL_NEIGHBOR_PAIRS,
    "colo_ordered_edges": SQL_ORDERED_EDGES,
    "colo_star_sizes": SQL_STAR_SIZES,
    "colo_patterns_k2": SQL_PATTERNS_K2,
    # Full mining: unrolled k<=3 apriori SQL, exact at the driver's fixed
    # (d, mp) where the maximal prevalent pattern is k=2 and the SQL's k=3
    # level double-checks that none is spuriously emitted or missed.
    # General-k conformance is pytest's engine-vs-oracle gate plus the
    # LasVegas golden (tests/test_reference_data.py).
    "colo_patterns": sql_patterns_full(),
    "colo_patterns_salted": sql_patterns_full(),
}


# warehouse-analytics family (full outer join, JSON extraction, set ops,
# rollup, pivot, embedding norms) lives in its own module; merged here
# so the driver registry stays one import
from .analytics import ANALYTICS_QUERIES, ANALYTICS_SQL  # noqa: E402

DATA_QUERIES.update(ANALYTICS_QUERIES)
DATA_SQL.update(ANALYTICS_SQL)
