"""Spatial instance-table readers.

The engine's native input is any table projectable to
``instances(instance_id: string, feature: string, x: float64,
y: float64)`` -- the Arrow equivalent of the reference's SpatialInstance
rows (include/types.h:40-44). Provided readers:

* ``read_instances_csv``  -- the reference's CSV layout
  (``Feature,Instance,LocX,LocY``, src/data_loader.cpp:20-36), with
  ``instance_id = Feature + Instance`` synthesized the same way and
  extra columns (e.g. ``Checkin``) dropped.
* ``instances_from_events`` -- deterministic projection of the testdata
  ``events`` table onto a synthetic 1000x1000 spatial domain (integer
  hash coordinates, exactly reproducible in SQL for the DuckDB oracle).
* geotagged image tables live in ``sources/geotag.py``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

# Derivation constants shared verbatim with the SQL oracle in
# __ray_entry__.py -- change one, change both.
EVENTS_XMUL = 7919
EVENTS_YMUL_EVENT = 104729
EVENTS_YMUL_USER = 7919
EVENTS_EXTENT = 1000


def instances_from_events(sf_dir: str) -> Dataset:
    """events(event_id, user_id, event_type, ...) -> instances.

    x = (event_id * 7919) % 1000
    y = (event_id * 104729 + user_id * 7919) % 1000
    feature = event_type, instance_id = str(event_id).
    Integer modular arithmetic in int64 -> the double coordinates are
    exact in both Arrow and DuckDB."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )

    def fn(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        uid = t["user_id"].to_numpy()
        x = (eid * EVENTS_XMUL) % EVENTS_EXTENT
        y = (eid * EVENTS_YMUL_EVENT + uid * EVENTS_YMUL_USER) % EVENTS_EXTENT
        return pa.table(
            {
                "instance_id": pc.cast(t["event_id"], pa.string()),
                "feature": t["event_type"],
                "x": pa.array(x.astype("float64")),
                "y": pa.array(y.astype("float64")),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


EVENTS_INSTANCES_SQL = (
    "SELECT CAST(event_id AS VARCHAR) AS instance_id, "
    "event_type AS feature, "
    f"CAST((event_id * {EVENTS_XMUL}) % {EVENTS_EXTENT} AS DOUBLE) AS x, "
    f"CAST((event_id * {EVENTS_YMUL_EVENT} + user_id * {EVENTS_YMUL_USER}) "
    f"% {EVENTS_EXTENT} AS DOUBLE) AS y "
    "FROM events"
)


def read_instances_csv(path: str) -> Dataset:
    """Reference CSV layout: Feature,Instance,LocX,LocY[,extra...]
    (include/data_loader.h:23-31); id = Feature + Instance
    (src/data_loader.cpp:28).

    Also accepts the ``X,Y`` header variant used by the reference's own
    bundled ``data/5k_15f_50k.csv`` (which the reference loader itself
    cannot read -- it hardcodes LocX/LocY); this reader maps either
    header pair onto the canonical schema."""
    ds = ray.data.read_csv(path)

    def fn(t: pa.Table) -> pa.Table:
        names = set(t.column_names)
        xcol, ycol = ("LocX", "LocY") if "LocX" in names else ("X", "Y")
        feat = pc.cast(t["Feature"], pa.string())
        inst = pc.cast(t["Instance"], pa.string())
        return pa.table(
            {
                "instance_id": pc.binary_join_element_wise(feat, inst, ""),
                "feature": feat,
                "x": pc.cast(t[xcol], pa.float64()),
                "y": pc.cast(t[ycol], pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
