"""As-of join over keyed event logs, Ray-Data-first.

The reference engine has no temporal joins (its tables are static
spatial instances); this operator belongs to the large-scale
training-data family the engine adds on top (clickstream feature
attachment, label as-of lookup, point-in-time joins for feature
stores).

Shape: for every LEFT row, attach the latest RIGHT row of the same key
with ``right.ts <= left.ts`` (ties on ts broken by the largest right
``tie`` column -- a deterministic total order). Implemented as ONE hash
shuffle: both sides are projected to a common tagged schema and
unioned, then ``groupby(key).map_groups`` co-groups them and a
vectorized ``searchsorted`` over the ts-sorted right side finds every
match at once. No driver materialization, no per-row Python.

Partitioning assumption (documented per the custom-operator contract):
all rows of ONE key must fit in a single task -- true for user-keyed
event logs (a user's history is bounded); a pathological hot key would
need the same salt-and-merge treatment the mining path's salted mode
applies (split the key, take per-salt partial maxima, merge the
per-salt winners with one more tiny shuffle).

Semantics are inner as-of: left rows with no matching right row are
dropped (the SQL restatement is a CROSS JOIN LATERAL ... LIMIT 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

_SIDE_LEFT = np.int8(0)
_SIDE_RIGHT = np.int8(1)


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str = "user_id",
    ts: str = "ts",
    left_id: str = "event_id",
    right_value: str = "value",
    right_tie: str = "event_id",
) -> Dataset:
    """Inner as-of join of two keyed, timestamped Datasets.

    Output columns: ``left_id, key, ts, asof_ts, asof_value`` where
    (asof_ts, asof_value) come from the latest right row at-or-before
    the left row's ts for the same key.
    """

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: df[key],
                ts: df[ts],
                "id": df[left_id].astype(np.int64),
                "val": np.zeros(len(df), np.float64),
                "side": np.full(len(df), _SIDE_LEFT),
            }
        )

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: df[key],
                ts: df[ts],
                "id": df[right_tie].astype(np.int64),
                "val": df[right_value].astype(np.float64),
                "side": np.full(len(df), _SIDE_RIGHT),
            }
        )

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        mask = df["side"].to_numpy() == _SIDE_RIGHT
        lf = df[~mask]
        rt = df[mask].sort_values([ts, "id"], kind="stable")
        out_cols = {
            left_id: np.empty(0, np.int64),
            key: lf[key].iloc[:0],
            ts: lf[ts].iloc[:0],
            "asof_ts": rt[ts].iloc[:0],
            "asof_value": np.empty(0, np.float64),
        }
        if len(lf) == 0 or len(rt) == 0:
            return pd.DataFrame(out_cols)
        rts = rt[ts].to_numpy()
        lts = lf[ts].to_numpy()
        # side="right" lands after every equal ts; -1 = the LAST right row
        # with ts <= left ts. rt is (ts, id)-sorted, so equal-ts ties
        # resolve to the largest id -- same total order as the SQL's
        # ORDER BY ts DESC, id DESC LIMIT 1.
        idx = np.searchsorted(rts, lts, side="right") - 1
        found = idx >= 0
        take = idx[found]
        return pd.DataFrame(
            {
                left_id: lf["id"].to_numpy(np.int64)[found],
                key: lf[key].to_numpy()[found],
                ts: lts[found],
                "asof_ts": rts[take],
                "asof_value": rt["val"].to_numpy(np.float64)[take],
            }
        )

    return tagged.groupby(key).map_groups(per_key, batch_format="pandas")
