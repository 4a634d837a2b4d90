"""Regenerate the committed VALUES-literal oracles for the deterministic
approximate ANN queries (ann_topk_lsh, ann_topk_ivf).

These ops are approximate by design -- no SQL can restate hyperplane-sign
or k-means bucketing -- but their fixed seeds make the output byte-stable,
so a committed golden gives the driver an exact comparison target at its
sf0.01 inputs. Recall quality is tested separately against the exact
brute-force baseline (tests/test_similarity.py).

Usage: python tools/gen_value_goldens.py [sf_dir]
Writes goldens/{name}_sf001.sql.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def input_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the embeddings input the golden is valid
    for: row count + rounded sum over every embedding value (row count
    alone cannot distinguish scale factors -- sf0.001 and sf0.01 both
    carry 500 vectors)."""
    import duckdb

    n, s = duckdb.sql(
        "SELECT count(*), round(sum(list_aggregate(embedding, 'sum')), 3) "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()
    return f"{n}:{s}"


def events_guard(sf_dir: str) -> str:
    """Boolean SQL guard for goldens whose input derives from the events
    table (image pHash family): row count + sum(user_id) pin the exact
    input the golden was generated from."""
    import duckdb

    n, s = duckdb.sql(
        "SELECT count(*), CAST(sum(user_id) AS BIGINT) "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    return f"count(*) = {n} AND CAST(sum(user_id) AS BIGINT) = {s}"


def _guarded_values_sql(t, float_cols: set[str], fp_cte: str) -> str:
    """Shared body of every golden: VALUES literal + the loud
    GOLDEN_INPUT_MISMATCH sentinel, behind the given fp CTE guard."""
    cols = t.column_names
    lines = []
    for row in t.to_pylist():
        vals = []
        for c in cols:
            v = row[c]
            if c in float_cols:
                vals.append(f"CAST({v!r} AS DOUBLE)")
            else:
                vals.append(repr(v))
        lines.append("  (" + ", ".join(vals) + ")")
    collist = ", ".join(cols)
    # guard: the golden is ONLY a valid oracle for the exact input it was
    # generated from. On any other input the SQL yields a single loud
    # sentinel row instead of silently comparing against the wrong oracle.
    return (
        fp_cte + "\n"
        f"SELECT * FROM (VALUES\n" + ",\n".join(lines) + f"\n) AS t({collist})\n"
        "WHERE (SELECT ok FROM fp)\n"
        "UNION ALL\n"
        f"SELECT {', '.join('-999999' for _ in cols)}\n"
        "WHERE NOT (SELECT ok FROM fp)  -- GOLDEN_INPUT_MISMATCH sentinel"
    )


def to_values_sql_guarded(t, float_cols: set[str], guard_expr: str,
                          guard_table: str) -> str:
    """VALUES golden guarded by an arbitrary boolean aggregate over
    ``guard_table`` (same sentinel contract as to_values_sql)."""
    return (
        "-- committed golden (deterministic output at sf0.01);\n"
        "-- regenerate with tools/gen_value_goldens.py\n"
        + _guarded_values_sql(
            t, float_cols,
            f"WITH fp AS (SELECT {guard_expr} AS ok FROM {guard_table})",
        )
    )


def to_values_sql(t, float_cols: set[str], fp: str) -> str:
    n, sm = fp.split(":")
    return (
        "-- committed golden (deterministic fixed-seed output at sf0.01);\n"
        "-- regenerate with tools/gen_value_goldens.py\n"
        f"-- input-fingerprint {fp}\n"
        + _guarded_values_sql(
            t, float_cols,
            "WITH fp AS (SELECT count(*) = " + n
            + " AND round(sum(list_aggregate(embedding, 'sum')), 3) = " + sm
            + " AS ok FROM embeddings)",
        )
    )


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        queries as q,
    )

    fp = input_fingerprint(SF_DIR)
    for name, fn in (
        ("ann_topk_lsh", q.q_ann_topk_lsh),
        ("ann_topk_ivf", q.q_ann_topk_ivf),
        ("ann_topk_int8", q.q_ann_topk_int8),
        ("embed_clusters", q.q_embed_clusters),
    ):
        t = fn(SF_DIR)
        sql = to_values_sql(t, float_cols={"sim"}, fp=fp)
        out = os.path.join(REPO, "goldens", f"{name}_sf001.sql")
        with open(out, "w") as f:
            f.write(sql)
        print(f"wrote {out} ({t.num_rows} rows)")
    guard = events_guard(SF_DIR)
    for name, fn, fcols in (
        ("image_phash", q.q_image_phash, set()),
        ("image_phash_neardup", q.q_image_phash_neardup, set()),
        ("image_stats", q.q_image_stats,
         {"mean_r", "mean_g", "mean_b", "std_gray"}),
        ("image_resize", q.q_image_resize, set()),
        ("audio_features", q.q_audio_features, {"duration_s", "rms"}),
        ("video_frames", q.q_video_frames, {"mean_gray"}),
        ("events_hll_users", q.DATA_QUERIES["events_hll_users"], set()),
    ):
        t = fn(SF_DIR)
        sql = to_values_sql_guarded(t, float_cols=fcols, guard_expr=guard,
                                    guard_table="events")
        out = os.path.join(REPO, "goldens", f"{name}_sf001.sql")
        with open(out, "w") as f:
            f.write(sql)
        print(f"wrote {out} ({t.num_rows} rows)")
    ray.shutdown()


if __name__ == "__main__":
    main()
