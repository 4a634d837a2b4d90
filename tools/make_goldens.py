"""Generate committed golden pattern tables from the serial oracle.

The goldens pin the exact prevalent-pattern output (pattern, k, wpi, pi,
n_rows) of the pure-Python serial oracle (oracle.py -- an independent
reimplementation of the reference's single-threaded pipeline,
src/main.cpp:31-122) on the reference's own bundled datasets. Tests in
tests/test_reference_data.py assert the Ray engine reproduces them
bit-exactly in both distributed modes.

Usage: python tools/make_goldens.py   (writes goldens/*.parquet)
"""

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.oracle import (  # noqa: E402
    mine_serial,
)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")

DATASETS = {
    # the reference's primary dataset + its config defaults
    # (config/config.txt:1-12: neighbor_distance=160, min_prevalence=0.15)
    "lasvegas_d160_mp015": (
        "/root/reference/data/LasVegas_x_y_alphabet_version_03_2.csv", 160.0, 0.15
    ),
    # its toy sample (src/data_loader.cpp layout), mined at a tight radius
    "sample_d3_mp030": ("/root/reference/data/sample_data.csv", 3.0, 0.30),
}


def oracle_table(csv_path: str, d: float, mp: float) -> pa.Table:
    df = pd.read_csv(csv_path)
    xcol, ycol = ("LocX", "LocY") if "LocX" in df.columns else ("X", "Y")
    ids = (df["Feature"].astype(str) + df["Instance"].astype(str)).to_numpy(object)
    feats = df["Feature"].astype(str).to_numpy(object)
    res = mine_serial(
        ids, feats, df[xcol].to_numpy(), df[ycol].to_numpy(), d, mp,
        use_lemma3=False,
    )
    recs = res["patterns"]
    return pa.table(
        {
            "pattern": pa.array([",".join(r["pattern"]) for r in recs], pa.string()),
            "k": pa.array([r["k"] for r in recs], pa.int32()),
            "wpi": pa.array([round(r["wpi"], 9) for r in recs], pa.float64()),
            "pi": pa.array([round(r["pi"], 9) for r in recs], pa.float64()),
            "n_rows": pa.array([r["n_rows"] for r in recs], pa.int64()),
        }
    ).sort_by([("k", "ascending"), ("pattern", "ascending")])


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, (path, d, mp) in DATASETS.items():
        t = oracle_table(path, d, mp)
        out = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(t, out)
        print(f"{name}: {t.num_rows} patterns -> {out}")


if __name__ == "__main__":
    main()
