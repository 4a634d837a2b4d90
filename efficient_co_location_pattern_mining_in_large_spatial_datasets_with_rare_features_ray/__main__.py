"""CLI entry point mirroring the reference's main (src/main.cpp:31-122):

    python -m efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray \
        --config config.txt --input data.csv --output results/

Reads the reference's key=value config format, mines, and writes the
report + pattern parquet to the configured/overridden output path
(honoring it, unlike the reference's hard-coded ../results.txt).
Accepts CSV (reference layout), parquet instance tables, or image+caption
tables (--image-table).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        description="Ray-Data co-location pattern mining (rare-feature WPI)"
    )
    p.add_argument("--config", default=None, help="reference key=value config file")
    p.add_argument("--input", required=True, help="CSV / parquet / image-table dir")
    p.add_argument("--output", default="./results", help="output directory")
    p.add_argument("--image-table", action="store_true",
                   help="input is an image+caption table (geotag projection)")
    p.add_argument("--distance", type=float, default=None)
    p.add_argument("--min-prev", type=float, default=None)
    p.add_argument("--measure", choices=["wpi", "pi"], default="wpi")
    p.add_argument("--mode", choices=["subtree", "salted"], default="subtree")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--verify-invariants", action="store_true")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import load_config_file, MiningConfig
    from .pipelines import colocation, multimodal
    from .sources.instances import read_instances_csv

    base = load_config_file(args.config) if args.config else MiningConfig()
    cfg = MiningConfig(
        neighbor_distance=args.distance if args.distance is not None else base.neighbor_distance,
        min_prevalence=args.min_prev if args.min_prev is not None else base.min_prevalence,
        measure=args.measure,
    )

    if args.image_table:
        if args.mode == "salted":
            from .sources.geotag import geotag
            from .sources.images import GEOTAG_COLUMNS, read_image_table

            run = colocation.mine_coordinated(
                geotag(read_image_table(args.input, columns=GEOTAG_COLUMNS)),
                cfg,
            )
        else:
            run = multimodal.mine_image_table(
                args.input, cfg, verify_invariants=args.verify_invariants
            )
    else:
        if args.input.endswith(".csv"):
            inst = read_instances_csv(args.input)
        else:
            import ray.data

            inst = ray.data.read_parquet(args.input)
        run = (
            colocation.mine_coordinated(inst, cfg)
            if args.mode == "salted"
            else colocation.mine(inst, cfg)
        )

    report = colocation.write_results(run, args.output)
    print(json.dumps(report, indent=2))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
