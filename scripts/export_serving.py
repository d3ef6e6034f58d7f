#!/usr/bin/env python
"""Compile trained run folders into self-contained serving artifacts.

TPU-native deployment path with no reference equivalent (the reference's
inference scripts re-run python decision loops): each run is calibrated and
AOT-exported (``infer/serving.py``) into one ``.osgr`` file — StableHLO +
baked weights/statistics/threshold — loadable with nothing but jax via
``load_serving_artifact``.

    python scripts/export_serving.py --data-path data/raw_tracks \
        --model-names PCAA_Abl2_V4.8.1 ORCED_8.1 --ks 6
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opensetgaitrecognition_pcaa_tpu.infer.serving import (  # noqa: E402
    export_orced_decision,
    export_pcaa_decision,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-names", nargs="+", required=True)
    p.add_argument("--models-path", default="models")
    p.add_argument("--data-path", default=None, help="raw tracks root (for split regeneration during calibration)")
    p.add_argument("--ks", type=int, nargs="+", default=[6], help="PCAA voting-window sizes (one artifact each)")
    p.add_argument(
        "--no-generate-dataset",
        action="store_true",
        help="calibrate against already-generated splits",
    )
    args = p.parse_args()

    for name in args.model_names:
        is_orced = name.upper().startswith("ORCED")
        if is_orced:
            path, meta = export_orced_decision(
                name,
                models_path=args.models_path,
                data_path=args.data_path,
                generate_dataset=not args.no_generate_dataset,
            )
            size = os.path.getsize(path) / 1e6
            print(f"{name}: {path} ({size:.1f} MB) "
                  f"inputs={meta['inputs']}")
        else:
            for k in args.ks:
                path, meta = export_pcaa_decision(
                    name,
                    k,
                    models_path=args.models_path,
                    data_path=args.data_path,
                    generate_dataset=not args.no_generate_dataset,
                )
                size = os.path.getsize(path) / 1e6
                print(f"{name} k={k}: {path} ({size:.1f} MB) "
                      f"threshold={meta['log_threshold']:.3f}")


if __name__ == "__main__":
    main()
