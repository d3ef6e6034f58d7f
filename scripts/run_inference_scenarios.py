#!/usr/bin/env python
"""Per-scenario open-set inference over pre-trained PCAA V4 runs.

Reference oracle: ``inference_scenarios.py:8-41`` — run the PCAA inference
restricted to each single walking scenario, ks = [6, 4, 2, 1], over a list
of trained run names.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opensetgaitrecognition_pcaa_tpu.config import SCENARIO
from opensetgaitrecognition_pcaa_tpu.infer import pcaa_inference


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--models-path", default="models")
    p.add_argument("--figures-path", default="figures")
    p.add_argument("--model-names", nargs="+", required=True)
    p.add_argument("--ks", type=int, nargs="+", default=[6, 4, 2, 1])
    p.add_argument(
        "--no-generate-dataset",
        action="store_true",
        help="reuse existing generated splits (skip regeneration entirely)",
    )
    args = p.parse_args()

    for i, scenario in enumerate(SCENARIO):
        print(f"=== scenario {scenario.value} ===")
        pcaa_inference(
            args.model_names,
            ks=args.ks,
            models_path=args.models_path,
            figures_path=args.figures_path,
            data_path=args.data_path,
            scenarios_list=[scenario],
            # splits don't depend on the scenario (filtering happens at
            # load time) — generate once on the first pass, not 3× per
            # model on this 1-core box
            generate_dataset=not args.no_generate_dataset and i == 0,
        )


if __name__ == "__main__":
    main()
