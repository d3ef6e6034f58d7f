#!/usr/bin/env python
"""Summarize the 50-epoch campaign's results.json into the
RESULTS_SYNTHETIC.md round-4 tables (same shape as the round-2 section).

Usage: python tools/summarize_campaign50.py [/tmp/campaign50/results.json]
"""
import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/campaign50/results.json"
    rows = json.load(open(path))

    def table(rs, ks):
        groups = defaultdict(list)
        for r in rs:
            groups[(int(r["n_train"]), r["k"])].append(r)
        out = [
            "| n_train | k | mean f1_micro | mean f1_macro "
            "| mean f1_weighted | best split f1_micro |",
            "|---|---|---|---|---|---|",
        ]
        for (n, k) in sorted(groups, key=lambda t: (t[0], str(t[1]))):
            rs_ = groups[(n, k)]
            mean = lambda key: sum(r[key] for r in rs_) / len(rs_)  # noqa: E731
            out.append(
                f"| {n} | {k} | {mean('f1_micro'):.3f} | {mean('f1_macro'):.3f} "
                f"| {mean('f1_weighted'):.3f} "
                f"| {max(r['f1_micro'] for r in rs_):.3f} |"
            )
        return "\n".join(out)

    pcaa = [r for r in rows if r["run"].startswith("PCAA_") and r["k"] in (1, 6)]
    orced = [r for r in rows if r["run"].startswith("ORCED_")]
    print("PCAA V4 (%d rows):\n" % len(pcaa))
    print(table(pcaa, (1, 6)))
    print("\nORCED ensemble (%d rows):\n" % len(orced))
    print(table(orced, ("ens",)))

    # best-valid spread across the 20 PCAA trainings (run_complete.json)
    import os

    models = os.path.join(os.path.dirname(path), "models")
    vaccs = []
    for run in sorted(os.listdir(models)):
        if ".importing." in run or run.endswith(".replaced"):
            continue  # importer staging/backup dirs (import_reference_run.py)
        f = os.path.join(models, run, "run_complete.json")
        if run.startswith("PCAA_") and os.path.exists(f):
            d = json.load(open(f))
            if "best_valid_accuracy" in d:
                vaccs.append(d["best_valid_accuracy"])
    if vaccs:
        import statistics

        print(
            f"\nPCAA best closed-set valid acc over {len(vaccs)} runs: "
            f"min {min(vaccs):.2f} median {statistics.median(vaccs):.2f} "
            f"max {max(vaccs):.2f}"
        )


if __name__ == "__main__":
    main()
