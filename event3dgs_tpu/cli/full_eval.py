"""Full-evaluation driver: train → render → metrics across scenes.

Reference `full_eval.py:15-75` (inherited from 3DGS): orchestrates the other
entry points over a list of scene directories.  Uses in-process calls rather
than the reference's `os.system` shelling.

    python -m event3dgs_tpu.cli.full_eval --scenes <dir1> <dir2> \
        --output_path ./eval [--gray --event] [--skip_training] ...
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="Train+render+metrics over scenes")
    p.add_argument("--scenes", nargs="+", required=True)
    p.add_argument("--output_path", default="./eval")
    p.add_argument("--iterations", type=int, default=30_000)
    p.add_argument("--gray", action="store_true")
    p.add_argument("--event", action="store_true")
    p.add_argument("--deblur", action="store_true")
    p.add_argument("--skip_training", action="store_true")
    p.add_argument("--skip_rendering", action="store_true")
    p.add_argument("--skip_metrics", action="store_true")
    args = p.parse_args(argv)

    from event3dgs_tpu.cli import evaluate, metrics, render, train

    model_paths = []
    for scene in args.scenes:
        name = os.path.basename(os.path.normpath(scene))
        model_path = os.path.join(args.output_path, name)
        model_paths.append(model_path)
        if not args.skip_training:
            argv_train = [
                "-s", scene, "-m", model_path,
                "--iterations", str(args.iterations), "--quiet",
            ]
            for flag in ("gray", "event", "deblur"):
                if getattr(args, flag):
                    argv_train.append(f"--{flag}")
            print(f"=== training {name}")
            train.main(argv_train)
        if not args.skip_rendering:
            print(f"=== rendering {name}")
            render.main(["-m", model_path])
        if not args.skip_metrics:
            print(f"=== evaluating {name}")
            evaluate.main(["-m", model_path])
    if not args.skip_metrics:
        metrics.main(["-m", *model_paths])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
