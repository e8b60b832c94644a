"""Training entry point (reference `train.py:400-433`).

Example (the reference's recommended event recipe, Readme.md:90):

    python -m event3dgs_tpu.cli.train -s <scene> --gray --event \
        --iterations 8000
"""

from __future__ import annotations

import argparse
import os
import sys

from event3dgs_tpu.cli.common import (
    add_event_args,
    claim_accelerator,
    add_model_args,
    add_optimization_args,
    add_pipeline_args,
    config_from_args,
    load_scene_and_state,
    mode_from_config,
    prepare_output_dir,
)
from event3dgs_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    save_point_cloud,
)
from event3dgs_tpu.train.loop import TrainCallbacks, train_loop

DEFAULT_SAVE_ITERATIONS = [
    399, 999, 1399, 1699, 1999, 2999, 3999, 4999, 5999, 6999, 7999, 8999,
    9999, 10999, 13999,
]  # reference `train.py:413,415`


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train an Event-3DGS model (TPU)")
    add_model_args(p)
    add_pipeline_args(p)
    add_optimization_args(p)
    add_event_args(p)
    p.add_argument("--test_iterations", nargs="+", type=int, default=[])
    p.add_argument("--save_iterations", nargs="+", type=int,
                   default=DEFAULT_SAVE_ITERATIONS)
    p.add_argument("--checkpoint_iterations", nargs="+", type=int,
                   default=DEFAULT_SAVE_ITERATIONS)
    p.add_argument("--start_checkpoint", type=str, default=None)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    # GUI server (reference network_gui; `--port -1` disables)
    p.add_argument("--ip", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=-1)
    # multi-chip mesh (parallel/): views batch over `data`, Gaussian storage
    # shards over `gauss`; 0 = single-device loop.  Multi-host jobs also
    # pass --coordinator/--num_processes/--process_id (jax.distributed).
    p.add_argument("--mesh_data", type=int, default=0)
    p.add_argument("--mesh_gauss", type=int, default=0)
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.source_path:
        print("error: --source_path/-s is required", file=sys.stderr)
        return 2
    if args.coordinator is not None:
        # must run before any other JAX call (parallel/distributed.py)
        from event3dgs_tpu.parallel.distributed import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    claim_accelerator()  # before the (minutes-long) dataset load
    cfg = config_from_args(args)
    cfg.save_iterations = tuple(
        sorted(set(args.save_iterations) | {cfg.optimization.iterations})
    )
    cfg.checkpoint_iterations = tuple(args.checkpoint_iterations)
    cfg.test_iterations = tuple(args.test_iterations)
    cfg = cfg.__class__(**{**cfg.__dict__, "seed": args.seed})
    mode = mode_from_config(cfg)

    info, data, state, extent = load_scene_and_state(cfg)
    model_path = prepare_output_dir(cfg, info)
    print(f"Optimizing {model_path} [mode={mode}, "
          f"{data.num_views} views, extent {extent:.2f}]")

    if args.start_checkpoint:
        state, start_iter = load_checkpoint(args.start_checkpoint, state)
        print(f"resumed from {args.start_checkpoint} at iteration {start_iter}")

    gui = None
    if args.port > 0:
        from event3dgs_tpu.train.network_gui import NetworkGui

        gui = NetworkGui(args.ip, args.port, state, data, cfg)
        gui.start()

    # TensorBoard scalars (reference `training_report`, `train.py:360-398`)
    tb = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(model_path)
    except ImportError:
        print("Tensorboard not available: not logging progress")

    def on_metrics(it, metrics):
        if tb is not None and "loss" in metrics:
            tb.add_scalar("train_loss_patches/total_loss",
                          float(metrics["loss"]), it)
            if "l1" in metrics:
                tb.add_scalar("train_loss_patches/l1_loss",
                              float(metrics["l1"]), it)
            if "contrast" in metrics:
                tb.add_scalar("event/contrast", float(metrics["contrast"]), it)
            if "num_visible" in metrics:
                tb.add_scalar("total_points", int(metrics["num_visible"]), it)
        if args.quiet:
            return
        loss = metrics.get("loss")
        extra = ""
        if "contrast" in metrics:
            extra = f" c={float(metrics['contrast']):.4f}"
        if "densify_overflow" in metrics:
            extra += f" OVERFLOW={metrics['densify_overflow']}"
        if loss is not None:
            print(f"[{it:6d}] loss={float(loss):.6f}{extra}", flush=True)

    def on_save(it, st):
        print(f"\n[ITER {it}] Saving Gaussians")
        save_point_cloud(model_path, it, st)

    def on_checkpoint(it, st):
        print(f"\n[ITER {it}] Saving Checkpoint")
        save_checkpoint(os.path.join(model_path, f"chkpnt{it}.npz"), st, it)

    callbacks = TrainCallbacks(
        on_metrics=on_metrics,
        on_save=on_save,
        on_checkpoint=on_checkpoint,
        log_every=100,
    )
    if gui is not None:
        callbacks = gui.wrap_callbacks(callbacks)

    use_mesh = args.mesh_data > 1 or args.mesh_gauss > 1
    if use_mesh:
        from event3dgs_tpu.parallel import make_mesh
        from event3dgs_tpu.train.loop_sharded import train_loop_sharded

        mesh = make_mesh(
            data=args.mesh_data or None, gauss=args.mesh_gauss or None
        )
        print(f"mesh: data={mesh.shape['data']} gauss={mesh.shape['gauss']}")
        result = train_loop_sharded(
            state, data, cfg, mode, extent, mesh, callbacks=callbacks
        )
    else:
        result = train_loop(state, data, cfg, mode, extent, callbacks=callbacks)
    # one unit per figure: optimizer steps drive the rate; views consumed
    # reported separately (they differ by B in exact-exchange gauss mode)
    n_steps = len(result.history)
    print(
        f"\nTraining complete: {n_steps} optimizer steps "
        f"({int(result.state.step)} views) in {result.wall_time:.1f}s "
        f"({n_steps / max(result.wall_time, 1e-9):.1f} steps/s)"
    )
    if gui is not None:
        gui.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
