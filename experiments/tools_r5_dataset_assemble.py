#!/usr/bin/env python
"""R5 closed-loop dataset generation, assembly stage (CPU, no JAX).

Builds a trainable 4-folder scene whose `images_event/` frames come from
the SIMULATED DVS SENSOR (raw.dat produced by `cli.render --event`, then
windowed into accumulation frames by `cli.generate_dataset --layout
default`) — the reference's flagship data workflow
(`/root/reference/render.py:136-215` → `Event_sensor/event_tools.py:33-83`).

    sparse/, images/, renders/ (+ images_blurry/) copied from the source
    scene (poses, gray anchors and eval GT unchanged — only the event GT
    is sensor-synthetic);
    images_event/r_%05d.png   <- renamed from the generated layout frames
    ({i+2:05d}.png, the reference's index-offset quirk) so the COLMAP
    reader pairs frame i with camera pose i.
"""
import argparse
import os
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", required=True, help="source scene dir")
    p.add_argument("--frames", required=True,
                   help="dir holding the generated accumulation frames")
    p.add_argument("--output", "-o", required=True)
    p.add_argument("--views", type=int, required=True)
    args = p.parse_args()

    os.makedirs(args.output, exist_ok=True)
    for sub in ("sparse", "images", "renders", "images_blurry"):
        src = os.path.join(args.scene, sub)
        dst = os.path.join(args.output, sub)
        if os.path.isdir(src) and not os.path.isdir(dst):
            shutil.copytree(src, dst)

    ev_dir = os.path.join(args.output, "images_event")
    os.makedirs(ev_dir, exist_ok=True)
    missing = 0
    for i in range(args.views):
        src = os.path.join(args.frames, f"{i + 2:05d}.png")  # 'default' layout
        dst = os.path.join(ev_dir, f"r_{i:05d}.png")
        if os.path.exists(src):
            shutil.copyfile(src, dst)
        else:
            missing += 1
            raise SystemExit(f"missing generated frame {src}")
    print(f"assembled closed-loop scene at {args.output} "
          f"({args.views} simulated-sensor event frames)")


if __name__ == "__main__":
    main()
