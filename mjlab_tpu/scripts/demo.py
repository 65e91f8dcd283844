"""Demo CLI (reference src/mjlab/scripts/demo.py): run a pretrained policy
in the web viewer with a handful of envs.

The reference downloads its checkpoint + motion from GCS; this container has
no egress, so the demo takes a local checkpoint path (or runs the zero
policy when none is given)."""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", nargs="?", default="Mjlab-Velocity-Flat-Unitree-G1")
    p.add_argument("--checkpoint-file", default=None)
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument(
        "--viewer", choices=("viser", "native", "headless"), default="viser"
    )
    args = p.parse_args()

    from mjlab_tpu.scripts.play import run_play

    run_play(
        task=args.task,
        agent="trained" if args.checkpoint_file else "zero",
        checkpoint_file=args.checkpoint_file,
        num_envs=args.num_envs,
        viewer=args.viewer,
    )


if __name__ == "__main__":
    main()
