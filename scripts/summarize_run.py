"""Summarize a tensorboard training run as one JSON blob for the
evidence/ directory: milestone values of the headline metrics."""

import argparse
import glob
import json
import os


# explicit headline tags (always included when present) plus every
# Episode_Reward/ / Episode_Termination/ / Curriculum/ tag discovered in
# the run — task families log different term names (jump, lift-cube)
TAGS = [
    "train/mean_reward",
    "train/kl",
    "train/lr",
    "Episode/length",
    "Metrics/slip_velocity_mean",
]
AUTO_PREFIXES = ("Episode_Reward/", "Episode_Termination/", "Curriculum/")


def summarize(run_dir: str, every: int = 500) -> dict:
    from tensorboard.backend.event_processing import event_accumulator

    fs = sorted(glob.glob(os.path.join(run_dir, "events*")))
    assert fs, f"no tfevents under {run_dir}"
    out: dict = {"run_dir": run_dir, "milestones": {}}
    for f in fs:
        ea = event_accumulator.EventAccumulator(
            f, size_guidance={"scalars": 0}
        )
        ea.Reload()
        avail = ea.Tags().get("scalars", [])
        tags = [t for t in TAGS if t in avail] + [
            t for t in avail
            if t.startswith(AUTO_PREFIXES) and t not in TAGS
        ]
        for tag in tags:
            series = ea.Scalars(tag)
            for ev in series:
                if ev.step % every == 0 or ev is series[-1]:
                    out["milestones"].setdefault(str(ev.step), {})[tag] = (
                        round(float(ev.value), 5)
                    )
    steps = sorted(int(s) for s in out["milestones"])
    out["first_step"] = steps[0] if steps else None
    out["last_step"] = steps[-1] if steps else None
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--out", default=None)
    p.add_argument("--every", type=int, default=500)
    a = p.parse_args()
    s = summarize(a.run_dir, a.every)
    text = json.dumps(s, indent=1, sort_keys=True)
    print(text)
    if a.out:
        with open(a.out, "w") as f:
            f.write(text)
