"""Plot the train/eval loss curves of a run directory from its TensorBoard
event files — without importing tensorflow (uses the framework's own proto
walker).  Writes ``loss_curve.png`` next to the event files.

Usage: python scripts/plot_loss_curve.py artifacts/texture64_run/texture64
"""

import glob
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conditional_score_diffusion_tpu.profiling.xplane import _fields


def tfrecords(path):
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0
    while pos + 12 <= len(buf):
        (length,) = struct.unpack_from("<Q", buf, pos)
        pos += 12
        yield buf[pos : pos + length]
        pos += length + 4


def scalar_series(run_dir):
    """{tag: [(step, value)]} for all simple-value summaries in the run."""
    series = {}
    for f in sorted(glob.glob(os.path.join(run_dir, "events.out.tfevents.*"))):
        for rec in tfrecords(f):
            step, summ = 0, None
            for field, _, val in _fields(rec):
                if field == 2:
                    step = val
                elif field == 5:
                    summ = val
            if summ is None:
                continue
            for field, _, val in _fields(summ):
                if field != 1:
                    continue
                tag, simple = None, None
                for f2, w2, v2 in _fields(val):
                    if f2 == 1:
                        tag = v2.decode()
                    elif f2 == 2 and w2 == 5:  # float simple_value
                        simple = struct.unpack("<f", struct.pack("<i", v2))[0]
                if tag is not None and simple is not None:
                    series.setdefault(tag, []).append((step, simple))
    for v in series.values():
        v.sort()
    return series


def main(run_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = scalar_series(run_dir)
    fig, ax = plt.subplots(figsize=(7, 4), dpi=150)
    fig.patch.set_facecolor("white")
    palette = {"train_loss": "#2a78d6", "eval_loss": "#eb6834"}
    for tag, color in palette.items():
        if tag not in series:
            continue
        steps, vals = zip(*series[tag])
        ax.plot(steps, vals, color=color, linewidth=1.4, label=tag.replace("_", " "))
        # selective direct label at the last point
        ax.annotate(
            f"{vals[-1]:.2f}", (steps[-1], vals[-1]), textcoords="offset points",
            xytext=(4, 4), fontsize=8, color="#52514e",
        )
    ax.set_yscale("log")
    ax.set_xlabel("step", color="#0b0b0b")
    ax.set_ylabel("DSM loss (log scale)", color="#0b0b0b")
    ax.grid(True, which="both", color="#e7e6e1", linewidth=0.6)
    ax.set_axisbelow(True)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    ax.legend(frameon=False, fontsize=9)
    out = os.path.join(run_dir, "loss_curve.png")
    fig.tight_layout()
    fig.savefig(out)
    print("wrote", out, "| tags:", {k: len(v) for k, v in series.items()})


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "artifacts/texture64_run/texture64")
