"""
Trend plots from logged history (--log-csv / --log-parquet output).

The reference roadmap's Phase 3 "Trending and visualization" item
(reference README.md:444), delivered as a CLI: reads a history file from
either serving mode, renders a small-multiples PNG — one panel per
measure (pH, chlorine, temperature, actuator commands), shared time axis,
one y-scale per panel (never dual axes). Fleet files (a ``unit`` column)
plot one unit at a time (``--unit``).

Usage:
  python tools/plot_history.py history.csv [-o trends.png] [--unit 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Validated categorical palette, fixed slot order (first three slots clear
# the all-pairs colorblind-safety floors; see the repo's viz conventions).
SERIES = ["#2a78d6", "#eb6834", "#1baf7a"]          # blue, orange, aqua
SURFACE, INK, INK_2 = "#fcfcfb", "#0b0b0b", "#52514e"
GRID = "#e4e3df"

PANELS = [
    ("pH", [("pH_inlet", "inlet"), ("pH_outlet", "outlet")], "pH"),
    ("Free chlorine", [("chlorine_inlet", "inlet"),
                       ("chlorine_outlet", "outlet")], "mg/L"),
    ("Temperature", [("temp_inlet", "inlet"), ("temp_outlet", "outlet")],
     "\N{DEGREE SIGN}C"),
    ("Actuator commands", [("acid_cmd", "acid"), ("chlorine_cmd", "chlorine"),
                           ("inlet_flow_cmd", "inlet flow")], "L/min"),
]


def load(path):
    import glob
    import os

    import pandas as pd

    if path.endswith(".parquet"):
        # --log-parquet-rotate writes a .partNNNNN family next to the
        # requested name; read whichever exist, in order.
        root, ext = os.path.splitext(path)
        parts = sorted(glob.glob(f"{glob.escape(root)}.part[0-9]*{ext}"))
        paths = ([path] if os.path.exists(path) else []) + parts
        if not paths:
            raise FileNotFoundError(path)
        return pd.concat([pd.read_parquet(p) for p in paths],
                         ignore_index=True)
    return pd.read_csv(path)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("history", help="CSV or Parquet file from --log-csv / "
                                    "--log-parquet")
    ap.add_argument("-o", "--out", default=None,
                    help="output PNG (default: <history>.png)")
    ap.add_argument("--unit", type=int, default=None,
                    help="fleet files: which unit to plot (default: lowest)")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = load(args.history)
    title_extra = ""
    if "unit" in df.columns:
        unit = args.unit if args.unit is not None \
            else int(df["unit"].min())
        df = df[df["unit"] == unit]
        if df.empty:
            raise SystemExit(f"no rows for unit {unit}")
        title_extra = f" — unit {unit}"

    t = df["sim_time"] / 3600.0              # hours
    fig, axes = plt.subplots(len(PANELS), 1, figsize=(9, 10), sharex=True,
                             facecolor=SURFACE)
    for ax, (title, series, unit_label) in zip(axes, PANELS):
        ax.set_facecolor(SURFACE)
        for (col, label), color in zip(series, SERIES):
            if col in df.columns:
                ax.plot(t, df[col], color=color, linewidth=2, label=label)
        ax.set_title(title, loc="left", fontsize=11, color=INK)
        ax.set_ylabel(unit_label, fontsize=9, color=INK_2)
        ax.grid(True, color=GRID, linewidth=0.8)
        ax.tick_params(colors=INK_2, labelsize=8)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color(GRID)
        ax.legend(loc="upper right", fontsize=8, frameon=False,
                  labelcolor=INK_2)
    axes[-1].set_xlabel("simulated time [h]", fontsize=9, color=INK_2)
    fig.suptitle(f"Plant history{title_extra}", fontsize=13, color=INK,
                 x=0.065, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.97))

    out = args.out or os.path.splitext(args.history)[0] + ".png"
    fig.savefig(out, dpi=120, facecolor=SURFACE)
    print(f"wrote {out} ({len(df)} rows)")


if __name__ == "__main__":
    main()
