"""Render the NIAH sweep as a (context length x depth) heatmap.

Same role as the reference ``eval/needle/visualize.py`` (seaborn heatmap,
:106-139); uses matplotlib when available, else prints an ASCII grid.
"""

import argparse
import json
from collections import defaultdict


def load(path: str):
    cells = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            cells[(r["context_length"], r["depth_percent"])] = r["score"]
    return cells


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="niah_results.jsonl")
    p.add_argument("--output", default="niah_heatmap.png")
    args = p.parse_args()
    cells = load(args.input)
    lengths = sorted({k[0] for k in cells})
    depths = sorted({k[1] for k in cells})
    grid = [[cells.get((L, d), float("nan")) for L in lengths]
            for d in depths]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 5))
        im = ax.imshow(grid, vmin=0, vmax=10, cmap="RdYlGn", aspect="auto")
        ax.set_xticks(range(len(lengths)))
        ax.set_xticklabels([f"{L//1024}K" if L >= 1024 else str(L)
                            for L in lengths])
        ax.set_yticks(range(len(depths)))
        ax.set_yticklabels([f"{d:.0f}%" for d in depths])
        ax.set_xlabel("Context length")
        ax.set_ylabel("Needle depth")
        ax.set_title("Needle-in-a-Haystack recall")
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(args.output, dpi=150)
        print(f"wrote {args.output}")
    except ImportError:
        print("depth\\ctx " + " ".join(f"{L:>7}" for L in lengths))
        for d, row in zip(depths, grid):
            print(f"{d:>8.1f} " + " ".join(f"{v:>7.2f}" for v in row))


if __name__ == "__main__":
    main()
